package graft.operators

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Lifecycle-aware per-(session, corpus) cache for materialized index
  * structures ([[AnnIndex]], [[IvfIndex]]).
  *
  * Fixes the two r02 ADVICE hazards of the plain computeIfAbsent map:
  *  - the distributed index build runs OUTSIDE any map lock (losers of a
  *    concurrent build race close their copy and adopt the winner's), so
  *    unrelated lookups never stall behind a build;
  *  - entries are EVICTED: explicitly via [[invalidate]]/[[invalidateAll]]
  *    (which unpersists the index's executor storage), and automatically
  *    when the owning SparkContext ends — a stopped session no longer
  *    pins its cached index blocks (or the session object itself) for
  *    the JVM's lifetime.
  */
private[operators] final class IndexCache[T](
    build: (SparkSession, String) => T, close: T => Unit) {

  private val cache = new ConcurrentHashMap[(SparkSession, String), T]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  def get(spark: SparkSession, sfDir: String): T = {
    val key = (spark, sfDir)
    val existing = cache.get(key)
    if (existing != null) existing
    else {
      hookSessionEnd(spark)
      val built = build(spark, sfDir)
      val prev = cache.putIfAbsent(key, built)
      if (prev != null) { close(built); prev } else built
    }
  }

  /** Drop and unpersist one corpus's index (no-op when absent). */
  def invalidate(spark: SparkSession, sfDir: String): Unit = {
    val v = cache.remove((spark, sfDir))
    if (v != null) close(v)
  }

  /** Drop and unpersist every index of a session. */
  def invalidateAll(spark: SparkSession): Unit =
    cache.keySet.asScala.toSeq.filter(_._1 eq spark)
      .foreach { case (s, d) => invalidate(s, d) }

  private def hookSessionEnd(spark: SparkSession): Unit =
    if (hooked.add(spark)) {
      try spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(
            end: SparkListenerApplicationEnd): Unit = {
          invalidateAll(spark)
          hooked.remove(spark)
        }
      })
      catch { case _: IllegalStateException => // context already stopped
        invalidateAll(spark)
        hooked.remove(spark)
      }
    }
}
