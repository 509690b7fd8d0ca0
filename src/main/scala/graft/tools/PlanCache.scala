package graft.tools

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(session, descriptor) cache of PINNED intermediate tables —
  * the train-once-artifact stance ([[graft.operators.PcaOps]]'s model
  * cache, the wpVocab cache) extended to corpus-derived REFERENCE
  * TABLES: a quantile-normalization value→reference mapping or a rank
  * spine is, in production, built once per corpus snapshot and reused
  * by every consumer, so rebuilding it per query (and per bench
  * round) prices the build 5× (r15 verdict item 6).
  *
  * The descriptor key must name the table, the column set, and the
  * transform (e.g. `"sf0.1#qn:lineitem:v0,v1,v2"`) — two DIFFERENT
  * spines must never share a key. The builder runs OUTSIDE any lock
  * (concurrent losers' plans are just dropped — pinned blocks are
  * executor-cached RDDs the GC reclaims once unreferenced), and
  * entries evict when the owning SparkContext ends, so a stopped
  * session never pins its blocks for the JVM's lifetime (the
  * [[graft.operators.IndexCache]] hygiene).
  */
private[graft] final class PlanCache {

  private val cache = new ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  /** The cached pinned table for `key`, building (and pinning) via
    * `build` on first use. `build` must already return a pinned /
    * materialized plan ([[Checkpoints.pin]]) — this cache stores the
    * handle, it does not add storage semantics of its own. */
  def get(spark: SparkSession, key: String)(build: => DataFrame)
      : DataFrame = {
    val k = (spark, key)
    val existing = cache.get(k)
    if (existing != null) existing
    else {
      hookSessionEnd(spark)
      val built = build
      val prev = cache.putIfAbsent(k, built)
      if (prev != null) prev else built
    }
  }

  def invalidateAll(spark: SparkSession): Unit =
    cache.keySet.asScala.toSeq.filter(_._1 eq spark)
      .foreach(cache.remove)

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

private[graft] object PlanCache {
  /** The engine-wide reference-table cache (qn mappings, shared
    * spines). */
  val shared = new PlanCache
}
