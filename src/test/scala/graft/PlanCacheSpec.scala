package graft

import graft.tools.PlanCache
import org.apache.spark.sql.functions._

/** Contract of the per-(session, descriptor) pinned-plan cache behind
  * the qn mapping, the spearman spine, and the shared graph
  * projections: same key returns the SAME handle without re-running
  * the builder; different keys never alias; invalidation drops the
  * entry.
  */
class PlanCacheSpec extends SparkSpec {
  import spark.implicits._

  test("second get with the same key returns the cached handle and " +
    "does not re-run the builder") {
    val cache = new PlanCache
    var builds = 0
    def build() = {
      builds += 1
      graft.tools.Checkpoints.pin(Seq(1, 2, 3).toDF("v"))
    }
    val a = cache.get(spark, "k1")(build())
    val b = cache.get(spark, "k1")(build())
    assert(builds === 1, "builder must run once per key")
    assert(a eq b, "same key must return the same handle")
    assert(b.agg(sum("v")).head().getLong(0) === 6L)
  }

  test("different keys build independently; invalidateAll forces a " +
    "rebuild") {
    val cache = new PlanCache
    var builds = 0
    def build(n: Int) = {
      builds += 1
      graft.tools.Checkpoints.pin(Seq.fill(n)(1).toDF("v"))
    }
    val a = cache.get(spark, "ka")(build(2))
    val b = cache.get(spark, "kb")(build(5))
    assert(builds === 2, "distinct keys must not alias")
    assert(a.count() === 2L && b.count() === 5L)
    cache.invalidateAll(spark)
    cache.get(spark, "ka")(build(2))
    assert(builds === 3, "invalidateAll must drop the entry")
  }

  test("the LRU bound evicts the least-recently-used entry and a " +
    "re-get rebuilds it; recently-touched entries survive") {
    val cache = new PlanCache
    var builds = 0
    def build() = {
      builds += 1
      graft.tools.Checkpoints.pin(Seq(1).toDF("v"))
    }
    (0 to PlanCache.MaxEntries).foreach { i =>
      cache.get(spark, s"k$i")(build())
      // keep k0 hot so the access-ordered LRU evicts k1, not k0
      cache.get(spark, "k0")(build())
    }
    assert(builds === PlanCache.MaxEntries + 1,
      "filling to the bound must build each key once")
    cache.get(spark, "k0")(build())
    assert(builds === PlanCache.MaxEntries + 1,
      "the hot entry must survive the eviction")
    cache.get(spark, "k1")(build())
    assert(builds === PlanCache.MaxEntries + 2,
      "the cold entry past the bound must have been evicted")
  }

  test("the shared engine cache serves the registered consumers: " +
    "two invocations of q_quantile_normalize reuse one mapping and " +
    "stay row-identical") {
    val q = SparkEntry.queries("q_quantile_normalize")
    val r1 = q(spark, sfDir).collect()
    val r2 = q(spark, sfDir).collect()
    assert(r1.length === r2.length && r1.sameElements(r2),
      "cached-mapping rerun must be bit-identical")
  }
}
