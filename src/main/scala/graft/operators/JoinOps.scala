package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out join utilities (SURVEY.md §4.2; prompt checklist: "salting
  * for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) is the first line of defense — it splits oversized
  * sort-merge partitions at runtime. `saltedJoin` is the explicit
  * fallback for the cases AQE cannot fix: a build side too large to
  * broadcast joined on a key where single hot values overflow one task
  * (the classic power-law user_id). It trades `buckets`× replication of
  * the dim side for an even spread of each hot key across `buckets`
  * tasks.
  */
object JoinOps {

  /** Equi-join `facts ⋈ dim` on `key`, with each fact row salted into
    * one of `buckets` sub-keys and the dim side replicated once per
    * salt. Result equals `facts.join(dim, key)` exactly (inner join);
    * the hot key's rows land in `buckets` different shuffle partitions.
    *
    * `saltSource` must be a deterministic per-row expression on `facts`
    * (a unique id column is ideal); determinism keeps retried tasks and
    * oracle runs reproducible — never use rand().
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val salted = facts.withColumn("__graft_salt",
      pmod(xxhash64(saltSource), lit(buckets.toLong)).cast("int"))
    val replicated = dim.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__graft_salt"), "inner")
      .drop("__graft_salt")
  }

  /** As-of join: for each left row, the single LATEST right row with
    * `rightTime <= leftTime` on the same equi key (backward as-of, the
    * market-data/point-in-time-features shape). Spark has no native
    * as-of operator; this composes equi-join + range residual +
    * window dedup — the scale-correct spelling: the join shuffles on
    * the equi key (bounded per-key history), and the window partitions
    * by (leftKey, leftId) so the join output's hash partitioning on
    * leftKey already satisfies the window's required distribution —
    * the row_number dedup runs in the join's own partitions with no
    * second exchange (leftId is unique, so adding leftKey to the
    * partition spec changes no group). When the right side broadcasts,
    * the window does insert its own exchange — there was no shuffle to
    * reuse.
    *
    * Contract: left and right column names must be disjoint (alias
    * before calling); `leftId` uniquely identifies left rows; ties on
    * `rightTime` break toward the largest `rightId`. Inner semantics:
    * left rows with no qualifying right row are dropped. */
  /** Interval-overlap join: every (left, right) pair whose CLOSED time
    * intervals `[lStart, lEnd]` / `[rStart, rEnd]` intersect
    * (`lStart <= rEnd && rStart <= lEnd`), optionally narrowed by
    * `residual`. Spark has no range-join optimization, so the naive
    * spelling is a BroadcastNestedLoopJoin — O(|L|·|R|) predicate
    * evaluations that no cluster survives. This is the BUCKETED
    * spelling: each interval explodes into the `bucketSeconds`-wide
    * epoch buckets it covers and the join runs as an EQUI-join on the
    * bucket key with the exact predicate as residual. Two overlapping
    * intervals share every bucket of their intersection — the
    * first-shared-bucket condition (`bucket ==
    * max(floor(lStart), floor(rStart))`) emits each pair exactly once
    * with no post-join dedup.
    *
    * Scale: shuffle is keyed on time buckets, so work distributes
    * across the timeline; per-row fan-out = interval length in
    * buckets, bounded by `maxBucketsPerInterval` (longer intervals are
    * EXCLUDED — size `bucketSeconds` near the p99 interval length and
    * split pathological giants upstream; the cap keeps one mega-
    * interval from replicating into every partition of the timeline).
    * A hot bucket (many concurrent intervals) is a plain skewed
    * equi-join key — AQE splits it.
    *
    * Contract: left/right column names disjoint (alias first);
    * interval bounds are TIMESTAMP columns; arithmetic runs on exact
    * `unix_micros` longs so engines cannot diverge on fractional
    * seconds. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketSeconds: Long, residual: Column = lit(true),
      maxBucketsPerInterval: Int = 1024): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    require(maxBucketsPerInterval > 0, "maxBucketsPerInterval must be positive")
    val bs = lit(bucketSeconds * 1000000L)
    def bk(c: String) = floor(unix_micros(col(c)) / bs)
    def spans(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(unix_micros(col(e)) >= unix_micros(col(s)) &&
        bk(e) - bk(s) < lit(maxBucketsPerInterval))
    val l = spans(left, lStart, lEnd)
      .withColumn("__graft_bkl", explode(sequence(bk(lStart), bk(lEnd))))
    val r = spans(right, rStart, rEnd)
      .withColumn("__graft_bkr", explode(sequence(bk(rStart), bk(rEnd))))
    l.join(r,
        col("__graft_bkl") === col("__graft_bkr") &&
        col("__graft_bkl") === greatest(bk(lStart), bk(rStart)) &&
        unix_micros(col(lStart)) <= unix_micros(col(rEnd)) &&
        unix_micros(col(rStart)) <= unix_micros(col(lEnd)) &&
        residual)
      .drop("__graft_bkl", "__graft_bkr")
  }

  def asOfJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      leftId: String, rightId: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(leftKey), col(leftId))
      .orderBy(col(rightTime).desc, col(rightId).desc)
    left.join(right,
        col(leftKey) === col(rightKey) &&
        col(rightTime) <= col(leftTime))
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }
}
