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
