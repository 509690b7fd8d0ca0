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
}
