package graft

import graft.operators.JoinOps
import graft.sources.{Tables, Warehouse}
import org.apache.spark.sql.functions._

/** The two explicit shuffle-discipline techniques: salting for skewed
  * keys (result-equality law) and bucketing for co-located joins
  * (shuffle-free plan law). */
class ScaleJoinSpec extends SparkSpec {

  test("saltedJoin equals the plain join exactly") {
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    val expected = orders.join(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
      .groupBy("o_custkey").count()
    val salted = JoinOps.saltedJoin(
        orders,
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey", saltSource = col("o_orderkey"), buckets = 8)
      .groupBy("o_custkey").count()
    assert(salted.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(salted).count() === 0)
  }

  test("saltedJoin spreads a hot key across salt buckets") {
    import spark.implicits._
    // skewed facts: one key carries 90% of rows
    val facts = (1 to 1000).map(i =>
      (if (i <= 900) 1L else (i % 7).toLong, i.toLong)).toDF("k", "id")
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"),
      (5L, "f"), (6L, "g")).toDF("k", "v")
    val out = JoinOps.saltedJoin(facts, dim, "k", col("id"), buckets = 8)
    assert(out.count() === 1000)
    // the salt expression hits every bucket for the hot key
    val saltsUsed = facts.filter(col("k") === 1)
      .select(pmod(xxhash64(col("id")), lit(8L)).cast("int").as("s"))
      .distinct().count()
    assert(saltsUsed === 8)
  }

  test("salted join bounds the hot key's max task input (50% skew fixture)") {
    import spark.implicits._
    // one key owns half the fact rows — the straggler shape AQE's
    // skew-join also targets; here we prove the explicit salting utility
    // delivers the bound on its own
    val n = 20000L
    val buckets = 16
    val facts = spark.range(n).select(
      when(col("id") < n / 2, 7L).otherwise(pmod(col("id"), lit(50L))).as("k"),
      col("id"))
    val dim = spark.range(50).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    // force the shuffle join a 100 TB fact⋈fact would use: with a
    // broadcast dim there is no exchange on k and nothing to measure;
    // and enough partitions that the salted spread isn't floored by the
    // tiny test-session partition count
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      // group granularity: the hot key's largest (k, salt) slice — the
      // unit a shuffle distributes — is ~1/buckets of the hot key
      val hot = n / 2
      val maxGroup = facts
        .groupBy(col("k"),
          pmod(xxhash64(col("id")), lit(buckets.toLong)).as("s"))
        .count().agg(max("count")).head().getLong(0)
      assert(maxGroup <= hot / buckets * 2,
        s"hot-key salt slice $maxGroup vs ${hot / buckets} expected")
      // partition granularity: the salted join's fullest shuffle
      // partition holds a fraction of what the plain join concentrates
      def maxPartition(df: org.apache.spark.sql.DataFrame): Long =
        df.withColumn("p", spark_partition_id())
          .groupBy("p").count().agg(max("count")).head().getLong(0)
      val maxPlain = maxPartition(facts.join(dim, "k"))
      val maxSalted = maxPartition(
        JoinOps.saltedJoin(facts, dim, "k", col("id"), buckets))
      assert(maxPlain >= hot, s"plain join should concentrate ($maxPlain)")
      assert(maxSalted * 4 <= maxPlain,
        s"salting must cut the max task input to a fraction " +
          s"($maxSalted vs $maxPlain)")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
    }
  }

  test("bucketed tables join with no Exchange (co-located)") {
    Warehouse.writeBucketed(
      Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey", buckets = 4)
    Warehouse.writeBucketed(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", buckets = 4)
    // below the broadcast threshold the planner would broadcast and skip
    // the bucketed path entirely; force the sort-merge join a 100 TB
    // fact⋈fact join would use so the bucketing actually engages
    val thresholdBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Warehouse.bucketedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join must be shuffle-free:\n" + plan.take(2000))
      // and it returns the same rows as the plain join
      val plain = Tables.orders(spark, sfDir).select("o_orderkey")
        .join(Tables.lineitem(spark, sfDir)
          .withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
      assert(joined.count() === plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresholdBefore)
    }
  }

  test("intervalJoin equals the naive range join on random intervals — " +
    "each overlapping pair exactly once, closed-bound semantics, at " +
    "several bucket widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    def mkIv(n: Int, tag: String) = (0 until n).map { i =>
      val st = rnd.nextInt(100000)
      val len = if (rnd.nextBoolean()) rnd.nextInt(5000) else 0 // points too
      (s"$tag$i", new java.sql.Timestamp(st * 1000L),
        new java.sql.Timestamp((st + len) * 1000L))
    }
    val l = mkIv(120, "l").toDF("lid", "ls", "le")
    val r = mkIv(150, "r").toDF("rid", "rs", "re")
    val naive = l.join(r,
        unix_micros(col("ls")) <= unix_micros(col("re")) &&
        unix_micros(col("rs")) <= unix_micros(col("le")))
      .select("lid", "rid").collect().map(x => (x.getString(0),
        x.getString(1))).sorted.toSeq
    assert(naive.nonEmpty && naive.distinct === naive)
    Seq(60L, 3600L, 86400L).foreach { bs =>
      val got = JoinOps.intervalJoin(l, r, "ls", "le", "rs", "re", bs)
        .select("lid", "rid").collect().map(x => (x.getString(0),
          x.getString(1))).sorted.toSeq
      assert(got === naive, s"bucketSeconds=$bs")
    }
  }

  test("intervalJoin residual narrows inside the join and the " +
    "maxBucketsPerInterval cap excludes giants from either side") {
    import spark.implicits._
    val l = Seq(("a", ts(0), ts(10)), ("b", ts(5), ts(15)),
      ("g", ts(0), ts(500000))) // giant: 500k s / 60 s ≫ 100 buckets
      .toDF("lid", "ls", "le")
    val r = Seq(("x", ts(8), ts(12))).toDF("rid", "rs", "re")
    val all = JoinOps.intervalJoin(l, r, "ls", "le", "rs", "re", 60L,
      maxBucketsPerInterval = 100)
      .select("lid", "rid").collect().map(x => x.getString(0)).sorted
    assert(all.toSeq === Seq("a", "b")) // giant excluded, others kept
    val narrowed = JoinOps.intervalJoin(l, r, "ls", "le", "rs", "re", 60L,
      residual = col("lid") === lit("b"), maxBucketsPerInterval = 100)
      .select("lid").collect().map(_.getString(0))
    assert(narrowed.toSeq === Seq("b"))
  }

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
}
