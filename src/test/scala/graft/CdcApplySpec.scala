package graft

import java.nio.file.Files
import graft.streaming.CdcApply
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CDC apply: a change stream folds into a bucketed keyed
  * table via foreachBatch — latest-change-per-key wins inside a
  * batch, deletes leave, restarts resume from the surviving
  * generation, and each apply's merge reads its base pre-shuffled. */
class CdcApplySpec extends SparkSpec {

  private def tmpCkpt(): String =
    Files.createTempDirectory("graft_cdc_ckpt_").toString

  private def snapshot(apply: CdcApply): Map[Long, (String, Double)] =
    apply.current(spark).get.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap

  test("change batches fold in: upsert, in-batch latest-wins, delete, " +
    "and a restart resumes from the surviving generation") {
    import spark.implicits._
    val base = s"cdc_target_${System.nanoTime()}"
    val apply = CdcApply(base, "id", "seq", "op")
    val in = MemoryStream[(Long, Long, String, String, Double)](spark)
    val q = in.toDF().toDF("id", "seq", "op", "name", "score")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        apply.processBatch(b)
      }
      .option("checkpointLocation", tmpCkpt())
      .start()
    try {
      // batch 1: three inserts; key 2 changes TWICE in-batch — the
      // higher seq must win
      in.addData((1L, 1L, "u", "a", 1.0), (2L, 2L, "u", "b", 2.0),
        (2L, 3L, "u", "b2", 2.5), (3L, 4L, "u", "c", 3.0))
      q.processAllAvailable()
      assert(snapshot(apply) === Map(
        1L -> ("a", 1.0), 2L -> ("b2", 2.5), 3L -> ("c", 3.0)))
      // batch 2: update 1, delete 3, insert 4; key 3 also updates
      // BEFORE its delete in the same batch — the delete (higher seq)
      // must win
      in.addData((1L, 5L, "u", "a2", 1.5), (3L, 6L, "u", "zombie", 9.9),
        (3L, 7L, "d", "", 0.0), (4L, 8L, "u", "d", 4.0))
      q.processAllAvailable()
      assert(snapshot(apply) === Map(
        1L -> ("a2", 1.5), 2L -> ("b2", 2.5), 4L -> ("d", 4.0)))
    } finally q.stop()
    // restart: a fresh apply resumes from the surviving generation
    val resumed = CdcApply.resume(spark, base, "id", "seq", "op")
    assert(snapshot(resumed) === snapshot(apply))
    // exactly ONE generation table persists (ping-pong dropped the rest)
    val gens = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith(s"${base}_g"))
    assert(gens.length === 1, gens.mkString(", "))
    // the resumed loop keeps folding
    resumed.processBatch(Seq((5L, 9L, "u", "e", 5.0))
      .toDF("id", "seq", "op", "name", "score"))
    assert(snapshot(resumed).keySet === Set(1L, 2L, 4L, 5L))
    spark.sql(s"DROP TABLE IF EXISTS ${base}_g${3}")
  }

  test("streaming SCD-2: any batch-split of a change set builds " +
    "EXACTLY the history batch scd2Build derives, and a restart " +
    "resumes from the surviving generation") {
    import graft.streaming.Scd2Apply
    val base = s"scd2_hist_${System.nanoTime()}"
    // the q_scd2 change set: priority changes per customer over order
    // dates, orderkey as the in-day tiebreak
    val changes = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderpriority"),
        col("o_orderdate"), col("o_orderkey"))
    // canonicalize the interval timestamps to strings: the saved
    // generation reads back as TIMESTAMP while Tables.orders carries
    // parquet NTZ (LocalDateTime) — same wall-clock under the pinned
    // UTC session, different JVM classes
    def canon(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.select(col("o_custkey"), col("o_orderpriority"),
        date_format(col("valid_from"), "yyyy-MM-dd HH:mm:ss").as("vf"),
        date_format(col("valid_to"), "yyyy-MM-dd HH:mm:ss").as("vt"),
        col("src_key"), col("is_current"))
        .collect().map(_.toSeq).toSet
    val expected = canon(graft.operators.RelationalOps
      .scd2Build(changes, "o_custkey", "o_orderpriority",
        "o_orderdate", "o_orderkey"))
    // split into 4 batches along the global (ts, tie) order — a
    // contiguous prefix split, so per-key event-time order holds
    // across batches (the documented in-order CDC contract)
    import org.apache.spark.sql.expressions.Window
    val ranked = changes.withColumn("__rn", row_number().over(
      Window.orderBy(col("o_orderdate"), col("o_orderkey"))))
    val n = changes.count()
    val cuts = Seq(0L, n / 4, n / 2, 3 * n / 4, n)
    val apply = Scd2Apply(base, "o_custkey", "o_orderpriority",
      "o_orderdate", "o_orderkey")
    try {
      cuts.sliding(2).foreach { case Seq(lo, hi) =>
        apply.processBatch(
          ranked.filter(col("__rn") > lo && col("__rn") <= hi)
            .drop("__rn"))
      }
      val got = canon(apply.current(spark).get)
      assert(got === expected,
        s"stream-built history diverged: ${got.size} vs " +
          s"${expected.size} rows; e.g. ${(got -- expected).take(3)} / " +
          s"${(expected -- got).take(3)}")
      // restart: resume sees the same history and keeps folding — a
      // later change closes the open interval it supersedes
      val resumed = Scd2Apply.resume(spark, base, "o_custkey",
        "o_orderpriority", "o_orderdate", "o_orderkey")
      assert(canon(resumed.current(spark).get) === expected)
      import spark.implicits._
      val k = expected.head.head.asInstanceOf[Long]
      val openBefore = apply.current(spark).get
        .filter(col("o_custkey") === k && col("is_current"))
        .collect().head
      resumed.processBatch(
        Seq((k, "9-SYNTH", java.sql.Timestamp.valueOf("2099-01-01 00:00:00"),
          999999999L))
          .toDF("o_custkey", "o_orderpriority", "o_orderdate",
            "o_orderkey"))
      val hist = resumed.current(spark).get
        .filter(col("o_custkey") === k).collect()
      val nowOpen = hist.filter(_.getBoolean(5))
      assert(nowOpen.length === 1 && nowOpen.head.getString(1) === "9-SYNTH")
      val closed = hist.filter(r =>
        r.getLong(4) === openBefore.getLong(4))
      assert(closed.head.get(3) != null,
        "the superseded open interval must close at the new valid_from")
      // untouched keys carried through bit-for-bit
      assert(canon(resumed.current(spark).get
        .filter(col("o_custkey") =!= k))
        === expected.filter(_.head.asInstanceOf[Long] != k))
    } finally {
      spark.catalog.listTables().collect().map(_.name)
        .filter(_.startsWith(s"${base}_g"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("each apply reads its base pre-shuffled: the merge join plans " +
    "with an exchange ONLY on the change-set side") {
    import spark.implicits._
    val base = s"cdc_plan_${System.nanoTime()}"
    val apply = CdcApply(base, "id", "seq", "op")
    apply.processBatch(
      (1L to 100L).map(i => (i, i, "u", s"n$i", i.toDouble))
        .toDF("id", "seq", "op", "name", "score"))
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val upserts = Seq((1L, "x", 0.0)).toDF("id", "name", "score")
      val merged = graft.operators.RelationalOps.mergeUpsert(
        apply.current(spark).get, upserts, "id")
      merged.collect()
      val p = merged.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val exchanges = "Exchange".r.findAllIn(p).length
      // one exchange for the update side + one for the presentation
      // sort — the bucketed base contributes none
      assert(exchanges <= 2, p.take(2500))
      assert(p.contains("Bucketed: true"), p.take(2500))
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      spark.sql(s"DROP TABLE IF EXISTS ${base}_g1")
    }
  }
}
