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
