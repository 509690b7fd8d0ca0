package graft

import graft.operators.ConstraintOps
import graft.operators.ConstraintOps._
import org.apache.spark.sql.functions._

/** Data-quality constraint tier: planted violations of every check
  * kind are counted exactly; clean columns report zero; the scalar
  * checks fuse into one scan. */
class ConstraintOpsSpec extends SparkSpec {

  private def planted = {
    import spark.implicits._
    // id: unique except 7 appears 3x (surplus 2); v: null at id=1,
    // out-of-[0,10]-range at id=2 (-5) and id=3 (99); fk: 4 rows
    // pointing at a missing dim key (100, 101), nulls ignored
    Seq(
      (1L, Option.empty[Double], Option(10L)),
      (2L, Some(-5.0), Option(20L)),
      (3L, Some(99.0), Option(100L)),
      (4L, Some(5.0), Option(101L)),
      (5L, Some(5.0), Option.empty[Long]),
      (6L, Some(5.0), Option(10L)),
      (7L, Some(5.0), Option(100L)),
      (7L, Some(5.0), Option(101L)),
      (7L, Some(5.0), Option(20L))
    ).toDF("id", "v", "fk")
  }

  private def dim = {
    import spark.implicits._
    Seq(10L, 20L).toDF("pk")
  }

  test("each check kind counts its planted violations exactly") {
    val out = ConstraintOps.dqReport(planted, Seq(
        NotNull("v"), InRange("v", 0.0, 10.0), UniqueKey("id"),
        RefIntegrity("fk", dim, "dim", "pk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("not_null v") === 1L)
    // null + two out-of-range values: range subsumes presence
    assert(out("range v [0,10]") === 3L)
    assert(out("unique id") === 2L)
    // ids 3,4,7,7 point at 100/101; the null fk is not a violation
    assert(out("ref fk -> dim.pk") === 4L)
  }

  test("clean data reports zero on every lane") {
    val clean = planted.filter(col("id") <= 0) // empty frame
    val out = ConstraintOps.dqReport(clean, Seq(
        NotNull("v"), InRange("v", 0.0, 10.0), UniqueKey("id"),
        RefIntegrity("fk", dim, "dim", "pk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size === 4)
    out.values.foreach(v => assert(v === 0L, out.toString))
  }

  test("scalar checks fuse into ONE scan of the table") {
    val p = ConstraintOps.dqReport(
        graft.sources.Tables.lineitem(spark, sfDir),
        Seq(NotNull("l_orderkey"), InRange("l_discount", 0.0, 1.0),
          InRange("l_extendedprice", 0.0, 50000.0),
          NotNull("l_partkey"), InRange("l_quantity", 0.0, 100.0)))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans === 1,
      s"5 scalar checks must share one scan, got $scans:\n" + p.take(2000))
  }

  test("q_dq_checks is deterministic and its lanes reconcile with " +
    "direct counts") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val out = SparkEntry.queries("q_dq_checks")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("not_null l_orderkey") === 0L)
    val expectedSurplus =
      li.count() - li.select("l_orderkey").distinct().count()
    assert(out("unique l_orderkey") === expectedSurplus)
    assert(out("range l_extendedprice [0,50000]") ===
      li.filter(col("l_extendedprice") > 50000.0).count())
    assert(out("ref l_orderkey -> orders.o_orderkey") === 0L)
  }
}
