package graft

import org.apache.spark.sql.functions._

/** Laws for the opt-in COUNT(DISTINCT) → HLL optimizer rule
  * (graft.plans.ApproxDistinctRewrite): plan rewrites appear exactly
  * when the session conf opts in, estimates stay inside the sketch's
  * documented error, FILTER and GROUP BY forms carry over, and
  * ineligible shapes (multi-column distinct, SUM(DISTINCT), double
  * inputs) pass through untouched.
  */
class ApproxRewriteSpec extends SparkSpec {

  private val Key = "spark.graft.approx.countDistinct"

  private def withApprox[T](on: Boolean)(body: => T): T = {
    val prev = spark.conf.getOption(Key)
    spark.conf.set(Key, on.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(Key, v)
      case None => spark.conf.unset(Key)
    }
  }

  private def planOf(sql: String): String =
    spark.sql(sql).queryExecution.optimizedPlan.toString

  test("flag on: COUNT(DISTINCT) rewrites to the HLL sketch pipeline " +
    "and the estimate lands within 2% of exact") {
    val ord = graft.sources.Tables.orders(spark, sfDir)
    ord.createOrReplaceTempView("ar_orders")
    val exact = spark.sql(
      "SELECT count(DISTINCT o_custkey) AS d FROM ar_orders")
      .head().getLong(0)
    withApprox(on = true) {
      val q = spark.sql(
        "SELECT count(DISTINCT o_custkey) AS d FROM ar_orders")
      val p = q.queryExecution.optimizedPlan.toString
      assert(p.contains("hll_sketch_estimate") ||
        p.contains("HllSketchEstimate"), p.take(1500))
      assert(!p.toLowerCase.contains("count(distinct"), p.take(1500))
      val approx = q.head().getLong(0)
      assert(math.abs(approx - exact).toDouble / exact < 0.02,
        s"approx $approx vs exact $exact")
      // the output column name and type are untouched
      assert(q.columns.toSeq === Seq("d"))
      assert(q.schema("d").dataType ===
        org.apache.spark.sql.types.LongType)
    }
  }

  test("flag off (and by default): the plan keeps the exact distinct " +
    "aggregate") {
    graft.sources.Tables.orders(spark, sfDir)
      .createOrReplaceTempView("ar_orders")
    withApprox(on = false) {
      val p = planOf(
        "SELECT count(DISTINCT o_custkey) AS d FROM ar_orders")
      assert(!p.contains("hll_sketch"), p.take(1500))
    }
  }

  test("grouped and FILTER forms rewrite; the group structure and " +
    "filter semantics survive") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    ev.createOrReplaceTempView("ar_events")
    val exact = spark.sql(
      """SELECT event_type,
                count(DISTINCT user_id)
                  FILTER (WHERE value > 50) AS d
         FROM ar_events GROUP BY event_type ORDER BY event_type""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    withApprox(on = true) {
      val q = spark.sql(
        """SELECT event_type,
                  count(DISTINCT user_id)
                    FILTER (WHERE value > 50) AS d
           FROM ar_events GROUP BY event_type ORDER BY event_type""")
      assert(q.queryExecution.optimizedPlan.toString
        .contains("hll_sketch"), "grouped+filtered form must rewrite")
      q.collect().foreach { r =>
        val (t, a) = (r.getString(0), r.getLong(1))
        val e = exact(t)
        assert(e == 0 && a == 0 ||
          math.abs(a - e).toDouble / math.max(e, 1) < 0.05,
          s"$t: approx $a vs exact $e")
      }
    }
  }

  test("ineligible shapes stay exact under the flag: multi-column " +
    "distinct, SUM(DISTINCT), and DOUBLE inputs") {
    graft.sources.Tables.orders(spark, sfDir)
      .createOrReplaceTempView("ar_orders")
    withApprox(on = true) {
      val multi = planOf("SELECT count(DISTINCT o_custkey, " +
        "o_orderstatus) AS d FROM ar_orders")
      assert(!multi.contains("hll_sketch"), multi.take(1200))
      val sumD = planOf(
        "SELECT sum(DISTINCT o_custkey) AS s FROM ar_orders")
      assert(!sumD.contains("hll_sketch"), sumD.take(1200))
      val dbl = planOf(
        "SELECT count(DISTINCT o_totalprice) AS d FROM ar_orders")
      assert(!dbl.contains("hll_sketch"), dbl.take(1200))
      // sanity: results still correct for the exact paths
      val s = spark.sql(
        "SELECT count(DISTINCT o_custkey, o_orderstatus) AS d " +
          "FROM ar_orders").head().getLong(0)
      assert(s > 0)
    }
  }

  test("the DataFrame API path rewrites too — countDistinct() is the " +
    "same plan shape") {
    val ord = graft.sources.Tables.orders(spark, sfDir)
    val exact = ord.agg(countDistinct(col("o_custkey")).as("d"))
      .head().getLong(0)
    withApprox(on = true) {
      val q = ord.agg(countDistinct(col("o_custkey")).as("d"))
      assert(q.queryExecution.optimizedPlan.toString
        .contains("hll_sketch"))
      val approx = q.head().getLong(0)
      assert(math.abs(approx - exact).toDouble / exact < 0.02)
    }
  }
}
