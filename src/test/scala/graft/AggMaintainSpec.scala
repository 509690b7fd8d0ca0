package graft

import graft.streaming.AggMaintain
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental materialized-aggregate maintenance: the stream-kept
  * rollup must equal a from-scratch batch aggregate of the keyed
  * table after every batch, while recomputing only the groups the
  * batch touched — including key moves between groups, deletes, and
  * groups that empty out. */
class AggMaintainSpec extends SparkSpec {
  import spark.implicits._

  private def chg(rows: (Long, Long, String, String, Double)*) =
    rows.toDF("id", "seq", "op", "grp", "score")

  private def aggSnapshot(m: AggMaintain): Map[String, (Long, Double)] =
    m.currentAgg(spark).get
      .select(col("grp"), col("n_rows"),
        col("sum_value").cast("double").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  private def recompute(m: AggMaintain): Map[String, (Long, Double)] = {
    val kv = spark.table(spark.catalog.listTables().collect()
      .map(_.name).filter(n => n.contains("ivm_") && n.matches(".*_g\\d+")
        && !n.contains("_agg_")).maxBy(n =>
        n.substring(n.lastIndexOf('g') + 1).toLong))
    kv.groupBy("grp")
      .agg(count(lit(1)).as("n"),
        sum(col("score").cast(DecimalType(18, 2))).cast("double").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
  }

  test("stream-maintained rollup equals batch recompute through " +
    "inserts, updates, a key moving groups, deletes, and an emptied " +
    "group; only touched groups recompute; restart resumes") {
    val base = s"ivm_${System.nanoTime()}"
    val m = AggMaintain(base, "id", "seq", "op", "grp", "score")

    // batch 1: inserts across two groups
    val a1 = m.processBatch(chg((1L, 1L, "u", "A", 1.0),
      (2L, 2L, "u", "A", 2.0), (3L, 3L, "u", "B", 3.0)))
    assert(a1 === 2, "groups A and B recomputed")
    assert(aggSnapshot(m) === Map("A" -> (2L, 3.0), "B" -> (1L, 3.0)))
    assert(aggSnapshot(m) === recompute(m))

    // batch 2: key 1 MOVES A→C (dirties both), key 3 updates in place,
    // key 4 inserts into B
    val a2 = m.processBatch(chg((1L, 4L, "u", "C", 1.5),
      (3L, 5L, "u", "B", 3.5), (4L, 6L, "u", "B", 4.0)))
    assert(a2 === 3, "A (old side), B, C recomputed")
    assert(aggSnapshot(m) === Map(
      "A" -> (1L, 2.0), "B" -> (2L, 7.5), "C" -> (1L, 1.5)))
    assert(aggSnapshot(m) === recompute(m))

    // batch 3: delete the last A member — the A row must VANISH, and
    // untouched B/C rows carry through
    val a3 = m.processBatch(chg((2L, 7L, "d", "A", 0.0)))
    assert(a3 === 1, "only A recomputed")
    assert(aggSnapshot(m) === Map("B" -> (2L, 7.5), "C" -> (1L, 1.5)))
    assert(aggSnapshot(m) === recompute(m))

    // restart: resume from surviving generations and keep folding
    val r = AggMaintain.resume(spark, base, "id", "seq", "op",
      "grp", "score")
    assert(aggSnapshot(r) === aggSnapshot(m))
    r.processBatch(chg((5L, 8L, "u", "C", 2.5)))
    assert(aggSnapshot(r) === Map("B" -> (2L, 7.5), "C" -> (2L, 4.0)))
    assert(aggSnapshot(r) === recompute(r))

    // exactly one generation persists per table (ping-pong dropped)
    val tables = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith(base))
    assert(tables.count(_.contains("_agg_g")) === 1, tables.mkString(","))
    assert(tables.count(!_.contains("_agg_g")) === 1, tables.mkString(","))
    tables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
