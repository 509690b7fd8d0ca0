package graft

import graft.functions.{TopKAggregator, TopKRow}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The typed-Aggregator extension surface, cross-checked against the
  * builtin TakeOrderedAndProject path (q_topk): both must produce the
  * identical top-10 orders by totalprice. */
class TopKAggregatorSpec extends SparkSpec {

  test("TopKAggregator equals orderBy().limit() on driver orders") {
    import spark.implicits._
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("key"),
        col("o_totalprice").cast("double").as("score"))
      .as[TopKRow]
    val agg = new TopKAggregator(10).toColumn
    val viaAggregator = rows.select(agg).head().items
      .map(r => (r.key, r.score))
    val viaBuiltin = rows
      .orderBy(col("score").desc, col("key"))
      .limit(10).collect().map(r => (r.key, r.score)).toSeq
    assert(viaAggregator === viaBuiltin)
  }

  test("partial aggregation: merge of partition tops equals global top") {
    val a = new TopKAggregator(3)
    val p1 = Seq(TopKRow(1, 9.0), TopKRow(2, 5.0), TopKRow(3, 7.0))
      .foldLeft(a.zero)(a.reduce)
    val p2 = Seq(TopKRow(4, 8.0), TopKRow(5, 6.0), TopKRow(6, 9.0))
      .foldLeft(a.zero)(a.reduce)
    val merged = a.finish(a.merge(p1, p2)).items.map(_.key)
    assert(merged === Seq(1L, 6L, 4L)) // 9.0(key 1), 9.0(key 6), 8.0
  }

  test("tie-break is score DESC then key ASC (total order)") {
    val a = new TopKAggregator(2)
    val s = Seq(TopKRow(9, 1.0), TopKRow(2, 1.0), TopKRow(5, 1.0))
      .foldLeft(a.zero)(a.reduce)
    assert(a.finish(s).items.map(_.key) === Seq(2L, 5L))
  }

  test("SET semantics: duplicate (key, score) entries collapse to one " +
      "(documented divergence from ORDER BY ... LIMIT k)") {
    val a = new TopKAggregator(3)
    // the same entry delivered twice (the multi-table LSH collision
    // shape) counts once — a multiset LIMIT 3 would return (1,9),(1,9),(2,5)
    val s = Seq(TopKRow(1, 9.0), TopKRow(1, 9.0), TopKRow(2, 5.0))
      .foldLeft(a.zero)(a.reduce)
    assert(a.finish(s).items === Seq(TopKRow(1, 9.0), TopKRow(2, 5.0)))
    // dedup also holds across a partial-aggregate merge
    val p1 = Seq(TopKRow(1, 9.0), TopKRow(3, 4.0)).foldLeft(a.zero)(a.reduce)
    val p2 = Seq(TopKRow(1, 9.0), TopKRow(2, 5.0)).foldLeft(a.zero)(a.reduce)
    assert(a.finish(a.merge(p1, p2)).items ===
      Seq(TopKRow(1, 9.0), TopKRow(2, 5.0), TopKRow(3, 4.0)))
    // same key at DIFFERENT scores is two distinct entries (dedup is on
    // the full (key, score) pair, not the key)
    val s2 = Seq(TopKRow(1, 9.0), TopKRow(1, 8.0)).foldLeft(a.zero)(a.reduce)
    assert(a.finish(s2).items === Seq(TopKRow(1, 9.0), TopKRow(1, 8.0)))
  }
}
