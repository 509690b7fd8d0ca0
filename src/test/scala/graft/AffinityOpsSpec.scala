package graft

import graft.operators.{AffinityOps, GraphOps}
import org.apache.spark.sql.functions._

/** Laws for the affinity tier (co-occurrence PMI, basket rules) and
  * the triangle counter it feeds. The oracle gate hash-compares all
  * three registered queries against DuckDB at sf0.01; these pin the
  * algorithms on hand-computed fixtures plus the two structural
  * equivalences the implementations rely on: shift-zip ≡ positions
  * self-join, and degree-ordered ≡ id-ordered triangle enumeration.
  */
class AffinityOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- co-occurrence ----

  test("cooccurPairs hand check: window pairs of 'a b c a' at w=2 " +
    "are {(a,b):2, (a,c):2, (b,c):1} with the self-pair (a,a) excluded") {
    val docs = Seq((1L, "a b c a")).toDF("doc_id", "text")
    // distance 1: (a,b),(b,c),(c,a); distance 2: (a,c),(b,a); (c→a+2) off end
    val got = AffinityOps.cooccurPairs(docs, "text", window = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(got === Map(("a", "b") -> 2L, ("a", "c") -> 2L, ("b", "c") -> 1L))
  }

  test("shift-zip ≡ positions self-join on random docs (the oracle's " +
    "formulation)") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("x", "y", "z", "w", "v")
    val docs = (0 until 40).map(i => (i.toLong,
      Seq.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))).toDF("doc_id", "text")
    val w = 3
    val zip = AffinityOps.cooccurPairs(docs, "text", w)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    val pos = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val ref = pos.as("a").join(pos.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") > col("a.pos") &&
          col("b.pos") <= col("a.pos") + w &&
          col("a.tok") =!= col("b.tok"))
      .select(least(col("a.tok"), col("b.tok")).as("t1"),
        greatest(col("a.tok"), col("b.tok")).as("t2"))
      .groupBy("t1", "t2").count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(zip === ref)
  }

  test("cooccurPmi hand check: pmi of a pair occurring exactly at " +
    "independence is 0") {
    // two docs 'a b' and 'b a': pairs (a,b):2; unigrams a:2 b:2, T=4;
    // P=2. pmi = ln(2*4*4 / (2*2*2)) = ln(4) — NOT independence; use
    // the direct formula to pin the arithmetic instead.
    val docs = Seq((1L, "a b"), (2L, "b a")).toDF("doc_id", "text")
    val got = AffinityOps.cooccurPmi(docs, "text", window = 1,
      minCount = 1, k = 10).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) === ("a", "b", 2L))
    assert(math.abs(r.getDouble(3) - math.log(4.0)) < 1e-6)
  }

  test("q_cooccur_pmi output: descending pmi, unique canonical pairs, " +
    "count floor respected") {
    val out = SparkEntry.queries("q_cooccur_pmi")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val pmis = out.map(_.getDouble(3))
    assert(pmis.sameElements(pmis.sorted.reverse))
    assert(out.forall(r => r.getString(0) < r.getString(1)))
    assert(out.forall(_.getLong(2) >= 5L))
    assert(out.map(r => (r.getString(0), r.getString(1))).distinct.length
      === out.length)
  }

  // ---- basket rules ----

  test("basketRules hand check: support/confidence/lift on a 4-basket " +
    "fixture match the textbook numbers") {
    // baskets: {m,b}, {m,b,d}, {m,d}, {b}
    val df = Seq((1, "m"), (1, "b"), (2, "m"), (2, "b"), (2, "d"),
      (3, "m"), (3, "d"), (4, "b")).toDF("bk", "it")
    val got = AffinityOps.basketRules(df, "bk", "it", minSupport = 2,
      k = 10).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // c(m)=3 c(b)=3 c(d)=2 N=4; pairs: (m,b):2 (m,d):2 (b,d):1(<minsup)
    assert(got.keySet === Set(("m", "b"), ("b", "m"), ("m", "d"), ("d", "m")))
    val (n1, s1, c1, l1) = got(("m", "b"))
    assert(n1 === 2L && s1 === 0.5 && math.abs(c1 - 0.666667) < 1e-9 &&
      math.abs(l1 - 0.888889) < 1e-9)
    val (n2, s2, c2, l2) = got(("d", "m"))
    assert(n2 === 2L && s2 === 0.5 && c2 === 1.0 &&
      math.abs(l2 - 1.333333) < 1e-9)
  }

  test("maxBasket cap excludes oversized baskets from every count " +
    "(pairs, item counts, and N)") {
    // basket 9 has 3 items and is excluded at maxBasket=2 — N drops to
    // 2 and item counts no longer see basket 9's items
    val df = Seq((1, "x"), (1, "y"), (2, "x"), (2, "y"),
      (9, "x"), (9, "y"), (9, "z")).toDF("bk", "it")
    val got = AffinityOps.basketRules(df, "bk", "it", minSupport = 2,
      maxBasket = 2, k = 10).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // after cap: N=2, c(x)=c(y)=2, pair (x,y):2 → support 1, conf 1,
    // lift = 2*2/(2*2) = 1... wait lift = n_pair*N/(ca*cb) = 4/4 = 1
    assert(got === Map(
      ("x", "y") -> ((2L, 1.0, 1.0, 1.0)),
      ("y", "x") -> ((2L, 1.0, 1.0, 1.0))))
  }

  // ---- triangles ----

  test("triangles hand check: K4 has exactly 4 triangles, a square " +
    "has none, and input direction/duplication is irrelevant") {
    val k4 = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      (2, 1), (3, 1)) // duplicates in reverse direction
      .toDF("src", "dst")
    val tri = GraphOps.triangles(k4).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    assert(tri.toSeq === Seq((1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)))
    val square = Seq((1, 2), (2, 3), (3, 4), (4, 1)).toDF("src", "dst")
    assert(GraphOps.triangles(square).count() === 0L)
  }

  test("degree-ordered enumeration ≡ id-ordered enumeration on random " +
    "graphs (the oracle's formulation)") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 300).map(_ =>
      (rnd.nextInt(30), rnd.nextInt(30))).distinct
      .filter(e => e._1 != e._2)
      .toDF("src", "dst")
    val got = GraphOps.triangles(edges).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    val e = edges.select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v")).distinct()
    val ref = e.as("ab").join(e.as("bc"), col("ab.v") === col("bc.u"))
      .join(e.as("ac"), col("ac.u") === col("ab.u") &&
        col("ac.v") === col("bc.v"))
      .select(col("ab.u"), col("ab.v"), col("bc.v"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(got === ref && got.nonEmpty)
  }

  test("parameter domains are validated") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(intercept[IllegalArgumentException] {
      AffinityOps.cooccurPairs(docs, "text", window = 0)
    }.getMessage.contains("window"))
    val df = Seq((1, "x")).toDF("bk", "it")
    assert(intercept[IllegalArgumentException] {
      AffinityOps.basketRules(df, "bk", "it", maxBasket = 1)
    }.getMessage.contains("maxBasket"))
  }
}
