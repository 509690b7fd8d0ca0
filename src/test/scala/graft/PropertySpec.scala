package graft

import graft.operators.{DedupOps, ReferenceOps, RelationalOps, SimilarityOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tier (SURVEY.md §5.2.4). Samples are drawn with ScalaCheck
  * generators at a fixed seed and evaluated in one batch DataFrame per
  * property — one Spark job per law, not one per case. */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).toSeq)

  test("format_string %04.2f matches java.util.Formatter on arbitrary doubles") {
    import spark.implicits._
    val vals = samples(Gen.chooseNum(-1e6, 1e6), 300).map(v =>
      math.rint(v * 100) / 100) // 2-dp values, the parse domain
    val got = vals.toDF("v")
      .select(ReferenceOps.alertText(col("v")).as("s"))
      .as[String].collect()
    val want = vals.map(v => String.format("Temperature warning %04.2f", Double.box(v)))
    assert(got.toSeq === want)
  }

  test("extractTemp parse round-trip on bare numerics with padding") {
    import spark.implicits._
    val nums = samples(Gen.chooseNum(0.0, 500.0), 200).map(v => math.rint(v * 100) / 100)
    val padded = nums.map(v => s"  $v ")
    val got = padded.toDF("value")
      .select(ReferenceOps.extractTemp(col("value"), "$.bme680_tempf").as("t"))
      .as[Double].collect()
    got.zip(nums).foreach { case (g, w) => assert(g === w) }
  }

  test("tokenize count law: tokens = separators + 1 on single-spaced text") {
    import spark.implicits._
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val text = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    val texts = samples(text, 200)
    val got = texts.toDF("text")
      .select(size(TextOps.tokens(col("text"))).as("n")).as[Int].collect()
    val want = texts.map(_.count(_ == ' ') + 1)
    assert(got.toSeq === want)
  }

  test("jaccard laws: self-similarity 1, symmetry, range [0,1]") {
    import spark.implicits._
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val text = Gen.listOfN(8, word).map(_.mkString(" "))
    val pairs = samples(Gen.zip(text, text), 100)
    val df = pairs.toDF("ta", "tb").select(
      DedupOps.shingles(col("ta")).as("sa"),
      DedupOps.shingles(col("tb")).as("sb"))
    val rows = df.select(
        DedupOps.jaccard(col("sa"), col("sa")).as("self"),
        DedupOps.jaccard(col("sa"), col("sb")).as("ab"),
        DedupOps.jaccard(col("sb"), col("sa")).as("ba"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) === 1.0)
      assert(r.getDouble(1) === r.getDouble(2))
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
    }
  }

  test("scd2 law on random change streams: the interval table replays " +
    "every change exactly (point-in-time lookup == source of truth)") {
    import spark.implicits._
    val ev = Gen.zip(Gen.choose(1L, 8L), Gen.oneOf("a", "b", "c"),
      Gen.choose(0L, 50L))
    val changes = samples(ev, 400).zipWithIndex
      .map { case ((k, v, t), i) => (k, v, t, i.toLong) } // seq = tiebreak
    val out = graft.operators.RelationalOps.scd2Build(
        changes.toDF("k", "v", "t", "seq"), "k", "v", "t", "seq")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4)))
    // brute force: per key, the change-detected version sequence
    val wantVersions = changes.groupBy(_._1).map { case (k, cs) =>
      val ordered = cs.sortBy(c => (c._3, c._4))
      val versions = ordered.foldLeft(Vector.empty[(String, Long, Long)]) {
        case (acc, (_, v, t, seq)) =>
          if (acc.nonEmpty && acc.last._1 == v) acc
          else acc :+ ((v, t, seq))
      }
      k -> versions
    }
    out.groupBy(_._1).foreach { case (k, vs) =>
      val got = vs.sortBy(v => (v._3, v._5)).map(v => (v._2, v._3, v._5))
      assert(got.toVector === wantVersions(k), s"key $k")
    }
    // interval chaining: valid_to == next valid_from, last open
    out.groupBy(_._1).foreach { case (k, vs) =>
      val s = vs.sortBy(v => (v._3, v._5))
      s.sliding(2).foreach {
        case Array(a, b) => assert(a._4.contains(b._3), s"key $k chain")
        case _ => ()
      }
      assert(s.last._4.isEmpty, s"key $k open tail")
    }
  }

  test("merge law on random overlap: action partition and values " +
    "reconcile with a Map-based brute force, NULLs included") {
    import spark.implicits._
    val baseRows = (1L to 40L).map(k => (k, Option(s"b$k")))
    val upd = Gen.zip(Gen.choose(20L, 60L),
      Gen.option(Gen.oneOf("x", "y")))
    val updRows = samples(upd, 30).distinctBy(_._1)
    val out = graft.operators.RelationalOps.mergeUpsert(
        baseRows.toDF("k", "v"), updRows.toDF("k", "v"), "k")
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)), r.getString(2))))
      .toMap
    val baseMap = baseRows.toMap
    val updMap = updRows.toMap
    assert(out.keySet === baseMap.keySet ++ updMap.keySet)
    out.foreach { case (k, (v, action)) =>
      (baseMap.contains(k), updMap.contains(k)) match {
        case (true, true) =>
          assert(action === "update" && v === updMap(k), s"key $k")
        case (true, false) =>
          assert(action === "keep" && v === baseMap(k), s"key $k")
        case (false, true) =>
          assert(action === "insert" && v === updMap(k), s"key $k")
        case _ => fail(s"phantom key $k")
      }
    }
  }

  test("variant path equals the string-JSON path row-for-row") {
    // parse_json/variant_get and get_json_object must agree on every
    // extraction — the VARIANT column is an encoding change, not a
    // semantics change
    val ev = graft.sources.Tables.events(spark, sfDir)
    val viaVariant = ev.select(col("event_id"),
        variant_get(parse_json(col("props")), "$.k", "bigint").as("k"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaString = ev.select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaVariant.toSeq === viaString.toSeq)
    assert(viaVariant.nonEmpty)
  }

  test("dedup idempotence: q_dedup(q_dedup base) is a fixpoint") {
    val once = SparkEntry.queries("q_dedup")(spark, sfDir)
    // applying the same keep-first rule to its own output changes nothing
    val again = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      once.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }
    assert(once.count() === again.count())
    assert(once.exceptAll(again).count() === 0)
  }

  test("set-op algebra on driver data: A∪A=A, A∩A=A, A\\A=∅ (distinct)") {
    val a = graft.sources.Tables.customer(spark, sfDir).select("c_mktsegment")
    val distinctN = a.distinct().count()
    assert(a.union(a).distinct().count() === distinctN)
    assert(a.intersect(a).count() === distinctN)
    assert(a.except(a).count() === 0)
  }

  test("bm25: hand-computed fixture, absent terms score nothing, and " +
      "longer duplicates score lower (length normalization)") {
    import spark.implicits._
    // N=2, avgdl=2.5; terms {a,b}: df(a)=1, df(b)=2 — independently
    // computed: doc1 = ln(2)*2*2.2/(2+1.2*1.15) + ln(1.2)*2.2/(1+1.2*1.15)
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextOps.bm25(docs, "doc_id", "text", Seq("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(1L -> 1.070854, 2L -> 0.198568))
    // a doc with no query term is absent, not zero-scored
    val out2 = TextOps.bm25(
      Seq((1L, "a"), (2L, "z z z")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("a"))
      .collect().map(_.getLong(0)).toSeq
    assert(out2 === Seq(1L))
    // same tf, longer doc → lower score (b-normalization kicks in)
    val out3 = TextOps.bm25(
      Seq((1L, "a x"), (2L, "a x x x x x")).toDF("doc_id", "text"),
      "doc_id", "text", Seq("a"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out3(1L) > out3(2L))
  }

  test("rrfFuse: overlap outranks either single list, scores are the " +
      "published 1/(c+rank) sums, absent ids contribute nothing") {
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rn")
    val b = Seq((30L, 1), (40L, 2)).toDF("doc_id", "rn")
    val out = SimilarityOps.rrfFuse(Seq(a, b), "doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    // 30 is rank-3 lexically and rank-1 densely: 1/63 + 1/61 beats
    // everyone's single-list 1/61; 20 and 40 tie at 1/62 and the id
    // tiebreak orders them deterministically
    assert(out.map(_._1).toSeq === Seq(30L, 10L, 20L, 40L))
    assert(out.head === ((30L, math.rint((1.0/63 + 1.0/61) * 1e6) / 1e6, 2)))
    assert(out.map(t => t._1 -> t._3).toMap ===
      Map(10L -> 1, 20L -> 1, 30L -> 2, 40L -> 1))
  }

  test("profile: null accounting, exact moments, and the constant-column " +
      "stddev clamp") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 5.0), (2.0, 5.0), (3.0, 5.0), (null, 5.0))
      .toDF("x", "c")
    val out = RelationalOps.profile(df, Seq("x", "c")).collect()
      .map(r => r.getString(0) -> r.toSeq.tail).toMap
    // x: 3 values, 1 null, 3 distinct, range [1,3], mean 2, sd 1
    assert(out("x") === Seq(3L, 1L, 3L, 1.0, 3.0, 2.0, 1.0))
    // c: constant → stddev exactly 0 (variance clamp, no NaN from the
    // tiny negative the double fold can produce)
    assert(out("c") === Seq(4L, 0L, 1L, 5.0, 5.0, 5.0, 0.0))
    // determinism under repartitioning (decimal sums are associative)
    assert(RelationalOps.profile(df.repartition(7), Seq("x", "c"))
      .collect().map(_.toSeq).toSet === 
      RelationalOps.profile(df, Seq("x", "c"))
      .collect().map(_.toSeq).toSet)
  }
}
