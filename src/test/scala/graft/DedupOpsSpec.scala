package graft

import graft.operators.DedupOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Dedup family: the banded-LSH plan must return exactly the brute-force
  * answer (recall certainty is the design claim in DedupOps), and the
  * fingerprints must be deterministic and well-formed. */
class DedupOpsSpec extends SparkSpec {

  test("minhash LSH pairs equal brute-force Jaccard pairs (exact recall)") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), DedupOps.shingles(col("text")).as("sh"))
    val a = docs.select(col("doc_id").as("a_id"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("b_id"), col("sh").as("sh_b"))
    val brute = a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(DedupOps.jaccard(col("sh_a"), col("sh_b")), 6).as("jacc"))
      .filter(col("jacc") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = DedupOps.minhashPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh === brute)
    assert(brute.nonEmpty, "corpus should plant near-duplicate pairs")
  }

  test("exact dedup groups carry identical normalized text") {
    val dups = SparkEntry.queries("q_doc_dedup")(spark, sfDir)
      .filter(col("n_dups") > 1)
    val docs = Tables.documents(spark, sfDir)
      .select(md5(lower(trim(col("text")))).as("h"),
        lower(trim(col("text"))).as("norm"))
    // every duplicate-group hash maps to exactly one normalized text
    val clash = docs.join(dups, "h")
      .groupBy("h").agg(countDistinct("norm").as("texts"))
      .filter(col("texts") =!= 1).count()
    assert(clash === 0)
  }

  test("simhash is deterministic and packs into unsigned 32-bit halves") {
    val x = DedupOps.simhash(spark, sfDir).collect()
    val y = DedupOps.simhash(spark, sfDir).collect()
    assert(x.map(_.toSeq).toSeq === y.map(_.toSeq).toSeq)
    x.foreach { r =>
      val hi = r.getLong(1); val lo = r.getLong(2)
      assert(hi >= 0L && hi < (1L << 32))
      assert(lo >= 0L && lo < (1L << 32))
    }
  }

  test("simhash of near-duplicate docs is closer than the corpus median") {
    // hamming distance between the planted near-dup pairs should be
    // well under the all-pairs typical distance (locality property)
    val sh = DedupOps.simhash(spark, sfDir)
      .select(col("doc_id"), (shiftleft(col("sh_hi"), 32) + col("sh_lo")).as("s"))
    val pairs = DedupOps.minhashPairs(spark, sfDir).select("a_id", "b_id")
    val near = pairs
      .join(sh.select(col("doc_id").as("a_id"), col("s").as("sa")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("s").as("sb")), "b_id")
      .select(expr("bit_count(sa ^ sb)").as("d"))
      .agg(avg("d")).head().getDouble(0)
    val all = sh.as("x").join(sh.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(expr("bit_count(x.s ^ y.s)").as("d"))
      .agg(avg("d")).head().getDouble(0)
    assert(near < all,
      s"near-dup mean hamming $near should beat all-pairs mean $all")
  }

  test("embedding pair plan is a hash equi-join — no nested-loop, no cartesian") {
    val p = SparkEntry.queries("q_dedup_embedding")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("block-matrix embedding pairs equal brute-force all-pairs exactly") {
    import graft.functions.VectorOps
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val a = e.select(col("vec_id").as("a_id"), col("e").as("ea"))
    val b = e.select(col("vec_id").as("b_id"), col("e").as("eb"))
    val brute = a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(VectorOps.cosine(col("ea"), col("eb")), 6).as("cos"))
      .filter(col("cos") >= 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val block = DedupOps.embeddingPairs(
        Tables.embeddings(spark, sfDir), "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(block === brute)
    assert(brute.nonEmpty, "corpus should plant qualifying pairs")
  }

  test("hashed-shingle ngram pairs equal string-shingle brute force") {
    // the operator intersects xxhash64 longs; brute force here
    // intersects the raw string shingles — equality proves the hashing
    // introduced no collision on this corpus and the block join lost
    // no pair
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        DedupOps.shingles(col("text")).as("sh"))
    val a = docs.select(col("doc_id").as("a_id"), col("lang").as("la"),
      col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("b_id"), col("lang").as("lb"),
      col("sh").as("sh_b"))
    val brute = a.join(b, col("a_id") < col("b_id") && col("la") === col("lb"))
      .select(col("a_id"), col("b_id"),
        round(DedupOps.jaccard(col("sh_a"), col("sh_b")), 6).as("jacc"))
      .filter(col("jacc") >= 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val blocked = DedupOps.ngramJaccardPairs(Tables.documents(spark, sfDir),
        "doc_id", "text", threshold = 0.3, withinCol = Some("lang"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(blocked === brute)
    assert(brute.nonEmpty, "corpus should plant same-lang near-dup pairs")
  }

  test("setSimJoin's prefix filter is lossless: pairs equal the " +
    "brute-force word-set Jaccard join on the corpus and on a " +
    "synthetic tied-df fixture; disjoint docs pair with nothing") {
    // corpus: exact equality with the O(n^2) within-lang brute force
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        array_distinct(split(col("text"), " ")).as("tk"))
    val a = docs.select(col("doc_id").as("a_id"), col("lang").as("la"),
      col("tk").as("tka"))
    val b = docs.select(col("doc_id").as("b_id"), col("lang").as("lb"),
      col("tk").as("tkb"))
    val inter = size(array_intersect(col("tka"), col("tkb")))
      .cast("double")
    val brute = a.join(b,
        col("a_id") < col("b_id") && col("la") === col("lb"))
      .select(col("a_id"), col("b_id"),
        round(inter / (size(col("tka")) + size(col("tkb")) - inter), 6)
          .as("jacc"))
      .filter(col("jacc") >= 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val got = DedupOps.setSimJoin(Tables.documents(spark, sfDir),
        "doc_id", "text", threshold = 0.6, withinCol = Some("lang"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got === brute)
    assert(brute.nonEmpty, "corpus should plant qualifying pairs")
    // synthetic: heavy df ties + an identical pair + a disjoint doc
    import spark.implicits._
    val syn = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "a b c e"),
      (4L, "x y z w"), (5L, "q r s t u v")).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
    val s = DedupOps.setSimJoin(syn, "doc_id", "text", 0.6, None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(s === Set((1L, 2L, 1.0), (1L, 3L, 0.6), (2L, 3L, 0.6)))
  }

  test("1000-copy boilerplate corpus survives LSH: collapse, cap, re-attach") {
    import spark.implicits._
    // The web-scale degenerate case: a thousand byte-identical pages.
    // Pre-collapse must reduce them to ONE representative before
    // shingling (so no band bucket ever holds the group), and member
    // re-attachment must restore every intra-group pair at jacc 1.0
    // plus the cross pair the representatives find.
    val boiler = (1L to 1000L).map(i =>
      (i, "exact boilerplate page body repeated verbatim across the crawl"))
    val nearA = (2001L,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val nearB = (2002L,
      "alpha beta gamma delta epsilon zeta eta theta iota lambda")
    val solo = (3001L,
      "totally unrelated vocabulary sharing nothing with any other doc")
    val corpus = (boiler ++ Seq(nearA, nearB, solo)).toDF("doc_id", "text")
    val pairs = DedupOps.minhashPairs(corpus, "doc_id", "text", 0.5)
    assert(pairs.count() === 1000L * 999 / 2 + 1)
    val near = pairs.filter(col("a_id") === 2001L).collect()
    assert(near.length === 1 && near(0).getLong(1) === 2002L)
    assert(near(0).getDouble(2) === 0.777778) // round(7/9, 6): 7 of 9 shingles
    val intra = pairs.filter(col("a_id") === 1L && col("b_id") === 2L).head()
    assert(intra.getDouble(2) === 1.0)
  }

  test("oversized band buckets drop with explicit recall loss, not explode") {
    import spark.implicits._
    // Five DISTINCT texts (different repetition counts of the same cycle)
    // share the identical distinct 3-gram shingle set {x y z, y z x,
    // z x y} → identical minhash signatures → one 5-doc bucket in every
    // band, immune to the exact-dup collapse. With the cap below the
    // bucket size the bucket must be dropped (bounded work, logged
    // recall loss), not exploded.
    val corpus = (1 to 5).map(i =>
      (i.toLong, Seq.fill(3 + i)("x y z").mkString(" "))).toDF("doc_id", "text")
    val full = DedupOps.minhashPairs(corpus, "doc_id", "text", 0.5)
    assert(full.count() === 10)
    full.collect().foreach(r => assert(r.getDouble(2) === 1.0))
    val capped = DedupOps.minhashPairs(corpus, "doc_id", "text", 0.5,
      maxBucket = 3)
    assert(capped.count() === 0, "oversized buckets must drop, not explode")
  }

  test("deep components converge in O(log n) rounds, exactly labeled: " +
      "10k-node path graph") {
    import spark.implicits._
    // The worst case for the old min-label propagation (diameter-many
    // sweeps, capped at 20): a single path 0-1-2-…-9999. Alternating
    // large-star/small-star must (a) label every node with component
    // min 0, (b) converge within ~2·log₂(n) rounds, (c) never warn or
    // refuse — the r12 bench tail's maxIters WARN class is now
    // impossible by construction (converges or throws).
    val n = 10000L
    val pairs = spark.range(n - 1)
      .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
    val ids = spark.range(n).select(col("id").as("doc_id"))
    val (clusters, rounds) = DedupOps.nearDupClustersWithRounds(
      pairs.toDF(), ids.toDF(), "doc_id")
    val rows = clusters.collect()
    assert(rows.length === n)
    assert(rows.forall(_.getLong(1) === 0L),
      "every path node labels with the component minimum")
    assert(rows.count(_.getBoolean(2)) === 1, "exactly one keeper")
    val bound = 2 * (math.log(n.toDouble) / math.log(2.0)).ceil.toInt
    assert(rounds <= bound,
      s"$rounds rounds on a diameter-$n path exceeds the O(log n) " +
        s"contract (bound $bound)")
  }

  test("star-forest fixpoint on adversarial shapes: two components, " +
      "reversed ids, duplicate and self edges") {
    import spark.implicits._
    // ids arrive in DESCENDING chains plus noise the contract says to
    // tolerate: duplicate pairs and an accidental self-pair.
    val pairs = Seq(
      (9L, 8L), (8L, 7L), (7L, 6L),           // chain 6..9
      (9L, 8L),                               // duplicate
      (3L, 3L),                               // self edge (ignored)
      (100L, 50L), (50L, 75L)                 // component {50, 75, 100}
    ).toDF("a_id", "b_id")
    val ids = Seq(3L, 6L, 7L, 8L, 9L, 50L, 75L, 100L).toDF("doc_id")
    val got = DedupOps.nearDupClusters(pairs, ids, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSeq
    assert(got === Seq(
      (3L, 3L, true),
      (6L, 6L, true), (7L, 6L, false), (8L, 6L, false), (9L, 6L, false),
      (50L, 50L, true), (75L, 50L, false), (100L, 50L, false)))
  }

  test("near-dup clusters close over transitivity (a~b, b~c ⇒ one cluster)") {
    import spark.implicits._
    // a→b changes tokens 9,10 (jacc 6/10); b→c changes tokens 1,2
    // (jacc 6/10); a vs c differ in shingles 1,2,7,8 (jacc 4/12 < 0.5) —
    // so the PAIR set has no (a, c) edge and only label propagation can
    // put all three in one component. d is a singleton.
    val base = Seq("t1", "t2", "t3", "t4", "t5", "t6", "t7", "t8", "t9", "t10")
    val a = base.mkString(" ")
    val b = (base.dropRight(2) ++ Seq("x9", "x10")).mkString(" ")
    val c = (Seq("y1", "y2") ++ base.drop(2).dropRight(2) ++ Seq("x9", "x10"))
      .mkString(" ")
    val d = "entirely different words with zero shingle overlap anywhere here"
    val corpus = Seq((1L, a), (2L, b), (3L, c), (4L, d)).toDF("doc_id", "text")
    val pairs = DedupOps.minhashPairs(corpus, "doc_id", "text", 0.5)
    val pairSet = pairs.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet === Set((1L, 2L), (2L, 3L)), "no direct a~c edge")
    val clusters = DedupOps.nearDupClusters(pairs,
      corpus.select("doc_id"), "doc_id")
    val rows = clusters.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(rows === Seq((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true)))
  }

  test("spanning edge set yields the same components as the full pairs") {
    import spark.implicits._
    // 100 identical docs + a near-dup pair + a singleton: the spanning
    // form carries 99 star edges + 1 rep pair instead of C(100,2)+1
    // pairs, and must cluster identically
    val corpus = ((1L to 100L).map(i => (i, "same body every single time"))
      ++ Seq(
        (201L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (202L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (301L, "nothing in common with anything else in this tiny corpus")))
      .toDF("doc_id", "text")
    val viaPairs = DedupOps.nearDupClusters(
      DedupOps.minhashPairsUnordered(corpus, "doc_id", "text", 0.5),
      corpus.select("doc_id"), "doc_id").collect().map(_.toSeq).toSeq
    val viaEdges = DedupOps.nearDupClusters(
      DedupOps.nearDupEdges(corpus, "doc_id", "text", 0.5),
      corpus.select("doc_id"), "doc_id").collect().map(_.toSeq).toSeq
    assert(viaEdges === viaPairs)
    val edgeCount = DedupOps.nearDupEdges(corpus, "doc_id", "text", 0.5)
      .count()
    assert(edgeCount === 99L + 1L, "star edges + one rep pair")
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    val rows = SparkEntry.queries("q_dedup_embedding")(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "a_id < b_id canonical order")
      assert(r.getDouble(2) >= 0.45)
    }
  }

  test("reliable-checkpoint mode: with a checkpointDir set, clusters and " +
      "LSH pairs reproduce exactly and checkpoint files land in the dir") {
    import spark.implicits._
    val corpus = ((1L to 30L).map(i => (i, "same body every single time"))
      ++ Seq(
        (201L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (202L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
        (301L, "nothing in common with anything else in this tiny corpus")))
      .toDF("doc_id", "text")
    def run() = DedupOps.nearDupClusters(
      DedupOps.minhashPairsUnordered(corpus, "doc_id", "text", 0.5),
      corpus.select("doc_id"), "doc_id").collect().map(_.toSeq).toSeq
    val viaLocal = run()
    val dir = java.nio.file.Files.createTempDirectory("graft_reliable_ckpt_")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      assert(spark.sparkContext.getCheckpointDir.isDefined)
      val viaReliable = run()
      assert(viaReliable === viaLocal,
        "reliable-checkpoint mode must reproduce the local-mode answer")
      // the blocks really went to the fault-tolerant store
      val wrote = java.nio.file.Files.walk(dir)
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, s"no checkpoint files written under $dir")
    } finally {
      // Option(null) → None: restores executor-local pinning for the
      // rest of the shared-session suites
      spark.sparkContext.setCheckpointDir(null)
      assert(spark.sparkContext.getCheckpointDir.isEmpty)
    }
  }

  test("substring dedup finds exactly the planted passages, cross-doc " +
      "and within-doc, with maximal boundaries") {
    import spark.implicits._
    val passage = (1 to 10).map(i => s"p$i")
    val p = passage.mkString(" ")
    // A and B embed the same 10-token passage at different offsets in
    // otherwise-disjoint text; C is fully distinct; D repeats the
    // passage twice WITHIN itself (self-repetition counts, Lee et al.);
    // E is shorter than k and must be skipped, not crash
    val docA = ((1 to 5).map(i => s"a$i") ++ passage ++
      (1 to 5).map(i => s"z$i")).mkString(" ")
    val docB = ((1 to 3).map(i => s"b$i") ++ passage ++
      (1 to 7).map(i => s"y$i")).mkString(" ")
    val docC = (1 to 20).map(i => s"c$i").mkString(" ")
    val docD = (passage ++ Seq("m1", "m2") ++ passage).mkString(" ")
    val docE = "too short for any gram"
    val corpus = Seq((1L, docA), (2L, docB), (3L, docC), (4L, docD),
      (5L, docE)).toDF("doc_id", "text")
    val got = DedupOps.duplicatePassages(corpus, "doc_id", "text", k = 8)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4))).toSeq
    // 0-based inclusive token spans: A holds the passage at 5..14,
    // B at 3..12, D at 0..9 and 12..21 — and nothing else anywhere
    assert(got === Seq(
      (1L, 5, 14, 10, p),
      (2L, 3, 12, 10, p),
      (4L, 0, 9, 10, p),
      (4L, 12, 21, 10, p)))
  }

  test("substring scrub removes exactly the covered spans; fully-" +
      "duplicated docs drop; the scrubbed corpus re-mines to nothing") {
    import spark.implicits._
    val passage = (1 to 10).map(i => s"p$i")
    val docA = ((1 to 5).map(i => s"a$i") ++ passage ++
      (1 to 5).map(i => s"z$i")).mkString(" ")
    val docB = ((1 to 3).map(i => s"b$i") ++ passage ++
      (1 to 7).map(i => s"y$i")).mkString(" ")
    val docC = (1 to 20).map(i => s"c$i").mkString(" ")
    val docD = (passage ++ Seq("m1", "m2") ++ passage).mkString(" ")
    val docF = passage.mkString(" ") // fully duplicated → drops
    val corpus = Seq((1L, docA), (2L, docB), (3L, docC), (4L, docD),
      (6L, docF)).toDF("doc_id", "text")
    val got = DedupOps.scrubDuplicatePassages(corpus, "doc_id", "text",
        k = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // A and B keep their unique prefixes/suffixes; C is untouched;
    // D keeps only the m1 m2 bridge; F vanishes (all tokens covered)
    assert(got === Seq(
      (1L, 10L, (1 to 5).map(i => s"a$i").mkString(" ") + " " +
        (1 to 5).map(i => s"z$i").mkString(" ")),
      (2L, 10L, (1 to 3).map(i => s"b$i").mkString(" ") + " " +
        (1 to 7).map(i => s"y$i").mkString(" ")),
      (3L, 20L, docC),
      (4L, 2L, "m1 m2")))
    // scrubbing is complete: no duplicated k-gram survives
    val remined = DedupOps.duplicatePassages(
      DedupOps.scrubDuplicatePassages(corpus, "doc_id", "text", k = 8)
        .select(col("doc_id"), col("scrubbed").as("text")),
      "doc_id", "text", k = 8)
    assert(remined.count() === 0L)
  }

  test("keep-first substring scrub: exactly ONE occurrence of each " +
      "duplicated passage survives — at the minimal (doc_id, pos) owner") {
    import spark.implicits._
    val passage = (1 to 10).map(i => s"p$i")
    val p = passage.mkString(" ")
    val docA = ((1 to 5).map(i => s"a$i") ++ passage ++
      (1 to 5).map(i => s"z$i")).mkString(" ")
    val docB = ((1 to 3).map(i => s"b$i") ++ passage ++
      (1 to 7).map(i => s"y$i")).mkString(" ")
    val docF = p // fully duplicated and NOT the owner → still drops
    val corpus = Seq((1L, docA), (2L, docB), (6L, docF))
      .toDF("doc_id", "text")
    val got = DedupOps.scrubDuplicatePassages(corpus, "doc_id", "text",
        k = 8, keepFirst = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // doc 1 owns every passage gram (lowest doc id) → kept INTACT;
    // doc 2's copy is cut; doc 6 vanishes (all tokens covered)
    assert(got === Seq(
      (1L, 20L, docA),
      (2L, 10L, (1 to 3).map(i => s"b$i").mkString(" ") + " " +
        (1 to 7).map(i => s"y$i").mkString(" "))))
    // exactly one surviving occurrence of the passage corpus-wide
    val survivors = got.map(_._3).mkString(" ")
    assert(survivors.indexOf(p) >= 0 &&
      survivors.indexOf(p) === survivors.lastIndexOf(p))
    // within ONE doc, the first occurrence owns its grams and survives
    val gotD = DedupOps.scrubDuplicatePassages(
        Seq((4L, (passage ++ Seq("m1", "m2") ++ passage).mkString(" ")))
          .toDF("doc_id", "text"),
        "doc_id", "text", k = 8, keepFirst = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(gotD === Seq((4L, 12L, p + " m1 m2")))
  }

  test("substring dedup is idempotent on its own output corpus") {
    import spark.implicits._
    // scrubbing the reported spans then re-mining must find nothing:
    // the passage list is the complete duplicated-substring surface
    val passage = (1 to 10).map(i => s"p$i")
    val docA = ((1 to 5).map(i => s"a$i") ++ passage ++
      (1 to 5).map(i => s"z$i")).mkString(" ")
    val docB = ((1 to 3).map(i => s"b$i") ++ passage ++
      (1 to 7).map(i => s"y$i")).mkString(" ")
    val corpus = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val spans = DedupOps.duplicatePassages(corpus, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    val scrubbed = corpus.as[(Long, String)].collect().map { case (id, t) =>
      val toks = t.split(" ").zipWithIndex.filterNot { case (_, i) =>
        spans.exists { case (d, s, e) => d == id && i >= s && i <= e }
      }.map(_._1)
      (id, toks.mkString(" "))
    }.toSeq.toDF("doc_id", "text")
    assert(DedupOps.duplicatePassages(scrubbed, "doc_id", "text", k = 8)
      .count() === 0L)
  }

  test("semantic dedup: deterministic, drops are a subset of the exact " +
      "pair set, and planted parallel copies are always caught") {
    import org.apache.spark.sql.functions._
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    // determinism under repartitioning (Lloyd is hash-seeded + exact)
    val out = DedupOps.semanticDedup(vecs, "vec_id", "embedding", 0.45)
      .select("vec_id", "cell", "keeper")
    assert(out.collect().map(_.toSeq).toSet ===
      DedupOps.semanticDedup(vecs.repartition(7), "vec_id", "embedding",
        0.45).select("vec_id", "cell", "keeper")
        .collect().map(_.toSeq).toSet)
    assert(out.count() === vecs.count())
    // precision is exact BY CONSTRUCTION (within-cell pairs are exact
    // cosine): every non-keeper must appear as the larger id of a pair
    // in the global exact set — cluster pruning can miss, never invent
    val exactDropIds = DedupOps.embeddingPairs(vecs, "vec_id", "embedding",
      0.45).select(col("b_id")).distinct().collect().map(_.getLong(0)).toSet
    val semDropIds = out.filter(!col("keeper")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(semDropIds.subsetOf(exactDropIds),
      s"invented drops: ${semDropIds.diff(exactDropIds)}")
    // the operator's real operating point — near-identical duplicates:
    // a 0.5-scaled copy is exactly parallel (cos 1.0) and BestCell
    // scores scale exactly (power-of-two), so every copy co-clusters
    // with its original and MUST drop; all originals keep (corpus max
    // pair cosine ~0.5, far under 0.95)
    val planted = vecs.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 100000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.5f)).as("embedding"))
    val nPlanted = planted.count()
    assert(nPlanted > 0)
    val sem95 = DedupOps.semanticDedup(vecs.unionByName(planted),
      "vec_id", "embedding", 0.95)
    val dropped95 = sem95.filter(!col("keeper")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(dropped95 === planted.select("vec_id").collect()
      .map(_.getLong(0)).toSet)
  }

  test("zero-norm embeddings pair with nothing (NaN guard, both paths)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // cos(0, x) = 0/0 = NaN; Spark's nan-safe ordering would rank it
    // above any threshold, so an unguarded filter lets one zero vector
    // (e.g. an empty document's embedding) claim its whole cell/block as
    // duplicates — SQL engines exclude NaN from >= and so must we.
    val vecs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val dim = vecs.select(size(col("embedding"))).head.getInt(0)
    val zero = Seq((-1L, Array.fill(dim)(0f))).toDF("vec_id", "embedding")
    val withZero = vecs.unionByName(zero)
    // exact path: the zero vector appears in no pair
    val pairs = DedupOps.embeddingPairs(withZero, "vec_id", "embedding", 0.1)
    assert(pairs.filter(col("a_id") === -1L || col("b_id") === -1L)
      .count() === 0L)
    // clustered path: the zero vector (lowest id — the adversarial
    // placement) drops nobody, and is itself a keeper
    val sem = DedupOps.semanticDedup(withZero, "vec_id", "embedding", 0.1, 4)
    val semBase = DedupOps.semanticDedup(vecs, "vec_id", "embedding", 0.1, 4)
    assert(sem.filter(col("vec_id") === -1L).select("keeper")
      .head.getBoolean(0))
    // non-keepers with the zero vector present must be a subset of the
    // exact pair set's larger ids — the zero vector invents no drops
    val exactDrops = DedupOps.embeddingPairs(vecs, "vec_id", "embedding",
      0.1).select(col("b_id")).distinct().collect().map(_.getLong(0)).toSet
    val semDrops = sem.filter(!col("keeper")).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(semDrops.subsetOf(exactDrops),
      s"zero vector invented drops: ${semDrops.diff(exactDrops)}")
    assert(semBase.count() + 1 === sem.count())
  }

  test("warm semantic twin (q_dedup_semantic_warm) is hash-identical to " +
      "the cold path") {
    val cold = SparkEntry.queries("q_dedup_semantic")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    // two warm calls: the first builds + caches the SemanticIndex, the
    // second must serve from it — both must equal the cold result
    val w1 = SparkEntry.queries("q_dedup_semantic_warm")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    val w2 = SparkEntry.queries("q_dedup_semantic_warm")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(w1 === cold)
    assert(w2 === cold)
  }

  test("semantic dedup cross-cluster recall floor at natural thresholds " +
      "(SemRecallScan fixture, auto-k)") {
    // Perturbed copies (not exactly parallel — they CAN straddle cells)
    // of every 5th vector; ground truth is the exact pair set. All
    // inputs are hash-deterministic, so the measured recall is a fixed
    // number per corpus; floors sit under the measured band
    // (BASELINE.md §semantic-recall: 0.91/0.90 at tau=0.8,
    // 0.78/0.65 at tau=0.6 for sf0.01/sf0.1) with margin for driver
    // corpus regeneration. Precision stays exact (subset property,
    // pinned above) — recall is the only free axis.
    import graft.tools.SemRecallScan
    val vecs = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding").cast("array<double>")
        .as("embedding"))
    for ((alpha, tau, floor) <- Seq((0.62, 0.8, 0.80), (1.17, 0.6, 0.55))) {
      val corpus = SemRecallScan.perturbed(vecs, alpha)
      val exactDrops = DedupOps.embeddingPairs(corpus, "vec_id",
          "embedding", tau).select("b_id").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(exactDrops.nonEmpty)
      val si = DedupOps.semanticIndex(corpus, "vec_id", "embedding")
      val semDrops = si.keepers(tau).filter(!col("keeper"))
        .select("vec_id").collect().map(_.getLong(0)).toSet
      si.close()
      val recall = (semDrops & exactDrops).size.toDouble / exactDrops.size
      assert(recall >= floor,
        f"tau=$tau recall=$recall%.3f under floor $floor")
    }
  }

  test("fuzzyNamePairs: collapse-first multiplicities, distance and " +
    "length filters, and the documented blocking miss") {
    import spark.implicits._
    val df = Seq("red bolt", "red bolt", "red bolt", "red bolts",
      "blue gear", "blue gear", "ted bolt", "red bolt extra long name")
      .toDF("nm")
    val got = graft.operators.DedupOps.fuzzyNamePairs(df, "nm",
        org.apache.spark.sql.functions.substring(
          org.apache.spark.sql.functions.col("name"), 1, 1),
        maxDistance = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    // 'red bolt'↔'red bolts' d=1 with counts 3 and 1 — the only pair:
    // 'ted bolt' (d=1 from 'red bolt') is in block 't' — the blocking
    // recall trade, asserted missed; the long variant fails the
    // |len diff| <= maxDistance necessary filter; 'blue gear' has no
    // in-block partner
    assert(got.toSeq === Seq(("red bolt", "red bolts", 1, 3L, 1L)))
    assert(intercept[IllegalArgumentException] {
      graft.operators.DedupOps.fuzzyNamePairs(df, "nm",
        org.apache.spark.sql.functions.col("name"), 0)
    }.getMessage.contains("maxDistance"))
  }
}
