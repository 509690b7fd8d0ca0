package graft

import graft.operators.{CurationOps, DedupOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Curation tier laws beyond the oracle hashes: determinism, rate
  * tolerance, split totality, decontamination soundness, pack bounds. */
class CurationSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  test("stratified sample is deterministic and lands near its rates") {
    val s1 = CurationOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.25), defaultRate = 0.5)
    val s2 = CurationOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.25), defaultRate = 0.5)
    assert(s1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      s2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    total.foreach { case (lang, n) =>
      val rate = kept.getOrElse(lang, 0L).toDouble / n
      val want = if (lang == "en") 0.25 else 0.5
      // 16-bit uniform draw: ±3.5σ binomial tolerance on a small corpus
      val tol = 3.5 * math.sqrt(want * (1 - want) / n)
      assert(math.abs(rate - want) <= tol,
        s"$lang rate $rate vs $want (n=$n, tol $tol)")
    }
  }

  test("hash split is total, disjoint, and near 80/10/10") {
    val sp = CurationOps.hashSplit(docs, "doc_id")
    val n = docs.count()
    assert(sp.count() === n)
    val byS = sp.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.values.sum === n)
    assert(byS.keySet.subsetOf(Set("train", "val", "test")))
    val trainRate = byS("train").toDouble / n
    assert(math.abs(trainRate - 0.8) <= 3.5 * math.sqrt(0.8 * 0.2 / n),
      s"train rate $trainRate")
  }

  test("decontaminated survivors share zero shingles with the benchmark") {
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val clean = CurationOps.decontaminate(
      docs.filter(col("doc_id") % 50 =!= 0), "doc_id", "text", bench, "text")
    val benchSh = bench
      .select(explode(DedupOps.shingles(col("text"))).as("sh")).distinct()
    val overlap = clean
      .select(explode(DedupOps.shingles(col("text"))).as("sh"))
      .join(benchSh, "sh").count()
    assert(overlap === 0L)
    assert(clean.count() > 0, "decontamination must not empty the corpus")
  }

  test("bloom decontamination is one-sided: drops every contaminated " +
      "doc, never ships one") {
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val exact = CurationOps.decontaminate(
      corpus, "doc_id", "text", bench, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // a loose filter (high fpp) still never yields a contaminated doc:
    // bloomClean ⊆ exactClean at ANY fpp (no false negatives)
    val loose = CurationOps.decontaminateBloom(
      corpus, "doc_id", "text", bench, "text", fpp = 0.05)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(loose.subsetOf(exact))
    // at the default fpp the loss stays bounded (never zero by promise:
    // Spark's sketch bloom has an FP floor ≈ 0.5/numBits — Scaladoc)
    val tight = CurationOps.decontaminateBloom(
      corpus, "doc_id", "text", bench, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(tight.subsetOf(exact))
    assert((exact.size - tight.size).toDouble / exact.size <= 0.01,
      s"bloom dropped ${exact.size - tight.size} extra of ${exact.size}")
  }

  test("bloom decontamination clamps to the session's bloom_filter_agg " +
      "caps instead of throwing, staying one-sided") {
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val exact = CurationOps.decontaminate(
      corpus, "doc_id", "text", bench, "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // Caps far below what fpp=1e-6 would request for this benchmark:
    // without the clamp bloom_filter_agg raises an AnalysisException.
    val items = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bits = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val (oldItems, oldBits) = (spark.conf.get(items), spark.conf.get(bits))
    try {
      spark.conf.set(items, "256")
      spark.conf.set(bits, "4096")
      val clamped = CurationOps.decontaminateBloom(
        corpus, "doc_id", "text", bench, "text")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // degraded fpp may drop extra clean docs, never ship dirty ones
      assert(clamped.subsetOf(exact))
    } finally {
      spark.conf.set(items, oldItems)
      spark.conf.set(bits, oldBits)
    }
  }

  test("funnel counts are internally consistent and total to the corpus") {
    val rep = CurationOps.funnelReport(docs, "doc_id", "text",
      Seq("source", "lang")).collect()
    assert(rep.map(_.getAs[Long]("n_docs")).sum === docs.count())
    rep.foreach { r =>
      val (n, q, k, f) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_quality"),
        r.getAs[Long]("n_keepers"), r.getAs[Long]("n_final"))
      assert(q <= n && k <= n && f <= math.min(q, k))
    }
    // keepers over the whole corpus = number of distinct normalized texts
    assert(rep.map(_.getAs[Long]("n_keepers")).sum ===
      docs.select(md5(lower(trim(col("text"))))).distinct().count())
  }

  test("cluster-aware funnel: near-dup stage is coherent with the " +
      "cluster table and nested inside the exact stage") {
    val ck = DedupOps.nearDupClusters(
      DedupOps.nearDupEdges(docs, "doc_id", "text", 0.5),
      docs.select("doc_id"), "doc_id")
    val rep = CurationOps.funnelReport(docs, "doc_id", "text",
      Seq("source", "lang"), clusterKeepers = Some(ck)).collect()
    rep.foreach { r =>
      val (k, f) = (r.getAs[Long]("n_keepers"), r.getAs[Long]("n_final"))
      val (nk, nf) =
        (r.getAs[Long]("n_nd_keepers"), r.getAs[Long]("n_final_nd"))
      // a cluster keeper is the component minimum, hence also the
      // minimum of its own exact-digest group: nd keepers ⊆ keepers
      assert(nk <= k && nf <= f && nf <= nk)
    }
    // nd keepers over the corpus = number of near-dup clusters
    assert(rep.map(_.getAs[Long]("n_nd_keepers")).sum ===
      ck.filter(col("keeper")).count())
    assert(rep.map(_.getAs[Long]("n_nd_keepers")).sum ===
      ck.select("cluster_id").distinct().count())
  }

  test("sequence packs respect the greedy token bound") {
    val packed = CurationOps.packSequences(docs, "doc_id", "text", "lang",
      packTokens = 2048)
    // within each (lang, pack), the running total BEFORE the last doc is
    // under the budget — the greedy invariant (the last doc may overflow)
    val bad = packed
      .groupBy("lang", "pack_id")
      .agg(sum("n_tokens").as("tot"), max("n_tokens").as("mx"))
      .filter(col("tot") - col("mx") >= 2048)
      .count()
    assert(bad === 0L)
    // packs are dense per lang: ids 0..max with no gaps
    val dense = packed.groupBy("lang")
      .agg(countDistinct("pack_id").as("n"), max("pack_id").as("mx"))
      .filter(col("n") =!= col("mx") + 1).count()
    assert(dense === 0L)
  }

  test("PII scrub redacts emails and long digit runs, nothing else") {
    import spark.implicits._
    val rows = Seq(
      "mail bob.smith+x@sub.example.co.uk now",
      "id 123456789 and short 12345 stays",
      "clean text with no pii at all")
      .toDF("t")
      .select(CurationOps.scrubPii(col("t")).as("s"))
      .collect().map(_.getString(0))
    assert(rows(0) === "mail <EMAIL> now")
    assert(rows(1) === "id <ID> and short 12345 stays")
    assert(rows(2) === "clean text with no pii at all")
  }

  test("chunkDocuments: fixed windows share exactly the overlap and " +
      "reconstruct the document; short docs pass through as chunk 0") {
    import spark.implicits._
    val toks = (1 to 78).map(i => s"t$i")
    val df = Seq((1L, toks.mkString(" ")), (2L, "just a few tokens here"))
      .toDF("doc_id", "text")
    val got = CurationOps
      .chunkDocuments(df, "doc_id", "text", maxTokens = 32, overlap = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val one = got.filter(_._1 == 1L).sortBy(_._2)
    // dense chunk ids, every chunk within the window bound
    assert(one.map(_._2).toSeq === (0 until one.length))
    assert(one.forall(_._3 <= 32))
    // a full chunk's last 4 tokens are the next chunk's first 4
    one.sliding(2).foreach {
      case Array(a, b) if a._3 == 32 =>
        assert(a._4.split(" ").takeRight(4).toSeq ===
          b._4.split(" ").take(4).toSeq)
      case _ =>
    }
    // dropping each later chunk's overlap reconstructs the document
    val rec = one.head._4.split(" ").toSeq ++
      one.tail.toSeq.flatMap(_._4.split(" ").drop(4).toSeq)
    assert(rec === toks)
    // a doc at or under maxTokens is exactly its own chunk 0
    assert(got.filter(_._1 == 2L).toSeq ===
      Seq((2L, 0, 5, "just a few tokens here")))
  }

  test("funnelReport keeps NULL-text documents in every count (the " +
      "digest join is null-safe)") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("the a of and words here and more of the tokens " +
        "padding out to a plausible length for the band")),
      (2L, Option.empty[String]),
      (3L, Option.empty[String]))
      .toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("lang", lit("en"))
    val rows = CurationOps.funnelReport(df, "doc_id", "text",
      Seq("source", "lang")).collect()
    // all three docs are counted; the two NULL-text docs form one
    // digest group whose keeper is the minimum id
    assert(rows.map(_.getAs[Long]("n_docs")).sum === 3L)
    assert(rows.map(_.getAs[Long]("n_keepers")).sum === 2L)
  }

  test("quality filter keeps exactly the in-band documents") {
    val kept = CurationOps.qualityFilter(docs, "text")
    kept.select("n_tokens", "stop_ratio", "avg_tok_len").collect()
      .foreach { r =>
        assert(r.getInt(0) >= 20 && r.getInt(0) <= 80)
        assert(r.getDouble(1) >= 0.02)
        assert(r.getDouble(2) <= 5.0)
      }
    assert(kept.count() > 0)
  }

  test("token-budget sample: two-level prefix sum equals the one-window " +
      "reference, prefix property holds, budget is respected") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val budget = 8000L
    val out = CurationOps.sampleTokenBudget(docs, "doc_id", "text", budget)
    // reference: the global single-window cumulative sum (the shape the
    // distributed version must agree with exactly)
    val ref = docs.select(col("doc_id"),
        md5(concat(lit("budget:"), col("doc_id").cast("string"))).as("h"),
        size(split(col("text"), " ")).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens").cast("long")).over(
        Window.orderBy(col("h"), col("doc_id"))))
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "n_tokens", "cum_tokens")
    assert(out.collect().map(_.toSeq).toSet ===
      ref.collect().map(_.toSeq).toSet)
    // budget respected, non-trivial, and a true prefix: max cum plus the
    // NEXT doc in hash order must exceed the budget (nothing was skipped)
    val kept = out.collect()
    assert(kept.nonEmpty && kept.length < docs.count())
    val maxCum = kept.map(_.getAs[Long]("cum_tokens")).max
    assert(maxCum <= budget)
    val nextTokens = docs.select(col("doc_id"),
        md5(concat(lit("budget:"), col("doc_id").cast("string"))).as("h"),
        size(split(col("text"), " ")).as("n_tokens"))
      .join(out.select(col("doc_id"), lit(1).as("k")), Seq("doc_id"), "left")
      .filter(col("k").isNull).orderBy("h", "doc_id")
      .select("n_tokens").head.getInt(0)
    assert(maxCum + nextTokens > budget)
    // determinism under repartitioning
    assert(CurationOps.sampleTokenBudget(docs.repartition(7), "doc_id",
        "text", budget).collect().map(_.toSeq).toSet ===
      kept.map(_.toSeq).toSet)
  }

  test("corpus shuffle: total, deterministic, contiguous per-shard ranks, " +
      "shuffle order independent of id order") {
    import org.apache.spark.sql.functions._
    val n = docs.count()
    val out = CurationOps.corpusShuffle(docs, "doc_id", nShards = 8)
      .select("doc_id", "shard", "pos")
    // total: every document assigned exactly once
    assert(out.count() === n)
    // rerun is bit-identical (no RNG state, stable under repartitioning)
    assert(out.collect().map(_.toSeq).toSet ===
      CurationOps.corpusShuffle(docs.repartition(7), "doc_id", 8)
        .select("doc_id", "shard", "pos").collect().map(_.toSeq).toSet)
    // per-shard positions are exactly 1..count(shard) — an export can
    // address (shard, pos) as a dense file offset
    out.groupBy("shard").agg(count(lit(1)).as("c"), max(col("pos")).as("m"),
        min(col("pos")).as("lo"), countDistinct(col("pos")).as("d"))
      .collect().foreach { r =>
        assert(r.getAs[Long]("c") === r.getAs[Int]("m").toLong)
        assert(r.getAs[Int]("lo") === 1)
        assert(r.getAs[Long]("d") === r.getAs[Long]("c"))
      }
    // shards cover the full range and are roughly balanced (md5 uniform:
    // each shard within 3x of fair share on 500 docs)
    val sizes = out.groupBy("shard").count().collect()
      .map(r => r.getAs[Int]("shard") -> r.getAs[Long]("count")).toMap
    assert(sizes.keySet === (0 until 8).toSet)
    sizes.values.foreach(c => assert(c > n / 24 && c < n * 3 / 8))
    // the permutation actually shuffles: within-shard order must not be
    // id order (P(sorted by chance) ~ 1/(m!) per shard)
    val firstShard = out.filter(col("shard") === 0)
      .orderBy("pos").select("doc_id").collect().map(_.getLong(0))
    assert(firstShard.length > 3)
    assert(!(firstShard.toSeq == firstShard.sorted.toSeq))
  }

  test("weighted sample: exact size, weight-tilted, deterministic " +
    "under repartitioning, and exactly the top-n by A-ES key") {
    import graft.operators.CurationOps
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val n = 50
    val out = CurationOps.weightedSample(docs, "doc_id", "n_chars", n)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.length === n)
    val corpusMean = docs.agg(avg(col("n_chars"))).head().getDouble(0)
    val sampleMean = out.map(_._2).sum / n
    assert(sampleMean > corpusMean,
      s"weighting must tilt the sample: $sampleMean vs $corpusMean")
    val again = CurationOps
      .weightedSample(docs.repartition(7), "doc_id", "n_chars", n)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(again.toSeq === out.toSeq)
    // the selected ids are exactly the brute-force top-n keys
    val all = docs.select(col("doc_id"), col("n_chars")).collect()
      .map { r =>
        val id = r.getLong(0)
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$id-wsamp".getBytes("UTF-8"))
          .take(2).map("%02x".format(_)).mkString
        val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 65536.0
        (id, math.pow(u, 1.0 / r.getLong(1)))
      }
    val want = all.sortBy { case (id, k) => (-k, id) }.take(n)
      .map(_._1).toSet
    assert(out.map(_._1).toSet === want)
  }

  test("urlNormalize: canonicalizes the crawl-mess cases by hand, is " +
    "idempotent, and q_url_normalize flags exactly one keeper per " +
    "canonical URL") {
    import spark.implicits._
    import graft.operators.CurationOps.urlNormalize
    val cases = Seq(
      "HTTPS://WWW.Site.com/A/B?utm_source=x#top" -> "site.com/a/b",
      "http://site.com/a/b/" -> "site.com/a/b",
      "site.com/a/b?page=2&utm_campaign=c" -> "site.com/a/b?page=2",
      "www.site.com/a?utm_a=1&id=2&fbclid=zz" -> "site.com/a?id=2",
      "  https://Site.Com  " -> "site.com")
    val got = cases.map(_._1).toDF("u")
      .select(urlNormalize(col("u")).as("n"),
        urlNormalize(urlNormalize(col("u"))).as("nn"))
      .collect()
    got.zip(cases).foreach { case (r, (in, want)) =>
      assert(r.getString(0) === want, s"normalize($in)")
      assert(r.getString(1) === r.getString(0), s"idempotence($in)")
    }
    val out = SparkEntry.queries("q_url_normalize")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(3)))
    val byUrl = out.groupBy(_._2)
    byUrl.foreach { case (u, rows) =>
      assert(rows.count(_._3) === 1, s"$u keepers")
      assert(rows.minBy(_._1)._3, s"$u keeper must be the lowest doc_id")
    }
  }

  test("mixtureAllocation apportions the budget exactly, each source " +
    "gets floor(quota) or floor+1, and sqrt smoothing boosts small " +
    "sources' sampling rate") {
    import spark.implicits._
    val docs = Seq(
      ("big", ("w " * 999).trim), ("big", ("w " * 999).trim),
      ("mid", ("w " * 199).trim), ("mid", ("w " * 199).trim),
      ("small", ("w " * 49).trim))
      .toDF("source", "text")
    val budget = 1000L
    val got = CurationOps.mixtureAllocation(docs, "source", "text", budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.map(_._4).sum === budget)
    // Hamilton: alloc within 1 of the exact quota
    val wts = got.map(g => g._1 -> math.sqrt(g._2.toDouble)).toMap
    val wsum = wts.values.sum
    got.foreach { case (src, _, _, alloc, _) =>
      val quota = budget * wts(src) / wsum
      assert(alloc === math.floor(quota).toLong ||
        alloc === math.floor(quota).toLong + 1, s"$src $alloc vs $quota")
    }
    // sqrt smoothing: the small source is sampled at a HIGHER rate
    val rate = got.map(g => g._1 -> g._5).toMap
    assert(rate("small") > rate("mid") && rate("mid") > rate("big"))
    // weights normalize to ~1
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-4)
  }

  test("featureScale: minmax hits [0,1] exactly at the extremes, " +
    "zscore has mean ~0 / sd ~1, constant columns scale to NULL") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, i.toDouble)).toDF("k", "v")
    val rows = CurationOps.featureScale(df, "k", "v").collect()
    val mms = rows.map(_.getAs[Double]("minmax"))
    assert(mms.min === 0.0 && mms.max === 1.0)
    assert(mms.toSeq === mms.sorted.toSeq) // monotone in v
    val zs = rows.map(_.getAs[Double]("zscore"))
    assert(math.abs(zs.sum / zs.length) < 1e-6)
    val sd = math.sqrt(zs.map(z => z * z).sum / (zs.length - 1))
    assert(math.abs(sd - 1.0) < 1e-3)
    val const = (1 to 10).map(i => (i.toLong, 7.0)).toDF("k", "v")
    CurationOps.featureScale(const, "k", "v").collect().foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3))
    }
  }

  test("targetEncode: big categories keep ~their raw mean, rare ones " +
    "shrink toward the global mean, encoding is bounded by the two") {
    import spark.implicits._
    val df = ((1 to 1000).map(_ => ("big", 10.0)) ++
      Seq(("rare", 1000.0), ("rare", 1000.0))).toDF("c", "t")
    val got = CurationOps.targetEncode(df, "c", "t", m = 100.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val mu = (1000 * 10.0 + 2 * 1000.0) / 1002
    val (nb, rawB, encB) = got("big")
    val (nr, rawR, encR) = got("rare")
    assert(nb === 1000L && rawB === 10.0 && nr === 2L && rawR === 1000.0)
    // exact closed forms
    assert(encB === math.round((1000 * 10.0 + 100 * mu) / 1100 * 1e6) / 1e6)
    assert(encR === math.round((2 * 1000.0 + 100 * mu) / 102 * 1e6) / 1e6)
    // rare category shrinks nearly to mu; big barely moves
    assert(math.abs(encR - mu) < math.abs(rawR - mu) / 10)
    assert(math.abs(encB - rawB) < 2.0)
    // bounded between raw mean and global mean
    assert(encR >= math.min(rawR, mu) && encR <= math.max(rawR, mu))
  }

  test("srmCheck: tiny chi2 on a ratio-true assignment, large on a " +
    "dropped-shard mismatch, hand-computed terms, and undeclared " +
    "labels are excluded from the statistic") {
    import spark.implicits._
    // exactly-proportional assignment → chi2 = 0
    val exact = (Seq.fill(800)("a") ++ Seq.fill(200)("b"))
      .toDF("split")
    val r0 = CurationOps.srmCheck(exact, "split",
      Seq("a" -> 0.8, "b" -> 0.2)).collect()
    assert(r0.forall(_.getAs[Double]("chi2") === 0.0))
    assert(r0.forall(_.getAs[Long]("dof") === 1L))
    // dropped shard: half of 'b' vanished → big chi2
    val dropped = (Seq.fill(800)("a") ++ Seq.fill(100)("b"))
      .toDF("split")
    val rd = CurationOps.srmCheck(dropped, "split",
      Seq("a" -> 0.8, "b" -> 0.2)).collect()
    val chi2 = rd.head.getAs[Double]("chi2")
    // hand computation: n=900, e_a=720, e_b=180
    val expChi = (800.0 - 720) * (800 - 720) / 720 +
      (100.0 - 180) * (100 - 180) / 180
    assert(math.abs(chi2 - expChi) < 1e-6, s"got $chi2 exp $expChi")
    assert(chi2 > 6.63, "a halved shard must clear the 1% line")
    // an undeclared label is excluded (schema bug, not a ratio term)
    // AND does not inflate the total the expected counts derive from:
    // terms must compute against n=100 declared rows, not 105
    val stray = (Seq.fill(80)("a") ++ Seq.fill(20)("b") ++
      Seq.fill(5)("oops")).toDF("split")
    val rs = CurationOps.srmCheck(stray, "split",
      Seq("a" -> 0.8, "b" -> 0.2)).collect()
    assert(rs.map(_.getString(0)).toSet === Set("a", "b"))
    assert(rs.forall(_.getAs[Double]("chi2") === 0.0),
      "stray labels must not bias E = p*n (declared-only total)")
    // a declared arm with ZERO observed rows — the fully-dropped-shard
    // case — must surface with n=0 and its full (0-E)^2/E term
    val gone = Seq.fill(90)("a").toDF("split")
    val rg = CurationOps.srmCheck(gone, "split",
      Seq("a" -> 0.9, "b" -> 0.1)).collect()
    assert(rg.map(_.getString(0)).toSet === Set("a", "b"))
    val bRow = rg.find(_.getString(0) == "b").get
    assert(bRow.getAs[Long]("n") === 0L)
    // n=90, e_a=81, e_b=9: chi2 = 81/81 + 81/9 = 10
    assert(math.abs(bRow.getAs[Double]("chi2") - 10.0) < 1e-6,
      s"zero-observed arm must contribute its full E term: $bRow")
  }

  test("rankNormalize: inclusive per-group ECDF — max hits exactly 1, " +
    "ties share a rank, monotone in the value, and one wild outlier " +
    "cannot distort the rest (unlike min-max)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = Seq(
      (1L, "g1", 10.0), (2L, "g1", 20.0), (3L, "g1", 20.0),
      (4L, "g1", 30.0),
      (5L, "g2", 5.0), (6L, "g2", 6.0), (7L, "g2", 1.0e9)) // outlier
    val out = CurationOps.rankNormalize(rows.toDF("id", "grp", "v"),
      "grp", "id", "v").collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("pct_rank")).toMap
    // g1: cum/n over 4 rows with a tie at 20
    assert(out(1L) === 0.25)
    assert(out(2L) === 0.75 && out(3L) === 0.75) // ties share cum(≤v)
    assert(out(4L) === 1.0)                      // max is exactly 1
    // g2: the 1e9 outlier lands at 1.0 and leaves the others at their
    // rank positions — min-max would have crushed 5.0 and 6.0 to ~0
    assert(out(5L) === math.round(1.0 / 3 * 1e6) / 1e6)
    assert(out(6L) === math.round(2.0 / 3 * 1e6) / 1e6)
    assert(out(7L) === 1.0)
    // per-group monotone in v
    val g1 = Seq(out(1L), out(2L), out(4L))
    assert(g1 === g1.sorted)
  }

  test("quantileNormalize: hand fixture maps both columns onto the " +
    "rank-mean reference; tie spans average; post-normalization " +
    "multisets are identical across columns; NULL rows excluded") {
    import spark.implicits._
    // col a = [1, 2, 3], col b = [10, 20, 30] -> reference =
    // [(1+10)/2, (2+20)/2, (3+30)/2] = [5.5, 11, 16.5]
    val df = Seq((1L, 1.0, 30.0), (2L, 2.0, 10.0), (3L, 3.0, 20.0))
      .toDF("id", "a", "b")
    val out = CurationOps.quantileNormalize(df, "id", Seq("a", "b"))
      .collect().sortBy(_.getLong(0))
    assert(out.map(_.getAs[Double]("qn_a")).toSeq ===
      Seq(5.5, 11.0, 16.5))
    // b's order was 30,10,20 -> ranks 3,1,2 -> 16.5, 5.5, 11
    assert(out.map(_.getAs[Double]("qn_b")).toSeq ===
      Seq(16.5, 5.5, 11.0))
    // ties: a = [1, 1, 2] -> value 1 spans ranks 1-2, gets their mean
    val tied = Seq((1L, 1.0, 10.0), (2L, 1.0, 20.0), (3L, 2.0, 30.0))
      .toDF("id", "a", "b")
    val ot = CurationOps.quantileNormalize(tied, "id", Seq("a", "b"))
      .collect().sortBy(_.getLong(0))
    // reference: r1 (1+10)/2 = 5.5, r2 (1+20)/2 = 10.5, r3 16
    assert(ot(0).getAs[Double]("qn_a") === 8.0) // mean of 5.5, 10.5
    assert(ot(1).getAs[Double]("qn_a") === 8.0)
    assert(ot(2).getAs[Double]("qn_a") === 16.0)
    // identical multisets after normalization on a random frame
    val rnd = new scala.util.Random(71)
    val big = (1 to 2000).map(i => (i.toLong,
      rnd.nextGaussian() * 10, math.exp(rnd.nextGaussian()),
      rnd.nextInt(50).toDouble)).toDF("id", "x", "y", "z")
    val ob = CurationOps.quantileNormalize(big, "id",
      Seq("x", "y", "z")).collect()
    val mx = ob.map(_.getAs[Double]("qn_x")).sorted.toSeq
    val my = ob.map(_.getAs[Double]("qn_y")).sorted.toSeq
    val mz = ob.map(_.getAs[Double]("qn_z")).sorted.toSeq
    assert(mx === my)
    // z has heavy ties (50 distinct ints): multiset still matches
    // wherever ties don't straddle — the rank MEANS differ, so
    // assert the untied columns exactly and z's mean instead
    assert(math.abs(mz.sum / mz.size - mx.sum / mx.size) < 1e-6)
    // NULL row excluded entirely
    val withNull = Seq((1L, Option(1.0), Option(10.0)),
      (2L, None: Option[Double], Option(20.0)),
      (3L, Option(3.0), Option(30.0))).toDF("id", "a", "b")
    val on = CurationOps.quantileNormalize(withNull, "id",
      Seq("a", "b")).collect()
    assert(on.map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
  }

  test("featureHash: buckets in range, signs are exactly +-1, equal " +
    "values encode equally and independently of row order, distinct " +
    "levels spread across buckets") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (i.toLong, s"cat_${i % 37}",
      s"src_${i % 11}"))
    val df = rows.toDF("id", "a", "b")
    val out = CurationOps.featureHash(df, "id", Seq("a", "b"), 16)
      .collect()
    assert(out.length === 500)
    out.foreach { r =>
      assert(r.getAs[Long]("h_a") >= 0 && r.getAs[Long]("h_a") < 16)
      assert(math.abs(r.getAs[Long]("s_a")) === 1L)
      assert(math.abs(r.getAs[Long]("s_b")) === 1L)
    }
    // same level -> same (bucket, sign) everywhere
    val byLevelA = rows.map(_._2).distinct.map { lvl =>
      val enc = out.zip(rows).filter(_._2._2 == lvl)
        .map { case (r, _) => (r.getAs[Long]("h_a"),
          r.getAs[Long]("s_a")) }.distinct
      assert(enc.size === 1, s"level $lvl encoded inconsistently")
      enc.head
    }
    // 37 levels into 16 buckets: at least half the buckets used
    assert(byLevelA.map(_._1).distinct.size >= 8)
    // row-order independence: shuffled input gives identical encoding
    val shuffled = CurationOps.featureHash(
      scala.util.Random.shuffle(rows).toDF("id", "a", "b"),
      "id", Seq("a", "b"), 16).collect()
    assert(shuffled.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
  }
}
