package graft.operators

import graft.Query
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Tier D (text) — the text-analysis operators a training-data pipeline
  * needs (BASELINE.json north_star): tokenization, corpus stats,
  * language-ID heuristic, quality scoring, token counting, document
  * fingerprinting. All pure Catalyst expressions — no UDFs, so every
  * operator whole-stage-codegens and scales linearly: at 100 TB each is
  * a narrow map plus at most one hash-agg shuffle.
  *
  * The `with*` methods are the library surface (append columns to any
  * DataFrame); the `Query` registry entries below apply them to the
  * driver corpus for the oracle gate.
  */
object TextOps {

  /** Whitespace tokens (single-space separated text). */
  def tokens(text: Column): Column = split(text, " ")

  /** Padded-text occurrence count of a word — the n-gram-style marker
    * primitive behind the language-ID heuristic. */
  private def occ(padded: Column, marker: String): Column =
    ((length(padded) - length(regexp_replace(padded,
      java.util.regex.Pattern.quote(marker), ""))) / marker.length)
      .cast("int")

  /** Language-ID: stopword-marker n-gram heuristic, argmax with a fixed
    * preference order on ties (en > de > fr > es). Appends `outCol`. */
  def withLangId(df: DataFrame, textCol: String,
      outCol: String = "pred_lang"): DataFrame = {
    val p = "__graft_p"
    val markers = Seq(
      "__s_en" -> Seq(" the " -> 5, " a " -> 3),
      "__s_de" -> Seq(" der " -> 5, " und " -> 5),
      "__s_fr" -> Seq(" le " -> 4, " et " -> 4),
      "__s_es" -> Seq(" el " -> 4, " y " -> 3))
    val scored = markers.foldLeft(
      df.withColumn(p, concat(lit(" "), col(textCol), lit(" ")))) {
      case (acc, (name, ms)) =>
        acc.withColumn(name, ms.map { case (m, _) => occ(col(p), m) }
          .reduce(_ + _))
    }
    val pred = when(col("__s_en") >= greatest(col("__s_de"), col("__s_fr"),
        col("__s_es")), "en")
      .when(col("__s_de") >= greatest(col("__s_fr"), col("__s_es")), "de")
      .when(col("__s_fr") >= col("__s_es"), "fr")
      .otherwise("es")
    scored.withColumn(outCol, pred)
      .drop(p +: markers.map(_._1): _*)
  }

  /** Quality scoring: token count, mean token length, stopword ratio,
    * and a length bucket — the length/punct/stopword heuristics of a
    * pretraining-data filter. Appends 4 columns. */
  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val n = size(toks)
    df.withColumn("n_tokens", n)
      .withColumn("avg_tok_len",
        round(length(regexp_replace(col(textCol), " ", ""))
          .cast("double") / n, 6))
      .withColumn("stop_ratio",
        round(size(filter(toks, t =>
          t === "the" || t === "a" || t === "of" || t === "and"))
          .cast("double") / n, 6))
      .withColumn("len_bucket",
        when(n < 50, "short").when(n < 200, "medium").otherwise("long"))
  }

  /** Gopher-style repetition signals: the fraction of duplicate tokens
    * and duplicate 3-gram shingles in a document — boilerplate and
    * degenerate generations score high, natural prose low. Appends
    * `dup_token_ratio` and `dup_3gram_ratio` (both in [0,1], 6 dp).
    * Distinct 3-gram counting rides the native
    * [[graft.functions.ShingleHashVec]] single-pass expression, so the
    * whole operator is one codegen'd narrow map — no explode, no
    * aggregate, linear at any corpus size. */
  def withRepetition(df: DataFrame, textCol: String): DataFrame = {
    import graft.functions.TextHashOps
    val toks = tokens(col(textCol))
    val n = size(toks)
    val nSh = greatest(n - 2, lit(1))
    df.withColumn("dup_token_ratio",
        round(lit(1.0) - size(array_distinct(toks)).cast("double") / n, 6))
      .withColumn("dup_3gram_ratio",
        round(lit(1.0) -
          size(TextHashOps.shingleHashes(col(textCol), 3)).cast("double") / nSh,
          6))
  }

  /** Canonical text cleanup: Unicode NFC (via the codegen'd
    * [[graft.functions.NfcNormalize]] — visually-identical strings must
    * hash identically before any dedup), then every run of control
    * chars/whitespace/DEL (`[\x00-\x20\x7f]+` — the explicit class, not
    * `\s`, because Java and RE2 disagree on whether `\s` covers
    * vertical tab) collapses to one space, then trim. One narrow
    * codegen'd pass; the NFC step is a byte-scan no-op on ASCII. */
  def normalizeText(text: Column): Column = {
    import graft.functions.TextHashOps
    trim(regexp_replace(TextHashOps.nfcNormalize(text),
      "[\\x00-\\x20\\x7f]+", " "))
  }

  /** Token-budget estimators: whitespace tokens and a BPE-ish regex
    * (letter runs / digit runs / single non-alnum). Appends 2 columns. */
  def withTokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("ws_tokens", size(tokens(col(textCol))))
      .withColumn("re_tokens",
        regexp_count(col(textCol), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")))

  /** Document fingerprint: min over 5-gram shingle md5s (1-permutation
    * MinHash — the rolling-hash fingerprint primitive). Appends `outCol`;
    * grouping by it at 100 TB is one hash-shuffle on a 32-char key. */
  def withFingerprint(df: DataFrame, textCol: String,
      outCol: String = "fp"): DataFrame = {
    val toks = tokens(col(textCol))
    val idx = sequence(lit(0), greatest(size(toks) - 5, lit(0)))
    df.withColumn(outCol, array_min(transform(idx,
      i => md5(concat_ws(" ", slice(toks, i + lit(1), lit(5)))))))
  }

  /** Top-k TF-IDF terms per document, RATIONAL variant: score =
    * (tf/doc_len)·(N/df) — term frequency times inverse document
    * frequency without the customary log. Every operation is an IEEE
    * 754 correctly-rounded division or multiply, so Spark and DuckDB
    * produce bit-identical doubles (log is implementation-defined
    * across libm's and would break the oracle hash at the 6th dp).
    * Plan: one token explode feeding three hash aggregates (tf, doc
    * length, document frequency — all map-side combined) + a broadcast
    * of the scalar corpus count + a per-doc window top-k. */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Document length rides ALONG the token stream as a narrow
    // size(split) column instead of a second explode + aggregate + join
    // — one pass over the corpus, one fewer shuffle (max(len) inside
    // the tf aggregate is constant per group; the token counts agree
    // with the exploded row count by construction).
    val toks = docs.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("ts"))
      .select(col("doc_id"), size(col("ts")).as("len"),
        explode(col("ts")).as("tok"))
    val tf = toks.groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"), max(col("len")).as("len"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("tok"))
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(total))
      .withColumn("score",
        round(col("tf").cast("double") / col("len") *
          (col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("tok"), col("score"),
        col("rk").cast("int").as("rk"))
      .orderBy("doc_id", "rk")
  }

  /** BM25 (Okapi) relevance of every document against a fixed query
    * term set — the retrieval-grade upgrade of [[tfidfTopK]]'s
    * frequency score (Robertson–Spärck Jones idf with +1 smoothing;
    * the k1 saturation / b length-normalization defaults are the
    * standard 1.2 / 0.75).
    *
    * Scale shape: document length rides along the token stream (the
    * tfidf stance — one explode, no second pass), and the explode is
    * FILTERED TO THE QUERY TERMS before the tf aggregate, so the
    * shuffle carries at most |terms| rows per document regardless of
    * document length. The per-term df table (≤|terms| rows) and the
    * 1-row corpus stats (N, avgdl) broadcast; the final score is one
    * map-side-combined sum per matching document. No corpus-wide
    * window, no driver collect. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = docs.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("ts"))
      .select(col("doc_id"), size(col("ts")).as("dl"),
        explode(col("ts")).as("tok"))
      .filter(col("tok").isin(terms: _*))
    val tf = toks.groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"),
      avg(size(split(col(textCol), " "))).as("avgdl"))
    tf.join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("part", col("idf") *
        col("tf") * (lit(k1) + 1.0) /
        (col("tf") + lit(k1) *
          (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      // scaled rounding (round(x·1e6)/1e6, the profile stance) — plain
      // round(x, 6) rounds the double's infinite decimal expansion and
      // can disagree with DuckDB's scaled-double rounding at exact .5s
      .agg((round(sum(col("part")) * lit(1000000.0)) / lit(1000000.0))
        .as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
  }

  /** Approximate top-`k` tokens of a corpus via ONE mergeable
    * frequent-items sketch ([[graft.functions.FreqSketch]]): each
    * partition folds its tokens into a `maxMapSize`-bounded
    * ItemsSketch, the partials merge associatively, and the single
    * final sketch decodes to `(tok, est, lower, upper)` rows. The
    * approximate twin of the exact explode/groupBy in
    * `q_text_tokenize`: instead of shuffling every distinct token of a
    * Zipf-skewed corpus, the exchange carries one ≤maxMapSize sketch
    * per partition — constant bytes per partition at any corpus size.
    * `NO_FALSE_NEGATIVES` decode: every token with true count above
    * the sketch's max error is present. */
  /** Unigram language-model scoring: fit a unigram LM on the corpus
    * itself (token counts over a bounded top-`vocabSize` vocabulary,
    * out-of-vocabulary tokens at the 1/total floor), then score every
    * document by its per-token cross-entropy `xent = −Σ ln p(tok) / n`
    * and perplexity `exp(xent)` — the classic model-based quality
    * signal next to the heuristic [[withQuality]] ratios: gibberish
    * and boilerplate-free prose separate on perplexity long before a
    * real LM enters the pipeline.
    *
    * Scale shape: one explode over the corpus (linear), ONE shuffle
    * for the token counts, and a bounded top-V vocabulary (distributed
    * partial TakeOrdered, ≤`vocabSize` rows) that BROADCASTS to the
    * scoring join — the full Zipf-tailed token table never shuffles
    * against the corpus. Per-doc sums are map-side-combined; each
    * −ln p term rounds into DECIMAL(38,12) before summing (the drift
    * stance) so partial-aggregation order and last-ulp libm divergence
    * cannot perturb the 6-dp result. */
  def unigramPerplexity(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 32768): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = toks.agg(count(lit(1)).as("total"))
    val vocab = counts.orderBy(col("cnt").desc, col("tok")).limit(vocabSize)
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        (-log(coalesce(col("cnt").cast("double"), lit(1.0)) / col("total")))
          .cast(DecimalType(38, 12)).as("nll"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        (round(sum(col("nll")).cast("double") / count(lit(1))
          * lit(1000000.0)) / lit(1000000.0)).as("xent"))
      .withColumn("ppl",
        round(exp(col("xent")) * lit(1000000.0)) / lit(1000000.0))
      .orderBy("doc_id")
  }

  /** Interpolated bigram-LM perplexity — the quality signal real
    * curation pipelines actually rank by: templated/boilerplate text
    * is far more predictable under a bigram model than under unigrams,
    * so the bigram score separates chrome from prose where
    * [[unigramPerplexity]] can't. Self-fit on the corpus:
    * p(w | prev) = λ·c(prev,w)/c(prev) + (1−λ)·p_uni(w), with the
    * bigram table restricted to vocab×vocab and capped at `bigramTop`
    * entries (count-desc, then lexicographic — the same deterministic
    * tiebreak as the vocab cut), unseen bigrams and the document-first
    * token backing off to the unigram term alone. The unigram floor
    * keeps every p strictly positive.
    *
    * Scale: one posexplode scan, a doc-partitioned lag window for the
    * bigram stream, vocab-bounded broadcasts (vocab, prev-counts,
    * bigram table) — the corpus is never shuffled wider than the
    * (prev, tok) count aggregate. Per-token −ln p terms round into
    * DECIMAL(38,12) before the per-doc sum (the q_drift stance), so
    * the score is hash-green despite ln(). */
  def bigramPerplexity(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 32768, bigramTop: Int = 65536,
      lambdaBi: Double = 0.75): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    require(bigramTop > 0, "bigramTop must be positive")
    require(lambdaBi > 0 && lambdaBi < 1,
      s"lambdaBi must be in (0,1); got $lambdaBi")
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = toks.agg(count(lit(1)).as("total"))
    val vocab = counts.orderBy(col("cnt").desc, col("tok"))
      .limit(vocabSize)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val stream = toks.withColumn("prev", lag(col("tok"), 1).over(w))
    val biCounts = stream.filter(col("prev").isNotNull)
      .join(broadcast(vocab.select(col("tok").as("prev"))), "prev")
      .join(broadcast(vocab.select("tok")), "tok")
      .groupBy("prev", "tok").agg(count(lit(1)).as("bcnt"))
    val biTop = biCounts
      .orderBy(col("bcnt").desc, col("prev"), col("tok"))
      .limit(bigramTop)
    val prevCnt = vocab
      .select(col("tok").as("prev"), col("cnt").as("pcnt"))
    stream
      .join(broadcast(vocab), Seq("tok"), "left")
      .join(broadcast(prevCnt), Seq("prev"), "left")
      .join(broadcast(biTop), Seq("prev", "tok"), "left")
      .crossJoin(broadcast(total))
      .select(col("doc_id"),
        (-log(
          lit(lambdaBi) *
            coalesce(col("bcnt").cast("double") / col("pcnt"),
              lit(0.0)) +
          lit(1.0 - lambdaBi) *
            coalesce(col("cnt").cast("double"), lit(1.0)) /
            col("total")))
          .cast(DecimalType(38, 12)).as("nll"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        (round(sum(col("nll")).cast("double") / count(lit(1))
          * lit(1000000.0)) / lit(1000000.0)).as("xent"))
      .withColumn("ppl",
        round(exp(col("xent")) * lit(1000000.0)) / lit(1000000.0))
      .orderBy("doc_id")
  }

  def topkTokensApprox(df: DataFrame, textCol: String, k: Int = 20,
      maxMapSize: Int = 1024): DataFrame = {
    graft.functions.FreqSketch.register(df.sparkSession)
    import graft.functions.FreqSketch._
    df.select(explode(tokens(col(textCol))).as("tok"))
      .agg(freqSketchAgg(col("tok"), maxMapSize).as("sk"))
      .select(explode(freqSketchTopK(col("sk"), k)).as("hit"))
      .select(col("hit.item").as("tok"), col("hit.estimate").as("est"),
        col("hit.lower").as("lower"), col("hit.upper").as("upper"))
      .orderBy(col("est").desc, col("tok"))
  }

  /** Per-group Shannon entropy of the token distribution — the
    * corpus-diversity signal next to the heuristic quality ratios: a
    * source whose token entropy collapses is boilerplate or template
    * spam long before a human reads it. `H = log₂T − (Σ c·ln c)/T/ln2`
    * over per-token counts `c`, total `T` — one explode (linear), one
    * hash-agg shuffle on (group, token) with map-side combine, then a
    * per-group rollup; nothing is driver-side. Each `c·ln c` term
    * rounds into DECIMAL(38,12) before summing (the q_drift stance) so
    * partial-aggregation order and last-ulp libm divergence cannot
    * perturb the 6-dp result. */
  def tokenEntropy(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame =
    docs.select(col(groupCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(groupCol), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col(groupCol))
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum((col("c").cast("double") * log(col("c").cast("double")))
          .cast(DecimalType(38, 12))).as("clnc"))
      .select(col(groupCol), col("n_tokens"), col("n_distinct"),
        (round((log(col("n_tokens").cast("double"))
            - col("clnc").cast("double") / col("n_tokens"))
          / log(lit(2.0)) * lit(1000000.0)) / lit(1000000.0))
          .as("entropy"))

  /** Top-k word n-grams of a corpus — collocation mining and the
    * boilerplate-detection primitive (a crawl's top bigrams ARE its
    * navigation chrome). The n-gram stream is built inside codegen
    * (`transform` over an index sequence + `slice`/`concat_ws` — no
    * UDF, no self-join on token position), exploded, and hash-agged:
    * one linear pass plus ONE shuffle on the n-gram key with map-side
    * combine, then a distributed partial top-k. The exact count is the
    * corollary of `q_text_tokenize`'s shape; at 100 TB the mergeable
    * frequent-items sketch ([[topkTokensApprox]]) is the same query
    * without the Zipf-skewed full shuffle. */
  def ngramTopK(docs: DataFrame, textCol: String, n: Int = 2,
      k: Int = 50): DataFrame = {
    require(n >= 2 && n <= 8, s"n must be in [2, 8]; got $n")
    val t = tokens(col(textCol))
    val grams = when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    docs.select(explode(grams).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("ngram")).limit(k)
  }

  /** Trained WordPiece vocabularies per (session, corpus): a k-row
    * driver array (no executor storage — close is a no-op), evicted
    * with the owning session like the ANN quantizers. */
  private val wpVocabCache = new IndexCache[Array[String]](
    (s, d) => graft.functions.WordpieceOps.trainVocab(
      Tables.documents(s, d), "text", vocabSize = 2048),
    _ => ())

  /** Trained BPE merge lists per (session, corpus) — the
    * [[wpVocabCache]] stance for the GPT-family scheme. */
  private val bpeMergesCache = new IndexCache[Array[String]](
    (s, d) => graft.functions.BpeOps.trainMerges(
      Tables.documents(s, d), "text", nMerges = 2048),
    _ => ())

  /** Flesch reading ease + Flesch–Kincaid grade per document from
    * three exact integer counts: whitespace words, sentence enders
    * (., !, ? — floor 1 so a fragment is "one sentence", not a
    * divide-by-zero), and syllables via the maximal-[aeiouy]+-run
    * heuristic (each vowel group ≈ one syllable — the standard
    * dictionary-free approximation; silent-e correction is a lexicon
    * problem, stated not smuggled). The length-independent quality
    * signal next to [[withTokenCounts]]'s raw sizes: a curation
    * pipeline bins on grade level to balance readability strata.
    *
    * Scale: one narrow codegen'd projection — counts via
    * length-difference after replace (no per-row UDF, no explode). */
  def readability(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val t = col(textCol)
    val words = size(split(t, " ")).cast("bigint")
    val sentRaw = (length(t) - length(replace(t, lit(".")))) +
      (length(t) - length(replace(t, lit("!")))) +
      (length(t) - length(replace(t, lit("?"))))
    val sents = greatest(lit(1L), sentRaw.cast("bigint"))
    val marked = regexp_replace(lower(t), lit("[aeiouy]+"), lit("#"))
    val sylls = (length(marked) -
      length(replace(marked, lit("#")))).cast("bigint")
    val wps = words.cast("double") / sents.cast("double")
    val spw = sylls.cast("double") / words.cast("double")
    val ok = words > 0
    df.select(col(idCol), words.as("words"), sents.as("sentences"),
        sylls.as("syllables"),
        when(ok, r6(lit(206.835) - lit(1.015) * wps -
          lit(84.6) * spw)).as("flesch"),
        when(ok, r6(lit(0.39) * wps + lit(11.8) * spw -
          lit(15.59))).as("fk_grade"))
      .orderBy(idCol)
  }

  val all: Seq[Query] = Seq(
    // Length-independent readability strata for curation balancing:
    // Flesch / FK grade off three exact counts per document.
    Query(
      "q_readability",
      Some("""WITH c AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT)
                         AS words,
                       greatest(1, CAST(
                         (length(text)
                           - length(replace(text, '.', '')))
                         + (length(text)
                           - length(replace(text, '!', '')))
                         + (length(text)
                           - length(replace(text, '?', '')))
                         AS BIGINT)) AS sentences,
                       CAST(length(regexp_replace(lower(text),
                           '[aeiouy]+', '#', 'g'))
                         - length(replace(regexp_replace(lower(text),
                           '[aeiouy]+', '#', 'g'), '#', ''))
                         AS BIGINT) AS syllables
                FROM documents)
              SELECT doc_id, words, sentences, syllables,
                     round(CASE WHEN words > 0 THEN
                         206.835
                         - 1.015 * (CAST(words AS DOUBLE)
                           / CAST(sentences AS DOUBLE))
                         - 84.6 * (CAST(syllables AS DOUBLE)
                           / CAST(words AS DOUBLE)) END
                       * 1000000.0)/1000000.0 AS flesch,
                     round(CASE WHEN words > 0 THEN
                         0.39 * (CAST(words AS DOUBLE)
                           / CAST(sentences AS DOUBLE))
                         + 11.8 * (CAST(syllables AS DOUBLE)
                           / CAST(words AS DOUBLE))
                         - 15.59 END
                       * 1000000.0)/1000000.0 AS fk_grade
              FROM c ORDER BY doc_id"""),
      (s, d) => readability(Tables.documents(s, d), "doc_id",
        "text")),

    // Token frequency: the explode/groupBy (Generator + hash agg) shape.
    // Top-100 with deterministic (n DESC, token) order.
    Query(
      "q_text_tokenize",
      Some("""SELECT tok, count(*) AS n
              FROM (SELECT unnest(string_split(text, ' ')) AS tok
                    FROM documents)
              GROUP BY tok ORDER BY n DESC, tok LIMIT 100"""),
      (s, d) =>
        Tables.documents(s, d)
          .select(explode(tokens(col("text"))).as("tok"))
          .groupBy("tok")
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("tok"))
          .limit(100)),

    // Approximate heavy hitters — the sketch twin of q_text_tokenize,
    // in the stored-rollup shape of q_hll_merge: build one bounded
    // ItemsSketch per (lang, source) shard, STORE those, answer the
    // per-lang question by unioning shard sketches (never re-scanning
    // text), decode top-10 with NO_FALSE_NEGATIVES. At 100 TB the
    // exact twin shuffles every distinct token; this shuffles one
    // ≤1024-entry sketch per shard. Approximate by design →
    // FreqSketchSpec pins the no-miss + bracket guarantees vs exact
    // counts, no SQL oracle.
    Query(
      "q_topk_tokens_approx",
      None,
      (s, d) => {
        graft.functions.FreqSketch.register(s)
        import graft.functions.FreqSketch._
        val shard = Tables.documents(s, d)
          .select(col("lang"), col("source"),
            explode(tokens(col("text"))).as("tok"))
          .groupBy("lang", "source")
          .agg(freqSketchAgg(col("tok"), 1024).as("sk"))
        shard.groupBy("lang")
          .agg(freqUnionAgg(col("sk"), 1024).as("sk"))
          .select(col("lang"),
            explode(freqSketchTopK(col("sk"), 10)).as("hit"))
          .select(col("lang"), col("hit.item").as("tok"),
            col("hit.estimate").as("est"))
          .orderBy(col("lang"), col("est").desc, col("tok"))
      }),

    // Corpus stats per language.
    Query(
      "q_text_stats",
      Some("""SELECT lang, count(*) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                     round(CAST(SUM(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars,
                     CAST(count(DISTINCT source) AS BIGINT) AS n_sources
              FROM documents GROUP BY lang ORDER BY lang"""),
      (s, d) =>
        Tables.documents(s, d)
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            round(sum(col("n_chars")).cast("double") / count(lit(1)), 6)
              .as("avg_chars"),
            countDistinct(col("source")).as("n_sources"))
          .orderBy("lang")),

    // Language-ID, scored against the labeled column. Deterministic by
    // construction (fixed tie order); accuracy is reported per doc.
    Query(
      "q_lang_id",
      Some("""WITH s AS (
                SELECT doc_id, lang,
                  CAST((length(p)-length(replace(p,' the ','')))/5
                     + (length(p)-length(replace(p,' a ','')))/3 AS INT) AS s_en,
                  CAST((length(p)-length(replace(p,' der ','')))/5
                     + (length(p)-length(replace(p,' und ','')))/5 AS INT) AS s_de,
                  CAST((length(p)-length(replace(p,' le ','')))/4
                     + (length(p)-length(replace(p,' et ','')))/4 AS INT) AS s_fr,
                  CAST((length(p)-length(replace(p,' el ','')))/4
                     + (length(p)-length(replace(p,' y ','')))/3 AS INT) AS s_es
                FROM (SELECT doc_id, lang, ' ' || text || ' ' AS p
                      FROM documents))
              SELECT doc_id, lang,
                     CASE WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
                          WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
                          WHEN s_fr >= s_es THEN 'fr'
                          ELSE 'es' END AS pred_lang,
                     CASE WHEN (CASE WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
                          WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
                          WHEN s_fr >= s_es THEN 'fr'
                          ELSE 'es' END) = lang THEN 1 ELSE 0 END AS is_match
              FROM s ORDER BY doc_id"""),
      (s, d) =>
        withLangId(Tables.documents(s, d), "text")
          .select(col("doc_id"), col("lang"), col("pred_lang"),
            when(col("pred_lang") === col("lang"), 1).otherwise(0)
              .as("is_match"))
          .orderBy("doc_id")),

    // Quality scoring over the driver corpus.
    Query(
      "q_text_quality",
      Some("""SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                     round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                           / len(string_split(text, ' ')), 6) AS avg_tok_len,
                     round(CAST(len(list_filter(string_split(text, ' '),
                             t -> t IN ('the', 'a', 'of', 'and'))) AS DOUBLE)
                           / len(string_split(text, ' ')), 6) AS stop_ratio,
                     CASE WHEN len(string_split(text, ' ')) < 50 THEN 'short'
                          WHEN len(string_split(text, ' ')) < 200 THEN 'medium'
                          ELSE 'long' END AS len_bucket
              FROM documents ORDER BY doc_id"""),
      (s, d) =>
        withQuality(Tables.documents(s, d), "text")
          .select("doc_id", "n_tokens", "avg_tok_len", "stop_ratio",
            "len_bucket")
          .orderBy("doc_id")),

    // Repetition signals (Gopher-style duplicate-fraction filters).
    // Ratios are exact integer-count divisions in IEEE double — safe to
    // hash-compare cross-engine (§7.6: division yes, libm no).
    Query(
      "q_repetition",
      Some("""SELECT doc_id,
                     round(1.0 - CAST(len(list_distinct(string_split(text, ' ')))
                             AS DOUBLE) / len(string_split(text, ' ')),
                       6) AS dup_token_ratio,
                     round(1.0 - CAST(len(list_distinct(list_transform(
                             range(0, greatest(len(string_split(text, ' ')) - 2, 1)),
                             i -> array_to_string(
                                    string_split(text, ' ')[i+1:i+3], ' '))))
                             AS DOUBLE)
                           / greatest(len(string_split(text, ' ')) - 2, 1),
                       6) AS dup_3gram_ratio
              FROM documents ORDER BY doc_id"""),
      (s, d) =>
        withRepetition(Tables.documents(s, d), "text")
          .select("doc_id", "dup_token_ratio", "dup_3gram_ratio")
          .orderBy("doc_id")),

    // Top-3 TF-IDF terms per doc (rational variant — see tfidfTopK).
    Query(
      "q_tfidf",
      Some("""WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents),
              tf AS (SELECT doc_id, tok, count(*) AS tf
                     FROM toks GROUP BY doc_id, tok),
              len AS (SELECT doc_id, count(*) AS len
                      FROM toks GROUP BY doc_id),
              dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
              n AS (SELECT count(*) AS n_docs FROM documents),
              scored AS (
                SELECT tf.doc_id, tf.tok,
                       round(CAST(tf.tf AS DOUBLE) / len.len *
                         (CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS score
                FROM tf JOIN len USING (doc_id)
                        JOIN dfreq USING (tok) CROSS JOIN n)
              SELECT doc_id, tok, score,
                     CAST(rk AS INT) AS rk
              FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                      ORDER BY score DESC, tok) AS rk FROM scored)
              WHERE rk <= 3 ORDER BY doc_id, rk"""),
      (s, d) => tfidfTopK(Tables.documents(s, d), "doc_id", "text")),

    // Token counting two ways — the cheap token-budget estimators.
    Query(
      "q_token_count",
      Some("""SELECT doc_id,
                     CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
                     CAST(len(regexp_extract_all(text,
                       '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS re_tokens
              FROM documents ORDER BY doc_id"""),
      (s, d) =>
        withTokenCounts(Tables.documents(s, d), "text")
          .select("doc_id", "ws_tokens", "re_tokens")
          .orderBy("doc_id")),

    // Text normalization — the cleanup pass a pretraining pipeline runs
    // before any hashing or dedup (NFC so visually-identical strings
    // hash identically, control/whitespace collapse, trim). The corpus
    // is ASCII, so like q_pii_scrub the query PLANTS a dirty prefix —
    // a decomposed e+U+0301, a tab, a vertical tab, a doubled space —
    // and both engines must converge on the same clean bytes.
    Query(
      "q_text_normalize",
      Some("""SELECT doc_id,
                     trim(regexp_replace(
                       nfc_normalize('Cafe' || chr(769) || chr(9) || 'No' ||
                         chr(11) || '12  ' || text),
                       '[\x00-\x20\x7f]+', ' ', 'g')) AS clean
              FROM documents ORDER BY doc_id"""),
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          normalizeText(concat(lit("Cafe\u0301\tNo\u000b12  "), col("text")))
            .as("clean"))
        .orderBy("doc_id")),

    // BM25 ranking against a fixed 3-term query (terms chosen from the
    // corpus's dense center of the vocabulary so every engine-side
    // branch — tf saturation, length normalization, idf — is exercised
    // on hundreds of docs at both gate scales).
    Query(
      "q_bm25",
      Some("""WITH docs AS (
                SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
              stats AS (
                SELECT count(*) AS n_docs, avg(len(ts)) AS avgdl FROM docs),
              tf AS (
                SELECT doc_id, tok, count(*) AS tf, max(dl) AS dl
                FROM (SELECT doc_id, len(ts) AS dl, unnest(ts) AS tok
                      FROM docs)
                WHERE tok IN ('join', 'filter', 'scan')
                GROUP BY doc_id, tok),
              dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok)
              SELECT doc_id,
                     round(sum(
                       ln(1 + (n_docs - df + 0.5) / (df + 0.5)) *
                       tf * (1.2 + 1) /
                       (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)))
                       * 1000000.0) / 1000000.0 AS bm25
              FROM tf JOIN dfreq USING (tok) CROSS JOIN stats
              GROUP BY doc_id
              ORDER BY bm25 DESC, doc_id"""),
      (s, d) => bm25(Tables.documents(s, d), "doc_id", "text",
        terms = Seq("join", "filter", "scan"))),

    // Document fingerprint over the driver corpus.
    Query(
      "q_doc_fingerprint",
      Some("""SELECT doc_id,
                     list_min(list_transform(
                       range(0, greatest(len(string_split(text,' ')) - 4, 1)),
                       i -> md5(array_to_string(
                              string_split(text,' ')[i+1:i+5], ' ')))) AS fp
              FROM documents ORDER BY doc_id"""),
      (s, d) =>
        withFingerprint(Tables.documents(s, d), "text")
          .select("doc_id", "fp")
          .orderBy("doc_id")),

    // Unigram-LM perplexity — the model-based quality score next to
    // q_text_quality's heuristics. Self-fit on the corpus (top-32768
    // vocab, OOV at the 1/total floor); per-token −ln p terms round
    // into DECIMAL(38,12) before the per-doc sum (the q_drift stance:
    // order-independent AND immune to last-ulp ln() divergence between
    // engines), so even a log-bearing model score is hash-green.
    Query(
      "q_perplexity",
      Some("""WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents),
              counts AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
              total AS (SELECT count(*) AS total FROM toks),
              vocab AS (SELECT tok, cnt FROM counts
                        ORDER BY cnt DESC, tok LIMIT 32768),
              scored AS (
                SELECT t.doc_id,
                       CAST(-ln(COALESCE(CAST(v.cnt AS DOUBLE), 1.0)
                           / total.total) AS DECIMAL(38,12)) AS nll
                FROM toks t LEFT JOIN vocab v USING (tok) CROSS JOIN total),
              agg AS (
                SELECT doc_id, count(*) AS n_tok,
                       round(CAST(sum(nll) AS DOUBLE) / count(*)
                         * 1000000.0) / 1000000.0 AS xent
                FROM scored GROUP BY doc_id)
              SELECT doc_id, n_tok, xent,
                     round(exp(xent) * 1000000.0) / 1000000.0 AS ppl
              FROM agg ORDER BY doc_id"""),
      (s, d) => unigramPerplexity(Tables.documents(s, d), "doc_id", "text")),

    // Bigram-LM perplexity with unigram backoff — boilerplate is
    // PREDICTABLE: its bigrams repeat, so its xent collapses under a
    // bigram model long before the unigram score notices.
    Query(
      "q_perplexity_bigram",
      Some("""WITH toks AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents),
              counts AS (SELECT tok, count(*) AS cnt FROM toks
                         GROUP BY tok),
              total AS (SELECT count(*) AS total FROM toks),
              vocab AS (SELECT tok, cnt FROM counts
                        ORDER BY cnt DESC, tok LIMIT 32768),
              bl AS (SELECT doc_id, string_split(text, ' ') AS l
                     FROM documents),
              bi AS (SELECT doc_id,
                       unnest(list_zip(l[1:length(l)-1],
                         l[2:length(l)])) AS z
                     FROM bl),
              stream AS (
                SELECT doc_id, l[1] AS tok, CAST(NULL AS VARCHAR)
                         AS prev
                FROM bl
                UNION ALL
                SELECT doc_id, z[2] AS tok, z[1] AS prev FROM bi),
              bic AS (SELECT s.prev, s.tok, count(*) AS bcnt
                      FROM stream s
                      JOIN vocab vp ON s.prev = vp.tok
                      JOIN vocab vt ON s.tok = vt.tok
                      GROUP BY 1, 2),
              bitop AS (SELECT prev, tok, bcnt FROM bic
                        ORDER BY bcnt DESC, prev, tok LIMIT 65536),
              scored AS (
                SELECT s.doc_id,
                       CAST(-ln(0.75 * COALESCE(
                             CAST(b.bcnt AS DOUBLE) / vp.cnt, 0.0)
                           + 0.25 * COALESCE(CAST(vt.cnt AS DOUBLE),
                             1.0) / total.total)
                         AS DECIMAL(38,12)) AS nll
                FROM stream s
                LEFT JOIN vocab vt ON s.tok = vt.tok
                LEFT JOIN vocab vp ON s.prev = vp.tok
                LEFT JOIN bitop b ON s.prev = b.prev AND s.tok = b.tok
                CROSS JOIN total),
              agg AS (
                SELECT doc_id, count(*) AS n_tok,
                       round(CAST(sum(nll) AS DOUBLE) / count(*)
                         * 1000000.0) / 1000000.0 AS xent
                FROM scored GROUP BY doc_id)
              SELECT doc_id, n_tok, xent,
                     round(exp(xent) * 1000000.0) / 1000000.0 AS ppl
              FROM agg ORDER BY doc_id"""),
      (s, d) => bigramPerplexity(Tables.documents(s, d), "doc_id",
        "text")),

    // Per-source token entropy: diversity scoring per corpus slice.
    // The oracle mirrors the DECIMAL(38,12)-rounded c·ln(c) terms, so
    // hash-green pins the drift stance, not just the formula.
    Query(
      "q_entropy",
      Some("""WITH cnt AS (
                SELECT source, tok, count(*) AS c
                FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                      FROM documents)
                GROUP BY source, tok),
              agg AS (
                SELECT source, sum(c) AS n_tokens, count(*) AS n_distinct,
                       sum(CAST(c * ln(c) AS DECIMAL(38,12))) AS clnc
                FROM cnt GROUP BY source)
              SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
                     n_distinct,
                     round((ln(n_tokens) - CAST(clnc AS DOUBLE) / n_tokens)
                       / ln(2) * 1000000.0) / 1000000.0 AS entropy
              FROM agg ORDER BY source"""),
      (s, d) => tokenEntropy(Tables.documents(s, d), "source", "text")
        .orderBy("source")),

    // Top-50 corpus bigrams: collocations / boilerplate chrome. The
    // oracle builds the identical n-gram stream with a list_transform
    // over 1-indexed slices.
    Query(
      "q_ngram_topk",
      Some("""WITH l AS (SELECT string_split(text, ' ') AS l
                         FROM documents),
              bg AS (SELECT unnest(list_transform(
                       range(0, greatest(len(l) - 1, 0)),
                       i -> array_to_string(l[i+1:i+2], ' '))) AS ngram
                     FROM l)
              SELECT ngram, count(*) AS n FROM bg
              GROUP BY ngram ORDER BY n DESC, ngram LIMIT 50"""),
      (s, d) => ngramTopK(Tables.documents(s, d), "text", n = 2, k = 50)),

    // Subword tokenization: train a 2048-piece WordPiece-style vocab
    // on the corpus (distributed gram counts, deterministic
    // tiebreaks), encode every document with the codegen'd greedy
    // longest-match expression, report the top pieces — the
    // tokenizer-health dashboard of a pretraining pipeline. No SQL
    // oracle (greedy longest-match is
    // not SQL-expressible): WordpieceSpec pins the algorithm (public
    // reference vectors, round-trip reconstruction, zero-UNK coverage
    // on the training corpus) and determinism makes the rows-only
    // gate stable.
    Query(
      "q_wordpiece",
      None,
      (s, d) => {
        val docs = Tables.documents(s, d)
        // a trained vocabulary is a static production artifact (train
        // once, encode forever) — cache per (session, corpus) like the
        // ANN quantizers; encode itself always runs live
        val vocab = TextOps.wpVocabCache.get(s, d)
        val pieces = docs.select(explode(
          graft.functions.WordpieceOps.wordpieceEncode(
            s, lower(col("text")), vocab)).as("piece"))
        pieces
          .groupBy("piece").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("piece"))
          .limit(40)
      }),

    // BPE subword tokenization: train a 2048-merge BPE list on the
    // corpus (one word-count scan + the incremental driver merge
    // loop, deterministic tiebreaks), encode every document with the
    // codegen'd merge-replay expression, report the top pieces — the
    // GPT-family tokenizer next to q_wordpiece's greedy
    // longest-match. No SQL oracle (iterative pair merging is not
    // SQL-expressible): BpeSpec pins the algorithm (brute-force
    // trainer equality, canonical Sennrich-style vectors, total
    // round-trip reconstruction, repartition determinism) and
    // determinism makes the rows-only gate stable.
    Query(
      "q_bpe",
      None,
      (s, d) => {
        val docs = Tables.documents(s, d)
        // a trained merge list is a static production artifact (train
        // once, encode forever) — cached per (session, corpus)
        val merges = TextOps.bpeMergesCache.get(s, d)
        docs.select(explode(
          graft.functions.BpeOps.bpeEncode(
            s, lower(col("text")), merges)).as("piece"))
          .groupBy("piece").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("piece"))
          .limit(40)
      }),

    // Compression-ratio quality screen: per-source mean deflate ratio
    // and the count of highly-compressible (boilerplate-shaped) docs.
    // No DuckDB oracle (no SQL zlib) — the DeflateRatio expression and
    // this rollup are bounded in TextHashSpec (repetitive << prose <
    // random, empty-string and determinism laws).
    Query(
      "q_compress_ratio",
      None,
      (s, d) => {
        graft.functions.TextHashOps.register(s)
        Tables.documents(s, d)
          .select(col("source"),
            call_function("deflate_ratio", col("text")).as("r"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            (round(sum(col("r").cast(
                org.apache.spark.sql.types.DataTypes
                  .createDecimalType(38, 6))).cast("double")
              / count(lit(1)) * lit(1000000.0)) / lit(1000000.0))
              .as("mean_ratio"),
            sum((col("r") < 0.35).cast("long")).as("n_compressible"))
          .orderBy("source")
      }),

    // Zipf/power-law exponent of the token frequency distribution —
    // the discrete MLE α = 1 + n·(Σ ln(f/(fmin−0.5)))⁻¹ (Clauset,
    // Shalizi & Newman 2009) over types with frequency ≥ fmin. Natural
    // corpora sit near α ≈ 2; a synthetic or templated corpus shows up
    // as a wildly different exponent, making this a one-number corpus
    // fingerprint. One explode + vocabulary groupBy (the q_token_count
    // shuffle), then a single fold: ln terms are IEEE doubles of exact
    // integer ratios summed in DECIMAL(38,12).
    Query(
      "q_zipf_alpha",
      Some("""WITH f AS (
                SELECT tok, count(*) AS f
                FROM (SELECT unnest(string_split(text, ' ')) AS tok
                      FROM documents)
                GROUP BY tok),
              m AS (
                SELECT CAST(count(*) AS BIGINT) AS n_types,
                       CAST(sum(f) AS BIGINT) AS n_tokens,
                       CAST(count(CASE WHEN f >= 2 THEN 1 END)
                         AS BIGINT) AS n_fit,
                       CAST(sum(CASE WHEN f >= 2 THEN
                           CAST(ln(CAST(f AS DOUBLE) / 1.5)
                             AS DECIMAL(38,12)) END) AS DOUBLE) AS lsum
                FROM f)
              SELECT n_types, n_tokens, n_fit,
                     round((1.0 + CAST(n_fit AS DOUBLE) / lsum)
                       * 1000000.0)/1000000.0 AS alpha
              FROM m"""),
      (s, d) => zipfAlpha(Tables.documents(s, d), "text"))
  )

  /** See the q_zipf_alpha registration above: discrete power-law MLE
    * α = 1 + n_fit·(Σ_{f≥fmin} ln(f/(fmin−0.5)))⁻¹ over the token
    * frequency table. */
  def zipfAlpha(docs: DataFrame, textCol: String,
      fmin: Int = 2): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec12 = DecimalType(38, 12)
    val half = fmin - 0.5
    docs
      .select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("f"))
      .agg(count(lit(1)).as("n_types"),
        sum("f").as("n_tokens"),
        count(when(col("f") >= fmin, 1)).as("n_fit"),
        sum(when(col("f") >= fmin,
          log(col("f").cast("double") / lit(half)).cast(dec12)))
          .cast("double").as("__lsum"))
      .select(col("n_types"), col("n_tokens"), col("n_fit"),
        (round((lit(1.0) + col("n_fit").cast("double") /
          col("__lsum")) * lit(1000000.0)) / lit(1000000.0))
          .as("alpha"))
  }
}
