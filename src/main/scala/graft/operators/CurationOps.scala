package graft.operators

import graft.Query
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tier D (curation) — the corpus-assembly operators an LLM training
  * pipeline runs after dedup: deterministic stratified sampling,
  * train/val/test splits, benchmark decontamination, sequence packing,
  * and composite quality filtering.
  *
  * Everything is DERANDOMIZED through md5 (the engine's only coin):
  * a per-document draw is the first 16 bits of md5(doc_id), which both
  * Spark and DuckDB compute bit-identically — so sampling and splits
  * are reproducible across engines, runs, and partitionings, and every
  * query here carries a DuckDB oracle. At 100 TB each operator is a
  * narrow map or a single window/semi-join — no operator shuffles more
  * than once, and the decontamination probe broadcasts the (small by
  * construction) benchmark n-gram set.
  */
object CurationOps {

  /** Uniform deterministic draw in [0, 65536): the first 16 bits of
    * md5 of the key rendered as a string. Cross-engine reproducible —
    * the oracle computes the identical value nibble-by-nibble. */
  def hashDraw(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")

  // The oracle's spelling of hashDraw: DuckDB lacks base-16 conv, so the
  // four nibbles are parsed positionally.
  private def sqlDraw(key: String): String =
    (0 until 4).map { i =>
      s"(instr('0123456789abcdef', substr(md5(CAST($key AS VARCHAR)), ${i + 1}, 1)) - 1) " +
        s"* ${1 << (4 * (3 - i))}"
    }.mkString("(", " + ", ")")

  /** Deterministic per-stratum sampling: keep a row when its draw falls
    * under the stratum's rate. One narrow codegen'd pass — no RNG state,
    * no sampleBy seed drift across retries/partitionings. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val cut = rates.foldLeft(lit((defaultRate * 65536).toLong)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit((rate * 65536).toLong))
          .otherwise(acc)
    }
    df.filter(hashDraw(col(idCol)) < cut)
  }

  /** Deterministic train/val/test assignment from the same draw:
    * thresholds are 16-bit literals so both engines compare integers. */
  def hashSplit(df: DataFrame, idCol: String, trainCut: Int = 52429,
      valCut: Int = 58982): DataFrame = {
    val draw = hashDraw(col(idCol))
    df.withColumn("split",
      when(draw < trainCut, "train")
        .when(draw < valCut, "val")
        .otherwise("test"))
  }

  /** Benchmark decontamination: drop every corpus document sharing at
    * least one k-gram shingle with the (small) benchmark set. The
    * benchmark's distinct shingles broadcast; the probe is a semi-join
    * on the corpus shingle stream — one shuffle-free pass over the
    * corpus at any scale. Returns the CLEAN remainder. */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, k: Int = 3): DataFrame = {
    import graft.functions.TextHashOps
    // Shingles travel as xxhash64 longs (one codegen'd pass per text,
    // graft.functions.ShingleHashVec): the broadcast set and the probe
    // stream compare 8-byte values instead of strings. A 64-bit
    // collision could only DROP an extra document (conservative for
    // decontamination) and is ~1e-9-probable; the string-comparing
    // DuckDB oracle gates exactness on every gated corpus.
    val evalSh = benchmark
      .select(explode(TextHashOps.shingleHashes(col(benchTextCol), k)).as("sh"))
      .distinct()
    val contaminated = corpus
      .select(col(idCol), explode(TextHashOps.shingleHashes(col(textCol), k)).as("sh"))
      .join(broadcast(evalSh), "sh")
      .select(idCol).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Greedy sequence packing by cumulative token count: within each
    * stratum, documents in id order are assigned to the pack their
    * RUNNING token total (before them) lands in — the streaming packer
    * every fixed-context trainer uses (a pack may overflow by its last
    * document; that is the standard greedy trade). One window over one
    * shuffle. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      strataCol: String, packTokens: Int = 2048): DataFrame = {
    val w = Window.partitionBy(strataCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), col(strataCol),
        size(split(col(textCol), " ")).as("n_tokens"))
      .withColumn("pack_id",
        floor(coalesce(sum("n_tokens").over(w), lit(0L)) / packTokens)
          .cast("long"))
  }

  // Same regex dialect subset in Java (Spark) and RE2 (DuckDB): character
  // classes, bounded repetition — no lookaround, no backrefs.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val LongIdRe = "[0-9]{6,}"

  /** PII scrubbing: redact email addresses and long digit runs from a
    * text column — a pure narrow codegen'd map (two regexp_replace
    * passes), the shape a 100 TB scrub wants. The regexes stay inside
    * the dialect subset Java and RE2 share, so the DuckDB oracle
    * replays them byte-identically. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      LongIdRe, "<ID>")

  /** Composite quality filter (Gopher-style rules) over the metrics of
    * [[TextOps.withQuality]]: token-count band, minimum stopword ratio,
    * average-token-length band. Pure narrow filter. */
  def qualityFilter(df: DataFrame, textCol: String,
      minTokens: Int = 20, maxTokens: Int = 80,
      minStopRatio: Double = 0.02, maxAvgTokLen: Double = 5.0): DataFrame =
    TextOps.withQuality(df, textCol)
      .filter(col("n_tokens").between(minTokens, maxTokens) &&
        col("stop_ratio") >= minStopRatio &&
        col("avg_tok_len") <= maxAvgTokLen)

  val all: Seq[Query] = Seq(
    // Stratified sampling: en is over-represented 3× in the corpus, so
    // down-sample it to 25% and keep half of everything else.
    Query(
      "q_sample_stratified",
      Some(s"""SELECT doc_id, lang FROM documents
               WHERE ${sqlDraw("doc_id")} <
                     (CASE WHEN lang = 'en' THEN 16384 ELSE 32768 END)
               ORDER BY doc_id"""),
      (s, d) => stratifiedSample(Tables.documents(s, d), "doc_id", "lang",
          Map("en" -> 0.25), defaultRate = 0.5)
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // Deterministic 80/10/10 split assignment from the md5 draw.
    Query(
      "q_split_assign",
      Some(s"""SELECT doc_id,
                      CASE WHEN ${sqlDraw("doc_id")} < 52429 THEN 'train'
                           WHEN ${sqlDraw("doc_id")} < 58982 THEN 'val'
                           ELSE 'test' END AS split
               FROM documents ORDER BY doc_id"""),
      (s, d) => hashSplit(Tables.documents(s, d), "doc_id")
        .select("doc_id", "split")
        .orderBy("doc_id")),

    // Decontamination against a held-out benchmark (every 50th doc):
    // survivors share NO 3-gram with any benchmark document.
    Query(
      "q_decontaminate",
      Some("""WITH sh AS (
                SELECT doc_id,
                       unnest(list_distinct(list_transform(
                         range(0, greatest(len(string_split(text,' ')) - 2, 1)),
                         i -> array_to_string(
                                string_split(text,' ')[i+1:i+3], ' ')))) AS sh
                FROM documents),
              ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
              bad AS (
                SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (sh)
                WHERE s.doc_id % 50 <> 0)
              SELECT d.doc_id, d.lang FROM documents d
              WHERE d.doc_id % 50 <> 0
                AND d.doc_id NOT IN (SELECT doc_id FROM bad)
              ORDER BY d.doc_id"""),
      (s, d) => {
        val docs = Tables.documents(s, d)
        decontaminate(docs.filter(col("doc_id") % 50 =!= 0),
            "doc_id", "text",
            docs.filter(col("doc_id") % 50 === 0), "text")
          .select("doc_id", "lang")
          .orderBy("doc_id")
      }),

    // Greedy 2048-token sequence packing per language.
    Query(
      "q_pack_sequences",
      Some("""WITH t AS (
                SELECT doc_id, lang,
                       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
                FROM documents)
              SELECT doc_id, lang, n_tokens,
                     CAST(floor(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       / 2048) AS BIGINT) AS pack_id
              FROM t ORDER BY doc_id"""),
      (s, d) => packSequences(Tables.documents(s, d), "doc_id", "text", "lang")
        .select("doc_id", "lang", "n_tokens", "pack_id")
        .orderBy("doc_id")),

    // PII scrubbing. The synthetic corpus carries no real PII, so the
    // query plants a contact line from the source column and proves the
    // scrub removes exactly it — both engines run the same two regexes.
    Query(
      "q_pii_scrub",
      Some("""SELECT doc_id,
                     regexp_replace(regexp_replace(
                       'contact ' || source || '@example.com id 987654321 ' || text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'), '[0-9]{6,}', '<ID>', 'g') AS scrubbed
              FROM documents ORDER BY doc_id"""),
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          scrubPii(concat(lit("contact "), col("source"),
            lit("@example.com id 987654321 "), col("text"))).as("scrubbed"))
        .orderBy("doc_id")),

    // Composite quality filter with the corpus-calibrated thresholds.
    Query(
      "q_quality_filter",
      Some("""WITH m AS (
                SELECT doc_id, lang,
                       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                       round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                             / len(string_split(text, ' ')), 6) AS avg_tok_len,
                       round(CAST(len(list_filter(string_split(text, ' '),
                               t -> t IN ('the', 'a', 'of', 'and'))) AS DOUBLE)
                             / len(string_split(text, ' ')), 6) AS stop_ratio
                FROM documents)
              SELECT doc_id, lang FROM m
              WHERE n_tokens BETWEEN 20 AND 80
                AND stop_ratio >= 0.02
                AND avg_tok_len <= 5.0
              ORDER BY doc_id"""),
      (s, d) => qualityFilter(Tables.documents(s, d), "text")
        .select("doc_id", "lang")
        .orderBy("doc_id"))
  )
}
