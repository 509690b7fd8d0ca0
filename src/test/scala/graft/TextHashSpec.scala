package graft

import graft.functions.TextHashOps
import graft.operators.DedupOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The native text-hash expressions must be hash-identical to the
  * builtin spellings they replaced — the LSH pipeline's correctness
  * story leans on `min(xxhash64(p, shingle))` semantics, so the one-pass
  * MinHashSig has to produce bit-equal signatures, including on the edge
  * shapes the byte-scan shortcut could get wrong (doubled spaces, texts
  * shorter than k, single tokens, empty strings). */
class TextHashSpec extends SparkSpec {

  private val PERMS = 32

  // the builtin composition MinHashSig replaced
  private def hofSignature(df: org.apache.spark.sql.DataFrame) = {
    val mins = DedupOps.minhashCols(col("s"), PERMS)
    df.select(col("doc_id"), explode(DedupOps.shingles(col("text"))).as("s"))
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until PERMS).map(p => col(s"m$p")): _*).as("sig"))
  }

  // edge shapes + real corpus text
  private def fixtures() = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select("doc_id", "text")
      .unionByName(Seq(
        (100001L, ""),
        (100002L, "one"),
        (100003L, "two tokens"),
        (100004L, "exactly three tokens"),
        (100005L, "double  space  tokens here"),
        (100006L, " leading and trailing "),
        (100007L, "répété déjà vu répété déjà vu naïve"),
        (100008L, "a a a a a a")).toDF("doc_id", "text"))
  }

  test("minhash_sig is bit-equal to the explode + min(xxhash64) aggregate") {
    val docs = fixtures()
    val native = docs.select(col("doc_id"),
      TextHashOps.minhashSig(col("text"), 3, PERMS).as("sig"))
    val diff = native.alias("n")
      .join(hofSignature(docs).alias("h"), "doc_id")
      .filter(col("n.sig") =!= col("h.sig"))
      .count()
    assert(diff === 0)
  }

  test("shingle_hashes equals sorted distinct xxhash64 of string shingles") {
    val docs = fixtures()
    val native = docs.select(col("doc_id"),
      TextHashOps.shingleHashes(col("text"), 3).as("sh"))
    val hof = docs.select(col("doc_id"),
      array_sort(transform(DedupOps.shingles(col("text")),
        s => xxhash64(s))).as("sh"))
    val diff = native.alias("n").join(hof.alias("h"), "doc_id")
      .filter(col("n.sh") =!= col("h.sh")).count()
    assert(diff === 0)
  }

  test("jaccard_sorted agrees with string-set Jaccard on all corpus pairs") {
    val docs = Tables.documents(spark, sfDir)
    val str = docs.select(col("doc_id"), DedupOps.shingles(col("text")).as("sh"))
    val hsh = docs.select(col("doc_id"),
      TextHashOps.shingleHashes(col("text"), 3).as("sh"))
    def pairs(df: org.apache.spark.sql.DataFrame, j: org.apache.spark.sql.Column) =
      df.select(col("doc_id").as("a_id"), col("sh").as("sh_a"))
        .join(df.select(col("doc_id").as("b_id"), col("sh").as("sh_b")),
          col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), round(j, 6).as("jacc"))
    val s = pairs(str, DedupOps.jaccard(col("sh_a"), col("sh_b")))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val h = pairs(hsh, TextHashOps.jaccardSorted(col("sh_a"), col("sh_b")))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(h === s)
    assert(s.nonEmpty)
  }

  test("nfc_normalize composes decomposed sequences and is an ASCII no-op") {
    import spark.implicits._
    // decomposed e + U+0301 must compose to the precomposed é; ASCII and
    // already-composed input pass through byte-identical; null stays null
    val rows = Seq(
      (1L, "Cafe\u0301"),          // decomposed -> "Café"
      (2L, "Café"),           // already NFC -> unchanged
      (3L, "plain ascii text"),    // ASCII fast path
      (4L, "")).toDF("id", "t")
      .select(col("id"), TextHashOps.nfcNormalize(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(1L) === "Café")
    assert(rows(2L) === "Café")
    assert(rows(3L) === "plain ascii text")
    assert(rows(4L) === "")
    val n = Seq(Tuple1(null: String)).toDF("t")
      .select(TextHashOps.nfcNormalize(col("t")).as("n")).head
    assert(n.isNullAt(0))
  }

  test("normalizeText collapses control/whitespace runs after NFC") {
    import spark.implicits._
    val out = Seq((1L, "Cafe\u0301\tNo\u000b12  x \r\n y\u007f"))
      .toDF("id", "t")
      .select(graft.operators.TextOps.normalizeText(col("t")).as("n"))
      .head.getString(0)
    assert(out === "Café No 12 x y")
  }

  test("deflate_ratio: repetition compresses far below prose, prose " +
    "below randomness; empty is 1.0; null-safe; deterministic") {
    import spark.implicits._
    graft.functions.TextHashOps.register(spark)
    val rnd = new scala.util.Random(5)
    val rows = Seq(
      ("rep", "the cat sat. " * 300),
      ("prose", "A quiet library held maps, letters, and a brass " +
        "clock that nobody wound; visitors came for the view and " +
        "stayed for the silence of the reading room. " * 10),
      ("rand", Seq.fill(2000)(
        (rnd.nextInt(95) + 0x20).toChar).mkString),
      ("empty", ""),
      ("nul", null))
    val out = rows.toDF("k", "t")
      .select(col("k"), call_function("deflate_ratio", col("t")).as("r"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val rep = out("rep").asInstanceOf[Double]
    val prose = out("prose").asInstanceOf[Double]
    val rand = out("rand").asInstanceOf[Double]
    assert(rep < 0.05, s"repetition ratio $rep")
    assert(prose > rep && prose < 0.7, s"prose ratio $prose")
    // uniform printable ASCII carries ~6.57 bits/char, so deflate
    // cannot go below ~0.82; prose sits well under it
    assert(rand > 0.8, s"random ratio $rand")
    assert(out("empty") === 1.0)
    assert(out("nul") === null)
    // per-row, state-free: identical under repartitioning
    val a = rows.toDF("k", "t").repartition(5)
      .select(call_function("deflate_ratio", col("t"))).collect()
      .map(r => if (r.isNullAt(0)) -1.0 else r.getDouble(0)).sorted
    val b = rows.toDF("k", "t")
      .select(call_function("deflate_ratio", col("t"))).collect()
      .map(r => if (r.isNullAt(0)) -1.0 else r.getDouble(0)).sorted
    assert(a.toSeq === b.toSeq)
    // the registered rollup runs and covers every source
    val q = SparkEntry.queries("q_compress_ratio")(spark, sfDir)
      .collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      val m = r.getAs[Double]("mean_ratio")
      assert(m > 0.0 && m <= 1.2, r.toString)
      assert(r.getAs[Long]("n_compressible") >= 0L)
    }
  }

  test("readability: hand-counted fixture; fragment floors at one " +
    "sentence; empty-ish text yields NULL scores not a throw") {
    import spark.implicits._
    val df = Seq(
      (1L, "The cat sat on the mat. It was happy!"),
      (2L, "no enders here"),
      (3L, "???")).toDF("doc_id", "text")
    val out = graft.operators.TextOps.readability(df, "doc_id", "text")
      .collect()
    val r1 = out.find(_.getLong(0) == 1L).get
    // words: 9 space-split tokens; enders: 1 '.' + 1 '!' = 2
    assert(r1.getAs[Long]("words") === 9L)
    assert(r1.getAs[Long]("sentences") === 2L)
    // vowel groups: The(1) cat(1) sat(1) on(1) the(1) mat(1)
    // It(1) was(1) happy(2: a, y) = 10
    assert(r1.getAs[Long]("syllables") === 10L)
    val wps = 9.0 / 2; val spw = 10.0 / 9
    val fl = 206.835 - 1.015 * wps - 84.6 * spw
    assert(math.abs(r1.getAs[Double]("flesch") - fl) < 1e-6)
    val r2 = out.find(_.getLong(0) == 2L).get
    assert(r2.getAs[Long]("sentences") === 1L) // floored
    val r3 = out.find(_.getLong(0) == 3L).get
    assert(r3.getAs[Long]("words") === 1L) // "???" is one ws token
    assert(r3.getAs[Long]("syllables") === 0L)
  }
}
