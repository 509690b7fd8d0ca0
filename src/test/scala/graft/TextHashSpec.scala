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
}
