package graft

/** The extension entry point must make every native function callable
  * from pure SQL in sessions that never touched the library — including
  * `newSession()` derivatives, where temp-function registrations (the
  * Tables chokepoint path) do not exist. */
class GraftExtensionsSpec extends SparkSpec {

  test("native functions resolve from pure SQL in a fresh newSession") {
    // fresh sessionState: no temp functions, only extension-injected ones
    val s2 = spark.newSession()
    val row = s2.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
               size(minhash_sig('a b c d e', 3, 8)) AS np,
               size(shingle_hashes('a b c d e', 3)) AS ns,
               jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j
      """).head()
    assert(row.getDouble(0) === 11.0)
    assert(row.getInt(1) === 8)
    assert(row.getInt(2) === 3)
    assert(row.getDouble(3) === 0.5)
  }

  test("SQL minhash_sig agrees with the library column API") {
    import org.apache.spark.sql.functions._
    val s2 = spark.newSession()
    import s2.implicits._
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("t")
    val viaSql = s2.sql("SELECT minhash_sig(text, 3, 32) AS sig FROM t")
      .head().getSeq[Long](0)
    val viaApi = df.select(
        graft.functions.TextHashOps.minhashSig(col("text"), 3, 32).as("sig"))
      .head().getSeq[Long](0)
    assert(viaSql === viaApi)
  }
}
