package graft

import graft.api._
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The public facade must return exactly what the oracle-gated registry
  * queries return — same implementations, column-parametric surface. */
class ApiSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val vecs = Tables.embeddings(spark, sfDir)

  test("nearDupPairs == q_dedup_minhash") {
    val lib = docs.nearDupPairs("doc_id", "text").collect().toSeq
    val reg = SparkEntry.queries("q_dedup_minhash")(spark, sfDir)
      .collect().toSeq
    assert(lib.map(_.toSeq) === reg.map(_.toSeq))
  }

  test("exactDupGroups matches q_doc_dedup") {
    val lib = docs.exactDupGroups("doc_id", "text")
      .orderBy("h").collect().toSeq
    val reg = SparkEntry.queries("q_doc_dedup")(spark, sfDir)
      .collect().toSeq
    assert(lib.map(_.toSeq) === reg.map(_.toSeq))
  }

  test("cosineTopK == q_sim_topk") {
    val lib = vecs.cosineTopK("vec_id", "embedding", probeId = 0L)
      .collect().toSeq
    val reg = SparkEntry.queries("q_sim_topk")(spark, sfDir)
      .collect().toSeq
    assert(lib.map(_.toSeq) === reg.map(_.toSeq))
  }

  test("renamed columns work: the facade is column-parametric") {
    val renamed = docs.select(col("doc_id").as("id"), col("text").as("body"))
    val pairs = renamed.nearDupPairs("id", "body").collect()
    val orig = docs.nearDupPairs("doc_id", "text").collect()
    assert(pairs.map(_.toSeq).toSeq === orig.map(_.toSeq).toSeq)
    val lang = renamed.withLangId("body").columns
    assert(lang.contains("pred_lang") && lang.contains("id"))
  }

  test("with* appenders preserve existing columns and row count") {
    val out = docs.withLangId("text").withQuality("text")
      .withTokenCounts("text").withFingerprint("text")
    assert(out.count() === docs.count())
    docs.columns.foreach(c => assert(out.columns.contains(c)))
    Seq("pred_lang", "n_tokens", "avg_tok_len", "stop_ratio", "len_bucket",
      "ws_tokens", "re_tokens", "fp")
      .foreach(c => assert(out.columns.contains(c), s"missing $c"))
  }

  test("embeddingNearDups == q_dedup_embedding") {
    val lib = vecs.embeddingNearDups("vec_id", "embedding", 0.45)
      .collect().toSeq
    val reg = SparkEntry.queries("q_dedup_embedding")(spark, sfDir)
      .collect().toSeq
    assert(lib.map(_.toSeq) === reg.map(_.toSeq))
  }
}
