package graft.functions

import org.apache.spark.sql.{Dataset, SparkSession}

/** Batched media decode/feature-extraction plumbing (SURVEY.md Tier D).
  *
  * The Spark-side contract is real: typed schema in, per-partition
  * batched processing (the Scala analog of a Pandas `mapInPandas` UDF —
  * one iterator per partition, no per-row overhead, partitioning
  * preserved so no shuffle), fixed-width feature vectors out.
  *
  * The codec itself is a STUB: this container ships no image/audio
  * libraries, so `decodeStub` produces deterministic per-chunk byte
  * statistics standing in for pixel/sample decoding. A real deployment
  * replaces ONLY `decodeStub`'s body with e.g. javax.imageio /
  * a JNI codec — the schema, batching, and partition behavior stay.
  */
object Media {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(doc_id: Long, content: Array[Byte],
      kind: String, n_bytes: Long)

  /** Fixed-width features per record. */
  final case class MediaFeatures(doc_id: Long, kind: String,
      features: Array[Float])

  val FEATURE_DIM = 8

  /** STUB decoder — deterministic fake: mean byte value per equal chunk,
    * normalized to [0,1). Replace with a real codec in deployment. */
  private[graft] def decodeStub(content: Array[Byte]): Array[Float] = {
    val dim = FEATURE_DIM
    val out = new Array[Float](dim)
    if (content.isEmpty) return out
    val chunk = math.max(content.length / dim, 1)
    var i = 0
    while (i < dim) {
      val from = math.min(i * chunk, content.length)
      val until = if (i == dim - 1) content.length
        else math.min((i + 1) * chunk, content.length)
      var sum = 0L
      var j = from
      while (j < until) { sum += content(j) & 0xff; j += 1 }
      out(i) = if (until > from) (sum.toFloat / (until - from)) / 256f else 0f
      i += 1
    }
    out
  }

  /** STUB resize/resample — deterministic fake: stride-sample the payload
    * to exactly `targetBytes` (image resize / audio resample shape:
    * fixed-size output regardless of input size). Replace the body with
    * a real scaler in deployment; schema and batching stay. */
  private[graft] def resizeStub(content: Array[Byte],
      targetBytes: Int): Array[Byte] = {
    if (content.isEmpty) return new Array[Byte](targetBytes)
    val out = new Array[Byte](targetBytes)
    var i = 0
    while (i < targetBytes) {
      out(i) = content((i.toLong * content.length / targetBytes).toInt)
      i += 1
    }
    out
  }

  /** Batched resize over a media dataset: per-partition mapPartitions,
    * fixed-width binary out — the image-resize / audio-resample stage of
    * a multimodal pipeline. Narrow; never shuffles. */
  def resize(records: Dataset[MediaRecord], targetBytes: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map(r => MediaRecord(r.doc_id, resizeStub(r.content, targetBytes),
        r.kind, targetBytes.toLong))
    }
  }

  /** Batched feature extraction: one decoder instantiation per PARTITION
    * (mapPartitions), not per row — where a real codec would amortize
    * its native context, exactly like a Pandas UDF batches Arrow
    * record-batches. Narrow: preserves partitioning, never shuffles. */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition decoder setup would go here (native ctx, etc.)
      it.map(r => MediaFeatures(r.doc_id, r.kind, decodeStub(r.content)))
    }
  }

  /** Derive the media dataset from the driver corpus (documents.text as
    * the opaque payload — see MultimodalOps). */
  def mediaRecords(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "CAST(text AS BINARY) AS content",
        "lang AS kind", "CAST(n_chars AS BIGINT) AS n_bytes")
      .as[MediaRecord]
  }
}
