package graft.operators

import graft.Query
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Tier D (multimodal) — image/audio/video treated as opaque `binary`
  * columns with typed metadata (the reference's own multimodal seed is
  * its image-path columns, BME680.java:112,117). The container has no
  * media codecs, so the driver corpus's document bytes stand in for
  * media payloads: `content = CAST(text AS BINARY)` — every operator
  * below works on BINARY and is unchanged when the bytes are JPEG/WAV.
  *
  * Real Spark-side plumbing (schema, byte slicing, hashing, batching)
  * is oracle-gated here; the codec-dependent decode/feature step is the
  * deterministic stub in graft.functions.Media (mapPartitions — the
  * Scala analog of a batched Pandas UDF), tested in MediaSpec.
  */
object MultimodalOps {

  private val FRAME = 64 // bytes per frame for the frame-sampling op

  val all: Seq[Query] = Seq(
    // Metadata extraction over the binary payload: byte length + content
    // digest + typed metadata columns carried alongside — the "media
    // catalog scan" shape. Narrow, codegen'd, no shuffle.
    Query(
      "q_media_meta",
      Some("""SELECT doc_id, octet_length(text::BLOB) AS n_bytes,
                     sha256(text) AS sha, lang AS media_kind
              FROM documents ORDER BY doc_id"""),
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            length(col("text").cast("binary")).cast("bigint").as("n_bytes"),
            sha2(col("text").cast("binary"), 256).as("sha"),
            col("lang").as("media_kind"))
          .orderBy("doc_id")),

    // Frame sampling: fixed-size byte windows off the binary payload
    // (video frame-grab / audio chunk shape): posexplode over computed
    // frame offsets, then byte-range slicing. The oracle slices the
    // VARCHAR twin (corpus is ASCII: byte offsets == char offsets) and
    // re-encodes through BLOB base64.
    Query(
      "q_media_frames",
      Some(s"""SELECT doc_id, CAST(f AS INT) AS frame_idx,
                      CAST(octet_length(substring(text, CAST(f*$FRAME + 1 AS INT), $FRAME)::BLOB) AS INT) AS n_bytes,
                      base64(substring(text, CAST(f*$FRAME + 1 AS INT), $FRAME)::BLOB) AS frame_b64
               FROM (SELECT doc_id, text,
                            unnest(range(0, 1 + (octet_length(text::BLOB) - 1) // $FRAME)) AS f
                     FROM documents)
               ORDER BY doc_id, frame_idx"""),
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), col("text").cast("binary").as("content"))
          .select(col("doc_id"),
            posexplode(expr(
              s"transform(sequence(0, CAST((length(content) - 1) div $FRAME AS INT)), " +
                s"i -> substring(content, i*$FRAME + 1, $FRAME))"))
              .as(Seq("frame_idx", "frame")))
          .select(
            col("doc_id"), col("frame_idx"),
            length(col("frame")).cast("int").as("n_bytes"),
            // Spark's base64 is the MIME (76-char line-wrapped) codec;
            // strip the CRLF wraps to match DuckDB's plain RFC 4648.
            regexp_replace(base64(col("frame")), "[\\r\\n]", "")
              .as("frame_b64"))
          .orderBy("doc_id", "frame_idx"))
  )
}
