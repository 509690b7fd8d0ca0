package graft

import graft.functions.Media

/** Media plumbing: the batched mapPartitions contract around the stub
  * decoder — schema, determinism, batch shape, partition preservation. */
class MediaSpec extends SparkSpec {

  test("extractFeatures yields FEATURE_DIM floats in [0,1) per record") {
    val feats = Media.extractFeatures(Media.mediaRecords(spark, sfDir))
    val rows = feats.collect()
    assert(rows.nonEmpty)
    rows.foreach { f =>
      assert(f.features.length === Media.FEATURE_DIM)
      f.features.foreach(v => assert(v >= 0f && v < 1f))
    }
  }

  test("features are deterministic across runs") {
    val a = Media.extractFeatures(Media.mediaRecords(spark, sfDir))
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    val b = Media.extractFeatures(Media.mediaRecords(spark, sfDir))
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(a === b)
  }

  test("mapPartitions preserves partitioning (narrow, no shuffle)") {
    val in = Media.mediaRecords(spark, sfDir)
    val out = Media.extractFeatures(in)
    assert(out.rdd.getNumPartitions === in.rdd.getNumPartitions)
  }

  test("stub decoder computes chunk byte means (known input)") {
    // 16 bytes 0..15 over 8 chunks of 2: means (0.5, 2.5, ..) / 256
    val bytes = (0 until 16).map(_.toByte).toArray
    val f = Media.decodeStub(bytes)
    assert(f.length === Media.FEATURE_DIM)
    (0 until 8).foreach { i =>
      val expected = ((2 * i + 0.5f)) / 256f
      assert(math.abs(f(i) - expected) < 1e-6f)
    }
  }

  test("empty payload decodes to the zero vector") {
    assert(Media.decodeStub(Array.emptyByteArray).toSeq ===
      Seq.fill(Media.FEATURE_DIM)(0f))
  }

  test("resize yields exactly targetBytes for every record, any input size") {
    val out = Media.resize(Media.mediaRecords(spark, sfDir), 128).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.content.length === 128)
      assert(r.n_bytes === 128L)
    }
    // stride sampling preserves first byte and is deterministic
    val bytes = (0 until 1000).map(_.toByte).toArray
    val a = Media.resizeStub(bytes, 100)
    assert(a(0) === bytes(0))
    assert(a.toSeq === Media.resizeStub(bytes, 100).toSeq)
  }
}
