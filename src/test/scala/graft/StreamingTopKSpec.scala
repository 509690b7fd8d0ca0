package graft

import graft.streaming.{KeyedToken, StateStores, StreamingTopK, TopKOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import java.sql.Timestamp

/** Space-Saving laws: the three deterministic guarantees
  * (never-undercount, honest error bound, heavy hitters survive) on a
  * skewed stream that overflows the counter budget, per-key isolation,
  * and cross-batch `transformWithState` ≡ batch equivalence under
  * RocksDB. */
class StreamingTopKSpec extends SparkSpec {

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 1000L)
  private def tmpCkpt(): String =
    Files.createTempDirectory("graft_ckpt_").toString

  /** Zipf-ish stream: token t_j appears ~N/j times, plus a long tail
    * of singletons to force evictions past m counters. */
  private def skewed(key: String, seed: Int): Seq[KeyedToken] = {
    val rnd = new scala.util.Random(seed)
    val heavy = (1 to 8).flatMap(j =>
      Seq.fill(400 / j)(f"tok_$j%02d"))
    val tail = (1 to 300).map(i => s"rare_${seed}_$i")
    rnd.shuffle(heavy ++ tail).zipWithIndex.map { case (t, i) =>
      KeyedToken(key, t, ts(i), i.toLong)
    }
  }

  test("space-saving guarantees on an eviction-heavy skewed stream: " +
    "no undercount, honest error bound, heavy hitters tracked") {
    import spark.implicits._
    val stream = skewed("a", 17)
    val truth = stream.groupBy(_.token).view.mapValues(_.size.toLong).toMap
    val m = 32; val k = 10
    val out = StreamingTopK.topkBatch(stream.toDS(), m, k).collect()
    assert(out.length === k)
    out.foreach { o =>
      val t = truth(o.token)
      assert(o.est_count >= t, s"undercount: $o vs true $t")
      assert(o.est_count - o.max_error <= t,
        s"error bound violated: $o vs true $t")
    }
    // every token with true count > N/m must be on the board
    val n = stream.size
    val mustTrack = truth.filter(_._2 > n.toLong / m).keys.toSet
    val boardTokens = out.map(_.token).toSet
    assert(mustTrack.subsetOf(boardTokens),
      s"missing heavy hitters: ${mustTrack -- boardTokens}")
    // the true top-3 lead the board in order
    val trueTop = truth.toSeq.sortBy(t => (-t._2, t._1)).take(3)
      .map(_._1)
    assert(out.sortBy(o => (-o.est_count, o.token)).take(3)
      .map(_.token).toSeq === trueTop)
  }

  test("per-key isolation: two keys' boards are what each key's " +
    "solo run produces") {
    import spark.implicits._
    val a = skewed("a", 5); val b = skewed("b", 23)
    val both = StreamingTopK
      .topkBatch((a ++ b).toDS(), 32, 8).collect()
    val soloA = StreamingTopK.topkBatch(a.toDS(), 32, 8).collect()
    assert(both.filter(_.key == "a").sortBy(_.token).map(_.toString)
      .toSeq === soloA.sortBy(_.token).map(_.toString).toSeq)
  }

  test("transformWithState (RocksDB): cross-batch fold of the final " +
    "board equals the batch form on the same ordered input") {
    val stream = skewed("a", 9) ++ skewed("b", 11)
    val ordered = stream.sortBy(t => (t.ts.getTime, t.seq))
    val s = StateStores.rocksDBSession(spark)
    import s.implicits._
    val in = MemoryStream[KeyedToken](s)
    val name = s"ss_topk_${System.nanoTime()}"
    val q = StreamingTopK.topkTws(in.toDS(), 32, 8)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", tmpCkpt())
      .start()
    val (b1, b2) = ordered.splitAt(ordered.size / 2)
    in.addData(b1: _*); q.processAllAvailable()
    val afterB1 = s.table(name).as[TopKOut].collect().toSeq
    in.addData(b2: _*); q.processAllAvailable()
    val all = s.table(name).as[TopKOut].collect().toSeq
    q.stop()
    // each trigger re-emits the touched keys' refreshed boards, so
    // the SECOND trigger's emissions (multiset diff — identical rows
    // can legitimately repeat across triggers) are the final boards
    // of every key that appeared in batch 2
    val b2rows = all.diff(afterB1)
    val keysInB2 = b2.map(_.key).toSet
    assert(keysInB2 === Set("a", "b"),
      "fixture must exercise both keys across the batch boundary")
    val expected = {
      import spark.implicits._
      StreamingTopK.topkBatch(ordered.toDS(), 32, 8).collect()
        .sortBy(o => (o.key, o.token)).toSeq
    }
    assert(b2rows.sortBy(o => (o.key, o.token)) === expected,
      "transformWithState board diverges from the batch form")
  }

  test("degenerate parameters are rejected; k <= m enforced") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      StreamingTopK.topkBatch(
        Seq.empty[KeyedToken].toDS(), 0, 1)
    }
    intercept[IllegalArgumentException] {
      StreamingTopK.topkBatch(
        Seq.empty[KeyedToken].toDS(), 8, 9)
    }
  }
}
