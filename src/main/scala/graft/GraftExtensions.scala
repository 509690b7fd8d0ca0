package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{JaccardSorted, MinHashSig, PlaneProject, PlaneSigs, PlaneSketch, ShingleHashVec, SketchDot, SortedIntersectCount, VectorDot, VectorOps}

/** Session-extension entry point: registers the engine's native
  * expressions as session functions at SparkSession build time, so any
  * session configured with
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (or `builder.withExtensions(new GraftExtensions)`) can call
  * `vec_dot`, `minhash_sig`, `shingle_hashes` and `jaccard_sorted` from
  * PURE SQL — no library import, no chokepoint call. This is the
  * Spark-native registration mechanism for engine extensions (the same
  * hook an optimizer `Rule` or a `SparkStrategy` would use); the
  * [[graft.sources.Tables]] chokepoint registration remains for sessions
  * built without the config, and both paths bind identical builders.
  *
  * Extension-injected functions live in the session's base registry, so
  * they survive `SparkSession.newSession()` and appear in every derived
  * session — unlike temp functions (GraftExtensionsSpec pins this).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) =>
        MinHashSig(exprs(0), litInt(exprs(1)), litInt(exprs(2)))))
    ext.injectFunction((FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashVec].getName, "shingle_hashes"),
      (exprs: Seq[Expression]) => ShingleHashVec(exprs(0), litInt(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("jaccard_sorted"),
      new ExpressionInfo(classOf[JaccardSorted].getName, "jaccard_sorted"),
      (exprs: Seq[Expression]) => JaccardSorted(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    // The hyperplane-sketch family (the ANN/IVF compact-code surface);
    // int parameters are validated foldable literals (clear analysis
    // errors instead of cast failures — VectorOps.intArg)
    ext.injectFunction((FunctionIdentifier("plane_sketch"),
      new ExpressionInfo(classOf[PlaneSketch].getName, "plane_sketch"),
      (exprs: Seq[Expression]) => PlaneSketch(exprs(0),
        VectorOps.intArg("plane_sketch", "base", exprs(1)),
        VectorOps.intArg("plane_sketch", "words", exprs(2)))))
    ext.injectFunction((FunctionIdentifier("plane_sigs"),
      new ExpressionInfo(classOf[PlaneSigs].getName, "plane_sigs"),
      (exprs: Seq[Expression]) => PlaneSigs(exprs(0),
        VectorOps.intArg("plane_sigs", "base", exprs(1)),
        VectorOps.intArg("plane_sigs", "tables", exprs(2)),
        VectorOps.intArg("plane_sigs", "planes", exprs(3)))))
    ext.injectFunction((FunctionIdentifier("plane_project"),
      new ExpressionInfo(classOf[PlaneProject].getName, "plane_project"),
      (exprs: Seq[Expression]) => PlaneProject(exprs(0),
        VectorOps.intArg("plane_project", "base", exprs(1)),
        VectorOps.intArg("plane_project", "count", exprs(2)))))
    ext.injectFunction((FunctionIdentifier("sketch_dot"),
      new ExpressionInfo(classOf[SketchDot].getName, "sketch_dot"),
      (exprs: Seq[Expression]) => SketchDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("pq_encode"),
      new ExpressionInfo(
        classOf[graft.functions.PqEncode].getName, "pq_encode"),
      (exprs: Seq[Expression]) => graft.functions.PqEncode(exprs(0),
        VectorOps.codebookOf("pq_encode", exprs(1)))))
    ext.injectFunction((FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[graft.functions.PqAdc].getName, "pq_adc"),
      (exprs: Seq[Expression]) => graft.functions.PqAdc(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("pq_lut"),
      new ExpressionInfo(classOf[graft.functions.PqLut].getName, "pq_lut"),
      (exprs: Seq[Expression]) => graft.functions.PqLut(exprs(0),
        VectorOps.codebookOf("pq_lut", exprs(1)))))
    // Spark's runtime-filter probe expression, not in the public SQL
    // registry — surfaced for declarative Bloom set-membership pruning
    // (pairs with the registered `bloom_filter_agg`).
    ext.injectFunction((FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs(0), exprs(1), exprs(2))))
  }
}
