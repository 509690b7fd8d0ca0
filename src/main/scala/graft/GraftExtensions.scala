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
    // TABLE-level surface: the flagship kNN join as a table-valued
    // function, so a SQL-first user reaches the batch ANN serving shape
    // without the Scala API (see GraftExtensions.knnJoinPlan).
    ext.injectTableFunction((FunctionIdentifier("knn_join"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "knn_join"),
      (exprs: Seq[Expression]) => GraftExtensions.knnJoinPlan(exprs)))
  }
}

object GraftExtensions {

  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import graft.operators.{AnnIndex, IvfIndex, IvfPqIndex, VectorIndex}

  private def litStr(name: String, e: Expression): String = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"knn_join expects a literal STRING for '$name'; got ${e.sql}")
    val v = e.eval()
    if (v == null) throw new IllegalArgumentException(
      s"knn_join expects a literal STRING for '$name'; got NULL")
    v.toString
  }

  /** `knn_join(corpus, queries, k [, kind])` — the approximate kNN join
    * ([[graft.operators.VectorIndex.knnJoinWith]]) from PURE SQL:
    *
    * {{{
    *   SELECT * FROM knn_join('corpus_tbl', 'query_tbl', 5, 'ivfpq')
    * }}}
    *
    * Both tables must carry `(vec_id, embedding)`. `corpus` is either a
    * raw vector table — the index is built ONE-SHOT at the family's
    * defaults (`kind` ∈ ann | ivf | ivfpq, default ann) — or a DURABLE
    * index table written by the family's `writeTable`, detected (and
    * its family inferred, `kind` ignored) via the `_meta` sidecar: the
    * production path, where probes prune the bucketed layout and no
    * per-query build happens. Returns `(src_id, dst_id, cos_sim, rn)`
    * exactly as the Scala API does. */
  private[graft] def knnJoinPlan(exprs: Seq[Expression]): LogicalPlan = {
    if (exprs.length < 3 || exprs.length > 4)
      throw new IllegalArgumentException(
        "knn_join(corpus_table, queries_table, k [, kind]) — got " +
          s"${exprs.length} arguments")
    val spark = SparkSession.active
    val corpus = litStr("corpus_table", exprs(0))
    val queries = litStr("queries_table", exprs(1))
    val k = VectorOps.intArg("knn_join", "k", exprs(2))
    val kind =
      if (exprs.length > 3) litStr("kind", exprs(3)).toLowerCase else "ann"
    val idx: VectorIndex =
      if (spark.catalog.tableExists(corpus + "_meta")) {
        // a durable index table: the sidecar schema names its family
        spark.table(corpus + "_meta").columns.toSeq match {
          case Seq("tables", "planes_per_table") =>
            AnnIndex.fromTable(spark, corpus)
          case Seq("cell", "centroid", "n") =>
            IvfIndex.fromTable(spark, corpus)
          case Seq("kind", "i", "j", "centroid", "n") =>
            IvfPqIndex.fromTable(spark, corpus)
          case cols => throw new IllegalArgumentException(
            s"table $corpus has a ${corpus}_meta sidecar of unsupported " +
              s"shape ${cols.mkString("(", ", ", ")")} — knn_join serves " +
              "AnnIndex, IvfIndex, and IvfPqIndex tables")
        }
      } else kind match {
        case "ann" => AnnIndex.build(spark.table(corpus),
          "vec_id", "embedding", persist = false)
        case "ivf" => IvfIndex.build(spark.table(corpus),
          "vec_id", "embedding", persist = false)
        case "ivfpq" => IvfPqIndex.build(spark.table(corpus),
          "vec_id", "embedding", persist = false)
        case other => throw new IllegalArgumentException(
          s"knn_join kind '$other' — one of ann, ivf, ivfpq")
      }
    idx.knnJoinWith(spark.table(queries), "vec_id", "embedding", k)
      .queryExecution.analyzed
  }
}
