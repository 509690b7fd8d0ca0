package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over `array<double>` columns.
  *
  * The built-in spelling — `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`
  * — is a higher-order function: interpreted per element, allocating a
  * zipped array per row, and a codegen barrier. On all-pairs workloads
  * (embedding near-dup at 2k vectors = 2M pairs × 64 dims) that costs
  * ~40 µs/pair. This expression generates a tight primitive loop inside
  * whole-stage codegen (~0.1 µs/pair) and keeps the surrounding
  * filter/project pipeline fused — the difference between a 72 s and a
  * sub-second stage at bench scale, and the difference between feasible
  * and not at 100 TB.
  *
  * Accumulation is left-to-right in double, identical to both the HOF
  * spelling and DuckDB's `list_inner_product`, so oracle hashes agree.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // (return type inferred: Seq[ArrayType] — AbstractDataType is private[sql])
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Native hyperplane-sign sketch of an `array<double>` embedding:
  * `words`×64 deterministic md5 hyperplanes (the
  * [[graft.operators.SimilarityOps.hyperplane]] family at offset
  * `base`), packed into `words` BIGINT sign words. One expression with
  * a real generated loop over a broadcast plane matrix — the unrolled
  * 256-dot spelling exceeded janino's 64 KB method limit and fell back
  * to interpreted eval; this stays inside whole-stage codegen at any
  * sketch width. Used by the IVF two-stage probe (IvfIndex.sketchCol).
  */
case class PlaneSketch(child: Expression, base: Int, words: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  import org.apache.spark.sql.types.LongType
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "plane_sketch"

  // double[][] — executor-side rebuild rides the memoized hyperplane
  // cache; the matrix itself is what codegen references
  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(words * 64)(p =>
      graft.operators.SimilarityOps.hyperplane(base + p).toArray)

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val out = new Array[Long](words)
    var w = 0
    while (w < words) {
      var word = 0L
      var j = 0
      while (j < 64) {
        val pl = planes(w * 64 + j)
        val n = math.min(e.numElements(), pl.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += e.getDouble(i) * pl(i); i += 1 }
        if (s > 0) word |= (1L << j)
        j += 1
      }
      out(w) = word
      w += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val p = ctx.addReferenceObj("planes", planes, "double[][]")
      val out = ctx.freshName("out")
      val w = ctx.freshName("w")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val word = ctx.freshName("word")
      val pl = ctx.freshName("pl")
      s"""
         |long[] $out = new long[$words];
         |for (int $w = 0; $w < $words; $w++) {
         |  long $word = 0L;
         |  for (int $j = 0; $j < 64; $j++) {
         |    double[] $pl = $p[$w * 64 + $j];
         |    int $n = java.lang.Math.min($e.numElements(), $pl.length);
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $e.getDouble($i) * $pl[$i];
         |    }
         |    if ($s > 0) $word |= (1L << $j);
         |  }
         |  $out[$w] = $word;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PlaneSketch =
    copy(child = newChild)
}

/** Native multi-table LSH signatures of an `array<double>` embedding:
  * `tables` signatures, each packing `planes` hyperplane sign bits
  * (plane p of table t = the deterministic md5 family at index
  * `base + t*planes + p`). Bit-equal to the unrolled
  * `SimilarityOps.lshTableSigs` spelling (pinned in
  * VectorExpressionsSpec) but ONE generated loop instead of
  * tables×planes unrolled dot expressions — the unrolled form cost
  * ~0.5 s per scan of a 2000-row corpus and bloated every plan string.
  */
case class PlaneSigs(child: Expression, base: Int, tables: Int, planes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  import org.apache.spark.sql.types.IntegerType
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "plane_sigs"

  @transient private lazy val planeMatrix: Array[Array[Double]] =
    Array.tabulate(tables * planes)(p =>
      graft.operators.SimilarityOps.hyperplane(base + p).toArray)

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val out = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var sig = 0
      var j = 0
      while (j < planes) {
        val pl = planeMatrix(t * planes + j)
        val n = math.min(e.numElements(), pl.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += e.getDouble(i) * pl(i); i += 1 }
        if (s > 0) sig |= (1 << j)
        j += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val p = ctx.addReferenceObj("planes", planeMatrix, "double[][]")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      val pl = ctx.freshName("pl")
      s"""
         |int[] $out = new int[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  int $sig = 0;
         |  for (int $j = 0; $j < $planes; $j++) {
         |    double[] $pl = $p[$t * $planes + $j];
         |    int $n = java.lang.Math.min($e.numElements(), $pl.length);
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $s += $e.getDouble($i) * $pl[$i];
         |    }
         |    if ($s > 0) $sig |= (1 << $j);
         |  }
         |  $out[$t] = $sig;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PlaneSigs =
    copy(child = newChild)
}

/** Native per-row plane projections of an `array<double>` embedding:
  * the REAL-valued dots of the embedding against `count` deterministic
  * md5 hyperplanes at offset `base` — the query-side half of the
  * asymmetric sketch score when the queries are a DATAFRAME (the batch
  * kNN join) rather than one driver-side vector. Output
  * `array<double>` of length `count`, consumed by [[SketchDot]] with a
  * column right-hand side. Same generated-loop stance as
  * [[PlaneSketch]] (janino 64 KB limit forbids unrolling). */
case class PlaneProject(child: Expression, base: Int, count: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "plane_project"

  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(count)(p =>
      graft.operators.SimilarityOps.hyperplane(base + p).toArray)

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val out = new Array[Double](count)
    var j = 0
    while (j < count) {
      val pl = planes(j)
      val n = math.min(e.numElements(), pl.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += e.getDouble(i) * pl(i); i += 1 }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val p = ctx.addReferenceObj("planes", planes, "double[][]")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val pl = ctx.freshName("pl")
      s"""
         |double[] $out = new double[$count];
         |for (int $j = 0; $j < $count; $j++) {
         |  double[] $pl = $p[$j];
         |  int $n = java.lang.Math.min($e.numElements(), $pl.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $e.getDouble($i) * $pl[$i];
         |  }
         |  $out[$j] = $s;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PlaneProject =
    copy(child = newChild)
}

/** Asymmetric sketch score: Σ over set sign bits of the query's REAL
  * projection onto that bit's hyperplane — rank-equivalent to
  * Σ sign_j·(q⋅h_j), the asymmetric-distance estimate of the cosine
  * that never quantizes the query side. `left` is the stored sketch
  * (`array<bigint>`), `right` the literal per-plane projection array
  * (`array<double>`, length = 64×words). A generated bit loop, not
  * 256 unrolled conditionals (janino 64 KB limit). */
case class SketchDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  import org.apache.spark.sql.types.LongType

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sketch_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sk = a.asInstanceOf[ArrayData]
    val pr = b.asInstanceOf[ArrayData]
    var s = 0.0
    var w = 0
    while (w < sk.numElements()) {
      val word = sk.getLong(w)
      var j = 0
      while (j < 64) {
        if (((word >>> j) & 1L) == 1L && w * 64 + j < pr.numElements())
          s += pr.getDouble(w * 64 + j)
        j += 1
      }
      w += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val w = ctx.freshName("w")
      val j = ctx.freshName("j")
      val word = ctx.freshName("word")
      s"""
         |double $s = 0.0;
         |for (int $w = 0; $w < $a.numElements(); $w++) {
         |  long $word = $a.getLong($w);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($word >>> $j) & 1L) == 1L
         |        && $w * 64 + $j < $b.numElements()) {
         |      $s += $b.getDouble($w * 64 + $j);
         |    }
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SketchDot =
    copy(left = newLeft, right = newRight)
}

/** Native product-quantization encoder: split an `array<double>`
  * embedding into `codebook.length` equal subvectors and emit, per
  * subspace, the index of the L2-nearest trained centroid —
  * `array<int>` of one small code per subspace (4-bit codes at the
  * default 16 centroids/subspace: a 512-byte embedding becomes an
  * 8-code row, the FAISS-PQ compact representation). The trained
  * codebook ([[graft.operators.PqIndex.build]]) rides the expression
  * as a broadcast reference object; the loop is generated (janino-safe
  * at any codebook size, same stance as [[PlaneSketch]]). Codebook
  * layout: `codebook(sub)(centroid)` = centroid vector of length
  * dims/subspaces. */
case class PqEncode(child: Expression, codebook: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  import org.apache.spark.sql.types.IntegerType
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val subs = codebook.length
    val dsub = if (subs == 0) 0 else codebook(0)(0).length
    val out = new Array[Int](subs)
    var s = 0
    while (s < subs) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < codebook(s).length) {
        val cen = codebook(s)(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val base = s * dsub + i
          val v = if (base < e.numElements()) e.getDouble(base) else 0.0
          val diff = v - cen(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val cb = ctx.addReferenceObj("codebook", codebook, "double[][][]")
      val subs = codebook.length
      val dsub = if (subs == 0) 0 else codebook(0)(0).length
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val bestD = ctx.freshName("bestD")
      val best = ctx.freshName("best")
      val diff = ctx.freshName("diff")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      val cen = ctx.freshName("cen")
      s"""
         |int[] $out = new int[$subs];
         |for (int $s = 0; $s < $subs; $s++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $cb[$s].length; $c++) {
         |    double[] $cen = $cb[$s][$c];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      int $base = $s * $dsub + $i;
         |      double $v = $base < $e.numElements()
         |        ? $e.getDouble($base) : 0.0;
         |      double $diff = $v - $cen[$i];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-row ADC lookup table of a QUERY embedding against a PQ
  * codebook: `lut(s·cps + c)` = inner product of the query's subspace-s
  * slice with centroid c of subspace s — the batch form of the
  * driver-side table a point probe computes, letting a query DATAFRAME
  * join PQ code rows and score them with [[PqAdc]] (column right-hand
  * side). One generated loop per row (subspaces × centroids × dsub
  * mults — ~1k at the defaults, paid once per query, not per
  * candidate). */
case class PqLut(child: Expression, codebook: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {

  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val subs = codebook.length
    val cps = if (subs == 0) 0 else codebook(0).length
    val dsub = if (subs == 0) 0 else codebook(0)(0).length
    val out = new Array[Double](subs * cps)
    var s = 0
    while (s < subs) {
      var c = 0
      while (c < cps) {
        val cen = codebook(s)(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val base = s * dsub + i
          if (base < e.numElements()) d += e.getDouble(base) * cen(i)
          i += 1
        }
        out(s * cps + c) = d
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val cb = ctx.addReferenceObj("codebook", codebook, "double[][][]")
      val subs = codebook.length
      val cps = if (subs == 0) 0 else codebook(0).length
      val dsub = if (subs == 0) 0 else codebook(0)(0).length
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val base = ctx.freshName("base")
      val cen = ctx.freshName("cen")
      s"""
         |double[] $out = new double[$subs * $cps];
         |for (int $s = 0; $s < $subs; $s++) {
         |  for (int $c = 0; $c < $cps; $c++) {
         |    double[] $cen = $cb[$s][$c];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      int $base = $s * $dsub + $i;
         |      if ($base < $e.numElements()) {
         |        $d += $e.getDouble($base) * $cen[$i];
         |      }
         |    }
         |    $out[$s * $cps + $c] = $d;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) score of a PQ code row against a query
  * lookup table: Σ over subspaces of `lut[s·cps + code[s]]`, where the
  * table holds the query subvector's inner product with every centroid
  * (`cps` = centroids per subspace, derived as lut.length/codes.length
  * — no extra parameter). The query side is never quantized; ranking
  * reads one table entry per subspace instead of touching the
  * embedding. `left` = codes (`array<int>`), `right` = lut
  * (`array<double>`). */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  import org.apache.spark.sql.types.IntegerType

  override def inputTypes = Seq(ArrayType(IntegerType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val subs = codes.numElements()
    if (subs == 0) return 0.0
    val cps = lut.numElements() / subs
    var sc = 0.0
    var s = 0
    while (s < subs) {
      // a code outside [0, cps) — codes from a different codebook, or
      // corrupted input through the SQL surface — contributes nothing
      // rather than reading out of bounds or aliasing into another
      // subspace's table entries
      val code = codes.getInt(s)
      if (code >= 0 && code < cps) sc += lut.getDouble(s * cps + code)
      s += 1
    }
    sc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sc = ctx.freshName("sc")
      val s = ctx.freshName("s")
      val subs = ctx.freshName("subs")
      val cps = ctx.freshName("cps")
      val code = ctx.freshName("code")
      s"""
         |double $sc = 0.0;
         |int $subs = $a.numElements();
         |int $cps = $subs == 0 ? 0 : $b.numElements() / $subs;
         |for (int $s = 0; $s < $subs; $s++) {
         |  int $code = $a.getInt($s);
         |  if ($code >= 0 && $code < $cps) {
         |    $sc += $b.getDouble($s * $cps + $code);
         |  }
         |}
         |${ev.value} = $sc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** Native argmax-cosine cell assignment: the index of the centroid (in
  * an `array<array<double>>` matrix column, element c = centroid of
  * cell c) with the highest cosine against the embedding — ties break
  * to the LOWEST cell id (strict `>` over an ascending scan). The
  * coarse-quantizer assignment of [[graft.operators.IvfIndex]]: the
  * matrix arrives as a COLUMN (one packed row broadcast-joined onto
  * the corpus — see `IvfIndex.assign`), never as an in-plan literal,
  * so plan size and task-serialization cost stay O(1) at any cell
  * count and assignment is a zero-shuffle narrow map. The embedding's
  * own norm scales every cell identically, so the score is
  * `dot(e, c) / |c|` — one generated loop per cell, no per-row sort,
  * no allocation. A zero-norm centroid scores NaN and is never
  * selected (strict `>`); an empty matrix yields cell 0.
  */
case class BestCell(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  import org.apache.spark.sql.types.IntegerType

  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "best_cell"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    val m = b.asInstanceOf[ArrayData]
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    val k = m.numElements()
    while (c < k) {
      val cent = m.getArray(c)
      val n = math.min(e.numElements(), cent.numElements())
      var dot = 0.0
      var nrm2 = 0.0
      var i = 0
      while (i < n) {
        val cv = cent.getDouble(i)
        dot += e.getDouble(i) * cv
        nrm2 += cv * cv
        i += 1
      }
      val score = dot / java.lang.Math.sqrt(nrm2)
      if (score > bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val c = ctx.freshName("c")
      val k = ctx.freshName("k")
      val cent = ctx.freshName("cent")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nrm2 = ctx.freshName("nrm2")
      val i = ctx.freshName("i")
      val cv = ctx.freshName("cv")
      val score = ctx.freshName("score")
      s"""
         |int $best = 0;
         |double $bestScore = Double.NEGATIVE_INFINITY;
         |int $k = $b.numElements();
         |for (int $c = 0; $c < $k; $c++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cent = $b.getArray($c);
         |  int $n = java.lang.Math.min($a.numElements(), $cent.numElements());
         |  double $dot = 0.0;
         |  double $nrm2 = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $cv = $cent.getDouble($i);
         |    $dot += $a.getDouble($i) * $cv;
         |    $nrm2 += $cv * $cv;
         |  }
         |  double $score = $dot / java.lang.Math.sqrt($nrm2);
         |  if ($score > $bestScore) { $bestScore = $score; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BestCell =
    copy(left = newLeft, right = newRight)
}

/** Column-level vector math built on [[VectorDot]].
  *
  * Spark 4 removed the public Column-from-Expression constructor, so the
  * expression is exposed through the session's `FunctionRegistry` and
  * invoked with the public `call_function` — `register` is hooked into
  * `graft.sources.Tables`, the chokepoint every query loads through.
  */
object VectorOps {

  // once-per-session guard: Tables.apply calls register on every table
  // load; re-registering spams "function vec_dot replaced" warnings and
  // takes the registry lock on the hot path
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  // Parameter positions of the registered wrappers must be foldable
  // integral literals (the library wrappers pass `lit(int)`); SQL users
  // can hand us a BIGINT literal, a non-foldable column, or NULL — turn
  // each into a clear analysis-time error instead of an opaque
  // ClassCastException/NPE at use time.
  private[graft] def intArg(fn: String, name: String, e: Expression): Int = {
    def fail(got: String) = throw new IllegalArgumentException(
      s"$fn expects a literal INT for '$name'; got $got")
    if (!e.foldable) fail(s"non-foldable expression ${e.sql}")
    e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case null => fail("NULL")
      case other => fail(s"${e.dataType.simpleString} value $other")
    }
  }

  // pq_encode's codebook arrives as a foldable nested-array literal
  // (the trained matrix is runtime data, so it rides a typedLit) and is
  // unpacked once at expression construction.
  private[graft] def codebookOf(fn: String, e: Expression)
      : Array[Array[Array[Double]]] = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn expects a literal codebook (array<array<array<double>>>)")
    val cb = e.eval() match {
      case top: ArrayData =>
        Array.tabulate(top.numElements()) { s =>
          val sub = top.getArray(s)
          Array.tabulate(sub.numElements())(c =>
            sub.getArray(c).toDoubleArray())
        }
      case null => throw new IllegalArgumentException(
        s"$fn expects a literal codebook; got NULL")
      case other => throw new IllegalArgumentException(
        s"$fn expects a literal codebook; got $other")
    }
    // the expressions derive dsub from codebook(0)(0) — reject shapes
    // that would throw an opaque AIOOBE at execution time instead
    if (cb.isEmpty || cb.exists(_.isEmpty) ||
        cb.exists(_.exists(_.isEmpty)))
      throw new IllegalArgumentException(
        s"$fn expects >= 1 non-empty centroid per subspace")
    cb
  }

  /** Idempotently register the vector expressions (once per session). */
  def register(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry
      reg.createOrReplaceTempFunction("vec_dot",
        exprs => VectorDot(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("plane_sketch",
        exprs => PlaneSketch(exprs(0),
          intArg("plane_sketch", "base", exprs(1)),
          intArg("plane_sketch", "words", exprs(2))), "built-in")
      reg.createOrReplaceTempFunction("sketch_dot",
        exprs => SketchDot(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("plane_project",
        exprs => PlaneProject(exprs(0),
          intArg("plane_project", "base", exprs(1)),
          intArg("plane_project", "count", exprs(2))), "built-in")
      reg.createOrReplaceTempFunction("pq_encode",
        exprs => PqEncode(exprs(0),
          codebookOf("pq_encode", exprs(1))), "built-in")
      reg.createOrReplaceTempFunction("pq_adc",
        exprs => PqAdc(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("pq_lut",
        exprs => PqLut(exprs(0),
          codebookOf("pq_lut", exprs(1))), "built-in")
      reg.createOrReplaceTempFunction("best_cell",
        exprs => BestCell(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction("plane_sigs",
        exprs => PlaneSigs(exprs(0),
          intArg("plane_sigs", "base", exprs(1)),
          intArg("plane_sigs", "tables", exprs(2)),
          intArg("plane_sigs", "planes", exprs(3))), "built-in")
    }

  /** Dot product of two `array<double>` columns (codegen'd). */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** `words`×64-bit hyperplane sign sketch of an embedding column
    * (planes at offset `base` of the deterministic md5 family). */
  def planeSketch(emb: Column, base: Int, words: Int): Column =
    call_function("plane_sketch", emb.cast("array<double>"),
      lit(base), lit(words))

  /** Asymmetric sketch score against literal per-plane projections. */
  def sketchDot(sketch: Column, projs: Seq[Double]): Column =
    call_function("sketch_dot", sketch, typedLit(projs))

  /** Asymmetric sketch score against a per-ROW projection column (the
    * batch form — queries are a DataFrame, see [[PlaneProject]]). */
  def sketchDotCol(sketch: Column, projs: Column): Column =
    call_function("sketch_dot", sketch, projs)

  /** Per-row projections of an embedding column onto `count` planes of
    * the deterministic md5 family at offset `base`. */
  def planeProject(emb: Column, base: Int, count: Int): Column =
    call_function("plane_project", emb.cast("array<double>"),
      lit(base), lit(count))

  /** Multi-table LSH signature array (planes at offset `base` of the
    * deterministic md5 family; `planes` sign bits per table). */
  def planeSigs(emb: Column, base: Int, tables: Int, planes: Int): Column =
    call_function("plane_sigs", emb.cast("array<double>"),
      lit(base), lit(tables), lit(planes))

  /** PQ codes of an embedding column under a trained codebook
    * (`codebook(sub)(centroid)` subvectors — see
    * [[graft.operators.PqIndex.build]]). */
  def pqEncode(emb: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    call_function("pq_encode", emb.cast("array<double>"), typedLit(codebook))

  /** ADC score of a PQ code column against a literal query lookup
    * table (laid out `lut(sub·cps + centroid)`). */
  def pqAdc(codes: Column, lut: Seq[Double]): Column =
    call_function("pq_adc", codes, typedLit(lut))

  /** ADC score against a per-ROW lookup-table column (the batch form;
    * see [[PqLut]]). */
  def pqAdcCol(codes: Column, lut: Column): Column =
    call_function("pq_adc", codes, lut)

  /** Per-row ADC lookup table of a query embedding column under a
    * trained codebook. */
  def pqLut(emb: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    call_function("pq_lut", emb.cast("array<double>"), typedLit(codebook))

  /** Argmax-cosine cell of an embedding column against a centroid
    * MATRIX column (`array<array<double>>`, element c = cell c's
    * centroid — see [[BestCell]]): the IVF coarse-assignment loop as
    * one codegen'd expression, taking its centroids from a
    * broadcast-joined column rather than an in-plan literal. */
  def bestCell(emb: Column, cents: Column): Column =
    call_function("best_cell", emb.cast("array<double>"), cents)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; inputs any numeric array (cast to double). */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    dot(ad, bd) / (norm(ad) * norm(bd))
  }
}
