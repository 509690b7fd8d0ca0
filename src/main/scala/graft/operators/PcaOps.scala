package graft.operators

import graft.Query
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** PCA over an embedding column — the dimensionality-reduction pass a
  * large-scale vector pipeline runs BEFORE indexing (a 64→16 cut is a
  * 4× storage/bandwidth win on top of [[SimilarityOps]]'s int8
  * quantization, and IVF/PQ train faster and probe tighter in the
  * reduced space).
  *
  * Fit is moment-based: ONE distributed pass builds the d(d+1)/2
  * upper-triangle second moments and the d first moments — a
  * per-partition Gram accumulation (`mapPartitions`: each partition
  * folds its rows into d(d+1)/2 + d exact decimal sums and emits ONLY
  * those rows, so shuffle volume is partitions·d², independent of n —
  * the r15 verdict fix for the previous HOF explosion, which shipped
  * n·(d²/2 + d) struct rows into the aggregate and would be
  * catastrophic at d=768). Every per-row product is rounded to
  * DECIMAL scale 12 HALF_UP before the exact BigDecimal add —
  * identical to the old per-term `cast(DECIMAL(38,12))` — and exact
  * decimal addition is order- and grouping-invariant, so the fit is
  * REPARTITION-DETERMINISTIC (the q_drift stance; double
  * tree-aggregation order would not be). The ≤(d²/2 + d)-row
  * moment table collects to the driver, where the covariance matrix
  * solves by cyclic JACOBI rotations ([[PcaOps.jacobiEigen]] — the
  * classic symmetric eigensolver, deterministic sweep order, no
  * external linear algebra). Eigenpairs sort (eigenvalue DESC, index
  * ASC); each component's sign normalizes so its largest-|entry|
  * coordinate is positive — a fully deterministic model.
  *
  * Projection is a narrow codegen'd HOF map against the PLAN-CARRIED
  * component matrix (the PqEncode codebook stance — k·d doubles as a
  * literal, never driver state at eval time): coordinate j =
  * dot(x, comp_j) − dot(mean, comp_j), the second term folded into a
  * k-vector of driver-computed offsets. No shuffle, no UDF.
  *
  * No SQL oracle (eigendecomposition is not SQL-expressible) —
  * PcaSpec pins the algebra: A·v = λv residuals, orthonormality,
  * trace accounting, planted-axis recovery, projection-vs-driver
  * equality, repartition determinism, and reduced-space neighbor
  * recall on a planted low-rank corpus.
  */
object PcaOps {

  /** Deterministic PCA model: `components` holds k orthonormal rows
    * of length d, strongest first. */
  final case class PcaModel(mean: Array[Double],
      eigenvalues: Array[Double], totalVar: Double,
      components: Array[Array[Double]]) {
    def d: Int = mean.length
    def k: Int = components.length
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix:
    * returns (eigenvalues, eigenvectors as COLUMNS of v) with
    * off-diagonal square mass < 1e-20·‖A‖²_F or 64 sweeps, whichever
    * first (residuals ‖Av − λv‖ then sit below ~1e-10·‖A‖).
    * Deterministic: fixed (p, q) sweep order, textbook rotation. */
  private[graft] def jacobiEigen(aIn: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var norm = 0.0
    for (i <- 0 until n; j <- 0 until n) norm += a(i)(j) * a(i)(j)
    var sweep = 0
    while (off() > 1e-20 * math.max(norm, 1e-300) && sweep < 64) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < n) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** One partition's moment contribution: upper-triangle (i ≤ j)
    * second-moment sums, first moments at j = -1, row count `c`.
    * `s` rides the default Decimal encoder (38,18); the accumulated
    * values are scale-12 so the widening is exact. */
  private[graft] final case class MomRow(i: Int, j: Int,
      s: scala.math.BigDecimal, c: Long)

  /** Round a per-row product to DECIMAL scale 12 exactly the way
    * Spark's `cast(DECIMAL(38,12))` does (shortest decimal string of
    * the double, then HALF_UP at 12dp) — the invariant that keeps the
    * partition-folded fit bit-identical to the old per-term-cast
    * aggregate. */
  @inline private def dec12Of(p: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(p)
      .setScale(12, java.math.RoundingMode.HALF_UP)

  /** Fit a k-component PCA model over `embCol` (array<float/double>,
    * fixed length d). One distributed moment pass; driver Jacobi on
    * the d×d covariance. */
  def pcaFit(df: DataFrame, embCol: String, k: Int): PcaModel = {
    val spark = df.sparkSession
    import spark.implicits._
    val first = df.select(col(embCol)).filter(col(embCol).isNotNull)
      .limit(1).collect()
    require(first.nonEmpty, "pcaFit: no non-null embeddings")
    val d = first(0).getSeq[Any](0).size
    require(k >= 1 && k <= d, s"pcaFit k must be in [1, $d]; got $k")
    val tri = d * (d + 1) / 2
    // per-partition Gram fold: ≤ tri + d emitted rows per partition
    // regardless of row count, then one tiny (i, j) decimal-sum
    // combine — shuffle bytes are partitions·d², never n·d²
    val partials = df.filter(col(embCol).isNotNull)
      .select(transform(col(embCol), e => e.cast("double")).as("x"))
      .as[Seq[Double]]
      .mapPartitions { rows =>
        val ss = Array.fill(tri)(java.math.BigDecimal.ZERO)
        val fm = Array.fill(d)(java.math.BigDecimal.ZERO)
        var c = 0L
        rows.foreach { xs =>
          val arr = xs.toArray
          require(arr.length == d,
            s"pcaFit: ragged embedding (${arr.length} vs $d)")
          var idx = 0; var i = 0
          while (i < d) {
            val xi = arr(i)
            fm(i) = fm(i).add(dec12Of(xi))
            var j = i
            while (j < d) {
              ss(idx) = ss(idx).add(dec12Of(xi * arr(j)))
              idx += 1; j += 1
            }
            i += 1
          }
          c += 1
        }
        if (c == 0) Iterator.empty
        else {
          var idx = -1
          val up = for (i <- 0 until d; j <- i until d) yield {
            idx += 1
            MomRow(i, j, scala.math.BigDecimal(ss(idx)), c)
          }
          val fs = (0 until d).map(i =>
            MomRow(i, -1, scala.math.BigDecimal(fm(i)), c))
          (up ++ fs).iterator
        }
      }
    val pairs = partials.groupBy("i", "j")
      .agg(sum(col("s")).as("s"), sum(col("c")).as("c"))
      .collect()
    val n = pairs.find(r => r.getInt(1) == -1).map(_.getLong(3))
      .getOrElse(0L)
    require(n >= 2, s"pcaFit needs >= 2 rows; got $n")
    val sums = Array.ofDim[Double](d)
    val mom = Array.ofDim[Double](d, d)
    pairs.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      val s = r.getDecimal(2).doubleValue()
      if (j == -1) sums(i) = s
      else { mom(i)(j) = s; mom(j)(i) = s }
    }
    val mean = sums.map(_ / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      (mom(i)(j) - sums(i) * sums(j) / n) / (n - 1))
    val (eig, vecs) = jacobiEigen(cov)
    val order = (0 until d).sortBy(i => (-eig(i), i))
    val comps = order.take(k).map { ci =>
      val comp = Array.tabulate(d)(r => vecs(r)(ci))
      // deterministic sign: largest-|entry| coordinate positive
      val m = comp.indices.maxBy(i => (math.abs(comp(i)), -i))
      if (comp(m) < 0) comp.map(-_) else comp
    }.toArray
    PcaModel(mean, order.take(k).map(eig).toArray,
      eig.sum, comps)
  }

  /** Project `embCol` onto the model's components: appends
    * `outCol` = array<double> of length model.k. Narrow codegen'd
    * HOF map against the plan-carried component matrix. */
  def pcaProject(df: DataFrame, embCol: String, model: PcaModel,
      outCol: String = "pca"): DataFrame = {
    val comps = typedLit(model.components.map(_.toSeq).toSeq)
    val offsets = typedLit(model.components.map(c =>
      c.zip(model.mean).map { case (a, b) => a * b }.sum).toSeq)
    val x = transform(col(embCol), e => e.cast("double"))
    df.withColumn(outCol,
      transform(sequence(lit(0), lit(model.k - 1)), ki =>
        aggregate(
          zip_with(x, get(comps, ki), (a, b) => a * b),
          lit(0.0), (acc, v) => acc + v) -
          get(offsets, ki)))
  }

  /** Per-(session, corpus) cached 16-component model over the
    * embeddings table — the wpVocabCache stance (a train-once
    * production artifact; k·d doubles of driver state, no executor
    * storage). */
  private val modelCache = new IndexCache[PcaModel](
    (s, d) => pcaFit(Tables.embeddings(s, d), "embedding", 16),
    _ => ())

  def modelForDir(s: org.apache.spark.sql.SparkSession,
      d: String): PcaModel = modelCache.get(s, d)

  /** The variance ledger of `embCol` under `model`: per component,
    * its eigenvalue, share, cumulative share, and the MEASURED
    * variance of the projected coordinate (≡ eigenvalue — the
    * self-check that the projection really is the eigenbasis). */
  def pcaSummary(df: DataFrame, embCol: String, model: PcaModel)
      : DataFrame = {
    val dec12 = DecimalType(38, 12)
    val r6 = (c: Column) => round(c * lit(1000000.0)) / lit(1000000.0)
    val proj = pcaProject(df, embCol, model)
    val k = model.k
    val stats = proj.select(explode(
        transform(sequence(lit(0), lit(k - 1)), i =>
          struct(i.as("component"),
            get(col("pca"), i).as("y")))).as("t"))
      .groupBy(col("t.component").as("component"))
      .agg(count(lit(1)).as("n"),
        sum(col("t.y").cast(dec12)).as("sy"),
        sum((col("t.y") * col("t.y")).cast(dec12)).as("syy"))
    val eigTab = df.sparkSession.createDataFrame(
      model.eigenvalues.zipWithIndex.map { case (e, i) =>
        (i, e, model.eigenvalues.take(i + 1).sum) }.toSeq)
      .toDF("component", "eigenvalue", "cumvar")
    stats.join(broadcast(eigTab), Seq("component"))
      .select(col("component").cast("bigint").as("component"),
        col("n"),
        r6(col("eigenvalue")).as("eigenvalue"),
        r6(col("eigenvalue") / lit(model.totalVar))
          .as("explained_ratio"),
        r6(col("cumvar") / lit(model.totalVar)).as("cum_ratio"),
        r6((col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double") /
            col("n")) / (col("n") - 1)).as("proj_var"))
      .orderBy("component")
  }

  val all: Seq[Query] = Seq(
    // The variance ledger of the embedding corpus — see [[pcaSummary]].
    // No SQL oracle (eigendecomposition); PcaSpec pins the algebra and
    // determinism makes the rows-only gate stable.
    Query(
      "q_embed_pca",
      None,
      (s, d) => pcaSummary(Tables.embeddings(s, d), "embedding",
        modelForDir(s, d)))
  )
}
