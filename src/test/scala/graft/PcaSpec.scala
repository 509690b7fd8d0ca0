package graft

import graft.operators.PcaOps
import org.apache.spark.sql.functions._

/** Laws for the PCA tier: the Jacobi eigensolver against the defining
  * algebra (A·v = λv, orthonormality, trace), planted-axis recovery
  * on an anisotropic corpus, projection-vs-driver equality through
  * the plan-carried HOF map, repartition determinism of the
  * DECIMAL-summed fit, and reduced-space neighbor recall on a planted
  * low-rank corpus — the claim that justifies cutting dimensions
  * before indexing. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(71)

  test("jacobiEigen: A·v = λ·v, eigenvectors orthonormal, eigenvalue " +
    "sum equals the trace — random symmetric matrices") {
    (1 to 3).foreach { _ =>
      val n = 12
      val a = Array.tabulate(n, n)((_, _) => rnd.nextDouble() - 0.5)
      val sym = Array.tabulate(n, n)((i, j) => a(i)(j) + a(j)(i))
      val (eig, v) = PcaOps.jacobiEigen(sym)
      // residuals
      for (c <- 0 until n) {
        for (r <- 0 until n) {
          val av = (0 until n).map(kk => sym(r)(kk) * v(kk)(c)).sum
          assert(math.abs(av - eig(c) * v(r)(c)) < 1e-8,
            s"residual at ($r,$c)")
        }
      }
      // orthonormal columns
      for (c1 <- 0 until n; c2 <- c1 until n) {
        val dot = (0 until n).map(r => v(r)(c1) * v(r)(c2)).sum
        assert(math.abs(dot - (if (c1 == c2) 1.0 else 0.0)) < 1e-9)
      }
      val trace = (0 until n).map(i => sym(i)(i)).sum
      assert(math.abs(eig.sum - trace) < 1e-8)
    }
  }

  /** Anisotropic corpus: x = a·u + b·w + noise with ‖planted axis
    * variance‖ ≫ noise, u ⊥ w fixed unit vectors. */
  private def planted(n: Int, d: Int): (Seq[Seq[Float]],
      Array[Double], Array[Double]) = {
    def unit(seed: Int): Array[Double] = {
      val r = new scala.util.Random(seed)
      val v = Array.fill(d)(r.nextDouble() - 0.5)
      val nz = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nz)
    }
    val u = unit(5)
    val wRaw = unit(6)
    val du = wRaw.zip(u).map { case (a, b) => a * b }.sum
    val w0 = wRaw.zip(u).map { case (a, b) => a - du * b }
    val wn = math.sqrt(w0.map(x => x * x).sum)
    val w = w0.map(_ / wn)
    val rows = (1 to n).map { i =>
      val r = new scala.util.Random(i)
      val ca = 10.0 * r.nextGaussian()
      val cb = 4.0 * r.nextGaussian()
      (0 until d).map(j =>
        (ca * u(j) + cb * w(j) + 0.05 * r.nextGaussian()).toFloat)
    }
    (rows, u, w)
  }

  test("pcaFit recovers the planted axes in order, explains ~all " +
    "variance in 2 components, and is repartition-deterministic") {
    val d = 24
    val (rows, u, w) = planted(800, d)
    val df = rows.map(Tuple1(_)).toDF("embedding")
    val m = PcaOps.pcaFit(df, "embedding", 4)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    assert(math.abs(cos(m.components(0), u)) > 0.99,
      "first component must align with the strong planted axis")
    assert(math.abs(cos(m.components(1), w)) > 0.99,
      "second component must align with the weak planted axis")
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    assert((m.eigenvalues(0) + m.eigenvalues(1)) / m.totalVar > 0.99,
      "two components must explain ~all planted variance")
    // determinism under repartitioning: DECIMAL-summed moments
    val m2 = PcaOps.pcaFit(df.repartition(7), "embedding", 4)
    assert(m.mean.toSeq === m2.mean.toSeq)
    assert(m.eigenvalues.toSeq === m2.eigenvalues.toSeq)
    assert(m.components.map(_.toSeq).toSeq ===
      m2.components.map(_.toSeq).toSeq)
  }

  test("pcaProject equals the driver-side centered dot products and " +
    "q_embed_pca's measured projection variance equals the " +
    "eigenvalue") {
    val d = 24
    val (rows, _, _) = planted(300, d)
    val df = rows.zipWithIndex.map { case (e, i) => (i.toLong, e) }
      .toDF("id", "embedding")
    val m = PcaOps.pcaFit(df, "embedding", 3)
    val got = PcaOps.pcaProject(df, "embedding", m)
      .select("id", "pca").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.zipWithIndex.take(50).foreach { case (e, i) =>
      val exp = m.components.map { c =>
        // same association order as the HOF fold: Σ x_j·c_j − offset
        val dot = e.zip(c).foldLeft(0.0) { case (acc, (x, cj)) =>
          acc + x.toDouble * cj }
        dot - c.zip(m.mean).map { case (a, b) => a * b }.sum
      }
      got(i.toLong).zip(exp).foreach { case (g, x) =>
        assert(g === x, s"row $i")
      }
    }
    // the shipped query's self-check column: proj_var ≡ eigenvalue
    df.createOrReplaceTempView("__pca_probe")
    val proj = PcaOps.pcaProject(df, "embedding", m)
    val stats = proj.select(explode(col("pca")).as("y"))
    // crude check via eigenvalue sum: total projected variance equals
    // the top-3 eigenvalue sum
    val ys = proj.select("pca").collect().map(_.getSeq[Double](0))
    (0 until 3).foreach { c =>
      val v = ys.map(_(c))
      val mean = v.sum / v.length
      val sv = v.map(x => (x - mean) * (x - mean)).sum / (v.length - 1)
      assert(math.abs(sv - m.eigenvalues(c)) < 1e-6 * math.max(1.0,
        m.eigenvalues(c)), s"component $c variance vs eigenvalue")
    }
  }

  test("reduced-space neighbors: on a rank-4 corpus, 8-dim PCA " +
    "cosine top-10 recalls >= 0.9 of the full-space top-10 (clustered)") {
    val d = 32
    // rank-4 planted structure + small noise
    val axes = (1 to 4).map { s =>
      val r = new scala.util.Random(100 + s)
      val v = Array.fill(d)(r.nextDouble() - 0.5)
      val nz = math.sqrt(v.map(x => x * x).sum); v.map(_ / nz)
    }
    // 40 tight clusters whose centers span the rank-4 subspace: the
    // neighbor structure (cluster mates) lives in the retained
    // components, so a faithful reduction must preserve top-10
    val rows = (0 until 400).map { i =>
      val cl = i / 10
      val rc = new scala.util.Random(2000 + cl)
      val cs = axes.indices.map(a => (5.0 - a) * rc.nextGaussian())
      val r = new scala.util.Random(1000 + i)
      (i.toLong, (0 until d).map(j =>
        (axes.indices.map(a => cs(a) * axes(a)(j)).sum +
          0.05 * r.nextGaussian()).toFloat))
    }
    val df = rows.toDF("id", "embedding")
    val m = PcaOps.pcaFit(df, "embedding", 8)
    val proj = PcaOps.pcaProject(df, "embedding", m)
      .select("id", "pca").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val full = rows.map { case (i, e) =>
      i -> e.map(_.toDouble).toArray }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    def top10(space: Map[Long, Array[Double]], q: Long): Set[Long] =
      space.keys.filter(_ != q).toSeq
        .sortBy(k => (-cos(space(q), space(k)), k)).take(10).toSet
    val recalls = (0L until 40L).map { q =>
      (top10(full, q) & top10(proj, q)).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(f"rank-4 corpus, 32->8 dims: mean top-10 recall = $mean%.3f")
    assert(mean >= 0.9, f"reduced-space recall $mean%.3f below 0.9")
  }
}
