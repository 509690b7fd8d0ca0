package graft.operators

import graft.Query
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Nonparametric two-sample tests: Kolmogorov–Smirnov (largest ECDF
  * gap) and Mann–Whitney U (rank-sum with tie correction) — the "are
  * these two distributions actually different" questions that don't
  * assume normality, as q_ab_metrics' z-test does.
  *
  * Both reduce to exact integer arithmetic over the per-distinct-value
  * count table: the KS gap compares integer cross-products
  * |cumA·nB − cumB·nA| (never a float ECDF), and the U statistic folds
  * from doubled average ranks 2·rank = 2·C(<v) + c(v) + 1, which are
  * integers even under ties. The single global cumulative each needs
  * runs TWO-LEVEL (the lorenzGini shape): 1024 value-range buckets,
  * a ≤1024-row bounded offset window, then within-bucket windows
  * partitioned by bucket — never a one-partition sort of the corpus.
  * Cross-products accumulate in DECIMAL(38,0) so the integers stay
  * exact far past BIGINT scale.
  */
object HypothesisOps {

  private def r6(c: Column): Column = round(c * lit(1000000.0)) / lit(1000000.0)
  private val dec0 = DecimalType(38, 0)
  private val nBuckets = 1024

  /** Per-distinct-value table (v, na, nb) with two-level exclusive/
    * inclusive cumulative counts for each group. Shared spine of both
    * tests. */
  private def cumCounts(df: DataFrame, valCol: String, groupCol: String,
      aVal: String, bVal: String): DataFrame = {
    val s = df.filter(col(groupCol).isin(aVal, bVal))
      .select(col(valCol).cast("double").as("v"),
        when(col(groupCol) === aVal, 1L).otherwise(0L).as("isa"))
    val g = s.groupBy("v")
      .agg(sum(col("isa")).as("na"), sum(lit(1L) - col("isa")).as("nb"))
    val bounds = g.agg(min("v").as("__lo"), max("v").as("__hi"))
    val bucketed = g.crossJoin(broadcast(bounds))
      .withColumn("bkt",
        least(lit(nBuckets - 1), greatest(lit(0),
          floor((col("v") - col("__lo")) * nBuckets /
            (col("__hi") - col("__lo") + lit(1e-9))))).cast("int"))
      .drop("__lo", "__hi")
    val wOff = Window.partitionBy(BoundedWindow.key(col("bkt")))
      .orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("bkt")
      .agg(sum("na").as("sa"), sum("nb").as("sb"))
      .select(col("bkt"),
        coalesce(sum("sa").over(wOff), lit(0L)).as("offa"),
        coalesce(sum("sb").over(wOff), lit(0L)).as("offb"))
    val wIn = Window.partitionBy("bkt").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offsets), "bkt")
      .withColumn("ca", col("offa") + sum("na").over(wIn))
      .withColumn("cb", col("offb") + sum("nb").over(wIn))
  }

  /** Two-sample Kolmogorov–Smirnov: D = max_v |F_a(v) − F_b(v)| over
    * the pooled distinct values (the ECDFs only step there, so the max
    * is exact), with the asymptotic two-sided p ≈ 2·exp(−2·m·D²),
    * m = nA·nB/(nA+nB). The max runs over the integer cross-product
    * gap |cumA·nB − cumB·nA|; one float division at the very end. */
  def ksTest(df: DataFrame, valCol: String, groupCol: String,
      aVal: String, bVal: String): DataFrame = {
    val cum = cumCounts(df, valCol, groupCol, aVal, bVal)
    val tot = cum.agg(sum("na").as("nat"), sum("nb").as("nbt"))
    val m = cum.crossJoin(broadcast(tot))
      .agg(
        max(abs(col("ca").cast(dec0) * col("nbt") -
          col("cb").cast(dec0) * col("nat"))).as("dnum"),
        min("nat").as("n_a"), min("nbt").as("n_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val d = col("dnum").cast("double") / (na * nb)
    m.select(col("n_a"), col("n_b"), r6(d).as("d_stat"),
      r6(least(lit(1.0),
        lit(2.0) * exp(lit(-2.0) * d * d * na * nb / (na + nb))))
        .as("p_value"))
  }

  /** Mann–Whitney U (two-sided normal approximation, tie-corrected):
    * U = Ra − nA(nA+1)/2 where Ra sums group A's AVERAGE ranks;
    * doubled ranks 2·rank(v) = 2·C(<v) + c(v) + 1 keep everything
    * integer under ties. z = (U − nA·nB/2) / σ with
    * σ² = nA·nB/12 · ((n+1) − Σ(t³−t)/(n(n−1))). */
  def mannWhitney(df: DataFrame, valCol: String, groupCol: String,
      aVal: String, bVal: String): DataFrame = {
    val cum = cumCounts(df, valCol, groupCol, aVal, bVal)
    val c = col("na") + col("nb")
    val cPrev = (col("ca") + col("cb")).cast(dec0) - c // pooled C(<v)
    val m = cum.agg(
      sum(col("na").cast(dec0) * (cPrev * 2 + c + 1)).as("ra2"),
      sum((c.cast(dec0) * c * c - c).cast(dec0)).as("ties"),
      sum("na").as("n_a"), sum("nb").as("n_b"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val n = na + nb
    val u = (col("ra2").cast("double") - na * (na + lit(1.0))) / lit(2.0)
    val sigma = sqrt(na * nb / lit(12.0) *
      ((n + lit(1.0)) - col("ties").cast("double") / (n * (n - lit(1.0)))))
    m.select(col("n_a"), col("n_b"), r6(u).as("u"),
      r6((u - na * nb / lit(2.0)) / sigma).as("z"))
  }

  val all: Seq[Query] = Seq(
    // Do finished ('F') and open ('O') orders draw their totals from
    // the same distribution? KS is the shape-sensitive answer — it
    // sees location AND spread AND tail differences.
    Query(
      "q_ks_test",
      Some("""WITH s AS (
                SELECT o_totalprice AS v,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS isa
                FROM orders WHERE o_orderstatus IN ('F', 'O')),
              g AS (SELECT v, sum(isa) AS na, sum(1 - isa) AS nb
                    FROM s GROUP BY 1),
              c AS (SELECT v, na, nb,
                      sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS ca,
                      sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS cb
                    FROM g),
              t AS (SELECT sum(na) AS nat, sum(nb) AS nbt FROM g),
              d AS (SELECT max(abs(ca * nbt - cb * nat)) AS dnum,
                           min(nat) AS n_a, min(nbt) AS n_b
                    FROM c CROSS JOIN t),
              ds AS (SELECT n_a, n_b,
                            CAST(dnum AS DOUBLE)
                              / (CAST(n_a AS DOUBLE) * n_b) AS dd
                     FROM d)
              SELECT CAST(n_a AS BIGINT) AS n_a,
                     CAST(n_b AS BIGINT) AS n_b,
                     round(dd * 1000000.0)/1000000.0 AS d_stat,
                     round(least(1.0, 2.0 * exp(-2.0 * dd * dd
                         * n_a * n_b / (n_a + n_b)))
                       * 1000000.0)/1000000.0 AS p_value
              FROM ds"""),
      (s, d) => ksTest(Tables.orders(s, d), "o_totalprice",
        "o_orderstatus", "F", "O")),

    // Same question, rank-flavored: Mann–Whitney is the robust
    // "is one group stochastically larger" test — the nonparametric
    // twin of q_ab_metrics' two-proportion z.
    Query(
      "q_mann_whitney",
      Some("""WITH s AS (
                SELECT o_totalprice AS v,
                       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                         AS isa
                FROM orders WHERE o_orderstatus IN ('F', 'O')),
              g AS (SELECT v, sum(isa) AS na, sum(1 - isa) AS nb
                    FROM s GROUP BY 1),
              c AS (SELECT v, na, nb, na + nb AS cnt,
                      coalesce(sum(na + nb) OVER (ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1
                        PRECEDING), 0) AS cprev
                    FROM g),
              m AS (SELECT sum(na * (2 * cprev + cnt + 1)) AS ra2,
                           sum(cnt * cnt * cnt - cnt) AS ties,
                           sum(na) AS n_a, sum(nb) AS n_b
                    FROM c)
              SELECT CAST(n_a AS BIGINT) AS n_a,
                     CAST(n_b AS BIGINT) AS n_b,
                     round((CAST(ra2 AS DOUBLE)
                         - CAST(n_a AS DOUBLE) * (n_a + 1.0)) / 2.0
                       * 1000000.0)/1000000.0 AS u,
                     round(((CAST(ra2 AS DOUBLE)
                           - CAST(n_a AS DOUBLE) * (n_a + 1.0)) / 2.0
                         - CAST(n_a AS DOUBLE) * n_b / 2.0)
                       / sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
                           * ((CAST(n_a AS DOUBLE) + n_b + 1.0)
                             - CAST(ties AS DOUBLE)
                               / ((CAST(n_a AS DOUBLE) + n_b)
                                 * (CAST(n_a AS DOUBLE) + n_b - 1.0))))
                       * 1000000.0)/1000000.0 AS z
              FROM m"""),
      (s, d) => mannWhitney(Tables.orders(s, d), "o_totalprice",
        "o_orderstatus", "F", "O")))
}
