package graft.operators

import graft.Query
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tier B″ — declarative data-quality constraints (the dbt-test /
  * Deequ-style checks every ingest gate runs): not-null, range,
  * key-uniqueness, and referential integrity, each reported as a
  * violation COUNT so the report is a handful of rows at any corpus
  * size.
  *
  * Scale stance: all scalar checks against one table fuse into a
  * SINGLE aggregate pass (conditional sums — one scan however many
  * checks); uniqueness is a key-partitioned count with the >1 filter
  * BEFORE the final fold (the duplicate-group table is tiny);
  * referential integrity is one equi anti-join per FK edge (broadcast
  * when the dimension is small, AQE otherwise). Nothing collects; the
  * report assembles |checks| one-row frames.
  */
object ConstraintOps {

  /** One declarative check. `name` keys the report row. */
  sealed trait Check { def name: String }

  /** `col` must never be NULL. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null $col"
  }

  /** `col` must sit in [lo, hi]; NULL counts as a violation (a range
    * check subsumes presence). */
  final case class InRange(col: String, lo: Double, hi: Double)
      extends Check {
    def name = f"range $col [${fmt(lo)},${fmt(hi)}]"
    private def fmt(d: Double) =
      if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
  }

  /** `col` must be unique; violations = surplus rows beyond the first
    * of each duplicate group. */
  final case class UniqueKey(col: String) extends Check {
    def name = s"unique $col"
  }

  /** Every non-null `fkCol` must match a `pkCol` in `dim` (`dimName`
    * labels the report row). */
  final case class RefIntegrity(fkCol: String, dim: DataFrame,
      dimName: String, pkCol: String) extends Check {
    def name = s"ref $fkCol -> $dimName.$pkCol"
  }

  /** Run `checks` against `df` and report one `(check_name,
    * violations)` row per check, ordered by name. */
  def dqReport(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "dqReport needs at least one check")
    // check names embed column names in a stack() SQL string — hold
    // them to plain identifiers (the profile/funnel rule) so a weird
    // name fails here, not as a parse error inside the unpivot
    val checkedCols = checks.collect {
      case c: NotNull => c.col
      case c: InRange => c.col
    }
    require(checkedCols.forall(_.matches("[A-Za-z0-9_]+")),
      s"dqReport column names must be simple identifiers; " +
        s"got $checkedCols")
    // coalesce: a sum over an empty table folds to NULL, and an empty
    // input must read "0 violations", not an unknown
    val scalar = checks.collect {
      case c: NotNull => c.name ->
        coalesce(sum(when(col(c.col).isNull, 1L).otherwise(0L)), lit(0L))
      case c: InRange => c.name ->
        coalesce(sum(when(col(c.col).isNull || col(c.col) < c.lo ||
          col(c.col) > c.hi, 1L).otherwise(0L)), lit(0L))
    }
    val scalarFrame: Option[DataFrame] = if (scalar.isEmpty) None else {
      val aggs = scalar.zipWithIndex.map { case ((_, e), i) =>
        e.as(s"__v$i")
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val stackArgs = scalar.zipWithIndex
        .map { case ((n, _), i) => s"'${n.replace("'", "")}', __v$i" }
        .mkString(", ")
      Some(one.select(expr(s"stack(${scalar.size}, $stackArgs) " +
        "AS (check_name, violations)")))
    }
    val rest: Seq[DataFrame] = checks.collect {
      case c: UniqueKey =>
        df.groupBy(col(c.col)).agg(count(lit(1)).as("__c"))
          .filter(col("__c") > 1)
          .agg(coalesce(sum(col("__c") - 1), lit(0L)).as("violations"))
          .select(lit(c.name).as("check_name"), col("violations"))
      case c: RefIntegrity =>
        df.filter(col(c.fkCol).isNotNull)
          .join(c.dim.select(col(c.pkCol).as("__pk")).distinct(),
            col(c.fkCol) === col("__pk"), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(c.name).as("check_name"), col("violations"))
    }
    (scalarFrame.toSeq ++ rest)
      .reduce(_ unionByName _)
      .orderBy("check_name")
  }

  val all: Seq[Query] = Seq(
    // The standard gate over the star schema: presence + domain checks
    // fuse into one lineitem scan; the fact key's expected
    // multiplicity surfaces as `unique l_orderkey` surplus (multi-line
    // orders — a nonzero lane proving the counter counts); both FK
    // edges verify clean.
    Query(
      "q_dq_checks",
      Some("""SELECT 'not_null l_orderkey' AS check_name,
                     CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0
                       END) AS BIGINT) AS violations
              FROM lineitem
              UNION ALL
              SELECT 'range l_discount [0,1]',
                     CAST(sum(CASE WHEN l_discount IS NULL
                       OR l_discount < 0.0 OR l_discount > 1.0
                       THEN 1 ELSE 0 END) AS BIGINT)
              FROM lineitem
              UNION ALL
              SELECT 'range l_extendedprice [0,50000]',
                     CAST(sum(CASE WHEN l_extendedprice IS NULL
                       OR l_extendedprice < 0.0 OR l_extendedprice > 50000.0
                       THEN 1 ELSE 0 END) AS BIGINT)
              FROM lineitem
              UNION ALL
              SELECT 'unique l_orderkey',
                     CAST(coalesce(sum(c - 1), 0) AS BIGINT)
              FROM (SELECT count(*) AS c FROM lineitem
                    GROUP BY l_orderkey HAVING count(*) > 1)
              UNION ALL
              SELECT 'ref l_orderkey -> orders.o_orderkey',
                     CAST(count(*) AS BIGINT)
              FROM lineitem l LEFT JOIN orders o
                ON l.l_orderkey = o.o_orderkey
              WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL
              UNION ALL
              SELECT 'ref o_custkey -> customer.c_custkey',
                     CAST(count(*) AS BIGINT)
              FROM orders r LEFT JOIN customer d
                ON r.o_custkey = d.c_custkey
              WHERE r.o_custkey IS NOT NULL AND d.c_custkey IS NULL
              ORDER BY check_name"""),
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val liReport = dqReport(li, Seq(
          NotNull("l_orderkey"),
          InRange("l_discount", 0.0, 1.0),
          InRange("l_extendedprice", 0.0, 50000.0),
          UniqueKey("l_orderkey"),
          RefIntegrity("l_orderkey", Tables.orders(s, d), "orders",
            "o_orderkey")))
        val ordReport = dqReport(Tables.orders(s, d), Seq(
          RefIntegrity("o_custkey", Tables.customer(s, d), "customer",
            "c_custkey")))
        liReport.unionByName(ordReport).orderBy("check_name")
      })
  )
}
