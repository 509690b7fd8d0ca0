package graft.operators

import graft.Query
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Tier B — relational core over the driver's star schema (SURVEY.md §2.3).
  *
  * Scale stance: every query here is a declarative plan Catalyst can
  * optimize — filters and projections reach the parquet scan, aggregates
  * run partial+final (map-side combine), joins pick broadcast for true
  * dimension tables (`broadcast()` hints on region/nation/part/supplier)
  * and shuffled sort-merge/hash with AQE skew handling for fact-fact
  * joins. Nothing collects to the driver.
  *
  * Determinism stance (SURVEY.md §7.6): money/quantity sums go through
  * DECIMAL(18,2) so partial-aggregation order can't perturb floating
  * results; every query ends in a total ORDER BY with a unique tiebreak.
  */
object RelationalOps {

  /** Order-independent exact sum of a double measure: cast to decimal
    * before aggregation, back to double after — associativity-safe at any
    * partition count, so results are identical on local[32] and on a
    * 1000-executor shuffle. */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  private def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double") / count(lit(1))

  /** Exact discounted-revenue sum. Casting the double *product* to decimal
    * is engine-divergent on .xx5 ties (Spark rounds via Java's
    * shortest-decimal repr, DuckDB via the raw binary value), so each
    * 2-dp factor is cast to decimal first and the multiply happens in
    * exact decimal arithmetic. */
  private def drevenue: Column = {
    val dec = DecimalType(18, 2)
    sum(col("l_extendedprice").cast(dec) *
      (lit(1).cast(dec) - col("l_discount").cast(dec))).cast("double")
  }

  /** Fixed-width histogram of a numeric column: bucket = ⌊x / width⌋
    * (a pure narrow map — floor of an IEEE division any engine
    * shares), so the whole query is one map-side-combined count per
    * bucket: result rows constant in corpus size, shuffle bytes
    * constant in the bucket count. */
  def histogram(df: DataFrame, column: String, width: Double): DataFrame = {
    require(width > 0, s"histogram width must be positive; got $width")
    df.withColumn("bucket",
        floor(col(column) / lit(width)).cast("bigint"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .select(
        col("bucket"),
        (col("bucket").cast("double") * lit(width)).as("bin_lo"),
        col("n"))
      .orderBy("bucket")
  }

  /** SCD-1 merge (upsert): apply `updates` to `base` on `key` —
    * matched rows take the update's values, unmatched updates insert,
    * untouched base rows carry through, each tagged with its `action`
    * (update / insert / keep). Both sides must share the schema. ONE
    * full-outer equi-join co-partitioned on the key; with a bucketed
    * base only the change set shuffles (StorageLayoutSpec's
    * exactly-one-exchange pin). */
  def mergeUpsert(base: DataFrame, updates: DataFrame,
      key: String): DataFrame =
    mergeRows(base, updates, key).orderBy(key)

  /** [[mergeUpsert]] without the presentation sort — the shape
    * operational loops want (CdcApply re-buckets the result anyway; a
    * per-batch global sort of the full base table would be pure
    * waste). Matched rows take the update's values INCLUDING NULLs —
    * update-row presence, not value-level coalesce, decides each
    * column, so a change that clears a field lands (MERGE semantics). */
  def mergeRows(base: DataFrame, updates: DataFrame,
      key: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"mergeUpsert expects identical schemas; base has " +
        s"${base.columns.mkString("(", ", ", ")")}, updates " +
        s"${updates.columns.mkString("(", ", ", ")")}")
    require(base.columns.contains(key), s"mergeUpsert key '$key' not in " +
      base.columns.mkString("(", ", ", ")"))
    // Presence is decided by per-side literal markers, NOT key
    // nullability: a NULL merge key never equi-matches, so both a
    // NULL-key update (a legitimate insert, payload from the update
    // side) and a NULL-key base row (a keep) fall through the join
    // unmatched — inferring presence from the key would drop the
    // former's payload and mislabel the latter.
    val u = updates.columns.foldLeft(updates)((df, c) =>
      df.withColumnRenamed(c, s"__u_$c")).withColumn("__upd", lit(1))
    val b = base.withColumn("__base", lit(1))
    val fromUpdate = col("__upd").isNotNull
    b.join(u, col(key) === col(s"__u_$key"), "full_outer")
      .select(base.columns.map(c =>
        when(fromUpdate, col(s"__u_$c")).otherwise(col(c)).as(c)) :+
        when(col("__base").isNull, lit("insert"))
          .when(col("__upd").isNull, lit("keep"))
          .otherwise(lit("update")).as("action"): _*)
  }

  /** SCD-2 dimension build: collapse a change stream into validity
    * intervals — change detection (drop rows equal to the previous
    * value) then interval assembly (valid_to = next version's
    * valid_from; open interval = current). Both passes are windows
    * PARTITIONED BY the dimension key with a total (ts, tie) order —
    * per-key state only, no global window, so the build scales with
    * the key count like any grouped aggregate. `tieCol` must make the
    * per-key order total (duplicate timestamps are real in change
    * streams); it rides along as lineage (`src_key`). */
  def scd2Build(changes: DataFrame, keyCol: String, valueCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val versions = changes
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(valueCol))
    val wv = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    versions
      .select(
        col(keyCol), col(valueCol),
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(wv).as("valid_to"),
        col(tieCol).as("src_key"))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy(col(keyCol), col("valid_from"), col("src_key"))
  }

  /** Point-in-time (temporal) lookup against an SCD-2 history: for
    * each fact row, the dimension version whose
    * `[valid_from, valid_to)` interval contains the fact's timestamp
    * — THE consumption pattern for [[scd2Build]]'s output ("which
    * priority did this customer have when this item shipped?"), where
    * a plain key join would smear every historical version across the
    * facts. Left join: facts predating the first version keep NULL
    * dimension columns. Half-open intervals make the match unique by
    * construction (a same-day change closes the old version at its
    * own start — zero-length, matches nothing).
    *
    * Scale: an equi-join on the dimension key with the interval test
    * as residual — shuffles once on the key like any fact-dim join
    * (AQE skew-splits a hot key); per-key version chains are short,
    * so the residual scans a handful of rows per fact. No windows, no
    * fact-side state. */
  def scd2Lookup(facts: DataFrame, history: DataFrame, factKeyCol: String,
      factTsCol: String, dimKeyCol: String): DataFrame = {
    val f = facts.alias("f")
    val h = history.alias("h")
    f.join(h,
      col(s"f.$factKeyCol") === col(s"h.$dimKeyCol") &&
        col(s"f.$factTsCol") >= col("h.valid_from") &&
        (col("h.valid_to").isNull ||
          col(s"f.$factTsCol") < col("h.valid_to")),
      "left")
  }

  /** Order-independent content checksum per group: each row folds to a
    * 60-bit integer (the first 15 hex digits of the md5 of its
    * '|'-joined column renderings) and the group checksum is the
    * DECIMAL(38,0)-exact SUM of those — commutative, so partitioning
    * and shuffle order cannot perturb it, and any single-row
    * difference flips it with probability 1 − 2⁻⁶⁰. The
    * anti-entropy primitive for 100 TB replication: two clusters
    * compare |groups| checksum rows instead of moving data, and a
    * mismatched group pinpoints where to re-sync. Doubles must be
    * rendered through DECIMAL casts by the caller (raw double→string
    * formatting is engine-specific); NULLs render as '' via coalesce
    * — callers needing NULL-vs-'' distinction add a sentinel. */
  def tableChecksum(df: DataFrame, cols: Seq[Column],
      groupCols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableChecksum needs at least one column")
    val rowHash = conv(
      substring(md5(concat_ws("|",
        cols.map(c => coalesce(c.cast("string"), lit(""))): _*)), 1, 15),
      16, 10).cast(DecimalType(38, 0))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(rowHash).as("checksum"))
      .orderBy(groupCols.map(col): _*)
  }

  /** Row-level reconciliation diff between two snapshots sharing a
    * schema: the companion to [[tableChecksum]] — once a checksum
    * mismatch names a group, this names the ROWS. Emits only the
    * differing rows, each tagged `added` (key only in `next`),
    * `removed` (key only in `prev`), or `changed` (key in both, some
    * non-key column differs) with the comma-joined list of changed
    * columns in declared column order; identical rows — the ~100%
    * bulk at 100 TB — produce NOTHING, so the output is
    * change-bounded, not table-bounded.
    *
    * Presence comes from per-side literal markers (the [[mergeRows]]
    * stance — key nullability can't distinguish an unmatched NULL-key
    * row from absence) and per-column comparison is null-safe
    * (`<=>`): NULL→value and value→NULL both count as changes,
    * NULL→NULL does not.
    *
    * Scale: ONE full-outer equi-join hash-partitioned on the key —
    * the same exchange discipline as [[mergeRows]]; with both
    * snapshots bucketed on the key it is exchange-free. Column
    * compares are a codegen'd projection; no window, no sort beyond
    * the caller's presentation ORDER BY. */
  def tableDiff(prev: DataFrame, next: DataFrame,
      key: String): DataFrame = {
    require(prev.columns.sameElements(next.columns),
      s"tableDiff expects identical schemas; prev has " +
        s"${prev.columns.mkString("(", ", ", ")")}, next " +
        s"${next.columns.mkString("(", ", ", ")")}")
    require(prev.columns.contains(key), s"tableDiff key '$key' not in " +
      prev.columns.mkString("(", ", ", ")"))
    val valCols = prev.columns.filterNot(_ == key).toSeq
    val n = next.columns.foldLeft(next)((df, c) =>
      df.withColumnRenamed(c, s"__n_$c")).withColumn("__nxt", lit(1))
    val p = prev.withColumn("__prv", lit(1))
    val inPrev = col("__prv").isNotNull
    val inNext = col("__nxt").isNotNull
    val changedCols = concat_ws(",", valCols.map(c =>
      when(!(col(c) <=> col(s"__n_$c")), lit(c))): _*)
    p.join(n, col(key) === col(s"__n_$key"), "full_outer")
      .withColumn("status",
        when(!inPrev, lit("added"))
          .when(!inNext, lit("removed"))
          .when(valCols.map(c => !(col(c) <=> col(s"__n_$c")))
            .reduce(_ || _), lit("changed")))
      .filter(col("status").isNotNull)
      .select(
        coalesce(col(key), col(s"__n_$key")).as(key) +:
          col("status") +:
          when(col("status") === "changed", changedCols)
            .as("changed_cols") +:
          valCols.map(c => col(c).as(s"prev_$c")) ++:
          valCols.map(c => col(s"__n_$c").as(s"next_$c")): _*)
  }

  /** Per-column profile of `cols` (numeric): value/null/distinct
    * counts, min/max, and DECIMAL-exact mean/stddev — one row per
    * column, TWO passes of the table (a single narrow stats `agg`
    * with a `stack` unpivot of its 1-row scalars, plus a skinny
    * exact-distinct pass — see the Expand note below; never a pass
    * per column). Deterministic at any partitioning: per-row squares
    * are IEEE-exact, sums run in DECIMAL(38,6) (associative-exact;
    * see the cast-width note below), and the mean/variance fold from
    * those sums in DOUBLE identically on any engine. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // names are interpolated into the stack() SQL string and generated
    // aliases — restrict to plain identifiers (the funnel-stage rule)
    // so exotic-but-legal Spark names fail here with the rule named,
    // not downstream with an opaque ParseException
    require(cols.forall(_.matches("[A-Za-z0-9_]+")),
      s"profile column names must be simple identifiers; got $cols")
    // Distinct counts run as a SEPARATE skinny pass, not as
    // countDistinct inside the stats aggregate: Spark rewrites N
    // distinct aggregates into an Expand that replicates every row
    // N+1 times WITH the full non-distinct aggregation buffer on each
    // copy (measured 8.7 s at sf0.1 vs 1.9 s for this split). Here the
    // unpivoted (cid, value-string) stream is 2 narrow columns, the
    // partial aggregate dedups map-side BEFORE the shuffle, and the
    // per-column count is a tiny second fold. The string key keeps the
    // unpivot array one type while staying injective on numerics.
    val dcounts = df
      .select(posexplode(array(cols.map(c => col(c).cast("string")): _*))
        .as(Seq("__cid", "__v")))
      .filter(col("__v").isNotNull)
      .distinct()
      .groupBy("__cid")
      .agg(count(lit(1)).as("__distinct"))
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        // DECIMAL(38,6), not (38,18): Spark's double→decimal cast reads
        // the SHORTEST decimal repr of the double while DuckDB reads the
        // exact binary expansion — at 18 places the two decimals differ
        // in the binary-noise digits (~1e-17 relative) and the sums
        // drift apart at ~1e-10, enough to flip a 6-dp rounding. At 6
        // places both casts see the same value (the noise lives far
        // below 1e-6), so the sums are identical decimals on any engine
        // AND order-independent.
        sum(col(c).cast(DecimalType(38, 6))).as(s"${c}__s1"),
        sum((col(c) * col(c)).cast(DecimalType(38, 6))).as(s"${c}__s2"))
    }
    val named = df.agg(aggs.head, aggs.tail: _*).select(cols.flatMap { c =>
      val n = col(s"${c}__n")
      val s1 = col(s"${c}__s1").cast("double")
      val s2 = col(s"${c}__s2").cast("double")
      // 6-dp rounding via scale-then-round-to-integer: round(x·1e6)/1e6.
      // Plain round(x, 6) rounds the double's INFINITE decimal
      // expansion (BigDecimal HALF_UP) while DuckDB rounds the scaled
      // double — at an exact .5 in the scaled double (l_tax's mean hit
      // one) the two disagree by 1e-6. Scaling first snaps both engines
      // to the same representable double, and integer rounding of a
      // double is half-away-from-zero in both.
      def r6(x: Column) = round(x * lit(1000000.0)) / lit(1000000.0)
      Seq(
        col(s"${c}__n"), col(s"${c}__nulls"),
        col(s"${c}__min"), col(s"${c}__max"),
        r6(s1 / n).as(s"${c}__mean"),
        // sample variance from exact sums; clamped at 0 against the
        // tiny negative a constant column folds to
        r6(sqrt(greatest((s2 - s1 * s1 / n) / (n - 1), lit(0.0))))
          .as(s"${c}__sd"))
    }: _*)
    val stacked = named.select(expr(
      s"stack(${cols.size}, " + cols.zipWithIndex.map { case (c, i) =>
        s"'$c', $i, ${c}__n, ${c}__nulls, ${c}__min, " +
          s"${c}__max, ${c}__mean, ${c}__sd" }.mkString(", ") +
        ") as (col_name, __cid, n_values, n_nulls, min_v, max_v, " +
        "mean_v, stddev_v)"))
    // |cols|-row ⋈ |cols|-row: broadcast, free. A column of all nulls
    // has no dcounts row — coalesce to 0 (count distinct of nothing).
    stacked.join(broadcast(dcounts), Seq("__cid"), "left_outer")
      .select(col("col_name"), col("n_values"), col("n_nulls"),
        coalesce(col("__distinct"), lit(0L)).as("n_distinct"),
        col("min_v"), col("max_v"), col("mean_v"), col("stddev_v"))
      .orderBy("col_name")
  }

  /** The DuckDB spelling of [[profile]] over `lineitem` — same exact
    * DECIMAL sums, same DOUBLE fold, same clamp. */
  private def profileOracleSql(cols: Seq[String]): String = {
    val per = cols.map { c =>
      s"""SELECT '$c' AS col_name,
             CAST(count($c) AS BIGINT) AS n_values,
             CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls,
             CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
             CAST(min($c) AS DOUBLE) AS min_v,
             CAST(max($c) AS DOUBLE) AS max_v,
             round(CAST(sum(CAST($c AS DECIMAL(38,6))) AS DOUBLE)
               / count($c) * 1000000.0) / 1000000.0 AS mean_v,
             round(sqrt(greatest(
               (CAST(sum(CAST($c * $c AS DECIMAL(38,6))) AS DOUBLE)
                - CAST(sum(CAST($c AS DECIMAL(38,6))) AS DOUBLE)
                  * CAST(sum(CAST($c AS DECIMAL(38,6))) AS DOUBLE)
                  / count($c)) / (count($c) - 1), 0.0))
               * 1000000.0) / 1000000.0 AS stddev_v
         FROM lineitem"""
    }
    per.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      "\n) ORDER BY col_name")
  }

  val all: Seq[Query] = Seq(
    // -- scans / filter / project ------------------------------------
    Query(
      "q_filter_project",
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
                     l_extendedprice * (1 - l_discount) AS revenue
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate <  TIMESTAMP '1997-01-01'
              ORDER BY l_orderkey, l_linenumber"""),
      (s, d) =>
        Tables.lineitem(s, d)
          .filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select(
            col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            (col("l_extendedprice") * (lit(1) - col("l_discount")))
              .as("revenue"))
          .orderBy("l_orderkey", "l_linenumber")),

    // -- aggregation (TPC-H Q1 shape) --------------------------------
    Query(
      "q_pricing_summary",
      Some("""SELECT l_returnflag, l_linestatus,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
                     CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
                     count(*) AS count_order
              FROM lineitem
              GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus"""),
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            drevenue.as("sum_disc_price"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")),

    // -- joins --------------------------------------------------------
    Query(
      "q_join_inner",
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      (s, d) =>
        Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(
            count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("sum_total"))
          .orderBy("c_mktsegment")),
    Query(
      "q_join_broadcast",
      Some("""SELECT p_brand, count(*) AS n,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
              FROM lineitem JOIN part ON l_partkey = p_partkey
              GROUP BY p_brand ORDER BY p_brand"""),
      (s, d) =>
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)),
            col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("p_brand")),
    Query(
      "q_join_multi",
      Some("""SELECT n_name,
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
              FROM lineitem
              JOIN orders   ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
              WHERE r_name = 'ASIA'
              GROUP BY n_name ORDER BY n_name"""),
      (s, d) =>
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA")
          .groupBy("n_name")
          .agg(drevenue.as("revenue"))
          .orderBy("n_name")),
    Query(
      "q_join_left",
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
              FROM customer LEFT JOIN orders ON o_custkey = c_custkey
              GROUP BY c_custkey ORDER BY c_custkey"""),
      (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"),
            "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey")),
    Query(
      "q_join_semi",
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              ORDER BY c_custkey"""),
      (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
            "left_semi")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")),
    Query(
      "q_join_anti",
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              ORDER BY c_custkey"""),
      (s, d) =>
        Tables.customer(s, d)
          .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"),
            "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")),
    // Full outer join with non-matching rows planted on BOTH sides
    // (even-key customers × every-50th order): customers without a
    // qualifying order keep a null right side, orders of odd-key
    // customers keep a null left side. Presentation order rides
    // coalesced keys so the two engines' differing NULL sort defaults
    // can't skew the row order the compare walks.
    Query(
      "q_join_full",
      Some("""SELECT c_custkey, o_orderkey
              FROM (SELECT c_custkey FROM customer
                    WHERE c_custkey % 2 = 0) c
              FULL OUTER JOIN (SELECT o_orderkey, o_custkey FROM orders
                               WHERE o_orderkey % 50 = 0) o
                ON o_custkey = c_custkey
              ORDER BY coalesce(c_custkey, -1), coalesce(o_orderkey, -1)"""),
      (s, d) =>
        Tables.customer(s, d)
          .filter(col("c_custkey") % 2 === 0).select("c_custkey")
          .join(Tables.orders(s, d)
              .filter(col("o_orderkey") % 50 === 0)
              .select("o_orderkey", "o_custkey"),
            col("o_custkey") === col("c_custkey"), "full_outer")
          .select("c_custkey", "o_orderkey")
          .orderBy(coalesce(col("c_custkey"), lit(-1)),
            coalesce(col("o_orderkey"), lit(-1)))),
    Query(
      "q_join_range",
      Some("""SELECT o_orderkey, count(*) AS n
              FROM orders JOIN lineitem
                ON l_orderkey = o_orderkey
               AND l_shipdate > o_orderdate + INTERVAL 30 DAY
              GROUP BY o_orderkey ORDER BY o_orderkey"""),
      (s, d) =>
        Tables.orders(s, d)
          .join(
            Tables.lineitem(s, d),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
          .groupBy("o_orderkey")
          .agg(count(lit(1)).as("n"))
          .orderBy("o_orderkey")),
    // As-of join composed from equi-join + range residual + row_number —
    // Spark has no native as-of operator (SURVEY.md §2.3). At 100 TB the
    // same plan holds: the join shuffles on user_id (bounded per-user
    // history), the window dedup is partition-local after the shuffle.
    Query(
      "q_join_asof",
      Some("""SELECT p.event_id AS purchase_id, e.event_id AS error_id,
                     e.ts AS error_ts
              FROM events p
              JOIN events e ON e.user_id = p.user_id AND e.ts <= p.ts
               AND e.event_type = 'error'
              WHERE p.event_type = 'purchase'
              QUALIFY row_number() OVER (PARTITION BY p.event_id
                        ORDER BY e.ts DESC, e.event_id DESC) = 1
              ORDER BY purchase_id"""),
      (s, d) => {
        val ev = Tables.events(s, d)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("p_ts"))
        val e = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("error_id"),
            col("user_id").as("e_user"), col("ts").as("error_ts"))
        JoinOps.asOfJoin(p, e, "user_id", "e_user", "p_ts", "error_ts",
            "purchase_id", "error_id")
          .select("purchase_id", "error_id", "error_ts")
          .orderBy("purchase_id")
      }),

    // Pivot: per-user event counts spread across one column per event
    // type. The type list is pinned (Spark pivots without a scan-first
    // value discovery when values are given; at 100 TB discovery is a
    // full extra pass); plan = one partial+final aggregate, the pivot
    // is just a projection shape. Oracle: conditional aggregation.
    Query(
      "q_pivot",
      Some("""SELECT user_id,
                     count(*) FILTER (event_type = 'click')    AS click,
                     count(*) FILTER (event_type = 'error')    AS error,
                     count(*) FILTER (event_type = 'purchase') AS purchase,
                     count(*) FILTER (event_type = 'signup')   AS signup,
                     count(*) FILTER (event_type = 'view')     AS view
              FROM events GROUP BY user_id ORDER BY user_id"""),
      (s, d) =>
        Tables.events(s, d)
          .groupBy("user_id")
          .pivot("event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("user_id")),

    // Unpivot (melt): wide per-part measures back to (part, metric,
    // value) long form — narrow row expansion, no shuffle before the
    // presentation sort. Oracle: UNION ALL of the measures.
    Query(
      "q_unpivot",
      Some("""SELECT p_partkey, 'retailprice' AS metric,
                     CAST(p_retailprice AS DOUBLE) AS value FROM part
              UNION ALL
              SELECT p_partkey, 'size' AS metric,
                     CAST(p_size AS DOUBLE) AS value FROM part
              ORDER BY p_partkey, metric"""),
      (s, d) =>
        Tables.part(s, d)
          .select(col("p_partkey"),
            col("p_retailprice").cast("double").as("retailprice"),
            col("p_size").cast("double").as("size"))
          .unpivot(Array(col("p_partkey")),
            Array(col("retailprice"), col("size")), "metric", "value")
          .orderBy("p_partkey", "metric")),

    // -- distinct / grouping lattice ---------------------------------
    Query(
      "q_distinct",
      Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"),
      (s, d) =>
        Tables.customer(s, d).select("c_mktsegment").distinct()
          .orderBy("c_mktsegment")),
    Query(
      "q_count_distinct",
      Some("""SELECT n_name, count(DISTINCT l_suppkey) AS n_supp
              FROM lineitem
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              GROUP BY n_name ORDER BY n_name"""),
      (s, d) =>
        Tables.lineitem(s, d)
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(countDistinct(col("l_suppkey")).as("n_supp"))
          .orderBy("n_name")),
    // HLL sketch — implementations differ across engines, so no SQL
    // oracle; bounds vs the exact count are asserted in ScalaTest.
    Query(
      "q_approx_distinct",
      None,
      (s, d) =>
        Tables.orders(s, d)
          .groupBy("o_orderpriority")
          .agg(approx_count_distinct(col("o_orderkey")).as("approx_orders"))
          .orderBy("o_orderpriority")),
    // Aggregate-shaped argmax/argmin (max_by/min_by): "the best order
    // per customer" WITHOUT a window — one map-side-combinable hash
    // aggregate (each partial keeps a single champion per key) instead
    // of the window path's per-key sort, the cheaper plan whenever
    // only the top-1 row is wanted. Both engines break argmax ties
    // arbitrarily, so the ordering key is made UNIQUE by construction
    // AND price-consistent: price scaled to cents*1e8 plus the
    // orderkey. Invariant: one cent of price = 1e8 key units, so as
    // long as o_orderkey < 1e8 (TPC-H reaches 6e9 rows only past
    // sf~1000; 1e8 orders ≈ sf 66) the orderkey term can never
    // outweigh a real price difference, and distinct orderkeys make
    // the key unique. Max key ≈ 5e5 dollars × 1e10 = 5e15 — well
    // inside BIGINT.
    Query(
      "q_argmax",
      Some("""SELECT o_custkey,
                     arg_max(o_orderkey,
                       CAST(CAST(o_totalprice AS DECIMAL(18,2))
                         * 10000000000 AS BIGINT) + o_orderkey)
                       AS best_order,
                     CAST(max(CAST(o_totalprice AS DECIMAL(18,2)))
                       AS DOUBLE) AS best_price,
                     arg_min(o_orderkey,
                       CAST(CAST(o_totalprice AS DECIMAL(18,2))
                         * 10000000000 AS BIGINT) + o_orderkey)
                       AS cheapest_order
              FROM orders GROUP BY o_custkey ORDER BY o_custkey"""),
      (s, d) => {
        val ukey = (col("o_totalprice").cast(DecimalType(18, 2)) *
          lit(10000000000L)).cast("long") + col("o_orderkey")
        Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(
            max_by(col("o_orderkey"), ukey).as("best_order"),
            max(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast("double").as("best_price"),
            min_by(col("o_orderkey"), ukey).as("cheapest_order"))
          .orderBy("o_custkey")
      }),
    // MERGEABLE HLL sketches (Datasketches builtins) — the
    // pre-aggregation pattern behind every 100 TB distinct-count
    // dashboard: build one small sketch per (group, day) partition
    // once, STORE the sketches, and answer any coarser rollup by
    // unioning them — no re-scan of the raw corpus, union cost
    // proportional to sketch count, error unchanged by merging. Here:
    // per-(type, day) user sketches union up to per-type monthly
    // distinct users. Approximate by design → ScalaTest bound vs the
    // exact two-level countDistinct, no oracle.
    Query(
      "q_hll_merge",
      None,
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        daily.groupBy("event_type")
          .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
            .as("approx_users"))
          .orderBy("event_type")
      }),
    // Theta-sketch set algebra — the audience-overlap question HLL
    // cannot answer: distinct users in A∩B / A\B / A∪B per event-type
    // pair, computed ENTIRELY on stored sketches. Build one theta
    // sketch per (type, day) — the shard a 100 TB store would persist —
    // union shards per type, then run set ops on the 5 tiny per-type
    // sketches (a broadcast pair join of ≤|types|² rows, no re-scan).
    // Theta is order-invariant (k smallest hashes of the SET) so the
    // output is bit-stable; exact below nominal capacity. Approximate
    // by design → ThetaSketchSpec bounds both regimes, no oracle.
    Query(
      "q_theta_overlap",
      None,
      (s, d) => {
        graft.functions.ThetaSketch.register(s)
        import graft.functions.ThetaSketch._
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(thetaSketchAgg(col("user_id"), 12).as("sk"))
        val perType = daily.groupBy("event_type")
          .agg(thetaUnionAgg(col("sk"), 12).as("sk"))
        val a = perType.select(col("event_type").as("type_a"),
          col("sk").as("sk_a"))
        val b = perType.select(col("event_type").as("type_b"),
          col("sk").as("sk_b"))
        a.join(broadcast(b), col("type_a") < col("type_b"))
          .select(col("type_a"), col("type_b"),
            round(thetaEstimate(col("sk_a"))).cast("long").as("users_a"),
            round(thetaEstimate(col("sk_b"))).cast("long").as("users_b"),
            round(thetaEstimate(thetaIntersect(col("sk_a"), col("sk_b"))))
              .cast("long").as("overlap"),
            round(thetaEstimate(thetaANotB(col("sk_a"), col("sk_b"))))
              .cast("long").as("only_a"),
            round(thetaEstimate(thetaUnionPair(col("sk_a"), col("sk_b"))))
              .cast("long").as("together"))
          .orderBy("type_a", "type_b")
      }),
    // MERGEABLE KLL quantile sketches — what q_approx_quantile's
    // percentile_approx cannot do: consume STORED sketches. Build one
    // small sketch per (returnflag, ship-month) shard — the unit a
    // 100 TB store would persist — then answer the per-flag rollup by
    // merging the ~84 shard sketches, never re-scanning the values.
    // Same stored-rollup shape as q_hll_merge/q_theta_overlap;
    // completes the sketch family on the quantile axis. KLL compaction
    // is randomized, so estimates are rank-error-bounded, not
    // hash-stable → no oracle; KllSketchSpec pins exact-n merge
    // integrity, the rank-error guarantee vs exact percentiles, and
    // merge-vs-one-shot agreement.
    Query(
      "q_kll_merge",
      None,
      (s, d) => {
        graft.functions.Kll.register(s)
        import graft.functions.Kll._
        val shards = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"),
            date_trunc("month", col("l_shipdate")).as("ship_month"))
          .agg(kllSketchAgg(col("l_extendedprice"), 400).as("sk"))
        shards.groupBy("l_returnflag")
          .agg(kllUnionAgg(col("sk"), 400).as("sk"))
          .select(col("l_returnflag"),
            kllN(col("sk")).as("n_exact"),
            round(kllQuantile(col("sk"), lit(0.5)), 2).as("p50"),
            round(kllQuantile(col("sk"), lit(0.95)), 2).as("p95"),
            round(kllQuantile(col("sk"), lit(0.99)), 2).as("p99"),
            round(kllError(col("sk")), 6).as("rank_err"))
          .orderBy("l_returnflag")
      }),
    // Mergeable uniform samples — the exploration primitive of the
    // stored-sketch tier: per-(type, day) shard reservoirs of user ids
    // roll up to an unbiased per-type sample (the union reweighs by
    // each shard's true n). Sampled ITEMS are random → the gate output
    // carries only the structural invariants (exact n, sample size);
    // ReservoirSketchSpec pins membership/uniformity. No oracle.
    Query(
      "q_reservoir_sample",
      None,
      (s, d) => {
        graft.functions.ReservoirSketch.register(s)
        import graft.functions.ReservoirSketch._
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(reservoirAgg(col("user_id"), 20).as("sk"))
        daily.groupBy("event_type")
          .agg(reservoirUnionAgg(col("sk"), 20).as("sk"))
          .select(col("event_type"),
            reservoirN(col("sk")).as("n_exact"),
            size(reservoirItems(col("sk"))).as("n_samples"))
          .orderBy("event_type")
      }),
    // Weighted samples (VarOpt) — the weighted half of the sampling
    // tier: per-(type, day) shard sketches of user ids WEIGHTED by
    // event value roll up per type; any subset's weight is estimable
    // from the ≤k retained rows, and the total adjusted weight is the
    // EXACT input weight sum under any merge shape. Items are random →
    // the gate output carries the structural invariants (exact n,
    // sample size, total weight in DECIMAL-rounded form);
    // VarOptSketchSpec pins membership/unbiasedness. No oracle.
    Query(
      "q_varopt_sample",
      None,
      (s, d) => {
        graft.functions.VarOptSketch.register(s)
        import graft.functions.VarOptSketch._
        val daily = Tables.events(s, d)
          .filter(col("value") > 0)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(varoptAgg(col("user_id"), col("value"), 20).as("sk"))
        daily.groupBy("event_type")
          .agg(varoptUnionAgg(col("sk"), 20).as("sk"))
          .select(col("event_type"),
            varoptN(col("sk")).as("n_exact"),
            size(varoptSamples(col("sk"))).as("n_samples"),
            round(aggregate(varoptSamples(col("sk")), lit(0.0d),
              (acc, x) => acc + x.getField("weight")), 2)
              .as("w_total"))
          .orderBy("event_type")
      }),
    // Quantile sketch (KLL/GK-family builtin): per-group p50/p95/p99 of
    // extendedprice in ONE pass — the sketch merges associatively, so
    // the partial/final aggregation shape shuffles one small sketch per
    // group, never the values. Approximate by design → gated by a
    // ScalaTest rank-error bound vs the exact percentile, no oracle.
    Query(
      "q_approx_quantile",
      None,
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
              .as("p50"),
            percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000))
              .as("p95"),
            percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000))
              .as("p99"))
          .orderBy("l_returnflag")),
    // EXACT grouped percentiles — the oracle-gated twin of
    // q_approx_quantile (linear interpolation at p·(n−1), the
    // quantile_cont definition both engines share). Exactness costs a
    // per-group sort of the values; at 100 TB a user reaches for the
    // sketch twin above — shipping both, cross-gated, is the point.
    Query(
      "q_percentile",
      Some("""SELECT l_returnflag,
                     round(quantile_cont(l_extendedprice, 0.5)
                       * 1000000.0) / 1000000.0 AS p50,
                     round(quantile_cont(l_extendedprice, 0.9)
                       * 1000000.0) / 1000000.0 AS p90
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      (s, d) => {
        def r6(x: Column) = round(x * lit(1000000.0)) / lit(1000000.0)
        Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            r6(percentile(col("l_extendedprice"), lit(0.5))).as("p50"),
            r6(percentile(col("l_extendedprice"), lit(0.9))).as("p90"))
          .orderBy("l_returnflag")
      }),
    // Column profiling — the pipeline-health primitive (nulls, distinct
    // counts, range, DECIMAL-exact moments) every ingest step runs
    // before heavier curation. One narrow stats pass plus one skinny
    // dedup-before-shuffle distinct pass (see the Expand note at the
    // impl) — never one pass per column. Moments are
    // order-independent: per-row squares are deterministic IEEE
    // doubles, the sums run in DECIMAL(38,6) — NOT (38,18); see the
    // cast-width note at the impl for why 18 places diverge
    // cross-engine — and the variance folds in DOUBLE from identical
    // decimal sums on both engines.
    Query(
      "q_profile",
      Some(profileOracleSql(Seq("l_quantity", "l_extendedprice",
        "l_discount", "l_tax"))),
      (s, d) => profile(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),
    // Grouped covariance/correlation from the same DECIMAL-exact sums
    // as q_profile: the builtin corr/covar_samp aggregates fold their
    // moments in DOUBLE during partial aggregation, so their last bits
    // depend on partition order — instead the five raw sums run in
    // DECIMAL(38,6) (order-independent, engine-identical; the per-row
    // products are IEEE-exact doubles) and both engines fold the same
    // textbook formulas from the same decimal values. One scan, one
    // map-side-combined aggregate — unchanged at any corpus size.
    Query(
      "q_corr",
      Some("""SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                     round((sxy - sx*sy/n)/(n-1) * 1000000.0)/1000000.0
                       AS cov_qp,
                     round((n*sxy - sx*sy)
                           / sqrt((n*sxx - sx*sx)*(n*syy - sy*sy))
                           * 1000000.0)/1000000.0 AS corr_qp
              FROM (
                SELECT l_returnflag, CAST(count(*) AS DOUBLE) n,
                  CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) sx,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) sy,
                  CAST(sum(CAST(l_quantity*l_extendedprice AS DECIMAL(38,6)))
                    AS DOUBLE) sxy,
                  CAST(sum(CAST(l_quantity*l_quantity AS DECIMAL(38,6)))
                    AS DOUBLE) sxx,
                  CAST(sum(CAST(l_extendedprice*l_extendedprice
                    AS DECIMAL(38,6))) AS DOUBLE) syy
                FROM lineitem GROUP BY 1)
              ORDER BY l_returnflag"""),
      (s, d) => {
        val dec = DecimalType(38, 6)
        val g = Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).cast("double").as("n"),
            sum(col("l_quantity").cast(dec)).cast("double").as("sx"),
            sum(col("l_extendedprice").cast(dec)).cast("double").as("sy"),
            sum((col("l_quantity") * col("l_extendedprice")).cast(dec))
              .cast("double").as("sxy"),
            sum((col("l_quantity") * col("l_quantity")).cast(dec))
              .cast("double").as("sxx"),
            sum((col("l_extendedprice") * col("l_extendedprice")).cast(dec))
              .cast("double").as("syy"))
        def r6(x: Column) = round(x * lit(1000000.0)) / lit(1000000.0)
        val n = col("n"); val sx = col("sx"); val sy = col("sy")
        val sxy = col("sxy"); val sxx = col("sxx"); val syy = col("syy")
        g.select(
            col("l_returnflag"),
            n.cast("bigint").as("n"),
            r6((sxy - sx * sy / n) / (n - lit(1))).as("cov_qp"),
            r6((n * sxy - sx * sy) /
              sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))).as("corr_qp"))
          .orderBy("l_returnflag")
      }),
    // Fixed-width histogram — the distribution primitive under every
    // data-quality dashboard. The bucket id is a pure narrow map
    // (floor of an IEEE division both engines share), so the whole
    // query is one map-side-combined count per bucket: ~21 result rows
    // at ANY corpus size, shuffle bytes constant in the bucket count.
    Query(
      "q_histogram",
      Some("""SELECT CAST(floor(l_extendedprice / CAST(5000.0 AS DOUBLE))
                       AS BIGINT) AS bucket,
                     CAST(CAST(floor(l_extendedprice / CAST(5000.0 AS DOUBLE))
                       AS BIGINT) AS DOUBLE) * CAST(5000.0 AS DOUBLE)
                       AS bin_lo,
                     count(*) AS n,
                     CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_qty
              FROM lineitem GROUP BY 1, 2 ORDER BY bucket"""),
      (s, d) =>
        Tables.lineitem(s, d)
          .withColumn("bucket",
            floor(col("l_extendedprice") / lit(5000.0)).cast("bigint"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .select(
            col("bucket"),
            (col("bucket").cast("double") * lit(5000.0)).as("bin_lo"),
            col("n"), col("sum_qty"))
          .orderBy("bucket")),
    // SCD-1 merge (upsert): apply a change set to a base table —
    // updated rows take the new values, unmatched changes insert,
    // untouched base rows carry through, each tagged with its action.
    // The merge is ONE full-outer sort-merge join co-partitioned on the
    // key (updates are usually ≪ base, so at 100 TB the base side's
    // shuffle dominates; with a bucketed base table the exchange
    // disappears entirely — see StorageLayoutSpec's bucketed-join pin). The
    // 10% price bump runs in exact DECIMAL arithmetic ((18,2)×(3,1) —
    // a double multiply by 1.1 rounds differently per engine).
    Query(
      "q_merge_upsert",
      Some("""WITH u AS (
                SELECT o_orderkey, o_custkey,
                       CAST(CAST(o_totalprice AS DECIMAL(18,2))
                         * CAST('1.1' AS DECIMAL(3,1)) AS DOUBLE)
                         AS o_totalprice
                FROM orders WHERE o_orderkey % 7 = 0
                UNION ALL
                SELECT o_orderkey + 10000000, o_custkey, o_totalprice
                FROM orders WHERE o_orderkey % 97 = 0)
              SELECT CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderkey
                          ELSE b.o_orderkey END AS o_orderkey,
                     CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_custkey
                          ELSE b.o_custkey END AS o_custkey,
                     CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice
                          ELSE b.o_totalprice END AS o_totalprice,
                     CASE WHEN b.o_orderkey IS NULL THEN 'insert'
                          WHEN u.o_orderkey IS NULL THEN 'keep'
                          ELSE 'update' END AS action
              FROM orders b FULL OUTER JOIN u
                ON b.o_orderkey = u.o_orderkey
              ORDER BY o_orderkey"""),
      (s, d) => {
        val base = Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val updates = base
          .filter(col("o_orderkey") % 7 === 0)
          .select(
            col("o_orderkey"), col("o_custkey"),
            (col("o_totalprice").cast(DecimalType(18, 2)) *
              expr("CAST('1.1' AS DECIMAL(3,1))")).cast("double")
              .as("o_totalprice"))
          .unionAll(base
            .filter(col("o_orderkey") % 97 === 0)
            .select(
              (col("o_orderkey") + 10000000L).as("o_orderkey"),
              col("o_custkey"), col("o_totalprice")))
        mergeUpsert(base, updates, "o_orderkey")
      }),
    // Snapshot reconciliation: diff two derived order snapshots (prev
    // drops %1000=13 keys, next drops %1000=7, bumps %100=5 prices
    // DECIMAL-exactly and flips %100=6 statuses) — the row-level
    // answer to a q_table_checksum mismatch. Output is ONLY the ~330
    // differing rows of 15k; the price perturbation runs in DECIMAL
    // so both engines' next-side doubles are bit-identical and the
    // null-safe compares agree exactly.
    Query(
      "q_table_diff",
      Some("""WITH prev AS (
                SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
                FROM orders WHERE o_orderkey % 1000 <> 13),
              next AS (
                SELECT o_orderkey, o_custkey,
                       CASE WHEN o_orderkey % 100 = 6 THEN 'X'
                            ELSE o_orderstatus END AS o_orderstatus,
                       CASE WHEN o_orderkey % 100 = 5
                         THEN CAST(CAST(o_totalprice AS DECIMAL(18,2))
                           * CAST('1.1' AS DECIMAL(3,1)) AS DOUBLE)
                         ELSE o_totalprice END AS o_totalprice
                FROM orders WHERE o_orderkey % 1000 <> 7)
              SELECT coalesce(p.o_orderkey, n.o_orderkey) AS o_orderkey,
                     CASE WHEN p.o_orderkey IS NULL THEN 'added'
                          WHEN n.o_orderkey IS NULL THEN 'removed'
                          ELSE 'changed' END AS status,
                     CASE WHEN p.o_orderkey IS NOT NULL
                           AND n.o_orderkey IS NOT NULL THEN
                       concat_ws(',',
                         CASE WHEN NOT (p.o_custkey IS NOT DISTINCT
                           FROM n.o_custkey) THEN 'o_custkey' END,
                         CASE WHEN NOT (p.o_orderstatus IS NOT DISTINCT
                           FROM n.o_orderstatus)
                           THEN 'o_orderstatus' END,
                         CASE WHEN NOT (p.o_totalprice IS NOT DISTINCT
                           FROM n.o_totalprice)
                           THEN 'o_totalprice' END)
                     END AS changed_cols,
                     p.o_custkey AS prev_o_custkey,
                     p.o_orderstatus AS prev_o_orderstatus,
                     p.o_totalprice AS prev_o_totalprice,
                     n.o_custkey AS next_o_custkey,
                     n.o_orderstatus AS next_o_orderstatus,
                     n.o_totalprice AS next_o_totalprice
              FROM prev p FULL OUTER JOIN next n
                ON p.o_orderkey = n.o_orderkey
              WHERE p.o_orderkey IS NULL OR n.o_orderkey IS NULL
                 OR NOT (p.o_custkey IS NOT DISTINCT FROM n.o_custkey)
                 OR NOT (p.o_orderstatus IS NOT DISTINCT
                   FROM n.o_orderstatus)
                 OR NOT (p.o_totalprice IS NOT DISTINCT
                   FROM n.o_totalprice)
              ORDER BY o_orderkey"""),
      (s, d) => {
        val base = Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_orderstatus",
            "o_totalprice")
        val prev = base.filter(col("o_orderkey") % 1000 =!= 13)
        val next = base.filter(col("o_orderkey") % 1000 =!= 7)
          .select(col("o_orderkey"), col("o_custkey"),
            when(col("o_orderkey") % 100 === 6, lit("X"))
              .otherwise(col("o_orderstatus")).as("o_orderstatus"),
            when(col("o_orderkey") % 100 === 5,
              (col("o_totalprice").cast(DecimalType(18, 2)) *
                expr("CAST('1.1' AS DECIMAL(3,1))")).cast("double"))
              .otherwise(col("o_totalprice")).as("o_totalprice"))
        tableDiff(prev, next, "o_orderkey").orderBy("o_orderkey")
      }),
    // SCD-2 history build over the customer-priority change stream:
    // each customer's order history collapses to the dated intervals
    // during which their priority held (the type-2 dimension every
    // warehouse maintains). Change detection + interval assembly are
    // per-key windows with a total (date, orderkey) order — duplicate
    // dates are real and the orderkey tiebreak keeps both engines'
    // version sequences identical.
    Query(
      "q_scd2",
      Some("""WITH c AS (
                SELECT o_custkey, o_orderkey, o_orderdate,
                       o_orderpriority,
                       lag(o_orderpriority) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS prev
                FROM orders),
              v AS (
                SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
                FROM c WHERE prev IS NULL OR prev <> o_orderpriority)
              SELECT o_custkey AS custkey, o_orderpriority AS priority,
                     o_orderdate AS valid_from,
                     lead(o_orderdate) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS valid_to,
                     o_orderkey AS src_key,
                     CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) IS NULL
                       AS BOOLEAN) AS is_current
              FROM v
              ORDER BY custkey, valid_from, src_key"""),
      (s, d) =>
        scd2Build(
          Tables.orders(s, d).select(
            col("o_custkey").as("custkey"),
            col("o_orderpriority").as("priority"),
            col("o_orderdate"), col("o_orderkey")),
          "custkey", "priority", "o_orderdate", "o_orderkey")),
    // Point-in-time lookup against that history: every lineitem
    // shipped joins the priority version valid AT ITS SHIP DATE (not
    // today's) — facts shipped before the customer's first version
    // keep NULL → 'NONE'. The compact per-priority rollup keeps the
    // gate output small while any interval-matching error (overlap,
    // gap, off-by-one at a boundary) shifts rows between buckets and
    // breaks the hash.
    Query(
      "q_scd2_lookup",
      Some("""WITH c AS (
                SELECT o_custkey, o_orderkey, o_orderdate,
                       o_orderpriority,
                       lag(o_orderpriority) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS prev
                FROM orders),
              v AS (
                SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
                FROM c WHERE prev IS NULL OR prev <> o_orderpriority),
              h AS (
                SELECT o_custkey AS custkey,
                       o_orderpriority AS priority,
                       o_orderdate AS valid_from,
                       lead(o_orderdate) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS valid_to
                FROM v),
              f AS (
                SELECT o.o_custkey AS fact_key, l.l_shipdate,
                       l.l_extendedprice
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey)
              SELECT coalesce(h.priority, 'NONE') AS priority_at_ship,
                     count(*) AS n,
                     CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                       AS DOUBLE) AS revenue
              FROM f LEFT JOIN h
                ON f.fact_key = h.custkey
               AND f.l_shipdate >= h.valid_from
               AND (h.valid_to IS NULL OR f.l_shipdate < h.valid_to)
              GROUP BY 1 ORDER BY 1"""),
      (s, d) => {
        val hist = scd2Build(
          Tables.orders(s, d).select(
            col("o_custkey").as("custkey"),
            col("o_orderpriority").as("priority"),
            col("o_orderdate"), col("o_orderkey")),
          "custkey", "priority", "o_orderdate", "o_orderkey")
        val facts = Tables.lineitem(s, d)
          .join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("fact_key"),
            col("l_shipdate"), col("l_extendedprice"))
        scd2Lookup(facts, hist, "fact_key", "l_shipdate", "custkey")
          .groupBy(coalesce(col("priority"), lit("NONE"))
            .as("priority_at_ship"))
          .agg(count(lit(1)).as("n"),
            dsum(col("l_extendedprice")).as("revenue"))
          .orderBy("priority_at_ship")
      }),
    // Order-independent per-group content checksums — the anti-entropy
    // primitive: two replicas compare |groups| (n_rows, checksum) rows
    // instead of shipping 100 TB. 60-bit md5-prefix row hashes SUM in
    // DECIMAL(38,0) (commutative — partitioning cannot perturb it);
    // money renders through DECIMAL(18,2) because raw double→string
    // formatting is engine-specific.
    Query(
      "q_table_checksum",
      Some("""SELECT l_returnflag, count(*) AS n_rows,
                     CAST(sum(CAST('0x' || substr(md5(concat_ws('|',
                         CAST(l_orderkey AS VARCHAR),
                         CAST(l_linenumber AS VARCHAR),
                         CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR),
                         CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                           AS VARCHAR),
                         CAST(l_shipdate AS VARCHAR))), 1, 15) AS BIGINT))
                       AS VARCHAR) AS checksum
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      (s, d) =>
        // The primitive keeps its exact DECIMAL(38,0) sum (too wide
        // for double); the GATE render is the identical digit string
        // on both engines (§7.6 final-render rule).
        tableChecksum(
          Tables.lineitem(s, d),
          Seq(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast(DecimalType(18, 2)),
            col("l_extendedprice").cast(DecimalType(18, 2)),
            col("l_shipdate")),
          Seq("l_returnflag"))
        .withColumn("checksum", col("checksum").cast("string"))),
    Query(
      "q_rollup",
      Some("""SELECT CAST(grouping(l_returnflag)*2 + grouping(l_linestatus) AS BIGINT) AS gid,
                     coalesce(l_returnflag, 'ALL') AS flag,
                     coalesce(l_linestatus, 'ALL') AS status,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                     count(*) AS n
              FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
              ORDER BY gid, flag, status"""),
      (s, d) =>
        Tables.lineitem(s, d)
          .rollup("l_returnflag", "l_linestatus")
          .agg(
            grouping_id().as("gid"),
            dsum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n"))
          .select(
            col("gid"),
            coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("status"),
            col("sum_qty"), col("n"))
          .orderBy("gid", "flag", "status")),
    Query(
      "q_cube",
      Some("""SELECT CAST(grouping(l_returnflag)*2 + grouping(l_linestatus) AS BIGINT) AS gid,
                     coalesce(l_returnflag, 'ALL') AS flag,
                     coalesce(l_linestatus, 'ALL') AS status,
                     count(*) AS n
              FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
              ORDER BY gid, flag, status"""),
      (s, d) =>
        Tables.lineitem(s, d)
          .cube("l_returnflag", "l_linestatus")
          .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
          .select(
            col("gid"),
            coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("status"),
            col("n"))
          .orderBy("gid", "flag", "status")),
    Query(
      "q_grouping_sets",
      Some("""SELECT CAST(grouping(l_returnflag)*2 + grouping(l_linestatus) AS BIGINT) AS gid,
                     coalesce(l_returnflag, 'ALL') AS flag,
                     coalesce(l_linestatus, 'ALL') AS status,
                     count(*) AS n
              FROM lineitem
              GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
              ORDER BY gid, flag, status"""),
      // Spark 4's native Dataset.groupingSets — no temp view, nothing
      // session-global to collide on repeated/concurrent invocation.
      (s, d) =>
        Tables.lineitem(s, d)
          .groupingSets(
            Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
            col("l_returnflag"), col("l_linestatus"))
          .agg(grouping_id().as("gid"), count(lit(1)).as("n"))
          .select(col("gid"),
            coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("status"),
            col("n"))
          .orderBy("gid", "flag", "status")),

    // -- window functions --------------------------------------------
    Query(
      "q_window_rank",
      Some("""SELECT o_custkey, o_orderkey,
                     CAST(row_number() OVER w AS INT) AS rn,
                     CAST(rank() OVER w AS INT) AS rnk,
                     CAST(dense_rank() OVER w AS INT) AS drnk,
                     percent_rank() OVER w AS prnk,
                     CAST(ntile(4) OVER w AS INT) AS nt
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey)
              ORDER BY o_custkey, rn"""),
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, d)
          .select(
            col("o_custkey"), col("o_orderkey"),
            row_number().over(w).as("rn"),
            rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"),
            percent_rank().over(w).as("prnk"),
            ntile(4).over(w).as("nt"))
          .orderBy("o_custkey", "rn")
      }),
    Query(
      "q_window_frame",
      Some("""SELECT event_id, user_id, value,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum,
                     lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_v,
                     lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lead_v,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum3
              FROM events ORDER BY event_id"""),
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val dec = col("value").cast(DecimalType(18, 2))
        Tables.events(s, d)
          .select(
            col("event_id"), col("user_id"), col("value"),
            sum(dec).over(w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)).cast("double").as("run_sum"),
            lag(col("value"), 1).over(w).as("lag_v"),
            lead(col("value"), 1).over(w).as("lead_v"),
            sum(dec).over(w.rowsBetween(-2, Window.currentRow))
              .cast("double").as("mov_sum3"))
          .orderBy("event_id")
      }),
    // EVENT-TIME range frame — the trailing-window moving aggregate
    // (count + exact sum over the last hour per user) ROWS frames
    // cannot express when event spacing is irregular. The RANGE bound
    // rides on epoch micros (a numeric order key both engines share;
    // RANGE peers at equal timestamps make the result tiebreak-free),
    // and the window stays partitioned by user — per-key state only,
    // no global sort.
    Query(
      "q_window_range",
      Some("""SELECT event_id, user_id,
                     CAST(count(*) OVER w AS BIGINT) AS n_1h,
                     CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w
                       AS DOUBLE) AS sum_1h
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                           RANGE BETWEEN 3600000000 PRECEDING
                             AND CURRENT ROW)
              ORDER BY event_id"""),
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600000000L, Window.currentRow)
        Tables.events(s, d)
          .select(
            col("event_id"), col("user_id"),
            count(lit(1)).over(w).as("n_1h"),
            sum(col("value").cast(DecimalType(18, 2))).over(w)
              .cast("double").as("sum_1h"))
          .orderBy("event_id")
      }),

    // The last corners of the window-function matrix a SQL user would
    // notice missing: cume_dist (fraction of the partition at or below
    // this row), nth_value over the FULL frame (the 3rd-cheapest order
    // key of the priority class), and percentile_disc — the
    // SQL-standard discrete percentile, an actual data value, computed
    // per group and broadcast back (≤|priorities| rows). cume_dist
    // needs a total order tiebreak like every window here; nth_value
    // needs the explicit unbounded frame (the default frame stops at
    // CURRENT ROW and would return NULL for the first two rows).
    Query(
      "q_window_misc",
      Some("""WITH p AS (
                SELECT o_orderpriority,
                       quantile_disc(CAST(o_totalprice AS DOUBLE), 0.5)
                         AS p50_price
                FROM orders GROUP BY 1)
              SELECT o_orderpriority, o_orderkey,
                     round(cume_dist() OVER
                       (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice, o_orderkey)
                       * 1000000.0)/1000000.0 AS cd,
                     nth_value(o_orderkey, 3) OVER
                       (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING) AS third_key,
                     p50_price
              FROM orders JOIN p USING (o_orderpriority)
              ORDER BY o_orderpriority, o_orderkey"""),
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val wFull = w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        val ord = Tables.orders(s, d)
        val p50 = ord.groupBy("o_orderpriority")
          .agg(expr("percentile_disc(0.5) WITHIN GROUP " +
            "(ORDER BY o_totalprice)").as("p50_price"))
        ord
          .join(broadcast(p50), "o_orderpriority")
          .select(
            col("o_orderpriority"), col("o_orderkey"),
            (round(cume_dist().over(w) * lit(1000000.0)) /
              lit(1000000.0)).as("cd"),
            nth_value(col("o_orderkey"), 3).over(wFull).as("third_key"),
            col("p50_price"))
          .orderBy("o_orderpriority", "o_orderkey")
      }),

    // -- sort / limit / set ops --------------------------------------
    Query(
      "q_topk",
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
              ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""),
      (s, d) =>
        Tables.orders(s, d)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10)),
    Query(
      "q_sort_multi",
      Some("""SELECT p_partkey, p_type, p_retailprice FROM part
              ORDER BY p_type ASC, p_retailprice DESC, p_partkey"""),
      (s, d) =>
        Tables.part(s, d)
          .select("p_partkey", "p_type", "p_retailprice")
          .orderBy(col("p_type").asc, col("p_retailprice").desc,
            col("p_partkey"))),
    Query(
      "q_union",
      Some("""SELECT c_custkey AS k FROM customer
              UNION SELECT o_custkey AS k FROM orders ORDER BY k"""),
      (s, d) =>
        Tables.customer(s, d).select(col("c_custkey").as("k"))
          .union(Tables.orders(s, d).select(col("o_custkey").as("k")))
          .distinct()
          .orderBy("k")),
    Query(
      "q_intersect",
      Some("""SELECT c_custkey AS k FROM customer
              INTERSECT SELECT o_custkey AS k FROM orders ORDER BY k"""),
      (s, d) =>
        Tables.customer(s, d).select(col("c_custkey").as("k"))
          .intersect(Tables.orders(s, d).select(col("o_custkey").as("k")))
          .orderBy("k")),
    Query(
      "q_except",
      Some("""SELECT c_custkey AS k FROM customer
              EXCEPT SELECT o_custkey AS k FROM orders ORDER BY k"""),
      (s, d) =>
        Tables.customer(s, d).select(col("c_custkey").as("k"))
          .except(Tables.orders(s, d).select(col("o_custkey").as("k")))
          .orderBy("k"))
  )
}
