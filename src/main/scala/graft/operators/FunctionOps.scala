package graft.operators

import graft.Query
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Tier B (continued) — scalar-function packs: string / date / math /
  * conditional / array (higher-order) / map-JSON generator surface
  * (SURVEY.md §2.3). All builtins, all codegen-friendly; no UDFs.
  *
  * Cross-engine determinism notes baked into the oracles:
  *  - DuckDB `year()/month()/datediff()` return BIGINT, window ranks too —
  *    cast to Spark's INT on the oracle side.
  *  - `date_trunc` returns DATE in DuckDB vs TIMESTAMP in Spark — both
  *    sides cast to DATE.
  *  - day-of-week spelled as ISO (`isodow`) with explicit arithmetic on
  *    the Spark side, since engines disagree on dow numbering.
  *  - `round`-on-ties agrees (both half-away-from-zero for doubles);
  *    transcendental fns (ln) round to 6 dp to absorb libm ulp drift.
  */
object FunctionOps {

  val all: Seq[Query] = Seq(
    Query(
      "q_string_funcs",
      Some("""SELECT p_partkey,
                     upper(p_name) AS up, lower(p_name) AS lo,
                     substr(p_name, 1, 8) AS sub,
                     CAST(length(p_name) AS INT) AS len,
                     concat_ws('-', p_brand, p_type) AS cw,
                     replace(p_name, ' ', '_') AS rep,
                     regexp_extract(p_type, '([A-Z]+)', 1) AS rex
              FROM part ORDER BY p_partkey"""),
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("up"),
            lower(col("p_name")).as("lo"),
            substring(col("p_name"), 1, 8).as("sub"),
            length(col("p_name")).as("len"),
            concat_ws("-", col("p_brand"), col("p_type")).as("cw"),
            regexp_replace(col("p_name"), " ", "_").as("rep"),
            regexp_extract(col("p_type"), "([A-Z]+)", 1).as("rex"))
          .orderBy("p_partkey")),
    Query(
      "q_date_funcs",
      Some("""SELECT o_orderkey,
                     CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
                     CAST(year(o_orderdate) AS INT) AS yr,
                     CAST(month(o_orderdate) AS INT) AS mo,
                     CAST(isodow(o_orderdate) AS INT) AS dow_iso,
                     CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INT) AS dd,
                     o_orderdate + INTERVAL 10 DAY AS plus10
              FROM orders ORDER BY o_orderkey"""),
      (s, d) =>
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            date_trunc("month", col("o_orderdate")).cast("date").as("mon"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            (((dayofweek(col("o_orderdate")) + 5) % 7) + 1).as("dow_iso"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
              .as("dd"),
            (col("o_orderdate") + expr("INTERVAL 10 DAYS")).as("plus10"))
          .orderBy("o_orderkey")),
    Query(
      "q_math_funcs",
      Some("""SELECT l_orderkey, l_linenumber,
                     abs(l_quantity - 25.0) AS ab,
                     CAST(ceil(l_extendedprice) AS DOUBLE) AS ce,
                     CAST(floor(l_extendedprice) AS DOUBLE) AS fl,
                     sqrt(l_quantity) AS sq,
                     CAST(l_linenumber % 3 AS INT) AS md,
                     power(l_quantity, 2.0) AS pw,
                     round(ln(l_extendedprice), 6) AS lg
              FROM lineitem ORDER BY l_orderkey, l_linenumber"""),
      (s, d) =>
        Tables.lineitem(s, d)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            abs(col("l_quantity") - 25.0).as("ab"),
            ceil(col("l_extendedprice")).cast("double").as("ce"),
            floor(col("l_extendedprice")).cast("double").as("fl"),
            sqrt(col("l_quantity")).as("sq"),
            (col("l_linenumber") % 3).as("md"),
            pow(col("l_quantity"), 2.0).as("pw"),
            round(log(col("l_extendedprice")), 6).as("lg"))
          .orderBy("l_orderkey", "l_linenumber")),
    Query(
      "q_case_expr",
      Some("""SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                          WHEN o_totalprice < 150000 THEN 'mid'
                          ELSE 'high' END AS bucket,
                     count(*) AS n,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
              FROM orders GROUP BY 1 ORDER BY bucket"""),
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(
            when(col("o_totalprice") < 50000, "low")
              .when(col("o_totalprice") < 150000, "mid")
              .otherwise("high")
              .as("bucket"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast("double").as("total"))
          .orderBy("bucket")),
    // Higher-order array functions over the 64-dim embedding column —
    // the dot-product/norm building blocks of Tier D, no UDF involved.
    Query(
      "q_array_funcs",
      Some("""SELECT vec_id,
                     CAST(len(embedding) AS INT) AS dim,
                     round(CAST(embedding[1] AS DOUBLE), 6) AS first_v,
                     round(CAST(list_max(embedding) AS DOUBLE), 6) AS mx,
                     round(sqrt(list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS nrm
              FROM embeddings ORDER BY vec_id"""),
      (s, d) =>
        Tables.embeddings(s, d)
          .select(
            col("vec_id"),
            size(col("embedding")).as("dim"),
            round(element_at(col("embedding"), 1).cast("double"), 6)
              .as("first_v"),
            round(array_max(col("embedding")).cast("double"), 6).as("mx"),
            round(sqrt(aggregate(col("embedding"),
              lit(0.0).cast("double"),
              (acc, x) => acc + x.cast("double") * x.cast("double"))), 6)
              .as("nrm"))
          .orderBy("vec_id")),
    // Generator / UDTF surface: JSON map → exploded key/value rows.
    // (Driver data has single-key props — oracle spells the expansion.)
    Query(
      "q_map_json",
      Some("""SELECT event_id, 'k' AS key,
                     CAST(json_extract_string(props, '$.k') AS INT) AS value
              FROM events ORDER BY event_id, key"""),
      (s, d) =>
        Tables.events(s, d)
          .select(
            col("event_id"),
            explode(from_json(col("props"),
              org.apache.spark.sql.types.DataType.fromDDL("map<string,int>"))))
          .orderBy("event_id", "key")),
    // Spark 4's native VARIANT path for semi-structured columns:
    // parse once into the shredded binary encoding, then typed
    // variant_get extraction — the engine-native alternative to
    // per-access string JSON parsing (get_json_object re-parses the
    // document on every call; a VARIANT column parses once and every
    // downstream extraction reads the binary form). Same narrow
    // codegen'd scan shape; the oracle spells the identical semantics
    // through DuckDB's JSON type.
    Query(
      "q_variant_json",
      Some("""WITH x AS (
                SELECT event_type,
                       CAST(json_extract_string(props, '$.k') AS BIGINT)
                         AS k
                FROM events)
              SELECT event_type, count(k) AS n,
                     CAST(sum(k) AS BIGINT) AS sum_k,
                     CAST(min(k) AS BIGINT) AS min_k,
                     CAST(max(k) AS BIGINT) AS max_k
              FROM x GROUP BY event_type ORDER BY event_type"""),
      (s, d) =>
        Tables.events(s, d)
          .select(col("event_type"),
            variant_get(parse_json(col("props")), "$.k", "bigint").as("k"))
          .groupBy("event_type")
          .agg(count(col("k")).as("n"),
            sum(col("k")).cast("bigint").as("sum_k"),
            min(col("k")).cast("bigint").as("min_k"),
            max(col("k")).cast("bigint").as("max_k"))
          .orderBy("event_type"))
  )
}
