package graft

import org.apache.spark.sql.types.{DataType, DecimalType, StructType}

/** The §7.6 final-render rule, made self-enforcing.
  *
  * The driver's hash gate reads the engine's parquet through
  * pyarrow/pandas and the oracle through DuckDB — two read paths that
  * render DECIMAL(p,s) differently (`Decimal('59.10')` vs `59.1`) and
  * widen BIGINT sums to HUGEINT oracle-side. r12 shipped 8 queries
  * that were value-identical to their oracles yet hash-red purely on
  * output type. This lint asserts the rule at the REGISTRY level so
  * the class cannot be reintroduced: no oracle-gated query may emit a
  * DecimalType (top-level or nested) — exact DECIMAL math stays
  * internal, the final render is DOUBLE / BIGINT / STRING.
  */
class RegistryLintSpec extends SparkSpec {

  private def decimalPaths(dt: DataType, path: String): Seq[String] =
    dt match {
      case _: DecimalType => Seq(path)
      case s: StructType =>
        s.fields.toSeq.flatMap(f =>
          decimalPaths(f.dataType, s"$path.${f.name}"))
      case a: org.apache.spark.sql.types.ArrayType =>
        decimalPaths(a.elementType, s"$path[]")
      case m: org.apache.spark.sql.types.MapType =>
        decimalPaths(m.keyType, s"$path<key>") ++
          decimalPaths(m.valueType, s"$path<val>")
      case _ => Seq.empty
    }

  test("no oracle-gated query emits a DecimalType output column " +
    "(§7.6 final-render rule)") {
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap {
      name =>
        // schema access analyzes the plan without executing it; the
        // few builders that do eager driver work (index fits) run at
        // sf0.001 here
        val schema = SparkEntry.queries(name)(spark, sfDir).schema
        decimalPaths(schema, "").map(p => s"$name$p") match {
          case Nil => None
          case ps  => Some(s"$name -> ${schema.simpleString
            .take(200)} (${ps.mkString(", ")})")
        }
    }
    assert(offenders.isEmpty,
      s"\nDECIMAL output columns violate SURVEY §7.6 (the driver's " +
        s"two read paths render them differently):\n  " +
        offenders.mkString("\n  "))
  }
}
