package graft

import graft.operators.ReferenceOps
import org.apache.spark.sql.functions._

/** Flagship truth table (FIXTURES.md §A) — REF fidelity of the reference's
  * processValues pipeline (BME680.java:136-178): dual-branch extraction,
  * strict >75.0 threshold, Java-Formatter-exact alert text, null-safe
  * deviation on malformed input. */
class ReferenceOpsSpec extends SparkSpec {

  private val sampleDoc =
    """{"uuid": "x1", "cputemp": 51.0, "bme680_tempf": "82.74", "memory": 34.9}"""

  private def run(values: String*): Seq[(String, String)] = {
    import spark.implicits._
    val df = values.toSeq.toDF("value")
    df.select(col("value"),
        ReferenceOps.extractTemp(col("value"), "$.bme680_tempf").as("t"))
      .filter(col("t") > lit(75.0))
      .select(col("value"), ReferenceOps.alertText(col("t")).as("alert"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
  }

  test("JSON doc above threshold alerts with Formatter-exact text") {
    assert(run(sampleDoc) === Seq((sampleDoc, "Temperature warning 82.74")))
    assert("Temperature warning 82.74" ===
      String.format("Temperature warning %04.2f", Float.box(82.74f)))
  }

  test("JSON doc below threshold produces no alert") {
    assert(run("""{"bme680_tempf": "74.99"}""").isEmpty)
  }

  test("bare numeric string is trimmed then parsed") {
    assert(run(" 80.1 ").map(_._2) === Seq("Temperature warning 80.10"))
  }

  test("boundary 75.0 is excluded — strict > (BME680.java:160)") {
    assert(run("75", "75.0", " 75.00 ").isEmpty)
    assert(run("75.01").map(_._2) === Seq("Temperature warning 75.01"))
  }

  test("malformed input is null-safe (documented deviation from crash)") {
    assert(run("abc", """{"other": 1}""", "").isEmpty)
  }

  test("format matches java.util.Formatter across magnitudes") {
    for (v <- Seq(75.01, 80.1, 99.99, 100.0, 212.5, 1000.125)) {
      val got = run(v.toString).head._2
      assert(got === String.format("Temperature warning %04.2f", Double.box(v)))
    }
  }

  test("flagship runs on driver data with rows > 0 (entry contract)") {
    val n = SparkEntry.entry(spark).count()
    assert(n > 0)
  }
}
