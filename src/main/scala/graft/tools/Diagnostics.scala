package graft.tools

import org.apache.spark.sql.SparkSession

/** R14 — startup diagnostics, parity with the reference's boot banner and
  * sorted environment/property dump (BME680.java:184-208): the reference
  * prints a banner, then every env var and JVM property in sorted order
  * before building the topology. Here the dump is the session's Spark
  * conf (sorted), the JVM/OS coordinates, and the parallelism actually
  * available — the facts an operator needs first when a deployment
  * misbehaves. Values go to stderr so stdout stays machine-parseable
  * (Bench/Verify print protocol JSON there); env VARIABLE VALUES are
  * deliberately not dumped (unlike the reference) — prod environments
  * put credentials in env — and Spark conf values whose KEY matches the
  * session's `spark.redaction.regex` (secrets/passwords/tokens/access
  * keys) are redacted, mirroring what the Spark UI and event log do.
  */
object Diagnostics {

  private val shown = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Print the banner + sorted conf dump once per session. */
  def startupBanner(spark: SparkSession): Unit = if (shown.add(spark)) {
    val err = System.err
    err.println("=" * 64)
    err.println(s"graft engine | Spark ${spark.version}" +
      s" | Scala ${util.Properties.versionNumberString}")
    err.println(s"java ${System.getProperty("java.version")}" +
      s" | ${System.getProperty("os.name")} ${System.getProperty("os.arch")}" +
      s" | cores ${Runtime.getRuntime.availableProcessors}" +
      s" | maxHeap ${Runtime.getRuntime.maxMemory / (1 << 20)} MiB")
    err.println(s"master ${spark.sparkContext.master}" +
      s" | defaultParallelism ${spark.sparkContext.defaultParallelism}" +
      s" | env vars ${sys.env.size} (names only: " +
      s"${sys.env.keys.toSeq.sorted.take(8).mkString(", ")}…)")
    // Spark's own redaction heuristic (and its default), so a conf used
    // as a credential store (spark.hadoop.fs.s3a.secret.key, JDBC
    // passwords, delegation tokens) never lands in deployment logs.
    val redact = spark.conf.getAll
      .getOrElse("spark.redaction.regex", "(?i)secret|password|token|access[.]key")
      .r
    spark.conf.getAll.toSeq.sortBy(_._1).foreach { case (k, v) =>
      val shown = if (redact.findFirstIn(k).isDefined) "*********(redacted)" else v
      err.println(s"  $k=$shown")
    }
    err.println("=" * 64)
  }
}
