package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: execute one registered query and dump its FINAL (AQE)
  * physical plan plus wall time — the .explain feedback loop for plan
  * audits. Usage: runMain graft.tools.PlanDump <sfDir> <query>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("GRAFT_BROADCAST", "10485760"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // --edges: dump the q_knn_ann bucket histogram + candidate volume
    if (args.contains("--edges")) {
      import org.apache.spark.sql.functions._
      val idx = graft.operators.AnnIndex.build(
        graft.sources.Tables.embeddings(spark, sfDir), "vec_id", "embedding",
        tables = 16, persist = false)
      val occ = idx.sigs.groupBy("t", "sig").count()
      occ.orderBy(desc("count")).show(10)
      val e = occ.agg(sum(col("count") * col("count"))).head().getLong(0)
      println(s"[plandump] buckets=${occ.count()} candidate_edges=$e")
      spark.stop(); return
    }
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = s.stageInfo
          println(f"[stage] id=${i.stageId}%3d tasks=${i.numTasks}%3d " +
            f"run=${i.taskMetrics.executorRunTime / 1000.0}%7.1fs " +
            f"cpu=${i.taskMetrics.executorCpuTime / 1e9}%7.1fs " +
            i.name.take(80))
        }
      })
    // --warmcache: reproduce the Bench session's table state (every
    // table persisted through the session cache manager) before the
    // repeat loop — the bimodal-runtime candidates differ between a
    // fresh-scan session and the bench's cached-relation regime.
    if (args.contains("--warmcache"))
      graft.sources.Tables.names.foreach { n =>
        try graft.sources.Tables(spark, sfDir, n).persist().count()
        catch { case _: Throwable => () }
      }
    // --names: print the registered-query iteration order (the bench's
    // round order) and exit — pre-list construction for board-regime
    // reproductions.
    if (args.contains("--names")) {
      println(graft.SparkEntry.queries.keys.toSeq.mkString(","))
      spark.stop(); return
    }
    // --pre a,b,c: run other registered queries ONCE before the
    // target (same session) — reproduces the bench regime where
    // earlier board queries have already built their session-pinned
    // artifacts (Sen spine, geo edges, fitted chains), the prime
    // suspect for target-query slowdowns that only show on the full
    // board (q_setsim_join r17: 4.7 s isolated, 22.8 s board median).
    args.sliding(2).collectFirst {
      case Array("--pre", qs) => qs.split(',').toSeq
    }.foreach { pres =>
      def storageMB: (Long, Long) = {
        val infos = spark.sparkContext.getRDDStorageInfo
        (infos.map(_.memSize).sum >> 20, infos.map(_.diskSize).sum >> 20)
      }
      pres.filter(_.nonEmpty).foreach { q =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
        val (m, dk) = storageMB
        println(f"[pre] $q rows=$n wall=${(System.nanoTime() - t0) / 1e9}%6.2fs " +
          f"storage_mem=${m}MB disk=${dk}MB")
      }
    }
    // --repeat N: run the query N times in ONE session (the bench's
    // interleaved-round regime) printing per-run wall, the final AQE
    // join-strategy signature, and the JVM GC-time delta — the
    // bimodal-runtime (q_setsim_join r15) triage loop: if the
    // signature flips with the wall, it's a plan variant; if the
    // signature is stable and GC spikes with the wall, it's heap.
    args.sliding(2).collectFirst {
      case Array("--repeat", n) => n.toInt
    }.foreach { reps =>
      def gcMillis: Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(_.getCollectionTime).sum
      }
      def sig(p: org.apache.spark.sql.execution.SparkPlan): String = {
        val b = collection.mutable.ListBuffer.empty[String]
        def walk(q: org.apache.spark.sql.execution.SparkPlan): Unit = {
          q match {
            case a: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              walk(a.plan)
            case a: org.apache.spark.sql.execution.adaptive
                .AdaptiveSparkPlanExec => walk(a.executedPlan)
            case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
              b += j.nodeName
            case _ => ()
          }
          q.children.foreach(walk)
        }
        walk(p); b.mkString(">")
      }
      var gc0 = gcMillis
      for (i <- 1 to reps) {
        // time construction + count, like Bench: eager-execution
        // queries (the IRLS family) run their pass chains at
        // DataFrame-CONSTRUCTION time
        val ti = System.nanoTime()
        val dfi = graft.SparkEntry.queries(name)(spark, sfDir)
        val ni = dfi.count()
        val wi = (System.nanoTime() - ti) / 1e9
        val gc1 = gcMillis
        println(f"[repeat] run=$i wall=$wi%6.2fs rows=$ni " +
          f"gc_delta=${(gc1 - gc0) / 1000.0}%5.1fs sig=" +
          sig(dfi.queryExecution.executedPlan))
        gc0 = gc1
      }
      spark.stop(); return
    }
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    val n = df.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[plandump] $name rows=$n wall=$secs%.2fs")
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    def dump(p: org.apache.spark.sql.execution.SparkPlan, d: Int): Unit = {
      val m = p.metrics.toSeq
        .filter { case (k, _) => k.contains("numOutputRows") || k.contains("Time") }
        .sortBy(_._1)
        .map { case (k, v) => s"$k=${v.value}" }.mkString(", ")
      println(s"[plandump] ${"  " * d}${p.nodeName} | $m")
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(a.plan)
        case a: org.apache.spark.sql.execution.InputAdapter => Seq(a.child)
        case a: org.apache.spark.sql.execution.WholeStageCodegenExec =>
          Seq(a.child)
        case _ => p.children
      }
      kids.foreach(dump(_, d + 1))
    }
    dump(plan, 0)
    // --codegen additionally writes the generated code per stage to
    // /tmp/graft_codegen.txt (too large for a terminal)
    if (args.contains("--codegen"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get("/tmp/graft_codegen.txt"),
        org.apache.spark.sql.execution.debug.codegenString(plan)
          .getBytes("UTF-8"))
    spark.stop()
  }
}
