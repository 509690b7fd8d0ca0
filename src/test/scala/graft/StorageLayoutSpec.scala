package graft

import org.apache.spark.sql.functions._

/** Storage-layout levers for the 100 TB path: bucketing (pre-shuffled
  * tables make key-joins exchange-free) and partition pruning (a
  * partitioned layout turns a partition-key filter into skipped
  * directories, not scanned-and-dropped rows). Neither is reachable
  * from the sf parquet fixtures directly — these specs build tiny
  * bucketed/partitioned copies and pin the PLAN facts that matter at
  * scale, the same way PlanSpec pins per-query shapes.
  */
class StorageLayoutSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def withFixtureDir[T](prefix: String)(body: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toFile
    try body(dir.toString)
    finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE settles on the final plan
    // AQE's toString appends the pre-adaptive "== Initial Plan ==" —
    // count nodes only in the final section
    df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
  }

  test("bucketed-by-key tables join with ZERO exchange — the co-located " +
    "join every 100 TB fact-fact workload should be reading") {
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    try {
      orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("b_orders_a")
      orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("b_orders_b")
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val j = spark.table("b_orders_a").join(
          spark.table("b_orders_b").withColumnRenamed("o_totalprice", "p2")
            .withColumnRenamed("o_custkey", "c2"),
          "o_orderkey")
        val p = finalPlan(j)
        assert(!p.contains("Exchange"),
          "bucketed-bucketed key join must be exchange-free:\n" +
            p.take(2500))
        assert(j.count() === orders.count())
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders_a")
      spark.sql("DROP TABLE IF EXISTS b_orders_b")
    }
  }

  test("merge against a bucketed base shuffles ONLY the change set") {
    // the q_merge_upsert shape with a bucketed base: the corpus-sized
    // side reads pre-partitioned, the (much smaller) update side pays
    // the single exchange
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice")
    try {
      orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("b_orders_base")
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val base = spark.table("b_orders_base")
        val updates = orders.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey").as("u_key"),
            col("o_totalprice").as("u_price"))
        val j = base.join(updates, col("o_orderkey") === col("u_key"),
          "full_outer")
        val p = finalPlan(j)
        val exchanges = "Exchange".r.findAllIn(p).length
        // update side only: its loader rebalance (r18 — Tables.orders
        // distributes single-file fixtures) plus the bucket-aligning
        // exchange; the bucketed BASE side must stay exchange-free,
        // which the count bound still enforces (a base-side shuffle
        // would make it 3+)
        assert(exchanges <= 2,
          s"expected the update side's exchanges only, got $exchanges:\n" +
            p.take(2500))
      }
    } finally spark.sql("DROP TABLE IF EXISTS b_orders_base")
  }

  test("partition-key filter prunes directories at plan time — the scan " +
    "never touches non-matching partitions") {
    withFixtureDir("graft-partitioned-events-") { dir =>
      val ev = graft.sources.Tables.events(spark, sfDir)
      ev.write.partitionBy("event_type").parquet(s"$dir/events_p")
      val df = spark.read.parquet(s"$dir/events_p")
        .filter(col("event_type") === "click")
        .select("event_id", "value")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("PartitionFilters:"), p.take(2000))
      assert(p.contains("= click"),
        "the partition predicate must reach the scan:\n" + p.take(2000))
      // the pruned read agrees with the unpartitioned filter
      assert(df.count() ===
        ev.filter(col("event_type") === "click").count())
    }
  }

  test("zorderKey matches the reference bit-interleave") {
    import spark.implicits._
    import graft.functions.ZOrder
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L),
      (0xFFFFL, 0x1234L), (0x7FFFFFFFL, 0x7FFFFFFFL), (48L, 12L))
    val got = samples.toDF("x", "y")
      .select(ZOrder.zorderKey(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(got === samples.map { case (x, y) => ZOrder.interleaveRef(x, y) })
    // the documented domain keeps keys non-negative (signed long sort
    // stays monotone in the tile order); max in-domain key is positive
    assert(got.forall(_ >= 0L))
    // monotone in each dim at fixed other dim, within the domain
    val ys = (0L until 64L)
      .map(y => ZOrder.interleaveRef(7L, y))
    assert(ys === ys.sorted)
  }

  test("zorderKey N-dim matches the reference interleave, stays " +
    "monotone per dim, and the SQL varargs form agrees") {
    import spark.implicits._
    import graft.functions.ZOrder
    val s3 = Seq(Seq(0L, 0L, 0L), Seq(1L, 2L, 3L), Seq(5L, 3L, 7L),
      Seq(0x1FFFFFL, 0x1FFFFFL, 0x1FFFFFL), Seq(1000L, 2000L, 4000L))
    val got3 = s3.map(v => (v(0), v(1), v(2))).toDF("x", "y", "z")
      .select(ZOrder.zorderKey(col("x"), col("y"), col("z")).as("k"))
      .as[Long].collect().toSeq
    assert(got3 === s3.map(ZOrder.interleaveRef))
    assert(got3.forall(_ >= 0L), "in-domain 3-D keys stay non-negative")
    val s4 = Seq(Seq(0L, 0L, 0L, 0L), Seq(1L, 2L, 3L, 4L),
      Seq(0xFFFFL, 0xFFFFL, 0xFFFFL, 0xFFFFL), Seq(48L, 12L, 7L, 3L))
    val got4 = s4.map(v => (v(0), v(1), v(2), v(3))).toDF("a", "b", "c", "d")
      .select(ZOrder.zorderKey(
        col("a"), col("b"), col("c"), col("d")).as("k"))
      .as[Long].collect().toSeq
    assert(got4 === s4.map(ZOrder.interleaveRef))
    // monotone in the third dim at fixed others
    val zs = (0L until 64L).map(z => ZOrder.interleaveRef(Seq(7L, 3L, z)))
    assert(zs === zs.sorted)
    // SQL varargs form produces the identical keys
    val sqlK = s3.map(v => (v(0), v(1), v(2))).toDF("x", "y", "z")
      .selectExpr("zorder_key(x, y, z) AS k").as[Long].collect().toSeq
    assert(sqlK === got3)
    // arity outside [2,4] is rejected with the rule named
    val e = intercept[Exception] {
      spark.range(1).selectExpr("zorder_key(id)").collect()
    }
    assert(e.getMessage.contains("2 to 4"))
  }

  test("3-D z-ordered layout bounds row-group min/max on BOTH " +
    "secondary dimensions — filters on either skip against a " +
    "price-sorted baseline") {
    import graft.functions.ZOrder
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }
    withFixtureDir("graft-zorder3-") { dir =>
      val li = graft.sources.Tables
        .lineitem(spark, "/root/testdata/sf0.01")
        .select("l_orderkey", "l_quantity", "l_extendedprice",
          "l_discount")
      // 64 range cuts with BALANCED per-dim bit budgets (~4 bits each:
      // 13 price buckets, 13 quantity buckets, 11 discount buckets) —
      // the 6-bit partitioning prefix then pins the top TWO bits of
      // every dimension, resolving each into 4 blocks (the N-th-root
      // trade). Unbalanced budgets waste the prefix on one dim and the
      // others stop skipping.
      val n = 64
      li.repartitionByRange(n, col("l_extendedprice"))
        .sortWithinPartitions("l_extendedprice")
        .write.parquet(s"$dir/price_sorted")
      graft.sources.Warehouse.writeZOrdered(li, s"$dir/z3",
        Seq(floor(col("l_extendedprice") / lit(8192.0)),
          floor(col("l_quantity") / lit(4.0)),
          floor(col("l_discount") * lit(100.0))),
        files = n)
      def qQty(path: String) = spark.read.parquet(path)
        .filter(col("l_quantity") >= 10.0 && col("l_quantity") <= 12.0)
      def qDisc(path: String) = spark.read.parquet(path)
        .filter(col("l_discount") === 0.04)
      // identical answers from both layouts on both filters
      assert(qQty(s"$dir/z3").count() === qQty(s"$dir/price_sorted").count())
      assert(qDisc(s"$dir/z3").count() ===
        qDisc(s"$dir/price_sorted").count())
      // and the z-tiles skip on EACH secondary dim where the
      // single-sorted layout scans everything
      val (aQty, zQty) = (scanRows(qQty(s"$dir/price_sorted")),
        scanRows(qQty(s"$dir/z3")))
      val (aDisc, zDisc) = (scanRows(qDisc(s"$dir/price_sorted")),
        scanRows(qDisc(s"$dir/z3")))
      assert(zQty < aQty / 2,
        s"3-D z-order must skip on quantity: z=$zQty vs sorted=$aQty")
      assert(zDisc < aDisc / 2,
        s"3-D z-order must skip on discount: z=$zDisc vs sorted=$aDisc")
    }
  }

  test("z-ordered layout skips row groups on BOTH dimensions — a " +
    "second-dim filter reads a fraction of what a single-sorted " +
    "layout scans") {
    import graft.functions.ZOrder
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }
    withFixtureDir("graft-zorder-") { dir =>
      val li = graft.sources.Tables
        .lineitem(spark, "/root/testdata/sf0.01")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
      val n = 16
      // layout A: sorted by price only
      li.repartitionByRange(n, col("l_extendedprice"))
        .sortWithinPartitions("l_extendedprice")
        .write.parquet(s"$dir/price_sorted")
      // layout B: z-ordered on (price bucket, quantity)
      graft.sources.Warehouse.writeZOrdered(li, s"$dir/zordered",
        floor(col("l_extendedprice") / lit(2000.0)), col("l_quantity"),
        files = n)
      def q(path: String) = spark.read.parquet(path)
        .filter(col("l_quantity") >= 10.0 && col("l_quantity") <= 12.0)
      // same answer from both layouts
      assert(q(s"$dir/zordered").count() === q(s"$dir/price_sorted").count())
      val aRows = scanRows(q(s"$dir/price_sorted"))
      val zRows = scanRows(q(s"$dir/zordered"))
      // the price-sorted layout's row groups all span the full quantity
      // range — nothing skips; the z-tiles bound quantity, so the scan
      // emits a strict fraction
      assert(zRows < aRows / 2,
        s"z-order must skip row groups: z=$zRows vs sorted=$aRows")
    }
  }

  test("geohash-sorted layout skips on BOTH coordinates — a pure-" +
    "longitude box scan reads a fraction of what a lat-sorted " +
    "layout reads (prefix truncation = grid coarsening)") {
    import graft.functions.Geohash
    import graft.operators.GeoOps
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }
    withFixtureDir("graft-geohash-") { dir =>
      val pts = graft.sources.Tables
        .orders(spark, "/root/testdata/sf0.01")
        .select(col("o_orderkey").as("id"),
          GeoOps.syntheticLat(col("o_orderkey")).as("lat"),
          GeoOps.syntheticLon(col("o_orderkey")).as("lon"))
      // 64 files: a Morton range only localizes once a file covers a
      // fraction of a top-level 45° geohash cell — at 16 files each
      // spans multiple top cells and lon min/max stays wide
      val n = 64
      // layout A: sorted by latitude only — its row groups all span
      // the full longitude range
      pts.repartitionByRange(n, col("lat"))
        .sortWithinPartitions("lat")
        .write.parquet(s"$dir/lat_sorted")
      // layout B: sorted by the geohash key — contiguous key ranges
      // are spatial tiles, narrow in BOTH coordinates
      pts.withColumn("gh",
          Geohash.geohash(col("lat"), col("lon"), 6))
        .repartitionByRange(n, col("gh"))
        .sortWithinPartitions("gh")
        .write.parquet(s"$dir/gh_sorted")
      def q(path: String) = spark.read.parquet(path)
        .filter(col("lon") >= -10.0 && col("lon") <= 10.0)
      assert(q(s"$dir/gh_sorted").count() ===
        q(s"$dir/lat_sorted").count())
      val aRows = scanRows(q(s"$dir/lat_sorted"))
      val gRows = scanRows(q(s"$dir/gh_sorted"))
      assert(gRows < aRows / 2,
        s"geohash layout must skip: gh=$gRows vs lat-sorted=$aRows")
    }
  }

  test("dynamic partition overwrite touches ONLY the partitions the " +
    "incremental batch carries — the idempotent-backfill write mode") {
    withFixtureDir("graft-dyn-overwrite-") { dir =>
      val p = s"$dir/events_p"
      val ev = graft.sources.Tables.events(spark, sfDir)
        .select("event_id", "event_type", "value")
      ev.write.partitionBy("event_type").parquet(p)
      val beforeOther = spark.read.parquet(p)
        .filter(col("event_type") =!= "click").count()
      val clickFixed = ev.filter(col("event_type") === "click")
        .withColumn("value", lit(0.0))
      withConf("spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
        clickFixed.write.mode("overwrite").partitionBy("event_type")
          .parquet(p)
      }
      val after = spark.read.parquet(p)
      // static overwrite would have DELETED every other partition;
      // dynamic replaces only the 'click' directory
      assert(after.filter(col("event_type") =!= "click").count()
        === beforeOther)
      assert(after.filter(col("event_type") === "click")
        .agg(sum(col("value"))).head().getDouble(0) === 0.0)
    }
  }

  test("mergeSchema read unifies evolved parquet schemas — new columns " +
    "surface as nulls on old files, not as read failures") {
    withFixtureDir("graft-schema-evo-") { dir =>
      import spark.implicits._
      val p = s"$dir/evolved"
      Seq((1L, "a")).toDF("id", "name").write.parquet(s"$p/gen=1")
      Seq((2L, "b", 9.5)).toDF("id", "name", "score")
        .write.parquet(s"$p/gen=2")
      val df = spark.read.option("mergeSchema", "true").parquet(p)
      assert(df.columns.toSet === Set("id", "name", "score", "gen"))
      val rows = df.select("id", "score").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(rows(1L) === None)   // pre-evolution file: column is null
      assert(rows(2L) === Some(9.5))
    }
  }

  test("compactPath collapses a many-small-files directory preserving " +
    "content row-for-row") {
    withFixtureDir("graft-compact-") { dir =>
      val p = s"$dir/shredded"
      val li = graft.sources.Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
      li.repartition(64).write.parquet(p) // 64 tiny files
      val before = li.collect().map(_.toSeq).toSet
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def nFiles = fs.listStatus(hp)
        .count(_.getPath.getName.endsWith(".parquet"))
      assert(nFiles === 64)
      val total = fs.getContentSummary(hp).getLength
      val made = graft.sources.Warehouse
        .compactPath(spark, p, targetBytes = total / 2)
      assert(made === 2 || made === 3, s"made $made files") // ceil slack
      assert(nFiles === made)
      assert(spark.read.parquet(p).collect().map(_.toSeq).toSet === before)
      // idempotent-ish: compacting again at a huge target -> 1 file
      assert(graft.sources.Warehouse
        .compactPath(spark, p, targetBytes = Long.MaxValue) === 1)
      assert(spark.read.parquet(p).collect().map(_.toSeq).toSet === before)
      // trailing-slash path must NOT nest the stage inside the target
      // (string concat would have destroyed the data)
      assert(graft.sources.Warehouse
        .compactPath(spark, p + "/", targetBytes = Long.MaxValue) === 1)
      assert(spark.read.parquet(p).collect().map(_.toSeq).toSet === before)
    }
  }

  test("compactPath returns the ACTUAL file count when the byte-derived " +
    "partition request exceeds what the rows can fill") {
    withFixtureDir("graft-compact-tiny-") { dir =>
      import spark.implicits._
      val p = s"$dir/tiny"
      Seq(1L, 2L, 3L).toDF("id").write.parquet(p)
      // targetBytes=1 requests ~file-size partitions, far more than 3
      // rows can fill — empty partitions write no file, and the return
      // value must reflect the disk, not the request
      val made = graft.sources.Warehouse.compactPath(spark, p, 1L)
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val onDisk = fs.listStatus(hp)
        .count(_.getPath.getName.endsWith(".parquet"))
      assert(made === onDisk)
      assert(spark.read.parquet(p).as[Long].collect().sorted
        === Array(1L, 2L, 3L))
    }
  }

  test("range-partitioned (sorted) write keeps min/max file statistics " +
    "tight — a sort-key filter reads a bounded file subset") {
    // parquet footer min/max + repartitionByRange give file-skipping on
    // the sort key: the plan must push the filter to the scan; the
    // correctness half (same rows) guards the layout transform itself
    withFixtureDir("graft-sorted-lineitem-") { dir =>
      val li = graft.sources.Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_shipdate", "l_extendedprice")
      li.repartitionByRange(8, col("l_shipdate"))
        .sortWithinPartitions("l_shipdate")
        .write.parquet(s"$dir/li_sorted")
      val df = spark.read.parquet(s"$dir/li_sorted")
        .filter(col("l_shipdate") >= lit("1995-06-01").cast("timestamp"))
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
        p.take(2000))
      assert(df.count() === li.filter(
        col("l_shipdate") >= lit("1995-06-01").cast("timestamp")).count())
    }
  }
}
