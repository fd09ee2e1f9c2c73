package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("range-sorted layout prunes row groups for range predicates") {
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    try {
      hc.setInt("parquet.block.size", 64 * 1024) // many small row groups
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val n = 100000L
      val df = spark.range(n).select(col("id").as("k"), (col("id") * 2).as("v"))
      // scramble first: the op must impose the order, not inherit it
      val laid = Layout.writeSortedBy(df.repartition(7), s"$dir/sorted", Seq("k"), 4)
      val q = laid.where(col("k") >= 1000 && col("k") < 2000)
      assert(q.collect().map(_.getLong(0)).sorted.toSeq == (1000L until 2000L))
      val scanned = q.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
      // zone-map skipping: the scan emits only the few row groups whose
      // [min,max] overlap the range, not the whole table
      assert(scanned < n / 2, s"expected row-group pruning, scan emitted $scanned of $n")
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("compact collapses many small files and preserves content exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val df = spark.range(10000).select(col("id"), (col("id") % 13).as("v"))
    df.repartition(64).write.parquet(s"$dir/small") // 64 tiny files
    val before = new java.io.File(s"$dir/small")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(before == 64)
    val compacted = Layout.compact(spark, s"$dir/small", s"$dir/big", 1L << 20)
    val after = new java.io.File(s"$dir/big")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(after < 8, s"expected few output files, got $after")
    assert(compacted.count() == 10000)
    assert(compacted.agg(sum(col("v"))).head().getLong(0) ==
      df.agg(sum(col("v"))).head().getLong(0))
  }

  test("bucketed tables join and aggregate with no shuffle exchange") {
    val facts = (1L to 400L).map(i => (i % 40, i, (i % 7).toInt)).toDF("k", "row_id", "v")
    val dims = (0L until 40L).map(i => (i, s"name$i")).toDF("k", "name")
    Layout.writeBucketed(facts, "graft_spec_facts", "k", 4)
    Layout.writeBucketed(dims, "graft_spec_dims", "k", 4)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("graft_spec_facts")
        .join(spark.table("graft_spec_dims"), "k")
        .groupBy(col("k"))
        .agg(sum(col("v")).as("sv"), first(col("name")).as("name"))
      val phys = joined.queryExecution.executedPlan.toString
      assert(!phys.contains("Exchange"), s"expected shuffle-free plan, got:\n$phys")
      val rows = joined.collect()
      assert(rows.length == 40)
      val expect = (1L to 400L).groupBy(_ % 40).view.mapValues(_.map(i => (i % 7)).sum)
      rows.foreach { r =>
        assert(r.getAs[Long]("sv") == expect(r.getAs[Long]("k")).toLong)
        assert(r.getAs[String]("name") == s"name${r.getAs[Long]("k")}")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS graft_spec_facts")
      spark.sql("DROP TABLE IF EXISTS graft_spec_dims")
    }
  }

  test("bucketed write is bucket-aligned: one file per task, not tasks x buckets") {
    // 37 scrambled input partitions would write up to 37x4 files without
    // the aligned repartition; with it, each task holds exactly one bucket
    val df = (1L to 4000L).map(i => (i % 97, i)).toDF("k", "row_id")
      .repartition(37)
    Layout.writeBucketed(df, "graft_spec_aligned", "k", 4)
    try {
      val loc = new java.io.File(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier("graft_spec_aligned")))
      val files = loc.listFiles().filter(_.getName.startsWith("part-"))
      val expected = Layout.alignedPartitions(df, 4)
      assert(files.length <= expected,
        s"expected <= $expected bucket-aligned files, got ${files.length}")
      // every file belongs to exactly one bucket (the _NNNNN suffix), and
      // all 4 buckets are populated
      val bucketsSeen = files.map(_.getName.replaceAll("""^.*_(\d{5})\..*$""", "$1"))
      assert(bucketsSeen.toSet.size == 4, s"buckets seen: ${bucketsSeen.toSet}")
      assert(bucketsSeen.length == bucketsSeen.distinct.length ||
        files.length <= expected) // multiple tasks per bucket allowed, never split tasks
      // content survives the alignment exactly
      assert(spark.table("graft_spec_aligned").count() == 4000)
      assert(spark.table("graft_spec_aligned").agg(sum(col("row_id")))
        .head().getLong(0) == (1L to 4000L).sum)
    } finally spark.sql("DROP TABLE IF EXISTS graft_spec_aligned")
  }

  test("z-order bounds every layout dimension per file; trailing-column predicates prune") {
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    try {
      hc.setInt("parquet.block.size", 64 * 1024)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val n = 100000L
      // two INDEPENDENT uniform dims: sorting by k alone leaves v unbounded
      val df = spark.range(n).select(
        col("id").as("k"), ((col("id") * 40503L) % n).as("v"))
      val scrambled = df.repartition(7)
      // 32 files over a 16-bit code: each file fixes the top 5 interleaved
      // bits → per-file box ~ (n/8)x(n/4) = full/32
      val z = Layout.writeZOrder(scrambled, s"$dir/z", Seq("k", "v"), 32, bits = 8)
      // content preserved exactly
      assert(z.count() == n)
      assert(z.agg(sum(col("k") + col("v"))).head().getLong(0) ==
        df.agg(sum(col("k") + col("v"))).head().getLong(0))
      // every file spans a narrow box in BOTH dims: mean per-file area is a
      // small fraction of the full square (a k-sorted layout has full-range
      // v in every file; round-robin has full range in both)
      val area = z
        .groupBy(col("_metadata.file_path"))
        .agg(((max(col("k")) - min(col("k"))) *
             (max(col("v")) - min(col("v")))).as("area"))
        .agg(avg(col("area"))).head().getDouble(0)
      // full/32 in perfect prefix alignment; range-partition boundaries
      // straddle bit boundaries and can double one dim, so gate at full/8
      val full = n.toDouble * n.toDouble
      assert(area < full / 8.0,
        s"expected tight per-file boxes, mean area $area vs full $full")
      // a predicate on the TRAILING dim alone prunes row groups too
      val q = z.where(col("v") >= 1000 && col("v") < 2000)
      assert(q.count() == 1000)
      val scanned = q.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
      assert(scanned < n / 2, s"expected row-group pruning on v, scanned $scanned of $n")
      // degenerate inputs refused
      intercept[IllegalArgumentException] {
        Layout.writeZOrder(df, s"$dir/bad", Seq("k"), 2)
      }
      intercept[IllegalArgumentException] {
        Layout.writeZOrder(df, s"$dir/bad", Seq("k", "v"), 2, bits = 40)
      }
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("writeByCell groups rows by IVF cell: content exact, cells file-contiguous") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bycell").toString
    val dim = 4
    // 3 well-separated blobs around fixed centroids
    val centroids = Array[Float](
      0f, 0f, 0f, 0f,
      10f, 10f, 10f, 10f,
      20f, 20f, 20f, 20f)
    val rnd = new scala.util.Random(5)
    val rows = (0 until 300).map { i =>
      val c = i % 3
      (i.toLong, Seq.fill(dim)(c * 10f + rnd.nextFloat()))
    }
    val df = rows.toDF("id", "vec")
      .select(
        col("id"), col("vec").cast("array<float>").as("vec"),
        // decoy: a USER column named _cell (our similarity ops emit one)
        // must survive the relayout byte-for-byte
        (col("id") * 7).as("_cell"))
      .repartition(7) // scramble: the op must impose the grouping
    val laid = Layout.writeByCell(df, s"$dir/bycell", "vec", centroids, dim, numFiles = 3)
    // content is exactly preserved (same ids, same vectors, same _cell)
    assert(laid.count() == 300)
    assert(laid.select("id").as[Long].collect().sorted.toSeq == (0L until 300L))
    assert(laid.columns.sorted.toSeq == Seq("_cell", "id", "vec"))
    assert(laid.where(col("_cell") =!= col("id") * 7).count() == 0,
      "user _cell column must survive the relayout")
    // every cell's rows land in ONE file: cell → set of holding files is 1:1
    val cellFiles = laid
      .select(
        col("_metadata.file_path").as("file"),
        col("id") % 3 as "cell") // generator cell == nearest centroid by construction
      .distinct()
      .collect()
      .groupBy(_.getLong(1))
      .view.mapValues(_.map(_.getString(0)).toSet)
    cellFiles.foreach { case (cell, files) =>
      assert(files.size == 1, s"cell $cell spread over ${files.size} files")
    }
  }

  test("writeByCell pageRows=Some(1) writes the point-read page layout") {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft-bycell-p1").toString
    val dim = 4
    val centroids = Array[Float](0f, 0f, 0f, 0f, 10f, 10f, 10f, 10f)
    val rnd = new scala.util.Random(6)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(dim)((i % 2) * 10f + rnd.nextFloat()))
    }
    val df = rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val laid = Layout.writeByCell(
      df, s"$dir/p1", "vec", centroids, dim, numFiles = 1, pageRows = Some(1))
    assert(laid.count() == 200)
    // the vector column really got ~1 row per page (offset index shows
    // many pages), vs the default layout's one big page for 200 tiny rows
    val file = laid.inputFiles.head.stripPrefix("file:")
    val rdr = org.apache.parquet.hadoop.ParquetFileReader
      .open(org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file), new org.apache.hadoop.conf.Configuration()))
    try {
      val block = rdr.getFooter.getBlocks.get(0)
      val chunk = block.getColumns.asScala
        .find(_.getPath.toDotString.startsWith("vec")).get
      val oi = rdr.readOffsetIndex(chunk)
      assert(oi != null && oi.getPageCount >= 100,
        s"pages=${if (oi == null) -1 else oi.getPageCount}")
    } finally rdr.close()
    intercept[IllegalArgumentException](Layout.writeByCell(
      df, s"$dir/bad", "vec", centroids, dim, numFiles = 1, pageRows = Some(0)))
  }
}
