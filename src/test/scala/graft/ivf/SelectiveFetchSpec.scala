package graft.ivf

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class SelectiveFetchSpec extends SparkSpec {
  import spark.implicits._

  private def oneFile(dir: String): String = {
    val f = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(f.length == 1)
    f.head.getAbsolutePath
  }

  test("reads exactly the requested ordinals across multiple row groups") {
    val dir = Files.createTempDirectory("graft-selfetch").toString
    val vecs = (0 until 300).map(i => (i.toLong, Seq.fill(8)(i.toFloat / 10)))
    vecs.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
      .coalesce(1).write.mode("overwrite")
      // tiny row groups so group skipping is exercised
      .option("parquet.block.size", "4096")
      .parquet(dir)
    val file = oneFile(dir)
    val footer = org.apache.parquet.hadoop.ParquetFileReader
      .open(org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file), new org.apache.hadoop.conf.Configuration()))
    val nGroups = try footer.getFooter.getBlocks.size finally footer.close()
    assert(nGroups > 1, s"fixture produced only $nGroups row group(s)")

    val wanted = Array(0, 7, 13, 150, 151, 299)
    val got = SelectiveFetch.embeddings(file, "vec", wanted)
    assert(got.map(_._1) == wanted.map(_.toLong).toSeq)
    got.foreach { case (ri, v) =>
      assert(v.toSeq == Seq.fill(8)(ri.toFloat / 10))
    }
    // unordered + duplicate input normalizes
    val got2 = SelectiveFetch.embeddings(file, "vec", Array(299, 13, 13, 0))
    assert(got2.map(_._1) == Seq(0L, 13L, 299L))
  }

  test("skips null vectors and null elements; downcasts double columns") {
    val dir = Files.createTempDirectory("graft-selfetch-null").toString
    val rows: Seq[(Long, Option[Seq[Option[Double]]])] = Seq(
      (0L, Some(Seq(Some(1.5), Some(2.5)))),
      (1L, None), // null vector
      (2L, Some(Seq(Some(3.5), None))), // null element
      (3L, Some(Seq(Some(4.5), Some(5.5)))))
    rows.toDF("id", "vec").coalesce(1).write.mode("overwrite").parquet(dir)
    val file = oneFile(dir)
    val got = SelectiveFetch.embeddings(file, "vec", Array(0, 1, 2, 3))
    assert(got.map(_._1) == Seq(0L, 3L))
    assert(got.head._2.toSeq == Seq(1.5f, 2.5f))
    assert(got(1)._2.toSeq == Seq(4.5f, 5.5f))
  }

  test("page-granular selection over 1-row-page files (rewriteWithIndex layout)") {
    val in = Files.createTempDirectory("graft-pg-in").toString
    val outDir = Files.createTempDirectory("graft-pg-out").toString
    val vecs = (0 until 120).map(i => (i.toLong, Seq.fill(6)(i.toFloat)))
    vecs.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
      .coalesce(1).write.mode("overwrite").parquet(in)
    // 1 row per page + embedded index, the reference's point-read layout
    IvfBuilder.rewriteWithIndex(spark, in, outDir,
      IvfBuilder.Config("vec", nClusters = Some(4)), numFiles = Some(1))
    val file = oneFile(outDir)
    // sanity: the rewritten file really has many pages (offset index present)
    val rdr = org.apache.parquet.hadoop.ParquetFileReader
      .open(org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file), new org.apache.hadoop.conf.Configuration()))
    try {
      val block = rdr.getFooter.getBlocks.get(0)
      val chunk = block.getColumns.asScala
        .find(_.getPath.toDotString.startsWith("vec")).get
      val oi = rdr.readOffsetIndex(chunk)
      assert(oi != null && oi.getPageCount > 10, s"pages=${if (oi == null) -1 else oi.getPageCount}")
    } finally rdr.close()
    // rewrite preserves row order here (single input file, single output);
    // fetch sparse ordinals and verify content
    val rows = spark.read.parquet(outDir)
      .select(col("id"), col("vec"), col("_metadata.row_index").as("ri"))
      .collect().map(r => r.getLong(2) -> (r.getLong(0), r.getSeq[Float](1))).toMap
    val wanted = Array(3, 57, 119)
    val got = SelectiveFetch.embeddings(file, "vec", wanted)
    assert(got.map(_._1) == wanted.map(_.toLong).toSeq)
    got.foreach { case (ri, v) => assert(v.toSeq == rows(ri)._2) }
  }

  test("search works against a footer-embedded index (no sidecar)") {
    val dir = Files.createTempDirectory("graft-selfetch-embed").toString
    val rnd = new scala.util.Random(13)
    val vecs = (0 until 80).map(i => (i.toLong, Seq.fill(4)(rnd.nextFloat())))
    spark.createDataFrame(vecs).toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    // embed the index INSIDE the parquet footer region (reference layout);
    // point the search at an EMPTY sidecar store so only the footer serves
    val buildStore = new IndexStore(Files.createTempDirectory("graft-embed-b").toString)
    val build = IvfBuilder.build(spark, dir,
      IvfBuilder.Config("vec", nClusters = Some(4)), buildStore, embed = true)
    val emptyStore = new IndexStore(Files.createTempDirectory("graft-embed-e").toString)
    val query = Seq.fill(4)(0.5f)
    val res = VectorTopK.search(spark, dir, "vec", query, 10,
      VectorTopK.Options(nprobe = build.nClusters), store = emptyStore).collect()
    assert(res.length == 10)
    val expected = vecs.map { case (id, v) =>
      (id, math.sqrt(graft.functions.VectorKernels
        .squaredL2(v.toArray, query.toArray).toDouble).toFloat)
    }.sortBy { case (id, d) => (d, id) }.take(10)
    assert(res.map(r => (r.row_idx, r.distance)).toSet == expected.toSet)
  }

  test("search over the selective path honors maxCandidates fairness") {
    val dir = Files.createTempDirectory("graft-selfetch-search").toString
    val rnd = new scala.util.Random(5)
    spark.createDataFrame((0 until 200).map(i => (i.toLong, Seq.fill(4)(rnd.nextFloat()))))
      .toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
      .repartition(2).write.mode("overwrite").parquet(dir)
    val store = new IndexStore(Files.createTempDirectory("graft-selfetch-store").toString)
    val build = IvfBuilder.build(spark, dir,
      IvfBuilder.Config("vec", nClusters = Some(4)), store)
    val res = VectorTopK.search(spark, dir, "vec", Seq.fill(4)(0.5f), 50,
      VectorTopK.Options(nprobe = build.nClusters, maxCandidates = Some(40)),
      store = store).collect()
    // capped fetch bounds the result set: at most 40 candidates survive
    assert(res.length <= 40 && res.nonEmpty)
    assert(res.map(_.distance).toSeq == res.map(_.distance).sorted.toSeq)
  }
}
