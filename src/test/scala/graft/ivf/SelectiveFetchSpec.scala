package graft.ivf

import java.nio.file.Files

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
