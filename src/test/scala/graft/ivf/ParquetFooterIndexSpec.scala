package graft.ivf

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** In-place footer embedding: the reference's native index layout
  * (`/root/reference/src/ivf/parquet.rs:536-611`, unit parity with
  * `parquet.rs:613-661` — file grows, index re-readable, column/dim
  * round-trip, file stays valid parquet).
  */
class ParquetFooterIndexSpec extends SparkSpec {

  private def copyFixture(): String = {
    val dir = Files.createTempDirectory("graft-embed")
    val dst = dir.resolve("embeddings.parquet")
    Files.copy(
      Paths.get("/root/testdata/sf0.001/embeddings.parquet"), dst,
      StandardCopyOption.REPLACE_EXISTING)
    dst.toString
  }

  test("embed appends index, file re-readable by spark, index loadable") {
    val file = copyFixture()
    val before = Files.size(Paths.get(file))
    val beforeRows = spark.read.parquet(file).count()
    assert(!ParquetFooterIndex.hasIndex(file))

    val store = new IndexStore(Files.createTempDirectory("graft-noop").toString)
    IvfBuilder.build(spark, file,
      IvfBuilder.Config("embedding", nClusters = Some(8)), store, embed = true)

    val after = Files.size(Paths.get(file))
    assert(after > before) // index bytes appended
    assert(ParquetFooterIndex.hasIndex(file))
    val meta = ParquetFooterIndex.indexMetadata(file)
    assert(meta.exists(_._2 == "embedding"))
    val idx = ParquetFooterIndex.load(file, "embedding")
    assert(idx.isDefined)
    assert(idx.get.dim == 64 && idx.get.nClusters == 8)
    assert(idx.get.numRows == beforeRows)
    // the mutated file is still a fully readable parquet table
    val df = spark.read.parquet(file)
    assert(df.count() == beforeRows)
    assert(df.select(col("vec_id")).collect().length == beforeRows)
  }

  test("re-embedding reclaims the old index region (file does not grow)") {
    val file = copyFixture()
    val store = new IndexStore(Files.createTempDirectory("graft-noop2").toString)
    IvfBuilder.build(spark, file,
      IvfBuilder.Config("embedding", nClusters = Some(8)), store, embed = true)
    val once = Files.size(Paths.get(file))
    IvfBuilder.build(spark, file,
      IvfBuilder.Config("embedding", nClusters = Some(8)), store, embed = true)
    val twice = Files.size(Paths.get(file))
    assert(once == twice)
    assert(ParquetFooterIndex.load(file, "embedding").isDefined)
    assert(spark.read.parquet(file).count() == 500)
  }

  test("embedded index serves indexed search without any sidecar") {
    val file = copyFixture()
    val emptyStore = new IndexStore(Files.createTempDirectory("graft-empty2").toString)
    IvfBuilder.build(spark, file,
      IvfBuilder.Config("embedding", nClusters = Some(8)), emptyStore, embed = true)
    val query = graft.Queries.queryVec
    val indexed = VectorTopK
      .indexed(spark, file, "embedding", query, 5,
        VectorTopK.Options(nprobe = 8), store = emptyStore)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val brute = VectorTopK
      .bruteForce(spark.read.parquet(file), "embedding", query, 5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(indexed.sorted == brute.sorted)
  }

  test("rewrite mode: tuned pages + embedded index, search works end to end") {
    val src = copyFixture()
    val out = Files.createTempDirectory("graft-rewrite").toString + "/out"
    val build = IvfBuilder.rewriteWithIndex(
      spark, src, out, IvfBuilder.Config("embedding", nClusters = Some(8)),
      numFiles = Some(2))
    assert(build.files.size == 2)
    assert(build.numRows == 500)
    build.files.keys.foreach { f =>
      assert(ParquetFooterIndex.hasIndex(f), f)
    }
    val emptyStore = new IndexStore(Files.createTempDirectory("graft-e3").toString)
    val query = graft.Queries.queryVec
    val indexed = VectorTopK
      .indexed(spark, out, "embedding", query, 5,
        VectorTopK.Options(nprobe = 8), store = emptyStore)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val brute = VectorTopK
      .bruteForce(spark.read.parquet(out), "embedding", query, 5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(indexed.sorted == brute.sorted)
  }

  test("wrong column name yields no index") {
    val file = copyFixture()
    val store = new IndexStore(Files.createTempDirectory("graft-noop3").toString)
    IvfBuilder.build(spark, file,
      IvfBuilder.Config("embedding", nClusters = Some(4)), store, embed = true)
    assert(ParquetFooterIndex.load(file, "other_column").isEmpty)
  }
}
