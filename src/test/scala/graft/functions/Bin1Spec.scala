package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec

class Bin1Spec extends SparkSpec {
  import spark.implicits._

  test("bit rule: positive → 1, zero/negative/NaN → 0; LSB-first packing") {
    val codes = Bin1.encode(Array(0.5f, -0.5f, 0f, Float.NaN, 1e-30f, -0f))
    // bits: 1 0 0 0 1 0 → byte 0b00010001 = 0x11
    assert(codes.length == 1)
    assert(codes(0) == 0x11.toByte)
    assert(Bin1.bits(codes, 6).toSeq == Seq(1, 0, 0, 0, 1, 0))
  }

  test("codeLen and pad bits: dim not a multiple of 8 packs zeros beyond dim") {
    assert(Bin1.codeLen(1) == 1)
    assert(Bin1.codeLen(8) == 1)
    assert(Bin1.codeLen(9) == 2)
    assert(Bin1.codeLen(64) == 8)
    val a = Bin1.encode(Array.fill(9)(1f)) // 9 ones
    assert(a.length == 2)
    assert(a(0) == 0xff.toByte && a(1) == 0x01.toByte)
    // pad bits never contribute to hamming
    val b = Bin1.encode(Array.fill(9)(-1f))
    assert(Bin1.hamming(a, b) == 9L)
  }

  test("hamming matches naive bit-by-bit count across stride boundaries") {
    val rnd = new scala.util.Random(42)
    for (dim <- Seq(3, 8, 17, 64, 130)) {
      val x = Array.fill(dim)(rnd.nextFloat() - 0.5f)
      val y = Array.fill(dim)(rnd.nextFloat() - 0.5f)
      val naive = x.zip(y).count { case (a, b) => (a > 0f) != (b > 0f) }
      assert(Bin1.hamming(Bin1.encode(x), Bin1.encode(y)) == naive.toLong, s"dim=$dim")
    }
  }

  test("hamming is a metric on the fixture: identity, symmetry") {
    val a = Bin1.encode(Array(0.1f, -0.2f, 0.3f, -0.4f))
    val b = Bin1.encode(Array(-0.1f, 0.2f, 0.3f, 0.4f))
    assert(Bin1.hamming(a, a) == 0L)
    assert(Bin1.hamming(a, b) == Bin1.hamming(b, a))
  }

  test("codegen path: encode + hamming through a DataFrame") {
    val df = Seq(
      (1L, Seq(0.5f, -0.5f, 0.5f)),
      (2L, Seq(-0.5f, 0.5f, 0.5f))).toDF("id", "v")
    val out = df
      .select(
        col("id"),
        bin1_hamming(bin1_encode(col("v")), bin1_encode(col("v"))).as("self"),
        bin1_encode(col("v")).as("codes"))
      .orderBy("id")
      .collect()
    assert(out.forall(_.getLong(1) == 0L))
    assert(out(0).getAs[Array[Byte]](2).toSeq == Seq(0x05.toByte))
    assert(out(1).getAs[Array[Byte]](2).toSeq == Seq(0x06.toByte))
  }

  test("null vector and null element yield NULL; length mismatch NULLs hamming") {
    val schema = StructType(Seq(
      StructField("v", ArrayType(FloatType, containsNull = true), nullable = true)))
    val rows = Seq(Row(null), Row(Seq(0.1f, null)), Row(Seq(0.1f, 0.2f)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val nulls = df.select(bin1_encode(col("v"))).collect().map(_.isNullAt(0))
    assert(nulls.toSeq == Seq(true, true, false))

    val pair = Seq((Seq.fill(8)(1f), Seq.fill(9)(1f))).toDF("a", "b")
    assert(pair
      .select(bin1_hamming(bin1_encode(col("a")), bin1_encode(col("b"))))
      .head().isNullAt(0))
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val vec = Literal.create(Seq(0.5f, -0.5f, 0.5f), ArrayType(FloatType))
    val codes = Bin1Encode(vec).eval(null).asInstanceOf[Array[Byte]]
    assert(codes.toSeq == Seq(0x05.toByte))
    val d = Bin1Hamming(Literal(codes), Literal(Bin1.encode(Array(0f, 0f, 0f))))
      .eval(null).asInstanceOf[Long]
    assert(d == 2L)
  }

  test("SQL registration: bin1 functions usable from spark.sql") {
    val r = spark
      .sql("""SELECT bin1_hamming(
             |  bin1_encode(array(0.5F, -0.5F)), bin1_encode(array(-0.5F, -0.5F))) AS d
             |""".stripMargin)
      .head()
    assert(r.getLong(0) == 1L)
  }

  test("two-phase binTopK at covering oversample recovers the exact brute top-k") {
    val sfDir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = graft.Queries.queryVec
    val exact = emb
      .orderBy(
        array_distance(col("embedding"), float_vector(q)).asc_nulls_last,
        col("vec_id"))
      .limit(10).select("vec_id").as[Long].collect().toSet
    val n = emb.count().toInt
    val bin = graft.ops.Quantize
      .binTopK(emb, "vec_id", "embedding", q, 10, oversample = (n + 9) / 10)
      .select("vec_id").as[Long].collect()
    assert(bin.length == 10)
    assert(bin.toSet == exact)
  }

  test("binTopK at the ANN operating point: bounded survivors, sound output") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = graft.Queries.queryVec
    val res = graft.ops.Quantize
      .binTopK(emb, "vec_id", "embedding", q, 10, oversample = 16)
      .collect()
    assert(res.length == 10)
    // every returned row is a real corpus row (refine join is an inner join)
    val ids = res.map(_.getAs[Long]("vec_id")).toSet
    assert(ids.size == 10)
  }

  test("coarse ranking on a stored code column matches encode-on-the-fly") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val compressed = graft.ops.Quantize.binCompress(emb, "embedding")
    val stored = graft.ops.Quantize
      .binCoarseTopK(compressed, "vec_id", "bin1", graft.Queries.queryVec, 20)
      .as[(Long, Long)].collect().toSeq
    val fly = graft.ops.Quantize
      .binTopK(compressed, "vec_id", "embedding", graft.Queries.queryVec, 20,
        oversample = 1, codeCol = Some("bin1"))
      .select("vec_id").as[Long].collect().toSeq
    assert(stored.map(_._1).toSet == fly.toSet)
  }
}
