package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

import graft.SparkSpec

class ArrayDistanceSpec extends SparkSpec {
  import spark.implicits._

  test("array_distance computes Euclidean distance (codegen path)") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    val d = df.select(array_distance(col("a"), col("b"))).as[Float].head()
    assert(math.abs(d - math.sqrt(27.0)) < 1e-5)
    val sq = df.select(array_squared_l2(col("a"), col("b"))).as[Float].head()
    assert(math.abs(sq - 27.0f) < 1e-5)
  }

  test("null vector, null element, and dim mismatch all yield NULL") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType, containsNull = true), nullable = true),
      StructField("b", ArrayType(FloatType, containsNull = true), nullable = true)))
    val rows = Seq(
      Row(null, Seq(1f, 2f)), // null vector
      Row(Seq(1f, null), Seq(1f, 2f)), // null element
      Row(Seq(1f, 2f, 3f), Seq(1f, 2f)), // dim mismatch
      Row(Seq(1f, 2f), Seq(1f, 2f))) // ok
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val out = df.select(array_distance(col("a"), col("b"))).collect().map(_.isNullAt(0))
    assert(out.toSeq == Seq(true, true, true, false))
  }

  test("double arrays implicitly cast to float (reference f64→f32 coercion)") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val d = df.select(array_distance(col("a"), col("b"))).as[Float].head()
    assert(math.abs(d - math.sqrt(27.0)) < 1e-5)
  }

  test("SQL registration: array_distance usable from spark.sql") {
    val d = spark
      .sql("SELECT array_distance(array(1.0F, 2.0F, 3.0F), array(4.0F, 5.0F, 6.0F)) AS d")
      .as[Float].head()
    assert(math.abs(d - math.sqrt(27.0)) < 1e-5)
  }

  test("cosine similarity and dot product") {
    val df = Seq((Seq(1f, 0f), Seq(0f, 1f))).toDF("a", "b")
    assert(df.select(array_cosine_similarity(col("a"), col("b"))).as[Float].head() == 0f)
    assert(df.select(array_dot(col("a"), col("b"))).as[Float].head() == 0f)
    val same = Seq((Seq(3f, 4f), Seq(3f, 4f))).toDF("a", "b")
    assert(math.abs(
      same.select(array_cosine_similarity(col("a"), col("b"))).as[Float].head() - 1f) < 1e-6)
    assert(same.select(array_dot(col("a"), col("b"))).as[Float].head() == 25f)
  }

  test("interpreted eval matches codegen") {
    // force interpreted path via a filter on a literal expression tree
    val expr = ArrayDistance(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1f, 2f, 3f), ArrayType(FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(4f, 5f, 6f), ArrayType(FloatType)))
    val v = expr.eval(null).asInstanceOf[Float]
    assert(math.abs(v - math.sqrt(27.0)) < 1e-5)
  }

  test("cosine: interpreted eval is bit-equal to the codegen arithmetic") {
    // values where rounding each norm to FLOAT before multiplying (the old
    // eval form) can drift a last ulp from codegen's unrounded double-sqrt
    // product — the same expression must not depend on whether codegen ran
    val rnd = new scala.util.Random(3)
    val vecs = Seq.fill(200)(
      (Array.fill(37)(rnd.nextFloat() * 2 - 1), Array.fill(37)(rnd.nextFloat() * 2 - 1)))
    vecs.foreach { case (a, b) =>
      val expr = ArrayCosineSimilarity(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          a.toSeq, ArrayType(FloatType)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          b.toSeq, ArrayType(FloatType)))
      val interp = expr.eval(null).asInstanceOf[Float]
      // codegen reference arithmetic, spelled out
      var dot = 0.0f; var na = 0.0f; var nb = 0.0f
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val cg =
        if (na == 0.0f || nb == 0.0f) 0.0f
        else (dot / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))).toFloat
      assert(
        java.lang.Float.floatToRawIntBits(interp) == java.lang.Float.floatToRawIntBits(cg),
        s"eval $interp != codegen-arithmetic $cg")
    }
  }
}
