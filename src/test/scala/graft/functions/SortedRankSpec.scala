package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SortedRankSpec extends SparkSpec {
  import spark.implicits._

  test("sorted_rank equals the HOF boundary count, including the edges") {
    val rnd = new scala.util.Random(11)
    // duplicated boundaries model a skewed column's repeated quantiles
    val bounds = (Seq.fill(40)(rnd.nextInt(20).toDouble) ++ Seq(0.0, 0.0, 7.5))
      .sorted.toArray
    val values: Seq[java.lang.Double] =
      Seq.tabulate(200)(_ => java.lang.Double.valueOf(rnd.nextDouble() * 25 - 2)) ++
        bounds.map(java.lang.Double.valueOf).toSeq ++ // exact boundary hits
        Seq(null, java.lang.Double.valueOf(Double.NaN),
          java.lang.Double.valueOf(-0.0), java.lang.Double.valueOf(0.0),
          java.lang.Double.valueOf(Double.PositiveInfinity),
          java.lang.Double.valueOf(Double.NegativeInfinity))
    val df = values.toDF("v")
    val r = df.select(
      col("v"),
      sorted_rank(col("v"), bounds).as("k"),
      size(filter(typedLit(bounds.toSeq), b => b <= col("v"))).as("hof"))
      .collect()
    r.foreach { row =>
      if (row.isNullAt(0)) assert(row.isNullAt(1)) // null passes through
      else assert(row.getInt(1) == row.getInt(2),
        s"v=${row.get(0)}: kernel ${row.get(1)} vs hof ${row.get(2)}")
    }
    // ascending-bounds validation
    intercept[IllegalArgumentException](
      df.select(sorted_rank(col("v"), Array(2.0, 1.0))).collect())
  }
}
