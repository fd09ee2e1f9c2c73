package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

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
}
