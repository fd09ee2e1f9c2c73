package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, max}
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StreamingVectorTopKSpec extends SparkSpec {
  import spark.implicits._

  test("streaming top-k heap refines across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val stream = input.toDF().toDF("vec_id", "embedding")
    val topk = EventStreams
      .streamingVectorTopK(spark, stream, "vec_id", "embedding", Seq(0f, 0f), 2)
    val query = topk.writeStream
      .format("memory").queryName("svtk").outputMode(OutputMode.Append())
      .start()
    // batch 1: ids 1..3 at distances 1, 4, 9
    input.addData((1L, Seq(1f, 0f)), (2L, Seq(2f, 0f)), (3L, Seq(3f, 0f)))
    query.processAllAvailable()
    // batch 2: id 4 closer than everything; id 5 far
    input.addData((4L, Seq(0.1f, 0f)), (5L, Seq(9f, 9f)))
    query.processAllAvailable()
    query.stop()
    val sunk = spark.table("svtk")
    val lastBatch = sunk.agg(max(col("batch"))).head().getLong(0)
    val finalTop = sunk.where(col("batch") === lastBatch)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(finalTop == Seq(1L, 4L)) // heap kept id 1, admitted id 4, evicted 2
    val firstTop = sunk.where(col("batch") === 1L)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(firstTop == Seq(1L, 2L))
  }
}
