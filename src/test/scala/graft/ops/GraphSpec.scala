package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // a 4-node graph with a hub, a dangling node, a parallel edge, and a
  // self-loop: a -> b (twice, collapses), a -> c, b -> c, c -> c, c -> d;
  // d dangles
  private val edges = Seq(
    ("a", "b"), ("a", "b"), ("a", "c"), ("b", "c"), ("c", "c"), ("c", "d")
  ).toDF("src", "dst")

  private def ranks(iters: Int): Map[String, Long] =
    Graph.pageRank(edges, "src", "dst", iters)
      .as[(String, Long)].collect().toMap

  test("pageRank iteration 0 is the uniform init; fixed point is exact") {
    val r0 = ranks(0)
    assert(r0 == Map("a" -> 250000000L, "b" -> 250000000L,
      "c" -> 250000000L, "d" -> 250000000L))
    // one hand-computed synchronous update (e9 integer arithmetic):
    // base = 150000000/4 = 37500000; deg a=2 b=1 c=2
    // share(a) = (85e7 * (25e7 div 2)) div 1e9 = 106250000
    // share(b) = (85e7 * 25e7) div 1e9 = 212500000
    // share(c) = 106250000; d contributes nothing (dangling)
    val r1 = ranks(1)
    assert(r1("a") == 37500000L) // no in-edges: teleport floor
    assert(r1("b") == 37500000L + 106250000L)
    assert(r1("c") == 37500000L + 106250000L + 212500000L + 106250000L)
    assert(r1("d") == 37500000L + 106250000L)
  }

  test("pageRank is deterministic and mass never exceeds the unit") {
    val a = ranks(4); val b = ranks(4)
    assert(a == b, "fixed-point ranks must be bit-identical across runs")
    assert(a.values.sum <= Graph.UnitE9,
      "dangling leak + rounding can only LOSE mass")
    assert(a.values.forall(_ >= 0))
    // the hub keeps outranking the teleport-floor node
    assert(a("c") > a("a"))
  }

  test("pageRank: empty edges, self-loop-only, validation") {
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    assert(Graph.pageRank(empty, "src", "dst", 3).count() == 0)
    val loop = Seq(("x", "x")).toDF("src", "dst")
    val r = Graph.pageRank(loop, "src", "dst", 2).as[(String, Long)].collect()
    assert(r.toSeq == Seq(("x",
      150000000L + (850000000L * ((150000000L + 850000000L) / 1)) / 1000000000L)))
    intercept[IllegalArgumentException](Graph.pageRank(edges, "src", "dst", -1))
    intercept[IllegalArgumentException](
      Graph.pageRank(edges, "src", "dst", 1, dampingE9 = 2000000000L))
  }

  test("degrees: distinct edges, zero-filled, null edges dropped") {
    val d = Graph.degrees(edges, "src", "dst")
      .as[(String, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(d == Map(
      "a" -> ((2L, 0L)), // parallel a->b collapsed
      "b" -> ((1L, 1L)),
      "c" -> ((2L, 3L)),
      "d" -> ((0L, 1L))))
    val withNull = Seq((Some("a"), None: Option[String])).toDF("src", "dst")
    assert(Graph.degrees(withNull, "src", "dst").count() == 0)
  }

  test("pageRank plan size stays bounded in iterations (checkpoint discipline)") {
    val p4 = Graph.pageRank(edges, "src", "dst", 4)
      .queryExecution.optimizedPlan.toString.length
    val p12 = Graph.pageRank(edges, "src", "dst", 12)
      .queryExecution.optimizedPlan.toString.length
    // localCheckpoint every 3 iterations cuts lineage: 12 iterations must
    // not plan ~3x larger than 4
    assert(p12 < p4 * 2, s"plan grew with iterations: $p4 -> $p12")
  }
}
