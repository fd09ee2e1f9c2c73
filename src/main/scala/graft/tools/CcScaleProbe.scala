package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Union-find cap boundary probe (round-12 verdict item #6):
  * `Dedup.connectedComponents` routes graphs of ≤ 2^20 edges to a
  * driver-side union-find (bit-identical labels, no per-round shuffle
  * scheduling) and larger graphs to the distributed min-label-propagation
  * loop. The LEXICAL pushdown cliff taught that every such routing cap
  * needs its step cost MEASURED, not assumed — this pins just-under vs
  * just-over behavior at a realistic near-dup graph shape (80% 2-node
  * components, 15% 5-node chains, 5% 50-node stars — mostly-tiny
  * components with a heavy tail, which is what dup-pair graphs look like),
  * and cross-checks that both paths label the just-over graph identically.
  *
  * Run manually, record in BENCHNOTES:
  * `sbt "runMain graft.tools.CcScaleProbe"`.
  */
object CcScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // component c: chains of 2 or 5 nodes, or a 50-node star; ids are
    // disjoint 64-blocks so components never merge by accident.
    // avg edges/component = (16*1 + 3*4 + 1*49)/20 = 3.85
    def graph(targetEdges: Long): DataFrame = {
      val comps = (targetEdges / 3.85).toLong
      spark.range(comps).flatMap { c =>
        val size = (c % 20) match {
          case x if x < 16 => 2
          case x if x < 19 => 5
          case _ => 50
        }
        val base = c * 64
        if (size == 50) (1 until size).map(j => (base, base + j))
        else (1 until size).map(j => (base + j - 1, base + j))
      }.toDF("doc_a", "doc_b").repartition(32)
    }

    // label checksum: path-independent component fingerprint
    def ccRun(pairs: DataFrame, cap: Int): (Long, Long, Double) = {
      val t0 = System.nanoTime()
      val labels = graft.ops.Dedup.connectedComponents(pairs, "doc_a", "doc_b", cap)
      val r = labels.agg(
        count(lit(1)).cast("long"),
        // 32-bit row hashes summed into a Long — overflow-free fingerprint
        sum(hash(col("doc_id"), col("cluster_id")).cast("long")).cast("long")).first()
      val dt = (System.nanoTime() - t0) / 1e9
      labels.unpersist(blocking = false): Unit
      (r.getLong(0), r.getLong(1), dt)
    }

    val cap = 1 << 20
    val out = Seq.newBuilder[String]
    out += "graph_edges\tpath\ttime_s\tnodes\tchecksum"
    Seq(
      ("just-under", (cap * 0.95).toLong, Seq(("local(default)", cap))),
      ("just-over", (cap * 1.25).toLong,
        Seq(("distributed(default)", cap), ("local(raised-cap)", Int.MaxValue - 1))))
      .foreach { case (tag, edges, runs) =>
        val g = graph(edges)
        val nEdges = g.count()
        runs.foreach { case (path, c) =>
          // warm once (page cache/codegen), then two timed runs, min
          ccRun(g, c)
          val (n1, s1, t1) = ccRun(g, c)
          val (n2, s2, t2) = ccRun(g, c)
          require(n1 == n2 && s1 == s2, s"nondeterministic labels on $tag/$path")
          out += f"$tag $nEdges%d\t$path\t${math.min(t1, t2)}%.2f\t$n1%d\t$s1%d"
        }
      }
    println("== CcScaleProbe ==")
    val lines = out.result()
    lines.foreach(println)
    // the two just-over rows must agree (local == distributed labels)
    val justOver = lines.filter(_.startsWith("just-over"))
    val sums = justOver.map(_.split("\t").last).distinct
    require(sums.size == 1, s"local and distributed labels diverge: $justOver")
    println("just-over: local == distributed labels OK")
    spark.stop()
  }
}
