package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl curation: PageRank over the host/domain
  * graph ([[Html.extractLinks]] → [[Web.resolveUrl]] → [[Web.urlHost]] →
  * edges) is the standard spam/quality prior — a domain-level quality
  * weight for sampling ([[Corpus.weightedSample]]) and per-domain caps.
  *
  * FIXED-POINT integer arithmetic throughout (the engine's money-column
  * idiom): ranks are BIGINT e9 probabilities, per-source shares use
  * integer division, damping multiplies before an integer div by 1e9 —
  * every step is exact, order-independent, and reproduced bit-identically
  * by the DuckDB oracle's chained-CTE mirror (gq1). Floating-point
  * PageRank sums are order-DEPENDENT under parallel aggregation, which
  * would make the result nondeterministic run to run at cluster scale —
  * the fixed-point form is deterministic by construction.
  *
  * Semantic notes (all mirrored): parallel edges collapse (`distinct`),
  * self-loops count like any edge, dangling nodes (no outlinks) leak
  * their damped mass — total mass therefore decays toward the teleport
  * floor instead of being redistributed; rankings are unaffected for
  * curation purposes and the mirror stays one join simpler. Rounding
  * residue of the integer divisions also drops mass (≤ deg ppb per
  * node-iteration) — same in both engines.
  *
  * Scale shape (100 TB): per iteration, ONE shuffle pair — join ranks to
  * edges on `src` (co-partitioned if the edge table is bucketed by src;
  * AQE handles skewed hubs), then a map-side-combined `groupBy(dst)`.
  * Lineage is cut with `localCheckpoint` every `checkpointEvery`
  * iterations (the [[Dedup.connectedComponents]] discipline — plan size
  * stays O(1) in iterations).
  */
object Graph {

  /** Total probability mass / the fixed-point unit: ranks sum to ~1e9. */
  val UnitE9: Long = 1000000000L

  /** PageRank with `iterations` synchronous updates.
    *
    * @param edges     directed edge list; any column types castable to
    *                  string (hosts, domains, ids all work)
    * @param dampingE9 damping factor in e9 units (850000000 = the
    *                  canonical 0.85)
    * @return `(node, rank_e9)` — BIGINT e9 rank per distinct node
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      dampingE9: Long = 850000000L,
      checkpointEvery: Int = 3): DataFrame = {
    require(iterations >= 0, s"pageRank: iterations=$iterations must be >= 0")
    require(dampingE9 >= 0 && dampingE9 <= UnitE9,
      s"pageRank: dampingE9=$dampingE9 outside [0, $UnitE9]")
    require(checkpointEvery >= 1, "pageRank: checkpointEvery must be >= 1")
    val e = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      // the edge set is reused every iteration; one materialization
      // instead of `iterations` re-reads of the source plan
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("rank_e9", lit(0L))
    val init = UnitE9 / n
    val base = (UnitE9 - dampingE9) / n
    var rank = nodes.withColumn("rank_e9", lit(init))
    for (i <- 1 to iterations) {
      // per-source damped share, integer-exact:
      //   share = (dampingE9 * (rank div deg)) div 1e9
      // then summed per destination — every edge from one source carries
      // the same share, so compute it once per source before the edge join
      val perSrc = rank.withColumnRenamed("node", "src")
        .join(outdeg, Seq("src"))
        .select(col("src"),
          expr(s"($dampingE9 * (rank_e9 div deg)) div $UnitE9").as("share"))
      val contrib = e.join(perSrc, Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("share")).as("in_mass"))
      rank = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("in_mass"), lit(0L))).as("rank_e9"))
      if (i % checkpointEvery == 0 || i == iterations)
        rank = rank.localCheckpoint(true)
    }
    rank
  }

  /** In/out degree per node over the distinct edge set — the cheap prior
    * when a full [[pageRank]] is overkill. `(node, out_deg, in_deg)`,
    * zero-filled.
    */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val out = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out_deg"))
    val in = e.groupBy(col("dst").as("node")).agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
