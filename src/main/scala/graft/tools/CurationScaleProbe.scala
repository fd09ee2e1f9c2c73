package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-pipeline composition probe (round-12 verdict item #3): the six
  * cq3_full_curation stages — train/eval split, exact dedup, n-gram
  * decontamination, heuristic+linear quality filter, mix-to-weights
  * sampling, stratified exact-k — COMPOSED over the 500k-doc TextScaleBench
  * corpus (1000× the 500-row fixture the oracle pins). The stages are
  * individually scale-probed (TextScaleBench, RankScaleProbe); what this
  * probe measures is the composition: where the stage boundaries land,
  * whether the plan collapses stages into shared exchanges, and what one
  * end-to-end pass costs when every stage's input is the previous stage's
  * un-materialized output (the production shape — nobody checkpoints
  * between filter stages of a curation run).
  *
  * Reported per stage as CUMULATIVE-PREFIX deltas: prefix_i = stages 1..i
  * composed and materialized from scratch, stage cost_i = t(prefix_i) -
  * t(prefix_{i-1}). Under lazy composition that delta IS the marginal cost
  * of adding the stage to the pipeline (including any recompute the
  * optimizer fails to share), which is the number a capacity planner needs.
  * The end-to-end figure is prefix_6 — one cold pass of the whole pipeline.
  *
  * NOT part of the per-round driver bench (minutes-long); run manually,
  * record in BENCHNOTES.md: `sbt "runMain graft.tools.CurationScaleProbe"`
  * (env: SPARK_GRAFT_TEXTSCALE_ROWS / _DIR size the corpus).
  */
object CurationScaleProbe {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = TextScaleBench.ensureCorpus(spark)
    def docs = spark.read.parquet(corpus)
    val rows = docs.count()

    // the six stages, same operators and parameters as cq3_full_curation
    // (Queries.scala cq3FullCuration) except k, which scales with the
    // corpus so the final stage selects real volume, not 5 rows
    val exactK = 2000
    def sTrain(d: DataFrame) = d.where(col("doc_id") % 50 =!= 0)
    def sEval(d: DataFrame) = d.where(col("doc_id") % 50 === 0)
    def sDedup(d: DataFrame) = d
      .groupBy(col("text"))
      .agg(
        min(col("doc_id")).as("doc_id"),
        min_by(col("lang"), col("doc_id")).as("lang"))
    def sDecontam(d: DataFrame) = graft.ops.Decontaminate
      .decontaminate(d, sEval(docs), "doc_id", "text", n = 4)
    def sQuality(d: DataFrame) = d.where(
      graft.ops.TextAnalysis.qualityKeep(col("text")) &&
        graft.ops.TextAnalysis.linearKeep(
          col("text"), graft.Queries.bowWeights, graft.Queries.bowBiasFp))
    def sMix(d: DataFrame) = graft.ops.Corpus
      .mixToWeights(d, col("doc_id"), col("lang"), graft.Queries.mixWeights)
    def sExactK(d: DataFrame) = graft.ops.Corpus
      .stratifiedExactK(d, col("doc_id"), col("lang"), exactK)
      .select(col("doc_id"), col("lang"))

    val stages: Seq[(String, DataFrame => DataFrame)] = Seq(
      "split(train)" -> (sTrain _),
      "exact-dedup" -> (sDedup _),
      "decontaminate(n=4)" -> (sDecontam _),
      "quality+linear" -> (sQuality _),
      s"mixToWeights" -> (sMix _),
      s"stratifiedExactK(k=$exactK)" -> (sExactK _))

    val out = Seq.newBuilder[String]
    out += s"corpus: $rows docs at $corpus (eval slice ${rows / 50} docs)"
    // one full warm-up pass first: prefix deltas must measure the STAGES,
    // not first-touch parquet footers / codegen compilation (the cold run
    // of prefix 1 otherwise absorbs the whole pipeline's warm-up and the
    // later deltas can go negative)
    val full = stages.foldLeft(docs) { case (d, (_, f)) => f(d) }
    full.count(): Unit
    var prev = 0.0
    var lastCount = 0L
    stages.indices.foreach { i =>
      val prefix = stages.take(i + 1).foldLeft(docs) { case (d, (_, f)) => f(d) }
      // min-of-2; every rep materializes the whole prefix from the parquet
      // source (no caching between prefixes), so the delta over the
      // previous prefix is the stage's marginal in-composition cost
      val t = Seq.fill(2)(graft.BenchTiming.time { lastCount = prefix.count() }).min
      out += f"after ${stages(i)._1}%-26s rows=$lastCount%8d cumulative=$t%7.2f s  stage=+${t - prev}%6.2f s"
      prev = t
    }
    out += f"end-to-end (all six stages, warm JVM): $prev%.2f s"

    // composition sanity: the executed plan's exchange count (string form —
    // AQE's final plan after execution; the logical collect() misses it).
    // Stage fusion means the filter stages (split/quality) ride the scans
    // and only the aggregation-shaped stages (dedup, decontam join, mix,
    // exact-k rank) introduce shuffles.
    val planStr = full.queryExecution.executedPlan.toString
    val exchanges = "Exchange (hash|range|Single)".r.findAllIn(planStr).size
    val broadcasts = "BroadcastExchange".r.findAllIn(planStr).size
    val reused = "ReusedExchange".r.findAllIn(planStr).size
    out += s"composed physical plan: $exchanges shuffle exchanges ($reused reused), $broadcasts broadcast exchanges"

    println("== CurationScaleProbe ==")
    out.result().foreach(println)
    spark.stop()
  }
}
