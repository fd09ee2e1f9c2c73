package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove training documents that share any word
  * n-gram with an evaluation corpus — the standard guard against test-set
  * leakage in LLM training pipelines (the 13-gram rule of GPT-3 appendix C /
  * Gopher §A2; n is a parameter here).
  *
  * Scale shape: the eval corpus is tiny next to 100 TB of training docs, so
  * its distinct gram set broadcasts; the training side is one projection
  * (gram explode) feeding a broadcast LEFT SEMI/ANTI join — no shuffle of
  * the training table. Grams travel as 8-byte xxhash64 values by default
  * instead of strings, shrinking both the broadcast and the probe side.
  */
object Decontaminate {

  /** All word n-grams of a whitespace-tokenized text column (space-joined,
    * duplicates kept) — the codegen'd [[graft.functions.word_ngrams]]
    * kernel; a `transform(sequence(...))` HOF formulation ran interpreted
    * and dominated gram-heavy queries 3x.
    */
  def ngrams(text: Column, n: Int): Column =
    graft.functions.word_ngrams(text, n)

  /** The shared gram extraction of both decontamination rules: per-doc
    * DISTINCT grams (the codegen'd shingle kernel — one pass, no
    * interpreted lambdas) exploded as `(idCol, _g)`, plus the eval side's
    * distinct gram set, both optionally xxhash64'd. ONE definition so the
    * binary (dc1) and graded (dc2) paths can never diverge on gram
    * semantics.
    */
  private def gramSides(
      docs: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      hashGrams: Boolean): (DataFrame, DataFrame) = {
    // n <= 0 would make the shingle kernel emit the "" gram for every
    // non-empty doc on BOTH sides — flagging the whole corpus as
    // contaminated with no error (review r11)
    require(n >= 1, s"gram size n must be >= 1, got $n")
    val docGrams = docs.select(
      col(idCol),
      explode(graft.functions.word_shingles(col(textCol), n)).as("_g"))
    val evalGrams = evalDocs
      .select(explode(graft.functions.word_shingles(col(textCol), n)).as("_g"))
    // hash BEFORE the eval-side distinct: dedup on the 8-byte hash keeps
    // the build side unique even across a 64-bit gram collision (which
    // would otherwise fan out the stats join and double-count), and the
    // dedup shuffle moves longs instead of gram strings (review r11)
    if (hashGrams)
      (docGrams.select(col(idCol), xxhash64(col("_g")).as("_g")),
        evalGrams.select(xxhash64(col("_g")).as("_g")).distinct())
    else (docGrams, evalGrams.distinct())
  }

  /** Distinct ids of documents sharing >= 1 word n-gram with `evalDocs`.
    *
    * @param hashGrams join on xxhash64(gram) (8 bytes) instead of the gram
    *                  string — the scale default; exact modulo 64-bit hash
    *                  collisions (~2^-64 per gram pair, and a collision can
    *                  only produce a spurious match, never a fan-out: the
    *                  eval side dedups AFTER hashing).
    */
  def contaminatedIds(
      docs: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 4,
      hashGrams: Boolean = true): DataFrame = {
    val (dg, eg) = gramSides(docs, evalDocs, idCol, textCol, n, hashGrams)
    dg.join(eg, Seq("_g"), "left_semi").select(idCol).distinct()
  }

  /** `docs` minus contaminated rows (broadcast anti-join on the id set). */
  def decontaminate(
      docs: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 4,
      hashGrams: Boolean = true): DataFrame =
    docs.join(
      contaminatedIds(docs, evalDocs, idCol, textCol, n, hashGrams),
      Seq(idCol), "left_anti")

  /** Per-document overlap FRACTION against the eval corpus — the graded
    * contamination signal behind threshold rules like PaLM's "≥70% of
    * 8-grams seen" (vs [[contaminatedIds]]' any-gram binary): one row per
    * document with ≥1 gram — `(idCol, matched_grams, total_grams, frac_r6)`
    * where the counts are over the doc's DISTINCT n-grams and `frac_r6 =
    * round(matched/total, 6)` (exact rational on identical integers — the
    * oracle-safe ratio idiom). Docs shorter than `n` words have no grams
    * and no row; [[decontaminateByOverlap]] treats them as 0 overlap.
    *
    * Scale shape: same as [[contaminatedIds]] — the eval gram set joins
    * the exploded training side (broadcast when stats say it fits, shuffle
    * when a huge eval corpus wouldn't — no forced hint, so an eval set
    * past the broadcast limit degrades to a working shuffle join instead
    * of failing) + per-doc agg (partial map-side); the corpus itself is
    * never shuffled on the broadcast path.
    */
  def overlapStats(
      docs: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 4,
      hashGrams: Boolean = true): DataFrame = {
    val (dg, eg) = gramSides(docs, evalDocs, idCol, textCol, n, hashGrams)
    dg.join(eg.withColumn("_hit", lit(1L)), Seq("_g"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("total_grams"),
        sum(coalesce(col("_hit"), lit(0L))).as("matched_grams"))
      .select(
        col(idCol),
        col("matched_grams"),
        col("total_grams"),
        round(col("matched_grams").cast("double") / col("total_grams"), 6)
          .as("frac_r6"))
  }

  /** `docs` minus rows whose eval-overlap fraction exceeds `maxFrac`
    * (gram-less short docs always survive). `maxFrac = 0.0` reproduces
    * [[decontaminate]]'s any-gram rule.
    */
  def decontaminateByOverlap(
      docs: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      maxFrac: Double,
      n: Int = 4,
      hashGrams: Boolean = true): DataFrame = {
    require(maxFrac >= 0.0 && maxFrac < 1.0, s"maxFrac=$maxFrac not in [0, 1)")
    val dropIds = overlapStats(docs, evalDocs, idCol, textCol, n, hashGrams)
      .where(col("matched_grams").cast("double") / col("total_grams") > maxFrac)
      .select(idCol)
    docs.join(dropIds, Seq(idCol), "left_anti")
  }

  /** SEMANTIC contamination: training rows whose embedding is within
    * cosine `threshold` of ANY eval embedding — the paraphrase-leakage
    * guard n-gram rules miss (reworded eval questions share no 8-grams but
    * sit next to the eval set in embedding space). Exact form: the eval
    * side broadcasts (eval sets are small next to a training corpus) into
    * a nested-loop SEMI join — |train| × |eval| cosine evaluations, the
    * right exact shape when eval is thousands of rows, and the form the
    * oracle gates (dc3).
    *
    * At 100 TB with a large eval set, generate candidates with the
    * existing index machinery instead: [[Similarity.ivfKnnJoin]] with the
    * eval side as queries (cell-bucketed equi-join candidates), filter
    * `cosine >= threshold`, anti-join the ids — the same
    * exact-at-exhaustive-probe trade documented there.
    */
  def semanticContaminatedIds(
      train: DataFrame,
      evalDf: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    require(threshold > -1.0 && threshold <= 1.0, s"threshold=$threshold not in (-1, 1]")
    train
      .join(
        broadcast(evalDf.select(col(vecCol).as("_evec"))),
        graft.functions.array_cosine_similarity(col(vecCol), col("_evec"))
          >= threshold,
        "left_semi")
      .select(idCol)
      .distinct()
  }

  /** `train` minus semantically contaminated rows. */
  def semanticDecontaminate(
      train: DataFrame,
      evalDf: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame =
    train.join(
      semanticContaminatedIds(train, evalDf, idCol, vecCol, threshold),
      Seq(idCol), "left_anti")
}
