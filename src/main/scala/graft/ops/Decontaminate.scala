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
    * with duplicates — callers dedup as needed). Empty array when the text
    * has fewer than n tokens (guard required: `sequence(0, negative)` would
    * generate a DESCENDING range).
    */
  def ngrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val ws = split(trim(text), "\\s+")
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n), i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct ids of documents sharing >= 1 word n-gram with `evalDocs`.
    *
    * @param hashGrams join on xxhash64(gram) (8 bytes) instead of the gram
    *                  string — the scale default; exact modulo 64-bit hash
    *                  collisions (~2^-64 per gram pair).
    */
  def contaminatedIds(
      docs: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 4,
      hashGrams: Boolean = true): DataFrame = {
    val docGrams = docs.select(col(idCol), explode(ngrams(col(textCol), n)).as("_g"))
    val evalGrams = evalDocs
      .select(explode(ngrams(col(textCol), n)).as("_g"))
      .distinct()
    val (dg, eg) =
      if (hashGrams)
        (docGrams.select(col(idCol), xxhash64(col("_g")).as("_g")),
          evalGrams.select(xxhash64(col("_g")).as("_g")))
      else (docGrams, evalGrams)
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
}
