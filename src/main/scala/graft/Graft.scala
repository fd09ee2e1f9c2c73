package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Engine installation: SQL functions + (as they land) optimizer rules.
  *
  * Two entry points, mirroring the reference's session integration
  * (`/root/reference/src/df_vector/session.rs:11-35`):
  *  - `Graft.install(spark)` — imperative, for an existing session;
  *  - `spark.sql.extensions=graft.GraftExtensions` — declarative.
  */
object Graft {
  def install(spark: SparkSession): SparkSession = {
    functions.registerAll(spark)
    plans.VectorTopKRule.install(spark)
    installStrategy(spark)
    spark
  }

  /** Planner strategy for the custom candidate-scan node (idempotent). */
  def installStrategy(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraStrategies
    if (!existing.contains(plans.GraftStrategy)) {
      spark.experimental.extraStrategies = existing :+ plans.GraftStrategy
    }
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.registry.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(s => plans.VectorTopKRule(s))
    ext.injectPlannerStrategy(_ => plans.GraftStrategy)
  }
}
