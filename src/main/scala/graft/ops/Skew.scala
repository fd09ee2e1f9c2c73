package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins. AQE's skew-join split handles most
  * runtime skew; explicit salting remains the tool when a single hot key
  * floods one task and the other side is too large to broadcast (the
  * "one celebrity user" / "empty-string key" shape at corpus scale).
  */
object Skew {

  /** Salted equi-join: the big (skewed) side tags each row with a salt in
    * `[0, salts)`, the small side replicates every row once per salt, and
    * the join key becomes (key, salt) — a hot key's rows spread over
    * `salts` tasks instead of one straggler. Result-identical to the
    * plain join for inner/left joins (each big row still matches exactly
    * the rows it matched before, via exactly one salt). Costs a `salts`×
    * blow-up of the small side's shuffle — size `salts` to the observed
    * straggler ratio, not higher.
    *
    * The salt only spreads rows, so its values never affect the result;
    * a cheap deterministic spread (row id modulo salts) keeps runs
    * reproducible task-for-task.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // replication preserves multiplicity only for big-side-driven joins: a
    // right/full/cross join would emit one row per UNMATCHED salt replica
    require(
      Set("inner", "left", "leftouter").contains(
        joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got '$joinType' " +
        "(small-side replication corrupts right/full/cross multiplicities)")
    val saltedBig = big.withColumn(
      "_graft_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicatedSmall = small.withColumn(
      "_graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig
      .join(
        replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("_graft_salt") === replicatedSmall("_graft_salt"),
        joinType)
      .drop("_graft_salt")
  }
}
