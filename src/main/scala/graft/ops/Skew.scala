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
    * The salt only spreads rows, so its values never affect the result —
    * PROVIDED it is recomputation-stable: the salt feeds the shuffle
    * partitioning, and a salt derived from `monotonically_increasing_id`
    * (the original form) changes when a stage retry replays map tasks
    * whose shuffle-read input arrives in a different block order — first-
    * attempt and recomputed reducers then disagree on which partition
    * owns a row, and that row is lost or duplicated (the SPARK-23207
    * round-robin-repartition failure class; review r11). The salt is
    * therefore a CONTENT hash of the whole row: deterministic under any
    * retry and partitioning, and it spreads a hot key's rows as long as
    * they differ in any column. Fully IDENTICAL duplicate rows share a
    * salt and stay in one task — the one skew shape content salting
    * cannot spread (dedup such rows upstream; they carry no information).
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
    // right/full/cross join would emit one row per UNMATCHED salt replica.
    // left_semi/left_anti ARE big-side-driven (a key matches iff its single
    // salt replica matches), but they drop the small side's columns, so the
    // salted plan's output schema matches the plain join's there too.
    require(
      Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(
        joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti joins, got '$joinType' " +
        "(small-side replication corrupts right/full/cross multiplicities)")
    // the content hash feeds xxhash64, which rejects MapType at analysis
    // time (maps have no canonical element order to hash) — salt on the
    // hashable columns only, so wide passthrough schemas with map columns
    // keep working; two rows differing ONLY in map columns then share a
    // salt, which affects spread, never correctness (the salt is join key
    // padding, not data).
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val saltCols = big.schema.fields.filter(f => hashable(f.dataType))
      .map(_.name).sorted
    require(
      saltCols.nonEmpty,
      "saltedJoin needs at least one non-map column on the big side to " +
        "derive a retry-stable content salt; every column of the big side " +
        s"contains MapType (${big.schema.fields.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")})")
    val saltedBig = big.withColumn(
      "_graft_salt",
      pmod(xxhash64(saltCols.map(col): _*), lit(salts.toLong)).cast("int"))
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
