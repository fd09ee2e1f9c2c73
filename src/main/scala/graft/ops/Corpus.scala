package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for training-data pipelines: deterministic
  * splits, sequence packing, and distribution stats. All are pure
  * DataFrame transforms over codegen'd built-ins — no UDFs, no driver
  * loops — designed to run unchanged over a sharded 100 TB corpus.
  */
object Corpus {

  /** Deterministic content-hash train/val/test split.
    *
    * The split key is the first two hex chars of md5 over the NORMALIZED
    * text (the [[TextAnalysis.fingerprint]] key), giving 256 stable buckets:
    *  - content-based, so the assignment survives re-sharding, re-ordering,
    *    and id reassignment (id-based splits leak when ids shuffle);
    *  - fingerprint-based, so exact/format-noise duplicates land in the
    *    SAME split — no train/test leakage through duplicated documents;
    *  - engine-portable (md5 is bit-identical everywhere), so the split is
    *    reproducible outside Spark.
    *
    * `trainBuckets`/`valBuckets` partition the 256 buckets as
    * [0, train) → train, [train, train+val) → val, rest → test.
    */
  /** In-plan non-null guard for the exact-rank machinery's key columns:
    * a null score/id would otherwise either NPE in the boundary-extraction
    * pass (Row.getDouble on null) or silently rank nulls first and break
    * the EXACT-k contract (review r11). raise_error fires at the first
    * offending row — no extra pass.
    */
  private def requireNotNull(c: Column, what: String): Column =
    when(c.isNull, raise_error(lit(
      s"$what must be non-null (and castable) for every row"))).otherwise(c)

  def hashSplit(
      textCol: String,
      trainBuckets: Int = 204, // ~80%
      valBuckets: Int = 26): Column = {
    require(trainBuckets > 0 && valBuckets >= 0, "bucket counts must be positive")
    require(trainBuckets + valBuckets <= 256, "train+val buckets exceed 256")
    val bucket = conv(substring(TextAnalysis.fingerprint(col(textCol)), 1, 2), 16, 10)
      .cast("int")
    when(bucket < trainBuckets, "train")
      .when(bucket < trainBuckets + valBuckets, "val")
      .otherwise("test")
  }

  /** Leakage-safe train/val/test split: NEAR-duplicate documents must not
    * straddle split boundaries (a val doc whose near-dup sits in train is
    * contamination [[hashSplit]]'s content hash only catches EXACT dups).
    * Near-dup clusters come from [[Dedup.connectedComponents]] over any
    * candidate pair set (minhash, simhash, embedding — caller's choice);
    * every member of a cluster splits by the CLUSTER id, singletons by
    * their own id, through the same md5-bucket rule as [[hashSplit]] so
    * fractions stay ~train/val/test and assignment is engine-reproducible.
    * Scale shape: CC (sparse pair graph, O(log diameter) rounds) + one
    * left join of the corpus against the O(dup-cluster-members) label
    * table — broadcastable in practice, shuffle-bounded otherwise.
    */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String = "doc_a",
      bCol: String = "doc_b",
      trainBuckets: Int = 204,
      valBuckets: Int = 26): DataFrame = {
    require(trainBuckets > 0 && valBuckets >= 0, "bucket counts must be positive")
    require(trainBuckets + valBuckets <= 256, "train+val buckets exceed 256")
    val labels = Dedup.connectedComponents(pairs, aCol, bCol)
      .select(col("doc_id").as("_lss_id"), col("cluster_id").as("_lss_cluster"))
    // singletons key by the STRING form of their id (a UUID/string id cast
    // to long is null, which used to md5 to null and route every such doc
    // to "test" — review r11); numeric ids render identically ("123"), so
    // long-id corpora keep their exact historical buckets
    val key = coalesce(
      col("_lss_cluster").cast("string"),
      requireNotNull(col(idCol), s"leakageSafeSplit: id column '$idCol'")
        .cast("string"))
    val bucket = hashBucket(key)
    df.join(labels, col(idCol) === col("_lss_id"), "left")
      .select(df.columns.map(col) :+
        when(bucket < trainBuckets, "train")
          .when(bucket < trainBuckets + valBuckets, "val")
          .otherwise("test").as("split"): _*)
  }

  /** Greedy sequence packing by cumulative token budget: documents are
    * chunked, in id order, into packs of ~`budget` tokens (a document whose
    * tokens straddle a boundary starts the next pack's budget — the
    * standard cheap approximation of bin packing for context-window
    * filling).
    *
    * Packing is per-shard (`idCol div shardSize`), so the window never
    * globally orders the corpus: each shard packs independently in one
    * partition-local pass and pack ids are globally unique as
    * `shard * packsPerShardCap + local pack`. At 100 TB, shards map to the
    * natural write partitioning and the window shuffle is by shard key.
    */
  def packByBudget(
      df: DataFrame,
      idCol: String,
      tokensCol: Column,
      budget: Long,
      shardSize: Long = 1000L,
      packsPerShardCap: Long = 1000000L): DataFrame = {
    require(budget > 0 && shardSize > 0, "budget and shardSize must be positive")
    require(packsPerShardCap > 0, s"packsPerShardCap must be positive, got $packsPerShardCap")
    val shard = (col(idCol) / shardSize).cast("bigint")
    val w = Window.partitionBy(shard).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val localPack = floor(col("_prev") / budget)
    df.withColumn("_tok", tokensCol)
      .withColumn("_prev", coalesce(sum(col("_tok")).over(w), lit(0L)))
      .withColumn(
        "pack_id",
        // a shard needing more than the cap's packs would silently collide
        // into the next shard's id range (review r11) — fail loudly instead
        when(localPack >= packsPerShardCap, raise_error(lit(
          s"packByBudget: a shard exceeded packsPerShardCap=$packsPerShardCap " +
            "packs — raise the cap or shrink shardSize")))
          .otherwise((shard * packsPerShardCap + localPack).cast("bigint")))
      .drop("_tok", "_prev")
  }

  /** 256-bucket deterministic hash of a key column (first md5 byte) — the
    * engine-portable sampling/splitting primitive (md5 is bit-identical in
    * every engine, so a sample drawn here reproduces in DuckDB/Trino/etc.).
    */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 2), 16, 10).cast("int")

  /** Deterministic stratified downsampling: keep a row iff its key's
    * [[hashBucket]] falls below the stratum's bucket allowance
    * (buckets/256 = sampling rate). Content/id-hash based, not `rand()` —
    * re-runs, re-shards, and other engines reproduce the exact sample; no
    * shuffle, a pure filter pushed to the scan.
    *
    * @param bucketsByStratum per-stratum allowance in [0, 256]
    *                         (e.g. "en" -> 128 keeps ~50% of English docs)
    * @param defaultBuckets   allowance for strata not in the map
    */
  def stratifiedSample(
      df: DataFrame,
      keyCol: Column,
      strataCol: Column,
      bucketsByStratum: Map[String, Int],
      defaultBuckets: Int): DataFrame = {
    (defaultBuckets +: bucketsByStratum.values.toSeq).foreach(b =>
      require(b >= 0 && b <= 256, s"bucket allowance must be in [0,256], got $b"))
    val allowance = bucketsByStratum.foldLeft(lit(defaultBuckets)) {
      case (acc, (stratum, buckets)) =>
        when(strataCol === stratum, lit(buckets)).otherwise(acc)
    }
    df.where(hashBucket(keyCol) < allowance)
  }

  /** Deterministic EXACT-k per-stratum sample: the k rows of each stratum
    * whose (md5(key), key) order is smallest — a content-addressed draw, so
    * membership is reproducible across engines, runs, and partitionings
    * (the eval-set construction shape: "exactly 1000 docs per language,
    * stable under corpus append ONLY for strata whose selected prefix is
    * untouched"). Strata with fewer than k rows keep everything.
    *
    * Scale shape: one hash-partitioned window sort per stratum (the price
    * of EXACT k; row_number needs a stratum order). For proportional
    * sampling without the sort, use [[stratifiedSample]] /
    * [[mixToWeights]] — this operator is for small-k draws where exactness
    * matters, and k rows per stratum is the output bound.
    */
  def stratifiedExactK(
      df: DataFrame,
      keyCol: Column,
      strataCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"stratifiedExactK: k=$k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCol)
      .orderBy(md5(keyCol.cast("string")), keyCol)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .drop("_rn")
  }

  /** Group-wise top-k selection: the k rows of each group with the LARGEST
    * `scoreCol`, ties broken by ascending `keyCol` — "keep the best k
    * documents per source/domain by quality score", the score-ordered twin
    * of [[stratifiedExactK]] (same one-window-sort-per-group shape and the
    * same determinism argument: total order ⇒ identical draw under any
    * partitioning).
    */
  def topKByGroup(
      df: DataFrame,
      groupCol: Column,
      scoreCol: Column,
      keyCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"topKByGroup: k=$k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(scoreCol.desc, keyCol.asc)
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= k)
      .drop("_rn")
  }

  /** Dominance cap (the web-curation anti-dominance rule, cf. per-domain
    * caps in RefinedWeb-style pipelines): no group may exceed `maxShare`
    * of the TOTAL corpus. Groups over the budget are downsampled to
    * exactly `floor(maxShare · total)` rows by the deterministic md5-order
    * draw (same total-order argument as [[stratifiedExactK]]: identical
    * membership under any partitioning); groups under the budget pass
    * through UNTOUCHED — unlike [[mixToWeights]], which rebalances every
    * stratum toward a target mix, this only cuts over-represented groups.
    *
    * Scale shape: one groupBy over the group column (|groups| rows) + a
    * 1-row total, broadcast of the overweight-groups-only budget table,
    * then a single window sort restricted to rows of OVERWEIGHT groups
    * (the under-cap majority of a skewed corpus takes the broadcast
    * anti-join fork and is never shuffled); one dominant group's window
    * partition is the largest sort, bounded by that group's own rows.
    */
  def capGroupShare(
      df: DataFrame,
      keyCol: Column,
      groupCol: Column,
      maxShare: Double): DataFrame = {
    require(
      maxShare > 0 && maxShare <= 1,
      s"capGroupShare: maxShare=$maxShare must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(groupCol.as("_g")).agg(count(lit(1)).as("_c"))
    val total = counts.agg(sum(col("_c")).as("_total"))
    val overweight = counts
      .crossJoin(broadcast(total))
      .select(
        col("_g"),
        greatest(floor(lit(maxShare) * col("_total")), lit(1L))
          .cast("bigint").as("_budget"),
        col("_c"))
      .where(col("_c") > col("_budget"))
      .select(col("_g"), col("_budget"))
    val w = Window.partitionBy(col("_g"))
      .orderBy(md5(keyCol.cast("string")), keyCol)
    val keptOver = df
      .join(broadcast(overweight), groupCol <=> col("_g"))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= col("_budget"))
      .drop("_g", "_budget", "_rn")
    // null-safe joins: a null group (missing domain) is a group like any
    // other — plain === is null for it, which routed every null-group row
    // through the anti-join fork UNCAPPED (review r11)
    val under = df.join(
      broadcast(overweight.select(col("_g"))), groupCol <=> col("_g"), "left_anti")
    under.unionByName(keptOver)
  }

  /** Deterministic mixture resampling: downsample strata so the realized
    * proportions approximate `weights` (a training-mixture rebalance, e.g.
    * "40% en / 20% de / …"). No stratum is upsampled: the output total is
    * maximized subject to every stratum being a downsample — the budget is
    * `T = min_s count_s / w_s` and stratum `s` keeps `floor(256 · w_s ·
    * T / count_s)` of the 256 [[hashBucket]] buckets, floored at 1 bucket
    * (so realized weights sit within 1/256 of the smallest stratum's share
    * under the target, and a stratum >256× over-represented keeps ~1/256
    * of its rows instead of silently vanishing; exact-deterministic
    * membership, approximate proportions). Strata
    * absent from `weights` are dropped; strata in `weights` but absent
    * from the data simply contribute nothing (their target share is
    * unachievable without upsampling — callers wanting repetition-based
    * upsampling should union extra epochs explicitly).
    *
    * Scale shape: one groupBy over the stratum column (|strata| rows), a
    * 1-row budget aggregate, and a broadcast join of the |strata|-row
    * allowance table back onto the corpus — the corpus itself is never
    * shuffled, and membership is a pure filter.
    */
  /** Temperature-based mixture weights — the multilingual-sampling
    * standard (UNIMAX/mT5 style): stratum weight ∝ count^alpha, so
    * `alpha = 1` preserves the natural mix, `alpha → 0` flattens toward
    * uniform, and `alpha = 0.5` (the common default) upsamples tails
    * without drowning heads. Weights are returned UN-normalized —
    * [[mixToWeights]]' budget rule is scale-invariant in the weights, and
    * skipping the normalizing sum keeps the values bit-reproducible in
    * SQL (IEEE sqrt is correctly rounded everywhere; a float SUM's order
    * is not). One exact count aggregate; O(|strata|) to the driver.
    */
  def temperatureWeights(
      df: DataFrame,
      strataCol: Column,
      alpha: Double = 0.5): Map[String, Double] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    // cast to string in the aggregate: the signature accepts any Column, and
    // getString on a non-string stratum would ClassCastException (round-10
    // advice item); null strata have no weighable identity — fail loudly
    df.groupBy(strataCol.cast("string").as("_s")).agg(count(lit(1)).as("_c"))
      .collect()
      .map { r =>
        require(!r.isNullAt(0),
          "temperatureWeights: null stratum value — filter or fill the strata column first")
        val c = r.getLong(1).toDouble
        val w =
          if (alpha == 0.5) math.sqrt(c) // correctly-rounded everywhere
          else if (alpha == 1.0) c
          else math.pow(c, alpha) // pow is NOT guaranteed correctly rounded —
                                  // cross-engine gates should stick to 0.5/1
        r.getString(0) -> w
      }
      .toMap
  }

  /** Shared by [[mixToWeights]]/[[epochsToWeights]]: validate the weight
    * map and return the per-stratum `(_s, _c, _w)` counts frame (strata
    * absent from `weights` filtered out). Extracted so null-handling or
    * validation fixes cannot drift between the two mixture operators
    * (review r11: the block was duplicated verbatim).
    */
  private def weightedStratumCounts(
      df: DataFrame,
      strataCol: Column,
      weights: Map[String, Double],
      what: String): DataFrame = {
    require(weights.nonEmpty, s"$what: empty weights")
    weights.foreach { case (st, w) =>
      require(w > 0 && !w.isInfinite && !w.isNaN,
        s"$what: weight for '$st' must be finite positive, got $w")
    }
    val entries = weights.toSeq.sortBy(_._1) // deterministic plan
    def weightOf(c: Column): Column = entries.tail
      .foldLeft(when(c === entries.head._1, lit(entries.head._2))) {
        case (acc, (k, w)) => acc.when(c === k, lit(w))
      } // null for unlisted strata
    df.select(strataCol.as("_s"))
      .where(weightOf(col("_s")).isNotNull)
      .groupBy(col("_s"))
      .agg(count(lit(1)).as("_c"))
      .withColumn("_w", weightOf(col("_s")))
  }

  def mixToWeights(
      df: DataFrame,
      keyCol: Column,
      strataCol: Column,
      weights: Map[String, Double]): DataFrame = {
    val counts = weightedStratumCounts(df, strataCol, weights, "mixToWeights")
    val budget = counts.agg(min(col("_c") / col("_w")).as("_t"))
    val allowance = counts
      .crossJoin(broadcast(budget))
      .select(
        col("_s"),
        // floored at 1 bucket: a stratum >256× over-represented relative to
        // its target would otherwise round to allowance 0 and silently
        // vanish — a cliff past the documented 1/256 granularity. Keeping
        // ≥1/256 over-keeps such a stratum (~1/256 instead of <1/256); the
        // alternative (dropping it entirely) contradicts a positive weight.
        greatest(floor(col("_w") * col("_t") / col("_c") * 256), lit(1L))
          .cast("int").as("_allow"))
    df.join(broadcast(allowance), strataCol === col("_s"))
      .where(hashBucket(keyCol) < col("_allow"))
      .drop("_s", "_allow")
  }

  /** Deterministic per-row weighted sampling: keep each row with
    * probability ~`weightCol` (clamped to [0, 1], 1/256 granularity via
    * [[hashBucket]]) — the "soft quality filter" (keep high-quality docs
    * always, low-quality ones proportionally) that replaces a hard
    * threshold cliff with a graded keep rate. Content-hash based, not
    * `rand()`: membership is exact-deterministic and reproduces in any
    * engine, re-run, or partitioning. A pure codegen'd filter — no
    * shuffle, composes with any scan at any scale.
    */
  def weightedSample(df: DataFrame, keyCol: Column, weightCol: Column): DataFrame =
    df.where(
      hashBucket(keyCol) <
        least(greatest(weightCol.cast("double"), lit(0.0)), lit(1.0)) * 256)

  /** Deterministic global shuffle for training-data sharding: assigns every
    * row a `(shard, pos)` — shard by a seeded md5 of the key, position by
    * md5 order within the shard — so the corpus reads back in a fixed
    * pseudo-random order that is reproducible across runs, partitionings,
    * and engines (pretraining's "shuffle once, then stream" step; `seed`
    * gives a fresh permutation per epoch without touching the data).
    *
    * This is the ONE operator in the module that intentionally performs a
    * full-corpus shuffle — that is its job. Scale shape: `shards` bounds
    * each window sort to `n / shards` rows (shards map to output files; at
    * 100 TB pick shards so a shard's keys fit an executor's sort spill
    * budget), and the sort key is the 128-bit md5, so placement is uniform
    * regardless of input skew. Writers consume it as
    * `.repartition(col("shard")).sortWithinPartitions("pos")`.
    */
  def globalShuffle(
      df: DataFrame,
      keyCol: Column,
      shards: Int,
      seed: String = ""): DataFrame = {
    require(shards >= 1, s"globalShuffle: shards=$shards must be >= 1")
    Seq("shard", "pos").foreach(c =>
      require(!df.columns.contains(c),
        s"globalShuffle: input already has a '$c' column — rename it first " +
          "(the operator's output contract adds shard/pos)"))
    val h = md5(concat(lit(seed), keyCol.cast("string")))
    val shard = pmod(conv(substring(h, 1, 8), 16, 10).cast("bigint"), lit(shards))
      .cast("int")
    val w = Window.partitionBy(col("shard")).orderBy(h, keyCol)
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("bigint"))
  }

  /** Repetition-based UPSAMPLING to target mixture weights — the
    * complement of [[mixToWeights]] (which only downsamples): every doc is
    * emitted `epochs` times so the realized stratum proportions approach
    * `weights` with NO document dropped (the data-constrained mixture
    * recipe: repeat the under-represented strata rather than cut the
    * over-represented ones). The budget is `T = max_s count_s / w_s`, so
    * the most over-represented stratum runs one epoch and stratum `s`
    * repeats `r_s = w_s · T / count_s ≥ 1` times: `floor(r_s)` full epochs
    * for every doc, plus one extra epoch for the deterministic
    * [[hashBucket]] draw of the fractional remainder (1/256 granularity,
    * same engine-reproducibility argument as [[mixToWeights]]).
    *
    * Output: the input columns plus `epoch` (0-based). Strata absent from
    * `weights` are dropped; training consumers interleave epochs via
    * [[globalShuffle]] over `(key, epoch)`.
    *
    * Scale shape: one groupBy over the stratum column (|strata| rows), a
    * 1-row budget aggregate, a broadcast plan join, and a projection-only
    * explode — the corpus is never shuffled, and output size is
    * `Σ c_s · r_s ≈ T` rows by construction.
    */
  def epochsToWeights(
      df: DataFrame,
      keyCol: Column,
      strataCol: Column,
      weights: Map[String, Double]): DataFrame = {
    require(!df.columns.contains("epoch"),
      "epochsToWeights: input already has an 'epoch' column — rename it " +
        "first (the operator's output contract adds epoch)")
    val counts = weightedStratumCounts(df, strataCol, weights, "epochsToWeights")
    val budget = counts.agg(max(col("_c") / col("_w")).as("_t"))
    val r = col("_w") * col("_t") / col("_c")
    // greatest(…, 1): r_s ≥ 1 mathematically; the clamp guards the max
    // stratum against a last-ulp 0.999… from double rounding. The
    // fractional allowance is taken against the SAME clamped base (and
    // floored at 0), so a clamped stratum draws no extra epoch — computing
    // it from the raw floor(r) would hand a 0.999…-rounded stratum a
    // ~255/256 extra-epoch draw (≈2× its contracted single epoch).
    val base = greatest(floor(r), lit(1L))
    val plan = counts
      .crossJoin(broadcast(budget))
      .select(
        col("_s"),
        base.cast("bigint").as("_e"),
        greatest(floor((r - base) * 256), lit(0L)).cast("int").as("_allow"))
    df.join(broadcast(plan), strataCol === col("_s"))
      .withColumn(
        "epoch",
        explode(sequence(
          lit(0L),
          col("_e") - 1 + when(hashBucket(keyCol) < col("_allow"), 1L)
            .otherwise(0L))))
      .drop("_s", "_e", "_allow")
  }

  /** Cross-table integrity audit — the pipeline-consistency gate run
    * between stages (documents ↔ embeddings, corpus ↔ index rows,
    * postings ↔ docs): one row of exact counts answering "do these two
    * tables agree on keys?". `left_orphans`/`right_orphans` count DISTINCT
    * keys present on one side only; `dup_left_keys`/`dup_right_keys`
    * count keys appearing more than once on their side (a join fan-out
    * hazard). Null keys count as orphans on their own side (they join
    * nothing).
    *
    * Plan shape: one groupBy per side on the key (map-side combined),
    * then a full outer join of the two |distinct-keys| aggregates and a
    * 1-row fold — shuffle-bounded by distinct key counts, no broadcast
    * assumption, safe at any scale.
    */
  def integrityReport(
      left: DataFrame,
      leftKey: Column,
      right: DataFrame,
      rightKey: Column): DataFrame = {
    val l = left.groupBy(leftKey.as("_k")).agg(count(lit(1)).as("_ln"))
    val r = right.groupBy(rightKey.as("_k")).agg(count(lit(1)).as("_rn"))
    l.join(r, Seq("_k"), "full_outer")
      .agg(
        coalesce(sum(col("_ln")), lit(0L)).cast("bigint").as("n_left"),
        coalesce(sum(col("_rn")), lit(0L)).cast("bigint").as("n_right"),
        count(when(col("_rn").isNull, 1)).cast("bigint").as("left_orphans"),
        count(when(col("_ln").isNull, 1)).cast("bigint").as("right_orphans"),
        count(when(col("_ln") > 1, 1)).cast("bigint").as("dup_left_keys"),
        count(when(col("_rn") > 1, 1)).cast("bigint").as("dup_right_keys"))
  }

  /** Diff two corpus snapshots by key + content: one row per key whose
    * membership or content changed — `added` (key only in `newDf`),
    * `removed` (only in `oldDf`), `changed` (both sides, different
    * content) — the audit primitive between pipeline versions or crawl
    * epochs. Unchanged keys are NOT emitted (at 100 TB the diff must be
    * proportional to the CHANGE, not the corpus).
    *
    * Per-key content signature: md5 over the comma-joined SORTED md5s of
    * the key's content values — multiset-exact (duplicate keys compare as
    * a bag: different copy counts concatenate different block counts, so
    * signatures differ), order-insensitive, and engine-portable (md5 is
    * bit-identical everywhere, so the diff is reproducible outside Spark).
    *
    * Plan shape: one map-side-combined groupBy per side, then a full
    * outer join of the two |distinct-keys| aggregates — shuffle bounded
    * by distinct keys, content strings leave the map side only as 32-char
    * hashes.
    */
  def diffSnapshots(
      oldDf: DataFrame,
      oldKey: Column,
      oldContent: Column,
      newDf: DataFrame,
      newKey: Column,
      newContent: Column): DataFrame = {
    def sig(df: DataFrame, k: Column, c: Column, sigName: String) =
      df.groupBy(k.as("_k"))
        .agg(md5(concat_ws(",", sort_array(collect_list(md5(c.cast("string"))))))
          .as(sigName))
    val l = sig(oldDf, oldKey, oldContent, "_ls")
    val r = sig(newDf, newKey, newContent, "_rs")
    l.join(r, Seq("_k"), "full_outer")
      .withColumn(
        "status",
        when(col("_rs").isNull, "removed")
          .when(col("_ls").isNull, "added")
          .when(col("_ls") =!= col("_rs"), "changed"))
      .where(col("status").isNotNull)
      .select(col("_k").as("key"), col("status"))
  }

  /** Ordered per-key sequence assembly — the grouping primitive that turns
    * row-per-event tables into model-ready sequences (multi-turn
    * conversation assembly, per-user behavior sequences, per-document
    * chunk reassembly). Per `keyCol`, the first `maxLen` values of
    * `valueCol` in `(orderCols, then value)` order, as an array plus its
    * length. `maxLen` is applied BEFORE aggregation (a window row-number
    * cap), so a pathological hot key bounds the aggregation buffer and
    * the output row width at `maxLen` instead of materializing millions
    * of events in one collect_list buffer — the difference between
    * surviving and OOMing on a bot account at 100 TB. One hash shuffle on
    * the key: the window's sort is per-partition spill-safe, and the
    * groupBy reuses the window's partitioning (no second exchange).
    * Deterministic when `orderCols` + value are a per-key total order —
    * ties beyond that break on the value itself (sort_array over the
    * rank-keyed structs).
    */
  def assembleSequences(
      df: DataFrame,
      keyCol: Column,
      orderCols: Seq[Column],
      valueCol: Column,
      maxLen: Int): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    val w = Window.partitionBy(keyCol).orderBy(orderCols :+ valueCol: _*)
    // group on the RAW key expression (an alias here would defeat the
    // window-partitioning reuse and buy a second exchange); rename after
    val grouped = df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= maxLen)
      .groupBy(keyCol)
      .agg(
        transform(
          sort_array(collect_list(struct(col("_rn").as("r"), valueCol.as("v")))),
          x => x.getField("v")).as("seq"))
    grouped
      .withColumnRenamed(grouped.columns.head, "key")
      .withColumn("n", size(col("seq")).cast("int"))
  }

  /** CDC-style MERGE: apply an update batch onto a base snapshot by key —
    * the maintenance primitive that keeps a curated corpus current between
    * full rebuilds (crawl refreshes, takedown/deletion requests, re-scored
    * documents). Per key, the update wins over the base row; an update
    * flagged in `tombstoneCol` (if given) DELETES the key; keys untouched
    * by the batch pass through. When a batch carries SEVERAL ops for one
    * key, `seqCol` must be given and the highest sequence wins (the SQL
    * MERGE multiple-match rule, resolved deterministically instead of
    * erroring); without `seqCol`, update keys are assumed unique — the
    * caller's CDC feed contract.
    *
    * Plan shape: (optional) per-key latest-op window over the UPDATE batch
    * (shuffles the batch, never the base), then one left-anti join of the
    * base against the batch's distinct keys + a union of the surviving
    * upserts — base rows shuffle once on the key (or not at all when the
    * batch broadcasts, the common case: batches are days, bases are
    * years). Nothing corpus-sized aggregates or sorts globally.
    */
  def mergeUpsert(
      base: DataFrame,
      updates: DataFrame,
      keyCol: String,
      seqCol: Option[String] = None,
      tombstoneCol: Option[String] = None): DataFrame = {
    val dataCols = base.columns.toSeq
    require(dataCols.contains(keyCol), s"base has no key column '$keyCol'")
    val missing = dataCols.filterNot(updates.columns.contains)
    require(missing.isEmpty, s"updates missing base columns: ${missing.mkString(", ")}")
    tombstoneCol.foreach(tc => require(
      updates.columns.contains(tc), s"updates have no tombstone column '$tc'"))
    val latest = seqCol match {
      case Some(sc) =>
        require(updates.columns.contains(sc), s"updates have no seq column '$sc'")
        // equal-seq ties must resolve the same way on every run and
        // partitioning (the docstring's "resolved deterministically" —
        // bare .orderBy(seq desc) was partition-layout-dependent, review
        // r11): tombstone wins first (a delete and an upsert at the same
        // CDC sequence resolve to the delete), then a content hash makes
        // the order total; rows identical in every column tie harmlessly
        val tieBreak: Seq[Column] =
          tombstoneCol.map(tc =>
            coalesce(col(tc).cast("boolean"), lit(false)).desc).toSeq :+
            xxhash64(updates.columns.sorted.map(col): _*).asc
        val w = Window.partitionBy(col(keyCol)).orderBy(col(sc).desc +: tieBreak: _*)
        updates.withColumn("_mu_rn", row_number().over(w))
          .where(col("_mu_rn") === 1).drop("_mu_rn")
      case None => updates
    }
    val alive = tombstoneCol match {
      case Some(tc) =>
        latest.where(!coalesce(col(tc).cast("boolean"), lit(false)))
      case None => latest
    }
    base
      .join(latest.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
      .unionByName(alive.select(dataCols.map(col): _*))
  }

  /** Keep EXACTLY `ceil(frac · n)` rows — the globally best by
    * `(scoreCol DESC, idCol ASC)` — without a global window or a
    * driver-side top-k. This is the exact form of "keep the top 25% by
    * classifier score": [[weightedSample]] keeps a random
    * weight-proportional subset, [[topKByGroup]] a per-group k; this one
    * is the corpus-global exact rank cut.
    *
    * Algorithm (distributed exact selection): range-partition the
    * `(−score, id)` rank keys (Spark samples split bounds — one pass),
    * count each partition (counts only reach the driver, O(partitions)),
    * locate the partition holding global rank k by prefix sum, sort THAT
    * partition alone executor-side to extract the k-th key, then keep the
    * corpus rows at-or-above the threshold with a codegen'd filter. No
    * step materializes more than one range partition in memory and
    * nothing corpus-sized reaches the driver or any single task — the
    * failure mode of `ORDER BY … LIMIT k` at large k (a k-row
    * single-partition shuffle) is avoided.
    *
    * `idCol` must be integral and unique per row — it makes the rank
    * order total, so exactly k rows satisfy the threshold predicate.
    *
    * DETERMINISM REQUIREMENT (shared by every consumer of this two-pass
    * machinery — [[quantileBuckets]], [[balancedShards]]): the per-partition
    * counts from pass 1 are reused as prefix offsets in pass 2 over the
    * SAME `repartitionByRange` lineage, which is only valid when `df`
    * re-executes to identical rows (parquet scans and deterministic
    * transforms — the normal case). A nondeterministic upstream
    * (`sample`, `rand`, a `first`-style agg) must be materialized first
    * (`localCheckpoint()`/a written table); re-sampled rows would silently
    * shift boundary ranks. Not persisted here by design — pinning a
    * corpus-sized frame to storage costs more at 100 TB than the contract
    * costs the caller.
    *
    * COST: the input evaluates up to THREE times (rank-count job,
    * threshold job, final filter). Cheap for a scan of a written table;
    * for an expensive derived upstream, localCheckpoint the scores first
    * — [[dsirSelect]] does exactly that (measured 17→8 s at 500k docs).
    */
  def topFraction(
      df: DataFrame,
      scoreCol: Column,
      idCol: Column,
      frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0, 1], got $frac")
    if (frac == 0.0) return df.limit(0)
    if (frac == 1.0) return df
    val keyed = df.select(
      requireNotNull(scoreCol.cast("double"), "topFraction: score").as("_s"),
      requireNotNull(idCol.cast("long"), "topFraction: integral id").as("_i"))
    // ascending rank key = (−score, id): rank 1 is the best row
    val ranged = keyed
      .select(negate(col("_s")).as("_ns"), col("_i"))
      .repartitionByRange(col("_ns"), col("_i"))
    val counts = ranged.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect()
      .sortBy(_._1)
      .map(_._2)
    // n from the partition counts — a separate keyed.count() was a second
    // full corpus scan doing the same work (review r11)
    val n = counts.sum
    if (n == 0) return df
    val k = math.ceil(frac * n).toLong
    if (k >= n) return df
    var prefix = 0L
    var target = -1
    var localRank = 0L
    var i = 0
    while (i < counts.length && target < 0) {
      if (prefix + counts(i) >= k) { target = i; localRank = k - prefix }
      else prefix += counts(i)
      i += 1
    }
    require(target >= 0, s"rank $k not found in $n rows — internal error")
    val t = target
    val lr = localRank
    val Array((thrNs, thrId)) = ranged.rdd
      .mapPartitionsWithIndex { (idx, it) =>
        if (idx != t) Iterator.empty
        else {
          val arr = it.map(r => (r.getDouble(0), r.getLong(1))).toArray
          java.util.Arrays.sort(arr, Ordering.Tuple2[Double, Long])
          Iterator(arr((lr - 1).toInt))
        }
      }
      .collect()
    df.where(
      negate(scoreCol.cast("double")) < lit(thrNs) ||
        (negate(scoreCol.cast("double")) === lit(thrNs) && idCol.cast("long") <= lit(thrId)))
  }

  /** EXACT global ntile — equal-count quantile buckets over the total
    * order `(scoreCol ASC, idCol ASC)` — without a global sort: the
    * curriculum-binning / difficulty-tiering primitive ("shard the corpus
    * into k equal slices by quality score, feed easy→hard"). Matches SQL
    * `ntile(k) OVER (ORDER BY score, id)` row for row (first `n % k`
    * buckets one row larger), which is how the oracle states it.
    *
    * Algorithm (the [[topFraction]] machinery generalized to k−1 ranks):
    * range-partition the rank keys once, count partitions (O(partitions)
    * to the driver), locate each ntile boundary rank's partition by
    * prefix sum, sort ONLY the partitions holding boundaries to extract
    * the k−1 boundary KEYS, then assign buckets with a codegen'd
    * comparison chain against the broadcast boundaries — `1 + #{boundary
    * keys < row key}`. No global window, no single-partition shuffle;
    * nothing corpus-sized reaches the driver or any one task. Empty
    * buckets (n < k) come out exactly as ntile's: rows take buckets
    * `1..n`. `idCol` must be integral and unique (total order). `df` must
    * re-execute deterministically — see [[topFraction]]'s DETERMINISM
    * REQUIREMENT (this runs two passes over one ranged lineage).
    */
  def quantileBuckets(
      df: DataFrame,
      scoreCol: Column,
      idCol: Column,
      buckets: Int,
      bucketName: String = "bucket"): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    if (buckets == 1) return df.withColumn(bucketName, lit(1))
    val keyed = df.select(
      requireNotNull(scoreCol.cast("double"), "quantileBuckets: score").as("_s"),
      requireNotNull(idCol.cast("long"), "quantileBuckets: integral id").as("_i"))
    val ranged = keyed.repartitionByRange(col("_s"), col("_i"))
    val counts = ranged.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect()
      .sortBy(_._1)
      .map(_._2)
    // n from the partition counts — a separate keyed.count() was a second
    // full corpus scan doing the same work (review r11)
    val n = counts.sum
    if (n == 0) return df.withColumn(bucketName, lit(1))
    val q = n / buckets
    val r = n % buckets
    // end rank of bucket b; duplicates (n < k) mean empty trailing buckets
    val targets: Seq[Long] = (1L until buckets.toLong).map(b => b * q + math.min(b, r))
    val prefixes = counts.scanLeft(0L)(_ + _) // prefixes(i) = rows before partition i
    // partition → the local ranks of the boundary targets it holds
    val byPartition: Map[Int, Seq[Long]] = targets.distinct
      .filter(_ >= 1L)
      .map { t =>
        val p = prefixes.lastIndexWhere(_ < t) // t ∈ (prefixes(p), prefixes(p+1)]
        (p, t - prefixes(p))
      }
      .groupBy(_._1)
      .map { case (p, xs) => (p, xs.map(_._2)) }
    val bcWanted = df.sparkSession.sparkContext.broadcast(byPartition)
    // one sort per boundary-holding partition, emitting (partition,
    // localRank) → key; everything else streams through untouched
    val extracted: Map[(Int, Long), (Double, Long)] = ranged.rdd
      .mapPartitionsWithIndex { (idx, it) =>
        bcWanted.value.get(idx) match {
          case None => Iterator.empty
          case Some(localRanks) =>
            val arr = it.map(row => (row.getDouble(0), row.getLong(1))).toArray
            java.util.Arrays.sort(arr, Ordering.Tuple2[Double, Long])
            localRanks.iterator.map(lr => ((idx, lr), arr((lr - 1).toInt)))
        }
      }
      .collect()
      .toMap
    // per-target boundary key (duplicate targets resolve to the same key)
    val boundaries: Seq[(Double, Long)] = targets.map { t =>
      val p = prefixes.lastIndexWhere(_ < t)
      extracted((p, t - prefixes(p)))
    }
    val s = scoreCol.cast("double")
    val id = idCol.cast("long")
    // bucket = 1 + #{boundaries strictly below this row's key}
    val bucket = boundaries
      .map { case (bs, bi) =>
        when(s > lit(bs) || (s === lit(bs) && id > lit(bi)), 1).otherwise(0)
      }
      .reduce(_ + _) + lit(1)
    df.withColumn(bucketName, bucket)
  }

  /** Size-balanced shard assignment — the shard-writer's bin packing:
    * rows rank globally by `(sizeCol DESC, idCol ASC)` and deal into
    * `shards` in SERPENTINE order (shard s, then back from shard
    * shards−1 — the longest-processing-time heuristic on a sorted
    * stream), so per-shard byte totals stay within ~one max item of each
    * other where hash or round-robin assignment can skew by the size
    * distribution. The global rank is distributed (the [[topFraction]]
    * machinery): range-partition the rank keys, count partitions
    * (O(partitions) to the driver), then each partition computes its
    * rows' ranks from its prefix offset — no global window, no
    * single-partition sort. Returns (id, shard); join back on the id for
    * the full rows (one key shuffle — or broadcast when assigning a
    * dimension-sized table). `df` must re-execute deterministically — see
    * [[topFraction]]'s DETERMINISM REQUIREMENT.
    */
  def balancedShards(
      df: DataFrame,
      idCol: Column,
      sizeCol: Column,
      shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(
      requireNotNull(idCol.cast("long"), "balancedShards: integral id").as("_id"),
      requireNotNull(sizeCol.cast("long"), "balancedShards: size").as("_sz"))
    val ranged = keyed
      .select(negate(col("_sz")).as("_nsz"), col("_id"))
      .repartitionByRange(col("_nsz"), col("_id"))
      .sortWithinPartitions(col("_nsz"), col("_id"))
    val counts = ranged.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val prefixes = counts.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(prefixes)
    val s = shards.toLong
    ranged.rdd
      .mapPartitionsWithIndex { (p, it) =>
        var rank = bc.value(p) // 0-based global rank in (size desc, id) order
        it.map { row =>
          val round = rank / s
          val off = rank % s
          val shard = if (round % 2 == 0L) off else s - 1 - off
          rank += 1
          (row.getLong(1), shard.toInt)
        }
      }
      .toDF("id", "shard")
  }

  /** Per-group robust distribution profile — the data-quality monitor for
    * heterogeneous corpora: per `groupCol`, the count, exact median of
    * `valueCol`, and the MAD (median absolute deviation — the robust
    * spread a handful of garbage rows can't inflate the way stddev can),
    * plus the group's outlier count at `|v − median| > nMads · MAD`.
    * Two passes (medians need a first pass before deviations exist): both
    * are per-group `percentile` aggregates — map-side partial, one
    * shuffle of |groups| rows each. Memory bound: Spark's exact
    * percentile buffers a (value → count) map, so executor state is
    * O(DISTINCT values per group), NOT group row count — integer-ish
    * quality signals (char/token counts, scores in fixed-point) profile
    * exactly at ANY group size, while a continuous double column
    * degrades toward O(rows); pre-round such values (the MAD hardly
    * moves) or use corpus-GLOBAL exact cuts
    * ([[topFraction]]/[[quantileBuckets]], which never buffer a group).
    * Exact interpolated percentiles cross-check against `quantile_cont`
    * (the tq7 precedent), rounded to 6 decimals for the float gate.
    */
  def groupProfile(
      df: DataFrame,
      groupCol: Column,
      valueCol: Column,
      nMads: Double = 3.0): DataFrame = {
    require(nMads > 0.0, s"nMads must be > 0, got $nMads")
    val meds = df
      .groupBy(groupCol.as("_g"))
      .agg(
        count(lit(1)).as("n"),
        percentile(valueCol.cast("double"), lit(0.5)).as("_med"))
    val dev = df.select(groupCol.as("_g"), valueCol.cast("double").as("_v"))
      .join(meds, "_g") // |groups|-row side broadcasts
      .select(col("_g"), col("n"), col("_med"), abs(col("_v") - col("_med")).as("_ad"))
    val mads = dev.groupBy(col("_g").as("_g2"))
      .agg(percentile(col("_ad"), lit(0.5)).as("_mad"))
    dev.join(mads, col("_g") === col("_g2"))
      .groupBy(col("_g"), col("n"), col("_med"), col("_mad"))
      .agg(count(when(col("_ad") > lit(nMads) * col("_mad"), 1)).as("n_outliers"))
      .select(
        col("_g").as("group"),
        col("n"),
        round(col("_med"), 6).as("median"),
        round(col("_mad"), 6).as("mad"),
        col("n_outliers").cast("bigint").as("n_outliers"))
  }

  /** Exact token-count distribution stats (count + interpolated
    * percentiles) — the corpus-level summary a filtering pipeline keys off.
    */
  def tokenStats(df: DataFrame, textCol: String, percentiles: Seq[Double]): DataFrame = {
    // labels round instead of truncating (0.29 used to label as "p28" via
    // 28.999... .toInt — review r11), and collisions fail loudly instead
    // of producing two identically-named columns
    val labels = percentiles.map(p => s"p${math.round(p * 100)}")
    require(labels.distinct.size == labels.size,
      s"tokenStats: percentile labels collide after rounding: ${labels.mkString(", ")}")
    val toks = TextAnalysis.tokenCount(col(textCol)).cast("bigint")
    df.select(toks.as("n_tokens"))
      .agg(
        count(lit(1)).as("n_docs"),
        percentile(col("n_tokens"), lit(percentiles.toArray)).as("_ps"))
      .select(
        col("n_docs") +: labels.zipWithIndex.map { case (lbl, i) =>
          round(col("_ps").getItem(i), 6).as(lbl)
        }: _*)
  }

  /** Hashed word-{1..maxN}-gram bucket per occurrence, multiplicity-
    * preserving — DSIR's feature space. The engine-portable md5-prefix
    * hash, so the oracle re-derives buckets exactly.
    */
  private def dsirGramBuckets(
      df: DataFrame, idCol: Column, textCol: Column,
      buckets: Int, maxN: Int): DataFrame = {
    val grams = (1 to maxN)
      .map(n => graft.functions.word_ngrams(textCol, n))
      .reduce(concat(_, _))
    df.select(idCol.as("_id"), explode(grams).as("_g"))
      .select(col("_id"),
        (conv(substring(md5(col("_g")), 1, 8), 16, 10).cast("bigint")
          % buckets).as("_b"))
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
    * 2023, arXiv 2302.03169): score each raw document by how much its
    * hashed word-n-gram distribution looks like a TARGET corpus (the
    * high-quality domain you want more of), as the sum over gram
    * occurrences of the bucket log-likelihood ratio
    * `ln p̂_target(b) − ln p̂_raw(b)` with add-one smoothing over `buckets`.
    * Output: `(id, dsir_score double, n_grams bigint)` — one row per raw
    * doc with ≥1 gram (a gram-less doc has no evidence either way and
    * drops, the engine-wide zero-token rule).
    *
    * Shape at 100 TB: two map-side-combined bucket-count aggregations
    * (cost ∝ corpus, output ≤ `buckets` rows each), a weight table of
    * ≤ `buckets` doubles broadcast into one per-gram join, one per-doc
    * sum — no corpus self-join, no global sort. (The weight build's
    * full-outer join of the two count tables plans as a sort-merge join —
    * full-outer cannot broadcast — but both inputs are bounded by
    * `buckets`, never by the corpus.) Scores are
    * doubles (the log is irreducible here, unlike BM25's rational idf —
    * DSIR's SUM over grams needs the log to mean a product of ratios);
    * the ir1 gate therefore hashes the SELECTION (ids), which is robust
    * to sub-ulp libm differences, and the spec pins the weight math on a
    * closed-form fixture.
    */
  def dsirScores(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 1 << 14,
      maxN: Int = 2): DataFrame = {
    require(buckets > 0 && maxN >= 1, s"dsirScores: buckets=$buckets maxN=$maxN")
    // the raw gram table feeds the bucket counts AND the final score join,
    // and the bucket-count tables are each read twice (weight join + total)
    // — without the persists the raw corpus was gram-exploded 3× and the
    // target 2× per call (r14; rows are (id, int-bucket) pairs, the dq9
    // posting-persist shape). Registered with OpCaches — release via
    // OpCaches.release(spark) after the scores are consumed (r15
    // release-path item).
    val rawG = OpCaches.persist(
      dsirGramBuckets(raw, col(idCol), col(textCol), buckets, maxN))
    val tgtG = dsirGramBuckets(target, col(idCol), col(textCol), buckets, maxN)
    val rawC = rawG.groupBy(col("_b")).agg(count(lit(1)).as("_rc"))
    val tgtC = OpCaches.persist(
      tgtG.groupBy(col("_b")).agg(count(lit(1)).as("_tc")))
    // totals ride the same aggregates (no extra corpus scans)
    val weights = rawC.join(tgtC, Seq("_b"), "full_outer")
      .select(col("_b"),
        coalesce(col("_rc"), lit(0L)).as("_rc"),
        coalesce(col("_tc"), lit(0L)).as("_tc"))
      .crossJoin(broadcast(
        // coalesce: an EMPTY side sums to NULL, which would null every
        // weight — the add-one-smoothed math is well-defined at 0
        rawC.agg(coalesce(sum(col("_rc")), lit(0L)).as("_R"))
          .crossJoin(tgtC.agg(coalesce(sum(col("_tc")), lit(0L)).as("_T")))))
      .select(col("_b"),
        (log((col("_tc") + 1).cast("double") / (col("_T") + buckets)) -
          log((col("_rc") + 1).cast("double") / (col("_R") + buckets)))
          .as("_w"))
    rawG.join(broadcast(weights), Seq("_b"))
      .groupBy(col("_id"))
      .agg(
        sum(col("_w")).as("dsir_score"),
        count(lit(1)).as("n_grams"))
      .withColumnRenamed("_id", idCol)
  }

  /** DSIR selection: the top `frac` of raw docs by [[dsirScores]]
    * (deterministic exact-k via [[topFraction]] — score desc, id asc
    * tiebreak; the paper's Gumbel resampling is replaced by the
    * reproducible top-fraction rule, the same determinism trade every
    * sampler in this module makes). Returns `(id, dsir_score)`.
    */
  def dsirSelect(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      frac: Double,
      buckets: Int = 1 << 14,
      maxN: Int = 2): DataFrame = {
    // localCheckpoint: [[topFraction]] evaluates its input three times
    // (rank-count job, threshold job, final filter) — without this the
    // whole gram-explode/score pipeline would run 3× (measured 17→8 s at
    // 500k docs). Blocks are GC-reclaimed once the result is dropped
    // (the connectedComponents convention).
    val scored = dsirScores(raw, target, idCol, textCol, buckets, maxN)
      .localCheckpoint()
    topFraction(scored, col("dsir_score"), col(idCol), frac)
      .select(col(idCol), col("dsir_score"))
  }
}
