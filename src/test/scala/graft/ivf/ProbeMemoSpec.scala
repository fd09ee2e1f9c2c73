package graft.ivf

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** The store-level availability-probe memo ([[IndexStore.memoizedProbe]]):
  * tier=auto `usable()` probes and the rule's per-file header peeks must
  * cost stats (not opens) on every plan after the first, and any change to
  * a dependency file — sidecar rebuilt, data file replaced, sidecar
  * appearing where none existed — must invalidate the entry (identity is
  * inode+mtime+length of every file the probe reads). Review r11: without
  * this a 100k-file cold-profile table paid 100k driver round-trips per
  * planned query.
  */
class ProbeMemoSpec extends SparkSpec {
  import spark.implicits._

  private def writeTable(dir: String, n: Int, seed: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(8)(rnd.nextFloat())))
      .toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  private def fixture(): (String, IndexStore, Seq[String]) = {
    val dir = Files.createTempDirectory("graft-probememo").toString
    writeTable(dir, 150, seed = 31)
    val store = new IndexStore(Files.createTempDirectory("graft-probememo-store").toString)
    IvfBuilder.build(spark, dir, IvfBuilder.Config("vec", nClusters = Some(4)), store)
    (dir, store, IndexManager.listFiles(spark, dir))
  }

  private def statsDelta[T](body: => T): (T, Long, Long) = {
    val (h0, m0) = IndexStore.probeCacheStats
    val r = body
    val (h1, m1) = IndexStore.probeCacheStats
    (r, h1 - h0, m1 - m0)
  }

  test("repeat usable()/cachedPeek probes over an unchanged table are all memo hits") {
    val (dir, store, files) = fixture()
    Sq8Sidecar.ensure(spark, dir, "vec", store)
    PqSidecar.ensure(spark, dir, "vec", m = 4, store)
    val f = files.head

    // first probe after the builds: miss (computes), second: pure hit
    val (r1, _, miss1) = statsDelta(PqSidecar.usable(store, f, "vec", residual = false))
    assert(r1 && miss1 >= 1)
    val (r2, hit2, miss2) = statsDelta(PqSidecar.usable(store, f, "vec", residual = false))
    assert(r2 && hit2 == 1 && miss2 == 0)
    val (s2, sh2, sm2) = statsDelta {
      Sq8Sidecar.usable(store, f, "vec") // warm
      Sq8Sidecar.usable(store, f, "vec")
    }
    assert(s2 && sh2 >= 1 && sm2 <= 1)

    val (p1, _, _) = statsDelta(IndexManager.cachedPeek(store, f, "vec"))
    assert(p1.contains((8, 4)))
    val (p2, ph2, pm2) = statsDelta(IndexManager.cachedPeek(store, f, "vec"))
    assert(p2.contains((8, 4)) && ph2 == 1 && pm2 == 0)
  }

  test("a sidecar appearing where none existed invalidates the memoized false") {
    val (dir, store, files) = fixture()
    val f = files.head
    // memoize the negative answer
    assert(!Sq8Sidecar.usable(store, f, "vec"))
    assert(!PqSidecar.usable(store, f, "vec", residual = true))
    // build the sidecars: the probe's dependency files changed → recompute
    Sq8Sidecar.ensure(spark, dir, "vec", store)
    PqSidecar.ensure(spark, dir, "vec", m = 4, store, residual = true)
    val (r, _, miss) = statsDelta {
      (Sq8Sidecar.usable(store, f, "vec"),
        PqSidecar.usable(store, f, "vec", residual = true))
    }
    assert(r == ((true, true)), "memo must not pin a stale false")
    assert(miss >= 2, "changed dependencies must recompute, not hit")
  }

  test("a retrained index (new centroid epoch) invalidates the residual-usable memo") {
    val (dir, store, files) = fixture()
    PqSidecar.ensure(spark, dir, "vec", m = 4, store, residual = true)
    val f = files.head
    assert(PqSidecar.usable(store, f, "vec", residual = true))
    // rebuild the IVF index with a different cluster count: new centroid
    // digest, same .pqr bytes — the memoized true must flip to false
    // because the identity includes the index sidecar
    IvfBuilder.build(spark, dir, IvfBuilder.Config("vec", nClusters = Some(5)), store)
    assert(!PqSidecar.usable(store, f, "vec", residual = true),
      "residual codes from a dead centroid epoch must read unusable")
    // non-residual pq ignores the centroid epoch and stays usable
    PqSidecar.ensure(spark, dir, "vec", m = 4, store)
    assert(PqSidecar.usable(store, f, "vec", residual = false))
  }

  test("table-level memo: repeat probes are O(1), any rename into a watched dir invalidates") {
    val (dir, store, files) = fixture()
    var computes = 0
    def probe(): Boolean = IndexStore.memoizedTableProbe(
      "spec-table-probe", "vec", files, store.dir) { computes += 1; true }
    assert(probe() && computes == 1)
    assert(probe() && computes == 1, "unchanged dirs must serve the cached answer")
    // a sidecar build lands by temp+rename into the store dir → dir mtime
    // moves → the table entry invalidates and the compute runs again
    Sq8Sidecar.ensure(spark, dir, "vec", store)
    assert(probe() && computes == 2, "a store-dir rename must invalidate")
    assert(probe() && computes == 2)
    // a data-file landing by rename into the TABLE dir invalidates too
    val extra = java.nio.file.Paths.get(dir, "zz-extra.tmp")
    java.nio.file.Files.write(extra, Array[Byte](1))
    java.nio.file.Files.move(extra, java.nio.file.Paths.get(dir, "zz-extra.bin"))
    assert(probe() && computes == 3, "a table-dir rename must invalidate")
    // a THROWING compute is never cached: every retry re-runs it
    var boom = 0
    def bad(): Unit = IndexStore.memoizedTableProbe(
      "spec-table-throw", "vec", files, store.dir) {
      boom += 1; throw new IllegalStateException("nope")
    }
    intercept[IllegalStateException](bad())
    intercept[IllegalStateException](bad())
    assert(boom == 2, "error paths must re-validate, not cache the failure")
  }

  test("a probe racing a write is not cached (post-compute identity re-check)") {
    val (dir, store, files) = fixture()
    // per-file layer: compute itself mutates a dependency file (the
    // deterministic stand-in for a concurrent build's rename landing
    // mid-probe) — the answer must NOT be filed under the pre-write
    // identity, so the next call recomputes instead of serving it
    val dep = java.nio.file.Paths.get(store.dir, "racy.dep")
    var computes = 0
    def racyProbe(): Boolean = IndexStore.memoizedProbe(
      "spec-race", files.head, "vec", Seq(dep.toString)) {
      computes += 1
      java.nio.file.Files.write(dep, Array[Byte](computes.toByte)): Unit
      true
    }
    assert(racyProbe() && computes == 1)
    assert(racyProbe() && computes == 2, "a racing probe must not be cached")
    // once compute stops mutating (the write has settled), caching resumes
    def settled(): Boolean = IndexStore.memoizedProbe(
      "spec-race", files.head, "vec", Seq(dep.toString)) { computes += 1; true }
    assert(settled() && computes == 3)
    assert(settled() && computes == 3, "a settled probe memoizes again")
    // table layer: same contract against the watched dir
    var tcomputes = 0
    def racyTable(): Boolean = IndexStore.memoizedTableProbe(
      "spec-race-table", "vec", files, store.dir) {
      tcomputes += 1
      val f = java.nio.file.Paths.get(store.dir, s"racy-$tcomputes.tmp")
      java.nio.file.Files.write(f, Array[Byte](1))
      java.nio.file.Files.move(
        f, java.nio.file.Paths.get(store.dir, s"racy-$tcomputes.bin")): Unit
      true
    }
    assert(racyTable() && tcomputes == 1)
    assert(racyTable() && tcomputes == 2, "a racing table probe must not be cached")
  }

  test("an in-place footer embed invalidates the table-level memo (no rename involved)") {
    val dir = Files.createTempDirectory("graft-probememo-footer").toString
    writeTable(dir, 150, seed = 33)
    // an EMPTY store: availability comes from the footer path only
    val store = new IndexStore(Files.createTempDirectory("graft-probememo-fstore").toString)
    val files = IndexManager.listFiles(spark, dir)
    // memoize the negative table-level answer (nothing indexed yet)
    def allIndexed(): Boolean = IndexStore.memoizedTableProbe(
      "spec-footer-dim", "vec", files, store.dir)(
      files.forall(f => IndexManager.cachedPeek(store, f, "vec").exists(_._1 == 8)))
    assert(!allIndexed())
    val (neg, negHit, negMiss) = statsDelta(allIndexed())
    assert(!neg && negHit == 1 && negMiss == 0, "negative answer must memoize")
    // embedInPlace mutates the data file via RandomAccessFile — no rename
    // touches the directory, so ParquetFooterIndex must bump the dir mtime
    // itself or this memo would pin "unindexed" across the engine's own
    // footer build
    val sideStore = new IndexStore(Files.createTempDirectory("graft-probememo-side").toString)
    IvfBuilder.build(
      spark, dir, IvfBuilder.Config("vec", nClusters = Some(4)), sideStore)
    files.foreach { f =>
      val idx = IndexManager.loadIndex(sideStore, f, "vec")
      ParquetFooterIndex.embedInPlace(f.stripPrefix("file:"), "vec", idx)
    }
    assert(allIndexed(), "footer embed must invalidate the stale negative")
  }

  test("a second planned tier=auto query answers availability in O(1) probe work") {
    import graft.plans.VectorTopKRule
    val (dir, store, _) = fixture()
    Sq8Sidecar.ensure(spark, dir, "vec", store)
    PqSidecar.ensure(spark, dir, "vec", m = 4, store)
    PqSidecar.ensure(spark, dir, "vec", m = 4, store, residual = true)
    graft.Graft.install(spark)
    spark.conf.set(VectorTopKRule.IndexDirKey, store.dir)
    spark.conf.set(VectorTopKRule.TierKey, "auto")
    spark.conf.set(VectorTopKRule.StorageProfileKey, "cold")
    try {
      spark.read.parquet(dir).createOrReplaceTempView("probememo_auto")
      def plan(): Unit = spark.sql(
        s"""SELECT id FROM probememo_auto
           |ORDER BY array_distance(vec, array(${Seq.fill(8)("0.5F").mkString(",")})) ASC
           |LIMIT 3""".stripMargin).queryExecution.optimizedPlan: Unit
      plan() // first plan warms every level of the memo
      val (h0, m0) = IndexStore.probeCacheStats
      plan()
      val (h1, m1) = IndexStore.probeCacheStats
      assert(m1 - m0 == 0, s"repeat plan must not recompute any probe (${m1 - m0} misses)")
      // table-level entries only: dim gate + pqr availability + feed
      // validation — NOT one hit per file per kind
      assert(h1 - h0 <= 8, s"repeat plan should hit table-level entries, got ${h1 - h0}")
    } finally {
      spark.conf.unset(VectorTopKRule.TierKey)
      spark.conf.unset(VectorTopKRule.StorageProfileKey)
      spark.conf.unset(VectorTopKRule.IndexDirKey)
    }
  }

  test("cachedPeek sees a replaced data file as no-index (binding refusal survives the memo)") {
    val (dir, store, files) = fixture()
    val victim = files.head
    assert(IndexManager.cachedPeek(store, victim, "vec").isDefined) // memoize
    val donorDir = Files.createTempDirectory("graft-probememo-donor").toString
    writeTable(donorDir, 80, seed = 32)
    val donor = IndexManager.listFiles(spark, donorDir).head
    val (t, w) = (java.nio.file.Paths.get(victim.stripPrefix("file:")),
      java.nio.file.Paths.get(donor.stripPrefix("file:")))
    Files.copy(w, t, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    def crc(p: java.nio.file.Path) = p.resolveSibling("." + p.getFileName + ".crc")
    Files.copy(crc(w), crc(t), java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    assert(IndexManager.cachedPeek(store, victim, "vec").isEmpty,
      "memo must not serve a peek bound to the replaced file's content")
  }
}
