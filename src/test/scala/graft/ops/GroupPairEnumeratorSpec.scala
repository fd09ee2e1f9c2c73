package graft.ops

/** Pure-JVM tests of the shared bucket-pair enumerator — no SparkSession:
  * order-invariance of the emitted pair SET (grouped iterators arrive in
  * shuffle order), spill-path equivalence (a mass large enough to spill
  * must emit exactly the pairs of the same mass buffered), and the pivot
  * rule's determinism guarantees (min-hash member always a pivot).
  */
class GroupPairEnumeratorSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def pairs(
      members: Seq[(Long, Long)],
      cap: Int,
      hammingMax: Int = 64,
      starPivots: Int = 4): Set[(Long, Long)] =
    GroupPairEnumerator
      .enumerate(members.iterator, cap, hammingMax, starPivots)
      .toSet

  test("small bucket: all pairs, canonical (min, max) order, hamming filter applies") {
    val m = Seq((3L, 0L), (1L, 0L), (2L, 0L))
    assert(pairs(m, cap = 10) == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // hamming 0 max: only identical sims pair
    val mixed = Seq((1L, 5L), (2L, 5L), (3L, 9L))
    assert(pairs(mixed, cap = 10, hammingMax = 0) == Set((1L, 2L)))
  }

  test("pair set is invariant under member order, including across the spill boundary") {
    val rng = new scala.util.Random(3)
    val members = Seq.tabulate(500)(i => (i.toLong, 0L))
    val shuffled = rng.shuffle(members)
    // cap 100 → 400 members spill; same mass, different arrival orders
    val a = pairs(members, cap = 100)
    val b = pairs(shuffled, cap = 100)
    assert(a == b)
    assert(a.nonEmpty)
    // spilled == buffered: a cap large enough to hold everyone gives the
    // star pairs' superset; every star pair must be a true member pair
    val full = pairs(members, cap = 1000)
    assert(a.subsetOf(full))
  }

  test("mass connectivity: every member reaches a pivot (single component)") {
    val members = Seq.tabulate(300)(i => (i.toLong, 0L))
    val got = pairs(members, cap = 50, starPivots = 2)
    // union-find over the emitted pairs: one component covering all 300
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    got.foreach { case (x, y) => parent(find(x)) = find(y) }
    val roots = members.map(m => find(m._1)).distinct
    assert(roots.size == 1, s"${roots.size} components")
    // bounded: far below the 300*299/2 all-pairs
    assert(got.size < 300 * 8, s"${got.size} pairs")
  }

  test("empty and singleton groups emit nothing") {
    assert(pairs(Nil, cap = 10).isEmpty)
    assert(pairs(Seq((7L, 1L)), cap = 10).isEmpty)
  }

  test("duplicate-id rows never emit a (x, x) self-pair on either path") {
    // small-bucket path: the same id twice (duplicate input rows) must be
    // skipped, matching the mass path's m != pivot guard and the former
    // strict-< join (review advice, round 7)
    assert(pairs(Seq((5L, 0L), (5L, 0L)), cap = 10).isEmpty)
    assert(
      pairs(Seq((5L, 0L), (5L, 0L), (9L, 0L)), cap = 10) == Set((5L, 9L)))
    // mass path: duplicates across the spill boundary
    val dup = Seq.tabulate(300)(i => ((i % 150).toLong, 0L))
    val got = pairs(dup, cap = 50, starPivots = 2)
    assert(got.forall { case (a, b) => a != b })
  }
}
