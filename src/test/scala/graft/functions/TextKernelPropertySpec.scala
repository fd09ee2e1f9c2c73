package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the dedup/search kernels added for the hot paths:
  * sorted-merge jaccard vs the set-based definition, and multi-probe
  * centroid selection vs the single-probe kernel.
  */
class TextKernelPropertySpec extends AnyFunSuite {

  private def forAllSeeded[T](g: Gen[T], n: Int)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      body(g.pureApply(Gen.Parameters.default.withSize(30), Seed(7L + i)))
    }

  private val setPairGen = for {
    a <- Gen.listOf(Gen.choose(-50L, 50L)).map(_.distinct.sorted)
    b <- Gen.listOf(Gen.choose(-50L, 50L)).map(_.distinct.sorted)
  } yield (a, b)

  test("sortedJaccard equals the set definition on random sorted sets") {
    forAllSeeded(setPairGen, 200) { case (a, b) =>
      val got = TextHash.sortedJaccard(
        new GenericArrayData(a.toArray), new GenericArrayData(b.toArray))
      val inter = a.toSet.intersect(b.toSet).size
      val union = a.toSet.union(b.toSet).size
      val expected = if (union == 0) 0.0 else inter.toDouble / union
      assert(got == expected, s"a=$a b=$b")
    }
  }

  private val probeGen = for {
    dim <- Gen.choose(1, 8)
    k <- Gen.choose(1, 10)
    centroids <- Gen.listOfN(dim * k, Gen.choose(-5.0f, 5.0f))
    vec <- Gen.listOfN(dim, Gen.choose(-5.0f, 5.0f))
    p <- Gen.choose(1, 12)
  } yield (dim, centroids.toArray, vec.toArray, p)

  test("nearestCentroids is ascending by distance and prefixes nearestCentroid") {
    forAllSeeded(probeGen, 200) { case (dim, cents, vec, p) =>
      val ids = VectorKernels.nearestCentroids(vec, cents, dim, p)
      val k = cents.length / dim
      assert(ids.length == math.min(p, k))
      assert(ids.distinct.length == ids.length)
      // head agrees with the single-probe kernel
      assert(ids.head == VectorKernels.nearestCentroid(vec, cents, dim))
      // ascending by (distance, id)
      def d(c: Int): Float = {
        val off = c * dim
        var s = 0.0f
        var i = 0
        while (i < dim) { val t = vec(i) - cents(off + i); s += t * t; i += 1 }
        s
      }
      val keys = ids.map(c => (d(c), c)).toSeq
      assert(keys == keys.sorted, s"ids=${ids.toSeq}")
      // and it is the true top-p: no unselected centroid beats a selected one
      val worst = keys.last
      (0 until k).filterNot(ids.contains).foreach { c =>
        assert(Ordering.Tuple2[Float, Int].gt((d(c), c), worst))
      }
    }
  }

  test("wordNgrams keeps multiplicity; wordShingles equals its distinct form") {
    val textGen = for {
      toks <- Gen.listOf(Gen.oneOf("a", "b", "c", "ab", "xy"))
      n <- Gen.choose(1, 4)
    } yield (toks, n)
    forAllSeeded(textGen, 200) { case (toks, n) =>
      val text = org.apache.spark.unsafe.types.UTF8String.fromString(toks.mkString(" "))
      val grams = TextHash.wordNgrams(text, n).toObjectArray(
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val shingles = TextHash.wordShingles(text, n).toObjectArray(
        org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      val expected =
        if (toks.length < n) Seq.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      assert(grams == expected, s"toks=$toks n=$n")
      assert(shingles == expected.distinct, s"toks=$toks n=$n")
    }
  }

  test("markerCounts matches a naive recount on random token streams") {
    val vocabGen = for {
      vocabs <- Gen.listOfN(3, Gen.listOf(Gen.oneOf("aa", "bb", "cc", "dd", "ee")).map(_.distinct))
      toks <- Gen.listOf(Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff", "zz"))
    } yield (vocabs, toks)
    forAllSeeded(vocabGen, 200) { case (vocabs, toks) =>
      val sets = vocabs.map { v =>
        val s = new java.util.HashSet[String]()
        v.foreach(s.add)
        s
      }.toArray
      val text = org.apache.spark.unsafe.types.UTF8String.fromString(toks.mkString(" "))
      val got = TextHash.markerCounts(text, sets)
      val actualToks = toks.mkString(" ").trim.split("\\s+").toSeq
      vocabs.zipWithIndex.foreach { case (v, i) =>
        assert(got.getInt(i) == actualToks.count(v.contains), s"vocab=$v toks=$toks")
      }
    }
  }
}
