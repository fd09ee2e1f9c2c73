package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property coverage for the PSL lookups: random rule sets and hosts,
  * checked against an INDEPENDENT straight-Scala reference evaluation of
  * the publicsuffix algorithm — three witnesses (chained expression,
  * broadcast-join op, reference impl) must agree on every host.
  */
class WebPslPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Reference longest-match evaluation, written directly from the spec
    * (exception overrides; else longest of exact/wildcard; else last
    * label), sharing NO code with the production lookups.
    */
  private def referenceDomain(host: String, psl: Web.Psl): String = {
    if (host == null) return null
    val labels = host.split("\\.", -1)
    def suffix(k: Int) = labels.takeRight(k).mkString(".")
    val exc = psl.exception.collectFirst {
      case (k, ds) if labels.length >= k && ds.contains(suffix(k)) => k - 1
    }
    val ps = exc.getOrElse {
      val candidates =
        psl.exact.keys.filter(k => labels.length >= k && psl.exact(k).contains(suffix(k))) ++
          psl.wildcard.keys.filter(k =>
            labels.length >= k + 1 && psl.wildcard(k).contains(suffix(k))).map(_ + 1)
      if (candidates.isEmpty) 1 else candidates.max
    }
    if (labels.length <= ps) host else suffix(ps + 1)
  }

  test("expression form == join form == reference impl on random rules/hosts") {
    val rnd = new scala.util.Random(20260815L)
    (0 until 8).foreach { round =>
      // random rule set: labels drawn from a small alphabet so hosts
      // actually hit rules
      def lbl() = s"${('a' + rnd.nextInt(4)).toChar}${rnd.nextInt(3)}"
      val exact = Seq.fill(12)(s"${lbl()}.${lbl()}").distinct ++
        Seq.fill(4)(lbl()).distinct
      val wild = Seq.fill(3)(lbl()).distinct
      val exc = wild.take(2).map(w => s"${lbl()}.$w")
      val psl = Web.Psl(
        exact = exact.groupBy(_.count(_ == '.') + 1),
        wildcard = Map(1 -> wild),
        exception = Map(2 -> exc))
      val hosts = Seq.fill(120) {
        (1 to (1 + rnd.nextInt(4))).map(_ => lbl()).mkString(".")
      } ++ Seq("", "single")
      val df = hosts.zipWithIndex.map { case (h, i) => (i, h) }.toDF("i", "h")
      val viaExpr = df.orderBy("i").select(Web.registrableDomainPsl(col("h"), psl))
        .as[String].collect().toSeq
      val viaJoin = Web.withRegistrableDomain(df, "h", "d", psl)
        .orderBy("i").select("d").as[String].collect().toSeq
      val ref = hosts.map(referenceDomain(_, psl))
      hosts.indices.foreach { i =>
        assert(viaExpr(i) == ref(i),
          s"round $round host '${hosts(i)}': expr '${viaExpr(i)}' != ref '${ref(i)}' (psl $psl)")
        assert(viaJoin(i) == ref(i),
          s"round $round host '${hosts(i)}': join '${viaJoin(i)}' != ref '${ref(i)}' (psl $psl)")
      }
    }
  }
}
