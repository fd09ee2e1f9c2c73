package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Property coverage for the HTML extractor: crawl HTML is adversarial by
  * nature, so the invariants are checked over generated tag soup, not just
  * curated fixtures. All checks run in ONE Spark pass per property (the
  * generator produces a column of documents) — per-row spark jobs would
  * make 200 cases minutes-slow.
  */
class HtmlPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rules = Html.BoilerplateRules(
    minChars = 10, maxLinkDensity = 0.5, minStopwordRatio = 0.0)

  // tag soup: fragments of legal markup, broken markup, entities, text
  private val fragment: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf("<p>", "</p>", "<div class='x'>", "</div>", "<a href=\"/x\">",
      "</a>", "<br>", "<script>", "</script>", "<!--", "-->", "<style>",
      "</style>", "<", ">", "&amp;", "&lt;", "&bogus;", "\"", "'", "\n",
      " the ", " a ", "<P>", "<a href=y>", "<h1>", "</h1>", "<td>", "<title>"),
    Gen.const(""))

  private val soup: Gen[String] =
    Gen.listOfN(24, fragment).map(_.mkString)

  private def docs(n: Int, seed: Long): Seq[String] = {
    val params = org.scalacheck.Gen.Parameters.default
    (0 until n).map { i =>
      soup(params, org.scalacheck.rng.Seed(seed + i)).getOrElse("")
    }
  }

  test("extraction never throws and upholds structural invariants on tag soup") {
    val rows = docs(400, seed = 20260815L).toDF("h")
      .select(
        Html.htmlText(col("h")).as("all"),
        Html.htmlMainText(col("h"), rules).as("main"),
        Html.htmlTitle(col("h")).as("title"),
        Html.extractLinks(col("h")).as("links"))
      .collect()
    assert(rows.length == 400)
    rows.foreach { r =>
      val all = r.getString(0); val main = r.getString(1)
      // NOTE: "no <...> in the output" is deliberately NOT asserted — the
      // author-escaped form (&lt;tag + a later literal >) legitimately
      // decodes to tag-shaped TEXT, which is correct extraction.
      // kept blocks are a sub-multiset of all blocks: every main line
      // appears in the unfiltered extraction
      val allLines = all.split('\n').groupBy(identity).map { case (k, v) => k -> v.length }
      if (main.nonEmpty) {
        val mainLines = main.split('\n').groupBy(identity).map { case (k, v) => k -> v.length }
        mainLines.foreach { case (line, cnt) =>
          assert(allLines.getOrElse(line, 0) >= cnt,
            s"main line not in htmlText: '$line'")
        }
      }
      // whitespace discipline: no leading/trailing/double spaces per line
      (all.split('\n') ++ main.split('\n')).filter(_.nonEmpty).foreach { l =>
        assert(l == l.trim && !l.contains("  "), s"ws residue: '$l'")
      }
      // title is single-line and whitespace-normalized
      val t = r.getString(2)
      assert(!t.contains("\n") && t == t.trim && !t.contains("  "))
    }
  }

  test("extraction is deterministic across evaluations") {
    val df = docs(100, seed = 7L).toDF("h")
      .select(Html.htmlMainText(col("h"), rules).as("m"))
    assert(df.collect().toSeq == df.collect().toSeq)
  }
}
