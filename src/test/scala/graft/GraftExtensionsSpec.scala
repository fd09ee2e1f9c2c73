package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The production install path: a session configured with
  * `spark.sql.extensions=graft.GraftExtensions` gets the SQL functions and
  * the optimizer rule without any imperative install call.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions-configured session resolves graft SQL functions") {
    // force a fresh session so the extensions config is applied
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    // `spark.sql.extensions` is a static conf — it only takes effect on a
    // fresh SparkContext, and the test JVM shares one. withExtensions
    // exercises the identical injection path programmatically.
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val d = spark
        .sql("SELECT array_distance(array(1.0F,2.0F,3.0F), array(4.0F,5.0F,6.0F)) d")
        .head().getFloat(0)
      assert(math.abs(d - math.sqrt(27.0)) < 1e-5)
      val sim = spark
        .sql("SELECT simhash64(array('a','b','c')) s")
        .head().getLong(0)
      assert(sim != 0L)
      // the optimizer rule is injected (visible in the session's rule list
      // behavior: an indexed-table rewrite is covered in VectorTopKRuleSpec;
      // here we assert injection didn't break plain queries)
      assert(spark.sql("SELECT 1 + 1").head().getInt(0) == 2)
    } finally {
      // do NOT stop(): the SparkContext is shared with the other suites —
      // just restore the previous default/active sessions
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
