package graft

import org.scalatest.funsuite.AnyFunSuite

class BenchCalibrationSpec extends AnyFunSuite {

  private def withPrev(content: String)(body: String => Unit): Unit = {
    val f = java.nio.file.Files.createTempFile("bench-prev", ".json")
    java.nio.file.Files.write(f, content.getBytes("UTF-8"))
    try body(f.toString)
    finally java.nio.file.Files.delete(f): Unit
  }

  private val prevRecord =
    """{"metric":"total","value":9.9,"queries":{"q1":0.50,"q2":0.20,"q3":0.01},""" +
      """"headline":{"q1":0.50},"calibration_spark_cpu":0.10}"""

  test("host drift divides out: uniform 2x slowdown with 2x calibration flags nothing") {
    withPrev(prevRecord) { p =>
      val frag = Bench.calibratedVsPrev(
        Map("q1" -> 1.0, "q2" -> 0.40, "q3" -> 0.02), calibration = 0.20, p)
      assert(frag.contains("\"cal_ratio\":2"), frag)
      assert(frag.contains("\"flagged_over_1.3x\":{}"), frag)
      assert(frag.contains("\"n_compared\":3"), frag)
    }
  }

  test("a real regression survives calibration and is flagged") {
    withPrev(prevRecord) { p =>
      // host 2x slower, but q1 got 4x slower raw -> calibrated 2x
      val frag = Bench.calibratedVsPrev(
        Map("q1" -> 2.0, "q2" -> 0.40), calibration = 0.20, p)
      assert(frag.contains("\"flagged_over_1.3x\":{\"q1\":2"), frag)
      assert(frag.contains("\"max\":{\"query\":\"q1\""), frag)
    }
  }

  test("tiny entries (<50ms prev) are exempt from flagging but still compared") {
    withPrev(prevRecord) { p =>
      // q3 prev=10ms: 5x calibrated ratio must NOT flag (noise-dominated)
      val frag = Bench.calibratedVsPrev(
        Map("q3" -> 0.05), calibration = 0.10, p)
      assert(frag.contains("\"flagged_over_1.3x\":{}"), frag)
      assert(frag.contains("\"n_compared\":1"), frag)
    }
  }

  test("missing previous record or calibration yields an empty fragment") {
    assert(Bench.calibratedVsPrev(Map("q1" -> 1.0), 0.1, "/nonexistent") == "")
    withPrev("""{"metric":"total","queries":{"q1":0.5}}""") { p =>
      assert(Bench.calibratedVsPrev(Map("q1" -> 1.0), 0.1, p) == "")
    }
  }
}
