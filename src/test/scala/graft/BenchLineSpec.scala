package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench JSON line must fit the round collector's 2000-char stdout
  * tail window (minus sbt's ~75-char trailer) for ANY query count —
  * BENCH_r01..r03 all recorded parsed:null because the full-precision
  * line outgrew the window unnoticed. These tests pin the rendering
  * contract so the next query-count bump cannot silently regress it. */
class BenchLineSpec extends AnyFunSuite {

  private def parse(line: String): Map[String, Any] = {
    // minimal JSON sanity: jackson is already on the classpath via Spark
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.readTree(line)
    assert(node.isObject)
    Map(
      "value" -> node.get("value").asDouble(),
      "nq" -> node.get("queries").size(),
      "omitted" -> Option(node.get("omitted")).map(_.asInt()).getOrElse(0),
      "sf" -> node.get("sf").asDouble())
  }

  test("the real query map renders within budget and parses") {
    val fake = SparkEntry.queries.keys.toSeq.zipWithIndex.map {
      case (k, i) => (k, 0.1 + (i % 40) * 0.11, None: Option[String])
    }
    val line = Bench.renderLine(fake, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget, s"len=${line.length}:\n$line")
    val p = parse(line)
    assert(p("nq").asInstanceOf[Int] + p("omitted").asInstanceOf[Int] ==
      SparkEntry.queries.size)
    assert(p("sf") == 0.1)
    // the total keeps the omitted queries' time
    assert(math.abs(p("value").asInstanceOf[Double] -
      fake.map(_._2).sum) < 0.01)
  }

  test("a 300-query map still fits by omitting the fastest entries") {
    val fake = (0 until 300).map { i =>
      (s"synthetic_query_name_number_$i", i * 0.01, None: Option[String])
    }
    val line = Bench.renderLine(fake, "/root/testdata/sf0.01")
    assert(line.length <= Bench.LineBudget, s"len=${line.length}")
    val p = parse(line)
    assert(p("omitted").asInstanceOf[Int] > 0)
    assert(p("nq").asInstanceOf[Int] + p("omitted").asInstanceOf[Int] == 300)
    // the slowest queries are the ones kept
    assert(line.contains("synthetic_query_name_number_299"))
    assert(!line.contains("\"synthetic_query_name_number_0\""))
  }

  test("awkward sf dir names still render valid JSON") {
    val fake = Seq(("q", 0.5, None: Option[String]))
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    // leading zero canonicalizes; regex-captured trailing dot falls back
    // to a quoted string; no sf marker at all falls back too
    assert(m.readTree(Bench.renderLine(fake, "/data/sf01"))
      .get("sf").asDouble() == 1.0)
    for (dir <- Seq("/data/sf0.1.bak", "/somewhere/else")) {
      val node = m.readTree(Bench.renderLine(fake, dir))
      assert(node.get("sf").isTextual || node.get("sf").isNumber, dir)
    }
  }

  test("a mass-failure round (all 99 queries erroring) still fits the budget") {
    // e.g. a bad/missing SF dir fails every query with a long path message
    val fake = (0 until 99).map { i =>
      (s"synthetic_query_name_number_$i", 0.05,
        Some("FileNotFoundException: Path does not exist: " +
          "file:/root/testdata/sf0.1-definitely-not-here/lineitem.parquet"))
    }
    val line = Bench.renderLine(fake, "/root/testdata/sf0.1")
    assert(line.length <= Bench.LineBudget, s"len=${line.length}")
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.readTree(line)
    // at least one error survives verbatim, the rest are counted
    val kept = node.get("errors").size()
    assert(kept >= 1)
    assert(node.get("errors_omitted").asInt() == 99 - kept)
    assert(node.get("queries").size() +
      Option(node.get("omitted")).map(_.asInt()).getOrElse(0) == 99)
  }

  test("errors surface in the line, truncated, with special chars escaped") {
    val fake = Seq(
      ("ok_query", 0.5, None: Option[String]),
      ("bad_query", 0.1, Some("Boom: \"quoted\"\npath\\x " + "y" * 200)))
    val line = Bench.renderLine(fake, "/root/testdata/sf0.001")
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = m.readTree(line)
    val err = node.get("errors").get("bad_query").asText()
    assert(err.startsWith("Boom: \"quoted\" path\\x"))
    assert(err.length <= 100)
  }
}
