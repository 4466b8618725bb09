package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.QueryDsl
import graft.operators.QueryDsl._

/** The DSL validation ledger (validator.go:72 analogue): ALL invalid
  * fields come back at once, each with field/value/message/hint, instead
  * of a first-failure throw. */
class DslValidateSpec extends AnyFunSuite with SparkFixture {

  test("a 3-error query reports all 3 findings, each with a hint") {
    val q = QuerySpec(
      from = "orders",
      where = Some(Cmp("nope_col", "=", 1L)),              // unknown column
      groupBy = Seq("o_orderpriority"),
      aggregations = Seq(
        Agg("MEDIAN", Some("o_totalprice"), "med"),        // invalid function
        Agg("COUNT", None, "")))                           // missing alias
    val es = QueryDsl.validate(spark, SfDir, q)
    assert(es.size == 3, es.mkString("\n"))
    assert(es.map(_.field).toSet ==
      Set("where", "aggregations[0].function", "aggregations[1].alias"))
    assert(es.forall(_.hint.nonEmpty), "every finding carries a hint")
    val e = intercept[ValidationException](
      QueryDsl.compileValidated(spark, SfDir, q))
    assert(e.errors == es)
    assert(e.getMessage.startsWith("3 validation errors:"))
    assert(e.getMessage.contains("MEDIAN") && e.getMessage.contains("nope_col"))
  }

  test("an unknown FROM table early-returns a single finding, like the reference") {
    val es = QueryDsl.validate(spark, SfDir,
      QuerySpec(from = "nope", fields = Seq("also_nope")))
    assert(es.map(e => (e.field, e.value)) == Seq(("from", "nope")))
    assert(es.head.hint.contains("Valid tables"))
  }

  test("join scope, aliases and GROUP BY columns resolve; bad join fields do not") {
    // valid: HAVING references the aggregation alias, orderBy the GROUP BY
    val ok = QuerySpec(
      from = "orders",
      joins = Seq(Join("customer", "o_custkey", "c_custkey")),
      groupBy = Seq("c_mktsegment"),
      aggregations = Seq(Agg("COUNT", None, "n")),
      having = Some(Cmp("n", ">", 0L)),
      orderBy = Seq(Order("c_mktsegment")))
    assert(QueryDsl.validate(spark, SfDir, ok).isEmpty)
    assert(QueryDsl.compileValidated(spark, SfDir, ok).count() > 0)
    // invalid: unknown join table AND an unknown left key accumulate;
    // orderBy does NOT cascade a duplicate — GROUP BY columns enter the
    // available set unconditionally, as the reference does
    val bad = ok.copy(joins = Seq(Join("nope_tbl", "nope_key", "c_custkey")))
    val es = QueryDsl.validate(spark, SfDir, bad)
    assert(es.map(_.field).toSet ==
      Set("joins[0].table", "joins[0].leftField", "groupBy"),
      es.mkString("\n"))
  }

  test("limit/offset bounds and unsupported operators are ledgered") {
    val q = QuerySpec(from = "orders",
      where = Some(Cmp("o_totalprice", "=~", 1L)),
      limit = Some(0), offset = -1)
    val es = QueryDsl.validate(spark, SfDir, q)
    assert(es.map(_.field).sorted == Seq("limit", "offset", "where"))
  }
}
