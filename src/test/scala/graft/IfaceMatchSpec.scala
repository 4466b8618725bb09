package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** graph_iface_match (interface_matcher.go analogue): relational division
  * with embedded-interface flattening. */
class IfaceMatchSpec extends AnyFunSuite with SparkFixture {

  private def corpus(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ifm").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("division, flattening, cycles, wildcard, and the seed gate") {
    val dir = corpus(Seq(
      // interfaces (doc_id % 40 == 0)
      40L -> "stream reader query fetch query close", // methods {fetch, close}
      80L -> "stream base query open", // methods {open}
      120L -> "stream ext batch base query extra", // own {extra} + embeds base -> {extra, open}
      160L -> "stream empty", // no methods -> wildcard row
      200L -> "stream a batch b query m1", // cycle a <-> b
      240L -> "stream b batch a query m2", // both resolve {m1, m2}
      280L -> "stream base query other", // 2nd 'base': embeds resolve to MIN doc 80
      // NOT an interface: not on the seed stride
      41L -> "stream notseed query zz",
      // concrete types
      1L -> "table t1 query fetch query close query open",
      2L -> "table t2 query fetch", // partial match on reader -> rejected
      3L -> "table t3 query extra query open query m1 query m2"))
    val out = GraphOps.graphIfaceMatch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .toSet
    val expected = Set(
      (1L, "t1", 40L, "reader", 2L), // {fetch, close} subset of t1's methods
      (1L, "t1", 80L, "base", 1L),
      (3L, "t3", 80L, "base", 1L),
      (3L, "t3", 120L, "ext", 2L), // flattened {extra, open}
      (3L, "t3", 200L, "a", 2L), // cycle-flattened {m1, m2}
      (3L, "t3", 240L, "b", 2L),
      (-1L, "*", 160L, "empty", 0L)) // empty iface -> wildcard, not n_types edges
    assert(out == expected)
    // in particular: no edge for the partial match (t2/reader), none for the
    // non-seed stream (notseed), and (280, base) has methods but no implementor
    assert(!out.exists(e => e._2 == "t2"))
    assert(!out.exists(e => e._4 == "notseed"))
    assert(!out.exists(e => e._3 == 280L))
  }

  test("division is broadcast-shaped: no nested-loop struct x iface scan") {
    // the reference's InferImplementations is a struct × iface double loop;
    // the relational division must never plan that shape — iface-side
    // relations broadcast, candidates come from the method-name join
    val plan = GraphOps.graphIfaceMatch(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"division must not degrade to all-pairs:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"iface-side relations must broadcast into the corpus probe:\n$plan")
  }

  test("flattening is depth-capped and deterministic on an embed chain") {
    // chain i0 <- i1 <- ... each adds one method; depth cap 6 bounds the union
    val chain = (0 to 8).map { k =>
      val imports = if (k < 8) s" batch s${k + 1}" else ""
      (k * 40L + 40L) -> s"stream s$k$imports query m$k"
    }
    val tAll = 1L -> ("table tall " + (0 to 8).map(k => s"query m$k").mkString(" "))
    val dir = corpus(chain :+ tAll)
    val out = GraphOps.graphIfaceMatch(spark, dir).collect()
      .map(r => (r.getString(3), r.getLong(4))).toMap
    // s0 resolves m0..m6 (6 embed hops past itself), s8 just m8
    assert(out("s0") == 7L)
    assert(out("s8") == 1L)
  }
}
