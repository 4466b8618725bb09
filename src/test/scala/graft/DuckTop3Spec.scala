package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression coverage for the duckTop3 oracle fragment (the bound-and-
  * filter top-3 replay every KNN-join oracle ranks through). The round-11
  * formulation's pruning bound was UNSOUND when an a_id's pairs occupied
  * fewer than 3 of the 4 b_id%4 buckets: min over 1-2 bucket maxes can
  * exceed the true 3rd-best key, silently dropping real top-3 rows — the
  * oracle would then spuriously FAIL (under-report rows) on corpora the
  * engine handles correctly. vec_knn_join_ann/auto rank per-vector
  * candidate sets that are routinely 2-5 pairs, so the small-bucket
  * shapes here are the common case, not a corner.
  *
  * The SQL is DuckDB dialect, so the spec replays it through the same
  * python3+duckdb the driver's oracle compare uses; boxes without that
  * stack cancel (assume) rather than fail.
  */
class DuckTop3Spec extends AnyFunSuite {

  private lazy val duckAvailable: Boolean =
    try new ProcessBuilder("python3", "-c", "import duckdb")
      .start().waitFor() == 0
    catch { case _: Exception => false }

  /** Run `sql` in DuckDB, return rows as comma-joined strings. */
  private def runDuck(sql: String): Seq[String] = {
    val f = java.nio.file.Files.createTempFile("ducktop3", ".sql")
    java.nio.file.Files.write(f,
      sql.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val py =
      """import duckdb, sys
        |sql = open(sys.argv[1]).read()
        |con = duckdb.connect()
        |for row in con.sql(sql).fetchall():
        |    print(','.join(str(v) for v in row))
        |""".stripMargin
    val pb = new ProcessBuilder("python3", "-c", py, f.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream)
      .getLines().toList
    assert(p.waitFor() == 0, s"duckdb run failed:\n${out.mkString("\n")}")
    java.nio.file.Files.deleteIfExists(f)
    out
  }

  private def top3(values: String): Seq[String] = {
    assume(duckAvailable,
      "python3+duckdb not available — oracle regression check skipped")
    runDuck(
      s"""WITH pairs AS (SELECT label, a_id, b_id, score::DOUBLE AS score
         |FROM (VALUES
         |$values
         |) AS t(label, a_id, b_id, score)),
         |${SparkEntry.duckTop3("pairs", routed = false)}
         |ORDER BY a_id, rk""".stripMargin)
  }

  test("2 buckets, 3 pairs: all 3 survive (the round-11 dropped-row bug)") {
    // b_id 0 and 4 share bucket 0; b_id 1 is bucket 1 — only 2 non-empty
    // buckets, so the old min-of-maxes bound was key(0.85) and filtered
    // the (4, 0.8) pair: 2 rows instead of 3
    val rows = top3("('l', 1, 0, 0.9), ('l', 1, 1, 0.85), ('l', 1, 4, 0.8)")
    assert(rows == Seq("l,1,0,0.9,1", "l,1,1,0.85,2", "l,1,4,0.8,3"))
  }

  test("1 bucket, 2 pairs: both survive") {
    // both pairs in bucket 0 — the old bound kept only the max
    val rows = top3("('l', 1, 0, 0.9), ('l', 1, 4, 0.8)")
    assert(rows == Seq("l,1,0,0.9,1", "l,1,4,0.8,2"))
  }

  test(">=3 buckets: the pruning bound is tight and exact") {
    val rows = top3(
      "('l', 1, 0, 0.9), ('l', 1, 1, 0.85), ('l', 1, 2, 0.8), " +
        "('l', 1, 3, 0.75), ('l', 1, 5, 0.7)")
    assert(rows == Seq("l,1,0,0.9,1", "l,1,1,0.85,2", "l,1,2,0.8,3"))
  }

  test("score ties rank by b_id ascending, per a_id independently") {
    val rows = top3(
      "('l', 1, 7, 0.5), ('l', 1, 3, 0.5), ('l', 1, 5, 0.5), " +
        "('l', 1, 6, 0.4), ('m', 2, 0, 0.9), ('m', 2, 8, 0.9)")
    assert(rows == Seq(
      "l,1,3,0.5,1", "l,1,5,0.5,2", "l,1,7,0.5,3",
      "m,2,0,0.9,1", "m,2,8,0.9,2"))
  }
}
