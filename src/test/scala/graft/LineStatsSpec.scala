package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LineStats (the native one-scan expression) must be value-identical to
  * the HOF formulation it replaced in curateGopherRules —
  * filter(split(text, "\n"), …) plus three interpreted per-line walks
  * with ltrim/rtrim copies — including control chars, CRLF endings,
  * multibyte bullets (•) and ellipses (…), and whitespace-only lines.
  * The driver hash-checks curate_gopher_rules, so this equality IS the
  * hash gate for the rewrite.
  */
class LineStatsSpec extends AnyFunSuite with SparkFixture {

  /** The pre-round-13 HOF formulation, verbatim. */
  private def hofStats(df: DataFrame): DataFrame = {
    val ls = filter(split(col("text"), "\n"), l => length(rtrim(l)) > 0)
    df.select(col("text"),
      size(ls).as("h_lines"),
      size(filter(ls, l => ltrim(l).startsWith("-") ||
        ltrim(l).startsWith("*") || ltrim(l).startsWith("•"))).as("h_bullet"),
      size(filter(ls, l => rtrim(l).endsWith("...") ||
        rtrim(l).endsWith("…"))).as("h_ellip"))
  }

  private def compare(df: DataFrame): Unit = {
    val both = hofStats(df)
      .withColumn("lst", functions.ArrayFunctions.lineStats(col("text")))
      .select(col("text"), col("h_lines"), col("h_bullet"), col("h_ellip"),
        col("lst.n_lines"), col("lst.n_bullet"), col("lst.n_ellip"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) ==
        (r.getInt(4), r.getInt(5), r.getInt(6)),
        s"mismatch for ${r.getString(0).take(80).replace("\n", "\\n")}: " +
          s"hof=(${r.getInt(1)},${r.getInt(2)},${r.getInt(3)}) " +
          s"native=(${r.getInt(4)},${r.getInt(5)},${r.getInt(6)})")
    }
  }

  private def crafted = {
    import spark.implicits._
    Seq(
      "",                                     // one empty segment, dropped
      "\n\n\n",                               // only empty segments
      "   \n\t\r\n  \t ",                     // whitespace-only lines
      "- bullet\n* star\n• dot bullet\n-x\nno bullet",
      "  - indented bullet\n\t* tab bullet\n • vertical-tab bullet",
      "ends...\nends…\nends...   \nends… \t\nno end\nends...x",
      "one line no newline",
      "trailing newline\n",
      "crlf line\r\nanother\r\n- crlf bullet\r\nends...\r\n",
      "•\n-\n*\n...\n…",                      // minimal kept lines
      "mixed • not at start\nnot - a bullet",
      "Ünïcödé line…\n– en-dash is not a bullet\n• Ünïcödé bullet",
      (1 to 50).map(i => s"line $i" + (if (i % 3 == 0) "..." else ""))
        .mkString("\n")
    ).toDF("text")
  }

  test("native == HOF on crafted payloads") {
    compare(crafted)
  }

  test("native == HOF on the corpus, both codegen modes") {
    val docs = Tables.documents(spark, SfDir).select(col("text"))
    compare(docs)
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      compare(docs)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
