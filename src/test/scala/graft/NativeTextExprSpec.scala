package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 native replacements for interpreted per-row chains must be
  * value-identical to the formulations they replaced (the oracle
  * replays those in SQL):
  *  - AlphaCount vs length(regexp_replace(lower(text), "[^a-z]", ""));
  *  - the TermFreqs-fold tf vs size(filter(toks, isin));
  *  - graph_context's native KeywordDecls extraction vs the
  *    transform+filter HOF walk it replaced. */
class NativeTextExprSpec extends AnyFunSuite with SparkFixture {

  private def alphaRegex: Column =
    length(regexp_replace(lower(col("text")), "[^a-z]", ""))

  test("AlphaCount == regex formulation, crafted + corpus, both eval modes") {
    import spark.implicits._
    val crafted = Seq(
      "", "abc", "ABC xyz 123 !?", "ÜNÏCÖDE müßig Straße",
      "İstanbul DİYARBAKIR", // İ lowercases to i + combining dot
      "παράδειγμα κείμενο", "文字テキスト mixed Latin99",
      "𝄞 clef and 𝒜 script" // supplementary plane
    ).toDF("text")
    def check(df: DataFrame): Unit = df
      .select(graft.functions.Tokenize.alphaCount(col("text")).as("n"),
        alphaRegex.as("r"))
      .collect()
      .foreach(r => assert(r.getInt(0) == r.getInt(1)))
    check(crafted)
    check(Tables.documents(spark, SfDir).select(col("text")))
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      check(crafted)
      check(Tables.documents(spark, SfDir).select(col("text")))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("TermFreqs-fold count == size(filter(isin)) on the corpus") {
    val terms = Seq("the", "a", "is")
    val toks = graft.functions.Tokenize.tokens(col("text"))
    val rows = Tables.documents(spark, SfDir)
      .select(
        aggregate(graft.functions.ArrayFunctions.termFreqs(toks, terms),
          lit(0L), (acc, x) => acc + x).cast("int").as("native"),
        size(filter(toks, t => t.isin(terms: _*))).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("graph_context == the replaced transform+filter HOF extraction") {
    // the pre-round-14 formulation, verbatim
    val ts = col("ts")
    def decls(kw: String, kind: String): Column =
      filter(
        transform(ts, (x, i) =>
          when(x === lit(kw) && i < size(ts) - 1,
            struct(
              element_at(ts, (i + lit(2)).cast("int")).as("symbol"),
              lit(kind).as("kind"),
              (i + lit(1)).cast("long").as("pos")))
            .otherwise(lit(null))),
        _.isNotNull)
    val k = operators.PatternOps.SymbolKinds
    val hof = Tables.documents(spark, SfDir)
      .select(col("doc_id"), graft.functions.Tokenize.tokens(col("text")).as("ts"))
      .select(col("doc_id"), explode(concat(k.map {
        case (kw, kd) => decls(kw, kd) }: _*)).as("d"))
      .select(col("doc_id"), col("d.symbol"), col("d.kind"), col("d.pos"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val native = operators.GraphOps.graphContext(spark, SfDir)
      .select(col("doc_id"), col("symbol"), col("kind"), col("pos"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(native.nonEmpty)
    assert(native.toSeq == hof.toSeq)
  }
}
