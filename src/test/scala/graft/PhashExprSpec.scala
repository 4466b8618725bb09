package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PhashSignature (the native one-scan expression) must be value-identical
  * to the HOF formulation it replaced in MultimodalOps.phashBands —
  * split("") + transform(ascii) + per-frame slice/aggregate — including
  * multi-byte and supplementary-plane payloads and n_chars that disagrees
  * with the actual payload length (slice-past-end semantics). The oracle
  * replays the HOF math in SQL, so this equality IS the hash gate for
  * mm_phash_dedup.
  */
class PhashExprSpec extends AnyFunSuite with SparkFixture {

  private val F = operators.MultimodalOps.PhashFrames

  /** The pre-round-13 HOF signature, verbatim. */
  private def hofSig(nc: Column): Column = {
    val codes = slice(transform(split(col("text"), ""), c => ascii(c)),
      lit(1), nc)
    val es = transform(sequence(lit(0), lit(F - 1)), f => {
      val s = floor(f * nc / F).cast("int") + 1
      val e = floor((f + 1) * nc / F).cast("int")
      aggregate(slice(codes, s, e - s + lit(1)),
        lit(0L), (acc, b) => acc + b.cast("long") * b.cast("long"))
    })
    val tot = aggregate(es, lit(0L), (a, x) => a + x)
    (0 until F).map { f =>
      when(element_at(es, f + 1) * F > tot, lit(1L << f)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  private def compare(df: DataFrame, nc: Column): Unit = {
    val both = df
      .select(col("text"),
        functions.ArrayFunctions.phashSignature(col("text"),
          nc.cast("int"), F).as("native"),
        hofSig(nc.cast("int")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"signature mismatch for ${r.getString(0).take(60)}: " +
          s"native=${r.getLong(1)} hof=${r.getLong(2)}")
    }
  }

  test("native signature == HOF signature on crafted payloads") {
    import spark.implicits._
    val rows = Seq(
      "a" * F,                               // minimal length, uniform
      ("ab" * 64) + ("zz" * 64),             // two energy regimes
      "Ünïcödé–παράδειγμα→文字テキスト測試" * 8, // 2- and 3-byte code points
      "x" * 31 + "𝄞" * 40 + "y" * 33, // supplementary plane (𝄞)
      (0 until 256).map(i => ('a' + i % 26).toChar).mkString,
      "the quick brown fox jumps over the lazy dog " * 10
    ).toDF("text").withColumn("nc", length(col("text")))
    compare(rows, col("nc"))
    // n_chars larger than the payload: trailing frames read zero energy
    compare(rows, col("nc") * 2)
    // n_chars smaller: only a prefix is hashed
    compare(rows.filter(length(col("text")) >= F * 2), col("nc") / 2)
  }

  test("native signature == HOF signature on the corpus, both codegen modes") {
    val docs = Tables.documents(spark, SfDir)
      .filter(col("n_chars") >= F)
      .select(col("text"), col("n_chars").cast("int").as("nc"))
    compare(docs, col("nc"))
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      compare(docs, col("nc"))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
