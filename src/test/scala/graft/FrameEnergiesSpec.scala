package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FrameEnergies (the native one-scan expression) must be value-identical
  * to the HOF formulation it replaced in MultimodalOps.mmFrameEnergy —
  * posexplode(sequence) + substr + split("") + transform(ascii) +
  * aggregate — including multi-byte and supplementary-plane payloads,
  * and n_chars that disagrees with the actual payload length in either
  * direction. Energy multiplies CAST TO LONG here (the oracle's BIGINT
  * arithmetic): the replaced lambda multiplied in IntegerType, which
  * under Spark 4's default ANSI mode threw on supplementary-plane
  * cp² — a divergence from the oracle the native expression closes.
  * The oracle replays this math in SQL, so this equality IS the hash
  * gate for mm_frame_energy. */
class FrameEnergiesSpec extends AnyFunSuite with SparkFixture {

  /** The pre-round-14 HOF chain, verbatim. */
  private def hofRows(df: DataFrame, nc: Column): DataFrame =
    df
      .select(col("text"), nc.cast("int").as("nc"))
      .filter(col("nc") >= 1)
      .select(col("text"), col("nc"),
        posexplode(sequence(lit(1), col("nc"), lit(50))))
      .select(col("text"), col("pos").cast("long").as("frame_idx"),
        col("text").substr(col("col"), lit(50)).as("frame"))
      .select(col("text"), col("frame_idx"),
        slice(transform(split(col("frame"), ""), c => ascii(c)),
          lit(1), length(col("frame"))).as("bs"))
      .select(col("text"), col("frame_idx"),
        size(col("bs")).cast("long").as("n_samples"),
        aggregate(col("bs"), lit(0L),
          (acc, b) => acc + b.cast("long") * b.cast("long")).as("energy_sum"))

  private def nativeRows(df: DataFrame, nc: Column): DataFrame =
    df
      .select(col("text"), nc.cast("int").as("nc"))
      .filter(col("nc") >= 1)
      .select(col("text"),
        posexplode(functions.ArrayFunctions.frameEnergies(
          col("text"), col("nc"), 50)))
      .select(col("text"), col("pos").cast("long").as("frame_idx"),
        col("col.n").cast("long").as("n_samples"),
        col("col.e").as("energy_sum"))

  private def compare(df: DataFrame, nc: Column): Unit = {
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val h = hofRows(df, nc).collect().map(key).sortBy(t => (t._1, t._2))
    val n = nativeRows(df, nc).collect().map(key).sortBy(t => (t._1, t._2))
    assert(h.nonEmpty)
    assert(n.toSeq == h.toSeq,
      s"frame rows diverge:\nnative=${n.take(5).mkString("; ")}\n" +
        s"hof=${h.take(5).mkString("; ")}")
  }

  test("native frame stats == HOF chain on crafted payloads") {
    import spark.implicits._
    val rows = Seq(
      "a",                                    // single char, one frame
      "b" * 50,                               // exactly one full frame
      "c" * 51,                               // frame boundary + 1
      ("ab" * 60) + ("zz" * 40),              // two energy regimes
      "Ünïcödé–παράδειγμα→文字テキスト測試" * 9, // 2- and 3-byte code points
      "x" * 31 + "𝄞" * 40 + "y" * 33,         // supplementary plane: cp²
                                              // needs the long multiply
      "the quick brown fox jumps over the lazy dog " * 7
    ).toDF("text").withColumn("nc", length(col("text")))
    compare(rows, col("nc"))
    // n_chars larger than the payload: trailing frames read (0, 0)
    compare(rows, col("nc") * 2)
    // n_chars smaller: trailing text is ignored, the last frame still
    // reads its full 50-char slice from the REAL text
    compare(rows.filter(length(col("text")) >= 100), col("nc") / 2)
  }

  test("native frame stats == HOF chain on the corpus, both codegen modes") {
    val docs = Tables.documents(spark, SfDir)
      .filter(col("n_chars") >= 1)
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
