package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The v3 band-rider layout packs emb/sigs to binary at INDEX time and
  * unpacks at the SCAN boundary — consumers must see bit-identical
  * arrays, or every banded query's oracle hash drifts. Pins:
  * pack→unpack is the identity (floats: every IEEE bit pattern incl.
  * denormals and NaN payloads; longs: the full [0, 2^32) signature
  * range), and scoring over the round-tripped arrays is bit-identical
  * to scoring the originals — in both codegen modes, corpus embeddings
  * included. */
class PackedVectorSpec extends AnyFunSuite with SparkFixture {

  import graft.functions.{PackedVectorFunctions => P, VectorFunctions => V}

  test("pack→unpack floats is the identity, bit for bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(314)
    def v(n: Int) = Array.fill(n)((rnd.nextDouble() * 2 - 1).toFloat)
    val rows = (Seq(
      Array.empty[Float],
      Array(0.0f, -0.0f, Float.MinPositiveValue, Float.MaxValue,
        Float.NegativeInfinity, Float.NaN,
        java.lang.Float.intBitsToFloat(0x7fc12345)) // NaN payload
    ) ++ Seq.fill(40)(v(64))).toDF("a")
    val got = rows.select(col("a"), P.unpackFloats(P.packFloats(col("a"))).as("b"))
      .collect()
    got.foreach { r =>
      val a = r.getSeq[Float](0); val b = r.getSeq[Float](1)
      assert(a.length == b.length)
      a.indices.foreach(i => assert(
        java.lang.Float.floatToRawIntBits(a(i)) ==
          java.lang.Float.floatToRawIntBits(b(i)),
        s"bit drift at $i: ${a(i)} vs ${b(i)}"))
    }
  }

  test("pack→unpack longs is the identity on the signature range") {
    import spark.implicits._
    val rnd = new scala.util.Random(2718)
    val rows = (Seq(Seq.empty[Long], Seq(0L, 1L, 4294967295L, 2147483648L)) ++
      Seq.fill(50)(Seq.fill(1 + rnd.nextInt(32))(rnd.nextLong().abs % 4294967296L)))
      .toDF("a")
    val got = rows.select(col("a"), P.unpackLongs(P.packLongs(col("a"))).as("b"))
      .collect()
    got.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  private def assertScoresIdentical(): Unit = {
    val emb = Tables.embeddings(spark, SfDir)
      .select(col("embedding").as("a"), reverse(col("embedding")).as("b"))
    val rows = emb.select(
      V.cosineSim(col("a"), col("b")).as("cos_arr"),
      V.cosineSim(P.unpackFloats(P.packFloats(col("a"))),
        P.unpackFloats(P.packFloats(col("b")))).as("cos_rt"),
      V.dotProduct(col("a"), col("b")).as("dot_arr"),
      V.dotProduct(P.unpackFloats(P.packFloats(col("a"))),
        P.unpackFloats(P.packFloats(col("b")))).as("dot_rt"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)))
    }
  }

  test("scoring round-tripped corpus embeddings is bit-identical, both codegen modes") {
    assertScoresIdentical()
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assertScoresIdentical()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("first-equal probe over round-tripped signatures matches the original") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val rows = Seq.fill(200) {
      val n = 1 + rnd.nextInt(32)
      val a = Array.fill(n)(rnd.nextLong().abs % 4294967296L)
      val b = Array.fill(n)(rnd.nextLong().abs % 4294967296L)
      if (rnd.nextBoolean()) { val i = rnd.nextInt(n); b(i) = a(i) }
      (a.toSeq, b.toSeq)
    }.toDF("a", "b")
    val got = rows.select(
      functions.ArrayFunctions.firstEqualIndex(col("a"), col("b")).as("orig"),
      functions.ArrayFunctions.firstEqualIndex(
        P.unpackLongs(P.packLongs(col("a"))),
        P.unpackLongs(P.packLongs(col("b")))).as("rt"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }
}
