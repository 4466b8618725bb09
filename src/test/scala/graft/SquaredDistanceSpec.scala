package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SquaredDistance (the native expression) must be BIT-identical to the
  * HOF fold it replaced in the k-means/PQ assignment steps —
  * aggregate(zip_with(v, c, (a,b) => (a-b)*(a-b)), 0.0, _+_) — because
  * the k-means oracle contract pins "distances accumulate in DOUBLE over
  * the array in index order" and DuckDB replays exactly that chain.
  * Bit-identity is asserted through doubleToRawLongBits, in both codegen
  * modes, including the HOF's null semantics (unequal lengths and null
  * elements yield null; empty arrays yield the fold's 0.0 init).
  */
class SquaredDistanceSpec extends AnyFunSuite with SparkFixture {

  /** The pre-round-13 HOF chain, verbatim. */
  private def hofSqDist(v: Column, c: Column): Column =
    aggregate(zip_with(v, c, (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)

  private def compare(df: DataFrame): Unit = {
    val both = df.select(
      functions.VectorFunctions.squaredDistance(col("a"), col("b")).as("native"),
      hofSqDist(col("a"), col("b")).as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null mismatch: native=${r.get(0)} hof=${r.get(1)}")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
          java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
          s"bit mismatch: native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
  }

  private def crafted = {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows: Seq[(Seq[java.lang.Double], Seq[java.lang.Double])] = Seq(
      (Seq[java.lang.Double](), Seq[java.lang.Double]()),      // empty → 0.0
      (Seq[java.lang.Double](1.0), Seq[java.lang.Double]()),   // unequal → null
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](0.5, 2.0)), // null elem → null
      (Seq[java.lang.Double](1e300, -1e300), Seq[java.lang.Double](-1e300, 1e300)), // overflow → Inf
      (Seq[java.lang.Double](0.1, 0.2, 0.3), Seq[java.lang.Double](0.3, 0.2, 0.1))
    ) ++ (1 to 20).map { _ =>
      val n = 1 + rnd.nextInt(64)
      (Seq.fill(n)(java.lang.Double.valueOf(rnd.nextGaussian())),
        Seq.fill(n)(java.lang.Double.valueOf(rnd.nextGaussian())))
    }
    rows.toDF("a", "b")
  }

  test("native == HOF bit-for-bit on crafted + random arrays") {
    compare(crafted)
  }

  test("native == HOF in interpreted mode too") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      compare(crafted)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("native == HOF on the corpus embeddings vs a fixed centroid") {
    val emb = Tables.embeddings(spark, SfDir)
      .select(col("embedding").cast("array<double>").as("a"))
    val cent = emb.limit(1).select(col("a").as("b"))
    compare(emb.crossJoin(broadcast(cent)))
  }
}
