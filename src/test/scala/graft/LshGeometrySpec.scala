package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The spark.graft.lshBands/lshBits deploy knobs: any geometry must keep
  * LSH precision at 1 (candidates are exact-cosine-verified, so results
  * can only be a subset of the all-pairs truth), an exhaustive geometry
  * must recover the truth exactly, and each geometry must get its own
  * derived-table identity.
  */
class LshGeometrySpec extends AnyFunSuite with SparkFixture {
  import graft.sources.IndexStore

  /** Ground truth: all-pairs exact cosine >= 0.42 within label cells —
    * the relation dedup_embedding approximates. */
  private def exactPairs(): Set[(Long, Long)] = {
    val emb = Tables.embeddings(spark, SfDir)
      .select(col("label"), col("vec_id"), col("embedding"))
    emb.join(emb.select(col("label").as("bl"), col("vec_id").as("b_id"),
        col("embedding").as("b_emb")),
        col("label") === col("bl") && col("vec_id") < col("b_id"))
      .select(col("vec_id"), col("b_id"),
        functions.VectorFunctions.fastRound(
          functions.VectorFunctions.cosineSim(col("embedding"), col("b_emb")), 4)
          .as("score"))
      .filter(col("score") >= 0.42)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def lshPairs(): Set[(Long, Long)] =
    operators.DedupOps.dedupEmbedding(spark, SfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def withGeometry[T](bands: Int, bits: Int)(body: => T): T = {
    spark.conf.set(operators.DedupOps.LshBandsConf, bands.toString)
    spark.conf.set(operators.DedupOps.LshBitsConf, bits.toString)
    try body finally {
      spark.conf.unset(operators.DedupOps.LshBandsConf)
      spark.conf.unset(operators.DedupOps.LshBitsConf)
    }
  }

  test("any geometry is precision-1; an exhaustive one recovers the truth") {
    val truth = exactPairs()
    assert(truth.nonEmpty || lshPairs().isEmpty)
    // selective geometry (8 bits): results must be verified true pairs
    val selective = withGeometry(16, 8)(lshPairs())
    assert(selective.subsetOf(truth),
      s"LSH returned a non-true pair: ${selective.diff(truth)}")
    // exhaustive geometry (64 x 1-bit): for a pair at cosine >= 0.42 the
    // per-bit agreement is >= 1 - acos(0.42)/pi ~= 0.64, so missing all
    // 64 single-bit bands has probability ~(0.36)^64 — the fixed md5
    // hyperplanes on the fixed test corpus recover every true pair
    val exhaustive = withGeometry(64, 1)(lshPairs())
    assert(exhaustive == truth,
      s"missed: ${truth.diff(exhaustive)}, extra: ${exhaustive.diff(truth)}")
  }

  test("geometry folds into the derived-table identity") {
    withGeometry(16, 8) {
      assert(operators.DedupOps.dedupEmbedding(spark, SfDir).count() >= 0)
      val t = IndexStore.derivedTableName(spark, SfDir, "emb_bands_v2_g16x8")
      assert(spark.catalog.tableExists(t), t)
    }
    // default confs answer from the default table, not a geometry-tagged one
    val d = IndexStore.derivedTableName(spark, SfDir, "emb_bands_v2")
    assert(operators.DedupOps.dedupEmbedding(spark, SfDir).count() >= 0)
    assert(spark.catalog.tableExists(d), d)
  }

  test("out-of-range geometry fails loudly") {
    intercept[IllegalArgumentException](
      withGeometry(0, 4)(operators.DedupOps.lshGeometry(spark)))
    intercept[IllegalArgumentException](
      withGeometry(32, 40)(operators.DedupOps.lshGeometry(spark)))
  }
}
