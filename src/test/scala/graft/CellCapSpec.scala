package graft

import org.scalatest.funsuite.AnyFunSuite
import operators.SearchOps

/** The exact-cell cap is DERIVED from the pair budget (one budget governs
  * the salt slicer and the detonation guard), integer-exact at power
  * boundaries, and replayed verbatim by the dedup_semantic oracle's
  * `routed` flag — the BucketConfSpec identity discipline applied to the
  * last formerly-hand-set scale constant.
  */
class CellCapSpec extends AnyFunSuite with SparkFixture {

  test("isqrt is the exact floor root at and around perfect squares") {
    for (k <- Seq(0L, 1L, 2L, 63L, 64L, 90509L, 3037000499L)) {
      val sq = k * k
      assert(SearchOps.isqrt(sq) == k, s"isqrt($k²)")
      if (sq > 0) assert(SearchOps.isqrt(sq - 1) == k - 1, s"isqrt($k²-1)")
      // k=0: 0²+1 = 1² exactly, the next root up
      assert(SearchOps.isqrt(sq + 1) == (if (k == 0) 1 else k), s"isqrt($k²+1)")
    }
    // float-rounding trap: 2^62 is exactly representable but sqrt() of
    // nearby longs rounds — the multiplication check must correct it
    assert(SearchOps.isqrt(Long.MaxValue) == 3037000499L)
  }

  test("default cap = isqrt(default budget × max slices), shared with the slicer") {
    val expected = SearchOps.isqrt(
      SearchOps.KnnPairBudgetDefault * SearchOps.KnnMaxSaltSlices)
    assert(expected == 90509L, "8M pairs × 1024 slices → 90,509-vector cells")
    assert(SearchOps.exactCellCap(spark) == expected)
    // boundary is multiplication-verified, never float-rounded
    assert(expected * expected <=
      SearchOps.KnnPairBudgetDefault * SearchOps.KnnMaxSaltSlices)
    assert((expected + 1) * (expected + 1) >
      SearchOps.KnnPairBudgetDefault * SearchOps.KnnMaxSaltSlices)
  }

  test("the conf moves the cap and the oracle replays the SAME value") {
    spark.conf.set(SearchOps.KnnPairBudgetConf, "1024")
    try {
      // 1024 pairs × 1024 slices = 1024² → cap lands EXACTLY on 1024
      assert(SearchOps.exactCellCap(spark) == 1024L)
      val sql = SparkEntry.oracleSql("dedup_semantic")
      val m = "cell_n > (\\d+)".r.findFirstMatchIn(sql)
      assert(m.exists(_.group(1) == "1024"),
        s"oracle must interpolate the session-derived cap, got: " +
          m.map(_.matched).getOrElse("no routed threshold in SQL"))
    } finally spark.conf.unset(SearchOps.KnnPairBudgetConf)
    // back at the default both engines agree on the default-budget cap
    assert("cell_n > (\\d+)".r
      .findFirstMatchIn(SparkEntry.oracleSql("dedup_semantic"))
      .exists(_.group(1) == "90509"))
  }

  test("a pathological budget cannot overflow the derivation") {
    spark.conf.set(SearchOps.KnnPairBudgetConf, Long.MaxValue.toString)
    try assert(SearchOps.exactCellCap(spark) == 3037000499L)
    finally spark.conf.unset(SearchOps.KnnPairBudgetConf)
  }
}
