package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** 100 TB plan-shape contract for the fact-fact joins: when neither side
  * broadcasts (the cluster-scale regime — at sf0.1 the dim side fits in
  * one broadcast, at 100 TB it does not), Catalyst's runtime bloom-filter
  * injection must kick in: the selective-filtered side builds a bloom
  * filter that is pushed into the big side's scan, so the shuffle moves
  * only rows that can survive the join. This is the row-level analogue
  * of the parquet min/max skipping layout_zorder provides at file level.
  *
  * The thresholds exist to keep the optimization OFF at toy scale, so
  * the test simulates cluster conditions by zeroing the application-side
  * size threshold and disabling broadcast — the same plan a 1000-executor
  * job would get on real volumes.
  */
class RuntimeFilterSpec extends AnyFunSuite with SparkFixture {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("shuffle join at cluster scale gets a runtime bloom filter") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB") {
      val qe = Relational.q3JoinAgg(spark, SfDir).queryExecution
      val optimized = qe.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom filter injected:\n${optimized.take(1500)}")
      // and the filter sits on the SCAN side (below the join), so the
      // pruned rows never reach the exchange
      val physical = qe.executedPlan.toString
      assert(physical.contains("BloomFilterMightContain") ||
        physical.contains("might_contain"), physical.take(1500))
      assert("Exchange hashpartitioning".r.findAllIn(physical).nonEmpty,
        "expected the shuffle-join regime under test")
    }
  }

  test("with broadcast available the small dims still broadcast (no bloom)") {
    // the default regime at this scale: broadcast beats bloom; the
    // optimizer must not pay the filter-build when the join never
    // shuffles the big side
    val physical = Relational.q3JoinAgg(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"), physical.take(1200))
    assert(!physical.contains("might_contain"))
  }
}
