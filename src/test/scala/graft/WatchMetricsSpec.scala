package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.WatchLoop

/** The watch loop's reload-metrics ledger (metrics.go:52 RecordReload
  * analogue): one row per micro-batch with duration/new-edge-count/error,
  * folded into the reference's snapshot counters. */
class WatchMetricsSpec extends AnyFunSuite with SparkFixture {

  test("watch loop records a per-batch reload ledger and snapshot") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = WatchLoop.start(spark, SfDir, mem.toDF().toDF("src", "dst"))
    try {
      assert(WatchLoop.metrics(spark, SfDir).totalReloads == 0L,
        "a fresh watch starts with a fresh ledger")
      mem.addData((0L, 888888L))
      q.processAllAvailable()
      val led1 = WatchLoop.reloadLedger(spark, SfDir).collect()
      assert(led1.map(_.getAs[Long]("n_new_edges")).sum == 1L,
        "the new edge is ledgered exactly once")
      assert(led1.forall(_.getAs[String]("error") == null))
      assert(led1.forall(_.getAs[Long]("duration_ms") >= 0L))
      val edgesAfter = led1.map(_.getAs[Long]("total_edges")).max
      assert(edgesAfter > 1L, "total_edges counts the seeded table too")
      // a re-notified edge is a no-op reload — still RECORDED (the
      // reference records every reload), appending zero edges
      mem.addData((0L, 888888L))
      q.processAllAvailable()
      val m = WatchLoop.metrics(spark, SfDir)
      assert(m.totalReloads >= 2L)
      assert(m.failedReloads == 0L)
      assert(m.successfulReloads == m.totalReloads)
      assert(m.currentEdgeCount == edgesAfter,
        "a no-op reload leaves the edge count unchanged")
      assert(WatchLoop.reloadLedger(spark, SfDir)
        .agg(sum(col("n_new_edges"))).head().getLong(0) == 1L)
    } finally {
      q.stop()
      WatchLoop.stop(spark, SfDir)
    }
  }

  test("batch twin: counters reconcile and both outcomes are covered") {
    val rows = operators.ChunkOps.watchReloadLog(spark, SfDir)
      .orderBy("reload_id").collect()
    assert(rows.nonEmpty)
    val last = rows.last
    assert(last.getAs[Long]("total_reloads") == rows.length.toLong)
    assert(last.getAs[Long]("successful_reloads") +
      last.getAs[Long]("failed_reloads") == rows.length.toLong)
    val (failed, ok) = rows.partition(_.getAs[String]("error") != null)
    assert(failed.nonEmpty && ok.nonEmpty,
      "the md5 failure pattern must exercise both outcomes")
    failed.foreach { r =>
      assert(r.getAs[Long]("n_chunks") == 0L, "a failed reload loads 0 chunks")
      val base = Math.floorDiv(r.getAs[Long]("n_new_edges") + 9, 10) +
        operators.ChunkOps.ReloadBaseMs
      assert(r.getAs[Long]("duration_ms") == base * 3, "failed = timeout shape")
    }
    ok.foreach(r =>
      assert(r.getAs[Long]("n_chunks") == r.getAs[Long]("n_new_edges")))
  }
}
