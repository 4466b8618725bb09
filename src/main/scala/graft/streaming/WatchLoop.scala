package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** The deployed watch loop — the reference's reload cycle
  * (internal/mcp/watcher.go: file events stream in; internal/mcp/loader.go
  * Reload: storage updated, in-memory index swapped) wired onto Spark
  * primitives: [[StreamingOps.streamingEdgeUpserts]] emits only
  * never-seen edges, and each non-empty micro-batch (1) appends them to
  * the session's edge table and (2) dir-scope-invalidates PlanCache so
  * every memoized BFS relation rebuilds against the updated graph on its
  * next use. An unchanged batch (every edge already in state) writes
  * nothing and invalidates nothing — the no-op reload.
  *
  * The override registry is IN-MEMORY (session-keyed), deliberately not
  * catalog-existence-based: a leftover physical table from a previous
  * process must never silently re-route a fresh session's graph queries
  * away from the batch relation (the correctness dump runs no watch loop
  * and must always read the canonical lineitem-derived edges).
  *
  * Scale posture: the append writes exactly the new edges (work ∝ churn,
  * the watch-mode property), the read path collapses the append log with
  * one distinct(), and invalidation is scoped to the changed dir so other
  * corpora's persisted relations stay live.
  */
object WatchLoop {

  private val live = new ConcurrentHashMap[(SparkSession, String), String]()

  /** The live watched edge relation for (session, dir), if a watch loop
    * is running — GraphOps.edges() consults this before falling back to
    * the batch relation. distinct() collapses the append log (a
    * re-notified edge that raced past the stream's state dedup is a
    * harmless duplicate row, exactly like the reference's idempotent
    * upsert). */
  private[graft] def edgeOverride(spark: SparkSession, dir: String): Option[DataFrame] =
    Option(live.get((spark, dir))).map(t => spark.table(t).distinct())

  /** Start watching: seed the edge table from the current batch relation,
    * register the override, and attach the stream. Returns the running
    * query; the caller owns its lifecycle. */
  def start(spark: SparkSession, dir: String,
      edgeStream: DataFrame): StreamingQuery = {
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val tbl = s"graft_watch_edges$tag"
    graft.sources.IndexStore.replaceTable(spark,
      graft.operators.GraphOps.batchEdges(spark, dir), tbl)
    live.put((spark, dir), tbl)
    // switch-over: memoized relations built from the batch path rebuild
    // through the override on next use
    graft.PlanCache.invalidate(dir)
    StreamingOps.streamingEdgeUpserts(edgeStream)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // anti-join against the table: the stream's dedup state starts
        // EMPTY while the table is seeded with the full batch relation,
        // so a watcher replaying current state at startup (the common
        // file-watcher pattern) would otherwise re-append ~every edge
        // and force a full invalidation for an unchanged graph. With the
        // anti-join, "unchanged" means unchanged vs the TABLE — the
        // no-op reload holds for replays too.
        val fresh = batch
          .join(batch.sparkSession.table(tbl), Seq("src", "dst"), "left_anti")
          .persist()
        try {
          if (fresh.count() > 0) {
            fresh.write.mode("append").format("parquet").saveAsTable(tbl)
            graft.PlanCache.invalidate(dir)
          }
        } finally { fresh.unpersist(); () }
      }
      .start()
  }

  /** Deregister the override (the caller stops the query) and drop the
    * dir's memoized relations so queries fall back to the batch path. */
  def stop(spark: SparkSession, dir: String): Unit = {
    live.remove((spark, dir))
    graft.PlanCache.invalidate(dir)
  }
}
