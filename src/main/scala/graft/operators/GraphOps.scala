package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Code-graph query analogues over the supplier→part bipartite graph
  * derived from lineitem (edge = "supplier ships part").
  *
  * Reference analogue: project-cortex's graph searcher runs bounded-depth
  * traversals over edge tables — callers/callees, dependencies, impact
  * (internal/graph/searcher_sql.go:34, depth capped at 6).
  *
  * Scale posture: BFS is a fixed number of self-joins on the edge table
  * (depth is bounded, as in cortex), each a shuffle on the frontier key
  * with distinct() collapsing the frontier between hops — never an
  * unbounded recursion, and the frontier stays a thin (id) relation.
  */
object GraphOps {

  /** Distinct supplier→part edges, persisted and memoized per
    * (session, dir): every graph query references the edge relation from
    * at least two plan branches, and without materialization each branch
    * would re-scan and re-distinct lineitem (cortex materializes its edge
    * tables for the same reason, internal/storage/schema.go).
    */
  private def edges(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache.getOrBuild(spark, dir, "edges") {
      Tables.lineitem(spark, dir)
        .select(col("l_suppkey").as("src"), col("l_partkey").as("dst"))
        .distinct()
    }

  private val SeedMax = 10 // seed roots: suppliers with key < 10

  /** Bounded-depth (2-hop) reachability from the seed suppliers:
    * hop 1 = parts they ship, hop 2 = other suppliers shipping those
    * parts (cortex `dependencies`/`path` queries, searcher_sql.go).
    */
  def graphKhop(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    val hop1 = e.filter(col("src") < SeedMax)
      .select(col("dst")).distinct()
    val hop2 = e.join(hop1, "dst")
      .filter(col("src") >= SeedMax)
      .select(col("src")).distinct()
    hop1.select(lit(1).as("hop"), lit("part").as("node_type"), col("dst").as("node_id"))
      .unionAll(hop2.select(lit(2).as("hop"), lit("supplier").as("node_type"),
        col("src").as("node_id")))
  }

  /** Impact radius per seed root: how many distinct other suppliers are
    * reachable in 2 hops (cortex `impact` metric). The two edge scans
    * join through the part frontier only for seed-rooted paths.
    */
  def graphImpact(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    val out = e.filter(col("src") < SeedMax)
      .select(col("src").as("root"), col("dst"))
    out.join(e.select(col("dst"), col("src").as("nbr")), "dst")
      .filter(col("nbr") =!= col("root"))
      .groupBy(col("root"))
      .agg(countDistinct(col("nbr")).as("n_impacted"))
      .orderBy(col("root"))
  }

  /** Path query between seed roots (cortex `path`, searcher_sql.go): for
    * every ordered seed pair, the number of distinct length-2 paths
    * (shared parts). Both sides filter to seeds BEFORE the join, so the
    * join input is seeds' edges only, not the full edge table.
    */
  def graphPath(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    val a = e.filter(col("src") < SeedMax)
      .select(col("src").as("a_id"), col("dst"))
    val b = e.filter(col("src") < SeedMax)
      .select(col("src").as("b_id"), col("dst").as("b_dst"))
    a.join(b, col("dst") === col("b_dst") && col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(countDistinct(col("dst")).as("n_paths"))
  }

  /** In/out degree for every node of the bipartite graph (cortex
    * callers/callees counts): suppliers count distinct parts shipped,
    * parts count distinct shipping suppliers.
    */
  def graphDegree(spark: SparkSession, dir: String): DataFrame = {
    val e = edges(spark, dir)
    e.groupBy(col("src")).agg(count(lit(1)).as("degree"))
      .select(lit("supplier").as("node_type"), col("src").as("node_id"), col("degree"))
      .unionAll(
        e.groupBy(col("dst")).agg(count(lit(1)).as("degree"))
          .select(lit("part").as("node_type"), col("dst").as("node_id"), col("degree")))
  }
}
