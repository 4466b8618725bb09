package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational core operators — the engine layer cortex builds its metadata
  * queries on (internal/mcp/metrics.go, internal/storage/query_helpers.go).
  *
  * All operators are declarative DataFrame plans: Catalyst handles pushdown,
  * pruning and join selection; we add broadcast hints only where a side is a
  * dimension table at any scale factor.
  */
object Relational {

  /** Multi-aggregate scan: TPC-H Q1 shape. Partial (map-side) aggregation
    * then a single shuffle on the low-cardinality group key.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
}
