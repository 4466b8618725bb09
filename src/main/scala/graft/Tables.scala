package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the graft engine.
  *
  * Schema-on-read from the parquet footers (no inference scan); at cluster
  * scale these would be catalog tables with partition pruning — here each
  * table is a single parquet file per scale factor.
  *
  * Reference analogue: project-cortex stores its index in SQLite tables
  * (internal/storage/schema.go:157); we read columnar parquet so filters and
  * projections push down to the scan.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      // virtual views the DSL can query like stored tables
      case "files" => files(spark, dir)
      case _ => spark.read.parquet(s"$dir/$name.parquet")
    }

  /** The reference's `files` table shape (internal/storage/schema.go;
    * files_tool.go queries it and its `modules` rollup): each document is
    * a file at `source/doc_id`, `module_path` is the path's source
    * PREFIX, and `line_count` is the 80-column line estimate — a pure
    * projection over the documents scan, so module rollups stay one
    * scan + one aggregate. */
  def files(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(s, d, "documents").select(
      concat_ws("/", col("source"), col("doc_id")).as("file_path"),
      col("source").as("module_path"),
      col("lang"), col("n_chars"),
      expr("(n_chars + 79) div 80").as("line_count"))
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) in parquet, which Spark only reads as a
    * long under spark.sql.legacy.parquet.nanosAsLong. Normalize to a proper
    * TimestampType column (microsecond precision, same truncation DuckDB
    * applies) while keeping the raw long for total-order tiebreaks.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    // dynamic conf so events reads work even from a caller-built session
    // that didn't set the flag at construction time
    if (s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .forall(_ != "true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      // `div` (integral division), NOT `/`: Spark's `/` promotes to double,
      // and nanos-since-epoch exceeds double's 53-bit mantissa — the
      // round-trip would perturb ~µs for a fraction of rows. `div`
      // truncates toward zero, which matches DuckDB's ns→µs conversion;
      // pre-epoch (negative) timestamps would need floor semantics instead,
      // and this corpus has none.
      raw.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
    else raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
