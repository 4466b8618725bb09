package graft.sources

import org.apache.spark.sql.DataFrame

/** Storage layout for the materialized index: bucketed (and optionally
  * partition-pruned) parquet tables.
  *
  * Reference analogue: project-cortex persists its index into SQLite tables
  * keyed by chunk/file id (internal/storage/schema.go:157). At cluster
  * scale the equivalent is a bucketed table per index relation: joins
  * between relations bucketed on the same key (chunks⋈files⋈embeddings by
  * doc id) are co-located and need NO shuffle — the test suite asserts the
  * exchange-free plan.
  */
object IndexStore {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table. Bucket
    * count is a deploy-time knob: at 100 TB you size buckets so one bucket
    * of the largest relation fits an executor's scan budget. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int = 8): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Write `df` partitioned by a low-cardinality column (e.g. lang) so
    * tag-filtered scans prune whole directories. */
  def writePartitioned(df: DataFrame, table: String, partCol: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .partitionBy(partCol)
      .saveAsTable(table)
}
