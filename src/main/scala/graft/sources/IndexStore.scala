package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** The materialized search index for one corpus dir. */
  final case class IndexTables(docs: String, embById: String,
      embByLabel: String)

  private val built = new ConcurrentHashMap[(SparkSession, String), IndexTables]()

  private val Buckets = 8

  /** Build (once per session+dir) the bucketed search index the query
    * operators read — the cortex index-build step (chunk → tokenize →
    * store, internal/storage/chunk_writer.go) as bucketed parquet tables:
    *
    *  - `docs`: pre-tokenized documents bucketed by doc_id (tokenization
    *    is INDEX-time work, not query-time work);
    *  - `embById`: embeddings bucketed by vec_id, co-located with `docs`
    *    for the 1:1 hybrid join;
    *  - `embByLabel`: embeddings bucketed by the IVF cell label for
    *    cell-local self-joins.
    *
    * Joins between tables bucketed on the join key need NO exchange — at
    * 100 TB that turns the two fact-fact search joins from full shuffles
    * of both relations into co-located per-bucket joins.
    */
  def index(spark: SparkSession, dir: String): IndexTables = {
    built.keySet.removeIf(k => k._1.sparkContext.isStopped)
    built.computeIfAbsent((spark, dir), _ => {
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val t = IndexTables(s"graft_docs$tag", s"graft_emb_id$tag",
        s"graft_emb_lbl$tag")
      val names = Seq(t.docs, t.embById, t.embByLabel)
      if (names.forall(spark.catalog.tableExists)) {
        // another session sharing this catalog already built the index for
        // this dir — REUSE it; dropping here would yank tables out from
        // under that session's running queries
        t
      } else {
        // a prior PROCESS's warehouse dir may linger while this catalog is
        // empty — saveAsTable then fails with LOCATION_ALREADY_EXISTS, so
        // clear both catalog entry and physical location before writing
        val wh = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"))
        val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
        names.foreach { name =>
          spark.sql(s"DROP TABLE IF EXISTS $name")
          val p = new org.apache.hadoop.fs.Path(wh, name.toLowerCase)
          if (fs.exists(p)) fs.delete(p, true)
        }
        val docs = graft.Tables.documents(spark, dir)
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
            graft.functions.Tokenize.tokens(col("text")).as("toks"))
        val emb = graft.Tables.embeddings(spark, dir)
        writeBucketed(docs, t.docs, "doc_id", Buckets)
        writeBucketed(emb, t.embById, "vec_id", Buckets)
        writeBucketed(emb, t.embByLabel, "label", Buckets)
        t
      }
    })
  }
}
