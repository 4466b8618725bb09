package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The spark.graft.indexBuckets deploy knob: every bucketed index/derived
  * table must honor a non-default count, keep the co-located joins
  * exchange-free at that count, fold the count into the table identity
  * (no silent reuse of a differently-bucketed layout), and produce the
  * same query results as the default layout.
  */
class BucketConfSpec extends AnyFunSuite with SparkFixture {
  import graft.sources.IndexStore

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("non-default count: fresh index tables, exchange-free join, same result") {
    val base = sortedRows(operators.SearchOps.hybridSearch(spark, SfDir))
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set(IndexStore.BucketsConf, "4")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = operators.SearchOps.hybridSearch(spark, SfDir)
      assert(sortedRows(df) == base,
        "bucket count is a layout knob — results must not change")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must stay exchange-free at a non-default count:\n$plan")
      val tables = IndexStore.index(spark, SfDir)
      assert(tables.docs.endsWith("_b4"),
        s"bucket count must be part of the table identity: ${tables.docs}")
      assert(spark.catalog.tableExists(tables.docs))
    } finally {
      spark.conf.unset(IndexStore.BucketsConf)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
    }
    // back at the default, the default-count tables answer again
    assert(IndexStore.index(spark, SfDir).docs.endsWith("_b8"))
  }

  test("derived tables fold the count into their identity") {
    spark.conf.set(IndexStore.BucketsConf, "4")
    try {
      assert(operators.DedupOps.simhashCandidates(spark, SfDir).count() > 0)
      val t4 = IndexStore.derivedTableName(spark, SfDir, "simhash_bands")
      assert(t4.contains("_b4_"), t4)
      assert(spark.catalog.tableExists(t4))
    } finally spark.conf.unset(IndexStore.BucketsConf)
    val t8 = IndexStore.derivedTableName(spark, SfDir, "simhash_bands")
    assert(t8.contains("_b8_"), t8)
  }

  test("a bucket count below 1 fails loudly") {
    spark.conf.set(IndexStore.BucketsConf, "0")
    try intercept[IllegalArgumentException](IndexStore.buckets(spark))
    finally spark.conf.unset(IndexStore.BucketsConf)
  }

  test("auto mode self-sizes from corpus bytes; pinned conf still wins") {
    // the default: no conf (or the literal `auto`) sizes from dir bytes.
    // The local corpus is tiny, so the default target lands on the floor.
    assert(IndexStore.buckets(spark, SfDir) == 8)
    // shrink the per-bucket target until the corpus spans >16 targets —
    // auto must pick the next pow2 ABOVE the floor, identically from
    // every resolver (the identity rule: builders and name-resolvers
    // must never disagree on the count)
    // the sizing rule reads docs+emb bytes only (the relations the
    // bucketed tables derive from)
    val bytes = {
      val p = new org.apache.hadoop.fs.Path(SfDir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq("documents.parquet", "embeddings.parquet")
        .map(n => fs.getFileStatus(new org.apache.hadoop.fs.Path(p, n)).getLen)
        .sum
    }
    spark.conf.set(IndexStore.TargetBytesConf, (bytes / 20).toString)
    try {
      val n = IndexStore.buckets(spark, SfDir)
      assert(n == 32, s"ceil(20 targets) -> pow2 32, got $n") // 20 < 32 <= 4096
      assert(IndexStore.index(spark, SfDir).docs.endsWith(s"_b$n"),
        "auto-sized count must be part of the table identity")
      assert(IndexStore.derivedTableName(spark, SfDir, "simhash_bands")
        .contains(s"_b${n}_"))
      // a pinned integer conf overrides auto at any target
      spark.conf.set(IndexStore.BucketsConf, "4")
      assert(IndexStore.buckets(spark, SfDir) == 4)
    } finally {
      spark.conf.unset(IndexStore.TargetBytesConf)
      spark.conf.unset(IndexStore.BucketsConf)
    }
  }
}
