package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch stage-attribution probe for round-13 optimization (dev tool,
  * not part of the driver contract; deleted before round end if unused). */
object DissectProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes",
        s"${graft.GraftConf.splitBytes(dir, cpus.toInt)}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config(graft.GraftConf.fromEnv())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(df: => DataFrame): Unit = {
      noop(df) // warm
      val t0 = System.nanoTime()
      noop(df)
      println(f"DISSECT $name ${(System.nanoTime() - t0) / 1e9}%.3fs")
    }

    // warm shared builds the way Bench's warmup pass does
    noop(SearchOps.vecKnnJoinAuto(spark, dir))
    noop(SearchOps.vecKnnJoinAnn(spark, dir))
    noop(DedupOps.dedupEmbedding(spark, dir))

    val cap = spark.conf.getOption(SearchOps.AutoCapConf).map(_.toLong)
      .getOrElse(SearchOps.AutoCapDefault)
    val emb = spark.table(graft.sources.IndexStore.index(spark, dir).embByLabel)
    val cellSizes = emb.groupBy(col("label")).agg(count(lit(1)).as("n"))

    time("auto:census")(cellSizes)
    time("auto:full")(SearchOps.vecKnnJoinAuto(spark, dir))
    time("ann:full")(SearchOps.vecKnnJoinAnn(spark, dir))
    time("embdedup:full")(DedupOps.dedupEmbedding(spark, dir))
    time("knn_exact:full")(SearchOps.vecKnnJoin(spark, dir))
    time("bands:scan")(DedupOps.embBands(spark, dir))
    // auto branches in isolation
    val cs2 = emb.groupBy(col("label")).agg(count(lit(1)).as("cell_n"))
    val small = cs2.filter(col("cell_n") <= cap).select(col("label"))
    val big = cs2.filter(col("cell_n") > cap).select(col("label"))
    val ssq = graft.functions.VectorFunctions.sumSquares _
    val a = emb.join(broadcast(small), "label")
      .select(col("label"), col("vec_id").as("a_id"), col("embedding").as("a_emb"),
        ssq(col("embedding")).as("a_ss"))
    val b = emb.select(col("label").as("b_label"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), ssq(col("embedding")).as("b_ss"))
    time("auto:exactPairs")(a.join(b,
      col("label") === col("b_label") && col("a_id") < col("b_id")))
    val bands = DedupOps.embBands(spark, dir).join(broadcast(big), "label")
    time("auto:bandScan")(bands)
    spark.stop()
  }
}
