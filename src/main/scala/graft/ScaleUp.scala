package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 stress-corpus generator (dev tool, not part of the driver
  * contract): union `copies` KEY-SHIFTED replicas of every sf0.1 table
  * into a 10× corpus, preserving referential integrity within each
  * replica (customer/orders/lineitem/part/supplier key families shift by
  * the same per-copy offset) while keeping replicas mutually disjoint
  * (joins never match across copies, so join and group cardinalities
  * scale linearly — the shape a real 10× corpus has).
  *
  * Texts get a per-copy marker token and embeddings a per-copy ±0.1%
  * component nudge so the near-dup/semantic structure stays sparse
  * instead of minting 10-way true-duplicate groups (which would grow
  * quadratic pair counts no real corpus growth produces — same reasoning
  * as ScaleProbe.synth). Copy 0 is byte-identical to sf0.1.
  *
  * Each table lands as ONE parquet file (<name>.parquet) so
  * scripts/check_oracle.py can register it in DuckDB exactly like the
  * driver corpora.
  *
  * Usage: runMain graft.ScaleUp [baseDir] [outDir] [copies]
  */
object ScaleUp {

  /** Per-copy key offset — far above any base key at these SFs. */
  private val Off = 100000000L

  private def writeSingle(df: DataFrame, target: String): Unit = {
    val spark = df.sparkSession
    val tmp = target + ".tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(tmp).getFileSystem(conf)
    val part = fs.globStatus(new org.apache.hadoop.fs.Path(tmp, "part-*.parquet"))
      .head.getPath
    val dst = new org.apache.hadoop.fs.Path(target)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(part, dst)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    println(s"[scaleup] wrote $target")
  }

  def main(args: Array[String]): Unit = {
    val base = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft-sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(name: String, keyCols: Seq[String],
        perturb: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val t = spark.read.parquet(s"$base/$name.parquet")
      val parts = (0 until copies).map { c =>
        val shifted = keyCols.foldLeft(t)((d, k) =>
          d.withColumn(k, col(k) + lit(c.toLong * Off)))
        perturb(shifted, c)
      }
      writeSingle(parts.reduce(_ unionAll _), s"$out/$name.parquet")
    }

    // dimension tables stay as-is (every replica shares them, like a
    // real corpus shares its region/nation vocabulary)
    Seq("region", "nation").foreach { name =>
      writeSingle(spark.read.parquet(s"$base/$name.parquet"),
        s"$out/$name.parquet")
    }
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate("documents", Seq("doc_id"), (d, c) =>
      if (c == 0) d
      else d.withColumn("text", concat(col("text"), lit(s" copymark$c")))
        .withColumn("n_chars", length(col("text")).cast("long")))
    replicate("embeddings", Seq("vec_id"), (d, c) =>
      if (c == 0) d
      else d.withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          (x + (lit(c) * (pmod(i, lit(5)) - 2)).cast("float") * 0.001f)
            .cast("float"))))
    spark.stop()
  }
}
