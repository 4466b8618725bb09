package graft

import org.apache.spark.sql.SparkSession

/** Recall-vs-probes study for the trained-quantizer KNN (dev tool):
  * recall@10 of vec_knn_kmeans against the brute-force top-10 as nprobe
  * sweeps 1..8, plus the fraction of the corpus scanned per probe count.
  * Results land in docs/SCALE_NOTES.md.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    import org.apache.spark.sql.functions._
    val exact = operators.SearchOps.vecKnnBrute(spark, dir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // loop-invariant: per-cluster sizes for the scan-cost denominator
    val counts = operators.SearchOps.vecKmeans(spark, dir)
      .groupBy(col("cluster")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    (1 to 8).foreach { nprobe =>
      val got = operators.SearchOps.vecKnnKmeansProbes(spark, dir, nprobe)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val recall = (exact intersect got).size.toDouble / exact.size
      val clusters = operators.SearchOps.kmeansProbe(spark, dir, nprobe)
        .select("cluster").collect().map(_.getInt(0)).toSet
      val frac = clusters.toSeq.map(c => counts.getOrElse(c, 0L)).sum / total
      println(f"RECALL nprobe=$nprobe recall@10=$recall%.2f scanned=${frac * 100}%5.1f%%")
    }
    // routed dedup_semantic: drop-set recall of the banded path as the
    // cell cap shrinks (cap=MaxValue is the all-exact reference; every
    // cell whose size exceeds the cap goes through band blocking)
    val exactDrops = operators.DedupOps
      .dedupSemanticCapped(spark, dir, Long.MaxValue).collect()
      .collect { case r if !r.getBoolean(2) => r.getLong(0) }.toSet
    Seq(500L, 100L, 50L, 10L, 1L).foreach { cap =>
      val drops = operators.DedupOps.dedupSemanticCapped(spark, dir, cap)
        .collect().collect { case r if !r.getBoolean(2) => r.getLong(0) }.toSet
      val sound = drops.subsetOf(exactDrops)
      val recall =
        if (exactDrops.isEmpty) 1.0
        else (drops intersect exactDrops).size.toDouble / exactDrops.size
      println(f"SEMROUTE cap=$cap%6d recall=$recall%.3f sound=$sound " +
        f"drops=${drops.size}/${exactDrops.size}")
    }
    spark.stop()
  }
}
