package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch per-query isolated-timing probe for round-13 optimization
  * (dev tool, not part of the driver contract). */
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
    args.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      noop(fn(spark, dir)) // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        noop(fn(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"DISSECT $n min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
