package graft
import org.apache.spark.sql.SparkSession
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    args.drop(1).foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"TIME $n ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
