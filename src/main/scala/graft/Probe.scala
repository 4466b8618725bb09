package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Scratch plan-audit probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, dir)
        .queryExecution.explainString(FormattedMode))
    }
  }
}
