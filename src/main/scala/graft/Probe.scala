package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = docs.select(col("doc_id"),
      regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)).as("ts"))
    time("tokens-only")(toks.selectExpr("sum(size(ts))").collect())
    time("ngram")(graft.operators.DedupOps.dedupNgramJaccard(spark, dir).count())
    time("minhash")(graft.operators.DedupOps.dedupMinhashLsh(spark, dir).count())
    time("simhash")(graft.operators.DedupOps.dedupSimhash(spark, dir).count())
    time("ngram2")(graft.operators.DedupOps.dedupNgramJaccard(spark, dir).count())
  }
}
