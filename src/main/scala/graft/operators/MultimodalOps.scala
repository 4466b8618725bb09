package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal columns: media as opaque binary with typed metadata.
  *
  * The corpus has no real image/audio bytes, so `text` is cast to binary as
  * the stand-in payload and DECODE IS A DETERMINISTIC FAKE (header-byte
  * arithmetic instead of a codec). Everything Spark-side — the binary
  * schema, metadata extraction shape, frame-offset generation, pruned
  * scans — is real and is what a production pipeline would keep, swapping
  * the fake decode for a vectorized decode over `mapInPandas`-style
  * batches.
  */
object MultimodalOps {

  /** Typed metadata off an opaque binary column: payload size plus a fake
    * header decode (format from the id, dimensions from the first byte).
    */
  def mmBinaryMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        ascii(substring(col("text"), 1, 1)).as("b0"))
      .select(col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpeg")
          .otherwise("webp").as("format"),
        (lit(64) + (col("b0") % 16) * 8).as("width"),
        (lit(64) + (col("b0") % 8) * 16).as("height"))

  /** Deterministic frame sampling: one sample every 100 bytes, at most 8
    * frames per payload — posexplode over computed offsets, then a 1-byte
    * probe per frame. The Generate is narrow (no shuffle); at scale each
    * task samples only its own rows.
    */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(1), least(col("n_chars"), lit(701)), lit(100))))
      .select(col("doc_id"), col("pos").as("frame_idx"),
        ascii(expr("substr(text, col, 1)")).as("byte_val"))
}
