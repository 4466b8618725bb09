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
      // empty payloads yield no frames (the oracle's range() is empty);
      // without this guard sequence(1, 0) would throw for n_chars = 0
      .filter(col("n_chars") >= 1)
      .select(col("doc_id"), col("text"),
        posexplode(sequence(lit(1), least(col("n_chars"), lit(701)), lit(100))))
      .select(col("doc_id"), col("pos").as("frame_idx"),
        ascii(expr("substr(text, col, 1)")).as("byte_val"))

  /** Per-frame energy over the opaque payload — the audio
    * feature-extraction shape (frame = 50 bytes, energy = sum of squared
    * sample values): explode byte positions, then ONE aggregate keyed on
    * (doc, frame). Distinct from mm_frame_sample's narrow probe: this is
    * the windowed-AGGREGATE-over-binary pattern a real feature stage
    * (MFCC/energy/zero-crossing) runs per frame, with the sample decode
    * being the honest stand-in (ascii byte value — no codec ships here).
    * Integer math end-to-end, so the oracle verifies exactly.
    */
  def mmFrameEnergy(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("n_chars") >= 1)
      // ONE native code-point scan per payload (FrameEnergies): the
      // previous shape exploded frame offsets and sliced per frame, but
      // substr(text, p, 50) re-scans the string from the start to FIND
      // char offset p (O(len²/frame) per doc), and the per-frame decode
      // ran split("") + transform(ascii) + aggregate — three interpreted
      // HOF walks allocating a per-char string array per frame. The
      // native pass decodes each code point once, in order, and emits
      // the per-frame (n_samples, energy) structs the explode turns into
      // the same rows (value-identity pinned in FrameEnergiesSpec,
      // including the n_chars≠length(text) and int-wrap edges). Still no
      // shuffle, still frame-bounded peak memory — the struct array is
      // 2 fields per 50-char frame, ~50× smaller than one frame's
      // exploded per-char array.
      .select(col("doc_id"),
        posexplode(graft.functions.ArrayFunctions.frameEnergies(
          col("text"), col("n_chars").cast("int"), 50)))
      .select(col("doc_id"), col("pos").cast("long").as("frame_idx"),
        col("col.n").cast("long").as("n_samples"),
        col("col.e").as("energy_sum"))

  /** Perceptual-hash geometry: [[PhashFrames]] equal payload slices, one
    * average-hash bit each (energy above the payload mean ⇒ 1) → a 32-bit
    * signature; near-dup = hamming <= [[PhashTau]]. Four 8-bit bands give
    * the pigeonhole guarantee (3 differing bits over 4 bands always leave
    * one band untouched), so banding is EXACT candidate generation — the
    * same discipline as the simhash text dedup. At corpora where an 8-bit
    * band value goes hot (millions of payloads per bucket), the knobs are
    * the ones aHash deployments actually turn: more frames → wider bands
    * (64-frame/16-bit needs unsigned-shift care at bit 63), or a
    * format/size block key folded into the bucket key like the simhash
    * (lang, length-bucket) fold. */
  private[graft] val PhashFrames = 32
  private[graft] val PhashTau = 3
  private val PhashBands = 4

  /** The signature/band relation, built once per (session, dir) as a
    * table bucketed on (band, bv) — the candidate self-join's exact keys,
    * so it reads both sides co-located with no exchange. Energies are
    * INTEGER sums of squared byte values over equal character slices
    * (the honest stand-in for decoded pixel/sample blocks, as in
    * [[mmFrameEnergy]]); the bit threshold compares e·F > total, so the
    * whole signature is exact integer math in every engine. */
  private[graft] def phashBands(spark: SparkSession, dir: String): DataFrame =
    spark.table(graft.sources.IndexStore.derivedBucketed(spark, dir,
      "phash_bands", Seq("band", "bv")) {
      // whole signature in ONE native code-point scan (PhashSignature,
      // codegen'd): the previous formulation — split("") + transform
      // (ascii) + 32 interpreted slice/aggregate walks per payload —
      // was the dominant mm-family cost at sf10 (8.9 s heavies wall).
      // PhashExprSpec pins hash-identity against the HOF formulation,
      // including multi-byte and supplementary-plane payloads.
      val bandStructs = (0 until PhashBands).map { b =>
        struct(lit(b).as("band"),
          (shiftright(col("ph"), b * 8) % 256).as("bv"))
      }
      Tables.documents(spark, dir)
        .filter(col("n_chars") >= PhashFrames)
        .select(col("doc_id"),
          graft.functions.ArrayFunctions.phashSignature(
            col("text"), col("n_chars").cast("int"), PhashFrames).as("ph"))
        .select(col("doc_id"), col("ph"),
          explode(array(bandStructs: _*)).as("b"))
        .select(col("doc_id"), col("ph"),
          col("b.band").as("band"), col("b.bv").as("bv"))
    })

  /** Near-duplicate detection over the OPAQUE payload — the multimodal
    * twin of dedup_simhash: banded-LSH candidates from the bucketed
    * signature table (exchange-free self-join, never all-pairs), exact
    * xor + bit_count verify. This is how a training pipeline finds
    * re-encoded/resized copies of the same image without decoding
    * anything twice: signatures are one scan, candidates touch only
    * colliding band buckets. */
  def mmPhashDedup(spark: SparkSession, dir: String): DataFrame = {
    val bands = phashBands(spark, dir)
    bands
      .join(bands.select(col("doc_id").as("b_id"), col("ph").as("b_ph"),
          col("band").as("bb"), col("bv").as("b_bv")),
        col("band") === col("bb") && col("bv") === col("b_bv") &&
          col("doc_id") < col("b_id"))
      .select(col("doc_id").as("a_id"), col("b_id"),
        col("ph").as("a_ph"), col("b_ph"))
      .distinct()
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_ph").bitwiseXOR(col("b_ph"))).as("hamming"))
      .filter(col("hamming") <= PhashTau)
  }

  /** Media payload as it would arrive from an object store manifest. */
  case class MediaRow(doc_id: Long, payload: Array[Byte])
  /** Typed decode output — the schema a real codec stage would produce. */
  case class DecodedMeta(doc_id: Long, n_bytes: Int, format: String,
      width: Int, height: Int)

  /** The imperative-decode path: a typed mapPartitions over binary
    * payloads, the Scala analogue of a `mapInPandas` decode stage. The
    * per-partition iterator is where a real implementation hands batches
    * to an image/audio codec; THE DECODE ITSELF IS A DETERMINISTIC STUB
    * (header-byte arithmetic) because no codec ships in this environment.
    * Partitioning, batch shape, typed schema, and the codegen boundary
    * around the opaque function are the real, load-bearing parts.
    */
  /** Codec batch size: real decoders amortize setup over a batch the same
    * way mapInPandas hands pandas batches to Python. */
  private val DecodeBatch = 64

  def mmDecodeStub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // batch the iterator: one codec invocation per DecodeBatch payloads
        rows.grouped(DecodeBatch).flatMap { batch =>
          batch.map { r =>
            val b0 = if (r.payload.nonEmpty) r.payload(0) & 0xff else 0
            val fmt = (r.doc_id % 3) match {
              case 0 => "png"; case 1 => "jpeg"; case _ => "webp"
            }
            DecodedMeta(r.doc_id, r.payload.length, fmt,
              64 + (b0 % 16) * 8, 64 + (b0 % 8) * 16)
          }
        }
      }
      .toDF()
  }
}
