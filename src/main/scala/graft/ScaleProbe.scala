package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-behavior probe (dev tool, like Probe — not part of the driver
  * contract): synthesize corpora N× the sf0.1 documents table by unioning
  * PERTURBED copies (each copy appends a distinct marker token, so the
  * near-dup structure stays sparse instead of exploding quadratically with
  * true duplicates), then measure banded-LSH candidate generation against
  * the all-pairs-in-block baseline on identical signatures.
  *
  * This is the measurement behind the 100 TB claim for the dedup family:
  * all-pairs cost grows with block², band-join cost with true signature
  * collisions. Results land in docs/SCALE_NOTES.md.
  */
object ScaleProbe {

  private def synth(spark: SparkSession, baseDir: String, outDir: String,
      copies: Int): Unit = {
    val docs = Tables.documents(spark, baseDir)
    val parts = (0 until copies).map { c =>
      docs.select(
        (col("doc_id") + lit(c.toLong * 1000000L)).as("doc_id"),
        concat(col("text"), lit(s" copymark$c")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    parts.reduce(_ unionAll _).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")
  }

  /** All-pairs-in-(lang, lb)-block candidate generation over the SAME
    * signatures the banded operator uses — the round-1 formulation, kept
    * as the baseline under measurement. */
  private def allPairsSimhash(spark: SparkSession, dir: String): DataFrame = {
    val sigs = operators.DedupOps.simhashBands(spark, dir)
      .select(col("doc_id"), col("lang"), col("lb"), col("sig")).distinct()
    sigs.join(sigs.select(col("doc_id").as("b_id"), col("lang").as("b_lang"),
        col("lb").as("b_lb"), col("sig").as("b_sig")),
      col("lang") === col("b_lang") && col("lb") === col("b_lb") &&
        col("doc_id") < col("b_id"))
      .select(col("doc_id").as("a_id"), col("b_id"),
        bit_count(col("sig").bitwiseXOR(col("b_sig"))).as("hamming"))
      .filter(col("hamming") <= 5)
  }

  private def time(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  /** A 9-token footer appended to EVERY document — the planted boilerplate
    * that mints corpus-wide shared winnowing grams (df ≈ n_docs), the
    * hot-fingerprint failure dedupWinnow's df cap defends against. */
  private val Boiler =
    "generated export footer revision archive copy do not modify"

  private def synthBoiler(spark: SparkSession, baseDir: String,
      outDir: String): Unit =
    Tables.documents(spark, baseDir)
      .select(col("doc_id"), concat(col("text"), lit(" " + Boiler)).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

  /** Winnow candidate generation with and without the df cap, over the
    * SAME pre-built (persisted) inverted index, so the timing isolates the
    * candidate join — the measurement behind dedupWinnow's WinnowDfCap. */
  private def winnowCand(raw: DataFrame, cap: Option[Int]): DataFrame = {
    val inv = cap match {
      case Some(c) =>
        val hot = raw.groupBy(col("fp")).agg(count(lit(1)).as("df"))
          .filter(col("df") > c).select(col("fp"))
        raw.join(broadcast(hot), Seq("fp"), "left_anti")
      case None => raw
    }
    inv.join(inv.select(col("doc_id").as("b_id"), col("fp").as("b_fp")),
        col("fp") === col("b_fp") && col("doc_id") < col("b_id"))
      .select(col("doc_id").as("a_id"), col("b_id")).distinct()
  }

  /** Bucketed-table candidate join vs the same join over a CACHED
    * (non-bucketed) copy of the identical band relation — isolates what
    * the round-3 bucketed dedup tables buy: the cached variant shuffles
    * both sides into the join, the bucketed one reads co-located. */
  private def bucketedProbe(spark: SparkSession, base: String,
      copies: Int): Unit = {
    PlanCache.invalidate()
    val dir = s"/tmp/graft_scale/x$copies"
    synth(spark, base, dir, copies)
    // bucketed path (builds the table on first call — warm before timing)
    operators.DedupOps.simhashCandidates(spark, dir).count()
    val (tB, nB) = time(operators.DedupOps.simhashCandidates(spark, dir).count())
    // cached-DataFrame path over the SAME rows
    val cached = spark.table(
      sources.IndexStore.derivedTableName(spark, dir, "simhash_bands")).persist()
    cached.count()
    // same first-match-band condition as simhashCandidates, so the two
    // paths produce identical candidate sets and only the read strategy
    // (bucketed vs cached+shuffled) differs
    val joined = cached
      .join(cached.select(col("doc_id").as("b_id"), col("sig").as("b_sig"),
          col("band").as("bb"), col("bkey").as("b_bkey")),
        col("band") === col("bb") && col("bkey") === col("b_bkey") &&
          col("doc_id") < col("b_id") &&
          operators.DedupOps.simhashFirstBandProbe(col("sig"), col("b_sig"))
            === col("band"))
      .select(col("doc_id").as("a_id"), col("b_id"),
        col("sig").as("a_sig"), col("b_sig"))
    val (tC, nC) = time(joined.count())
    cached.unpersist()
    println(f"BUCKETED docs=${copies * 5000}%6d bucketed=$tB%6.2fs " +
      f"cached-shuffled=$tC%6.2fs ratio=${tC / tB}%5.2fx " +
      f"cands(bucketed=$nB, cached=$nC)")
  }

  private def winnowProbe(spark: SparkSession, base: String): Unit = {
    PlanCache.invalidate()
    val dir = "/tmp/graft_scale/boiler"
    synthBoiler(spark, base, dir)
    // warm the shared sketch pipeline once, as the simhash probe warms its
    // signatures: both strategies then time ONLY candidate generation
    val raw = operators.TextOps.winnowed(Tables.documents(spark, dir), col("text"))
      .select(col("doc_id"), col("sel")).filter(size(col("sel")) > 0)
      .select(col("doc_id"), explode(col("sel")).as("fp"))
      .persist()
    raw.count()
    val cap = operators.DedupOps.WinnowDfCap
    val (tCap, nCap) = time(winnowCand(raw, Some(cap)).count())
    val (tRaw, nRaw) = time(winnowCand(raw, None).count())
    raw.unpersist()
    println(f"WINNOW boilerplate-planted docs=5000 cap=$cap " +
      f"capped=$tCap%6.2fs/${nCap}%d-cands " +
      f"uncapped=$tRaw%6.2fs/${nRaw}%d-cands ratio=${tRaw / tCap}%5.2fx")
  }

  /** Decontamination at N×: the broadcast holdout-gram join against the
    * shuffle (sort-merge) formulation of the SAME join. The broadcast
    * path's only exchange is the final per-doc count; the shuffle path
    * repartitions the ENTIRE train-side gram stream (≈ corpus token
    * count) by gram hash — the cost that detonates at 100 TB. Both sides
    * return identical hit counts. */
  private def decontamProbe(spark: SparkSession, base: String,
      copies: Int): Unit = {
    PlanCache.invalidate()
    val dir = s"/tmp/graft_scale/x$copies"
    synth(spark, base, dir, copies)
    val (tB, nB) = time(
      operators.CurateOps.curateDecontaminate(spark, dir).count())
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (tS, nS) = try {
      // same relations, broadcast hint stripped -> planner picks SMJ
      val grams = operators.CurateOps.gramRows(
        Tables.documents(spark, dir)
          .filter(col("doc_id") % operators.CurateOps.HoldoutMod =!= 0)
          .select(col("doc_id"), col("text")))
      val hold = operators.CurateOps.holdoutGrams(spark, dir)
      time(grams.join(hold, "gram").groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // the exchange-volume asymmetry: the shuffle variant repartitions
    // every train-side gram row; broadcast ships only the holdout set
    val trainGrams = operators.CurateOps.gramRows(
      Tables.documents(spark, dir)
        .filter(col("doc_id") % operators.CurateOps.HoldoutMod =!= 0)
        .select(col("doc_id"), col("text"))).count()
    val holdGrams = operators.CurateOps.holdoutGrams(spark, dir).count()
    println(f"DECONTAM copies=$copies%2d docs=${copies * 5000}%6d " +
      f"broadcast=$tB%6.2fs shuffle=$tS%6.2fs ratio=${tS / tB}%5.2fx " +
      f"contaminated(broadcast=$nB, shuffle=$nS) " +
      f"exchange-rows(shuffle=$trainGrams, broadcast=$holdGrams)")
  }

  /** Embedding corpus at N×: perturbed copies (deterministic per-dim
    * jitter so directions spread instead of duplicating) with disjoint
    * vec_id ranges; copy 0 keeps the original rows so the probe query
    * vector (vec_id 0) exists. */
  private def synthEmb(spark: SparkSession, baseDir: String, outDir: String,
      copies: Int): Unit = {
    val emb = Tables.embeddings(spark, baseDir)
    val parts = (0 until copies).map { c =>
      val e = if (c == 0) col("embedding")
        else transform(col("embedding"), (x, i) =>
          x + sin(col("vec_id") * 31 + i * 7 + lit(c * 13)) * lit(0.01))
          .cast("array<float>")
      emb.select((col("vec_id") + lit(c.toLong * 10000000L)).as("vec_id"),
        e.as("embedding"), col("label"))
    }
    parts.reduce(_ unionAll _).write.mode("overwrite")
      .parquet(s"$outDir/embeddings.parquet")
  }

  private def dirBytes(p: String): Long = {
    val root = java.nio.file.Paths.get(p)
    if (!java.nio.file.Files.exists(root)) 0L
    else {
      val s = java.nio.file.Files.walk(root)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
  }

  /** PQ vs brute-force single-query KNN at N×: wall time (both warm),
    * top-10 recall, and the STORAGE ratio — the codes relation written as
    * parquet next to the raw embeddings it replaces on the scan path.
    * The storage column is the structural 100 TB claim (a query scans
    * codes + re-ranks ~100 raw rows instead of scanning every raw row);
    * local wall times over corpora this small mostly measure fixed plan
    * overheads, and are reported honestly as such. */
  private def pqProbe(spark: SparkSession, base: String, copies: Int): Unit = {
    PlanCache.invalidate()
    val dir = s"/tmp/graft_scale/emb$copies"
    synthEmb(spark, base, dir, copies)
    val brute = operators.SearchOps.vecKnnBrute(spark, dir)
    brute.count()
    val (tB, _) = time(brute.count())
    operators.SearchOps.vecKnnPq(spark, dir).count() // builds codebooks+codes
    val (tP, _) = time(operators.SearchOps.vecKnnPq(spark, dir).count())
    val bIds = brute.collect().map(_.getLong(0)).toSet
    val recall = operators.SearchOps.vecKnnPq(spark, dir).collect()
      .map(_.getLong(0)).count(bIds) / 10.0
    val codesDir = s"$dir/pq_codes.parquet"
    operators.SearchOps.pqCodes(spark, dir)
      .write.mode("overwrite").parquet(codesDir)
    val (rawB, codeB) = (dirBytes(s"$dir/embeddings.parquet"), dirBytes(codesDir))
    println(f"PQ copies=$copies%2d vecs=${copies * 2000}%6d " +
      f"brute=$tB%6.2fs pq=$tP%6.2fs recall@10=$recall%.1f " +
      f"parquet-bytes(raw=$rawB, codes=$codeB, ratio=${rawB.toDouble / codeB}%4.1fx)")
  }

  /** vec_knn_join_auto at N×: times the EXACT formulation (cap = ∞,
    * cell² cosines) against the ROUTED one (cap = 0, banded-LSH
    * candidates) over the identical synthesized corpus and warm shared
    * signature build, plus the routed top-3 edge recall vs exact. The
    * jittered copies are true near-duplicates, so band collisions grow
    * with corpus size — the candidate growth is semantic (those pairs
    * ARE neighbours), while the exact path grows with cell² regardless
    * of geometry. The crossover is the router's reason to exist. */
  private def autoProbe(spark: SparkSession, base: String,
      copies: Int): Unit = {
    PlanCache.invalidate()
    val dir = s"/tmp/graft_scale/emb$copies"
    synthEmb(spark, base, dir, copies)
    // the IndexStore build the auto op reads also indexes the docs side
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(base, "documents.parquet"),
      java.nio.file.Paths.get(dir, "documents.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    def runAt(cap: String): DataFrame = {
      spark.conf.set(operators.SearchOps.AutoCapConf, cap)
      try operators.SearchOps.vecKnnJoinAuto(spark, dir)
      finally spark.conf.unset(operators.SearchOps.AutoCapConf)
    }
    runAt(Long.MaxValue.toString).count() // warm: index + sig build
    val (tE, nE) = time(runAt(Long.MaxValue.toString).count())
    runAt("0").count()
    val (tR, nR) = time(runAt("0").count())
    val exact = runAt(Long.MaxValue.toString).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    val routed = runAt("0").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    val recall = exact.count(routed).toDouble / exact.size
    println(f"AUTO copies=$copies%2d vecs=${copies * 2000}%6d " +
      f"exact=$tE%6.2fs routed=$tR%6.2fs ratio=${tE / tR}%5.2fx " +
      f"edges(exact=$nE, routed=$nR) recall=$recall%.3f")
  }

  /** LSH-geometry recall/speed curve on a REAL corpus dir: for each bit
    * width, time vec_knn_join_ann under spark.graft.lshBits=bits and
    * measure its top-3 edge recall against the exact vec_knn_join on the
    * same corpus — the honesty companion to the geometry deploy knob
    * (collisions scale 1/2^bits; recall for a pair at per-bit agreement
    * p is 1-(1-p^bits)^bands, so wider sigs trade tail-similarity edges
    * for quadratic-work relief). Precision is 1 by construction (exact
    * verify inside the join), so recall is the only axis to watch. */
  private def geometryProbe(spark: SparkSession, dir: String,
      bitWidths: Seq[Int]): Unit = {
    val exact = operators.SearchOps.vecKnnJoin(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    bitWidths.foreach { bits =>
      spark.conf.set(operators.DedupOps.LshBitsConf, bits.toString)
      try {
        operators.SearchOps.vecKnnJoinAnn(spark, dir).count() // warm build
        val (t, _) = time(operators.SearchOps.vecKnnJoinAnn(spark, dir).count())
        val routed = operators.SearchOps.vecKnnJoinAnn(spark, dir).collect()
          .map(r => (r.getLong(1), r.getLong(2))).toSet
        val recall = exact.count(routed).toDouble / exact.size
        println(f"GEOMETRY bits=$bits%2d ann=$t%6.2fs " +
          f"edges(exact=${exact.size}, routed=${routed.size}) recall=$recall%.3f")
      } finally spark.conf.unset(operators.DedupOps.LshBitsConf)
    }
  }

  /** dedup_substring at N×: the synth marker tokens land at the END of
    * each copy, so for N ≥ 2 every document's whole 8-gram body is
    * duplicated across copies — TOTAL SATURATION, the adversarial case
    * where any pair-forming dedup op degenerates to N²-per-group
    * candidates. Coverage never forms pairs (hot grams mark positions,
    * the window sums them), so the probe's claim is that cost stays
    * linear in corpus size even when every gram is hot. */
  private def substrProbe(spark: SparkSession, base: String,
      copies: Int): Unit = {
    PlanCache.invalidate()
    val dir = s"/tmp/graft_scale/x$copies"
    synth(spark, base, dir, copies)
    val (t, n) = time(operators.DedupOps.dedupSubstring(spark, dir)
      .filter(col("n_dup_tok") > 0).count())
    println(f"SUBSTR copies=$copies%2d docs=${copies * 5000}%6d " +
      f"time=$t%6.2fs docs_with_dups=$n%d")
  }

  /** Data-skipping measurement behind layout_zorder: for rectangle
    * predicates (user range × time range) count the manifest shards a
    * min/max-pruning reader must touch under (a) the z-order layout and
    * (b) a time-sorted layout with the SAME shard count — the 1-D
    * baseline every unclustered pipeline ships. Manifests are ~256 rows,
    * so the driver-side intersection math is fine (dev probe, not an
    * operator). */
  private def zorderProbe(spark: SparkSession, base: String): Unit = {
    val e = Tables.events(spark, base)
      .select(col("user_id"), unix_micros(col("ts")).as("tu"))
    val b = e.agg(min(col("user_id")), max(col("user_id")),
      min(col("tu")), max(col("tu"))).collect()(0)
    val (ulo, uhi, tlo, thi) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val zMan = operators.LayoutOps.layoutZorder(spark, base).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val tMan = e
      .withColumn("shard",
        expr(s"((CAST(tu AS DECIMAL(38,0)) - ${tlo}L) * 255)" +
          s" div (${thi}L - ${tlo}L)"))
      .groupBy(col("shard"))
      .agg(count(lit(1)), min(col("user_id")), max(col("user_id")),
        min(col("tu")), max(col("tu"))).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val total = zMan.map(_._1).sum
    for (frac <- Seq(0.05, 0.10, 0.25)) {
      // probe rectangle: frac of each dim, centered
      val (uw, tw) = (((uhi - ulo) * frac).toLong, ((thi - tlo) * frac).toLong)
      val (uq0, tq0) = (ulo + (uhi - ulo - uw) / 2, tlo + (thi - tlo - tw) / 2)
      def touched(man: Array[(Long, Long, Long, Long, Long)]) = {
        val hit = man.filter { case (_, ul, uh, tl, th) =>
          uh >= uq0 && ul <= uq0 + uw && th >= tq0 && tl <= tq0 + tw }
        (hit.length, hit.map(_._1).sum)
      }
      val ((zS, zR), (tS, tR)) = (touched(zMan), touched(tMan))
      println(f"ZORDER rect=${(frac * 100).toInt}%2d%% " +
        f"shards z=$zS%3d/${zMan.length} t=$tS%3d/${tMan.length} " +
        f"rows z=$zR%7d t=$tR%7d total=$total%7d " +
        f"scanratio=${tR.toDouble / math.max(zR, 1)}%5.2fx")
    }
  }

  /** Sync cost vs churn rate: the stored chunk index is built (persisted)
    * ONCE over a synthesized corpus; each sweep point rewrites every k-th
    * doc and measures the full branch_sync query (reuse + rechunk + evict,
    * all rows counted) against the re-chunk-everything baseline. The
    * claim under measurement: sync cost approaches the cached-scan floor
    * as churn shrinks, while the full re-chunk stays corpus-sized. */
  private def branchProbe(spark: SparkSession, base: String,
      copies: Int): Unit = {
    PlanCache.invalidate()
    val dir = s"/tmp/graft_scale/bs_x$copies"
    synth(spark, base, dir, copies)
    val noDrops = 0 // dropMod <= 0 = structurally no deletions (doc_id 0
                    // survives too — a huge modulus would still drop it)
    val (tIdx, nIdx) = time(
      PlanCache.getOrBuild(spark, dir, "chunk_index_old") {
        operators.ChunkOps.chunkFps(Tables.documents(spark, dir))
      }.count())
    println(f"BRANCH copies=$copies%2d docs=${copies * 5000}%6d " +
      f"index_build=$tIdx%6.2fs chunks=$nIdx%8d")
    // per-chunk downstream cost proxy: an R-round md5 chain standing in
    // for the re-embedding work the reference's branch optimizer exists
    // to avoid (a model call dwarfs any chunk hashing; R dials the gap).
    // count() would PRUNE the computed columns (the Bench noop lesson),
    // so every measurement forces them through a length-sum aggregate.
    def embed(c: org.apache.spark.sql.Column, rounds: Int) =
      (1 to rounds).foldLeft(c)((x, _) => md5(x))
    def force(df: DataFrame, c: String): Long =
      df.agg(sum(length(col(c)))).head.getLong(0)
    for (k <- Seq(2, 10, 50, 250)) {
      val (tSync, _) = time(force(
        operators.ChunkOps.branchSyncWith(spark, dir, k, noDrops), "chunk_fp"))
      val (tFull, _) = time(force(operators.ChunkOps.chunkFps(
        operators.ChunkOps.newSnapshot(
          Tables.documents(spark, dir), k, noDrops)), "chunk_fp"))
      println(f"BRANCH k=$k%4d churn=${100.0 / k}%5.1f%% sync=$tSync%6.2fs " +
        f"full=$tFull%6.2fs ratio=${tFull / tSync}%5.2fx")
    }
    // fixed 2% churn, sweeping the per-chunk cost: sync re-embeds only
    // the rechunk rows (reuse rows keep their carried vector), full
    // re-embeds the entire corpus
    // 256+ rounds overruns whole-stage codegen's method-size limit —
    // 64 already demonstrates the crossover decisively
    for (rounds <- Seq(8, 64)) {
      val (tSync, _) = time(force(
        operators.ChunkOps.branchSyncWith(spark, dir, 50, noDrops)
          .withColumn("vec", when(col("action") === "rechunk",
            embed(col("chunk_fp"), rounds)).otherwise(col("chunk_fp"))), "vec"))
      val (tFull, _) = time(force(operators.ChunkOps.chunkFps(
        operators.ChunkOps.newSnapshot(Tables.documents(spark, dir), 50, noDrops))
        .withColumn("vec", embed(col("chunk_fp"), rounds)), "vec"))
      println(f"BRANCH embed_rounds=$rounds%4d churn=2.0%% sync=$tSync%6.2fs " +
        f"full=$tFull%6.2fs ratio=${tFull / tSync}%5.2fx")
    }
  }

  /** Batch-KNN stage attribution over a corpus dir: times the scored-pair
    * stage alone vs the full operator (pairs + TopKAgg) under each salt
    * factor, so block-join compute, scoring, and the top-k aggregate can
    * be costed separately. Each variant runs once warm, then twice timed
    * (min), on the SAME index tables. */
  private def knnProbe(spark: SparkSession, dir: String, salts: Seq[Int]): Unit = {
    def time(df: DataFrame): Double = {
      def pass(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      pass(); math.min(pass(), pass())
    }
    for (s <- salts) {
      val pairs = operators.SearchOps.knnPairsScored(spark, dir, s, Long.MaxValue)
      // same join, scoring pruned away — isolates pair ITERATION cost
      val joinOnly = pairs.select(col("label"), col("a_id"), col("b_id"))
      // posture as the operator does, so agg_delta reflects the real plan
      val full = functions.TopKAgg.posture(spark, pairs
        .groupBy(col("label"), col("a_id"))
        .agg(functions.TopKAgg.topK(col("score"), col("b_id"), 3).as("top"))
        .select(col("label"), col("a_id"), posexplode(col("top"))))
      val tj = time(joinOnly); val tp = time(pairs); val tf = time(full)
      println(f"KNN salt=$s%2d join=$tj%6.2fs pairs=$tp%6.2fs full=$tf%6.2fs " +
        f"score_delta=${tp - tj}%6.2fs agg_delta=${tf - tp}%6.2fs")
    }
  }

  /** Accuracy contracts for the two rows-only sketch operators, walked at
    * ANY corpus dir (the verify-SF contracts live in the test suite; this
    * mode re-pins them at sf1/sf10 inside the scale campaign so the
    * rows-only pair stays honest as the data grows): q9b's HLL++ counts
    * must sit within 10% of q9's exact distincts per group, q13b's
    * percentile_approx within 2% of q13's exact interpolated percentiles.
    * require()s the contract — a drifting sketch FAILS the campaign run
    * instead of printing a bad number quietly. */
  private def sketchProbe(spark: SparkSession, dir: String): Unit = {
    val exactD = operators.Relational.q9DistinctAgg(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val hll = operators.Relational.q9bApproxDistinct(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val hllDrift = exactD.map { case (k, ex) =>
      math.abs(hll(k) - ex) / ex }.max
    val exactP = operators.Relational.q13Percentiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val apxP = operators.Relational.q13bApproxPercentiles(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val pDrift = exactP.map { case (k, (p50, p95)) =>
      math.max(math.abs(apxP(k)._1 - p50) / p50,
        math.abs(apxP(k)._2 - p95) / p95) }.max
    println(f"SKETCH dir=$dir groups=${exactD.size} " +
      f"hll_max_drift=$hllDrift%.4f (contract 0.10) " +
      f"pctl_max_drift=$pDrift%.5f (contract 0.02)")
    require(hllDrift <= 0.10,
      f"q9b HLL++ drift $hllDrift%.4f breaks the 10%% accuracy contract")
    require(pDrift <= 0.02,
      f"q13b percentile_approx drift $pDrift%.5f breaks the 2%% contract")
  }

  /** Lineage-cut cost at scale: each iterative heavy (BFS closure, label
    * propagation, BPE merge rounds) runs warm-then-timed under the
    * default localCheckpoint AND under spark.graft.checkpointDir pointed
    * at a real on-disk store — the measured price of the fault-tolerant
    * path SCALE_NOTES argues a 1000-executor deployment pays. PlanCache
    * is invalidated between variants so each rebuilds its cuts instead of
    * answering from the other's memoized relations. */
  private def checkpointProbe(spark: SparkSession, dir: String,
      ckptDir: String): Unit = {
    val heavies = Seq("dedup_clusters", "graph_path_find_deep", "text_bpe_train")
    def timed(name: String): Double = {
      PlanCache.invalidate()
      val f = SparkEntry.queries(name)
      f(spark, dir).write.format("noop").mode("overwrite").save() // warm
      PlanCache.invalidate()
      val t0 = System.nanoTime()
      f(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    heavies.foreach { name =>
      spark.conf.unset(Checkpoints.DirConf)
      val tLocal = timed(name)
      spark.conf.set(Checkpoints.DirConf, ckptDir)
      val tReliable = try timed(name)
      finally spark.conf.unset(Checkpoints.DirConf)
      println(f"CHECKPOINT $name%-22s local=$tLocal%6.2fs " +
        f"reliable=$tReliable%6.2fs overhead=${tReliable / tLocal}%5.2fx")
    }
  }

  /** dedup_incremental's broadcast-vs-bucketed-shuffle routing, measured
    * at the corpus's own churn size: the same probe runs once with the
    * cap ABOVE the churn census (broadcast branch) and once with cap 0
    * (bucketed shuffle branch), result counts must agree — the routing is
    * a plan choice, not a semantics choice. */
  private def incrProbe(spark: SparkSession, dir: String): Unit = {
    import operators.DedupOps
    val churn = sources.IndexStore.churnDocs(spark, dir, 10, 7)
    def runAt(cap: Long): (Double, Long) = {
      spark.conf.set(DedupOps.IncrBroadcastDocsConf, cap.toString)
      try {
        DedupOps.dedupIncremental(spark, dir).count() // warm
        time(DedupOps.dedupIncremental(spark, dir).count())
      } finally spark.conf.unset(DedupOps.IncrBroadcastDocsConf)
    }
    val (tB, nB) = runAt(Long.MaxValue)
    val (tS, nS) = runAt(0L)
    println(f"INCR dir=$dir churn_docs=$churn " +
      f"broadcast=$tB%6.2fs shuffle=$tS%6.2fs ratio=${tS / tB}%5.2fx " +
      f"dups(broadcast=$nB, shuffle=$nS)")
    require(nB == nS, s"routing changed the result: $nB vs $nS")
  }

  /** Every BroadcastExchange in an executed plan, including the ones AQE
    * hides inside query stages and subqueries; ReusedExchange is skipped
    * (it shares the original's buffer — no extra driver/executor memory). */
  private def broadcastsIn(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.exchange.BroadcastExchangeExec] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec        => Seq(s.plan)
      case _: ReusedExchangeExec    => Nil
      case other                    => other.children
    }
    val here = p match { case b: BroadcastExchangeExec => Seq(b); case _ => Nil }
    here ++ (kids ++ p.subqueries).flatMap(broadcastsIn)
  }

  /** Driver-memory audit of the broadcast inventory: run every registered
    * query against `dir`, read each BroadcastExchange's actual dataSize
    * metric from the executed plan, and print the top spenders. The plans
    * broadcast centroid tables, PQ LUTs, df/rate stats, high-df line sets
    * and the decontamination gram set — each ARGUED small in its
    * operator's scaladoc; this mode measures them at probe scale so the
    * argument has a number (any broadcast approaching the 8 GiB hard cap
    * or executor memory needs a documented cap or a re-plan). Queries
    * whose tables are absent from a partial probe corpus are skipped. */
  private def broadcastProbe(spark: SparkSession, dir: String): Unit = {
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, f) =>
        try {
          // execute THIS dataframe's own QueryExecution: df.count() would
          // plan a separate groupBy().count() execution, leaving the plan
          // instance traversed below unexecuted and every metric unset
          val qe = f(spark, dir).queryExecution
          qe.toRdd.foreachPartition(it => while (it.hasNext) it.next())
          val sizes = broadcastsIn(qe.executedPlan)
            .map(_.metrics("dataSize").value)
          Some((name, sizes.size, sizes.sum,
            if (sizes.isEmpty) 0L else sizes.max))
        } catch {
          case scala.util.control.NonFatal(e) =>
            println(s"BROADCAST $name SKIP ${e.getClass.getSimpleName}")
            None
        }
    }
    rows.sortBy(-_._4).take(10).foreach { case (n, c, tot, mx) =>
      println(f"BROADCAST $n%-28s n=$c%2d total=${tot / 1048576.0}%9.3f MiB " +
        f"max=${mx / 1048576.0}%9.3f MiB")
    }
    if (rows.nonEmpty)
      println(f"BROADCAST-MAX ${rows.map(_._4).max / 1048576.0}%.3f MiB " +
        s"over ${rows.size} queries (skipped ${SparkEntry.queries.size - rows.size})")
  }

  /** Per-stage attribution for named queries (guide §1.1 "empirical"):
    * warm once (index/memo builds land there, as in Bench), then run once
    * timed under a listener and print each stage's executor run time, task
    * count and shuffle bytes, plus the job count. The profile the UI would
    * show, printable in a headless run — this is where "which pass
    * dominates this operator" numbers come from. */
  private def stagesProbe(spark: SparkSession, dir: String,
      names: Seq[String]): Unit = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
    import scala.collection.mutable.ArrayBuffer
    val queries = SparkEntry.queries.filter {
      case (n, _) => names.isEmpty || names.exists(n.contains) }
    queries.foreach { case (name, f) =>
      val w0 = System.nanoTime()
      f(spark, dir).write.format("noop").mode("overwrite").save() // warm
      println(f"WARM $name ${(System.nanoTime() - w0) / 1e9}%6.3fs " +
        "(first evaluation: memo/index builds land here)")
      // the listener bus delivers events on its own thread: guard the
      // buffer (events raced the post-run read before) and drain the bus
      // explicitly instead of a fixed sleep that silently dropped late
      // SparkListenerStageCompleted events on a loaded bus
      val stages = ArrayBuffer[(Int, String, Long, Int, Long, Long)]()
      var jobs = 0
      val listener = new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          stages.synchronized { jobs += 1 }
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val m = si.taskMetrics
          stages.synchronized {
            stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(60),
              m.executorRunTime, si.numTasks,
              m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten))
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      // split the wall into construct (DataFrame build: memo lookups,
      // scalar censuses), plan (analysis+optimization+physical planning)
      // and execute — planning is driver-side time the sweep pays once
      // per evaluation and the stage metrics never show
      val t0 = System.nanoTime()
      val df = f(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      val wall = (t3 - t0) / 1e9
      // wait until the async bus has delivered everything queued so far
      // (bounded, so a wedged bus degrades to the old fixed-wait behavior
      // instead of hanging the probe)
      try org.apache.spark.graft.CoreBridge
        .waitUntilListenerBusEmpty(spark.sparkContext, 10000)
      catch { case _: Throwable => Thread.sleep(500) }
      spark.sparkContext.removeSparkListener(listener)
      println(f"STAGES $name wall=$wall%6.3fs construct=${(t1 - t0) / 1e9}%6.3fs " +
        f"plan=${(t2 - t1) / 1e9}%6.3fs exec=${(t3 - t2) / 1e9}%6.3fs " +
        f"jobs=$jobs stages=${stages.size}")
      if (sys.env.contains("SPARK_GRAFT_PROBE_EXPLAIN"))
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      stages.sortBy(-_._3).take(10).foreach { case (id, nm, rt, nt, sr, sw) =>
        println(f"  stage=$id%4d run=${rt / 1000.0}%7.3fs tasks=$nt%4d " +
          f"shufR=${sr / 1024}%8dKB shufW=${sw / 1024}%8dKB $nm")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    // probe corpora are ONE parquet file per table (check_oracle.py's
    // registration contract) — size splits from corpus bytes so
    // single-file sf10 tables fan out without shredding tiny corpora
    // (GraftConf.deriveSplitBytes). Probe modes take the corpus dir as
    // the arg AFTER the mode name; default sf0.1 otherwise.
    val splitDir = args.lift(1).filter(a => !a.forall(_.isDigit))
      .getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes",
        s"${GraftConf.splitBytes(splitDir, cpus.toInt)}")
      .config("spark.sql.session.timeZone", "UTC")
      // match the driver mains' codegen cache (see Bench) so probe
      // timings attribute plan work, not janino recompilation
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .config(GraftConf.fromEnv())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = "/root/testdata/sf0.1"
    if (args.headOption.contains("knn")) {
      val dir = args.lift(1).getOrElse(base)
      knnProbe(spark, dir, args.drop(2).map(_.toInt).toSeq match {
        case Nil => Seq(1, 4, 8, 16); case s => s
      })
      spark.stop()
      return
    }
    if (args.headOption.contains("winnow")) {
      winnowProbe(spark, base)
      spark.stop()
      return
    }
    if (args.headOption.contains("bucketed")) {
      args.drop(1).map(_.toInt).foreach(c => bucketedProbe(spark, base, c))
      spark.stop()
      return
    }
    if (args.headOption.contains("decontam")) {
      args.drop(1).map(_.toInt).foreach(c => decontamProbe(spark, base, c))
      spark.stop()
      return
    }
    if (args.headOption.contains("auto")) {
      args.drop(1).map(_.toInt).foreach(c => autoProbe(spark, base, c))
      spark.stop()
      return
    }
    if (args.headOption.contains("bandparts")) {
      // decompose vec_knn_join_ann's single collision stage: full band
      // scan+decode alone, then scan+join (count only), then the operator
      val dir = args.lift(1).getOrElse(base)
      val bands = operators.DedupOps.embBands(spark, dir)
      def noop(df: org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      noop(bands); val tScan = noop(bands)
      def colScan(cols: String*): Double = {
        val df = bands.select(cols.map(col): _*)
        noop(df); noop(df)
      }
      println(f"BANDCOLS keys=${colScan("band", "cell_sig")}%6.3fs " +
        f"sigs=${colScan("sigs")}%6.3fs emb=${colScan("emb")}%6.3fs " +
        f"ids=${colScan("vec_id", "label", "ss")}%6.3fs")
      val joined = bands
        .select(col("vec_id").as("a_id"), col("sigs"), col("band"), col("cell_sig"))
        .join(bands.select(col("vec_id").as("b_id"), col("sigs").as("b_sigs"),
            col("band").as("b_band"), col("cell_sig").as("b_cell_sig")),
          col("band") === col("b_band") && col("cell_sig") === col("b_cell_sig") &&
            col("a_id") < col("b_id") &&
            operators.DedupOps.firstBandMatch(col("sigs"), col("b_sigs"), col("band")))
        .select(col("a_id"), col("b_id"))
      noop(joined); val tJoin = noop(joined)
      val full = operators.SearchOps.vecKnnJoinAnn(spark, dir)
      noop(full); val tFull = noop(full)
      println(f"BANDPARTS scan=$tScan%6.3fs thinJoin=$tJoin%6.3fs full=$tFull%6.3fs")
      spark.stop()
      return
    }
    if (args.headOption.contains("stages")) {
      stagesProbe(spark, args.lift(1).getOrElse(base), args.drop(2).toSeq)
      spark.stop()
      return
    }
    if (args.headOption.contains("storage")) {
      // persisted-memo footprint (round-14 verdict item 7): run the
      // memo-building queries once, then print every cached relation's
      // memory/disk size — the "is MEMORY_AND_DISK the right posture for
      // the corpus-scale memos" evidence. DataFrame persist() stores
      // COMPRESSED COLUMNAR batches (not deserialized row objects), so
      // memSize here is the real resident cost.
      val dir = args.lift(1).getOrElse(base)
      val names = if (args.length > 2) args.drop(2).toSeq
        else Seq("curate_pack_sequences", "curate_dsir", "text_perplexity",
          "curate_quality_classifier", "dedup_minhash_lsh", "dedup_winnow",
          "curate_report", "curate_ppl_buckets", "dedup_ngram_jaccard")
      names.foreach { n =>
        SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      val infos = spark.sparkContext.getRDDStorageInfo
      infos.sortBy(-_.memSize).foreach { i =>
        println(f"STORAGE mem=${i.memSize / 1048576.0}%9.3f MiB " +
          f"disk=${i.diskSize / 1048576.0}%9.3f MiB parts=${i.numPartitions}%3d " +
          i.name.replaceAll("\\s+", " ").take(140))
      }
      println(f"STORAGE-TOTAL mem=${infos.map(_.memSize).sum / 1048576.0}%.3f MiB " +
        f"disk=${infos.map(_.diskSize).sum / 1048576.0}%.3f MiB over ${infos.length} relations")
      spark.stop()
      return
    }
    if (args.headOption.contains("broadcast")) {
      broadcastProbe(spark, args.lift(1).getOrElse(base))
      spark.stop()
      return
    }
    if (args.headOption.contains("geometry")) {
      geometryProbe(spark, args.lift(1).getOrElse(base),
        args.drop(2).map(_.toInt).toSeq match {
          case Nil => Seq(4, 8, 12); case s => s
        })
      spark.stop()
      return
    }
    if (args.headOption.contains("substr")) {
      args.drop(1).map(_.toInt).foreach(c => substrProbe(spark, base, c))
      spark.stop()
      return
    }
    if (args.headOption.contains("zorder")) {
      zorderProbe(spark, args.lift(1).getOrElse(base))
      spark.stop()
      return
    }
    if (args.headOption.contains("sketch")) {
      sketchProbe(spark, args.lift(1).getOrElse(base))
      spark.stop()
      return
    }
    if (args.headOption.contains("checkpoint")) {
      checkpointProbe(spark, args.lift(1).getOrElse(base),
        args.lift(2).getOrElse("/tmp/graft_ckpt"))
      spark.stop()
      return
    }
    if (args.headOption.contains("incr")) {
      incrProbe(spark, args.lift(1).getOrElse(base))
      spark.stop()
      return
    }
    if (args.headOption.contains("branchsync")) {
      args.drop(1).map(_.toInt).foreach(c => branchProbe(spark, base, c))
      spark.stop()
      return
    }
    if (args.headOption.contains("pq")) {
      args.drop(1).map(_.toInt).foreach(c => pqProbe(spark, base, c))
      spark.stop()
      return
    }
    val copiesList = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 2, 4, 8)
    copiesList.foreach { copies =>
      // drop every previous size's persisted relations: leftover cached
      // band/shingle builds would pressure storage memory and contaminate
      // the larger sizes' timings
      PlanCache.invalidate()
      val dir = s"/tmp/graft_scale/x$copies"
      synth(spark, base, dir, copies)
      // warm signature build once so both strategies time candidate
      // generation + verify, not the shared signature pipeline
      operators.DedupOps.simhashBands(spark, dir).count()
      val (tBand, nBand) = time(operators.DedupOps.dedupSimhash(spark, dir).count())
      val (tAll, nAll) = time(allPairsSimhash(spark, dir).count())
      println(f"SCALE copies=$copies%2d docs=${copies * 5000}%6d " +
        f"banded=$tBand%6.2fs allpairs=$tAll%6.2fs ratio=${tAll / tBand}%5.2fx " +
        f"pairs(banded=$nBand, allpairs=$nAll)")
    }
    spark.stop()
  }
}
