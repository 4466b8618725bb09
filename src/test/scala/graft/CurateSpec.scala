package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CurateOps

/** Invariants for the training-data curation family, each recomputed
  * independently in plain Scala over the collected sf0.001 corpus (small
  * enough to enumerate) — the same reference-reimplementation style the
  * dedup suites use, so a Spark-side expression bug can't hide behind an
  * oracle that mirrors it. */
class CurateSpec extends AnyFunSuite with SparkFixture {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def toks(text: String): Vector[String] =
    "[a-z0-9]+".r.findAllIn(text.toLowerCase).toVector

  private lazy val docs: Map[Long, (String, String, String)] =
    Tables.documents(spark, SfDir)
      .select("doc_id", "text", "lang", "source").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3)))
      .toMap

  test("decontamination flags exactly the docs sharing a 4-gram with the holdout") {
    def grams(text: String): Set[String] =
      toks(text).sliding(CurateOps.DecontamN)
        .filter(_.size == CurateOps.DecontamN).map(_.mkString(" ")).toSet
    val hold = docs.collect {
      case (id, (t, _, _)) if id % CurateOps.HoldoutMod == 0 => grams(t)
    }.fold(Set.empty)(_ ++ _)
    val expected = docs.collect {
      case (id, (t, _, _)) if id % CurateOps.HoldoutMod != 0 &&
          (grams(t) & hold).nonEmpty =>
        id -> (grams(t) & hold).size.toLong
    }.toMap
    val got = CurateOps.curateDecontaminate(spark, SfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.nonEmpty, "the corpus must actually exercise the overlap path")
  }

  test("decontamination broadcasts the eval-holdout gram set") {
    val plan = CurateOps.curateDecontaminate(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"holdout grams must broadcast, not shuffle:\n$plan")
  }

  test("curation scans prune to the referenced document columns") {
    // stratified sampling never touches text — at 100 TB the text column
    // IS the corpus, so reading it for a metadata-only gate would be the
    // difference between scanning GBs and scanning everything
    val strat = operators.CurateOps.curateSampleStratified(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(strat.contains("ReadSchema") && !strat.contains("text"),
      s"stratified gate must not read the text column:\n$strat")
    val rep = operators.CurateOps.curateRepetition(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(!rep.contains("n_chars") && !rep.contains("source"),
      s"repetition scan must read only doc_id+text:\n$rep")
  }

  test("repetition metrics match a direct recount and gate the keep flag") {
    val got = CurateOps.curateRepetition(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getInt(3)))
    assert(got.length == docs.size)
    got.foreach { case (id, dup, top, keep) =>
      val gs = toks(docs(id)._1).sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toVector
      val eDup = 1.0 - gs.distinct.size.toDouble / gs.size
      val eTop = gs.groupBy(identity).values.map(_.size).max.toDouble / gs.size
      assert(math.abs(dup - eDup) < 6e-5 && math.abs(top - eTop) < 6e-5,
        s"doc $id metrics")
      assert(keep == (if (eDup <= CurateOps.RepetitionMax &&
        eTop <= CurateOps.RepetitionMax) 1 else 0), s"doc $id keep")
    }
  }

  test("pii redaction masks the injected contact suffix exactly once") {
    val got = CurateOps.curatePiiRedact(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got.length == docs.size)
    got.foreach { case (id, nEmails, nNums, digest) =>
      // corpus is PII-free (no '@', no digits), so the only hits are the
      // injected suffix: one email, one digit run (the doc_id)
      assert(nEmails == 1 && nNums == 1, s"doc $id counts")
      val (text, _, source) = docs(id)
      val txt = text.toLowerCase + s" contact $source@example.com ext $id"
      val redacted = txt.replaceAll(CurateOps.EmailRe, "<EMAIL>")
        .replaceAll(CurateOps.NumRe, "<NUM>")
      assert(digest == md5hex(redacted), s"doc $id digest")
    }
  }

  test("stratified sample is exactly the hash-gated membership set") {
    val expected = docs.collect {
      case (id, (_, lang, _)) if md5hex(id.toString).substring(0, 2) <
          (if (lang == "en") CurateOps.RateEn
           else if (Set("de", "fr")(lang)) CurateOps.RateMid
           else CurateOps.RateLow) =>
        id
    }.toSet
    val got = CurateOps.curateSampleStratified(spark, SfDir).collect()
      .map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < docs.size)
  }

  test("sequence packing is the contiguous fill of per-source token counts") {
    val got = CurateOps.curatePackSequences(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == docs.size)
    val bySource = docs.toSeq.map { case (id, (t, _, src)) => (src, id, toks(t).size) }
      .groupBy(_._1)
    val expected = bySource.flatMap { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).map { case (src, id, n) =>
        val off = cum; cum += n
        (id, src, n.toLong, off / CurateOps.PackBudget, off % CurateOps.PackBudget)
      }
    }.toSet
    assert(got.toSet == expected)
    got.foreach { case (id, _, _, _, off) =>
      assert(off >= 0 && off < CurateOps.PackBudget, s"doc $id offset")
    }
  }

  test("shard shuffle assigns md5-hex shards with dense in-shard positions") {
    val got = CurateOps.curateShuffleShards(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.length == docs.size)
    val expected = docs.keys.toSeq
      .map(id => (id, Integer.parseInt(md5hex(id.toString).take(1), 16)))
      .groupBy(_._2).flatMap { case (shard, members) =>
        members.sortBy { case (id, _) => (md5hex(id.toString), id) }
          .zipWithIndex.map { case ((id, _), i) => (id, shard, i + 1) }
      }.toSet
    assert(got.toSet == expected)
  }

  test("writeShards lays out sorted per-shard parquet matching the query op") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    CurateOps.writeShards(spark, SfDir, out)
    val positions = CurateOps.curateShuffleShards(spark, SfDir).collect()
      .map(r => (r.getInt(1), r.getLong(0))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val shardDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.nonEmpty)
    val seen = shardDirs.map { d =>
      val shard = d.getName.stripPrefix("shard=").toInt
      val rows = spark.read.parquet(d.getPath)
        .select("doc_id", "hk").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      // each output file is one sorted run (sortWithinPartitions + one
      // file per shard partition of one shuffle partition)
      assert(rows.map(_._2).toSeq == rows.map(_._2).toSeq.sorted,
        s"shard $shard not sorted by hk")
      assert(rows.map(_._1).toSet == positions(shard), s"shard $shard members")
      shard
    }
    assert(seen.toSet == positions.keySet)
  }

  test("domain mixing hits the target token proportions with max retention") {
    val tokCount = docs.view.mapValues { case (t, _, _) => toks(t).size.toLong }
    val bySrc = docs.groupBy(_._2._3).view.mapValues(_.keys.toVector)
    def weight(src: String): Double = (src.drop(3).toInt % 3) match {
      case 0 => CurateOps.MixW0; case 1 => CurateOps.MixW1
      case _ => CurateOps.MixW2
    }
    val tok = bySrc.mapValues(_.map(tokCount(_)).sum.toDouble).toMap
    val c = tok.map { case (s, t) => t / weight(s) }.min
    // the binding source is pinned to the full gate, mirroring the op
    val thr = tok.map { case (s, t) =>
      s -> (if (t / weight(s) == c) CurateOps.MixGate
        else math.floor(c * weight(s) / t * CurateOps.MixGate).toInt) }
    val expected = docs.collect {
      case (id, (_, _, src))
          if Integer.parseInt(md5hex(s"mix:$id").take(3), 16) < thr(src) =>
        (id, src, tokCount(id), thr(src))
    }.toSet
    val got = CurateOps.curateMixDomains(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == expected)
    // the binding tier (scarcest tokens per unit weight) keeps everything:
    // its rate is exactly 1 so the gate threshold is the full 4096
    assert(thr.values.max == CurateOps.MixGate, "binding source keeps all docs")
    // target-mix identity (deterministic — no hash-gate sampling noise):
    // each source's EXPECTED kept token mass rate_s·tok_s equals c·w_s up
    // to the 1/MixGate rate quantization, i.e. the kept corpus mixes the
    // domains in exactly the target weight proportions
    thr.foreach { case (s, t) =>
      val expectedMass = t.toDouble / CurateOps.MixGate * tok(s)
      assert(math.abs(expectedMass - c * weight(s)) <=
        tok(s) / CurateOps.MixGate + 1e-6,
        s"source $s expected kept mass $expectedMass, want ~${c * weight(s)}")
    }
  }

  test("epoch mixing repeats high-weight domains and keeps the token budget") {
    val tokCount = docs.view.mapValues { case (t, _, _) => toks(t).size.toLong }
    def weight(src: String): Double = (src.drop(3).toInt % 3) match {
      case 0 => CurateOps.MixW0; case 1 => CurateOps.MixW1
      case _ => CurateOps.MixW2
    }
    val bySrc = docs.groupBy(_._2._3).view.mapValues(_.keys.toVector)
    val tok = bySrc.mapValues(_.map(tokCount(_)).sum.toDouble).toMap
    // keys is a Set: map over a Seq or the distinct weights collapse
    val (sw, tt) = (tok.keys.toSeq.map(weight).sum, tok.values.sum)
    val expected = docs.toSeq.flatMap { case (id, (_, _, src)) =>
      val rate = weight(src) / sw * tt / tok(src)
      val nFull = math.floor(rate).toInt
      val fthr = math.floor((rate - math.floor(rate)) * CurateOps.MixGate).toInt
      val n = nFull +
        (if (Integer.parseInt(md5hex(s"epoch:$id").take(3), 16) < fthr) 1 else 0)
      (0 until n).map(c => (id, src, n, c))
    }.toSet
    val got = CurateOps.curateMixEpochs(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    assert(got == expected)
    // upsampling is actually exercised: the heavy tier repeats documents
    assert(got.exists(_._4 >= 1), "some document must emit a second copy")
    // token-budget identity per source: expected kept mass tracks
    // (w_s/Σw)·T up to the 1/MixGate fractional-gate quantization
    tok.foreach { case (src, t) =>
      val rate = weight(src) / sw * tt / t
      val mass = (math.floor(rate) +
        math.floor((rate - math.floor(rate)) * CurateOps.MixGate) /
          CurateOps.MixGate.toDouble) * t
      assert(math.abs(mass - weight(src) / sw * tt) <=
        t / CurateOps.MixGate + 1e-6, s"source $src budget")
    }
  }

  test("length batching bounds padding and reuses one bucket exchange") {
    val got = CurateOps.curateLengthBatches(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5)))
    assert(got.length == docs.size)
    got.groupBy(t => (t._2, t._3)).foreach { case ((lb, bi), rows) =>
      assert(rows.length <= CurateOps.BatchSize, s"batch ($lb,$bi) size")
      val mx = rows.map(_._4).max
      rows.foreach { case (id, _, _, n, bmax, pad) =>
        assert(bmax == mx && pad == mx - n, s"doc $id batch stats")
        // padding is bounded by the bucket width: every batch member's
        // length lives in the same LenBucket window
        assert(pad < CurateOps.LenBucket, s"doc $id pad $pad")
      }
    }
    val plan = CurateOps.curateLengthBatches(spark, SfDir)
      .queryExecution.executedPlan.toString
    // hashpartitioning(lb) co-locates every (lb, batch_idx): the second
    // window adds a sort, never a second exchange
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"both windows must share the one bucket exchange:\n$plan")
  }

  test("pipeline composes its verified stages without drift") {
    val admitted = operators.TextOps.corpusCurate(spark, SfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val contaminated = CurateOps.curateDecontaminate(spark, SfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expectedDocs = admitted
      .filter(id => id % CurateOps.HoldoutMod != 0 && !contaminated(id))
    val got = CurateOps.curatePipeline(spark, SfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.map(_._1).toSet == expectedDocs,
      "pipeline doc set must be admitted minus holdout minus contaminated")
    assert(got.nonEmpty)
    // packing invariants hold over the FILTERED set: offsets are the
    // running totals of the surviving docs only, in (source, doc_id) order
    got.groupBy(_._2).foreach { case (src, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (id, _, n, seqId, off) =>
        assert(seqId == cum / CurateOps.PackBudget, s"doc $id seq")
        assert(off == cum % CurateOps.PackBudget, s"doc $id offset")
        cum += n
      }
      assert(src.nonEmpty)
    }
  }

  test("domain mixing broadcasts the rates table; one agg shuffle only") {
    val plan = CurateOps.curateMixDomains(spark, SfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rates must broadcast onto the gate scan:\n$plan")
    // the gate-side scan must not shuffle documents: the only exchanges
    // belong to the per-source totals aggregation and the tiny rates build
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected at most the totals agg exchanges:\n$plan")
  }
}
