package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage layout for the materialized index: bucketed (and optionally
  * partition-pruned) parquet tables.
  *
  * Reference analogue: project-cortex persists its index into SQLite tables
  * keyed by chunk/file id (internal/storage/schema.go:157). At cluster
  * scale the equivalent is a bucketed table per index relation: joins
  * between relations bucketed on the same key (chunks⋈files⋈embeddings by
  * doc id) are co-located and need NO shuffle — the test suite asserts the
  * exchange-free plan.
  */
object IndexStore {

  /** Deploy-time bucket-count knob for every index and derived table.
    * The co-located joins' parallelism IS the bucket count (a bucketed
    * read is one task per bucket), so the sizing rule at scale is
    * buckets ≈ ceil(largest bucketed relation / target per-task scan).
    * The count is folded into every table's IDENTITY (a `_b<n>` name
    * suffix), so changing it builds fresh tables instead of silently
    * reusing a differently-bucketed layout.
    *
    * Default since round 9 is `auto`: the count SELF-SIZES from the
    * corpus dir's documents+embeddings on-disk bytes (the two relations
    * every bucketed index/derived table is built from — the TPC-H fact
    * tables never land in one) — pow2ceil(bytes / [[TargetBytesConf]])
    * clamped to [8, 4096] — because the round-8 sf10 probe measured the
    * fixed 8 as the collision joins' parallelism ceiling (8 tasks on 32
    * cores; 32 buckets halved the banded-ANN wall). Source bytes are a
    * deterministic, scan-free proxy every resolver (builders, probes,
    * tests) can compute identically; the 4 MB default target is tuned to
    * that measurement (sf10's ~140 MB of docs+emb → 64 buckets; the
    * verify SFs stay on the floor of 8), deliberately byte-dense because
    * the joins reading these tables do COLLISION work that grows faster
    * than the bytes. An integer conf value pins the count exactly as
    * before (the deployment's choice — a corpus past ~16 GB of docs+emb
    * hits the 4096 clamp, where an operator sizes by its own pair-work
    * budget). Bucketing is layout only: query results are identical at
    * any count (BucketConfSpec). */
  val BucketsConf = "spark.graft.indexBuckets"

  /** Auto-sizing target: docs+emb bytes per bucket (see [[BucketsConf]]). */
  val TargetBytesConf = "spark.graft.bucketTargetBytes"
  private val TargetBytesDefault = 4L * 1024 * 1024

  private val BucketsMin = 8
  private val BucketsMax = 4096

  /** The pinned bucket count when [[BucketsConf]] is an integer; the
    * local floor (8) when unset or `auto` and no corpus dir is in play.
    * Sizing that should track corpus scale goes through the (spark, dir)
    * overload. */
  def buckets(spark: SparkSession): Int =
    pinned(spark).getOrElse(BucketsMin)

  private def pinned(spark: SparkSession): Option[Int] =
    spark.conf.getOption(BucketsConf).filterNot(_ == "auto").map { s =>
      val n = s.toInt
      require(n >= 1, s"$BucketsConf must be >= 1, got $n")
      n
    }

  /** memoized per-dir source bytes: one FS listing, stable for a corpus.
    * Counts documents.parquet + embeddings.parquet (file- or dir-shaped)
    * — the relations the bucketed tables derive from. Swept by the
    * data-changed invalidation hook (see the `locally` block below), so a
    * corpus rewritten in place re-sizes from its CURRENT bytes on the
    * next build instead of keeping the first-seen count for the JVM's
    * lifetime. */
  private val dirBytes = new ConcurrentHashMap[String, java.lang.Long]()

  private def corpusBytes(spark: SparkSession, dir: String): Long =
    dirBytes.computeIfAbsent(dir, { d =>
      val fs = new org.apache.hadoop.fs.Path(d)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val sum = Seq("documents.parquet", "embeddings.parquet").map { name =>
        val p = new org.apache.hadoop.fs.Path(d, name)
        if (!fs.exists(p)) 0L
        else {
          val st = fs.getFileStatus(p)
          // dir-shaped parquet outputs: recursive — a partitioned/nested
          // layout (partitionBy subdirectories) must count its leaves,
          // not the ~0 bytes of its first listing level
          if (st.isDirectory) fs.getContentSummary(p).getLength
          else st.getLen
        }
      }.sum
      java.lang.Long.valueOf(sum)
    })

  /** memoized per-dir hottest-IVF-cell size — the census the auto LSH
    * geometry derives its signature width from (see
    * [[graft.operators.DedupOps.lshGeometry]]). One thin aggregate over
    * the embeddings table, collected as a driver-side scalar (a sizing
    * decision, not data), then stable for the corpus until the
    * data-changed invalidation sweeps it. */
  private val dirMaxCell = new ConcurrentHashMap[String, java.lang.Long]()

  def maxCellSize(spark: SparkSession, dir: String): Long =
    dirMaxCell.computeIfAbsent(dir, { d =>
      val rows = graft.Tables.embeddings(spark, d)
        .groupBy(col("label")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).collect()
      java.lang.Long.valueOf(
        if (rows.isEmpty || rows(0).isNullAt(0)) 0L else rows(0).getLong(0))
    })

  /** memoized per-(dir, mod, res) churn-slice doc count — the routing
    * scalar dedup_incremental's broadcast-vs-shuffle decision reads (see
    * [[graft.operators.DedupOps.incrementalCandidates]]). Memoized here,
    * not computed per plan construction: the count is one pushed-filter
    * scan of the doc_id column, but an EAGER action inside a
    * plan-building call would otherwise re-run it every time a test or
    * plan inspection rebuilds the candidates. Same lifecycle as
    * [[maxCellSize]]: swept by the data-changed invalidation hook. */
  private val dirChurn = new ConcurrentHashMap[(String, Int, Int), java.lang.Long]()

  def churnDocs(spark: SparkSession, dir: String, mod: Int, res: Int): Long =
    dirChurn.computeIfAbsent((dir, mod, res), { k =>
      java.lang.Long.valueOf(graft.Tables.documents(spark, k._1)
        .filter(col("doc_id") % mod === res).count())
    })

  locally {
    // data-changed hook: PlanCache.invalidate(dir) means "the data under
    // dir changed on disk" (the watch loop's per-micro-batch sweep), so
    // every per-dir sizing memo re-derives from current bytes next use.
    // Cheap to rebuild (one FS listing / one thin aggregate), so the
    // sweep is unconditional — unlike the derived TABLES, which only
    // invalidateDerived drops (an explicit, session-carrying call).
    graft.PlanCache.onInvalidate {
      case Some(d) =>
        dirBytes.remove(d); dirMaxCell.remove(d)
        dirChurn.keySet.removeIf(_._1 == d); ()
      case None =>
        dirBytes.clear(); dirMaxCell.clear(); dirChurn.clear()
    }
  }

  private def pow2ceil(n: Long): Int = {
    var p = 1
    while (p < n && p < BucketsMax) p <<= 1
    p
  }

  /** The bucket count for `dir`'s index/derived tables: the pinned conf
    * if set, else auto-sized from the corpus bytes (see [[BucketsConf]]). */
  def buckets(spark: SparkSession, dir: String): Int =
    pinned(spark).getOrElse {
      val target = spark.conf.getOption(TargetBytesConf).map(_.toLong)
        .getOrElse(TargetBytesDefault)
      require(target >= 1, s"$TargetBytesConf must be >= 1, got $target")
      val want = (corpusBytes(spark, dir) + target - 1) / target
      // NO parallelism floor toward the session's cores. Re-measured at
      // sf1 in round 14 (pinned indexBuckets 8 vs 32, same filtered
      // heavies, quiet-gated host) — the result SPLITS by family and
      // nets to a wash, so the byte-derived default stands:
      //   - embedding band joins (heavy per-pair dot/cosine) run
      //     1.1-1.4× FASTER at 32 buckets (vec_knn_join 5.8→5.0 s,
      //     vec_knn_join_ann 1.8→1.3 s, dedup_embedding 1.3→1.1 s) —
      //     the round-13 sf0.1 measurement of "8× stage CPU at 32
      //     buckets" was the 17 MB corpus's per-task overhead + this
      //     VM's concurrent-fault pathology, and does NOT reproduce at
      //     sf1;
      //   - text-dedup joins (minhash/ngram/incremental: cheap per-pair
      //     work, more smaller tables) run ~1.3-1.4× faster at 8
      //     (dedup_ngram_jaccard 2.25→3.29 s at 32).
      // A deployment whose wall is the embedding family raises
      // BucketsConf/TargetBytesConf explicitly; the sf10-scale corpus
      // already derives ≥64 buckets from bytes alone, where the
      // per-bucket overhead amortizes for every family.
      math.max(BucketsMin, pow2ceil(want))
    }

  /** Write `df` as a bucketed, per-bucket-sorted parquet table, with
    * the pinned-conf/local-floor bucket count (no corpus dir in play). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String): Unit =
    writeBucketedMulti(df, table, Seq(bucketCol), buckets(df.sparkSession))

  /** [[writeBucketed]] at an explicit bucket count. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    writeBucketedMulti(df, table, Seq(bucketCol), buckets)

  /** Multi-column bucketing: a join whose equi-keys are a SUPERSET of the
    * bucket columns reads both sides co-located (equal join keys imply
    * equal bucket keys), so band self-joins bucket on (band, sig) and
    * stay exchange-free even when the join adds block keys on top. */
  def writeBucketedMulti(df: DataFrame, table: String,
      bucketCols: Seq[String], buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      // the band tables ride one packed binary blob per row, repeated
      // `bands`× per vector — exactly what parquet's value dictionary
      // deduplicates. The writer's default dictionary-page threshold
      // (1 MB) aborts the dictionary once a bucket holds a few thousand
      // distinct ~260 B blobs and falls back to PLAIN (measured at sf1:
      // the emb column wrote 20 MB/bucket plain where sf0.1's smaller
      // dictionary encoded the same layout 2.5× smaller). 8 MB keeps
      // the dictionary viable through the auto bucket sizing's
      // ~4 MB-of-corpus-per-bucket target at any SF; scan-side cost is
      // nil (dictionary pages are decoded once per row group).
      .option("parquet.dictionary.page.size", s"${8 * 1024 * 1024}")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Write `df` partitioned by a low-cardinality column (e.g. lang) so
    * tag-filtered scans prune whole directories. */
  def writePartitioned(df: DataFrame, table: String, partCol: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .partitionBy(partCol)
      .saveAsTable(table)

  /** Drop `table` from the catalog AND clear its physical warehouse
    * location — a later saveAsTable under the same name must not fail
    * with LOCATION_ALREADY_EXISTS against a dir that outlived a previous
    * process's in-memory catalog. */
  def dropTable(spark: SparkSession, table: String): Unit = {
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val p = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }

  /** Replace `table` with `df`'s contents (see [[dropTable]] for why the
    * physical location is cleared first). */
  def replaceTable(spark: SparkSession, df: DataFrame, table: String): Unit = {
    dropTable(spark, table)
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** Per-key build monitors: get+putIfAbsent alone would let two threads
    * race the DROP + path-delete + saveAsTable sequence for the SAME key
    * (one thread's write fails under the other's cleanup) — table writes
    * are not idempotent mid-flight. Monitors are reentrant for a thread
    * and independent across keys, so a build that re-enters through a
    * DIFFERENT key (the computeIfAbsent "Recursive update" hazard) still
    * cannot deadlock a single map. computeIfAbsent here is safe: the
    * closure allocates an Object, touching nothing. */
  private val buildLocks = new ConcurrentHashMap[Any, Object]()

  private def withBuildLock[T](key: Any)(body: => T): T =
    buildLocks.computeIfAbsent(key, _ => new Object).synchronized(body)

  private val derived =
    new ConcurrentHashMap[(SparkSession, String, String), String]()

  /** The catalog name [[derivedBucketed]] gives the (dir, tag) derived
    * table — the single source of the naming scheme; probes and tests
    * resolve names through this instead of re-deriving the sanitization.
    * The session-less form takes the ALREADY bucket-decorated tag; use
    * the (spark, dir, tag) form to resolve what derivedBucketed built. */
  def derivedTableName(dir: String, tag: String): String =
    s"graft_${tag}_" + dir.replaceAll("[^a-zA-Z0-9]", "_")

  /** [[derivedTableName]] with the bucket-count decoration the builder
    * applies — the name derivedBucketed(spark, dir, tag, …) produced. */
  def derivedTableName(spark: SparkSession, dir: String, tag: String): String =
    derivedTableName(dir, s"${tag}_b${buckets(spark, dir)}")

  /** Materialize a derived relation (a signature/band/prefix index) ONCE
    * per (session, dir) as a bucketed table and return its name. The
    * dedup candidate self-joins read these tables from both sides
    * co-located — the same design as the search index tables, applied to
    * the relations the dedup family self-joins. A cached `repartition`
    * does NOT survive the self-join's column rename (verified while
    * building the search index); bucketed tables do, which is why these
    * are tables and not PlanCache entries.
    *
    * Reuse rule mirrors [[index]]: if the catalog already has the table
    * (another session on this warehouse built it), reuse it rather than
    * dropping it out from under that session's queries.
    */
  def derivedBucketed(spark: SparkSession, dir: String, tag: String,
      bucketCols: Seq[String])
      (build: => DataFrame): String = {
    val n = buckets(spark, dir)
    val btag = s"${tag}_b$n" // bucket count is part of the table identity
    derived.keySet.removeIf(k => k._1.sparkContext.isStopped)
    // get + putIfAbsent, NOT computeIfAbsent: build closures may resolve
    // dependencies through caches (the PlanCache reentrancy rule)
    val key = (spark, dir, btag)
    val existing = derived.get(key)
    if (existing != null) existing
    else withBuildLock(key) {
      val again = derived.get(key)
      if (again != null) again
      else {
        val tbl = derivedTableName(dir, btag)
        if (!spark.catalog.tableExists(tbl)) {
          // clear a previous PROCESS's physical leftovers before writing
          val wh = new org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir"))
          val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val p = new org.apache.hadoop.fs.Path(wh, tbl.toLowerCase)
          if (fs.exists(p)) fs.delete(p, true)
          writeBucketedMulti(build, tbl, bucketCols, n)
        }
        derived.put(key, tbl)
        tbl
      }
    }
  }

  /** Drop every derived bucketed table built over `dir` (all sessions'
    * registry entries and the physical tables). The data-changed hook for
    * the dedup/ANN index relations — pairs with PlanCache.invalidate(dir),
    * which alone only releases PERSISTED relations: without this call the
    * derived tables would keep answering from the pre-change snapshot.
    *
    * Each key's drop runs under that key's build monitor: without it the
    * DROP could land mid-write under an in-flight derivedBucketed (table
    * writes are not idempotent mid-flight), or sweep BETWEEN the
    * builder's table write and its registry put — leaving the registry
    * pointing at a dropped table for the rest of the process. Serialized,
    * an in-flight build completes first and its (pre-change) table is
    * then dropped; a build arriving after sees an empty registry and
    * rebuilds fresh. Residual (accepted): a build whose registry put
    * lands after this sweep's weakly-consistent iteration snapshot can
    * survive with pre-change data until the NEXT invalidation — the
    * watch loop invalidates per micro-batch, so the staleness horizon is
    * one batch; full closure would need the PlanCache epoch scheme. */
  def invalidateDerived(spark: SparkSession, dir: String): Unit = {
    // re-derive auto sizing (buckets, LSH width, churn) from the corpus's
    // new state
    dirBytes.remove(dir)
    dirMaxCell.remove(dir)
    dirChurn.keySet.removeIf(_._1 == dir)
    val it = derived.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._2 == dir) withBuildLock(e.getKey) {
        try spark.sql(s"DROP TABLE IF EXISTS ${e.getValue}")
        catch { case _: Throwable => () }
        it.remove()
      }
    }
  }

  /** The materialized search index for one corpus dir. */
  final case class IndexTables(docs: String, embById: String,
      embByLabel: String)

  private val built =
    new ConcurrentHashMap[(SparkSession, String, Int), IndexTables]()

  /** Build (once per session+dir) the bucketed search index the query
    * operators read — the cortex index-build step (chunk → tokenize →
    * store, internal/storage/chunk_writer.go) as bucketed parquet tables:
    *
    *  - `docs`: pre-tokenized documents bucketed by doc_id (tokenization
    *    is INDEX-time work, not query-time work);
    *  - `embById`: embeddings bucketed by vec_id, co-located with `docs`
    *    for the 1:1 hybrid join;
    *  - `embByLabel`: embeddings bucketed by the IVF cell label for
    *    cell-local self-joins.
    *
    * Joins between tables bucketed on the join key need NO exchange — at
    * 100 TB that turns the two fact-fact search joins from full shuffles
    * of both relations into co-located per-bucket joins.
    */
  def index(spark: SparkSession, dir: String): IndexTables = {
    built.keySet.removeIf(k => k._1.sparkContext.isStopped)
    // per-key monitor, NOT computeIfAbsent: nested computeIfAbsent on a
    // ConcurrentHashMap is a bin-layout-dependent "Recursive update"
    // crash (the PlanCache rule), while a bare get+putIfAbsent would let
    // two threads race the DROP + delete + write sequence — the monitor
    // serializes same-key builds and stays reentrant across keys.
    val n = buckets(spark, dir)
    val key = (spark, dir, n)
    val existing = built.get(key)
    if (existing != null) existing
    else withBuildLock(key) {
      val again = built.get(key)
      if (again != null) again
      else buildIndex(spark, dir, key)
    }
  }

  /** Just the pre-tokenized docs table of [[index]] — buildable for a
    * docs-only corpus (no embeddings.parquet required), which the
    * token-array consumers (symbol extraction, FTS token scoring, BPE
    * apply, winnowing) need: their test fixtures and docs-only corpora
    * must not fail on the embedding relations they never read. The name
    * is IDENTICAL to index()'s docs table, so whichever builder runs
    * first the other reuses the same table. */
  def docsTable(spark: SparkSession, dir: String): String = {
    val n = buckets(spark, dir)
    val t = tableNames(dir, n)
    // same monitor key as index(): the two builders write the same docs
    // table and must serialize against each other, not just themselves
    withBuildLock((spark, dir, n)) {
      if (!spark.catalog.tableExists(t.docs)) {
        clearStale(spark, Seq(t.docs))
        writeBucketed(tokenizedDocs(spark, dir), t.docs, "doc_id", n)
      }
    }
    t.docs
  }

  private def tableNames(dir: String, n: Int): IndexTables = {
    val tag = dir.replaceAll("[^a-zA-Z0-9]", "_") + s"_b$n"
    IndexTables(s"graft_docs$tag", s"graft_emb_id$tag", s"graft_emb_lbl$tag")
  }

  private def tokenizedDocs(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        graft.functions.Tokenize.tokens(col("text")).as("toks"))

  /** Drop lingering catalog entries AND physical leftovers for `names` —
    * a prior PROCESS's warehouse dir may survive while this catalog is
    * empty, and saveAsTable then fails with LOCATION_ALREADY_EXISTS. */
  private def clearStale(spark: SparkSession, names: Seq[String]): Unit = {
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    names.foreach { name =>
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val p = new org.apache.hadoop.fs.Path(wh, name.toLowerCase)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  private def buildIndex(spark: SparkSession, dir: String,
      key: (SparkSession, String, Int)): IndexTables = {
      val n = key._3
      val t = tableNames(dir, n)
      // if another session sharing this catalog already built the index
      // for this dir, REUSE it; dropping here would yank tables out from
      // under that session's running queries. The docs table may exist
      // alone (docsTable builds it independently) — build only what is
      // missing.
      if (!spark.catalog.tableExists(t.docs))
        clearStale(spark, Seq(t.docs))
      if (!Seq(t.embById, t.embByLabel).forall(spark.catalog.tableExists))
        clearStale(spark, Seq(t.embById, t.embByLabel))
      if (!spark.catalog.tableExists(t.docs))
        writeBucketed(tokenizedDocs(spark, dir), t.docs, "doc_id", n)
      if (!Seq(t.embById, t.embByLabel).forall(spark.catalog.tableExists)) {
        val emb = graft.Tables.embeddings(spark, dir)
        writeBucketed(emb, t.embById, "vec_id", n)
        writeBucketed(emb, t.embByLabel, "label", n)
      }
      built.put(key, t)
      t
  }
}
