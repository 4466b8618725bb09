package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational core operators — the engine layer cortex builds its metadata
  * queries on (internal/mcp/metrics.go, internal/storage/query_helpers.go).
  *
  * All operators are declarative DataFrame plans: Catalyst handles pushdown,
  * pruning and join selection; we add broadcast hints only where a side is a
  * dimension table at any scale factor.
  */
object Relational {

  /** Multi-aggregate scan: TPC-H Q1 shape. Partial (map-side) aggregation
    * then a single shuffle on the low-cardinality group key.
    *
    * Sums aggregate EXACT decimals, not doubles: at sf10 the engines'
    * different partial-aggregation orders drifted the 4th decimal of a
    * 2.7e11 double sum (half-ulp is 3e-5 there and the groups hold 5M+
    * rows), so a double sum rounded to 4 decimals is not a cross-engine
    * (or even cross-plan) deterministic quantity. The inputs are
    * fixed-decimal rationals — integer quantities, 2-decimal prices and
    * discounts, hence an exact 4-decimal disc_price product — and the
    * per-row decimal cast recovers that rational exactly on both engines
    * (the stored double sits ~1e-11 from it, five orders inside the
    * decimal(30,6) rounding margin), making every sum order-independent
    * and scale-proof; this is also how money aggregation should work at
    * 100 TB. Averages divide the exact sum by the exact count in one
    * IEEE double op per group.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    // RAW columns (quantity, price, discount) convert to exact 1e-4-unit
    // longs via floor(x·10⁴ + 0.5) instead of CAST(… AS DECIMAL(30,4)):
    // the stored doubles sit ~1e-11 (relative) from their 4-decimal
    // rationals, so both conversions land on the same grid point — but
    // the decimal cast allocates a BigDecimal through Double.toString
    // per row per column (the dominant per-row cost of this plan,
    // measured), while the floor form is three codegen'd FP/long ops.
    // disc_price is a COMPUTED product and keeps the decimal cast: its
    // values are not grid-anchored, and the shortest-string rounding the
    // cast performs is the cross-engine contract sf10 verified.
    // Overflow posture: qty sums to ~3e15 and disc to ~6e13 in 1e-4
    // units at a 100 TB lineitem (6e9 rows) — far inside long — so those
    // two accumulate as primitive longs; price would reach ~2.4e18
    // (under 4× headroom), so it accumulates in DECIMAL built from the
    // exact long (compact representation — no BigDecimal churn, and it
    // PROMOTES on overflow instead of wrapping).
    def u4(c: Column): Column = floor(c * 10000d + 0.5d).cast("long")
    val qtyL = u4(col("l_quantity"))
    val priceU = u4(col("l_extendedprice")).cast("decimal(38,0)")
    val discL = u4(col("l_discount"))
    val discPriceD = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(30,6)")
    // Averages round in EXACT integer space, not round(double, 4): Spark's
    // round on a double rounds its shortest decimal string while DuckDB
    // rounds the binary value, so a quotient near an x.xxxx5 boundary is a
    // cross-engine flake (the same hazard the round-12 text_quality rewrite
    // closed). Here avg4 = HALF_UP(S4/C) where S4 is the sum in exact 1e-4
    // units — (2·S4 + C) div (2·C) for positive values — then ONE exact
    // double op (a ≤7-digit integer divided by 1e4) that every IEEE engine
    // computes identically. The oracle mirrors this with HUGEINT //.
    // sums are already exact 1e-4-unit integers (longs / an exact-long
    // decimal), so avg4 = HALF_UP(S4/C) is pure long arithmetic:
    // (2·S4 + C) div (2·C) for positive values. The /10000 output
    // conversions are each a SINGLE correctly-rounded IEEE op on an
    // exact integer — identical to the former decimal→double cast of the
    // same rational (both are one correct rounding of S4·10⁻⁴).
    def avg4(sumCol: String): Column = expr(
      s"CAST(($sumCol * 2 + count_order) " +
        s"div (count_order * 2) AS DOUBLE) / 10000")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qtyL).as("sq"),
        sum(priceU).as("sp"),
        sum(discPriceD).as("sdp"),
        sum(discL).as("sd"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        (col("sq").cast("double") / 10000.0).as("sum_qty"),
        // sp is DECIMAL(48,0) after sum: divide by 10⁴ in decimal space
        // (exact — the quotient terminates in ≤4 decimals) and round
        // ONCE to double, reproducing the old decimal(30,4)→double cast
        expr("CAST(sp / 10000 AS DOUBLE)").as("sum_base_price"),
        col("sdp").cast("double").as("sum_disc_price"),
        avg4("sq").as("avg_qty"),
        avg4("sd").as("avg_disc"),
        col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Pushdown filter + pruned projection: both the predicate and the
    * 3-column ReadSchema must reach the parquet scan (cortex
    * files_tool.go filter-by-language/path analogue).
    */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_size") >= 30 && col("p_type").startsWith("SMALL"))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))

  /** Fact-fact-dim join + agg + top-k (TPC-H Q3 shape). The customer
    * side is filtered before the join; the final top-10 is a
    * TakeOrderedAndProject, not a global sort.
    */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        unix_timestamp(col("o_orderdate")).as("o_epoch"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Star join where every dimension is broadcast (region, nation are tiny
    * at every SF; cortex joins chunks⋈files⋈language the same way).
    */
  def q4BroadcastJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        round(sum(col("s_acctbal")), 4).as("total_acctbal"))
      .orderBy(col("r_name"))

  /** Global top-k with total-order tiebreak → TakeOrderedAndProject (the
    * `limit` path every cortex search result list goes through).
    */
  def q5TopK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 4).as("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Per-group top-N via ranking window: one shuffle on the group key
    * (cortex "best chunks per file" shape).
    */
  def q6WindowTopK(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_nationkey"), col("rk"), col("c_custkey"),
        round(col("c_acctbal"), 4).as("c_acctbal"))
  }

  /** Per-group top-N as a bounded-heap aggregate (graft.functions.TopKAgg):
    * same result as [[q6WindowTopK]], but partial aggregation trims to k
    * rows per group MAP-SIDE, so the shuffle moves k*|groups| rows instead
    * of the whole table — the formulation that survives a 100x scale-up.
    */
  def q6TopkAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_nationkey"))
      .agg(graft.functions.TopKAgg.topK(col("c_acctbal"), col("c_custkey"), 3).as("top"))
      .select(col("c_nationkey"), posexplode(col("top")))
      .select(col("c_nationkey"), (col("pos") + 1).cast("int").as("rk"),
        col("col.id").as("c_custkey"), round(col("col.score"), 4).as("c_acctbal"))

  /** Left-semi join (EXISTS): customers having at least one high-value
    * order. No payload columns from the right side cross the join.
    */
  def q7SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.orders(spark, dir).filter(col("o_totalprice") > 300000)
    Tables.customer(spark, dir)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** Left-anti join (NOT EXISTS): customers with no orders — cortex's
    * eviction pass (chunks whose file disappeared) is this shape.
    */
  def q8AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
    Tables.customer(spark, dir)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Distinct aggregation (unique-symbol-count analogue). Spark expands
    * this to a two-phase aggregate; keys are low-cardinality.
    */
  def q9DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  /** Hierarchical ROLLUP (metrics-by-language/type rollups in
    * internal/mcp/metrics.go). Null grouping slots are labelled 'ALL' so
    * the oracle compare is unambiguous.
    */
  def q10Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"), round(sum(col("s_acctbal")), 4).as("total_acctbal"))
      .select(coalesce(col("r_name"), lit("ALL")).as("r_name"),
        coalesce(col("n_name"), lit("ALL")).as("n_name"),
        col("n_suppliers"), col("total_acctbal"))

  /** As-of join, the scalable way: for every purchase event, the most
    * recent prior view by the same user. No join at all — a running
    * last_value(ignoreNulls) over ONE user_id shuffle computes the match
    * for every row in a single pass, where a naive inequality join would
    * be O(purchases x views) per user.
    */
  def q12AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("last_view_id",
        last(when(col("event_type") === "view", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_view_ts",
        last(when(col("event_type") === "view", col("ts_ns")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("last_view_id"),
        expr("(ts_ns - last_view_ts) div 1000000000").as("gap_s"))
  }

  /** Sketch-based distinct counting (HyperLogLog++): the cardinality
    * estimate that replaces exact distinct at 100 TB — mergeable partial
    * sketches, one small shuffle, bounded memory per group. Engine
    * sketches differ, so this is rows-only checked by the driver; the
    * test suite asserts <10% relative error against the exact count.
    */
  def q9bApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("approx_customers"))
      .orderBy(col("o_orderpriority"))

  /** Exact interpolated percentiles per group (cortex's metrics tool
    * reports size/complexity distributions, internal/mcp/metrics.go).
    * Matches DuckDB's quantile_cont definition (linear interpolation),
    * so the oracle verifies digit-for-digit.
    *
    * SORT-BASED since round 14: Spark's `percentile` aggregate buffers
    * EVERY group value in an ObjectHashAggregate map (a group of a
    * billion rows is a multi-GB in-memory buffer on one reducer — the
    * guide's §5 OOM shape; this was the engine's slowest query and its
    * only unbounded-memory aggregate). The same exact result computes
    * with bounded memory as a rank selection over a per-group SORT:
    * row_number() over (group, value) is a streaming window over the
    * externally-sorted shuffle (spills gracefully at any group size),
    * the group counts broadcast back (one thin 5-row aggregate), and
    * each percentile reads at most two ranked rows,
    * interpolated exactly as Spark's Percentile.getPercentile does:
    * pos = q·(n-1); lower = ⌊pos⌋; higher = ⌈pos⌉;
    * result = (higher-pos)·v[lower] + (pos-lower)·v[higher], all in
    * IEEE double — the identical operations in the identical order, so
    * outputs are bit-identical to the buffering aggregate (hash-checked
    * at 3 SFs + sf1). Ties cost nothing: equal values make any
    * row_number order among them select the same value. At 100 TB the
    * per-group sort is the documented cost (5 groups ⇒ 5 sorting
    * reducers); q13b/q13c stay the sketch/sample paths.
    */
  def q13Percentiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_totalprice"))
    // thin per-group stats: count for the rank arithmetic, max = p100.
    // percentile ignores NULLs, so n counts the value column, the ranked
    // side drops them, and an all-null group keeps its row via the left
    // join (null percentiles, like the aggregate form).
    val counts = o.groupBy(col("o_orderpriority"))
      .agg(count(col("o_totalprice")).as("n"),
        max(col("o_totalprice")).as("mx"))
    val ranked = o.filter(col("o_totalprice").isNotNull)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"))).cast("long") - 1L)
      .join(broadcast(counts.select(col("o_orderpriority"), col("n"))),
        "o_orderpriority")
    // per-quantile rank bounds (n is constant within a group, so these
    // are per-row constants): keep only the ≤4 rows per group any
    // percentile can read, then reduce them with conditional aggregates
    val qs = Seq(("50", 0.5), ("95", 0.95))
    def pos(q: Double): Column = lit(q) * (col("n") - 1L).cast("double")
    def lo(q: Double): Column = floor(pos(q)).cast("long")
    def hi(q: Double): Column = ceil(pos(q)).cast("long")
    val needed = qs.map { case (_, q) =>
      col("rn") === lo(q) || col("rn") === hi(q) }.reduce(_ || _)
    val picked = ranked.filter(needed)
    val aggs = qs.flatMap { case (tag, q) => Seq(
      min(when(col("rn") === lo(q), col("o_totalprice"))).as(s"vlo$tag"),
      min(when(col("rn") === hi(q), col("o_totalprice"))).as(s"vhi$tag"))
    } :+ max(col("n")).as("n")
    val interp = picked.groupBy(col("o_orderpriority"))
      .agg(aggs.head, aggs.tail: _*)
    def pct(tag: String, q: Double): Column = {
      val (vlo, vhi) = (col(s"vlo$tag"), col(s"vhi$tag"))
      // Percentile.getPercentile's exact branch structure: integral
      // position or equal keys short-circuit to the lower value with no
      // arithmetic; otherwise the two-sided interpolation form (NOT
      // vlo + frac·(vhi-vlo), whose rounding differs)
      when(hi(q) === lo(q), vlo)
        .otherwise(when(vhi === vlo, vlo)
          .otherwise((hi(q).cast("double") - pos(q)) * vlo +
            (pos(q) - lo(q).cast("double")) * vhi))
    }
    counts.join(interp.select(col("o_orderpriority"),
        round(pct("50", 0.5), 4).as("p50"),
        round(pct("95", 0.95), 4).as("p95")),
      Seq("o_orderpriority"), "left")
      .select(col("o_orderpriority"), col("p50"), col("p95"),
        round(col("mx"), 4).as("p100"))
      .orderBy(col("o_orderpriority"))
  }

  /** The 100 TB path for [[q13Percentiles]]: percentile_approx builds a
    * MERGEABLE quantile sketch per partition (map-side partial, one thin
    * shuffle of sketches, no global sort of values) where exact
    * percentile collects every group value into one aggregation buffer —
    * fine per moderate group, fatal when a group holds billions of rows.
    * Approximate by design (rows-only driver check, like the HLL op);
    * the accuracy contract vs the exact op is pinned in the test suite.
    * Accuracy parameter 10000 bounds rank error at ~1/10000 of the
    * group size. */
  def q13bApproxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile_approx(o_totalprice, 0.5, 10000)"), 4).as("p50"),
        round(expr("percentile_approx(o_totalprice, 0.95, 10000)"), 4).as("p95"),
        round(max(col("o_totalprice")), 4).as("p100"))
      .orderBy(col("o_orderpriority"))

  /** Pivot (long → wide): events count per user per event_type with an
    * EXPLICIT pivot column list — at scale the list comes from the
    * catalog, never from a discovery scan; the plan is then a single
    * partial-aggregated shuffle on user_id, identical to a groupBy with
    * conditional aggregates (which is exactly how the oracle states it).
    */
  def q14Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .select(col("user_id"),
        coalesce(col("click"), lit(0L)).as("n_click"),
        coalesce(col("view"), lit(0L)).as("n_view"),
        coalesce(col("purchase"), lit(0L)).as("n_purchase"),
        coalesce(col("signup"), lit(0L)).as("n_signup"),
        coalesce(col("error"), lit(0L)).as("n_error"))

  /** Latest-row-per-key (incremental index upsert semantics,
    * internal/storage/chunk_writer.go): one shuffle on the key, then a
    * ranking window picks the newest version.
    */
  def q11UpsertLatest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 4).as("value"))
  }

  /** Ordered conversion funnel view → click → purchase (the windowFunnel
    * shape every event-analytics engine ships): step k counts users whose
    * earliest step-k event falls strictly after their earliest qualifying
    * step-(k-1) event. ONE pass: chained running mins over a single
    * (user_id, ts, event_id) window sort — a click qualifies iff it
    * strictly trails the running view-min, a purchase iff it strictly
    * trails the running qualified-click-min — then one per-user aggregate
    * and a stack() to step rows. A join-chain of per-stage aggregates was
    * measured to RE-COMPUTE stage 1 three times (no physical subtree
    * reuse across the union), so the window formulation wins at any
    * scale: one pushed-filter scan, one user_id exchange, one sort, and
    * per-row state that never materializes a per-user array (hot-user
    * safe). Nanosecond ts_ns keeps strict-after exact under µs ties. */
  def q15Funnel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ns"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val per = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts_ns"), col("event_id"))
      .withColumn("rv",
        min(when(col("event_type") === "view", col("ts_ns"))).over(w))
      .withColumn("qc",
        when(col("event_type") === "click" && col("ts_ns") > col("rv"),
          col("ts_ns")))
      .withColumn("rc", min(col("qc")).over(w))
      .withColumn("qp",
        when(col("event_type") === "purchase" && col("ts_ns") > col("rc"),
          col("ts_ns")))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts_ns"))).as("t1"),
        min(col("qc")).as("t2"), min(col("qp")).as("t3"))
    per
      .agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"),
        count(col("t3")).as("n3"))
      .selectExpr("stack(3, 1, 'view', n1, 2, 'click', n2," +
        " 3, 'purchase', n3) AS (step, event_type, n_users)")
      .orderBy(col("step"))
  }

  /** Cohort retention (day-granularity): users grouped by first-active
    * day, counted on each later activity day as an offset from the
    * cohort day — the triangle every growth dashboard draws. TWO
    * exchanges total: collect_set(day) per user (map-side partial
    * aggregation dedups (user, day) before the shuffle) yields day set
    * AND cohort (= array_min) in one pass, a narrow explode re-emits the
    * days where the row lives, and the (cohort, offset) aggregate counts
    * plain rows — (user, day) is already unique, so no distinct
    * machinery. The per-user state is its set of ACTIVE DAYS, bounded by
    * the calendar (a few thousand even over years), not by event
    * volume. The join-free shape replaces a distinct + per-user-min +
    * join chain that cost 4 exchanges. */
  def q16Retention(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id"))
      .agg(collect_set(col("day")).as("ds"))
      .select(col("user_id"), array_min(col("ds")).as("cohort"),
        explode(col("ds")).as("day"))
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("day"), col("cohort")).as("offset_days"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("offset_days"))

  /** Portable HyperLogLog distinct counting (Flajolet et al. 2007),
    * hash-checked cross-engine — the companion to [[q9bApproxDistinct]]:
    * q9b demonstrates the ENGINE-INTERNAL HLL++ sketch (whose register
    * layout no other engine can replay, hence rows-only), this operator
    * builds the same estimator from md5-derived arithmetic any engine
    * reproduces bit-for-bit, so the driver hash-checks the estimate
    * itself.
    *
    * Construction (m = 256 registers, the classic estimator without the
    * ++ bias table): 60-bit hash = md5("hll#" ++ custkey)[:15 hex];
    * register = low 8 bits; rank = leading-zero count of the remaining
    * 52 bits + 1. The register maxima aggregate with partial (map-side)
    * combine — the sketch property that makes distinct counting a thin
    * mergeable shuffle at 100 TB — then the harmonic-mean estimate folds
    * 256 rows per group. FP determinism: the register sum Σ 2^-M is kept
    * in INTEGER arithmetic scaled by 2^53 (every term 2^(53-M) is exact,
    * the sum fits a long, and addition order cannot change it); doubles
    * appear only in the final one-division estimate, identical IEEE ops
    * on both engines. The suite pins <10% relative error vs the exact
    * count (theory: 1.04/√256 ≈ 6.5%).
    */
  def q9cPortableHll(spark: SparkSession, dir: String): DataFrame = {
    val m = 256
    val h = conv(substring(md5(concat(lit("hll#"),
      col("o_custkey").cast("string"))), 1, 15), 16, 10).cast("long")
    val w = shiftright(col("h"), 8)
    val bitlen = when(w === 0L, lit(0))
      .otherwise(length(bin(w)).cast("int"))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"), h.as("h"))
      .select(col("o_orderpriority"),
        col("h").bitwiseAND(lit(255L)).as("reg"),
        (lit(53) - bitlen).as("rank"))
      .groupBy(col("o_orderpriority"), col("reg"))
      .agg(max(col("rank")).as("mreg"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(expr("shiftleft(1L, cast(53 - mreg AS int))"))
          .as("s_present"),
        count(lit(1)).as("n_regs"))
      .select(col("o_orderpriority"), col("n_regs"),
        (col("s_present") +
          (lit(m.toLong) - col("n_regs")) * lit(1L << 53)).cast("double")
          .as("s_int"),
        (lit(m.toLong) - col("n_regs")).as("v"))
      .select(col("o_orderpriority"),
        round(when(
          alpha * lit(m * m) * pow(lit(2.0), lit(53)) / col("s_int")
            <= lit(2.5 * m) && col("v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(
            alpha * lit(m * m) * pow(lit(2.0), lit(53)) / col("s_int")),
          4).as("hll_customers"),
        col("n_regs"))
      .orderBy(col("o_orderpriority"))
  }

  /** Deterministic bounded-sample percentiles, hash-checked cross-engine —
    * the companion to [[q13bApproxPercentiles]] the same way
    * [[q9cPortableHll]] companions q9b: percentile_approx's t-digest is
    * engine-internal (rows-only), but a k-smallest-by-md5 sample is a
    * uniform random sample ANY engine reproduces exactly, and exact
    * interpolated percentiles over it are digit-identical (the q13
    * percentile/quantile_cont agreement).
    *
    * Scale shape: the per-group state is the [[graft.functions.TopKAgg]]
    * bounded heap (k = 200) keyed on the 48-bit md5 of the order key —
    * map-side partials trim to k before the shuffle, so a group of a
    * billion rows ships 200 of them, the same bounded-memory contract as
    * the t-digest. 48 bits (not 60) so the negated hash sits exactly in
    * a double; the sampled value rides the heap as exact integer cents.
    * Rank error is O(1/√k) ≈ 7% — the suite pins p50/p95 within 15% of
    * the exact q13 answers.
    */
  def q13cSampledPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val k = 200
    val h = conv(substring(md5(concat(lit("q13c#"),
      col("o_orderkey").cast("string"))), 1, 12), 16, 10).cast("long")
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        (-h.cast("double")).as("nh"),
        // +0.5-floor, not round(): half-tie behavior differs across
        // engines (the vec_quantize_int8 lesson)
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.TopKAgg.topK(col("nh"), col("cents"), k).as("top"))
      .select(col("o_orderpriority"), explode(col("top")).as("e"))
      .select(col("o_orderpriority"), (col("e.id") / 100.0).as("price"))
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(price, 0.5)"), 4).as("p50"),
        round(expr("percentile(price, 0.95)"), 4).as("p95"),
        count(lit(1)).as("n_sample"))
      .orderBy(col("o_orderpriority"))
  }
}
