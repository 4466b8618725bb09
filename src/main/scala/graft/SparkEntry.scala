package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator
  * inventory; every implemented operator appears in `queries` with a
  * DuckDB-equivalent SQL in `oracleSql` (omitted only for ops that plain
  * SQL cannot express, which the driver row-count-checks instead).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> Relational.q1Agg _,
    "q2_filter_project" -> Relational.q2FilterProject _,
    "q3_join_agg" -> Relational.q3JoinAgg _,
    "q4_broadcast_join" -> Relational.q4BroadcastJoin _,
    "q5_topk" -> Relational.q5TopK _,
    "q6_window_topk" -> Relational.q6WindowTopK _,
    "q7_semi_join" -> Relational.q7SemiJoin _,
    "q8_anti_join" -> Relational.q8AntiJoin _,
    "q9_distinct_agg" -> Relational.q9DistinctAgg _,
    "q10_rollup" -> Relational.q10Rollup _,
    "q11_upsert_latest" -> Relational.q11UpsertLatest _,
    "vec_knn_brute" -> SearchOps.vecKnnBrute _,
    "vec_knn_ivf" -> SearchOps.vecKnnIvf _,
    "vec_knn_join" -> SearchOps.vecKnnJoin _,
    "fts_term_score" -> SearchOps.ftsTermScore _,
    "fts_phrase" -> SearchOps.ftsPhrase _,
    "hybrid_search" -> SearchOps.hybridSearch _,
    "tag_filter_search" -> SearchOps.tagFilterSearch _
  )

  /** DuckDB cosine over double-cast lists — same double-accumulation the
    * codegen'd CosineSimilarity expression performs. */
  private def duckCos(a: String, b: String): String =
    s"(list_inner_product($a, $b) / " +
      s"(sqrt(list_inner_product($a, $a)) * sqrt(list_inner_product($b, $b))))"

  private val duckToks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
  private val duckTermScore =
    s"len(list_filter($duckToks, t -> list_contains(['data','query','table'], t)))"

  /** DuckDB-runnable oracle SQL, same column names as the Spark result. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE p_size >= 30 AND p_type LIKE 'SMALL%'""".stripMargin,
    "q3_join_agg" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS o_epoch,
        |  o_orderpriority
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q4_broadcast_join" ->
      """SELECT r_name, count(*) AS n_suppliers,
        |  round(sum(s_acctbal), 4) AS total_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q5_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q6_window_topk" ->
      """SELECT c_nationkey, rk, c_custkey, round(c_acctbal, 4) AS c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_nationkey
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rk
        |  FROM customer) t WHERE rk <= 3""".stripMargin,
    "q7_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,
    "q8_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT')""".stripMargin,
    "q9_distinct_agg" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q10_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
        |  count(*) AS n_suppliers, round(sum(s_acctbal), 4) AS total_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q11_upsert_latest" ->
      """SELECT user_id, event_id, event_type, round(value, 4) AS value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |                               ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events) WHERE rk = 1""".stripMargin,
    "vec_knn_brute" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, round(${duckCos("embedding::DOUBLE[]", "q_emb")}, 4) AS score
         |FROM embeddings, q WHERE vec_id <> 0
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,
    "vec_knn_ivf" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, round(${duckCos("embedding::DOUBLE[]", "q_emb")}, 4) AS score
         |FROM embeddings, q WHERE label = 2 AND vec_id <> 0
         |ORDER BY score DESC, vec_id LIMIT 10""".stripMargin,
    "vec_knn_join" ->
      s"""WITH pairs AS (
         |  SELECT a.label AS label, a.vec_id AS a_id, b.vec_id AS b_id,
         |    round(${duckCos("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]")}, 4) AS score
         |  FROM embeddings a JOIN embeddings b
         |    ON a.label = b.label AND a.vec_id <> b.vec_id)
         |SELECT label, a_id, b_id, score, rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY a_id
         |                               ORDER BY score DESC, b_id) AS rk
         |  FROM pairs) WHERE rk <= 3""".stripMargin,
    "fts_term_score" ->
      s"""SELECT doc_id, $duckTermScore AS score FROM documents
         |WHERE $duckTermScore > 0
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "fts_phrase" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE contains(lower(text), 'data query')
        |ORDER BY n_chars DESC, doc_id LIMIT 20""".stripMargin,
    "hybrid_search" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = 0),
         |tok AS (SELECT doc_id, $duckToks AS toks FROM documents)
         |SELECT t.doc_id AS doc_id,
         |  round(0.5 * ${duckCos("e.embedding::DOUBLE[]", "q_emb")} +
         |    0.5 * (len(list_filter(t.toks, x -> list_contains(['data','query','table'], x)))::DOUBLE
         |           / greatest(len(t.toks), 1)), 4) AS score
         |FROM tok t JOIN embeddings e ON t.doc_id = e.vec_id, q
         |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "tag_filter_search" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE lang = 'en' AND source IN ('src0','src1','src2')
        |  AND n_chars BETWEEN 100 AND 400
        |ORDER BY n_chars DESC, doc_id LIMIT 20""".stripMargin
  )
}
