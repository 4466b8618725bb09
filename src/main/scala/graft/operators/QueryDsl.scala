package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Structured-query DSL — the cortex `cortex_files` tool surface
  * (internal/mcp/files_tool.go: JSON queries with SELECT fields, WHERE
  * with =/!=/>/>=/</<=/LIKE/IN/BETWEEN, JOINs, GROUP BY + COUNT/SUM/AVG/
  * MIN/MAX, HAVING, ORDER BY, LIMIT/OFFSET) compiled to a DataFrame plan
  * instead of a SQL string.
  *
  * Compilation is pure plan construction: predicates become Catalyst
  * expressions the optimizer pushes into scans, joins go through the
  * normal broadcast/shuffle selection, ORDER BY + LIMIT collapses to
  * TakeOrderedAndProject — the DSL adds zero execution machinery of its
  * own, which is the point of compiling onto Spark.
  */
object QueryDsl {

  sealed trait Pred
  /** op ∈ =, !=, >, >=, <, <=, LIKE (SQL % wildcards), GLOB. The wire
    * format's NOT LIKE / NOT IN / IS NOT NULL arrive as first-class
    * operators (translator.go:157-205) and normalize to NotP wrappers
    * at parse time. */
  final case class Cmp(field: String, op: String, value: Any) extends Pred
  final case class In(field: String, values: Seq[Any]) extends Pred
  final case class IsNull(field: String) extends Pred
  final case class Between(field: String, lo: Any, hi: Any) extends Pred
  final case class AndP(ps: Seq[Pred]) extends Pred
  final case class OrP(ps: Seq[Pred]) extends Pred
  final case class NotP(p: Pred) extends Pred

  /** function ∈ COUNT (field optional), SUM, AVG, MIN, MAX; `distinct`
    * maps COUNT/SUM/AVG onto their DISTINCT forms (translator.go:265-288);
    * `round` applies ROUND(x, n) so float aggregates verify across
    * engines. */
  final case class Agg(function: String, field: Option[String],
      alias: String, round: Option[Int] = None, distinct: Boolean = false)

  final case class Order(field: String, desc: Boolean = false)

  /** Equi-join to another table; joinType ∈ inner, left, right, full
    * (the wire format's four join types, translator.go:225-236). */
  final case class Join(table: String, leftField: String, rightField: String,
      joinType: String = "inner")

  final case class QuerySpec(
      from: String,
      fields: Seq[String] = Nil,
      joins: Seq[Join] = Nil,
      where: Option[Pred] = None,
      groupBy: Seq[String] = Nil,
      aggregations: Seq[Agg] = Nil,
      having: Option[Pred] = None,
      orderBy: Seq[Order] = Nil,
      limit: Option[Int] = None,
      offset: Int = 0)

  private def compilePred(p: Pred): Column = p match {
    case Cmp(f, "=", v)    => col(f) === lit(v)
    case Cmp(f, "!=", v)   => col(f) =!= lit(v)
    case Cmp(f, ">", v)    => col(f) > lit(v)
    case Cmp(f, ">=", v)   => col(f) >= lit(v)
    case Cmp(f, "<", v)    => col(f) < lit(v)
    case Cmp(f, "<=", v)   => col(f) <= lit(v)
    case Cmp(f, "LIKE", v) => col(f).like(v.toString)
    // glob admission in the query surface: the same separator-aware
    // compiler the discovery operator uses (discovery.go patterns meet
    // the files-tool WHERE clause), so "path GLOB src1*/**" composes
    // with every other predicate and pushes like any rlike
    case Cmp(f, "GLOB", v) =>
      col(f).rlike(DiscoveryOps.globToRegex(v.toString))
    case Cmp(_, op, _)     =>
      throw new IllegalArgumentException(s"unsupported operator: $op")
    case In(f, vs)         => col(f).isin(vs: _*)
    case IsNull(f)         => col(f).isNull
    case Between(f, lo, hi) => col(f).between(lit(lo), lit(hi))
    case AndP(ps) => ps.map(compilePred).reduceOption(_ && _).getOrElse(lit(true))
    case OrP(ps)  => ps.map(compilePred).reduceOption(_ || _).getOrElse(lit(false))
    case NotP(s)  => !compilePred(s)
  }

  private def compileAgg(a: Agg): Column = {
    val base = (a.function.toUpperCase, a.field, a.distinct) match {
      case ("COUNT", None, false)    => count(lit(1))
      case ("COUNT", Some(f), false) => count(col(f))
      case ("COUNT", Some(f), true)  => countDistinct(col(f))
      case ("SUM", Some(f), false)   => sum(col(f))
      case ("SUM", Some(f), true)    => sum_distinct(col(f))
      case ("AVG", Some(f), false)   => avg(col(f))
      // no avg_distinct in the Column API: AVG(DISTINCT x) ≡
      // SUM(DISTINCT x) / COUNT(DISTINCT x) (no expr() — field names are
      // untrusted wire input and must never be spliced into SQL text)
      case ("AVG", Some(f), true) =>
        sum_distinct(col(f)).cast("double") / countDistinct(col(f))
      case ("MIN", Some(f), _)       => min(col(f))
      case ("MAX", Some(f), _)       => max(col(f))
      case (fn, f, d) =>
        throw new IllegalArgumentException(
          s"unsupported aggregation: $fn($f, distinct=$d)")
    }
    a.round.map(n => round(base, n)).getOrElse(base).as(a.alias)
  }

  /** One validation finding — the reference's ValidationError shape
    * (internal/files/validator.go:9: field / value / message / hint). */
  final case class ValidationError(field: String, value: String,
      message: String, hint: String) {
    override def toString: String =
      s"""$field: $message (value: "$value"). $hint"""
  }

  /** Every finding at once, as the reference's ValidationErrors.Error()
    * renders them — a tooling client fixing a query wants the FULL
    * ledger, not the first bad field. */
  final class ValidationException(val errors: Seq[ValidationError])
      extends IllegalArgumentException(
        if (errors.sizeIs == 1) errors.head.toString
        else errors.zipWithIndex.map { case (e, i) => s"  ${i + 1}. $e" }
          .mkString(s"${errors.size} validation errors:\n", "\n", ""))

  private val JoinTypes = Set("inner", "left", "right", "full")
  private val AggFns = Set("COUNT", "SUM", "AVG", "MIN", "MAX")
  private val CmpOps = Set("=", "!=", ">", ">=", "<", "<=", "LIKE", "GLOB")
  private val Ident = "^[A-Za-z_][A-Za-z0-9_]*$".r
  private val TableHint = "Valid tables: files, types, functions, imports, " +
    "chunks, or any corpus parquet table"
  private val ColumnHint = "Check the table schema for valid columns"

  /** Validate `q` against the corpus schemas under `dir`, accumulating
    * EVERY invalid field/value with a hint — the reference validator's
    * contract (internal/files/validator.go:72 Validate: all errors
    * collected before returning, early-out only when `from` itself is
    * missing or unknown, since nothing else is checkable without a base
    * schema). Schema registry = whatever [[Tables.load]] resolves, so
    * the validator can never drift from what compile() accepts. Pure
    * metadata work: only parquet footers are read, no job runs. */
  def validate(spark: SparkSession, dir: String,
      q: QuerySpec): Seq[ValidationError] = {
    val errors = scala.collection.mutable.ArrayBuffer[ValidationError]()
    def err(f: String, v: String, m: String, h: String): Unit =
      errors += ValidationError(f, v, m, h)
    def cols(name: String): Option[Set[String]] =
      try Some(Tables.load(spark, dir, name).columns.toSet)
      catch { case scala.util.control.NonFatal(_) => None }
    if (q.from.isEmpty) {
      err("from", "", "from table is required", "Specify the table to query")
      return errors.toSeq
    }
    val fromCols = cols(q.from) match {
      case None =>
        err("from", q.from, "unknown table", TableHint)
        return errors.toSeq
      case Some(cs) => cs
    }
    // the visible column scope grows join by join, as compile's plan does
    var scope = fromCols
    q.joins.zipWithIndex.foreach { case (j, i) =>
      if (!JoinTypes(j.joinType))
        err(s"joins[$i].type", j.joinType, "invalid join type",
          "Valid types: inner, left, right, full")
      if (!scope(j.leftField))
        err(s"joins[$i].leftField", j.leftField,
          "unknown column in the join's left scope", ColumnHint)
      cols(j.table) match {
        case None => err(s"joins[$i].table", j.table, "unknown table", TableHint)
        case Some(rc) =>
          if (!rc(j.rightField))
            err(s"joins[$i].rightField", j.rightField,
              s"unknown column in table ${j.table}", ColumnHint)
          scope ++= rc
      }
    }
    def checkPred(p: Pred, ctx: String, avail: Set[String]): Unit = p match {
      case Cmp(f, op, _) =>
        if (!avail(f)) err(ctx, f, "unknown column", ColumnHint)
        if (!CmpOps(op))
          err(ctx, op, "unsupported operator", "Valid operators: " +
            "=, !=, >, >=, <, <=, LIKE, NOT LIKE, GLOB, IN, NOT IN, " +
            "BETWEEN, IS NULL, IS NOT NULL")
      case In(f, _) => if (!avail(f)) err(ctx, f, "unknown column", ColumnHint)
      case IsNull(f) => if (!avail(f)) err(ctx, f, "unknown column", ColumnHint)
      case Between(f, _, _) =>
        if (!avail(f)) err(ctx, f, "unknown column", ColumnHint)
      case AndP(ps) => ps.foreach(checkPred(_, ctx, avail))
      case OrP(ps)  => ps.foreach(checkPred(_, ctx, avail))
      case NotP(s)  => checkPred(s, ctx, avail)
    }
    q.where.foreach(checkPred(_, "where", scope))
    q.groupBy.foreach(g =>
      if (!scope(g)) err("groupBy", g, "unknown column", ColumnHint))
    q.aggregations.zipWithIndex.foreach { case (a, i) =>
      val fn = a.function.toUpperCase
      if (!AggFns(fn))
        err(s"aggregations[$i].function", a.function,
          "invalid aggregation function",
          "Valid functions: COUNT, SUM, AVG, MIN, MAX")
      if (fn != "COUNT" && a.field.isEmpty)
        err(s"aggregations[$i].field", "", s"$fn requires a field",
          "Specify the field to aggregate")
      a.field.foreach { f =>
        if (!scope(f))
          err(s"aggregations[$i].field", f, "unknown column", ColumnHint)
        else if (Ident.findFirstIn(f).isEmpty)
          err(s"aggregations[$i].field", f, "field name contains invalid characters",
            "Field names must start with a letter or underscore and contain " +
              "only letters, digits, or underscores")
      }
      if (a.alias.isEmpty)
        err(s"aggregations[$i].alias", "", "aggregation alias is required",
          "Provide an alias for the aggregation result")
      else if (Ident.findFirstIn(a.alias).isEmpty)
        err(s"aggregations[$i].alias", a.alias, "alias contains invalid characters",
          "Aliases must start with a letter or underscore and contain only " +
            "letters, digits, or underscores")
    }
    // HAVING and ORDER BY may reference aggregation aliases and GROUP BY
    // columns on top of the join scope, exactly as compile resolves them
    val avail = scope ++ q.aggregations.map(_.alias) ++ q.groupBy
    q.having.foreach(checkPred(_, "having", avail))
    q.orderBy.zipWithIndex.foreach { case (o, i) =>
      if (!avail(o.field) && !q.fields.contains(o.field))
        err(s"orderBy[$i].field", o.field, "unknown column",
          "Check the table schema for valid columns, aggregation aliases, " +
            "or GROUP BY columns")
    }
    q.fields.foreach(f =>
      if (f != "*" && !avail(f)) err("fields", f, "unknown column", ColumnHint))
    q.limit.filter(_ < 1).foreach(n =>
      err("limit", n.toString, "limit must be at least 1", "Adjust the limit value"))
    if (q.offset < 0)
      err("offset", q.offset.toString, "offset must be non-negative",
        "Set offset to 0 or greater")
    errors.toSeq
  }

  /** [[compile]] behind the full-ledger validation gate: a bad query
    * fails with EVERY finding (hints included) in one exception. */
  def compileValidated(spark: SparkSession, dir: String,
      q: QuerySpec): DataFrame = {
    val es = validate(spark, dir, q)
    if (es.nonEmpty) throw new ValidationException(es)
    compile(spark, dir, q)
  }

  /** Compile a QuerySpec against the corpus tables under `dir`. */
  def compile(spark: SparkSession, dir: String, q: QuerySpec): DataFrame = {
    var df = Tables.load(spark, dir, q.from)
    q.joins.foreach { j =>
      // reference the key through each side's own DataFrame: an
      // unqualified col() is ambiguous whenever both sides share the
      // join-key column name (id=id joins, self-joins). Same-named keys
      // get USING semantics (one output key column) so downstream
      // fields/predicates on the key stay unambiguous.
      val right = Tables.load(spark, dir, j.table)
      df =
        if (j.leftField == j.rightField)
          df.join(right, Seq(j.leftField), j.joinType)
        else df.join(right, df(j.leftField) === right(j.rightField), j.joinType)
    }
    q.where.foreach(p => df = df.filter(compilePred(p)))
    if (q.groupBy.nonEmpty || q.aggregations.nonEmpty) {
      if (q.aggregations.isEmpty)
        throw new IllegalArgumentException(
          s"groupBy ${q.groupBy.mkString(",")} requires at least one aggregation")
      val aggs = q.aggregations.map(compileAgg)
      df =
        if (q.groupBy.isEmpty) df.agg(aggs.head, aggs.tail: _*)
        else df.groupBy(q.groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
    }
    q.having.foreach(p => df = df.filter(compilePred(p)))
    if (q.fields.nonEmpty) df = df.select(q.fields.map(col): _*)
    if (q.orderBy.nonEmpty)
      df = df.orderBy(q.orderBy.map(o =>
        if (o.desc) col(o.field).desc else col(o.field).asc): _*)
    if (q.offset > 0) df = df.offset(q.offset)
    q.limit.foreach(n => df = df.limit(n))
    df
  }

  /** JSON front-end, same wire shape as the cortex tool:
    * `{"from": "...", "fields": [...], "where": {"field","operator",
    * "value"} | {"and":[...]} | {"or":[...]} | {"not":...}, "joins":
    * [{"table","leftField","rightField","type"?}], "groupBy": [...],
    * "aggregations": [{"function","field","alias","round"?,"distinct"?}],
    * "having":
    * ..., "orderBy": [{"field","direction"}], "limit", "offset"}`.
    * Operators cover the reference translator's full set
    * (translator.go:157-205): the six comparisons, LIKE / NOT LIKE,
    * IN / NOT IN, IS NULL / IS NOT NULL, BETWEEN, plus GLOB.
    * Parsed with Jackson (already on Spark's classpath) — no new
    * dependency.
    */
  def parse(json: String): QuerySpec = {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    import scala.jdk.CollectionConverters._
    val root = new ObjectMapper().readTree(json)

    // this is the untrusted boundary — every malformed shape must come
    // back as IllegalArgumentException with a usable message, never a
    // raw NPE/NoSuchElement from deep inside Jackson accessors
    def req(n: JsonNode, name: String, ctx: String): JsonNode = {
      val v = n.get(name)
      if (v == null || v.isNull)
        throw new IllegalArgumentException(s"$ctx: missing required '$name'")
      v
    }

    // numeric fields must actually be integers on the wire: Jackson's
    // asInt() returns 0 for non-numeric JSON, which would silently turn
    // {"limit": "abc"} into limit=0 (an empty result) instead of an error
    def intOf(n: JsonNode, name: String): Int = {
      if (!n.isIntegralNumber)
        throw new IllegalArgumentException(s"'$name' must be an integer, got $n")
      n.asInt()
    }

    def value(n: JsonNode): Any =
      if (n.isIntegralNumber) n.asLong()
      else if (n.isNumber) n.asDouble()
      else if (n.isBoolean) n.asBoolean()
      else n.asText()

    def pred(n: JsonNode): Pred =
      if (n.has("and")) AndP(n.get("and").elements().asScala.map(pred).toSeq)
      else if (n.has("or")) OrP(n.get("or").elements().asScala.map(pred).toSeq)
      else if (n.has("not")) NotP(pred(n.get("not")))
      else {
        val f = req(n, "field", "predicate").asText()
        req(n, "operator", s"predicate on $f").asText().toUpperCase match {
          case "IN" =>
            In(f, req(n, "value", s"IN on $f").elements().asScala.map(value).toSeq)
          case "NOT IN" =>
            NotP(In(f,
              req(n, "value", s"NOT IN on $f").elements().asScala.map(value).toSeq))
          case "NOT LIKE" =>
            NotP(Cmp(f, "LIKE", value(req(n, "value", s"NOT LIKE on $f"))))
          case "IS NULL" => IsNull(f)
          case "IS NOT NULL" => NotP(IsNull(f))
          case "BETWEEN" =>
            val vs = req(n, "value", s"BETWEEN on $f")
              .elements().asScala.map(value).toSeq
            if (vs.sizeIs != 2)
              throw new IllegalArgumentException(
                s"BETWEEN on $f: value must be a 2-element array, got $vs")
            Between(f, vs.head, vs(1))
          case op => Cmp(f, op, value(req(n, "value", s"$op on $f")))
        }
      }

    def strings(field: String): Seq[String] =
      if (root.has(field)) root.get(field).elements().asScala.map(_.asText()).toSeq
      else Nil

    QuerySpec(
      from = req(root, "from", "query").asText(),
      fields = strings("fields"),
      joins =
        if (root.has("joins"))
          root.get("joins").elements().asScala.map { j =>
            val jt =
              if (j.has("type")) j.get("type").asText().toLowerCase
              else "inner"
            if (!Set("inner", "left", "right", "full").contains(jt))
              throw new IllegalArgumentException(
                s"join type must be inner/left/right/full, got '$jt'")
            Join(req(j, "table", "join").asText(),
              req(j, "leftField", "join").asText(),
              req(j, "rightField", "join").asText(), jt)
          }.toSeq
        else Nil,
      where = if (root.has("where")) Some(pred(root.get("where"))) else None,
      groupBy = strings("groupBy"),
      aggregations =
        if (root.has("aggregations"))
          root.get("aggregations").elements().asScala.map { a =>
            Agg(req(a, "function", "aggregation").asText(),
              if (a.has("field")) Some(a.get("field").asText()) else None,
              req(a, "alias", "aggregation").asText(),
              if (a.has("round")) Some(intOf(a.get("round"), "round")) else None,
              a.has("distinct") && a.get("distinct").asBoolean(false))
          }.toSeq
        else Nil,
      having = if (root.has("having")) Some(pred(root.get("having"))) else None,
      orderBy =
        if (root.has("orderBy"))
          root.get("orderBy").elements().asScala.map { o =>
            val dir =
              if (o.has("direction")) o.get("direction").asText().toUpperCase
              else "ASC"
            // reject typos instead of silently sorting the wrong way —
            // the worst failure mode for a wire-format parser
            if (dir != "ASC" && dir != "DESC")
              throw new IllegalArgumentException(
                s"orderBy direction must be ASC or DESC, got '$dir'")
            Order(req(o, "field", "orderBy").asText(), dir == "DESC")
          }.toSeq
        else Nil,
      limit = if (root.has("limit")) Some(intOf(root.get("limit"), "limit")) else None,
      offset = if (root.has("offset")) intOf(root.get("offset"), "offset") else 0)
  }

  /** Contract row 1: grouped aggregation with HAVING and ordering —
    * "count files by language" shape from the tool's own examples. */
  def dslAgg(spark: SparkSession, dir: String): DataFrame =
    compile(spark, dir, QuerySpec(
      from = "orders",
      groupBy = Seq("o_orderpriority"),
      aggregations = Seq(
        Agg("COUNT", None, "n_orders"),
        Agg("SUM", Some("o_totalprice"), "total_price", round = Some(4)),
        Agg("MAX", Some("o_totalprice"), "max_price", round = Some(4))),
      having = Some(Cmp("n_orders", ">", 100L)),
      orderBy = Seq(Order("o_orderpriority"))))

  /** Contract row 3: the `modules` rollup from the tool's own examples
    * ("Module statistics: {"from": "modules", "fields": ["module_path",
    * "file_count", "line_count_total"], ...}", files_tool.go:30-31) —
    * file counts and line totals per module_path (the file path's source
    * prefix), derived through the DSL compiler over the virtual `files`
    * view rather than a pre-materialized table: one scan, one partial
    * aggregate, TakeOrdered-free full ordering of a tiny result. */
  def dslModules(spark: SparkSession, dir: String): DataFrame =
    compile(spark, dir, parse("""{
      "from": "files",
      "groupBy": ["module_path"],
      "aggregations": [
        {"function": "COUNT", "alias": "file_count"},
        {"function": "SUM", "field": "line_count", "alias": "line_count_total"},
        {"function": "AVG", "field": "n_chars", "alias": "avg_chars", "round": 4}],
      "orderBy": [{"field": "file_count", "direction": "DESC"},
                  {"field": "module_path", "direction": "ASC"}]
    }"""))

  /** Virtual `functions` table through the wire format (files_tool.go:50
    * "Available tables: files, types, functions, imports, modules,
    * chunks"): function inventory joined USING file_path back to `files`
    * for language/size metadata — the "find functions in large English
    * files" shape. Both views project the same documents scan, so the
    * plan is two scans joined on the derived key with every predicate
    * pushed below the join (plan-tested). */
  def dslFunctions(spark: SparkSession, dir: String): DataFrame =
    compile(spark, dir, parse("""{
      "from": "functions",
      "joins": [{"table": "files", "leftField": "file_path",
                 "rightField": "file_path"}],
      "where": {"and": [
        {"field": "lang", "operator": "=", "value": "en"},
        {"field": "line_count", "operator": ">=", "value": 3},
        {"field": "name", "operator": "LIKE", "value": "s%"}]},
      "fields": ["function_id", "file_path", "name", "start_pos",
                 "line_count"],
      "orderBy": [{"field": "function_id", "direction": "ASC"},
                  {"field": "start_pos", "direction": "ASC"}],
      "limit": 100
    }"""))

  /** Virtual `types` + `imports` tables: per-module rollup of type
    * declarations against modules that import a target name — the
    * "which modules define types AND pull in stream I/O" shape. The
    * semi-join direction keeps the aggregate on the thin types side. */
  def dslTypes(spark: SparkSession, dir: String): DataFrame =
    compile(spark, dir, parse("""{
      "from": "types",
      "joins": [{"table": "imports", "leftField": "file_path",
                 "rightField": "file_path"}],
      "where": {"field": "import_path", "operator": "IN",
                "value": ["row", "scan", "filter"]},
      "groupBy": ["module_path"],
      "aggregations": [
        {"function": "COUNT", "alias": "n_type_import_pairs"},
        {"function": "AVG", "field": "import_line", "alias": "avg_import_line",
         "round": 4},
        {"function": "MIN", "field": "start_pos", "alias": "first_decl"}],
      "having": {"field": "n_type_import_pairs", "operator": ">", "value": 2},
      "orderBy": [{"field": "n_type_import_pairs", "direction": "DESC"},
                  {"field": "module_path", "direction": "ASC"}],
      "limit": 50
    }"""))

  /** Virtual `chunks` table: per-file chunk inventory with a HAVING
    * floor — the "files whose chunk count says they're big" shape
    * (chunks table, schema.go:296; one scan + one partial aggregate). */
  def dslChunks(spark: SparkSession, dir: String): DataFrame =
    compile(spark, dir, parse("""{
      "from": "chunks",
      "groupBy": ["file_path"],
      "aggregations": [
        {"function": "COUNT", "alias": "n_chunks"},
        {"function": "SUM", "field": "n_chunk_tokens", "alias": "n_tokens"},
        {"function": "MAX", "field": "chunk_idx", "alias": "last_chunk"}],
      "having": {"field": "n_chunks", "operator": ">=", "value": 6},
      "orderBy": [{"field": "n_tokens", "direction": "DESC"},
                  {"field": "file_path", "direction": "ASC"}],
      "limit": 40
    }"""))

  /** The anti-join shape through the wire format: LEFT JOIN + IS NULL
    * ("files declaring no function"), NOT IN admission, and a
    * COUNT(DISTINCT) rollup — the operators the reference translator
    * carries beyond the basic comparison set (translator.go:181-205,
    * :225-236, :265-270). */
  def dslOrphans(spark: SparkSession, dir: String): DataFrame =
    compile(spark, dir, parse("""{
      "from": "files",
      "joins": [{"table": "functions", "leftField": "file_path",
                 "rightField": "file_path", "type": "left"}],
      "where": {"and": [
        {"field": "name", "operator": "IS NULL"},
        {"field": "lang", "operator": "NOT IN", "value": ["de"]}]},
      "groupBy": ["lang"],
      "aggregations": [
        {"function": "COUNT", "field": "file_path", "distinct": true,
         "alias": "n_orphan_files"},
        {"function": "AVG", "field": "line_count", "distinct": true,
         "alias": "avg_distinct_lines", "round": 4}],
      "orderBy": [{"field": "n_orphan_files", "direction": "DESC"},
                  {"field": "lang", "direction": "ASC"}],
      "limit": 25
    }"""))

  /** Contract row 2 (via the JSON front-end): join + WHERE with
    * IN/BETWEEN/LIKE + projection + pagination — the "find large files"
    * shape. Parsed from the literal wire format to pin the parser too. */
  def dslJoinFilter(spark: SparkSession, dir: String): DataFrame =
    compile(spark, dir, parse("""{
      "from": "customer",
      "joins": [{"table": "nation", "leftField": "c_nationkey",
                 "rightField": "n_nationkey"}],
      "where": {"and": [
        {"field": "c_acctbal", "operator": "BETWEEN", "value": [9000, 10000]},
        {"field": "n_name", "operator": "LIKE", "value": "%A%"},
        {"not": {"field": "c_mktsegment", "operator": "IN",
                 "value": ["MACHINERY", "HOUSEHOLD"]}}
      ]},
      "fields": ["c_custkey", "c_name", "n_name", "c_acctbal"],
      "orderBy": [{"field": "c_custkey", "direction": "ASC"}],
      "limit": 25, "offset": 5
    }"""))
}
