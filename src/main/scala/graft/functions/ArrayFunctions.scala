package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.SqlBridge
import org.apache.spark.unsafe.types.UTF8String

/** `size(array_intersect(a, b))` for two SORTED, DISTINCT, null-free
  * string or long arrays, as a single merge scan.
  *
  * The built-in `array_intersect` builds a hash set of one side and
  * materializes the intersection array PER ROW — and the near-dup
  * verifies only ever read its SIZE, once per candidate pair (the hot
  * count of every dedup operator). With both sides kept sorted at index
  * build time, the count is an O(|A|+|B|) pointer walk with zero
  * allocation and zero hashing, in both codegen and interpreted modes.
  *
  * Preconditions (owned by the callers, pinned by DedupSpec): elements
  * ascending by UTF8String order and distinct (the shingle builder ends
  * in array_sort ∘ array_distinct); null ELEMENTS are skipped — they
  * cannot match, which differs from array_intersect's null≡null only
  * for inputs the shingle relation never produces. A null ARRAY yields
  * null, as for the built-in composition.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_size needs two array<string> or two " +
          s"array<long> inputs, got $l / $r")
    }

  private def elemIsString: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == StringType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val str = elemIsString
    var i = 0; var j = 0; var n = 0
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val c =
          if (str) x.getUTF8String(i).compareTo(y.getUTF8String(j))
          else java.lang.Long.compare(x.getLong(i), y.getLong(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val cmp =
        if (elemIsString)
          s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
        else s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
      s"""
         |int $i = 0, $j = 0, $n = 0;
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    final int $c = $cmp;
         |    if ($c == 0) { $n++; $i++; $j++; }
         |    else if ($c < 0) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** 0-based index of the FIRST position where two equal-length arrays
  * hold equal elements, -1 when none — the first-match-band collision
  * discipline's predicate (DedupOps.firstBandMatch): evaluated once per
  * collision-join row, where a `zip_with` + `array_position` composition
  * would allocate a boolean array per row (measured 4× slower over 89M
  * collision rows at the sf1 stress scale). A plain early-exit loop in
  * both codegen and interpreted modes, zero allocation. Null elements
  * never match (band signatures are null-free by construction); a null
  * ARRAY yields null.
  */
case class FirstEqualIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "first_equal_index needs two array<string> or two " +
          s"array<long> inputs, got $l / $r")
    }

  private def elemIsString: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == StringType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val str = elemIsString
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val eq =
          if (str) x.getUTF8String(i).equals(y.getUTF8String(i))
          else x.getLong(i) == y.getLong(i)
        if (eq) return i
      }
      i += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val eq =
        if (elemIsString) s"$a.getUTF8String($i).equals($b.getUTF8String($i))"
        else s"$a.getLong($i) == $b.getLong($i)"
      s"""
         |int $out = -1;
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i) && $eq) { $out = $i; break; }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstEqualIndex =
    copy(left = newLeft, right = newRight)
}

/** Multiplicity statistics of an array<string> in ONE native pass:
  * struct(n_distinct, max_run) where max_run is the highest multiplicity
  * of any element — sort + adjacent scan inside the expression. Replaces
  * an `array_distinct` + `array_sort` + `aggregate`-fold composition
  * whose higher-order lambdas evaluate INTERPRETED per element (Spark
  * HOFs are CodegenFallback) and whose fold allocates a struct row per
  * element — the dominant cost of the repetition scorer at the sf1
  * stress scale. Null elements are not expected (the gram builder trims
  * its arrays); they sort first and count as one distinct value. The
  * row-level work (n log n over the row's own array) dwarfs the one
  * static call, so codegen emits a helper call rather than inlining the
  * sort. */
case class GramRunStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("max_run", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_run_stats needs array<string> input, got $t")
  }

  override protected def nullSafeEval(a: Any): Any =
    GramRunStats.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GramRunStats.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): GramRunStats =
    copy(child = newChild)
}

object GramRunStats {
  /** Static helper shared by eval and codegen: copy, sort, adjacent
    * scan. Zero distinct elements (empty array) reports (0, 0). */
  def compute(a: ArrayData): InternalRow = {
    val n = a.numElements()
    if (n == 0) return InternalRow(0, 0)
    val arr = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) {
      arr(i) = if (a.isNullAt(i)) null else a.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(arr,
      new java.util.Comparator[org.apache.spark.unsafe.types.UTF8String] {
        override def compare(x: org.apache.spark.unsafe.types.UTF8String,
            y: org.apache.spark.unsafe.types.UTF8String): Int =
          if (x eq y) 0
          else if (x == null) -1
          else if (y == null) 1
          else x.compareTo(y)
      })
    var distinct = 1; var run = 1; var best = 1
    i = 1
    while (i < n) {
      val eq = (arr(i) eq arr(i - 1)) ||
        (arr(i) != null && arr(i - 1) != null && arr(i).equals(arr(i - 1)))
      if (eq) run += 1
      else { distinct += 1; run = 1 }
      if (run > best) best = run
      i += 1
    }
    InternalRow(distinct, best)
  }
}

/** Space-joined word n-grams of a token array in ONE native pass:
  * output[i] = tokens[i] + " " + ... + tokens[i+n-1], length
  * max(0, len - n + 1). Byte-identical to the zip_with shift-chain the
  * gram builders used (b2 = zip_with(t, shift(t,1), concat), ... slice),
  * but that chain's lambdas evaluate INTERPRETED per element (Spark HOFs
  * are CodegenFallback) and each stage materializes a full intermediate
  * array — for 2-grams that is 3 interpreted passes over every token of
  * the corpus, the dominant cost of the gram-consuming ops at the sf1
  * stress scale. Null tokens don't occur (the tokenizer never emits
  * them); a null in the window yields a null gram, matching the
  * concat-propagation of the zip_with chain. */
case class NGramJoin(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, "n-grams need n >= 2")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_join needs array<string> input, got $t")
  }

  override protected def nullSafeEval(a: Any): Any =
    NGramJoin.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NGramJoin.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): NGramJoin =
    copy(child = newChild)
}

object NGramJoin {
  private val Space =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Static helper shared by eval and codegen. */
  def compute(a: ArrayData, n: Int): ArrayData = {
    val len = a.numElements()
    val out = math.max(0, len - n + 1)
    val grams = new Array[AnyRef](out)
    var i = 0
    while (i < out) {
      var ok = true
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](2 * n - 1)
      var j = 0
      while (ok && j < n) {
        if (a.isNullAt(i + j)) ok = false
        else {
          if (j > 0) parts(2 * j - 1) = Space
          parts(2 * j) = a.getUTF8String(i + j)
        }
        j += 1
      }
      grams(i) =
        if (ok) org.apache.spark.unsafe.types.UTF8String.concat(parts: _*)
        else null
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(grams)
  }
}

/** Per-element 60-bit md5 hash of a string array in ONE native pass:
  * out[i] = first 60 bits of md5(in[i]) — numerically identical to the
  * portable `conv(substring(md5(g), 1, 15), 16, 10)::long` every gram
  * hash in this codebase (and its DuckDB oracle twin,
  * `('0x' || substr(md5(g), 1, 15))::BIGINT`) computes, but without the
  * interpreted `transform` lambda or the hex-string round trip (md5 →
  * 32-char hex → substring → base-16 parse): the digest's first 8 bytes
  * read as an unsigned big-endian long shifted right 4 ARE the first 15
  * hex nibbles. Null elements hash to null. */
case class Hash60Array(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hash60_array needs array<string> input, got $t")
  }

  override protected def nullSafeEval(a: Any): Any =
    Hash60Array.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Hash60Array.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Hash60Array =
    copy(child = newChild)
}

object Hash60Array {
  /** Static helper shared by eval and codegen. One MessageDigest per
    * call (per row), reset between elements. */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        md.reset()
        val d = md.digest(a.getUTF8String(i).getBytes)
        var v = 0L
        var j = 0
        while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
        out(i) = v >>> 4
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Winnowing selection over a rolling-hash array in ONE native pass:
  * the SORTED DISTINCT set of per-window minima over every full window
  * of width `w` — i.e. array_sort(array_distinct([min(hs[i..i+w-1]) for
  * i <= len-w])). Byte-identical to the zip_with least()-chain + slice +
  * distinct + sort pipeline it replaces (whose lambdas evaluate
  * interpreted per element); windows shorter than `w` (the array tail)
  * select nothing, and an array shorter than `w` selects nothing — the
  * same trimming the slice performed. Null elements cannot occur (the
  * hashes come from Hash60Array over null-free grams) and are skipped
  * like least() skips nulls if they ever do. */
case class WindowMinSelect(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 2, "winnow windows need w >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"window_min_select needs array<long> input, got $t")
  }

  override protected def nullSafeEval(a: Any): Any =
    WindowMinSelect.compute(a.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WindowMinSelect.compute($a, $w);")

  override protected def withNewChildInternal(newChild: Expression): WindowMinSelect =
    copy(child = newChild)
}

object WindowMinSelect {
  /** Static helper shared by eval and codegen: sliding minima via a
    * monotone deque over the primitive array, then sort + dedup the
    * selected values — O(len + s log s) per row where s is the selected
    * count. */
  def compute(a: ArrayData, w: Int): ArrayData = {
    val len = a.numElements()
    val out = len - w + 1
    if (out <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](len)
    var i = 0
    while (i < len) {
      hs(i) = if (a.isNullAt(i)) Long.MaxValue else a.getLong(i)
      i += 1
    }
    // monotone-increasing index deque: head is the window minimum
    val dq = new Array[Int](len)
    var lo = 0; var hi = -1
    val sel = new Array[Long](out)
    i = 0
    while (i < len) {
      while (hi >= lo && hs(dq(hi)) >= hs(i)) hi -= 1
      hi += 1; dq(hi) = i
      if (dq(lo) <= i - w) lo += 1
      if (i >= w - 1) sel(i - w + 1) = hs(dq(lo))
      i += 1
    }
    java.util.Arrays.sort(sel)
    var n = 0
    i = 0
    while (i < out) {
      if (n == 0 || sel(i) != sel(n - 1)) { sel(n) = sel(i); n += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(sel, n))
  }
}

/** Gap-capped span coverage over a SORTED int-position array: for each
  * position, min(L, next − pos) tokens are newly covered (the last span
  * contributes its full L) — Σ over the array, i.e. the token count
  * covered by length-L spans starting at the given sorted positions.
  * The closed form of the lead()-window formulation it replaces
  * (when(nxt null, L).otherwise(least(L, nxt−pos)) summed per doc): one
  * native pass over a per-doc array instead of a partition-wide sort +
  * window + second aggregate. */
case class GapCappedCoverage(child: Expression, l: Int) extends UnaryExpression {
  require(l >= 1, "span length must be >= 1")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gap_capped_coverage needs array<int> input, got $t")
  }

  override protected def nullSafeEval(a: Any): Any =
    GapCappedCoverage.compute(a.asInstanceOf[ArrayData], l)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GapCappedCoverage.compute($a, $l);")

  override protected def withNewChildInternal(newChild: Expression): GapCappedCoverage =
    copy(child = newChild)
}

object GapCappedCoverage {
  def compute(a: ArrayData, l: Int): Long = {
    val n = a.numElements()
    if (n == 0) return 0L
    var sum = 0L
    var i = 0
    while (i < n - 1) {
      val gap = a.getInt(i + 1) - a.getInt(i)
      sum += (if (gap < l) gap else l)
      i += 1
    }
    sum + l
  }
}

/** Per-term occurrence counts over a token array in ONE native pass:
  * out[i] = |{ t ∈ tokens : t = terms(i) }|. Replaces one interpreted
  * `size(filter(ts, _ === term))` ArrayFilter lambda PER TERM — the
  * jstack-visible HOF cost in the BM25/term-score scans, which
  * re-walk the token array once per query term. Equality is UTF8String
  * binary equality, the same comparison the filter predicate compiled
  * to, so counts are identical. */
case class TermFreqs(child: Expression, terms: Seq[String])
    extends UnaryExpression {
  require(terms.nonEmpty, "term_freqs needs at least one term")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"term_freqs needs array<string> input, got $t")
  }

  @transient private lazy val termBytes: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(a: Any): Any =
    TermFreqs.compute(a.asInstanceOf[ArrayData], termBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("terms", termBytes,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TermFreqs.compute($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): TermFreqs =
    copy(child = newChild)
}

object TermFreqs {
  def compute(a: ArrayData, terms: Array[UTF8String]): ArrayData = {
    val out = new Array[Long](terms.length)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val t = a.getUTF8String(i)
        var j = 0
        while (j < terms.length) {
          if (terms(j).equals(t)) out(j) += 1L
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Count of tokens with a given prefix, one native pass — the wildcard
  * (`dat*`) analogue of [[TermFreqs]], replacing the interpreted
  * `size(filter(ts, _.startsWith(p)))` lambda walk. */
case class PrefixCount(child: Expression, prefix: String)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"prefix_count needs array<string> input, got $t")
  }

  @transient private lazy val p: UTF8String = UTF8String.fromString(prefix)

  override protected def nullSafeEval(a: Any): Any =
    PrefixCount.compute(a.asInstanceOf[ArrayData], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("prefix", p,
      "org.apache.spark.unsafe.types.UTF8String")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PrefixCount.compute($a, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): PrefixCount =
    copy(child = newChild)
}

object PrefixCount {
  def compute(a: ArrayData, p: UTF8String): Long = {
    val n = a.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && a.getUTF8String(i).startsWith(p)) c += 1L
      i += 1
    }
    c
  }
}

/** Whitespace-word statistics over raw text in ONE native byte scan:
  * struct(n_words, len_sum, n_alpha) where words are the non-empty
  * pieces of split(text, "\\s+") (Java's default \s is the six ASCII
  * whitespace bytes — UTF-8 continuation bytes are ≥ 0x80 and can never
  * match, so byte-level splitting is exact), len_sum adds each word's
  * CHARACTER length (codepoints — bytes not of the form 10xxxxxx, the
  * same count UTF8String.numChars/length() returns), and n_alpha counts
  * words containing at least one ASCII letter (the rlike("[A-Za-z]")
  * predicate). Replaces a regex split + three interpreted array-lambda
  * walks (filter/aggregate/filter-with-rlike) per document. */
case class WsWordStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("len_sum", LongType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ws_word_stats needs a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    WsWordStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WsWordStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): WsWordStats =
    copy(child = newChild)
}

object WsWordStats {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    var nWords = 0L; var lenSum = 0L; var nAlpha = 0
    var i = 0
    while (i < n) {
      if (!isWs(bytes(i))) {
        nWords += 1
        var alpha = false
        while (i < n && !isWs(bytes(i))) {
          val b = bytes(i)
          if ((b & 0xC0) != 0x80) lenSum += 1
          if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alpha = true
          i += 1
        }
        if (alpha) nAlpha += 1
      } else i += 1
    }
    InternalRow(nWords, lenSum, nAlpha)
  }
}

/** Gopher-rule line statistics over the raw text in ONE native pass:
  * struct(n_lines, n_bullet, n_ellip) where lines split at '\n' (0x0a
  * never occurs inside a UTF-8 multibyte sequence, so byte-splitting
  * equals the regex split), a line COUNTS iff rtrim leaves it non-empty
  * (⇔ it holds any byte ≠ 0x20 — since SPARK-17299 the trim functions
  * strip ONLY the space character), bullets test ltrim(line).startsWith
  * ("-"|"*"|"•") and ellipses rtrim(line).endsWith("..."|"…"). The
  * trim/startsWith/endsWith steps call the SAME UTF8String methods the
  * Spark expressions they replace delegate to, so the counts are
  * value-identical to the former filter(split(text,"\n"), …) HOF chains
  * — which allocated the split array plus three filtered arrays and ran
  * their predicates interpreted per LINE per pass. */
case class LineStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_bullet", IntegerType, nullable = false),
    StructField("n_ellip", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"line_stats needs a string input, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    LineStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LineStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): LineStats =
    copy(child = newChild)
}

object LineStats {
  private val Dash = UTF8String.fromString("-")
  private val Star = UTF8String.fromString("*")
  private val Bullet = UTF8String.fromString("•")
  private val Dots = UTF8String.fromString("...")
  private val Hellip = UTF8String.fromString("…")

  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    var nLines = 0; var nBullet = 0; var nEllip = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == '\n') {
        // kept iff any byte ≠ 0x20: rtrim strips only trailing SPACES
        // (SPARK-17299), so any non-space byte survives it
        var j = start; var kept = false
        while (j < i && !kept) { kept = bytes(j) != 0x20; j += 1 }
        if (kept) {
          nLines += 1
          val line = UTF8String.fromBytes(bytes, start, i - start)
          val lt = line.trimLeft()
          if (lt.startsWith(Dash) || lt.startsWith(Star) ||
            lt.startsWith(Bullet)) nBullet += 1
          val rt = line.trimRight()
          if (rt.endsWith(Dots) || rt.endsWith(Hellip)) nEllip += 1
        }
        start = i + 1
      }
      i += 1
    }
    InternalRow(nLines, nBullet, nEllip)
  }
}

/** Keyword-declaration extraction over a token array in ONE native
  * pass: for each (keyword, kind) pair, every position i (0-based)
  * with ts[i] = keyword and a following token emits
  * struct(symbol = ts[i+1], kind, pos = i+1 — 1-based keyword index);
  * output lists all of pair 1's matches in token order, then pair 2's,
  * … — exactly the concat-of-per-keyword-arrays the HOF formulation
  * (one interpreted transform + filter walk PER PAIR) produced. Shared
  * by every decls consumer (DSL virtual tables, symbol extraction and
  * formatting, the graph edge builders). */
case class KeywordDecls(child: Expression, kws: Seq[String],
    kinds: Seq[String]) extends UnaryExpression {
  require(kws.nonEmpty && kws.length == kinds.length,
    "keyword_decls needs parallel keyword/kind lists")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("symbol", StringType, nullable = true),
    StructField("kind", StringType, nullable = false),
    StructField("pos", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"keyword_decls needs array<string> input, got $t")
  }

  @transient private lazy val kwBytes: Array[UTF8String] =
    kws.map(UTF8String.fromString).toArray
  @transient private lazy val kindBytes: Array[UTF8String] =
    kinds.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(a: Any): Any =
    KeywordDecls.compute(a.asInstanceOf[ArrayData], kwBytes, kindBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kw = ctx.addReferenceObj("kws", kwBytes,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val kd = ctx.addReferenceObj("kinds", kindBytes,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.KeywordDecls.compute($a, $kw, $kd);")
  }

  override protected def withNewChildInternal(newChild: Expression): KeywordDecls =
    copy(child = newChild)
}

object KeywordDecls {
  def compute(a: ArrayData, kws: Array[UTF8String],
      kinds: Array[UTF8String]): ArrayData = {
    val n = a.numElements()
    val bufs = Array.fill(kws.length)(new java.util.ArrayList[AnyRef]())
    var i = 0
    while (i < n - 1) { // the last token has no follower; never a decl
      if (!a.isNullAt(i)) {
        val t = a.getUTF8String(i)
        var j = 0
        while (j < kws.length) { // no short-circuit: kw lists may repeat
          if (kws(j).equals(t))
            bufs(j).add(InternalRow(a.getUTF8String(i + 1), kinds(j),
              (i + 1).toLong))
          j += 1
        }
      }
      i += 1
    }
    val out = new java.util.ArrayList[AnyRef]()
    bufs.foreach(out.addAll(_))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** The full perceptual-hash signature in ONE native code-point scan:
  * the payload's first `nc` code points are tiled into `frames` equal
  * slices (frame f covers 0-based indices [⌊f·nc/F⌋, ⌊(f+1)·nc/F⌋)),
  * each slice's energy is the LONG sum of squared code points, and bit f
  * of the result is set when energy·F > total — exactly the HOF
  * formulation MultimodalOps.phashBands previously built from
  * split("") + transform(ascii) + F slice/aggregate walks, which ran
  * interpreted per frame and dominated the mm family at sf10 (8.9 s in
  * the round-11 heavies artifact). `nc` is the table's stored n_chars:
  * when the payload is shorter, the scan stops early and the missing
  * frames read zero energy, matching slice-past-end semantics. Code
  * points (not bytes) so multi-byte text hashes identically to the
  * ascii()-per-split-token formulation the oracle replays; squares
  * accumulate in LONG because a supplementary-plane code point
  * (≥ 46341) overflows Int in b·b. */
case class PhashSignature(left: Expression, right: Expression, frames: Int)
    extends BinaryExpression {
  require(frames > 0 && frames <= 64, "phash_signature needs 1..64 frames")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"phash_signature needs (string, int) inputs, got $l / $r")
    }

  override protected def nullSafeEval(s: Any, nc: Any): Any =
    PhashSignature.compute(s.asInstanceOf[UTF8String],
      nc.asInstanceOf[Int], frames)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, nc) =>
      s"${ev.value} = graft.functions.PhashSignature.compute($s, $nc, $frames);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PhashSignature =
    copy(left = newLeft, right = newRight)
}

/** Per-frame (sample count, energy) over fixed 50-code-point frames in
  * ONE native code-point scan — the mm_frame_energy hot loop. Replaces a
  * per-frame substr (each an O(position) scan from the string start, so
  * O(len²/50) per document) followed by split("") + transform(ascii) +
  * aggregate — three interpreted HOF walks allocating a per-char string
  * array per frame. Value-identical by construction:
  *
  *  - frame f (0-based) covers 1-based code points [1+Fr·f, Fr·(f+1)],
  *    exactly substr(text, 1+Fr·f, Fr)'s slice; the frame COUNT comes
  *    from the stored n_chars (sequence(1, nc, Fr)) while slices read
  *    the REAL text — when they disagree, frames past the text read
  *    (0, 0) like substr-past-end, and text past the last frame is
  *    ignored, both as before;
  *  - each sample is the code point (ascii() semantics: full code point,
  *    supplementary planes included — the [[PhashSignature]] decode);
  *  - energy accumulates cp·cp in LONG (the [[PhashSignature]] rule and
  *    the DuckDB oracle's BIGINT arithmetic). The replaced lambda
  *    `acc + b * b` multiplied in IntegerType, which under Spark 4's
  *    default ANSI mode THREW on a supplementary-plane code point
  *    (cp ≥ 46341 overflows Int in cp²) — an input the corpus contract
  *    excludes and the oracle would NOT have failed on; the long
  *    accumulation matches the oracle everywhere instead.
  *    FrameEnergiesSpec pins identity against the HOF formulation (cast
  *    to long, the oracle form) in both codegen modes. */
case class FrameEnergies(left: Expression, right: Expression, frame: Int)
    extends BinaryExpression {
  require(frame > 0, "frame_energies needs a positive frame length")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("e", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"frame_energies needs (string, int) inputs, got $l / $r")
    }

  override protected def nullSafeEval(s: Any, nc: Any): Any =
    FrameEnergies.compute(s.asInstanceOf[UTF8String],
      nc.asInstanceOf[Int], frame)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, nc) =>
      s"${ev.value} = graft.functions.FrameEnergies.compute($s, $nc, $frame);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FrameEnergies =
    copy(left = newLeft, right = newRight)
}

object FrameEnergies {
  def compute(s: UTF8String, nc: Int, frame: Int): ArrayData = {
    if (nc <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[AnyRef](0))
    val nFrames = (nc - 1) / frame + 1
    val ns = new Array[Int](nFrames)
    val es = new Array[Long](nFrames)
    val bytes = s.getBytes
    val limit = nFrames.toLong * frame // code points past the last frame
    var i = 0 // byte cursor
    var ci = 0L // code-point index
    while (i < bytes.length && ci < limit) {
      val b = bytes(i) & 0xff
      var cp = 0
      if (b < 0x80) { cp = b; i += 1 }
      else if ((b & 0xE0) == 0xC0) {
        cp = ((b & 0x1F) << 6) | (bytes(i + 1) & 0x3F); i += 2
      } else if ((b & 0xF0) == 0xE0) {
        cp = ((b & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) |
          (bytes(i + 2) & 0x3F); i += 3
      } else {
        cp = ((b & 0x07) << 18) | ((bytes(i + 1) & 0x3F) << 12) |
          ((bytes(i + 2) & 0x3F) << 6) | (bytes(i + 3) & 0x3F); i += 4
      }
      val f = (ci / frame).toInt
      ns(f) += 1
      es(f) += cp.toLong * cp.toLong // LONG accumulation: the oracle's
      ci += 1                        // BIGINT arithmetic (scaladoc)
    }
    val out = new Array[AnyRef](nFrames)
    var k = 0
    while (k < nFrames) { out(k) = InternalRow(ns(k), es(k)); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object PhashSignature {
  def compute(s: UTF8String, nc: Int, frames: Int): Long = {
    if (nc <= 0) return 0L
    val bytes = s.getBytes
    val es = new Array[Long](frames)
    var i = 0 // byte cursor
    var ci = 0 // code-point index
    var f = 0
    var boundary = (nc.toLong / frames).toInt // end of frame 0 (exclusive)
    while (i < bytes.length && ci < nc) {
      val b = bytes(i) & 0xff
      var cp = 0
      if (b < 0x80) { cp = b; i += 1 }
      else if ((b & 0xE0) == 0xC0) {
        cp = ((b & 0x1F) << 6) | (bytes(i + 1) & 0x3F); i += 2
      } else if ((b & 0xF0) == 0xE0) {
        cp = ((b & 0x0F) << 12) | ((bytes(i + 1) & 0x3F) << 6) |
          (bytes(i + 2) & 0x3F); i += 3
      } else {
        cp = ((b & 0x07) << 18) | ((bytes(i + 1) & 0x3F) << 12) |
          ((bytes(i + 2) & 0x3F) << 6) | (bytes(i + 3) & 0x3F); i += 4
      }
      while (ci >= boundary && f < frames - 1) {
        f += 1
        boundary = ((f + 1).toLong * nc / frames).toInt
      }
      es(f) += cp.toLong * cp.toLong
      ci += 1
    }
    var tot = 0L
    var k = 0
    while (k < frames) { tot += es(k); k += 1 }
    var sig = 0L
    k = 0
    while (k < frames) {
      if (es(k) * frames > tot) sig |= (1L << k)
      k += 1
    }
    sig
  }
}

object ArrayFunctions {
  /** Codegen'd merge-scan intersection size over sorted string arrays. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    SqlBridge.column(
      SortedIntersectSize(SqlBridge.expression(a), SqlBridge.expression(b)))

  /** Codegen'd first-equal-position scan (0-based, -1 when none). */
  def firstEqualIndex(a: Column, b: Column): Column =
    SqlBridge.column(
      FirstEqualIndex(SqlBridge.expression(a), SqlBridge.expression(b)))

  /** One-pass (sort + scan) multiplicity stats: struct(n_distinct, max_run). */
  def gramRunStats(a: Column): Column =
    SqlBridge.column(GramRunStats(SqlBridge.expression(a)))

  /** One-pass space-joined word n-grams of a token array. */
  def ngramJoin(tokens: Column, n: Int): Column =
    SqlBridge.column(NGramJoin(SqlBridge.expression(tokens), n))

  /** One-pass per-element 60-bit md5 hash of a string array. */
  def hash60Array(a: Column): Column =
    SqlBridge.column(Hash60Array(SqlBridge.expression(a)))

  /** One-pass winnowing selection: sorted distinct window-w minima. */
  def windowMinSelect(a: Column, w: Int): Column =
    SqlBridge.column(WindowMinSelect(SqlBridge.expression(a), w))

  /** One-pass gap-capped span coverage over sorted int positions. */
  def gapCappedCoverage(a: Column, l: Int): Column =
    SqlBridge.column(GapCappedCoverage(SqlBridge.expression(a), l))

  /** One-pass per-term occurrence counts over a token array. */
  def termFreqs(a: Column, terms: Seq[String]): Column =
    SqlBridge.column(TermFreqs(SqlBridge.expression(a), terms))

  /** One-pass count of tokens starting with `prefix`. */
  def prefixCount(a: Column, prefix: String): Column =
    SqlBridge.column(PrefixCount(SqlBridge.expression(a), prefix))

  /** One-pass whitespace-word stats: struct(n_words, len_sum, n_alpha). */
  def wsWordStats(text: Column): Column =
    SqlBridge.column(WsWordStats(SqlBridge.expression(text)))

  /** One-pass Gopher line stats: struct(n_lines, n_bullet, n_ellip). */
  def lineStats(text: Column): Column =
    SqlBridge.column(LineStats(SqlBridge.expression(text)))

  /** One-pass keyword-declaration extraction (see [[KeywordDecls]]). */
  def keywordDecls(ts: Column, pairs: Seq[(String, String)]): Column =
    SqlBridge.column(KeywordDecls(SqlBridge.expression(ts),
      pairs.map(_._1), pairs.map(_._2)))

  /** One-pass perceptual-hash signature (see [[PhashSignature]]). */
  def phashSignature(text: Column, nc: Column, frames: Int): Column =
    SqlBridge.column(PhashSignature(SqlBridge.expression(text),
      SqlBridge.expression(nc), frames))

  /** One-pass per-frame (n_samples, energy) stats (see [[FrameEnergies]]). */
  def frameEnergies(text: Column, nc: Column, frame: Int): Column =
    SqlBridge.column(FrameEnergies(SqlBridge.expression(text),
      SqlBridge.expression(nc), frame))
}
