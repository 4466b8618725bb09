package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.SqlBridge

/** Cosine similarity over two float/double array columns as a native
  * Catalyst expression: stays inside whole-stage codegen (a Scala UDF here
  * would box every row and break the codegen span — this is the hot inner
  * loop of every KNN scan).
  *
  * Reference analogue: project-cortex's KNN is sqlite-vec's C cosine distance
  * (internal/mcp/search_sqlite.go:53); here the same math is a codegen'd
  * tight loop over parquet-resident vectors, accumulated in double.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 0.0 else dot / den
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
      val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val den = ctx.freshName("den")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.$lGet($i);
         |  double $y = (double) $b.$rGet($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |${ev.value} = ($den == 0.0) ? 0.0 : $dot / $den;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH band signatures (Charikar, STOC 2002) for a
  * float/double vector, as one codegen'd expression: `bands` signatures,
  * each packing `bits` sign-of-dot-product bits against deterministic
  * md5-derived hyperplanes. Two vectors at angle θ agree per bit with
  * probability 1 - θ/π, so P[some band matches] = 1 - (1 - p^bits)^bands —
  * size (bits, bands) to the similarity threshold: wide bands prune hard
  * at high thresholds (0.9+); low thresholds need narrow bands and many of
  * them for recall.
  *
  * The plane matrix is a driver-side constant baked into the generated
  * code via a reference object — per row the work is one tight
  * bands×bits×dim loop, no UDF, no shuffle.
  */
case class HyperplaneBandSigs(child: Expression, seed: Int, bands: Int,
    bits: Int, dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sigs needs array<float|double> input, got $dt")
  }

  @transient private lazy val planes: Array[Array[Double]] =
    HyperplaneBandSigs.planes(seed, bands * bits, dim)

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](bands)
    var l = 0
    while (l < bands) {
      var sig = 0L
      var k = 0
      while (k < bits) {
        val w = planes(l * bits + k)
        var dot = 0.0
        var i = 0
        while (i < n) {
          dot += w(i) * (if (isF) v.getFloat(i).toDouble else v.getDouble(i))
          i += 1
        }
        sig = sig * 2L + (if (dot > 0) 1L else 0L)
        k += 1
      }
      out(l) = sig
      l += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val getter = if (elemIsFloat) "getFloat" else "getDouble"
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val l = ctx.freshName("l"); val sig = ctx.freshName("sig")
      val k = ctx.freshName("k"); val w = ctx.freshName("w")
      val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($c.numElements(), $dim);
         |long[] $out = new long[$bands];
         |for (int $l = 0; $l < $bands; $l++) {
         |  long $sig = 0L;
         |  for (int $k = 0; $k < $bits; $k++) {
         |    double[] $w = $planesRef[$l * $bits + $k];
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += $w[$i] * (double) $c.$getter($i);
         |    }
         |    $sig = $sig * 2L + ($dot > 0 ? 1L : 0L);
         |  }
         |  $out[$l] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBandSigs =
    copy(child = newChild)
}

object HyperplaneBandSigs {
  /** Deterministic hyperplanes: component (p, d) = (md5("seed_p_d") mod
    * 2001 - 1000) / 1000 ∈ [-1, 1]. Any engine can reproduce them — no
    * RNG, no seed-state coupling across components. */
  def planes(seed: Int, count: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(count, dim) { (p, d) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${seed}_${p}_${d}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      ((BigInt(hex.substring(0, 15), 16) % 2001).toLong - 1000L) / 1000.0
    }
}

/** Plain dot product over two float/double array columns — the pair-time
  * half of [[CosineSimilarity]] split out so batch-KNN joins can
  * precompute each vector's squared norm ONCE (see [[SumSquares]]) and
  * pay only the dot per candidate pair: cosine evaluates dot, ‖a‖² and
  * ‖b‖² in one interleaved loop, so inside an n²-pair cell join 2/3 of
  * its multiply-adds recompute the same per-vector norms n times over.
  * Each accumulator in that interleaved loop is independent, so summing
  * the dot alone here (in index order, doubles) is bit-identical to the
  * dot [[CosineSimilarity]] accumulates — dot/(√ssa·√ssb) reproduces its
  * result digit-for-digit, which the oracle hashes rely on.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
      val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 norm (sum of squares) of a float/double array column,
  * accumulated in index order in double — exactly the ‖v‖² term of
  * [[CosineSimilarity]]'s interleaved loop, computed once per VECTOR
  * instead of once per pair. CAVEAT shared with [[DotProduct]]: cosine
  * truncates all three sums to min(len(a), len(b)), so the split
  * formulation is only bit-identical on equal-length vectors — which
  * every embedding column in this engine is (fixed model dim).
  */
case class SumSquares(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sum_squares needs array<float|double> input, got $dt")
  }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      val xi = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      ss += xi * xi
      i += 1
    }
    ss
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val getter = if (elemIsFloat) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val ss = ctx.freshName("ss"); val x = ctx.freshName("x")
      s"""
         |int $n = $c.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $c.$getter($i);
         |  $ss += $x * $x;
         |}
         |${ev.value} = $ss;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SumSquares =
    copy(child = newChild)
}

/** Squared L2 distance between two array<double> columns, accumulated
  * in index order — BIT-IDENTICAL to the HOF chain it replaces
  * (`aggregate(zip_with(v, c, (a,b) => (a-b)*(a-b)), 0.0, _+_)`): same
  * IEEE ops in the same order, compiled instead of interpreted per
  * element (Spark HOF lambdas do not codegen; the k-means / PQ Lloyd
  * assignment steps ran millions of interpreted lambda evals per
  * training round). Null semantics mirror the HOF exactly: zip_with
  * pads unequal lengths with null and the lambda/fold propagate it, so
  * the result is NULL iff the lengths differ or any element is null;
  * two empty arrays yield the fold's 0.0 init. The k-means oracle
  * contract ("distances accumulate in DOUBLE over the array in index
  * order") is unchanged — this is the same accumulation. */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"squared_distance needs array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}

/** Decimal HALF_UP rounding of a double, bit-identical to Spark's
  * `round(x, scale)` but without its per-row `BigDecimal.valueOf` —
  * which stringifies the double (Double.toString inside valueOf) and
  * allocates two BigDecimals per value; jstack sampling of the batch-KNN
  * pair stage showed that conversion chain dominating the scoring time.
  *
  * Fast path: k = floor(|x|·10^s + 0.5) in double arithmetic, result
  * sign·k/10^s (an exact long divided by an exact power of ten — IEEE
  * division is correctly rounded, so this IS the nearest double to the
  * rounded decimal, exactly what BigDecimal.doubleValue returns). The
  * fast path is only wrong where the true decimal value of x sits within
  * FP error of a .5 rounding boundary, so anything inside an
  * ulp-proportional guard band around one — plus anything past 2^53 —
  * falls back to the exact BigDecimal chain (non-finite inputs take
  * that path too, so they raise the same NumberFormatException Spark's
  * round raises — a NaN cosine from corrupt embeddings fails the job
  * loudly instead of silently flowing through score filters). The band is
  * ~10⁴ ulps wide, vastly wider than the ≤~3-ulp error of the
  * shortest-decimal→double→·10^s chain it guards against, and still hit
  * by ~1e-12 of uniform inputs. Both-modes equivalence vs Spark's round
  * is property-tested, boundary literals included.
  */
case class FastRoundHalfUp(child: Expression, scale: Int)
    extends UnaryExpression {
  require(scale >= 0 && scale <= 10, "fast_round supports scales 0..10")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"fast_round needs a double input, got $dt")
  }

  override protected def nullSafeEval(input: Any): Any =
    FastRoundHalfUp.round(input.asInstanceOf[Double], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FastRoundHalfUp.round($c, $scale);")

  override protected def withNewChildInternal(newChild: Expression): FastRoundHalfUp =
    copy(child = newChild)
}

object FastRoundHalfUp {
  private val Pow10 = Array.tabulate(11)(i => math.pow(10.0, i))

  def round(x: Double, scale: Int): Double = {
    // non-finite: BigDecimal.valueOf raises NumberFormatException, the
    // exact failure Spark's round produces — keep fail-loud parity
    if (!java.lang.Double.isFinite(x)) return bigDecimalRound(x, scale)
    val p = Pow10(scale)
    val y = Math.abs(x) * p
    if (y >= 9.007199254740992e15) return bigDecimalRound(x, scale)
    val k = Math.floor(y + 0.5)
    // near either .5 edge of k's half-open window → exact decision. The
    // guard band scales with ulp(y) (the |x|·10^s chain's error is a few
    // ulps of y, so a FIXED eps breaks once y grows past eps/ulp), kept
    // ~4 orders above the true error and still vanishingly rare to hit.
    val eps = Math.max(1e-12, y * 1e-12)
    if (y - (k - 0.5) < eps || (k + 0.5) - y < eps)
      return bigDecimalRound(x, scale)
    if (k == 0.0) 0.0 // BigDecimal has no -0; keep +0.0 like Spark does
    else if (x < 0) -k / p
    else k / p
  }

  private def bigDecimalRound(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
}

object VectorFunctions {
  /** Codegen'd cosine similarity between two array<float|double> columns. */
  def cosineSim(a: Column, b: Column): Column =
    SqlBridge.column(CosineSimilarity(SqlBridge.expression(a), SqlBridge.expression(b)))

  /** Spark-round-identical decimal HALF_UP rounding without the per-row
    * BigDecimal stringification (see [[FastRoundHalfUp]]). */
  def fastRound(c: Column, scale: Int): Column =
    SqlBridge.column(FastRoundHalfUp(SqlBridge.expression(c), scale))

  /** Codegen'd dot product between two array<float|double> columns. */
  def dotProduct(a: Column, b: Column): Column =
    SqlBridge.column(DotProduct(SqlBridge.expression(a), SqlBridge.expression(b)))

  /** Codegen'd squared L2 norm of an array<float|double> column. */
  def sumSquares(a: Column): Column =
    SqlBridge.column(SumSquares(SqlBridge.expression(a)))

  /** Cosine from a precomputed-norm split: dot/(√ssa·√ssb) with
    * [[CosineSimilarity]]'s zero-denominator convention. Bit-identical
    * to cosineSim on equal-length vectors (see [[SumSquares]] caveat);
    * the batch-KNN joins use it to pay one dot — not dot + two norms —
    * per candidate pair. */
  def cosineFromParts(dot: Column, ssa: Column, ssb: Column): Column = {
    import org.apache.spark.sql.functions.{sqrt, when, lit}
    val den = sqrt(ssa) * sqrt(ssb)
    when(den === 0.0, lit(0.0)).otherwise(dot / den)
  }

  /** Codegen'd squared L2 distance between two array<double> columns —
    * bit-identical to the aggregate(zip_with(…)) fold (see
    * [[SquaredDistance]]). */
  def squaredDistance(a: Column, b: Column): Column =
    SqlBridge.column(SquaredDistance(SqlBridge.expression(a), SqlBridge.expression(b)))

  /** Codegen'd hyperplane-LSH band signatures for a vector column. */
  def bandSigs(v: Column, seed: Int, bands: Int, bits: Int, dim: Int): Column =
    SqlBridge.column(HyperplaneBandSigs(SqlBridge.expression(v), seed, bands, bits, dim))
}
