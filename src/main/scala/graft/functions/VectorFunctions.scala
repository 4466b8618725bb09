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

object VectorFunctions {
  /** Codegen'd cosine similarity between two array<float|double> columns. */
  def cosineSim(a: Column, b: Column): Column =
    SqlBridge.column(CosineSimilarity(SqlBridge.expression(a), SqlBridge.expression(b)))

  /** Codegen'd hyperplane-LSH band signatures for a vector column. */
  def bandSigs(v: Column, seed: Int, bands: Int, bits: Int, dim: Int): Column =
    SqlBridge.column(HyperplaneBandSigs(SqlBridge.expression(v), seed, bands, bits, dim))
}
