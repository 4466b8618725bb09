package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.SqlBridge

/** Packed (binary) vector kernels for the LSH band tables.
  *
  * The hyperplane band relation amplifies each vector by `bands` (32 by
  * default): every band row RIDES the full embedding and signature array
  * so collision scoring happens inside the co-located join (the sf10
  * pair-sort detonation DedupOps.embBands documents). At sf1 that table
  * measured 173 MB against a 162 MB corpus — rider bytes ARE the band
  * scan. Packing the riders:
  *
  *  - `array<float>` embedding → BINARY of the raw IEEE-754 bits
  *    (4 B/element, no per-element offsets/levels in parquet — and a
  *    binary VALUE is dictionary-encodable, so the 32 identical copies
  *    of one vector's blob in a row group store once + 31 dictionary
  *    references; parquet cannot do that for a LIST's leaf floats);
  *  - `array<long>` band signatures → BINARY of 4-byte groups (bits ≤ 32
  *    by LshBitsConf's range check, so a signature always fits);
  *  - the CONSUMERS UNPACK at the scan boundary
  *    ([[UnpackFloatsBinary]] / [[UnpackLongsBinary]], one pass per band
  *    row) and score with the ORIGINAL array kernels: BinaryType column
  *    accesses copy the byte[] per evaluation (UnsafeRow.getBinary), so
  *    running the per-PAIR loops over binary allocated 2×256 B per
  *    collision candidate — measured slower than the array layout at
  *    sf0.1 despite the 2× faster scan. Pack-then-unpack is bit-exact
  *    (floatToRawIntBits → intBitsToFloat is the identity on every
  *    pattern; property-tested in PackedVectorSpec), so scores are
  *    bit-identical to the unpacked layout.
  */
case class PackFloatsBinary(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"pack_floats needs array<float> input, got $dt")
  }

  override protected def nullSafeEval(input: Any): Any =
    PackFloatsBinary.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PackFloatsBinary.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): PackFloatsBinary =
    copy(child = newChild)
}

object PackFloatsBinary {
  import org.apache.spark.unsafe.Platform
  def compute(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](4 * n)
    var i = 0
    while (i < n) {
      // getFloat mirrors what the ArrayData scoring loops read; raw bits
      // keep every pattern (incl. NaN payloads) through the round-trip.
      // Platform word writes (native endianness, like every Tungsten
      // buffer) — one store per element; the readers use the matching
      // word loads, so the round-trip is exact on any single-arch
      // deployment (mixed-endian clusters are not a thing this engine
      // supports, same assumption UnsafeRow itself makes).
      Platform.putInt(out, Platform.BYTE_ARRAY_OFFSET + 4L * i,
        java.lang.Float.floatToRawIntBits(v.getFloat(i)))
      i += 1
    }
    out
  }
}

/** array<long> → binary of native-order 4-byte groups (low 32 bits of
  * each element — the LSH signature range). Group equality ⟺ long
  * equality on [0, 2^32), the band-signature domain. */
case class PackLongsBinary(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"pack_longs needs array<long> input, got $dt")
  }

  override protected def nullSafeEval(input: Any): Any =
    PackLongsBinary.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PackLongsBinary.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): PackLongsBinary =
    copy(child = newChild)
}

object PackLongsBinary {
  import org.apache.spark.unsafe.Platform
  def compute(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](4 * n)
    var i = 0
    while (i < n) {
      Platform.putInt(out, Platform.BYTE_ARRAY_OFFSET + 4L * i,
        v.getLong(i).toInt)
      i += 1
    }
    out
  }
}

/** binary of packed IEEE-754 bits → array<float> — the scan-side
  * inverse of [[PackFloatsBinary]] (bit-exact round trip). The band
  * consumers unpack ONCE per band row right after the scan: BinaryType
  * accesses COPY the byte[] per evaluation (UnsafeRow.getBinary), so
  * scoring pairs directly over binary allocated 2×256 B per collision
  * candidate — measured SLOWER than the array layout at sf0.1 despite
  * the 2× faster scan. Unpacking at the projection boundary keeps the
  * packed parquet layout's scan/disk win AND the join's zero-copy
  * UnsafeArrayData views: the pair loop runs the ORIGINAL array kernels
  * on identical floats. */
case class UnpackFloatsBinary(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"unpack_floats needs binary input, got $dt")
  }

  override protected def nullSafeEval(input: Any): Any =
    UnpackFloatsBinary.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnpackFloatsBinary.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): UnpackFloatsBinary =
    copy(child = newChild)
}

object UnpackFloatsBinary {
  import org.apache.spark.unsafe.Platform
  def compute(a: Array[Byte]): ArrayData = {
    val n = a.length / 4
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      out(i) = java.lang.Float.intBitsToFloat(
        Platform.getInt(a, Platform.BYTE_ARRAY_OFFSET + 4L * i))
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** binary of packed 4-byte groups → array<long> (zero-extended: the
  * packed values live in [0, 2^32), so the round trip through
  * [[PackLongsBinary]] is exact). Scan-side twin of
  * [[UnpackFloatsBinary]] for the ridden signature arrays. */
case class UnpackLongsBinary(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"unpack_longs needs binary input, got $dt")
  }

  override protected def nullSafeEval(input: Any): Any =
    UnpackLongsBinary.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnpackLongsBinary.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): UnpackLongsBinary =
    copy(child = newChild)
}

object UnpackLongsBinary {
  import org.apache.spark.unsafe.Platform
  def compute(a: Array[Byte]): ArrayData = {
    val n = a.length / 4
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = Platform.getInt(a, Platform.BYTE_ARRAY_OFFSET + 4L * i) &
        0xFFFFFFFFL
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

object PackedVectorFunctions {
  /** array<float> → binary of raw IEEE-754 bit patterns. */
  def packFloats(v: Column): Column =
    SqlBridge.column(PackFloatsBinary(SqlBridge.expression(v)))

  /** array<long> → binary of 4-byte groups (low 32 bits each). */
  def packLongs(v: Column): Column =
    SqlBridge.column(PackLongsBinary(SqlBridge.expression(v)))

  /** binary → array<float>, the exact inverse of [[packFloats]]. */
  def unpackFloats(v: Column): Column =
    SqlBridge.column(UnpackFloatsBinary(SqlBridge.expression(v)))

  /** binary → array<long> in [0, 2^32), the inverse of [[packLongs]]. */
  def unpackLongs(v: Column): Column =
    SqlBridge.column(UnpackLongsBinary(SqlBridge.expression(v)))
}
