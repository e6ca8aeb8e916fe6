package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Integer-exact random-hyperplane LSH bucket id, as a single codegen'd
  * Catalyst expression: all `nbits` sign tests in one pass over the vector.
  *
  * Each component is quantized ONCE to `floor(x * 2^20)` as a 64-bit
  * integer, then every hyperplane dot product is an exact ±1-weighted
  * integer sum and the sign test `sum >= 0` has a single possible answer in
  * any engine. The previous formulation summed doubles, and a near-zero dot
  * product's SIGN depended on the oracle engine's summation order/SIMD — a
  * DuckDB build change flipped one bucket id and hash-failed the one gate
  * query that exposes bucket ids directly (`sim_bucket_sample`, round 10).
  * `floor` (not `round`) removes even the tie-breaking ambiguity: no
  * half-away-from-zero vs half-even drift is possible, and the uniform
  * sub-ULP quantization bias is irrelevant to hash quality.
  *
  * `double(float) * 1048576.0` is one IEEE-exact-rounded multiply —
  * bit-identical in the JVM and in DuckDB — and `floor` of a double is
  * exact, so the quantized vector is engine-independent. Magnitudes are
  * bounded by `2^20 * |x| * dim`, nowhere near Long overflow for unit-scale
  * embeddings.
  *
  * One pass beats `nbits` separate [[VecDot]] calls: the vector is decoded
  * and quantized once, and the bit loop runs over a primitive int weight
  * matrix inside whole-stage codegen.
  */
case class LshBits(child: Expression, weights: Array[Array[Int]], nbits: Int)
  extends UnaryExpression {

  require(nbits >= 1 && nbits <= 62 && weights.length >= nbits,
    s"nbits=$nbits needs weights rows >= nbits (got ${weights.length})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_bits"

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array of float or double, got ${child.dataType.catalogString}")
  }

  /** Quantization scale: 2^20 ≈ 6 decimal digits of a unit-scale float —
    * far finer than float's own 24-bit mantissa noise at |x| <= 1. */
  private val Scale = 1048576.0d

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val isFloat = elemType == FloatType
    val dim = math.min(a.numElements(), weights(0).length)
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return null
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      q(i) = math.floor(x * Scale).toLong
      i += 1
    }
    var bucket = 0L
    var k = 0
    while (k < nbits) {
      val row = weights(k)
      var sum = 0L
      var j = 0
      while (j < dim) { sum += row(j) * q(j); j += 1 }
      if (sum >= 0L) bucket |= 1L << k
      k += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("lshWeights", weights, "int[][]")
    val getter = if (elemType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val dim = ctx.freshName("dim")
      val q = ctx.freshName("q")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val j = ctx.freshName("j")
      val sum = ctx.freshName("sum")
      val bucket = ctx.freshName("bucket")
      s"""
         |final int $dim = java.lang.Math.min($a.numElements(), $w[0].length);
         |final long[] $q = new long[$dim];
         |for (int $i = 0; $i < $dim; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $q[$i] = (long) java.lang.Math.floor(((double) $a.$getter($i)) * ${Scale}D);
         |}
         |if (!${ev.isNull}) {
         |  long $bucket = 0L;
         |  for (int $k = 0; $k < $nbits; $k++) {
         |    long $sum = 0L;
         |    final int[] ${j}_row = $w[$k];
         |    for (int $j = 0; $j < $dim; $j++) { $sum += ${j}_row[$j] * $q[$j]; }
         |    if ($sum >= 0L) { $bucket |= (1L << $k); }
         |  }
         |  ${ev.value} = $bucket;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): LshBits =
    copy(child = newChild)
}

object LshBits {
  /** Bucket id of `emb` under the first `nbits` rows of `weights`. */
  def apply(emb: Column, weights: Array[Array[Int]], nbits: Int): Column =
    ColumnBridge.column(LshBits(ColumnBridge.expression(emb), weights, nbits))
}
