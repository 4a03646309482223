package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native multi-band sign-LSH bucketer: for every band, the packed
  * sign-bit bucket id (bit i set when `dot(v, plane_i) ≥ 0`). Output
  * `array<long>` of length bands — `posexplode` gives the (band,
  * bucket) pairs the LSH bucket joins key on.
  *
  * Value-identical to the composed per-band form (one
  * `when(dot ≥ 0, 1<<i)` OR-fold column per band, see
  * `Similarity.signBuckets`): sequential-fold double dots, Spark
  * comparison semantics for the sign (NaN ≥ 0 is TRUE under Spark's
  * total ordering — replicated via an explicit isNaN check; a null
  * element nulls the dot, whose `when` fell to `otherwise(0)`, i.e.
  * the bit stays unset). The composed form inlines bands·planes dot
  * subtrees into the whole-stage-codegen consume method — 512
  * expressions at the occupancy-scaled 64-band operating point — the
  * same JIT huge-method cliff the PQ encoder hit ([[PqEncode]]); this
  * expression is two tight loops over a referenced plane matrix.
  */
case class SignBuckets(child: Expression,
                       planes: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val bands = planes.length
  private val nPlanes = planes(0).length
  private val dim = planes(0)(0).length

  // [band][plane] -> weights, flattened row-major
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](bands * nPlanes * dim)
    var b = 0
    while (b < bands) {
      var i = 0
      while (i < nPlanes) {
        System.arraycopy(planes(b)(i), 0, a, (b * nPlanes + i) * dim, dim)
        i += 1
      }
      b += 1
    }
    a
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t.isInstanceOf[NumericType] =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_buckets needs a numeric array, got ${other.sql}")
  }

  private def toD(t: DataType, a: ArrayData, i: Int): Double = t match {
    case DoubleType  => a.getDouble(i)
    case FloatType   => a.getFloat(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case ShortType   => a.getShort(i).toDouble
    case ByteType    => a.getByte(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalStateException(s"unsupported element $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val t = elemType
    val len = math.min(dim, v.numElements())
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var i = 0
      while (i < nPlanes) {
        var acc = 0.0
        var nullHit = false
        var j = 0
        while (j < len && !nullHit) {
          if (v.isNullAt(j)) nullHit = true
          else acc += toD(t, v, j) * flat((b * nPlanes + i) * dim + j)
          j += 1
        }
        // Spark ≥ on doubles: NaN is greatest, so NaN ≥ 0 is true; a
        // null dot fell through when() to otherwise(0) — bit unset
        if (!nullHit && (java.lang.Double.isNaN(acc) || acc >= 0.0))
          bucket |= 1L << i
        i += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("lshPlanes", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val len = ctx.freshName("len")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      val nullHit = ctx.freshName("nullHit")
      val getV = CodeGenerator.getValue(v, elemType, j)
      val containsNull = child.dataType.asInstanceOf[ArrayType].containsNull
      val nullCheck =
        if (containsNull) s"if ($v.isNullAt($j)) { $nullHit = true; break; }"
        else ""
      val nullGuard = if (containsNull) s"!$nullHit && " else ""
      s"""
         |int $len = java.lang.Math.min($dim, $v.numElements());
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $bucket = 0L;
         |  for (int $i = 0; $i < $nPlanes; $i++) {
         |    double $acc = 0.0;
         |    boolean $nullHit = false;
         |    for (int $j = 0; $j < $len; $j++) {
         |      $nullCheck
         |      $acc += (double)($getV) * $flatRef[($b * $nPlanes + $i) * $dim + $j];
         |    }
         |    if (${nullGuard}(java.lang.Double.isNaN($acc) || $acc >= 0.0))
         |      $bucket |= 1L << $i;
         |  }
         |  $out[$b] = $bucket;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SignBuckets =
    copy(child = newChild)

  override def prettyName: String = "sign_buckets"
}

object SignBuckets {
  /** Column-level entry point. */
  def apply(v: Column, planes: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(SignBuckets(ColumnBridge.expression(v), planes))
}
