package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd dot product of two numeric array columns.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)), 0.0, _ + _)`
  * — a strict left-to-right fold with double accumulation, and a null
  * element (or null array) yielding null — but whole-stage-codegen
  * capable. Spark's higher-order functions are CodegenFallback: every
  * element evaluation walks the interpreted lambda path, which made the
  * 32-dot-per-row sign-LSH bucketing stage and the exact cosine verify
  * the bench's slowest family (SURVEY §2.8 similarity ops).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _                => true
  }

  // nullSafeEval returns null on a null ELEMENT even when both child
  // arrays are non-null, so nullability must account for containsNull
  // (same contract as PqLut/PqEncode). Without this the expression is
  // declared non-nullable, ev.isNull constant-folds to `false`, and the
  // guarded `ev.isNull = true` write below fails janino compilation —
  // silently dropping the whole stage to interpreted execution.
  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(t, _) => t.isInstanceOf[NumericType]
      case _               => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product needs two numeric arrays, got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  private def toD(t: DataType, a: ArrayData, i: Int): Double = t match {
    case DoubleType => a.getDouble(i)
    case FloatType  => a.getFloat(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case LongType   => a.getLong(i).toDouble
    case ShortType  => a.getShort(i).toDouble
    case ByteType   => a.getByte(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalStateException(s"unsupported element $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null // zip_with semantics
      acc += toD(lt, x, i) * toD(rt, y, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val lt = elemType(left); val rt = elemType(right)
      val getA = CodeGenerator.getValue(a, lt, i)
      val getB = CodeGenerator.getValue(b, rt, i)
      val nullCheck =
        if (elemNullable(left) || elemNullable(right))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += (double)($getA) * (double)($getB);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
