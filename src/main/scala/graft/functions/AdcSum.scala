package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native asymmetric-distance (ADC) score: Σ_mi lut[mi·k* + codes[mi]]
  * — the per-candidate PQ approximate dot against a query's flattened
  * m-major lookup table ([[PqLut]]), with `codes` the candidate's PQ
  * code array ([[PqEncode]]).
  *
  * Value-identical to the composed form it replaced — a left-to-right
  * `reduce(_ + _)` over m `element_at(lut, element_at(codes, mi+1) +
  * mi·k*+1)` terms (same double addition order) — but generated as one
  * tight loop. The composed tree's generated method grows with m; at
  * the production-dim operating point (m=96 subspaces) it crosses
  * Janino's hard 64 KB bytecode limit inside the broadcast-join stage,
  * and the failed compile (which Spark does NOT cache) re-ran on every
  * execution: the ADC scan alone measured ~13 s of a 14 s query at 12×
  * dim, vs sub-second with this expression.
  *
  * A null `lut` or `codes` yields null; elements are non-null by
  * construction ([[PqLut]]/[[PqEncode]] emit containsNull = false) and
  * every code is in [0, k*) so `mi·k* + codes[mi]` is always in range.
  */
case class AdcSum(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"adc_sum needs (array<double> lut, array<int> codes), got ${l.sql} / ${r.sql}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      acc += lut.getDouble(mi * ks + codes.getInt(mi))
      mi += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val mi = ctx.freshName("mi")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $codes.numElements();
         |double $acc = 0.0;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  $acc += $lut.getDouble($mi * $ks + $codes.getInt($mi));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSum =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "adc_sum"
}

object AdcSum {
  /** Column-level entry point. */
  def apply(lut: Column, codes: Column, ks: Int): Column =
    ColumnBridge.column(
      AdcSum(ColumnBridge.expression(lut), ColumnBridge.expression(codes), ks))
}
