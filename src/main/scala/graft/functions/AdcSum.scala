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
  * A null `lut` or `codes` yields null, as does a null ELEMENT of
  * either (PqLut/PqEncode contract — they emit containsNull = false,
  * but a round-trip through a persisted index may not preserve that,
  * so the element check is only emitted when the schema says it can
  * fire). Every code is in [0, k*) so `mi·k* + codes[mi]` is in range.
  */
case class AdcSum(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _                => true
  }

  // same contract as DotProduct/PqLut: a null element can null the
  // result even when both child arrays are non-null, so nullability
  // must account for containsNull or ev.isNull constant-folds away
  // and the guarded write below fails janino compilation
  override def nullable: Boolean =
    left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

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
      if (codes.isNullAt(mi)) return null
      val idx = mi * ks + codes.getInt(mi)
      if (lut.isNullAt(idx)) return null
      acc += lut.getDouble(idx)
      mi += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, codes) => {
      val mi = ctx.freshName("mi")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val idx = ctx.freshName("idx")
      val codeNullCheck =
        if (elemNullable(right))
          s"if ($codes.isNullAt($mi)) { ${ev.isNull} = true; break; }"
        else ""
      val lutNullCheck =
        if (elemNullable(left))
          s"if ($lut.isNullAt($idx)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $m = $codes.numElements();
         |double $acc = 0.0;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  $codeNullCheck
         |  int $idx = $mi * $ks + $codes.getInt($mi);
         |  $lutNullCheck
         |  $acc += $lut.getDouble($idx);
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
