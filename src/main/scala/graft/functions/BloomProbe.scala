package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native codegen'd membership probe against a broadcast
  * [[BloomFilter]] over a string column — the map-side pre-filter of
  * the decontamination sketch path ([[graft.text.TextOps.bloomContamination]],
  * cf. `data_processor.py`-style exact join in the reference, which has
  * no sketch tier at all).
  *
  * Semantically identical to
  * `df.filter((r: Row) => bloom.mightContainString(r.getString(i)))`
  * but WITHOUT the closure's costs: the Scala-closure filter is opaque
  * to Catalyst (`FilterExec` over a deserialized `Row` — it ends the
  * whole-stage-codegen span, forces an InternalRow→Row conversion of
  * every train gram, and hides the predicate from the plan string).
  * This expression stays inside the codegen span, probes the
  * UTF8String's UTF-8 bytes directly (the exact bytes
  * `BloomFilter.putString` hashed on the build side — no transient
  * `java.lang.String` per row), and prints in `explain` output as
  * `bloom_might_contain(shingle)`, so PlanAuditSpec can pin the shape.
  *
  * The filter ships as a `Broadcast` reference (one copy per executor,
  * not one per task as a plan-embedded literal would be) — the same
  * economics as Spark's own `BloomFilterMightContain` runtime-filter
  * expression, which is not reusable here because it probes xxhash64
  * longs while `DataFrameStatFunctions.bloomFilter` inserts raw string
  * bytes.
  *
  * Null contract: null input → false (a null gram matches nothing),
  * so the expression itself is non-nullable and the filter never
  * needs a separate null guard.
  */
case class BloomProbe(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a string column, got ${child.dataType.sql}")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else bloom.value.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the broadcast handle rides the codegen references array; .value
    // resolves to the executor-local filter instance at first touch
    val bloomRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.value} = false;
        if (!${childGen.isNull}) {
          ${ev.value} = ((org.apache.spark.util.sketch.BloomFilter)
            $bloomRef.value()).mightContainBinary(${childGen.value}.getBytes());
        }
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomProbe {
  /** Column-level entry point: `df.filter(BloomProbe(col("shingle"), bc))`. */
  def apply(c: Column, bloom: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(BloomProbe(ColumnBridge.expression(c), bloom))
}
