package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native product-quantization encoder: for each of the `m` codebook
  * subspaces, the id of the L2-nearest of its `k*` centroids over the
  * corresponding `sub`-dim slice of the input vector. Output
  * `array<int>` of length m.
  *
  * Value-identical to the composed-expression form it replaced —
  * per centroid `d = dot(slice(v, mi·sub+1, sub), c) · −2 + Σc²`
  * (sequential-fold double dot, Σc² folded at construction in the same
  * order the literal was), nearest = lexicographic min over (d, cid) so
  * exact ties break to the smallest cid, doubles ordered like Spark
  * (NaN greatest) via `Double.compare` — but generated as two tight
  * loops over a referenced codebook array instead of m·k* inlined
  * dot/struct/array_min subtrees. The composed form's ~130-expression
  * tree, inlined into a whole-stage-codegen consume method, exceeded
  * the JVM JIT's huge-method bytecode limit: the stage ran
  * bytecode-interpreted and one 10k-row window stage cost 2.8 s
  * (measured; 0.57 s with codegen disabled). This expression keeps the
  * stage a few hundred bytecodes, JIT-compiled.
  *
  * A null input array yields null; a null element yields null (the
  * embedding columns carry none — parquet float arrays here are
  * non-null by construction).
  */
case class PqEncode(child: Expression,
                    codebook: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = codebook.length
  private val k = codebook(0).length
  private val sub = codebook(0)(0).length

  // flattened [mi][cid] -> centroid weights / Σc² , built once; Σc² in
  // the same left-fold order as the literal the composed form embedded
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](m * k * sub)
    var mi = 0
    while (mi < m) {
      var c = 0
      while (c < k) {
        System.arraycopy(codebook(mi)(c), 0, a, (mi * k + c) * sub, sub)
        c += 1
      }
      mi += 1
    }
    a
  }
  @transient private lazy val c2: Array[Double] = {
    val a = new Array[Double](m * k)
    var mi = 0
    while (mi < m) {
      var c = 0
      while (c < k) {
        a(mi * k + c) = codebook(mi)(c).map(x => x * x).sum
        c += 1
      }
      mi += 1
    }
    a
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean =
    child.nullable || (child.dataType match {
      case ArrayType(_, cn) => cn
      case _                => true
    })

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t.isInstanceOf[NumericType] =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs a numeric array, got ${other.sql}")
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
    val n = v.numElements()
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val off = mi * sub
      // slice semantics: dot runs over min(sub, remaining) elements
      val len = math.max(0, math.min(sub, n - off))
      var best = 0.0; var bestCid = -1
      var c = 0
      while (c < k) {
        var acc = 0.0
        var j = 0
        while (j < len) {
          if (v.isNullAt(off + j)) return null
          acc += toD(t, v, off + j) * flat((mi * k + c) * sub + j)
          j += 1
        }
        val d = acc * -2.0 + c2(mi * k + c)
        if (bestCid < 0 || java.lang.Double.compare(d, best) < 0) {
          best = d; bestCid = c
        }
        c += 1
      }
      codes(mi) = bestCid
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val c2Ref = ctx.addReferenceObj("pqC2", c2, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      val len = ctx.freshName("len")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val getV = CodeGenerator.getValue(v, elemType, s"$off + $j")
      val containsNull = child.dataType.asInstanceOf[ArrayType].containsNull
      // a null ELEMENT nulls the whole result; when elements are
      // provably non-null the check (and the assignment to the
      // constant-folded ev.isNull) must not be emitted
      val nullBreak =
        if (containsNull)
          s"""if ($v.isNullAt($off + $j)) { ${ev.isNull} = true; break; }"""
        else ""
      val outerGuard = if (containsNull) s" && !${ev.isNull}" else ""
      val innerGuard = if (containsNull) s"if (${ev.isNull}) break;" else ""
      s"""
         |int $n = $v.numElements();
         |int[] $codes = new int[$m];
         |for (int $mi = 0; $mi < $m$outerGuard; $mi++) {
         |  int $off = $mi * $sub;
         |  int $len = java.lang.Math.max(0, java.lang.Math.min($sub, $n - $off));
         |  double $best = 0.0; int $bestCid = -1;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $len; $j++) {
         |      $nullBreak
         |      $acc += (double)($getV) * $flatRef[($mi * $k + $c) * $sub + $j];
         |    }
         |    $innerGuard
         |    double $d = $acc * -2.0 + $c2Ref[$mi * $k + $c];
         |    if ($bestCid < 0 || java.lang.Double.compare($d, $best) < 0) {
         |      $best = $d; $bestCid = $c;
         |    }
         |  }
         |  $codes[$mi] = $bestCid;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

object PqEncode {
  /** Column-level entry point. */
  def apply(v: Column, codebook: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), codebook))
}
