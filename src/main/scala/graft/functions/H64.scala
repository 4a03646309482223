package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{BinaryType, LongType}

/** SQL surface for the engine's portable 60-bit hash
  * (`graft.text.Dedup.h64`): `graft_h64(seed, str)` = the first 15 hex
  * chars of md5(seed|str) as a base-16 long — the primitive under every
  * deterministic split/sample/LSH path, exposed so `spark.sql` users
  * can reproduce bucket assignments without the Column API.
  *
  * RuntimeReplaceable: the expression REWRITES at analysis time to the
  * same built-in composition the Column API emits
  * (cast(conv(substr(md5(concat_ws('|', seed, str)), 1, 15), 16, 10)
  * as bigint)), so it costs nothing at execution and stays inside
  * whole-stage codegen — no UDF. */
case class H64(seed: Expression, str: Expression, replacement: Expression)
    extends RuntimeReplaceable with InheritAnalysisRules {

  def this(seed: Expression, str: Expression) = this(seed, str,
    Cast(
      new Conv(
        Substring(
          Md5(Cast(ConcatWs(Seq(Literal("|"), seed, str)), BinaryType)),
          Literal(1), Literal(15)),
        Literal(16), Literal(10)),
      LongType))

  override def prettyName: String = "graft_h64"
  override def parameters: Seq[Expression] = Seq(seed, str)
  override protected def withNewChildInternal(newChild: Expression): H64 =
    copy(replacement = newChild)
}
