package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's native Catalyst
  * expressions with the SQL function registry, so `spark.sql` users can
  * call them directly:
  *
  *   SELECT dot_product(embedding, embedding) FROM embeddings
  *
  * Wire up with either
  *   SparkSession.builder().withExtensions(new GraftExtensions) …
  * or the standard config
  *   --conf spark.sql.extensions=graft.GraftExtensions
  *
  * Only `dot_product` has a data-only signature; the other native
  * expressions (pq_encode / pq_lut / adc_sum / sign_buckets) are
  * parameterized by build-time codebook/plane constants — Scala arrays
  * frozen at compile time — so they stay Column-API-only by design
  * (`graft.functions.*` objects); a SQL surface would force re-parsing
  * large float literals per call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[graft.functions.DotProduct].getName,
        "dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"dot_product expects 2 arguments, got ${children.length}")
        graft.functions.DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_h64"),
      new ExpressionInfo(classOf[graft.functions.H64].getName, "graft_h64"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_h64 expects (seed, str), got ${children.length} arguments")
        new graft.functions.H64(children.head, children(1))
      }))
  }
}
