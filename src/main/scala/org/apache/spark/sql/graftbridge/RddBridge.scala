package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge into `private[sql]` plan internals: the RDD ids a checkpointed
  * DataFrame is backed by, so storage-scoping code (graft.core.Scope)
  * can release everything EXCEPT the frame it returns without guessing
  * from registration order. */
object RddBridge {
  def logicalRddIds(df: DataFrame): Seq[Int] =
    df.queryExecution.analyzed.collect { case r: LogicalRDD => r.rdd.id }
}
