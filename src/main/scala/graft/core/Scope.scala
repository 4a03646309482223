package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-block scoping for multi-leg evaluators (guide §5: unpersist
  * when done). A grouped metric record is built from shared
  * checkpointed/persisted intermediates (the labeled returns frame, the
  * bounded histogram aggregates); returning it LAZY means nothing can
  * ever release those blocks — consumers hold a plan that still
  * references them, so in a long-lived session repeated evaluator calls
  * accumulate MEMORY_AND_DISK blocks until ContextCleaner happens to
  * notice (VERDICT r17 #3). */
object Scope {

  /** Run `build`, eagerly materialize its (output-sized) result via
    * localCheckpoint, then unpersist every storage block the thunk
    * registered along the way — including lazy `persist()`s, whose
    * backing RDDs only appear once the materialization runs them. The
    * caller receives a frame backed by its own checkpoint blocks ONLY;
    * data-sized intermediates are released the moment this returns, and
    * the result itself is one unpersist away (the bench's per-query
    * hygiene already clears it).
    *
    * Safe against caller state: only RDD ids that first appear between
    * entry and the post-materialization snapshot are dropped, the
    * result's own blocks are excluded by id, and the result is fully
    * materialized BEFORE anything is released. */
  def materialized(spark: SparkSession)(build: => DataFrame): DataFrame = {
    val sc = spark.sparkContext
    val pre = sc.getPersistentRDDs.keySet.toSet
    val raw = build
    val rec = raw.localCheckpoint() // eager: runs every leg, fills caches
    val own = org.apache.spark.sql.graftbridge.RddBridge
      .logicalRddIds(rec).toSet
    val created = sc.getPersistentRDDs.keySet.toSet.diff(pre).diff(own)
    created.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    rec
  }
}
