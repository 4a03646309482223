package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means fit (beyond reference, k01): the
  * IN-ENGINE trainer behind [[graft.text.TopicCentroids]]-style frozen
  * models — topic/domain discovery over the t16 hashed doc embeddings
  * without any offline step.
  *
  * Spark shape, sized for a 100 TB corpus:
  *
  *  - each Lloyd iteration is ONE map-side assignment (the native
  *    [[graft.functions.PqEncode]] argmin over driver-literal
  *    centroids — no join, no shuffle) plus ONE (cluster, dim)-keyed
  *    mean aggregation (posexplode → map-side-combinable avg whose
  *    output is exactly k·dim cells);
  *  - the only driver state is the k×dim centroid matrix itself
  *    (model-sized by contract — k·dim doubles, NOT data-sized);
  *  - centroids are ROUNDED to 6 decimals after every update, so the
  *    next iteration's argmin runs on doubles both engines (and every
  *    re-run, at any partitioning) reproduce bit-identically — the
  *    [[graft.sim.IvfCodebook]] determinism story applied per
  *    iteration rather than once at freeze time.
  *
  * Determinism contract: init = the vectors of the `k` smallest ids
  * (centroid index in doc-id order); empty clusters keep their previous
  * centroid; argmin ties break to the smallest centroid index (the s02
  * convention).
  */
object KMeans {

  /** Run `iters` (assign, update) cycles from the deterministic init
    * and return (final centroids, assignment under them). `vecs` must
    * carry (`id`: long, `vec`: array&lt;double&gt;) with a constant
    * vector dimension. */
  def fit(vecs0: DataFrame, id: String, vec: String, k: Int,
          iters: Int): (Array[Array[Double]], DataFrame) = {
    // materialize the input ONCE: the fit loop reads it 2·iters+2
    // times (init probe, per-iteration assign + mean, final assign) and
    // a live embedding-construction lineage would recompute its
    // doc-keyed shuffle on every pass (the a10 composition lesson —
    // measured 6.7 s → ~2 s at sf0.1 for the k01 gate entry)
    val vecs = vecs0.localCheckpoint()
    val init: Array[Array[Double]] = vecs
      .orderBy(col(id)).limit(k).select(col(id), col(vec))
      .collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    require(init.nonEmpty, "k-means needs a non-empty input frame")
    val dim = init.head.length
    var cents = init
    for (_ <- 1 to iters) {
      val assigned = vecs.select(
        Similarity.ivfAssign(col(vec), cents).cast("int").as("cl"),
        col(vec))
      val means = assigned
        .select(col("cl"), posexplode(col(vec)).as(Seq("j", "v")))
        .groupBy(col("cl"), col("j"))
        .agg(round(avg(col("v")), 6).as("cv"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
      cents = Array.tabulate(k, dim) { (c, j) =>
        means.getOrElse((c, j), cents(c)(j))
      }
    }
    val asg = vecs.select(col(id),
      Similarity.ivfAssign(col(vec), cents).cast("long").as("cluster"))
    (cents, asg)
  }
}
