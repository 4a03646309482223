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

  /** Deterministic FARTHEST-POINT init (the greedy 2-approximation to
    * k-center, the deterministic member of the k-means++ family): c₀ =
    * the smallest id's vector; each further centroid is the vector
    * MAXIMIZING the minimum distance key to the centroids chosen so
    * far (ties → smallest id). Where the min-id init degenerates when
    * the first k docs are near-duplicates (k02's min_margin flags it
    * only after the fact), this spreads the seeds across the data by
    * construction.
    *
    * Oracle-replayable without randomness: each round's distance key is
    * the TRUE squared distance min over chosen of (x·x − 2·x·c + c·c)
    * — the x·x term is constant across the chosen set, so it adds once
    * OUTSIDE the min (identical float order on both engines) —
    * sequential inner products over identical r6 doubles, so the
    * exact-double argmax (DESC, id ASC) picks the same doc. Without
    * x·x the key is only distance-ordered for equal-norm vectors
    * (c=(1,0): x=(10,0) keys −19 while x=(−1,0) keys +3 — the CLOSER
    * point wins); `fit` exposes this mode for arbitrary vectors, so
    * the full quadratic is required. Each of the k−1 rounds is one
    * map-side key computation + one TakeOrdered(1); driver state is the
    * growing k×dim matrix only. `vecs` should be materialized by the
    * caller ([[fit]] checkpoints before calling). */
  def farthestPointInit(vecs: DataFrame, id: String, vec: String,
                        k: Int, start: Array[Double]): Array[Array[Double]] = {
    var chosen = Vector(start)
    while (chosen.length < k) {
      val keys = chosen.map { c =>
        val cLit = array(c.map(lit): _*)
        val c2 = c.map(x => x * x).sum
        Similarity.dot(col(vec), cLit) * -2.0 + lit(c2)
      }
      val next = vecs
        .select(col(id), col(vec),
          (array_min(array(keys: _*)) +
            Similarity.dot(col(vec), col(vec))).as("_dm"))
        .orderBy(col("_dm").desc, col(id)).limit(1)
        .select(col(vec)).collect()(0).getSeq[Double](0).toArray
      chosen :+= next
    }
    chosen.toArray
  }

  /** Run `iters` (assign, update) cycles from the deterministic init
    * and return (final centroids, assignment under them). `vecs` must
    * carry (`id`: long, `vec`: array&lt;double&gt;) with a constant
    * vector dimension. `initMode`: "min_id" (the k smallest ids'
    * vectors — the k01 contract) or "farthest_point"
    * ([[farthestPointInit]] from the smallest id). */
  def fit(vecs0: DataFrame, id: String, vec: String, k: Int,
          iters: Int, initMode: String = "min_id")
      : (Array[Array[Double]], DataFrame) = {
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
    require(init.length == k,
      s"k-means needs at least k=$k rows, got ${init.length} — lower k " +
        "(curate --train_topics) or loosen the upstream filters")
    val dim = init.head.length
    var cents = initMode match {
      case "min_id" => init
      case "farthest_point" =>
        farthestPointInit(vecs, id, vec, k, init.head)
      case other => throw new IllegalArgumentException(
        s"unknown k-means initMode '$other' (min_id | farthest_point)")
    }
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

  /** Cluster-quality report (k02): per cluster — member count, mean
    * squared distance to the own centroid, and the squared margin to
    * the nearest OTHER centroid (small margins flag near-duplicate
    * centroids; large avg_dist2 flags diffuse clusters). The per-doc
    * distance reuses the argmin key itself (min dKey + |v|² — the
    * assigned centroid IS the key minimizer), so the report is one
    * map-side pass + one k-row agg; margins are pure centroid
    * geometry, computed on the driver from the k×dim matrix. */
  def qualityReport(vecs: DataFrame, id: String, vec: String,
                    cents: Array[Array[Double]]): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val margins = cents.indices.map { i =>
      val m = cents.indices.filter(_ != i).map { j =>
        dot(cents(i), cents(i)) - 2.0 * dot(cents(i), cents(j)) +
          dot(cents(j), cents(j))
      }.min
      (i.toLong, BigDecimal(m).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("cluster", "min_margin")
    val keyCols = cents.map { c =>
      val cLit = array(c.map(lit): _*)
      val c2 = c.map(x => x * x).sum
      Similarity.dot(col(vec), cLit) * -2.0 + lit(c2)
    }
    val dist2 = array_min(array(keyCols: _*)) +
      Similarity.dot(col(vec), col(vec))
    val per = vecs.select(
        Similarity.ivfAssign(col(vec), cents).cast("long").as("cluster"),
        dist2.as("dist2"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("dist2")), 6).as("avg_dist2"))
    per.join(broadcast(margins), Seq("cluster"))
      .select(col("cluster"), col("n_docs"), col("avg_dist2"),
        col("min_margin"))
  }

  /** Simplified silhouette per cluster (k03; Kaufman & Rousseeuw's
    * silhouette with the CENTROID approximation — a_i = distance to
    * own centroid, b_i = distance to the nearest OTHER centroid,
    * s_i = (b−a)/max(a,b)): the O(n·k) member of the silhouette family
    * — the exact O(n²) pairwise form is not a 100 TB shape. Entirely
    * map-side against driver-literal centroids (the k02 argmin key,
    * sorted: position 1 = own dist², position 2 = nearest other), one
    * cluster-keyed agg. FP guard: dist² clamps at 0 (x≈centroid can go
    * −ε), degenerate max(a,b)=0 scores 0. */
  def silhouetteReport(vecs: DataFrame, id: String, vec: String,
                       cents: Array[Array[Double]]): DataFrame = {
    val keyCols = cents.map { c =>
      val cLit = array(c.map(lit): _*)
      val c2 = c.map(x => x * x).sum
      Similarity.dot(col(vec), cLit) * -2.0 + lit(c2)
    }
    val dl = array_sort(array(keyCols: _*))
    val vv = Similarity.dot(col(vec), col(vec))
    val a2 = greatest(element_at(dl, 1) + vv, lit(0.0))
    val b2 = greatest(element_at(dl, 2) + vv, lit(0.0))
    val a = sqrt(col("_a2"))
    val b = sqrt(col("_b2"))
    val s = when(greatest(a, b) > 0, (b - a) / greatest(a, b))
      .otherwise(lit(0.0))
    vecs.select(
        Similarity.ivfAssign(col(vec), cents).cast("long").as("cluster"),
        a2.as("_a2"), b2.as("_b2"))
      .withColumn("_s", s)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("_s")), 6).as("silhouette"))
  }
}
