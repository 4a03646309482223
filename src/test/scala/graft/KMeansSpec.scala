package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.KMeans

/** k01 in-engine k-means: Lloyd invariants, determinism, the
  * empty-cluster contract, and the per-iteration plan shape. */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private def docVecs = graft.text.TextOps.hashEmbedVectors(
    graft.core.Tables.documents(spark, SparkSpec.sfDir), "doc_id", "text")

  private def inertia(vecs: org.apache.spark.sql.DataFrame,
                      cents: Array[Array[Double]]): Double =
    vecs.select(graft.sim.Similarity
        .ivfAssign(col("embedding"), cents).cast("int").as("cl"),
        col("embedding"))
      .select(posexplode(col("embedding")).as(Seq("j", "v")), col("cl"))
      .join(cents.zipWithIndex.flatMap { case (c, i) =>
          c.zipWithIndex.map { case (x, j) => (i, j, x) }
        }.toSeq.toDF("cl", "j", "c"), Seq("cl", "j"))
      .agg(sum(pow(col("v") - col("c"), 2.0))).first().getDouble(0)

  test("k01: Lloyd iterations do not increase inertia (up to the r6 " +
       "centroid rounding), assignment is total and deterministic") {
    val vecs = docVecs.persist()
    val (c1, _) = KMeans.fit(vecs, "doc_id", "embedding", k = 8, iters = 1)
    val (c2, asg2) = KMeans.fit(vecs, "doc_id", "embedding", k = 8, iters = 2)
    val i1 = inertia(vecs, c1)
    val i2 = inertia(vecs, c2)
    // r6 rounding can perturb each centroid coordinate by 5e-7; bound
    // the allowed backslide generously below any real regression
    assert(i2 <= i1 + 1e-3, s"inertia rose across an iteration: $i1 -> $i2")
    val n = vecs.count()
    val rows = asg2.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.length.toLong === n, "assignment must cover every doc")
    assert(rows.forall { case (_, c) => c >= 0 && c < 8 })
    assert(rows.map(_._2).distinct.length >= 3,
      "centroids collapsed: fewer than 3 clusters in use")
    // determinism: a re-run reproduces centroids and assignment exactly
    val (c2b, asg2b) = KMeans.fit(vecs, "doc_id", "embedding", k = 8,
      iters = 2)
    assert(c2.map(_.toSeq).toSeq === c2b.map(_.toSeq).toSeq)
    assert(asg2b.collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
      === rows.toSeq)
    vecs.unpersist()
  }

  test("k01: a cluster emptied by the tie-break keeps its previous " +
       "centroid (and may then re-win its exact matches)") {
    // init centroids (ids 0,1,2): c0=(0,0), c1=(10,10), c2=(0,0) — a
    // duplicate. Iteration 1: every (0,0)-side doc ties c0 vs c2 and
    // the first-index convention sends all of them to c0, so cluster 2
    // EMPTIES and must keep (0,0) while c0 drifts to the group mean.
    // Iteration 2: the kept exact centroid then strictly beats the
    // drifted c0 for the docs AT (0,0) — the keep-previous policy is
    // observable in the final assignment, not just in the matrix
    val vecs = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(10.0, 10.0)),
      (2L, Array(0.0, 0.0)), (3L, Array(0.2, 0.0)),
      (4L, Array(10.2, 10.0)), (5L, Array(0.0, 0.2)),
      (6L, Array(10.0, 10.2))).toDF("id", "v")
    val (cents, asg) = KMeans.fit(vecs, "id", "v", k = 3, iters = 2)
    assert(cents(2).toSeq === Seq(0.0, 0.0), "empty cluster drifted")
    val byCl = asg.collect().groupBy(_.getLong(1))
      .map { case (c, rs) => c -> rs.map(_.getLong(0)).toSet }
    assert(byCl.keySet === Set(0L, 1L, 2L))
    assert(byCl(0L) === Set(3L, 5L))
    assert(byCl(1L) === Set(1L, 4L, 6L))
    assert(byCl(2L) === Set(0L, 2L))
  }

  test("k02 quality report: covers every doc once, distances " +
       "non-negative, margins positive, tight toy geometry is exact") {
    import spark.implicits._
    val vecs = docVecs.persist()
    val (cents, _) = KMeans.fit(vecs, "doc_id", "embedding", k = 8,
      iters = 2)
    val rep = KMeans.qualityReport(vecs, "doc_id", "embedding", cents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rep.nonEmpty && rep.length <= 8)
    assert(rep.map(_._2).sum === vecs.count())
    assert(rep.forall(_._3 >= -1e-6), "mean squared distance negative")
    assert(rep.forall(_._4 > 0.0),
      "identical centroids should have been impossible after the fit")
    vecs.unpersist()
    // toy geometry: two singleton clusters at distance 5 -> avg_dist2 0,
    // margin 25 for both
    val toy = Seq((0L, Array(0.0, 0.0)), (1L, Array(3.0, 4.0)))
      .toDF("id", "v")
    val (c2, _) = KMeans.fit(toy, "id", "v", k = 2, iters = 1)
    val r2 = KMeans.qualityReport(toy, "id", "v", c2)
      .orderBy("cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(r2.toSeq === Seq((0L, 1L, 0.0, 25.0), (1L, 1L, 0.0, 25.0)))
  }

  test("k03 silhouette: hand-computed scores — tight clusters near 1, " +
       "an equidistant point scores exactly 0") {
    import spark.implicits._
    val cents = Array(Array(0.0, 0.0), Array(10.0, 0.0))
    val vecs = Seq(
      (1L, Seq(0.0, 0.0)),   // a=0,  b=10 -> s = 1
      (2L, Seq(1.0, 0.0)),   // a=1,  b=9  -> s = 8/9
      (3L, Seq(5.0, 0.0)),   // a=5,  b=5  -> s = 0 (ties to cluster 0)
      (4L, Seq(10.0, 0.0)),  // a=0,  b=10 -> s = 1
      (5L, Seq(9.0, 0.0)))   // a=1,  b=9  -> s = 8/9
      .toDF("doc_id", "embedding")
      .select(col("doc_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val out = KMeans.silhouetteReport(vecs, "doc_id", "embedding", cents)
      .orderBy("cluster").collect()
    assert(out.length === 2)
    val c0 = out(0)
    assert(c0.getAs[Long]("n_docs") === 3L)
    val exp0 = (1.0 + 8.0 / 9 + 0.0) / 3
    assert(math.abs(c0.getAs[Double]("silhouette") - exp0) < 1e-6)
    val c1 = out(1)
    assert(c1.getAs[Long]("n_docs") === 2L)
    assert(math.abs(c1.getAs[Double]("silhouette") - (1.0 + 8.0 / 9) / 2)
      < 1e-6)
  }

  test("k01 plan: the assignment pass is map-side (no join, no shuffle " +
       "before the mean agg); the mean agg output is k*dim cells") {
    // assign over a MATERIALIZED vector frame (the fit-loop situation:
    // the embedding construction's own doc-keyed shuffle happens once
    // upstream, not per iteration)
    val tmp = java.nio.file.Files.createTempDirectory("graftkm").toString
    docVecs.write.mode("overwrite").parquet(tmp)
    val vecs = spark.read.parquet(tmp)
    val cents = vecs.orderBy(col("doc_id")).limit(8)
      .collect().sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    val assignedPlan = vecs.select(graft.sim.Similarity
        .ivfAssign(col("embedding"), cents).as("cl"))
      .queryExecution.executedPlan.toString
    assert(!assignedPlan.contains("Exchange"),
      s"assignment must not shuffle:\n$assignedPlan")
    assert(!assignedPlan.contains("Join"),
      "assignment must be a literal-centroid expression, not a join")
    val means = vecs.select(graft.sim.Similarity
        .ivfAssign(col("embedding"), cents).cast("int").as("cl"),
        posexplode(col("embedding")).as(Seq("j", "v")))
      .groupBy(col("cl"), col("j")).agg(avg(col("v")))
    assert(means.count() <= 8L * 64L)
    val meansPlan = means.queryExecution.executedPlan.toString
    assert(meansPlan.contains("HashAggregate"),
      "mean update must be a hash agg (map-side combinable)")
  }

  test("k01d farthest-point init survives a near-duplicate id prefix " +
       "where the min-id init provably degenerates") {
    // four well-separated groups; the four SMALLEST ids are IDENTICAL
    // vectors in group 0 — the pathological prefix k02's min_margin
    // only flags after the fact
    def g(axis: Int, eps: Double) =
      Array.tabulate(4)(j => (if (j == axis) 10.0 else 0.0) + eps)
    val rows =
      (1L to 4L).map(i => (i, g(0, 0.0), 0)) ++        // identical prefix
      (5L to 8L).map(i => (i, g(1, 0.01 * i), 1)) ++
      (9L to 12L).map(i => (i, g(2, 0.01 * i), 2)) ++
      (13L to 16L).map(i => (i, g(3, 0.01 * i), 3)) ++
      (17L to 18L).map(i => (i, g(0, 0.01 * i), 0))
    val vecs = rows.map { case (i, v, grp) => (i, v.toSeq, grp) }
      .toDF("doc_id", "embedding", "grp")
    // min-id init: all 4 centroids identical -> every doc ties to
    // centroid 0 on iteration 1 -> at most TWO distinct final clusters
    // (the global mean + the untouched duplicates) — degenerate
    val (_, asgMin) = KMeans.fit(vecs, "doc_id", "embedding", k = 4,
      iters = 2, initMode = "min_id")
    val distinctMin = asgMin.select("cluster").distinct().count()
    assert(distinctMin < 4,
      s"min-id init must degenerate here, got $distinctMin clusters")
    // farthest-point init: one seed per group by construction, and the
    // 2-iteration fit recovers the true grouping exactly
    val picks = KMeans.farthestPointInit(vecs, "doc_id", "embedding",
      k = 4, start = g(0, 0.0))
    assert(picks.map(_.indexWhere(_ >= 9.0)).sorted.toSeq === Seq(0, 1, 2, 3),
      "farthest-point must pick one seed per group")
    val (_, asgFp) = KMeans.fit(vecs, "doc_id", "embedding", k = 4,
      iters = 2, initMode = "farthest_point")
    val byGroup = asgFp.join(vecs.select(col("doc_id"), col("grp")), "doc_id")
      .select(col("grp"), col("cluster")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toSeq
    val g2c = byGroup.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(g2c.values.forall(_.size == 1),
      s"every true group must land in one cluster: $g2c")
    assert(g2c.values.map(_.head).toSet.size === 4,
      s"the four groups must land in four distinct clusters: $g2c")
  }
}
