package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stats.CountMin

class CountMinSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("count-min: estimates never undercount, are exact when no " +
       "bucket collides, and merged sketches equal the one-shot sketch") {
    val s = spark
    import s.implicits._
    // zipf-ish corpus: token-i appears i times, 40 tokens, 820 rows
    val rows = (1 to 40).flatMap(i => Seq.fill(i)(s"tok$i"))
    val df = rows.toDF("v")
    val exact = rows.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong }

    // wide sketch (w=4096 ≫ 40 tokens): collisions are overwhelmingly
    // unlikely -> every estimate equals the exact count
    val wide = CountMin.sketch(df, col("v"), d = 4, w = 4096, seed = 7)
    val probesW = exact.keys.toSeq.toDF("v")
    CountMin.estimate(probesW, "v", wide, d = 4, w = 4096, seed = 7)
      .collect().foreach { r =>
        assert(r.getAs[Long]("cm_est") === exact(r.getAs[String]("v")))
      }

    // narrow sketch (w=8 ≪ 40 tokens): collisions guaranteed — every
    // estimate must still be ≥ exact (the one-sided CM error bound)
    val narrow = CountMin.sketch(df, col("v"), d = 3, w = 8, seed = 7)
    val est = CountMin.estimate(probesW, "v", narrow, d = 3, w = 8,
      seed = 7).collect()
    est.foreach { r =>
      assert(r.getAs[Long]("cm_est") >= exact(r.getAs[String]("v")),
        s"CM undercounted ${r.getAs[String]("v")}")
    }
    assert(est.exists(r =>
      r.getAs[Long]("cm_est") > exact(r.getAs[String]("v"))),
      "w=8 over 40 tokens must actually collide somewhere")

    // mergeability: sketch(shard1) ∪ sketch(shard2) re-summed ==
    // sketch(all) cell-for-cell
    val (h1, h2) = rows.splitAt(rows.size / 2)
    val merged = CountMin.sketch(h1.toDF("v"), col("v"), 3, 8, 7)
      .unionByName(CountMin.sketch(h2.toDF("v"), col("v"), 3, 8, 7))
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val a = merged.orderBy(col("row"), col("bucket")).collect().toSeq
    val b = narrow.orderBy(col("row"), col("bucket")).collect().toSeq
    assert(a.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))) ===
      b.map(r => (r.getInt(0), r.getLong(1), r.getLong(2))))
  }

  test("count-min: a probe with empty sketch cells still emits a row — " +
       "unseen keys estimate 0, never silently disappear") {
    val s = spark
    import s.implicits._
    // tiny corpus on a wide sketch: most of the 4×4096 cells are empty,
    // so an unseen probe's cells are (near-)certainly all absent — the
    // r14 advisor's inner-join bug dropped such probes entirely
    val df = Seq("a", "a", "b").toDF("v")
    val cells = CountMin.sketch(df, col("v"), d = 4, w = 4096, seed = 7)
    val probes = Seq("a", "b", "never_seen_1", "never_seen_2").toDF("v")
    val est = CountMin.estimate(probes, "v", cells, d = 4, w = 4096,
      seed = 7).collect().map(r =>
        r.getAs[String]("v") -> r.getAs[Long]("cm_est")).toMap
    assert(est.size === 4, "every probe must emit exactly one row")
    assert(est("a") === 2L && est("b") === 1L)
    assert(est("never_seen_1") === 0L && est("never_seen_2") === 0L,
      "unseen probes must estimate 0 (empty cell = counter 0)")
  }
}
