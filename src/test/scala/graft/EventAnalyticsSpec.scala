package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.series.EventAnalytics

class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def ev(rows: (String, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toSeq.toDF("user_id", "t", "event_type")
      .withColumn("ts", to_timestamp(col("t")))
  }

  test("funnel: strict ordering gates each stage on the previous entry") {
    val df = ev(
      ("u1", "2024-01-01 01:00:00", "view"),
      ("u1", "2024-01-01 02:00:00", "click"),
      ("u1", "2024-01-01 03:00:00", "purchase"),
      // u2: purchase happens BEFORE the first post-view click -> no stage 2
      ("u2", "2024-01-01 01:00:00", "click"),
      ("u2", "2024-01-01 02:00:00", "view"),
      ("u2", "2024-01-01 04:00:00", "purchase"),
      ("u2", "2024-01-01 05:00:00", "click"),
      ("u3", "2024-01-01 01:00:00", "view"),
      ("u4", "2024-01-01 01:00:00", "purchase"))
    val out = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("stage_idx").collect()
    assert(out.map(_.getAs[Long]("n_users")).toSeq === Seq(3L, 2L, 1L))
    assert(math.abs(out(0).getAs[Double]("rate") - 0.75) < 1e-9) // 3/4 users
    assert(math.abs(out(1).getAs[Double]("rate") - 2.0 / 3) < 1e-6)
    assert(math.abs(out(2).getAs[Double]("rate") - 0.5) < 1e-9)
  }

  test("funnel: same-timestamp events do NOT progress (strict >)") {
    val df = ev(
      ("u1", "2024-01-01 01:00:00", "view"),
      ("u1", "2024-01-01 01:00:00", "click"))
    val out = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click")).orderBy("stage_idx").collect()
    assert(out.map(_.getAs[Long]("n_users")).toSeq === Seq(1L, 0L))
    assert(out(1).isNullAt(out(1).fieldIndex("rate")) ||
      out(1).getAs[Double]("rate") === 0.0)
  }

  test("retention: first-seen-day cohorts, distinct actives per offset") {
    val df = ev(
      ("u1", "2024-01-01 10:00:00", "view"),
      ("u1", "2024-01-01 11:00:00", "click"), // same day, still 1 active
      ("u1", "2024-01-03 10:00:00", "view"),
      ("u2", "2024-01-01 10:00:00", "view"),
      ("u3", "2024-01-02 10:00:00", "view"),
      ("u3", "2024-01-03 10:00:00", "view"))
    val out = EventAnalytics.retention(df, "user_id", "ts")
      .orderBy("cohort", "offset_days").collect()
      .map(r => (r.getAs[String]("cohort"), r.getAs[Int]("offset_days"),
        r.getAs[Long]("n_active"), r.getAs[Long]("n_cohort"),
        r.getAs[Double]("retention")))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0, 2L, 2L, 1.0),
      ("2024-01-01", 2, 1L, 2L, 0.5),
      ("2024-01-02", 0, 1L, 1L, 1.0),
      ("2024-01-02", 1, 1L, 1L, 1.0)))
  }
}
