package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stats.Hll

class HllSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("hll: linear-counting branch is accurate at small n (p=8)") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => ("k", s"v$i")).toDF("key", "v")
    val r = Hll.approxDistinct(df, Seq("key"), col("v"), p = 8, seed = 41)
      .first()
    val est = r.getAs[Double]("n_est")
    // linear counting at n/m ≈ 0.4 is typically within a few percent
    assert(est > 80 && est < 120, s"est=$est")
    assert(r.getAs[Long]("n_zeros") > 0)
  }

  test("hll: raw branch engages and tracks large n (p=8, n=50k)") {
    val s = spark
    import s.implicits._
    val df = (1 to 50000).map(i => ("k", s"item-$i")).toDF("key", "v")
    val r = Hll.approxDistinct(df, Seq("key"), col("v"), p = 8, seed = 41)
      .first()
    val est = r.getAs[Double]("n_est")
    val raw = r.getAs[Double]("raw_est")
    // raw branch: raw > 2.5*m = 640, so n_est == raw_est
    assert(raw > 640.0)
    assert(est === raw)
    // HLL relative error ~1.04/sqrt(256) ≈ 6.5%; allow 3 sigma
    assert(math.abs(est - 50000.0) / 50000.0 < 0.2, s"est=$est")
  }

  test("hll: duplicates do not move the estimate") {
    val s = spark
    import s.implicits._
    val once = (1 to 500).map(i => ("k", s"u$i")).toDF("key", "v")
    val dup = (1 to 500).flatMap(i => Seq.fill(7)(("k", s"u$i")))
      .toDF("key", "v")
    val a = Hll.approxDistinct(once, Seq("key"), col("v"), 8, 41).first()
    val b = Hll.approxDistinct(dup, Seq("key"), col("v"), 8, 41).first()
    assert(a.getAs[Double]("n_est") === b.getAs[Double]("n_est"))
  }

  test("hll: register tables merge by max — union of shards == whole") {
    val s = spark
    import s.implicits._
    val all = (1 to 2000).map(i => ("k", s"x$i"))
    val (l, r) = all.splitAt(1000)
    val whole = Hll.registers(all.toDF("key", "v"), Seq("key"), col("v"),
      p = 8, seed = 41)
    val merged = Hll.registers(l.toDF("key", "v"), Seq("key"), col("v"), 8, 41)
      .union(Hll.registers(r.toDF("key", "v"), Seq("key"), col("v"), 8, 41))
      .groupBy(col("key"), col("bucket")).agg(max(col("rank")).as("rank"))
    val a = Hll.estimate(whole, Seq("key"), 8).first().getAs[Double]("n_est")
    val b = Hll.estimate(merged, Seq("key"), 8).first().getAs[Double]("n_est")
    assert(a === b)
  }

  test("hll: rank is 1 + leading zeros of the 60-p low bits") {
    val s = spark
    import s.implicits._
    // w = 1 has bitlength 1 -> rank = (60-8+1) - 1 = 52; w = 0 -> 53
    val df = Seq(("k", "probe")).toDF("key", "v")
    val regs = Hll.registers(df, Seq("key"), col("v"), p = 8, seed = 41)
      .collect()
    assert(regs.length === 1)
    val rank = regs.head.getAs[Int]("rank")
    assert(rank >= 1 && rank <= 53)
  }
}
