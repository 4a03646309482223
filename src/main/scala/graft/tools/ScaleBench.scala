package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build-time 10× scale experiment for the per-series families
  * (VERDICT r05 #7): replicates the sf0.1 events table `factor`× with
  * disjoint user_id ranges (series count scales, per-series length —
  * the capped dimension — stays fixed, exactly the many-series 100 TB
  * shape), then times every per-series query at sf0.1 and at the
  * replicated scale. Near-linear wall growth validates the one-
  * keyed-shuffle plans; a superlinear query is a plan bug. Results →
  * stdout table + BENCH_SF1.json (gen_docs.py folds it into
  * BENCH_NOTES.md).
  *
  * Run: sbt "runMain graft.tools.ScaleBench /root/testdata/sf0.1 10"
  */
object ScaleBench {

  val PerSeriesQueries: Seq[String] = Seq(
    "c01b_spectral_per_user", "c05_adf_per_user",
    "g01b_block_chain_per_user", "g02b_grasynda_fit_per_user",
    "g02wb_grasynda_walk_per_user", "g03b_regime_segments_per_user",
    "g04b_regime_features_per_user", "g04tb_hmm_em_step_per_user",
    "g04wb_conditional_walk_per_user", "g05b_regime_garch_per_user",
    "g05wb_garch_walk_per_user", "o01b_sweep_fitness_per_user",
    "q16b_hurst_per_user", "q29b_garch_grid_per_user",
    "q30b_dist_per_user", "q31b_composite_per_user",
    "q31c_composite_full_per_user")

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val out = if (args.length > 2) args(2) else "/tmp/graft_scale"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.ansi.enabled", "false")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // series-count replication: each copy shifts user_id by the source
    // id range, so per-series row counts (and every per-series cap) are
    // unchanged — only the number of series grows
    val e = graft.core.Tables.events(spark, src)
    val nUsers = e.agg(max(col("user_id"))).first().getLong(0) + 1
    (0 until factor).map(i =>
        e.withColumn("user_id", col("user_id") + lit(i * nUsers)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      dt
    }
    // warm-up (JIT + codegen + scan) outside the timed cells
    time(PerSeriesQueries.head, src)

    val rows = PerSeriesQueries.map { q =>
      val base = math.min(time(q, src), time(q, src))
      val scaled = math.min(time(q, out), time(q, out))
      val ratio = scaled / base
      println(f"[scale] $q%-34s sf0.1=$base%6.2fs x$factor=$scaled%7.2fs ratio=$ratio%5.2f")
      (q, base, scaled, ratio)
    }
    val json = rows.map { case (q, b, s, r) =>
      s""""$q":{"base_sec":$b,"scaled_sec":$s,"ratio":$r}"""
    }.mkString(s"""{"factor":$factor,"queries":{""", ",", "}}")
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SF1.json"),
      (json + "\n").getBytes("UTF-8"))
    println(s"[scale] wrote BENCH_SF1.json (factor $factor)")
    spark.stop()
  }
}
