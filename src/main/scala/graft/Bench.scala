package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      // numpy-parity numeric semantics: division/overflow yield
      // nan/inf/null, never errors (the reference never ANSI-errors;
      // DuckDB corr on constant input is NULL, matching coalesce(corr,0))
      .config("spark.sql.ansi.enabled", "false")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/scan warm-up so the first timed query isn't charged
    // for session bring-up (flagship entry touches joins+agg+parquet)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // sorted name order: a hash-Map iteration reshuffles execution order
    // whenever a query is added, making round-over-round per-query deltas
    // absorb different JIT/page-cache states
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-28s $dt%8.2f s")
      // Per-query hygiene (outside the timed window): localCheckpoint RDD
      // blocks (BlockBootstrap/Dedup/Divergence) and cached plans otherwise
      // accumulate in the block manager across the 61-query run and inflate
      // whatever executes late in sorted order 2-3x. getPersistentRDDs covers
      // checkpoint blocks (they register with a storage level); the GC tick
      // lets ContextCleaner drop dead broadcasts.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
