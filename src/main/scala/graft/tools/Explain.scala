package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: dump `.explain("formatted")` for SparkEntry queries.
  * Usage: runMain graft.tools.Explain <sfDir> <outDir> <suffix> <query...>
  * Writes <outDir>/<query>_<suffix>.txt per query. Queries whose
  * builder runs eager driver-side actions (q30/q31/q32 metric records)
  * dump the plan of the frame the query RETURNS — the committed file
  * says so in its header when that plan is a local-relation assembly. */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: Explain <sfDir> <outDir> <suffix> <query...>")
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args.drop(3).toSeq
    val spark = SparkSession.builder()
      .config("spark.sql.ansi.enabled", "false")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      System.err.println(s"[explain] wrote $outDir/${name}_$suffix.txt " +
        s"(${plan.length} chars)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
