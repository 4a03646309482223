package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.ansi.enabled","false")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = graft.core.Tables.documents(spark, "/root/testdata/sf0.1")
      .filter(col("doc_id") % 2 === 0)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $name%-22s ${(System.nanoTime()-t0)/1e9}%6.2fs n=$n")
    }
    t("hashEmbed"){ graft.text.TextOps.hashEmbedVectors(d, "doc_id", "text").count() }
    val vecs = graft.text.TextOps.hashEmbedVectors(d, "doc_id", "text")
      .withColumn("_blk", lit(0)).localCheckpoint()
    val planes = graft.sim.Similarity.bandPlanes(64, 12, 8, 11L)
    t("pairs"){ graft.sim.Similarity.bandedNearDupPairs(vecs, "doc_id", "embedding", "_blk", 0.92, planes).count() }
    val pairs = graft.sim.Similarity.bandedNearDupPairs(vecs, "doc_id", "embedding", "_blk", 0.92, planes)
      .select(col("id_a"), col("id_b")).localCheckpoint()
    t("pairs2"){ graft.sim.Similarity.bandedNearDupPairs(vecs, "doc_id", "embedding", "_blk", 0.92, planes).count() }
    t("cc"){ graft.text.Dedup.connectedComponents(pairs).count() }
    spark.stop()
  }
}
