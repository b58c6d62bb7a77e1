package graft
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def t[A](tag: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"[probe] $tag: ${(System.nanoTime()-s)/1e9}%.2f s"); r
    }
    val emb = Core.table(spark, "/root/testdata/sf0.1", "embeddings")
    val g = t("gram + checkpoint") { graft.ml.Pca.gram(emb, "embedding", 64).localCheckpoint() }
    t("powerIteration on prebuilt gram") {
      graft.ml.Pca.powerIteration(g, 64, 6).collect()
    }
    t("full topComponent (gram again + iterate)") {
      graft.ml.Pca.topComponent(emb, "embedding", 64, 6).collect()
    }
    spark.stop()
  }
}
