package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary dev profiler — not part of the library
object Scratch {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"STEP $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (100L * 1024 * 1024).toString)
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.{Dedup, TextAnalysis}

    val docs = Core.table(spark, sfDir, "documents")
    time("warmup-read")(docs.count())

    // ---- canonicalize breakdown
    val pairs = time("jaccardPairs")(
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5, 1000))
    time("pairs-count")(pairs.count())
    val clusters = time("resolveClusters")(Dedup.resolveClusters(pairs))
    time("clusters-count")(clusters.count())
    time("canonicalize")(Dedup.canonicalize(docs, clusters, "doc_id").count())

    // ---- fingerprint
    time("fingerprint")(TextAnalysis.fingerprint(docs, "doc_id", "text").count())
    time("fingerprint2")(TextAnalysis.fingerprint(docs, "doc_id", "text").count())

    // ---- a12 summary
    val li = Core.table(spark, sfDir, "lineitem")
    time("li-count")(li.count())
    time("a12-summary")(graft.operators.Agg.summaryStats(
      li, Seq("l_quantity", "l_extendedprice", "l_discount")).count())
    time("one-exactPercentile")(graft.operators.Agg.exactPercentiles(
      li, "l_quantity", Seq(0.25, 0.5, 0.75)))

    // ---- minhash stage breakdown
    val sh = Dedup.shingles(docs, "doc_id", "text", 3).cache()
    time("sh-cache")(sh.count())
    val bands = Dedup.lshBands(Dedup.minhashSignature(sh, "doc_id", 16), "doc_id", 16, 4)
    time("bands")(bands.count())
    val ba = bands.select(col("doc_id").as("da"), col("band"), col("sig"))
    val bb = bands.select(col("doc_id").as("db"), col("band"), col("sig"))
    val cand = ba.join(bb, Seq("band", "sig")).filter(col("da") < col("db"))
      .select("da", "db").distinct()
    time("cand")(cand.count())
    time("cand-checkpoint")(cand.localCheckpoint())
    time("minhash-e2e")(Dedup.minhashDedup(docs, "doc_id", "text").count())
    sh.unpersist()

    // ---- m1 / kmeans
    time("m1-e2e")(SparkEntry.queries("m1_rf_train_predict")(spark, sfDir).count())
    time("ivf-kmeans-e2e")(SparkEntry.queries("simsearch_ivf_kmeans")(spark, sfDir).count())
    time("m3-isotonic-e2e")(SparkEntry.queries("m3_isotonic_bias")(spark, sfDir).count())

    spark.stop()
  }
}
