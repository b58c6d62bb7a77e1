package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-JOB wall-clock census for selected queries — how many
  * Spark jobs a query schedules and where its time goes (orchestration vs
  * compute), the measurement NOTES_r13's hnsw work was based on. Run:
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.Profile <sfDir> <n1,n2,...>"`.
  * Each query runs twice; the second (warm) run is the one profiled.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names: Seq[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSeq
      else Seq("m21_poisson_bootstrap")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Core.harnessSession(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = Vector.empty[(Int, Long, String)] // id, start, desc
    @volatile var done = Vector.empty[(Int, Long)]
    // per-job stage census: (jobId -> seq of (stageName, nTasks, stageMs))
    @volatile var jobStages = Map.empty[Int, Vector[(String, Int, Long)]]
    @volatile var stageJob = Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs :+= ((j.jobId, j.time,
          Option(j.properties.getProperty("spark.job.description")).getOrElse("")))
        j.stageIds.foreach(sid => stageJob += (sid -> j.jobId))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        done :+= ((j.jobId, j.time))
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = (for (a <- i.completionTime; b <- i.submissionTime)
          yield a - b).getOrElse(-1L)
        val jid = stageJob.getOrElse(i.stageId, -1)
        jobStages += (jid -> (jobStages.getOrElse(jid, Vector.empty) :+
          ((i.name.takeWhile(_ != '\n').take(60), i.numTasks, ms))))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm: memo builds, codegen, file listing
      // drain the listener bus BEFORE resetting, so in-flight warm-run
      // events can't land in the profiled window (ADVICE r14: the fixed
      // sleep raced the bus, and stageJob was never reset — stale
      // stageId→jobId entries accumulated across queries). listenerBus is
      // private[spark]; reached via reflection because this is a dev-only
      // census tool (never in a query path), with the sleep kept as the
      // fallback if the internal API moves.
      scala.util.Try {
        val sc = spark.sparkContext
        val m = sc.getClass.getMethod("listenerBus")
        val bus = m.invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      }
      jobs = Vector.empty; done = Vector.empty; jobStages = Map.empty
      stageJob = Map.empty
      spark.sparkContext.setJobDescription(s"profile:$n")
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      val cnt = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val gcD = (gcMillis() - gc0) / 1e3
      println(f"[profile] $n gc=$gcD%5.2f s")
      spark.sparkContext.setJobDescription(null)
      Thread.sleep(300)
      val ends = done.toMap
      // listener times are epoch MILLIS; span in seconds
      val spans = jobs.flatMap { case (id, st, _) =>
        ends.get(id).map(e => (id, (e - st) / 1e3))
      }
      val jobSum = spans.map(_._2).sum
      println(f"[profile] $n%-32s wall=$wall%6.2f s  jobs=${spans.size}%3d  " +
        f"jobSum=$jobSum%6.2f s  rows=$cnt")
      spans.sortBy(-_._2).take(12).foreach { case (id, s) =>
        val st = jobStages.getOrElse(id, Vector.empty)
          .sortBy(-_._3).take(3)
          .map { case (nm, nt, ms) => s"$nm tasks=$nt ${ms}ms" }
          .mkString(" | ")
        println(f"[profile]    job $id%4d  $s%7.3f s   $st")
      }
    }
    spark.stop()
  }
}
