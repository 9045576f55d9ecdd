package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

import graft.SparkEntry

/** Dev profiling main: run named queries and report where the wall time
  * goes — per-Spark-job wall segments (with stage/task counts and
  * shuffle bytes) plus the driver-side gaps between jobs (planning,
  * analysis, checkpoint bookkeeping). This is the §1 "measure first"
  * harness for the optimization rounds: per-query seconds come from the
  * bench; THIS tool answers "which jobs inside the query cost what".
  *
  * Usage: runMain graft.tools.ProfileQuery <sfDir> <q_a,q_b,...> [reps]
  * (cpus via SPARK_GRAFT_CPUS, default 32 — match the bench shape).
  */
object ProfileQuery {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(cpus)
      .master(s"local[$cpus]")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class Job(id: Int, t0: Long, var t1: Long = 0L,
                   var stages: Int = 0, var tasks: Int = 0,
                   var shuffleRead: Long = 0L, var shuffleWrite: Long = 0L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.put(e.jobId, Job(e.jobId, System.nanoTime(),
          stages = e.stageInfos.size,
          tasks = e.stageInfos.map(_.numTasks).sum))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach(_.t1 = System.nanoTime())
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        // attribute to the most recent unfinished job (local mode: jobs
        // run sequentially within one query)
        val m = e.stageInfo.taskMetrics
        if (m != null && !order.isEmpty) {
          var i = order.size() - 1
          while (i >= 0 && jobs.get(order.get(i)).t1 != 0L) i -= 1
          if (i >= 0) {
            val j = jobs.get(order.get(i))
            j.shuffleRead += m.shuffleReadMetrics.totalBytesRead
            j.shuffleWrite += m.shuffleWriteMetrics.bytesWritten
          }
        }
      }
    })

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to reps).foreach { r =>
        jobs.clear(); order.clear()
        spark.sparkContext.setJobDescription(s"$n rep$r")
        val w0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - w0) / 1e9
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        // per-job segments in start order, plus inter-job driver gaps
        val js = {
          import scala.jdk.CollectionConverters._
          order.asScala.map(jobs.get).toSeq
        }
        val jobSum = js.map(j => (j.t1 - j.t0) / 1e9).sum
        println(f"== $n rep$r wall=$wall%.3f s, ${js.size} jobs " +
          f"(sum ${jobSum}%.3f s, driver gaps ${wall - jobSum}%.3f s)")
        var prevEnd = 0L
        js.foreach { j =>
          val gap = if (prevEnd == 0L) 0.0 else (j.t0 - prevEnd) / 1e9
          prevEnd = j.t1
          println(f"   job ${j.id}%3d  ${(j.t1 - j.t0) / 1e9}%7.3f s  " +
            f"stages=${j.stages}%2d tasks=${j.tasks}%4d  " +
            f"shufR=${j.shuffleRead / 1024}%8d KB shufW=${j.shuffleWrite / 1024}%8d KB" +
            (if (gap > 0.05) f"   [gap before: $gap%.3f s]" else ""))
        }
      }
    }
    spark.stop()
  }
}
