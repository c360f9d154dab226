package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev scratch (round 16): per-Spark-job wall breakdown of one query —
  * where inside a lifecycle gate the seconds actually go. Not API.
  *
  * Usage: runMain graft.tools.ProfileJobs16 <sfDir> <query[,query...]> [reps]
  * Prints one line per job (duration, #tasks, description/callsite) plus
  * the closure-build vs count split, to /tmp/profile_jobs.out.
  */
object ProfileJobs16 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.Sessions.local("profilejobs16", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val out = new java.io.PrintWriter("/tmp/profile_jobs.out")

    case class Job(id: Int, t0: Long, var t1: Long = -1L,
      var tasks: Int = 0, desc: String)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs(e.jobId) = Job(e.jobId, e.time,
          tasks = e.stageInfos.map(_.numTasks).sum, desc = d)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      }
    })

    for (q <- qname.split(',').toSeq; rep <- 1 to reps) {
      val fn = graft.SparkEntry.queries(q)
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = System.nanoTime()
      val n = df.count()
      val tCount = System.nanoTime()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      out.println(f"== $q rep$rep rows=$n build=${(tBuild - t0) / 1e9}%.3f s count=${(tCount - tBuild) / 1e9}%.3f s total=${(tCount - t0) / 1e9}%.3f s")
      jobs.synchronized {
        val js = jobs.values.toSeq
        val totalJob = js.filter(_.t1 > 0).map(j => j.t1 - j.t0).sum
        out.println(f"   jobs=${js.size} sum_job_wall=${totalJob / 1e3}%.3f s")
        js.foreach { j =>
          val dur = if (j.t1 > 0) (j.t1 - j.t0) / 1e3 else -1.0
          out.println(f"   job ${j.id}%4d ${dur}%8.3f s tasks=${j.tasks}%4d  ${j.desc.take(140)}")
        }
      }
      out.flush()
    }
    out.close()
    spark.stop()
  }
}
