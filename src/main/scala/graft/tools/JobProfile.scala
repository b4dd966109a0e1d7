package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import graft.{GraftSession, SparkEntry}

/** Dev utility for the optimization rounds: run a query once (after a
  * warmup pass) with a job listener attached and print every Spark
  * job's wall clock, so eager-materialization-heavy queries (the
  * localCheckpoint chains) show WHERE their seconds go — per-job, not
  * just end-to-end. `runMain graft.tools.JobProfile <query> [...]`. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <query>...")
    val spark = GraftSession.builder("job-profile",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.quietNoisyLoggers()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.map(_.name).distinct.mkString(" | ")
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse(site)
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          rows.add((je.jobId, (System.nanoTime() - t0) / 1e9, desc))
        }
      }
    })
    for (q <- args) {
      val fn = SparkEntry.queries(q)
      fn(spark, dir).queryExecution.toRdd.count() // warmup
      rows.clear()
      val t0 = System.nanoTime()
      fn(spark, dir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let listener events drain
      val sorted = rows.toArray(Array.empty[(Int, Double, String)])
        .sortBy(_._1)
      println(f"JOBPROFILE $q wall=$wall%.3f jobs=${sorted.length}")
      sorted.foreach { case (id, sec, desc) =>
        println(f"  job $id%4d $sec%7.3f  ${desc.take(110)}")
      }
    }
    spark.stop()
  }
}
