package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-bench", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup pass: JIT-compile the interpreted-expression and codegen
    // paths and fault in the parquet footers/pages, so the timed pass
    // measures query execution rather than JVM cold start.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // Median of >=3 timed passes per query: a single timed pass swings
    // up to 17x round-over-round on identical plans (GC, page cache,
    // thread scheduling), which is far above the 2x regression signal
    // the numbers exist to detect.
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Plan-shape audit at the BENCH sf, not just PlanLintSpec's
    // sf0.001: AQE may broadcast at tiny scale what it must shuffle
    // here, so re-audit the most expensive queries' FINAL adaptive
    // plans for the unbounded-shuffle shape that dies at 100 TB.
    val audit = results.toSeq.sortBy(-_._2).take(3).map { case (name, _) =>
      val verdict =
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          // execute through THIS DataFrame's QueryExecution —
          // df.count() would plan a separate aggregate query and leave
          // df's adaptive plan unfinalized (isFinalPlan=false, initial
          // static plan), defeating the audit's purpose
          df.queryExecution.toRdd.count()
          val plan = df.queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct")) "CartesianProduct" else "ok"
        } catch { case e: Throwable => s"error:${e.getClass.getSimpleName}" }
      s"\"" + name + "\":\"" + verdict + "\""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"plan_audit":$audit,"sf":"$sfDir"}""")
    spark.stop()
  }
}
