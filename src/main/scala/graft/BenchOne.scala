package graft

/** Dev utility: median-of-3 timing for specific queries at sf0.1
  * (`runMain graft.BenchOne q99_duplicate_spans ...`) — per-query
  * iteration without the full Bench sweep. A `--dir=<path>` arg
  * retargets the data dir (skew-tier iteration). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("bench-one", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.collectFirst {
      case a if a.startsWith("--dir=") => a.stripPrefix("--dir=")
    }.getOrElse("/root/testdata/sf0.1")
    for (q <- args.filterNot(_.startsWith("--"))) {
      val fn = SparkEntry.queries(q)
      fn(spark, dir).count() // warmup
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"BENCHONE $q median=${times(1)}%.3f")
    }
    spark.stop()
  }
}
