package graft
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("explain", "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.001"))
    df.queryExecution.toRdd.count()
    val s = df.queryExecution.executedPlan.toString
    s.linesIterator.filter(l => l.contains("NestedLoop") || l.contains("Limit") || l.contains("Join")).foreach(println)
    println("---FULL---")
    println(s.take(9000))
    spark.stop()
  }
}
