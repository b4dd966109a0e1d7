package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev utility for the optimization rounds: construct every declared
  * query's DataFrame (checkpoints execute eagerly — run at sf0.01) and
  * print how many parquet scans / exchanges its UNEXECUTED physical
  * plan holds. High scan counts flag upstream-lineage replay (the same
  * base table re-read once per consumer) — the §2.4 remove-passes
  * checklist, generated instead of hand-audited.
  * `runMain graft.tools.ScanCensus [minScans]` */
object ScanCensus {
  def main(args: Array[String]): Unit = {
    val minScans = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.builder("scan-census",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.quietNoisyLoggers()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (q, fn) =>
      scala.util.Try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode)
        val scans = "Scan parquet".r.findAllIn(plan).size
        val exch = "Exchange".r.findAllIn(plan).size
        (q, scans, exch)
      }.toOption.orElse { println(s"SCANCENSUS $q ERROR"); None }
    }
    rows.filter(_._2 >= minScans).sortBy(-_._2).foreach { case (q, s, e) =>
      println(s"SCANCENSUS $q scans=$s exchanges=$e")
    }
    println(s"SCANCENSUS done n=${rows.size}")
    spark.stop()
  }
}
