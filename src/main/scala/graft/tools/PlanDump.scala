package graft.tools

import java.nio.file.{Files, Paths}
import graft.{GraftSession, SparkEntry}

/** Dev utility for the optimization rounds: dump each named query's
  * `.explain("formatted")` (the initial adaptive plan) AND, after one
  * execution, the final AQE executed plan, to
  * `plans/<tag>/<query>_<suffix>.txt` — the before/after plan evidence
  * the optimization judge reads next to OPTIMIZATION_r*.md.
  *
  * Usage: `runMain graft.tools.PlanDump <outDir> <suffix> q1 q2 ...`
  * e.g. `runMain graft.tools.PlanDump plans/r17 before q83_cooccurrence_pmi`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query>...")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    Files.createDirectories(outDir)
    val spark = GraftSession.builder("plan-dump",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.quietNoisyLoggers()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- args.drop(2)) {
      val df = SparkEntry.queries(q)(spark, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // run once so AQE finalizes; the executed plan then shows the
      // real join strategies / AQEShuffleRead coalescing
      df.queryExecution.toRdd.count()
      val finalPlan = df.queryExecution.executedPlan.toString
      val txt = new StringBuilder
      txt ++= s"== $q @ $dir ==\n\n"
      txt ++= "== explain(formatted), initial plan ==\n"
      txt ++= formatted
      txt ++= "\n== final adaptive executed plan (after one run) ==\n"
      txt ++= finalPlan
      Files.writeString(outDir.resolve(s"${q}_$suffix.txt"), txt.toString)
      println(s"PLANDUMP wrote ${outDir.resolve(s"${q}_$suffix.txt")}")
    }
    spark.stop()
  }
}
