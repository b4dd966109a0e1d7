package graft

/** Child-process half of the bench scaling sweep: measure ONE query
  * across the sweep dirs in a FRESH JVM and print one tagged result
  * line for [[Bench]] to parse.
  *
  * Why a subprocess: the r9/r10 permanent artifacts both recorded
  * sweep times 4-48x above what an isolated JVM measures for the same
  * query (r9 q229 73 s vs 1.5 s; r10 q285 27.7 s vs 7.1 s) because the
  * sweep ran after the 285-query suite in the same JVM.
  * `dropAccumulatedState` reclaims Spark-level state (localCheckpoint
  * blocks, SQL cache) but evidently not the rest of the process
  * environment (tenured heap layout, JIT deopt state, malloc arenas).
  * A fresh JVM per sweep leg is the only measurement basis that
  * reproduces an isolated run BY CONSTRUCTION — the same harness the
  * judge's adjudication runs used.
  *
  * A fresh JVM is still not enough when the BOX is contended (r11:
  * driver-recorded q285 97.6 s vs 4.6 s judge-isolated, with every
  * control leg 3-20x inflated — the driver environment oversubscribed
  * the machine during the whole bench pass). So each leg also times
  * the fixed [[Calib]] CPU workload immediately before the query and
  * reports it: the parent turns that into a per-leg contention factor
  * the artifact carries, making a flagged-but-contended leg readable
  * without a judge adjudication run.
  *
  * Protocol (stdout, one line each):
  *  - `SWEEPONE_START` as soon as main is entered — lets the parent
  *    distinguish "fork mechanism broken" (no START: fall back to
  *    in-process measurement) from "query crashed at some sf" (START
  *    but no RESULT: a real sweep error).
  *  - `SWEEPONE_RESULT {"times":[...],"calib":[...]}` with one MIN-of-
  *    `passes` query time per dir, in dir order (noise is additive, so
  *    the minimum is the robust estimator — see the ts.min site
  *    below), and the calibration wall time sampled right before that
  *    dir's passes; a crashed dir records -1 (its calib sample stays —
  *    it already happened).
  *
  * Args: `<passes> <query> <dir1> <dir2> ...`.
  */
object SweepOne {
  def main(args: Array[String]): Unit = {
    println("SWEEPONE_START")
    val passes = args(0).toInt
    val name = args(1)
    val dirs = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder("graft-sweep-one", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    // Warmup on the SMALLEST dir (Bench's own convention): a cold JVM
    // pays ~5 s of JIT/classloading on its first query execution,
    // which would otherwise land entirely on the first sweep leg and
    // deflate every fitted exponent. The calib kernel needs the same
    // treatment (first sample runs ~1.5x until C2 compiles the loop).
    try fn(spark, dirs.head).queryExecution.toRdd.count()
    catch { case _: Throwable => () }
    Calib.measure()
    def jnum(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    val calibs = Array.fill(dirs.size)(-1.0)
    val times = dirs.zipWithIndex.map { case (d, i) =>
      try {
        // smaller-sf legs still leave localCheckpoint blocks behind;
        // drop them so the sf1 leg starts clean even inside one JVM
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        System.gc()
        // contention canary: sample the box state right before the
        // passes, AFTER the gc (a concurrent GC cycle would bleed
        // into the calib sample and read as false contention)
        calibs(i) = Calib.measure()
        // MIN over the passes, not median: timing noise is additive
        // (GC pause, page faults, JIT deopt), so the minimum is the
        // robust estimator of intrinsic cost — a single pass was
        // observed to swing 3x on a 7 s query even in a fresh JVM,
        // enough to push a legitimate exponent over the flag line
        val ts = (1 to passes).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, d).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }
        ts.min
      } catch { case _: Throwable => -1.0 }
    }
    println(s"""SWEEPONE_RESULT {"times":[${times.map(jnum).mkString(",")}],""" +
      s""""calib":[${calibs.map(jnum).mkString(",")}]}""")
    spark.stop()
  }
}
