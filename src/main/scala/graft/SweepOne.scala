package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

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
  * driver-recorded q285 97.6 s vs 4.6 s judge-isolated; r12: q229
  * 18.2 s vs 1.53 s while the CPU canary read a healthy 1.2-1.3 —
  * the contention mode was invisible to a register loop). So each leg
  * carries THREE independent adjudication signals:
  *
  *  - `calib` — the fixed xorshift CPU canary ([[Calib.measure]]):
  *    sees CPU run-queue pressure;
  *  - `scanary` — the pinned mini-Spark canary ([[Calib.sparkCanary]]
  *    — parquet scan + shuffle + agg in THIS session): feels the IO
  *    path, page cache, memory bandwidth and scheduler the way the
  *    query does;
  *  - `run`/`cpu` — the query's OWN summed executor task run time and
  *    task CPU time for the winning pass, accumulated by a
  *    SparkListener and attributed exactly (listener bus flushed
  *    around each pass). run >> cpu is machine-readable starvation
  *    regardless of the contention mechanism, and an exponent fitted
  *    on cpu seconds is contention-invariant — task CPU seconds do
  *    not inflate when the task is descheduled or blocked.
  *
  * Protocol (stdout, one line each):
  *  - `SWEEPONE_START` as soon as main is entered — lets the parent
  *    distinguish "fork mechanism broken" (no START: fall back to
  *    in-process measurement) from "query crashed at some sf" (START
  *    but no RESULT: a real sweep error).
  *  - `SWEEPONE_RESULT {"times":[...],"calib":[...],"scanary":[...],
  *    "run":[...],"cpu":[...],"instr_warmup":N}` with one
  *    MIN-of-`passes` query time per dir, in dir order (noise is
  *    additive, so the minimum is the robust estimator — see the
  *    ts.min site below), the canary walls sampled right before that
  *    dir's passes, the min-wall pass's task run/cpu seconds, and the
  *    canary-warmup wall (instrumentation accounting — the parent
  *    sums it with the per-leg canary walls into
  *    `instrumentation_sec`); a crashed dir records -1 times (its
  *    canary samples stay — they already happened).
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
    // Task-time accumulator: every task's executorRunTime (ms) and
    // executorCpuTime (ns), summed process-wide. Snapshots around a
    // pass attribute deltas to it; ListenerFlush drains the async bus
    // before each snapshot so no event lands in the wrong window.
    val runMs = new AtomicLong(0L)
    val cpuNs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          cpuNs.addAndGet(m.executorCpuTime)
        }
      }
    })
    def flushBus(): Boolean =
      org.apache.spark.graftshim.ListenerFlush.flush(spark.sparkContext)
    val fn = SparkEntry.queries(name)
    // Warmup on the SMALLEST dir (Bench's own convention): a cold JVM
    // pays ~5 s of JIT/classloading on its first query execution,
    // which would otherwise land entirely on the first sweep leg and
    // deflate every fitted exponent. Both canaries need the same
    // treatment (first samples run ~1.5x until C2 compiles them; the
    // first sparkCanary call may also generate its dataset).
    try fn(spark, dirs.head).queryExecution.toRdd.count()
    catch { case _: Throwable => () }
    // canary-warmup wall is INSTRUMENTATION time, reported so the
    // parent can separate measurement overhead from query time in the
    // artifact (r13 verdict item 3: total_sec grew 151.7 -> 198.4
    // partly from per-leg canaries, indistinguishable from regression
    // without this split)
    val instrT0 = System.nanoTime()
    Calib.measure()
    // two spark-canary warmups: the first may generate the dataset,
    // and a single warmup still leaves the first leg's sample ~1.8x
    // the warmed floor (measured) — close enough to the 2.0 contended
    // line to matter
    try { Calib.sparkCanary(spark); Calib.sparkCanary(spark) }
    catch { case _: Throwable => () }
    val instrWarmup = (System.nanoTime() - instrT0) / 1e9
    def jnum(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    val calibs = Array.fill(dirs.size)(-1.0)
    val scanarys = Array.fill(dirs.size)(-1.0)
    val runs = Array.fill(dirs.size)(-1.0)
    val cpusSec = Array.fill(dirs.size)(-1.0)
    val times = dirs.zipWithIndex.map { case (d, i) =>
      val t = try {
        // smaller-sf legs still leave localCheckpoint blocks behind;
        // drop them so the sf1 leg starts clean even inside one JVM
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        System.gc()
        // contention canaries: sample the box state right before the
        // passes, AFTER the gc (a concurrent GC cycle would bleed
        // into the samples and read as false contention)
        calibs(i) = Calib.measure()
        scanarys(i) = try Calib.sparkCanary(spark)
          catch { case _: Throwable => -1.0 }
        // MIN over the passes, not median: timing noise is additive
        // (GC pause, page faults, JIT deopt), so the minimum is the
        // robust estimator of intrinsic cost — a single pass was
        // observed to swing 3x on a 7 s query even in a fresh JVM,
        // enough to push a legitimate exponent over the flag line.
        // Each pass's task run/cpu is snapshot-delta'd around it; the
        // min-WALL pass's profile is what gets reported (pairing a
        // wall time with another pass's task time would be
        // meaningless).
        val samples = (1 to passes).map { _ =>
          // a timed-out PRE-pass flush leaks the previous pass's
          // queued task-end events into this snapshot delta
          // (OVERcounts); a timed-out post-pass flush undercounts.
          // Either way the profile is unattributable — drop it
          // (missing beats mis-signed; see ListenerFlush).
          val preDrained = flushBus()
          val r0 = runMs.get(); val c0 = cpuNs.get()
          val t0 = System.nanoTime()
          fn(spark, d).queryExecution.toRdd.count()
          val wall = (System.nanoTime() - t0) / 1e9
          val postDrained = flushBus()
          if (preDrained && postDrained)
            (wall, (runMs.get() - r0) / 1e3, (cpuNs.get() - c0) / 1e9)
          else (wall, -1.0, -1.0)
        }
        val best = samples.minBy(_._1)
        runs(i) = best._2
        cpusSec(i) = best._3
        best._1
      } catch { case _: Throwable => -1.0 }
      // Per-leg emission (r14): a child DEATH at a later leg — the
      // 30-min watchdog kill or an OOM on a deep dir — must not erase
      // legs that already completed (q241's sf10 leg lost four healthy
      // legs this way). The parent assembles a partial row from these
      // lines whenever the final RESULT never arrives; the dead leg
      // stays -1, so the row still reads as a loud sweep error.
      println(s"""SWEEPONE_LEG {"i":$i,"t":${jnum(t)},""" +
        s""""calib":${jnum(calibs(i))},"scanary":${jnum(scanarys(i))},""" +
        s""""run":${jnum(runs(i))},"cpu":${jnum(cpusSec(i))}}""")
      t
    }
    println(s"""SWEEPONE_RESULT {"times":[${times.map(jnum).mkString(",")}],""" +
      s""""calib":[${calibs.map(jnum).mkString(",")}],""" +
      s""""scanary":[${scanarys.map(jnum).mkString(",")}],""" +
      s""""run":[${runs.map(jnum).mkString(",")}],""" +
      s""""cpu":[${cpusSec.map(jnum).mkString(",")}],""" +
      s""""instr_warmup":${jnum(instrWarmup)}}""")
    spark.stop()
  }
}
