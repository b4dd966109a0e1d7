package graft.tools

/** Standalone runner for the skew tier's row-identity gate
  * ([[graft.SkewTier.identityChecks]]): every salted / census-capped
  * path compared against its direct twin on Zipf-skewed data, outside
  * the full bench. Exists so the oracle kill-test
  * (`tools/killtest.py`) can prove THIS gate machinery reads RED
  * under a single-point engine mutation — `Skew.saltedJoin` is
  * exercised by no q-number (the identity check is its only driver
  * gate), so without this runner a saltedJoin defect would be
  * invisible to the kill-test harness.
  *
  * Usage: `runMain graft.tools.SkewIdentity <dir> [sf]` — `dir` is a
  * GenSf-generated SKEW directory; if incomplete it is (re)generated
  * at `sf` (default 0.01, the kill-test scale) with `skew = true`.
  * Completeness probes the LAST-written table's `_SUCCESS` marker
  * (`embeddings.parquet/_SUCCESS` — Bench.genComplete's rule, r15
  * ADVICE): a generation killed mid-run must look ABSENT, not
  * half-present, or every later run errors on the partial tables and
  * the skew_identity kill-test gate reads RED regardless of the
  * mutation — a vacuous KILLED verdict. GenSf overwrites per-table,
  * so regenerating over a partial dir is safe.
  * Prints one `SKEWID <check> <verdict>`
  * line per check plus `SKEWID_SUMMARY`; exits nonzero on any
  * mismatch. Dev/evidence tooling — the library never depends on it.
  */
object SkewIdentity {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SkewIdentity <dir> [sf]")
    val dir = args(0)
    val sf = args.lift(1).map(_.toDouble).getOrElse(0.01)
    val spark = graft.GraftSession.builder("skew-identity", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def complete = new java.io.File(
      dir, "embeddings.parquet/_SUCCESS").exists()
    if (!complete) {
      println(s"[skewid] (re)generating skew sf=$sf at $dir")
      GenSf.generate(spark, dir, sf, skew = true)
    }
    require(complete, s"skew generation incomplete at $dir")
    val checks = graft.SkewTier.identityChecks(spark, dir)
    checks.foreach { case (k, v) => println(s"SKEWID $k $v") }
    val ok = checks.forall(_._2.startsWith("ok"))
    println(s"""SKEWID_SUMMARY {"dir":"$dir","ok":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
