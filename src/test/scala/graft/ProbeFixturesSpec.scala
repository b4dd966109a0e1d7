package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Structure locks for the driver-gate probe fixtures whose
  * kill-power depends on properties of the CURRENT minhash
  * parameters (n=3 shingles, k=8 hashes, 4×2 bands) rather than on
  * the fixture rows alone. If k/bands/hash constants change, q23's
  * band probe could stop separating band widths and q42's chain
  * probe could stop forming a path — both SILENTLY, because the
  * oracle mirrors the banding, so the driver compare would stay
  * green while the corresponding kill-test mutations
  * (lsh_band_rows, cc_converge_early) quietly lost their gates.
  * These tests fail loudly instead: a parameter change must
  * re-derive the fixtures (the search recipe is in NOTES_r14 §1). */
class ProbeFixturesSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("q42 chain probe: pair graph is exactly the 5-edge path") {
    val pairs = Dedup
      .minhashLshPairs(SparkEntry.ccChainProbe.toDF("doc_id", "text"),
        n = 3, k = 8, bands = 4, threshold = 0.2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val path = (0 until 5).map(i => (9000000021L + i, 9000000022L + i)).toSet
    assert(pairs === path,
      "chain probe no longer forms a 5-edge path under the current " +
        "minhash params — re-derive the salt seed (NOTES_r14 §1 hole 8) " +
        "or q42's multi-round CC gate is disarmed")
  }

  test("q42 chain probe: CC resolves every node to the chain minimum") {
    val pairs = Dedup.minhashLshPairs(
      SparkEntry.ccChainProbe.toDF("doc_id", "text"),
      n = 3, k = 8, bands = 4, threshold = 0.2)
    val labels = Dedup.connectedComponents(pairs)
      .select("doc_id", "component").as[(Long, Long)].collect().toMap
    assert(labels.size === 6)
    labels.foreach { case (id, comp) =>
      assert(comp === 9000000021L, s"node $id")
    }
  }

  test("q23 band probe: signatures agree at entries 2 and 5 only") {
    val sigs = SparkEntry.bandProbeDocs.toDF("doc_id", "text")
      .select(col("doc_id"),
        TextFunctions.minhashSignature(col("text"), 3, 8).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val a = sigs(9000000011L)
    val b = sigs(9000000012L)
    val agree = (0 until 8).filter(i => a(i) == b(i)).toSet
    assert(agree === Set(2, 5),
      "band probe signature agreement moved off entries {2, 5} — with " +
        "aligned 2-entry bands the pair must never share a full band " +
        "while ANY 1-entry banding co-buckets it; re-derive the texts " +
        "(NOTES_r14 §1 hole 7) or the lsh_band_rows gate is disarmed")
  }

  test("q23 band probe: jaccard passes verify but banding excludes the pair") {
    val sh = SparkEntry.bandProbeDocs.toDF("doc_id", "text")
      .select(col("doc_id"), array_distinct(TextFunctions.shinglesFromWords(
        TextFunctions.words(col("text")), 3)).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val a = sh(9000000011L).toSet
    val b = sh(9000000012L).toSet
    val jac = a.intersect(b).size.toDouble / a.union(b).size
    assert(jac >= 0.2, s"probe jaccard $jac fell below the verify cut — " +
      "the 1-entry-band candidate would be filtered and the mutation " +
      "would survive")
    val emitted = Dedup.minhashLshPairs(
      SparkEntry.bandProbeDocs.toDF("doc_id", "text"),
      n = 3, k = 8, bands = 4, threshold = 0.2).count()
    assert(emitted === 0L,
      "correct 2-entry banding now co-buckets the probe pair — the " +
        "band-width gate no longer separates 1-entry from 2-entry bands")
  }

  test("probe texts are plain [a-z0-9 ] words (oracle SQL literal safety)") {
    // q42's oracle interpolates these into a VALUES list (quotes are
    // escaped there too, belt-and-braces); keeping the texts
    // punctuation-free means every such interpolation is trivially a
    // valid SQL string literal (r14 ADVICE)
    (SparkEntry.ccChainProbe ++ SparkEntry.bandProbeDocs).foreach {
      case (id, t) =>
        assert(t.matches("[a-z0-9 ]+"),
          s"probe doc $id text contains characters outside [a-z0-9 ] — " +
            "re-check every oracle-side interpolation of probe texts")
    }
  }

  test("probe ids sit above every generated corpus id (9e9 headroom)") {
    // Probe rows live at ids 9000000001+ on the assumption that no
    // corpus doc_id/vec_id ever reaches them. The generators emit
    // spark.range ids (doc_id < 50000·sf, vec_id < 20000·sf), so the
    // assumption fails only past sf ≈ 180000 — but nothing ENFORCED it
    // (r14 ADVICE). Assert it against every materialized dataset so a
    // future sf increase fails loudly here instead of flaking the
    // driver compare with colliding probe ids.
    val dirs = Seq("/root/testdata", "benchdata", "benchdata/skew")
      .flatMap { root =>
        val d = new java.io.File(root)
        if (d.isDirectory)
          d.listFiles.toSeq.filter(f => f.isDirectory &&
            f.getName.startsWith("sf")).map(_.getPath)
        else Nil
      }
    assert(dirs.nonEmpty, "no testdata dirs found to check")
    dirs.foreach { dir =>
      Seq("documents" -> "doc_id", "embeddings" -> "vec_id").foreach {
        case (table, idCol) =>
          val p = s"$dir/$table.parquet"
          if (new java.io.File(p).exists) {
            val mx = spark.read.parquet(p).agg(max(col(idCol)))
              .head.getLong(0)
            assert(mx < 9000000000L,
              s"$p max $idCol = $mx collides with the probe id range " +
                "(9000000001+) — move the probes or cap the generator")
          }
      }
    }
  }
}
