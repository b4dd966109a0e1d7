package graft

import org.scalatest.funsuite.AnyFunSuite

/** The compact driver-capture line's size bound.
  *
  * The driver records only the FINAL 2000 chars of the bench's output
  * and json-parses the tail, so [[Bench.compactLine]] must stay under
  * [[Bench.CompactMaxChars]] (< 2000 with margin) no matter how many
  * names pile into the flag/skip arrays — r16 proved the failure mode
  * is real: the full artifact line (~14 KB) never once survived the
  * capture window across 16 rounds of BENCH_r*.json.
  */
class BenchEmitSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  // 40-char names: longer than any real query name (corpus max is 30)
  // and any budget_skipped/retry entry ("sweep:" / "!splice" ≤ ~37)
  private def names(n: Int): List[String] =
    (1 to n).map(i => (s"q${i}_" + "x" * 40).take(40)).toList

  private def maxed(phase: String): Bench.Summary = Bench.Summary(
    phase = phase, round = 9999, sf = "/root/testdata/sf0.1",
    errors = 294, auditFlags = 294, sweepRan = true, sweepFlags = 99,
    sweepContended = 99, sweepStarved = 99, sweepErrors = 99,
    flagged = names(25), contended = names(25), starved = names(25),
    errorQ = names(25), calibStale = true, boxFactor = 99.99,
    skewRan = true, skewFlags = 99, skewErrors = 99,
    skewIdentityFails = 99, skewFlagged = names(25),
    skewStraggler = names(25), skewSensitive = names(25),
    skewErrorQ = names(25), budgetSec = 99999.0, elapsedSec = 99999.9,
    budgetSkipped = names(50), retrySkipped = names(50),
    instrumentationSec = 9999.9, totalSec = 99999.123456789,
    nQueries = 294,
    results = (1 to 294).map(i => ((s"q${i}_" + "x" * 40).take(40),
      12345.678901 + i)))

  test("compactLine stays under CompactMaxChars with every array " +
      "maxed out, and is valid one-line JSON") {
    val line = Bench.compactLine(maxed("final"))
    assert(line.length < Bench.CompactMaxChars, s"len=${line.length}")
    assert(!line.contains("\n"))
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() === "summary")
    assert(node.get("phase").asText() === "final")
    assert(node.get("n_queries").asInt() === 294)
    // greedy fill: even with every array maxed out, at least the
    // CompactSlowest floor of per-query timings still fits
    assert(node.get("slowest").size() >= Bench.CompactSlowest)
    // capped arrays collapse to CompactNames + a "+N more" marker
    assert(node.get("flagged").size() === Bench.CompactNames + 1)
    assert(node.get("budget_skipped").size() === Bench.CompactNames + 1)
  }

  test("compactLine with the real corpus's own longest query names " +
      "keeps the bound (the production shape, not a synthetic one)") {
    val qnames = SparkEntry.queries.keys.toList.sortBy(-_.length)
    val line = Bench.compactLine(maxed("skew").copy(
      flagged = qnames.take(25),
      budgetSkipped = qnames.take(50).map("sweep:" + _),
      retrySkipped = qnames.take(25).map(_ + "!splice"),
      results = SparkEntry.queries.keys.toSeq.map(n => (n, 1234.567))))
    assert(line.length < Bench.CompactMaxChars, s"len=${line.length}")
    assert(mapper.readTree(line).get("metric").asText() === "summary")
  }

  test("compactLine greedy fill: a clean run's empty arrays buy room " +
      "for far more than the floor of per-query timings") {
    val clean = maxed("final").copy(
      errors = 0, auditFlags = 0, sweepFlags = 0, sweepContended = 0,
      sweepStarved = 0, sweepErrors = 0, flagged = Nil, contended = Nil,
      starved = Nil, errorQ = Nil, skewFlagged = Nil, skewStraggler = Nil,
      skewSensitive = Nil, skewErrorQ = Nil, budgetSkipped = Nil,
      retrySkipped = Nil,
      results = SparkEntry.queries.keys.toSeq.map(n => (n, 1234.567)))
    val line = Bench.compactLine(clean)
    assert(line.length < Bench.CompactMaxChars, s"len=${line.length}")
    val node = mapper.readTree(line)
    assert(node.get("slowest").size() >= 25,
      s"greedy fill only carried ${node.get("slowest").size()} entries")
  }

  test("suitePasses: full passes under the degrade line, 1 pass past " +
      "it, skip past the full budget (r17 verdict item 1)") {
    val b = 2700.0
    assert(Bench.suitePasses(0.0, b, 3) === 3)
    assert(Bench.suitePasses(b * Bench.DegradeBudgetFrac - 1, b, 3) === 3)
    assert(Bench.suitePasses(b * Bench.DegradeBudgetFrac + 1, b, 3) === 1)
    assert(Bench.suitePasses(b - 1, b, 3) === 1)
    assert(Bench.suitePasses(b + 1, b, 3) === 0)
    // a 1-pass run never degrades below 1 before the hard budget
    assert(Bench.suitePasses(b * 0.7, b, 1) === 1)
  }

  test("compactLine empty-state skeleton (the start emission) parses") {
    val s = Bench.Summary("start", 17, "/root/testdata/sf0.1",
      0, 0, false, 0, 0, 0, 0, Nil, Nil, Nil, Nil, false, 1.0,
      false, 0, 0, 0, Nil, Nil, Nil, Nil, 2700.0, 0.1, Nil, Nil,
      0.0, 0.0, 0, Nil)
    val line = Bench.compactLine(s)
    val node = mapper.readTree(line)
    assert(node.get("phase").asText() === "start")
    assert(node.get("slowest").size() === 0)
    assert(line.length < Bench.CompactMaxChars)
  }
}
