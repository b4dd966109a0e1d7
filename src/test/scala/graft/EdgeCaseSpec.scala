package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{FeatureDef, FeatureGroupDef, FeatureType}
import graft.functions.{Similarity, TextFunctions}
import graft.operators.{Dedup, FeatureStore, InteractionStore, SimilaritySearch, Training}

/** Degenerate-input hardening: every operator must behave on empty
  * inputs, empty strings and zero vectors — the shapes a 100 TB
  * pipeline inevitably feeds it. */
class EdgeCaseSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val fg = FeatureGroupDef("f", 1, Seq(
    FeatureDef("v", FeatureType.FP64, default = -1.0)))

  test("retrieve with an empty key set returns no rows") {
    val table = Seq((1L, 10.0)).toDF("k", "v")
    val keys = Seq.empty[Long].toDF("k")
    assert(FeatureStore.retrieve(keys, table, Seq("k"), fg, Seq("v")).count() === 0)
  }

  test("retrieve against an empty table yields all defaults") {
    val table = Seq.empty[(Long, Double)].toDF("k", "v")
    val out = FeatureStore.retrieve(Seq(1L, 2L).toDF("k"), table,
      Seq("k"), fg, Seq("v")).orderBy("k").as[(Long, Double)].collect()
    assert(out === Array((1L, -1.0), (2L, -1.0)))
  }

  test("mergeCap and retention on an empty event set") {
    val empty = Seq.empty[(Long, java.sql.Timestamp, Long)]
      .toDF("user_id", "ts", "event_id")
    assert(InteractionStore.mergeCap(empty, cap = 5).count() === 0)
    assert(InteractionStore.retention(empty, horizonWeeks = 2).count() === 0)
  }

  test("connectedComponents on an empty pair list") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() === 0)
  }

  test("similarity on zero vectors: cosine null-safe via int8 scale guard") {
    val zero = Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    // int8 scale of the zero vector is 1.0 (codes all zero), not 0/NaN
    val (s, c) = zero.select(Similarity.int8Scale($"embedding").as("s"),
        Similarity.int8Codes($"embedding", Similarity.int8Scale($"embedding")).as("c"))
      .as[(Double, Seq[Byte])].head()
    assert(s === 1.0 && c === Seq(0.toByte, 0.toByte))
    // dot with itself is 0; cosine divides by zero norm → NaN stays NaN
    val d = zero.select(Similarity.dot($"embedding", $"embedding")).as[Double].head()
    assert(d === 0.0)
  }

  test("text functions on empty and whitespace-only strings") {
    val df = Seq("", "   ", "\t\n").toDF("text")
    val rows = df.select(
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.langId($"text").as("l"),
      size(TextFunctions.winnowFingerprint($"text", 8, 4)).as("w"))
      .as[(Int, String, Int)].collect()
    rows.foreach { case (n, l, w) =>
      assert(n <= 1)        // split of "" yields [""]
      assert(l === "und")
      assert(w === 1)       // one short-gram fingerprint, never a crash
    }
  }

  test("topK with k larger than the corpus returns the whole corpus ranked") {
    val corpus = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val queries = Seq((9L, Seq(1.0, 1.0))).toDF("query_id", "query_embedding")
    assert(SimilaritySearch.topK(corpus, queries, k = 100).count() === 2)
  }

  test("saltedJoin equals the plain join, spreads the hot key") {
    import graft.operators.Skew
    val big = (1L to 2000L).map(i => (if (i % 10 == 0) 1L else i, i))
      .toDF("k", "payload") // key 1 is hot (~10% of rows)
    val small = Seq((1L, "hot"), (2L, "a"), (500L, "b")).toDF("k", "tag")
    val salted = Skew.saltedJoin(big, small, Seq("k"), col("payload"), salt = 8)
    val plain = big.join(small, "k")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() === plain.count())
  }

  test("cappedFanJoin equals the plain join — multiset-exact, hot and " +
      "cold keys, duplicate rows (the shared sub-split kernel)") {
    import graft.operators.Skew
    // split side: key 1 hot (600 rows), keys 2/3 cold (under the cap);
    // a duplicated row checks multiset semantics survive the salting
    val split = ((1L to 600L).map(i => (1L, i)) ++
      (1L to 20L).map(i => (2L, 1000L + i)) ++
      Seq((3L, 7L), (3L, 7L))).toDF("k", "sid")
    val fan = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (9L, "e"))
      .toDF("k", "tag") // key 9 has no split rows: must vanish
    val capped = Skew.cappedFanJoin(fan, split, Seq("k"),
      Seq(col("sid")), maxPerTask = 64)
    val plain = fan.join(split, Seq("k"))
    assert(capped.exceptAll(plain).isEmpty && plain.exceptAll(capped).isEmpty)
    assert(capped.count() === plain.count())
    // cold keys keep fan width 1 (ceil(20/64)=ceil(2/64)=1) — the
    // kernel's census rule, asserted on the rule itself
    assert(Seq(20L, 2L, 600L).map(n => (n + 63L) / 64L) === Seq(1L, 1L, 10L))
  }

  test("intervalJoin equals the naive range join (banding is exact)") {
    val rnd = new scala.util.Random(7)
    def t(off: Long) = new java.sql.Timestamp(1704067200000L + off)
    val left = (1 to 200).map(i =>
      (i.toLong % 5, i.toLong, t(rnd.nextInt(30) * 86400000L + rnd.nextInt(1000) * 1000L)))
      .toDF("k", "lid", "lts")
    val right = (1 to 200).map(i =>
      (i.toLong % 5, 1000L + i, t(rnd.nextInt(30) * 86400000L + rnd.nextInt(1000) * 1000L)))
      .toDF("k", "rid", "rts")
    val banded = InteractionStore.intervalJoin(left, right, Seq("k"),
        horizon = "3 days", leftTs = "lts", rightTs = "rts")
      .select("lid", "rid")
    val naive = left.join(right, "k")
      .filter($"rts".between($"lts", $"lts" + expr("INTERVAL 3 DAYS")))
      .select("lid", "rid")
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty)
    assert(banded.count() === naive.count())
  }

  test("sessionize equals a naive per-user scan on random data") {
    val rnd = new scala.util.Random(13)
    val events = (1 to 400).map(i => (rnd.nextInt(6).toLong, i.toLong,
        new java.sql.Timestamp(1704067200000L + rnd.nextInt(30) * 86400000L +
          rnd.nextInt(86400) * 1000L)))
      .toDF("user_id", "event_id", "ts")
    val gapMs = 3L * 86400000L
    val got = InteractionStore.sessionize(events, gap = "3 days")
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    events.as[(Long, Long, java.sql.Timestamp)].collect()
      .groupBy(_._1).foreach { case (_, es) =>
        var last = Long.MinValue
        var idx = 0L
        es.sortBy(e => (e._3.getTime, e._2)).foreach { case (_, eid, t) =>
          if (last == Long.MinValue || t.getTime > last + gapMs) idx += 1
          last = t.getTime
          assert(got(eid) === idx, s"event $eid")
        }
      }
  }

  test("pointInTime with empty history: all labels null-valued") {
    val history = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "ts", "value")
    val labels = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 5L))
      .toDF("user_id", "ts", "label_id")
    val out = Training.pointInTime(labels, history, Seq("user_id"), "ts", "value")
      .collect()
    assert(out.length === 1 && out(0).isNullAt(3))
  }

  test("repetition signals: tie-break, one-word doc, full repetition") {
    val docs = Seq(
      (1L, "a b a b a"),     // top bigram "a b" x2 ("b a" also 2 -> larger gram wins? "b a" > "a b")
      (2L, "hello"),         // single word: bigram list = [hello]
      (3L, "x x x x"))       // all duplicate words
      .toDF("doc_id", "text")
    val base = docs.select(col("doc_id"), TextFunctions.words(col("text")).as("w"))
      .select(col("doc_id"), col("w"),
        TextFunctions.shinglesFromWords(col("w"), 2).as("bg"))
      .select(col("doc_id"), col("w"), TextFunctions.topGram(col("bg")).as("t"))
      .select(col("doc_id"),
        TextFunctions.repetitionFeatures(col("w"), col("t")).as("r"))
      .select(col("doc_id"), col("r.*"))
      .orderBy("doc_id").collect()
    // doc 1: bigrams [a b, b a, a b, b a] -> both x2, tie -> "b a" (lexicographically larger)
    assert(base(0).getAs[String]("top_bigram") === "b a")
    assert(base(0).getAs[Long]("top_bigram_cnt") === 2L)
    assert(base(0).getAs[Double]("dup_word_frac") === 0.6)
    // doc 2: degenerate single-word bigram = the word itself, full char coverage
    assert(base(1).getAs[String]("top_bigram") === "hello")
    assert(base(1).getAs[Double]("top_bigram_char_frac") === 1.0)
    assert(base(1).getAs[Double]("dup_word_frac") === 0.0)
    // doc 3: 4 words, 1 distinct
    assert(base(2).getAs[Double]("dup_word_frac") === 0.75)
    assert(base(2).getAs[String]("top_bigram") === "x x")
    assert(base(2).getAs[Long]("top_bigram_cnt") === 3L)
  }

  test("duplicateSpans/dedupeParagraphs on empty and degenerate corpora") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(empty, l = 5).count() === 0)
    assert(Dedup.dedupeParagraphs(empty).count() === 0)
    // empty-string docs: both collapse to one empty paragraph, dedup
    // keeps the first doc's; no duplicate spans (0 tokens < l)
    val blank = Seq((1L, ""), (2L, "")).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(blank, l = 5).count() === 0)
    val paras = Dedup.dedupeParagraphs(blank, paraTokens = 2)
      .select($"doc_id", $"n_kept").as[(Long, Long)].collect().toSet
    assert(paras === Set((1L, 1L)))
  }

  test("round-11 episodic operators on empty and single-row inputs") {
    import graft.operators.{EpisodeGraph, Pipeline}
    val emptyEntries = Seq.empty[(Long, Long, String, Seq[Double])]
      .toDF("entry_id", "ts", "state", "embedding")
    assert(EpisodeGraph.detectEpisodes(emptyEntries).count() === 0L)
    // a single entry is one episode (no pair, no boundary)
    val one = Seq((1L, 10L, "a", Seq(1.0, 0.0)))
      .toDF("entry_id", "ts", "state", "embedding")
    val ep = EpisodeGraph.detectEpisodes(one).collect()
    assert(ep.length === 1 && ep.head.getLong(5) === 1L)
    // mergeFacts: empty in, empty out; one fact leads itself
    val emptyFacts = Seq.empty[(Long, Seq[Double])]
      .toDF("fact_id", "embedding")
    assert(EpisodeGraph.mergeFacts(emptyFacts).count() === 0L)
    val oneFact = EpisodeGraph.mergeFacts(
      Seq((7L, Seq(1.0, 0.0))).toDF("fact_id", "embedding")).collect()
    assert(oneFact.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSeq === Seq((7L, 7L, true)))
    // buildNarrative / preferStateApplicable on empty slates
    val emptySlate = Seq.empty[(Long, Int, Long, String, String, String)]
      .toDF("q", "rank", "id", "summary", "state", "outcome")
    assert(Pipeline.buildNarrative(emptySlate, Seq("q"), "id", "rank",
      "summary", "state", "outcome").count() === 0L)
    val emptyFactPool = Seq.empty[(String, Long, Double, Seq[String], String)]
      .toDF("q", "fact_id", "score", "app", "cur")
    assert(Pipeline.preferStateApplicable(emptyFactPool, Seq("q"),
      "fact_id", "score", "app", "cur", k = 3).count() === 0L)
  }

  test("two-level semanticNearDupPairs on tiny corpora (n smaller than " +
      "targetCellSize, single vector)") {
    // n = 1: no pair possible at any blocking
    val one = Seq((0L, Seq(1.0, 0.0))).toDF("vec_id", "embedding")
    assert(SimilaritySearch.semanticNearDupPairs(one, cells = 2,
      iters = 1, threshold = 0.0, targetCellSize = 8L,
      maxCellsPerLevel = 1).count() === 0L)
    // n < targetCellSize with a 1-cell cap: kRaw = max(cells, 1) = 4
    // > cap -> two-level engages with k1 = 1 and k2 = 1 per parent;
    // one leaf holding everything = all ordered pairs over threshold
    val few = (0L until 4L).map(i =>
        (i, Seq(math.cos(i * 0.1), math.sin(i * 0.1))))
      .toDF("vec_id", "embedding")
    val pairs = SimilaritySearch.semanticNearDupPairs(few, cells = 4,
        iters = 1, threshold = 0.5, targetCellSize = 8L,
        maxCellsPerLevel = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === (for (a <- 0L until 4L; b <- a + 1 until 4L)
      yield (a, b)).toSet) // all cosines here are >= cos(0.3) > 0.5
  }

  test("pinned-k over maxCellsPerLevel stays single-level (two-level " +
      "is auto-scaled only)") {
    val few = (0L until 6L).map(i =>
        (i, Seq(math.cos(i * 0.1), math.sin(i * 0.1))))
      .toDF("vec_id", "embedding")
    // targetCellSize <= 0 with cells > cap: must NOT route into the
    // grouped level-2 kernel (which requires targetCellSize >= 1) —
    // a legal single-level build, identical to the uncapped call
    val capped = SimilaritySearch.semanticNearDupPairs(few, cells = 4,
        iters = 1, threshold = 0.5, maxCellsPerLevel = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val uncapped = SimilaritySearch.semanticNearDupPairs(few, cells = 4,
        iters = 1, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped === uncapped)
  }

  test("recsys ops on empty event logs") {
    val empty = Seq.empty[(Long, Long, String, Double, String)]
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      .filter(lit(false))
    assert(graft.operators.Recsys.covisitation(empty).count() === 0)
    assert(graft.operators.Recsys.negativeSample(empty).count() === 0)
    assert(graft.operators.Recsys.decayedEngagement(empty).count() === 0)
    assert(graft.operators.Recsys.targetEncodeLoo(empty, "event_type",
      "value", Seq("event_id")).count() === 0)
    assert(Training.shard(Seq.empty[Long].toDF("doc_id"), "doc_id", 64L)
      .count() === 0)
  }

  test("resampleHourlyFill equals a naive per-user grid walk on random data") {
    val rnd = new scala.util.Random(31)
    val events = (1 to 300).map(i => (rnd.nextInt(5).toLong, i.toLong,
        new java.sql.Timestamp(1704067200000L + rnd.nextInt(72) * 3600000L +
          rnd.nextInt(3600) * 1000L),
        rnd.nextInt(10000) / 100.0))
      .toDF("user_id", "event_id", "ts", "value")
    val got = InteractionStore.resampleHourlyFill(events)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val raw = events.as[(Long, Long, java.sql.Timestamp, Double)].collect()
    raw.groupBy(_._1).foreach { case (u, es) =>
      val hourly = es.groupBy(e => e._3.getTime / 3600000L)
        .map { case (h, rows) =>
          h -> ((rows.size.toLong,
            rows.map(e => math.floor(e._4 * 1e6).toLong).sum)) }
      var lastVm = 0L
      val (mn, mx) = (hourly.keys.min, hourly.keys.max)
      (mn to mx).foreach { h =>
        val (n, vm) = hourly.getOrElse(h, (0L, -1L))
        if (vm != -1L) lastVm = vm
        assert(got((u, h)) === ((n, lastVm)), s"user=$u hour=$h")
      }
      // grid stays within the observed bounds
      assert(!got.contains((u, mn - 1)) && !got.contains((u, mx + 1)))
    }
    assert(got.size === raw.groupBy(_._1).map { case (_, es) =>
      val hs = es.map(_._3.getTime / 3600000L)
      hs.max - hs.min + 1
    }.sum)
  }
}
