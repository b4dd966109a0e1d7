package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus-level text statistics for training-data pipelines: vocabulary
  * construction and TF-IDF term weighting. Both are pure
  * explode/groupBy shapes — one shuffle per aggregation level, map-side
  * partial aggregation for free, no UDFs.
  */
object Corpus {

  /** Corpus vocabulary: global token counts, top `n` by
    * (count desc, token asc) with a 1-based rank.
    *
    * == Scale ==
    * The count is a plain explode + groupBy (shuffled by token, partial
    * aggregation map-side). The top-n runs as `TakeOrderedAndProject` —
    * a per-partition bounded heap + driver merge, never a global sort —
    * and only the n survivors enter the rank window.
    */
  def vocab(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    val counts = docs
      .select(explode(TextFunctions.words(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    counts.orderBy(col("cnt").desc, col("token").asc).limit(n)
      .withColumn("rank", row_number().over( // n rows only
        Window.orderBy(col("cnt").desc, col("token").asc)))
  }

  /** Top TF-IDF terms per document: tf = in-doc count / doc length,
    * idf = ln(N / df), scores rounded to `scale` dp BEFORE ranking so
    * the ordering is reproducible across engines (ln differs in the
    * last ulps between libm implementations; 6 dp is far above that
    * noise), ties broken by token ascending.
    *
    * == Scale ==
    * ONE scan + explode of the corpus. Doc lengths and document
    * frequencies come from window aggregates OVER the (doc, token)
    * count table rather than separate aggregation+join legs — the
    * naive three-leg shape re-executes the explode per leg (measured:
    * 3 scans, 10 exchanges; this plan: 1 scan, 3 exchanges of the
    * far-smaller tf table). The doc-partitioned exchange is shared by
    * the length window and the rank window.
    */
  def tfIdfTopTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      topPerDoc: Int,
      scale: Int = 6): DataFrame = {
    val nDocs = docs.select(count(lit(1)).as("__n"))
    val terms = docs
      .select(col(idCol), explode(TextFunctions.words(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    val tf = terms.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf_cnt"))
    val scored = tf
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("token"))))
      .withColumn("__len", sum(col("tf_cnt")).over(
        Window.partitionBy(col(idCol))))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf_cnt").cast("double") / col("__len") *
          log(col("__n").cast("double") / col("__df")), scale))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("score").desc, col("token").asc)))
      .filter(col("rank") <= topPerDoc)
      .select(col(idCol), col("token"), col("score"), col("rank"))
  }

  /** Fixed-size sliding-window chunking of documents into token
    * chunks — the pretraining/RAG sharding step: windows of `size`
    * tokens starting every `stride` tokens (stride < size ⇒ overlap;
    * a document shorter than `size` yields one chunk of itself).
    *
    * == Scale ==
    * Pure per-row explode — embarrassingly parallel, no shuffle at
    * all. The word split runs ONCE per document (staged projection),
    * chunk texts are built by `slice` + `concat_ws` over the staged
    * array inside codegen.
    */
  def chunk(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0,
      "chunk needs chunkSize > 0 and stride > 0")
    val staged = docs.select(col(idCol),
      TextFunctions.words(col(textCol)).as("__w"))
    // stride-sequence starts, plus a final window ANCHORED at
    // len-chunkSize+1 when the sequence doesn't land there — otherwise
    // up to stride-1 trailing tokens would appear in no chunk (silent
    // data loss for a pretraining chunker). The anchored tail keeps
    // every chunk full-size; only docs shorter than chunkSize yield a
    // partial chunk.
    val lastStart = greatest(size(col("__w")) - (chunkSize - 1), lit(1))
    val seqStarts = sequence(lit(1), lastStart, lit(stride))
    val starts = when((lastStart - 1) % stride === 0, seqStarts)
      .otherwise(concat(seqStarts, array(lastStart)))
    staged
      .select(col(idCol), col("__w"),
        posexplode(starts).as(Seq("chunk_idx", "__start")))
      .select(col(idCol), col("chunk_idx"),
        concat_ws(" ", slice(col("__w"), col("__start"), lit(chunkSize)))
          .as("chunk_text"),
        least(lit(chunkSize), size(col("__w")) - col("__start") + 1)
          .as("n_tokens"))
  }

  /** BM25 keyword retrieval (Robertson/Spärck Jones): rank documents
    * against a bag-of-terms query. Scores are rounded to `scale` dp
    * BEFORE ranking (engine-portable ordering, cf. [[tfIdfTopTerms]]),
    * ties broken by document id ascending.
    *
    * == Scale ==
    * ONE scan of the corpus: the staged projection carries
    * (id, len, token) through the explode with the non-query tokens
    * filtered out immediately (the explode's output is |terms|-bounded
    * per doc). Per-token document frequencies are a window over the
    * small tf table; corpus stats (N, avg len) are one tiny aggregate
    * broadcast back. The final top-N is TakeOrderedAndProject — a
    * bounded heap, never a global sort.
    */
  def bm25Search(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      topN: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      scale: Int = 6): DataFrame = {
    require(terms.nonEmpty && topN > 0, "bm25 needs terms and topN > 0")
    val staged = docs.select(col(idCol),
      TextFunctions.words(col(textCol)).as("__w"))
    // corpus stats: N and average doc length (decimal-sum → exact)
    val stats = staged.agg(count(lit(1)).as("__N"),
      graft.OracleMath.xavg(size(col("__w")).cast("double")).as("__avglen"))
    val tf = staged
      .select(col(idCol), size(col("__w")).as("__len"),
        explode(col("__w")).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy(col(idCol), col("__len"), col("token"))
      .agg(count(lit(1)).as("__tf"))
    // tf has one row per (doc, token) → df is a plain count window
    val scored = tf
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("token"))))
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log(lit(1.0) + (col("__N") - col("__df") + 0.5) / (col("__df") + 0.5)))
      .withColumn("__term_score",
        col("__idf") * (col("__tf") * (k1 + 1)) /
          (col("__tf") +
            lit(k1) * (lit(1 - b) + lit(b) * col("__len") / col("__avglen"))))
    // per-term scores rounded then decimal-summed: the ≤|terms|-element
    // sum is order-independent, so the rounded score — and the top-N
    // cut — is identical on any engine
    scored.groupBy(col(idCol))
      .agg(round(graft.OracleMath.xsum(col("__term_score"), scale + 2), scale)
        .as("score"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(topN)
  }

  /** Pointwise mutual information of adjacent token pairs — the
    * co-occurrence statistic embedding/phrase pipelines are built on:
    * `pmi(a,b) = ln( (c_ab/P) / ((c_a/T)·(c_b/T)) )` with P total
    * pairs, T total tokens, keeping pairs with `c_ab >= minCount`.
    * Rounded to `scale` dp; deterministic ordering by (pmi desc,
    * pair asc).
    *
    * == Scale ==
    * One explode for unigrams, one for adjacent pairs (both staged off
    * a single word-split projection), each into a groupBy with
    * map-side partial aggregation. Totals T/P are scalar two-stage
    * aggregates broadcast back as a one-row crossJoin (the
    * repo-standard bounded shape) — never a single-partition window
    * holding the whole vocab/pair table. The unigram-side joins are
    * CENSUSED: the vocab count (read off the eagerly-materialized
    * checkpoint, no extra corpus scan) picks `broadcast` below
    * `broadcastVocabCap` and degrades to a shuffle hash join past it —
    * a web-scale vocabulary (10^8–10^9 terms) would exceed Spark's
    * 8 GB broadcast hard limit, so past the cap the join partitions on
    * the token key instead. Output-identical on both paths (spec:
    * PipelineOpsSpec "cooccurrencePmi: degrade path").
    */
  def cooccurrencePmi(
      docs: DataFrame,
      textCol: String,
      minCount: Int,
      scale: Int = 6,
      broadcastVocabCap: Long = 2000000L): DataFrame = {
    val staged = docs.select(TextFunctions.words(col(textCol)).as("__w"))
    // The unigram table feeds the census, the T total AND both pair
    // joins, so it is pinned with an eager localCheckpoint
    // (vocab-sized) — otherwise each consumer re-executes the corpus
    // explode (measured: 5 corpus scans in the naive shape, 2 in this
    // one).
    val uni = staged.select(explode(col("__w")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // vocab census: a count over the ALREADY-materialized checkpoint
    // partitions (localCheckpoint is eager) — a distributed scalar
    // count, not a driver-side data collect
    val vocabSize = uni.count()
    // P = Σ pair occurrences, summed BEFORE the minCount filter. The
    // totals leg's exchange canonicalizes identically to the main
    // pair-count leg's, so ReuseExchange serves both from one shuffle;
    // even unreused it is an O(corpus) rescan, never a memory hazard.
    val pairCounts = staged
      .select(explode(TextFunctions.shinglesFromWords(col("__w"), 2)).as("pair"))
      .filter(size(split(col("pair"), " ")) === 2)
      .groupBy(col("pair")).agg(count(lit(1)).as("c_ab"))
    val totals = uni.agg(sum(col("c")).as("__T"))
      .crossJoin(pairCounts.agg(sum(col("c_ab")).as("__P")))
    // past the census cap the uni side partitions on the token key
    // (shuffle hash: the vocab side builds the per-partition hash
    // table, the pair side probes); the hint pins the strategy so AQE
    // cannot flip a censused-over-cap side back to broadcast
    def uniSide(tok: String, cName: String): DataFrame = {
      val side = uni.select(col("token").as(tok), col("c").as(cName))
      if (vocabSize <= broadcastVocabCap) broadcast(side)
      else side.hint("shuffle_hash")
    }
    pairCounts
      .filter(col("c_ab") >= minCount)
      .withColumn("tok_a", split(col("pair"), " ").getItem(0))
      .withColumn("tok_b", split(col("pair"), " ").getItem(1))
      .join(uniSide("tok_a", "c_a"), "tok_a")
      .join(uniSide("tok_b", "c_b"), "tok_b")
      .crossJoin(broadcast(totals))
      .select(col("tok_a"), col("tok_b"), col("c_ab"), col("c_a"), col("c_b"),
        round(log((col("c_ab").cast("double") / col("__P")) /
          ((col("c_a").cast("double") / col("__T")) *
            (col("c_b").cast("double") / col("__T")))), scale).as("pmi"))
  }

  /** Equal-width histogram of a numeric column: `buckets` bins spanning
    * [min, max], the max value clamped into the last bin. Bin edges ride
    * along so the result is self-describing. One aggregate for the
    * bounds (broadcast back) + one groupBy — no sort, no window.
    */
  /** Frequency-ranked vocabulary id assignment (embedding-table prep):
    * every distinct token gets a contiguous 0-based id in
    * `(count DESC, token ASC)` order — id 0 is the most frequent
    * token, exactly the layout an embedding lookup table wants.
    *
    * The global rank is the range-partitioned prefix sum
    * ([[PrefixSum.inclusiveBy]] over the composite sort key) — NO
    * single-partition window, so a billion-token vocabulary ranks with
    * the same plan shape as a thousand. */
  def vocabIds(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs
      .select(explode(TextFunctions.words(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .withColumn("__one", lit(1L))
    PrefixSum.inclusiveBy(counts,
        Seq(col("cnt").desc, col("token").asc), "__one", "__rank")
      .select(col("token"), col("cnt"),
        (col("__rank") - 1).cast("int").as("vocab_id"))
  }

  /** Encode documents to ordered vocab-id sequences (the tokenize→ids
    * step before [[Training.packSequences]]): whitespace tokens join
    * the [[vocabIds]] table by token; out-of-vocabulary tokens encode
    * as -1. Output: `(doc_id, ids, n_tokens, n_oov)`.
    *
    * One explode + one equi-join on token (AQE broadcasts when the
    * vocab is small; shuffles on token otherwise — never the corpus on
    * doc_id until the final per-doc reassembly). */
  def encodeDocs(docs: DataFrame, vocab: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = docs
      .select(col(idCol), posexplode(TextFunctions.words(col(textCol)))
        .as(Seq("pos", "token")))
      .filter(col("token") =!= "")
    toks
      .join(vocab.select(col("token"), col("vocab_id")), Seq("token"), "left")
      .withColumn("__id", coalesce(col("vocab_id"), lit(-1)))
      .groupBy(col(idCol))
      .agg(
        transform(array_sort(collect_list(struct(col("pos").as("p"),
          col("__id").as("i")))), s => s.getField("i")).as("ids"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("vocab_id").isNull, 1L).otherwise(0L)).as("n_oov"))
  }

  def histogram(df: DataFrame, c: String, buckets: Int): DataFrame = {
    val bounds = df.agg(min(col(c)).as("__mn"), max(col(c)).as("__mx"))
    df.crossJoin(broadcast(bounds))
      .select(least(
        floor((col(c) - col("__mn")) / (col("__mx") - col("__mn")) * buckets),
        lit(buckets - 1L)).cast("long").as("bucket"),
        col("__mn"), col("__mx"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        // per-group constants: edges derive from the global bounds
        (first(col("__mn")) + col("bucket") *
          (first(col("__mx")) - first(col("__mn"))) / buckets).as("lo"),
        (first(col("__mn")) + (col("bucket") + 1) *
          (first(col("__mx")) - first(col("__mn"))) / buckets).as("hi"))
  }

  /** Bigram conditional-probability table `P(w2 | w1)` over adjacent
    * word pairs: the simplest corpus language model, and the
    * diagnostic behind repetition/perplexity screens ("which
    * continuations dominate after this word"). Probabilities are ONE
    * division of exact long counts, so the table reproduces
    * bit-for-bit in any engine. `minCount` drops rare prefixes (the
    * Zipf tail is noise AND the bulk of the output at corpus scale).
    *
    * == Scale ==
    * One explode produces in-doc adjacent pairs row-locally (array
    * 1-shift zip — no window, no self-join); one shuffle counts
    * (w1, w2) with map-side combine; prefix totals aggregate the
    * already-small pair table, not the corpus, and join back on w1.
    * Output: `(w1, w2, n_pair, n_prefix, p)`. */
  def bigramConditional(
      docs: DataFrame,
      textCol: String,
      minCount: Int = 2): DataFrame = {
    val pairs = docs
      .select(TextFunctions.words(col(textCol)).as("__w"))
      .select(explode(arrays_zip(
        slice(col("__w"), lit(1), greatest(size(col("__w")) - 1, lit(0))),
        slice(col("__w"), lit(2), greatest(size(col("__w")) - 1, lit(0)))))
        .as("__p"))
      .select(col("__p.0").as("w1"), col("__p.1").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
    val pairCounts = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_pair"))
    val prefixCounts = pairCounts.groupBy(col("w1"))
      .agg(sum(col("n_pair")).as("n_prefix"))
    pairCounts.join(prefixCounts, "w1")
      .filter(col("n_prefix") >= minCount)
      .select(col("w1"), col("w2"), col("n_pair"), col("n_prefix"),
        (col("n_pair").cast("double") / col("n_prefix").cast("double"))
          .as("p"))
  }

  /** Tokenizer fertility per language: subtokens-per-word and
    * chars-per-word ratios, the number a tokenizer is judged on per
    * language (a BPE vocab tuned on English typically shows 2–3×
    * fertility on agglutinative or non-Latin languages — this table
    * is how that imbalance is measured). All counts exact longs; the
    * two ratios are one division each. One explode-free scan: word
    * and subtoken counts are row-local array lengths. Output:
    * `(langCol, n_docs, n_words, n_subtokens, n_chars, fertility,
    * chars_per_word)`. */
  def tokenizerFertility(
      docs: DataFrame,
      textCol: String,
      langCol: String): DataFrame =
    docs
      .select(col(langCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("__nw"),
        TextFunctions.subTokenCount(col(textCol)).cast("long").as("__ns"),
        length(col(textCol)).cast("long").as("__nc"))
      .groupBy(col(langCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nw")).as("n_words"),
        sum(col("__ns")).as("n_subtokens"),
        sum(col("__nc")).as("n_chars"))
      .select(col(langCol), col("n_docs"), col("n_words"),
        col("n_subtokens"), col("n_chars"),
        (col("n_subtokens").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_words").cast("double"))
          .as("chars_per_word"))

  /** Vocabulary coverage curve: for each requested vocabulary budget
    * `k`, the fraction of ALL token occurrences covered by the `k`
    * most frequent tokens — the number a tokenizer/vocab-size decision
    * is made on (the marginal OOV rate of growing the vocab from 32k
    * to 64k is read straight off this curve).
    *
    * Token counts reduce once; the cumulative occurrence mass rides
    * [[graft.operators.PrefixSum.inclusiveBy]] over the frequency
    * order `(cnt DESC, token ASC)` — range-partitioned, no
    * single-partition window at any vocabulary size. The frequency
    * RANK reuses the same prefix-sum machinery applied to a constant-1
    * column, so both axes of the curve are exact longs; coverage is
    * one long/long division. Output: `(k, covered, total, coverage)`,
    * one row per requested k (a k beyond the vocabulary reports the
    * full mass). */
  def coverageCurve(
      docs: DataFrame,
      textCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "ks must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select(explode(TextFunctions.words(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .withColumn("__one", lit(1L))
    val order = Seq(col("cnt").desc, col("token").asc)
    // both cumulative axes (occurrence mass + frequency rank) in ONE
    // range-partitioned pass — the nested two-pass form paid the range
    // exchange and its checkpoint twice over the same vocabulary
    val cum = PrefixSum.inclusiveMultiBy(counts, order,
      Seq("cnt" -> "__mass", "__one" -> "__rank"))
    val total = counts.agg(sum(col("cnt")).as("__total"))
    val kDf = ks.toDF("k")
    // per k: the mass at rank = min(k, |vocab|) — the largest rank ≤ k;
    // only the top-max(ks) rows can matter, so prune before the ×|ks|
    // fan-out (at a 10⁹-token vocabulary this is the whole ballgame)
    cum.filter(col("__rank") <= ks.max)
      .crossJoin(broadcast(kDf))
      .filter(col("__rank") <= col("k"))
      .groupBy(col("k"))
      .agg(max(struct(col("__rank"), col("__mass"))).as("__top"))
      .select(col("k"), col("__top.__mass").as("covered"))
      .crossJoin(broadcast(total))
      .select(col("k"), col("covered"), col("__total").as("total"),
        (col("covered").cast("double") / col("__total").cast("double"))
          .as("coverage"))
  }

  /** Per-document negative log-likelihood under a bigram LM table
    * ([[bigramConditional]]'s `(w1, w2, p)` output, or any table with
    * those columns) — the corpus-fit quality score a data pipeline
    * ranks documents by before mixing (high NLL ≈ out-of-domain or
    * noisy text).
    *
    * Each in-document adjacent pair joins the LM on `(w1, w2)` (plain
    * equi-join; the LM can be billions of rows — no broadcast hint,
    * AQE decides) and contributes `round(ln(p)·1e6)` micro-nats.
    * Per-term rounding BEFORE the sum keeps the total an
    * order-free integer (the PSI rounded-ln convention,
    * [[graft.operators.Normalize.psiBins]]); pairs the LM filtered out
    * (below its min-count) are counted but not scored. Output:
    * `(idCol, n_bigrams, n_scored, nll_micro, avg_nll)` — `avg_nll`
    * in nats over scored pairs, null when nothing scored.
    */
  def bigramNll(
      docs: DataFrame,
      lm: DataFrame,
      idCol: String,
      textCol: String): DataFrame =
    adjacentPairs(docs, idCol, textCol)
      .join(lm.select(col("w1"), col("w2"), col("p")), Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        count(col("p")).as("n_scored"),
        (-sum(round(log(col("p")) * 1e6).cast("long"))).as("nll_micro"))
      .withColumn("avg_nll",
        when(col("n_scored") > 0,
          col("nll_micro").cast("double") / 1e6 /
            col("n_scored").cast("double")))

  /** DSIR-style importance log-ratio (Xie et al., NeurIPS'23 —
    * data selection by importance resampling, on bigram features):
    * per document, `Σ ln p_target(w2|w1) − ln p_source(w2|w1)` over
    * pairs BOTH LMs score — positive means the document looks more
    * like the target distribution than the source, and resampling
    * ∝ exp(ratio) tilts a raw crawl toward the target domain. Terms
    * round to micro-nats before the sum ([[bigramNll]]'s order-free
    * integer convention). Output: `(idCol, n_bigrams, n_scored,
    * log_ratio_micro, avg_log_ratio)`.
    *
    * == Scale ==
    * Two equi-joins on (w1, w2) — LM tables can be arbitrarily large
    * (no broadcast hint, AQE decides) — then one per-doc reduce. */
  def importanceLogRatio(
      docs: DataFrame,
      targetLm: DataFrame,
      sourceLm: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val both = col("__pt").isNotNull && col("__ps").isNotNull
    adjacentPairs(docs, idCol, textCol)
      .join(targetLm.select(col("w1"), col("w2"), col("p").as("__pt")),
        Seq("w1", "w2"), "left")
      .join(sourceLm.select(col("w1"), col("w2"), col("p").as("__ps")),
        Seq("w1", "w2"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        count(when(both, lit(1))).as("n_scored"),
        sum(when(both,
          round(log(col("__pt")) * 1e6).cast("long") -
            round(log(col("__ps")) * 1e6).cast("long")))
          .as("log_ratio_micro"))
      .withColumn("avg_log_ratio",
        when(col("n_scored") > 0,
          col("log_ratio_micro").cast("double") / 1e6 /
            col("n_scored").cast("double")))
  }

  /** In-document adjacent word pairs with the doc key carried:
    * `(idCol, w1, w2)`, one row per occurrence — the staging shared by
    * [[bigramNll]] and [[importanceLogRatio]] (array 1-shift zip, no
    * window, no shuffle). */
  private def adjacentPairs(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextFunctions.words(col(textCol)).as("__w"))
      .select(col(idCol), explode(arrays_zip(
        slice(col("__w"), lit(1), greatest(size(col("__w")) - 1, lit(0))),
        slice(col("__w"), lit(2), greatest(size(col("__w")) - 1, lit(0)))))
        .as("__p"))
      .select(col(idCol), col("__p.0").as("w1"), col("__p.1").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")

  /** Per-document sentence statistics: sentence count, mean and max
    * sentence length in words — the readability / run-on detector (a
    * doc whose "sentences" average 200 words is a table dump or
    * boilerplate, not prose; one with 3-word sentences is a listicle
    * or OCR shrapnel). Sentences split on `[.!?]+` runs (the
    * Java-regex ∩ RE2 subset, so the oracle applies it verbatim);
    * empty segments (e.g. trailing punctuation) drop. Entirely
    * row-local — no shuffle at any size. Mean lengths round to
    * micro-words for engine-exact figures.
    * Output: `(idCol, n_sentences, mean_sentence_words,
    * max_sentence_words)`; docs with no sentence yield zero/null. */
  def sentenceStats(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sentences = filter(
      transform(split(col(textCol), "[.!?]+"),
        s => size(TextFunctions.words(s)) -
          when(trim(s) === "", 1).otherwise(0)),
      n => n > 0)
    docs
      .select(col(idCol), sentences.as("__sl"))
      .select(col(idCol),
        size(col("__sl")).cast("long").as("n_sentences"),
        when(size(col("__sl")) > 0,
          round(aggregate(col("__sl"), lit(0L), (acc, x) =>
            acc + x.cast("long")).cast("double") /
            size(col("__sl")).cast("double") * 1e6) / 1e6)
          .as("mean_sentence_words"),
        when(size(col("__sl")) > 0,
          array_max(col("__sl")).cast("long")).as("max_sentence_words"))
  }

  /** Zipf rank-frequency fit over the top-`topN` vocabulary: OLS of
    * `ln cnt` on `ln rank` — natural text sits near slope −1 (Zipf's
    * law), so a corpus whose slope drifts far from it is a red flag
    * for boilerplate floods (flat head, slope → 0) or dedup damage.
    * The regression's four moment sums ride micro-rounded integer
    * terms ([[graft.operators.Profile.categoricalEntropy]]'s
    * order-free convention); slope and intercept are then a fixed
    * chain of IEEE ops over those exact figures.
    *
    * == Scale ==
    * [[vocab]]'s count shuffle + TakeOrdered head — the full
    * vocabulary is never globally sorted; the regression itself runs
    * over `topN` rows. Output (one row):
    * `(n_terms, slope, intercept)`. */
  /** Per-source lexical diversity: token mass, distinct types, hapax
    * legomena (frequency-1 types), type-token ratio, and hapax share —
    * the template-detection triple (a boilerplate-flooded source shows
    * collapsing TTR; a scrape full of serial numbers shows hapax ≈ 1).
    * All counts exact; the two ratios are one division each.
    *
    * == Scale ==
    * ONE scan explodes tokens; one (source, token) count shuffle, then
    * a per-source reduce over the type table — never a second corpus
    * pass. Output:
    * `(srcCol, n_tokens, n_types, n_hapax, ttr, hapax_ratio)`. */
  def lexicalDiversity(
      docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val counts = docs
      .select(col(srcCol),
        explode(TextFunctions.words(col(textCol))).as("__tok"))
      .filter(col("__tok") =!= "")
      .groupBy(col(srcCol), col("__tok"))
      .agg(count(lit(1)).as("__c"))
    counts.groupBy(col(srcCol))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum((col("__c") === 1L).cast("long")).as("n_hapax"))
      .withColumn("ttr",
        col("n_types").cast("double") / col("n_tokens").cast("double"))
      .withColumn("hapax_ratio",
        col("n_hapax").cast("double") / col("n_types").cast("double"))
  }

  /** Adjacent character-pair frequencies inside tokens — the statistic
    * a BPE tokenizer trainer greedily merges on (Sennrich et al.,
    * ACL'16: the highest-count pair becomes the first merge rule).
    * One corpus scan; the pair fan-out is row-local
    * (`explode(sequence)` over each token's positions); top-`topN` by
    * (count desc, pair asc) via TakeOrdered — the full pair domain is
    * never globally sorted. Output: `(pair, cnt, rank)`. */
  def bpePairStats(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val pairs = docs
      .select(explode(TextFunctions.words(col(textCol))).as("__tok"))
      .filter(length(col("__tok")) >= 2)
      .select(col("__tok"),
        explode(sequence(lit(1), length(col("__tok")) - 1)).as("__i"))
      .select(expr("substring(__tok, __i, 2)").as("pair"))
    val counts = pairs.groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
    counts.orderBy(col("cnt").desc, col("pair").asc).limit(topN)
      .withColumn("rank", row_number().over( // topN rows only
        Window.orderBy(col("cnt").desc, col("pair").asc)))
  }

  def zipfSlope(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    require(topN >= 2, s"need at least 2 ranks to fit, got $topN")
    val x = log(col("rank").cast("double"))
    val y = log(col("cnt").cast("double"))
    val terms = vocab(docs, textCol, topN).select(
      round(x * 1e6).cast("long").as("__x"),
      round(y * 1e6).cast("long").as("__y"),
      round(x * x * 1e6).cast("long").as("__xx"),
      round(x * y * 1e6).cast("long").as("__xy"))
    val n = col("n_terms").cast("double")
    val sx = col("__sx").cast("double") / 1e6
    val sy = col("__sy").cast("double") / 1e6
    val sxx = col("__sxx").cast("double") / 1e6
    val sxy = col("__sxy").cast("double") / 1e6
    terms
      .agg(count(lit(1)).as("n_terms"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__xx")).as("__sxx"), sum(col("__xy")).as("__sxy"))
      .withColumn("slope",
        (n * sxy - sx * sy) / (n * sxx - sx * sx))
      .withColumn("intercept", (sy - col("slope") * sx) / n)
      .select(col("n_terms"), col("slope"), col("intercept"))
  }

  /** Flesch-style readability scores, fully row-local: words = letter
    * runs, sentences = `[.!?]` runs (floored at 1 so punctuation-free
    * corpora degrade to one-sentence docs instead of dividing by
    * zero), syllables ≈ vowel-group runs — the standard cheap proxy; a
    * real hyphenator is a per-language dictionary lookup, overkill for
    * corpus triage. Reading-ease and grade-level are elementwise
    * double arithmetic over those integers, so any engine reproduces
    * them exactly. No shuffle at all — this is a projection a 100 TB
    * scan absorbs for free. */
  /** TextRank keyword extraction: PageRank over the word-adjacency
    * graph (undirected edges between neighboring tokens, kept when
    * they co-occur ≥ `minCount` times corpus-wide). The graph build is
    * a row-local adjacent-pair explode + one count shuffle; ranking
    * reuses [[Recsys.pageRank]]'s integer fixed-point iterations, so
    * the whole extraction is engine-exact. Rank-frequency differs from
    * raw frequency exactly where TextRank earns its keep: a word
    * bridging many distinct contexts outranks one repeated inside a
    * single phrase. */
  def textrankKeywords(docs: DataFrame, textCol: String,
      minCount: Long = 5, iterations: Int = 3): DataFrame = {
    val pairs = docs
      .select(graft.functions.TextFunctions.words(col(textCol)).as("__w"))
      .filter(size(col("__w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__w) - 1), i -> " +
          "named_struct('a', element_at(__w, i), " +
          "'b', element_at(__w, i + 1)))")).as("__p"))
      .select(least(col("__p.a"), col("__p.b")).as("item_a"),
        greatest(col("__p.a"), col("__p.b")).as("item_b"))
      .filter(col("item_a") =!= col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minCount)
      .select("item_a", "item_b")
    Recsys.pageRank(pairs, iterations)
  }

  def readability(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol),
      size(expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)"))
        .cast("long").as("n_words"),
      greatest(
        size(expr(s"regexp_extract_all($textCol, '[.!?]+', 0)")), lit(1))
        .cast("long").as("n_sentences"),
      size(expr(s"regexp_extract_all(lower($textCol), '[aeiouy]+', 0)"))
        .cast("long").as("n_syllables"))
      .filter(col("n_words") > 0L)
      .withColumn("flesch_ease", round(
        lit(206.835) -
          lit(1.015) * (col("n_words").cast("double") /
            col("n_sentences").cast("double")) -
          lit(84.6) * (col("n_syllables").cast("double") /
            col("n_words").cast("double")), 6))
      .withColumn("grade_level", round(
        lit(0.39) * (col("n_words").cast("double") /
          col("n_sentences").cast("double")) +
          lit(11.8) * (col("n_syllables").cast("double") /
            col("n_words").cast("double")) - lit(15.59), 6))
}
