package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-side generator for EXTRA scale factors of the driver's
  * synthetic star schema (`TESTDATA.md`): same tables, same schemas,
  * same per-decade scaling rules (every table's rows grow 10× per
  * decade above sf0.01; region/nation stay fixed), similar value
  * distributions. Used to materialize `benchdata/sf1` for the
  * multi-sf scaling sweep ([[graft.Bench]]) — `/root/testdata` is
  * read-only, so the extra decade lives inside the repo.
  *
  * NOT the driver's generator: correctness gates never read this data
  * (the DuckDB oracle compare stays on the driver's sf0.01). The sweep
  * only needs the same schema and the same SHAPE of distributions so
  * measured time-vs-rows exponents are meaningful.
  *
  * Determinism: every column is a pure hash of (table salt, row id) —
  * `u(id, salt) ∈ [0,1)` from xxhash64 — so regeneration is
  * bit-stable and parallelism-independent (no sequential RNG state).
  *
  * Usage: `runMain graft.tools.GenSf <outDir> <sf>`
  */
object GenSf {

  private def u(salt: Int): org.apache.spark.sql.Column =
    (pmod(xxhash64(col("id"), lit(salt)), lit(1000000007L)).cast("double")
      / lit(1000000007.0))

  private def pick(salt: Int, vs: Seq[String]): org.apache.spark.sql.Column =
    element_at(typedlit(vs),
      (pmod(xxhash64(col("id"), lit(salt)), lit(vs.size.toLong)) + 1)
        .cast("int"))

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val sf = args(1).toDouble
    val spark = graft.GraftSession.builder("gen-sf", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, out, sf)
    spark.stop()
  }

  def generate(spark: SparkSession, out: String, sf: Double): Unit = {
    def n(base: Long): Long = math.max(1L, (base * sf).toLong)
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[gensf] $name written")
    }

    val nCust = n(150000)
    val nSupp = n(10000)
    val nPart = n(200000)
    val nOrd = n(1500000)
    val nLine = n(6000000)
    val nEv = n(1000000)
    val nUsers = n(15000)
    val nDoc = n(50000)
    val nVec = n(20000)

    write("region", spark.range(5).select(col("id").as("r_regionkey"),
      element_at(typedlit(Seq("AFRICA", "AMERICA", "ASIA", "EUROPE",
        "MIDDLE EAST")), (col("id") + 1).cast("int")).as("r_name")))

    write("nation", spark.range(25).select(col("id").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      (col("id") % 5).cast("int").as("n_regionkey")))

    write("customer", spark.range(nCust).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      pmod(xxhash64(col("id"), lit(11)), lit(25L)).cast("int")
        .as("c_nationkey"),
      round(u(12) * 10000, 2).as("c_acctbal"),
      pick(13, Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY",
        "HOUSEHOLD")).as("c_mktsegment")))

    write("supplier", spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      pmod(xxhash64(col("id"), lit(21)), lit(25L)).cast("int")
        .as("s_nationkey"),
      round(u(22) * 10000, 2).as("s_acctbal")))

    val adjectives = Seq("large", "hot", "small", "cold", "round",
      "flat", "long", "short", "blue", "red")
    val nouns = Seq("ring", "bolt", "gear", "pin", "cap", "rod", "nut",
      "plate", "wheel", "axle")
    write("part", spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat_ws(" ", pick(31, adjectives), pick(32, nouns)).as("p_name"),
      concat(lit("Brand#"),
        pmod(xxhash64(col("id"), lit(33)), lit(25L))).as("p_brand"),
      pick(34, Seq("LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM",
        "PROMO ANODIZED", "BRUSHED")).as("p_type"),
      (pmod(xxhash64(col("id"), lit(35)), lit(50L)) + 1).cast("int")
        .as("p_size"),
      round(lit(900.0) + (col("id") % 1000) * 0.1, 2)
        .as("p_retailprice")))

    val day = 86400L
    val ordEpoch0 = 788918400L // 1995-01-01 UTC
    write("orders", spark.range(nOrd).select(
      col("id").as("o_orderkey"),
      pmod(xxhash64(col("id"), lit(41)), lit(nCust)).as("o_custkey"),
      pick(42, Seq("O", "F", "P")).as("o_orderstatus"),
      round(u(43) * 400000, 2).as("o_totalprice"),
      timestamp_seconds(lit(ordEpoch0) +
        (pmod(xxhash64(col("id"), lit(44)), lit(2500L)) * day))
        .as("o_orderdate"),
      pick(45, Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW")).as("o_orderpriority")))

    write("lineitem", spark.range(nLine).select(
      pmod(xxhash64(col("id"), lit(51)), lit(nOrd)).as("l_orderkey"),
      pmod(xxhash64(col("id"), lit(52)), lit(nPart)).as("l_partkey"),
      pmod(xxhash64(col("id"), lit(53)), lit(nSupp)).as("l_suppkey"),
      (pmod(xxhash64(col("id"), lit(54)), lit(7L)) + 1).cast("int")
        .as("l_linenumber"),
      (pmod(xxhash64(col("id"), lit(55)), lit(50L)) + 1).cast("double")
        .as("l_quantity"),
      round(u(56) * 100000, 2).as("l_extendedprice"),
      (pmod(xxhash64(col("id"), lit(57)), lit(11L)).cast("double") / 100)
        .as("l_discount"),
      (pmod(xxhash64(col("id"), lit(58)), lit(9L)).cast("double") / 100)
        .as("l_tax"),
      pick(59, Seq("A", "N", "R")).as("l_returnflag"),
      pick(60, Seq("O", "F")).as("l_linestatus"),
      timestamp_seconds(lit(ordEpoch0) +
        (pmod(xxhash64(col("id"), lit(61)), lit(2500L)) * day))
        .as("l_shipdate")))

    val evEpoch0 = 1704067200L // 2024-01-01 UTC
    write("events", spark.range(nEv).select(
      col("id").as("event_id"),
      timestamp_micros(lit(evEpoch0 * 1000000L) +
        pmod(xxhash64(col("id"), lit(71)), lit(30L * day * 1000000L)))
        .as("ts"),
      pmod(xxhash64(col("id"), lit(72)), lit(nUsers)).as("user_id"),
      pick(73, Seq("click", "view", "purchase", "signup", "error"))
        .as("event_type"),
      round(u(74) * 500, 2).as("value"),
      format_string("{\"k\": %d}",
        pmod(xxhash64(col("id"), lit(75)), lit(100L))).as("props")))

    val vocab = Seq("spark", "batch", "line", "column", "order", "small",
      "sort", "fast", "value", "scan", "hash", "slow", "group", "agg",
      "filter", "query", "big", "key", "window", "row", "part", "table",
      "stream", "merge", "data", "a", "join", "shuffle", "cache", "plan",
      "read", "write", "block", "page", "index", "node", "task", "stage",
      "byte", "file")
    val nWords = (pmod(xxhash64(col("id"), lit(81)), lit(50L)) + 20)
      .cast("int")
    val text = concat_ws(" ", transform(
      sequence(lit(1), nWords),
      j => element_at(typedlit(vocab),
        (pmod(xxhash64(col("id"), j, lit(82)), lit(vocab.size.toLong)) + 1)
          .cast("int"))))
    write("documents", spark.range(nDoc)
      .select(col("id").as("doc_id"), text.as("text"),
        pick(83, Seq("en", "en", "en", "en", "de", "zh", "fr", "es",
          "es", "de")).as("lang"),
        concat(lit("src"), pmod(xxhash64(col("id"), lit(84)), lit(20L)))
          .as("source"))
      .withColumn("n_chars", length(col("text"))))

    // label-clustered embeddings: center[label][j] = sin(7·label + j),
    // plus per-element uniform noise — k-means/ANN queries keep finding
    // real cluster structure at every sf
    val label = pmod(xxhash64(col("id"), lit(91)), lit(10L)).cast("int")
    val emb = transform(sequence(lit(0), lit(63)), j =>
      (sin(label.cast("double") * 7 + j.cast("double")) +
        (pmod(xxhash64(col("id"), j, lit(92)), lit(1000000007L))
          .cast("double") / 1000000007.0 - 0.5) * 0.8).cast("float"))
    write("embeddings", spark.range(nVec).select(
      col("id").as("vec_id"), emb.as("embedding"), label.as("label")))
  }
}
