package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Deterministic synthetic-data generator for SCALE measurement runs.
  *
  * The driver ships sf0.001/0.01/0.1; SCALE.md needs one order of
  * magnitude beyond the bench tier, so this tool regenerates the same
  * star schema + events/documents/embeddings tables at an arbitrary
  * scale factor with distributions matched to the measured shape of
  * the driver's sf0.1 data (row ratios, key cardinalities, value
  * ranges, near-duplicate rate, label clustering, unit-norm vectors).
  * It is used ONLY for performance scaling evidence — the sf0.01
  * DuckDB oracle remains the correctness gate, so byte-parity with
  * the driver's generator is a non-goal; cardinality parity is the
  * requirement (group-by widths, join fan-outs, dup rates drive plan
  * cost, exact values don't).
  *
  * Everything is generated distributively from `spark.range` with
  * xxhash64-derived uniforms — no driver-side loops, no RNG state, so
  * the output is identical regardless of partitioning or core count,
  * and generating sf10 on a cluster would parallelize for free.
  *
  * Usage: `sbt "runMain graft.tools.GenData <outDir> <sf>"`.
  */
object GenData {

  /** Deterministic uniform in [0,1) keyed on (tag, id cols). One
    * xxhash64 per draw keeps generation whole-stage-codegen'd.
    */
  private def u(tag: String, ks: Column*): Column =
    pmod(xxhash64((lit(tag) +: ks): _*), lit(1000000000L)).cast("double") / 1e9

  /** Deterministic int in [0, n) keyed on (tag, id cols). */
  private def h(tag: String, n: Long, ks: Column*): Column =
    pmod(xxhash64((lit(tag) +: ks): _*), lit(n))

  /** Approximate standard normal: sum of three uniforms, centered and
    * rescaled (Irwin–Hall). Plenty for cluster-shaped embeddings.
    */
  private def gauss(tag: String, ks: Column*): Column =
    (u(tag + "1", ks: _*) + u(tag + "2", ks: _*) + u(tag + "3", ks: _*) - lit(1.5)) * lit(2.0)

  private def pick(values: Seq[String], key: Column): Column =
    element_at(array(values.map(lit): _*), (key + 1).cast("int"))

  // the sf0.1 documents vocabulary, verbatim (31 words)
  private val Vocab = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order", "part",
    "query", "row", "scan", "slow", "small", "sort", "spark", "stream",
    "table", "the", "value", "vector", "window")

  /** Word array for document `id` — a pure expression of the id column,
    * so a near-duplicate can re-derive its source doc's words without a
    * join (wordsOf(srcId) is just the same expression over another key).
    */
  private def wordsOf(id: Column): Column = {
    val wc = (h("doc_wc", 91, id) + 10).cast("int")
    transform(sequence(lit(0), wc - 1),
      j => element_at(array(Vocab.map(lit): _*), (pmod(xxhash64(lit("doc_w"), id, j), lit(31)) + 1).cast("int")))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenData <outDir> <sf> [table ...]")
    val outDir = args(0)
    val sf     = args(1).toDouble
    val only   = args.drop(2).toSet
    val spark  = GraftSession.build("graft-gendata")
    try generate(spark, outDir, sf, only)
    finally spark.stop()
  }

  /** `only` non-empty limits generation to the named tables — a
    * standing audit that needs one table at sf10 (SpotTau reads just
    * `embeddings`) shouldn't pay for 15 M orders. Content is
    * per-table deterministic in (id, sf), so a subset regeneration
    * is bit-identical to the same table from a full run.
    */
  def generate(spark: SparkSession, outDir: String, sf: Double,
               only: Set[String] = Set.empty): Unit = {
    import spark.implicits._

    def n(base: Long): Long = math.max(1L, math.round(base * sf))
    val nCust  = n(150000)
    val nSupp  = n(10000)
    val nPart  = n(200000)
    val nOrder = n(1500000)
    val nEvent = n(1000000)
    val nUser  = n(15000)
    val nDoc   = n(50000)
    val nVec   = n(20000)

    // The driver's layout is ONE flat file per table named
    // `<name>.parquet` — the streaming source globs on exactly that
    // file name, so write to a temp dir and move the single part file
    // into place. (Parquet row groups keep a single file splittable;
    // scan-side parallelism matches the shipped data's shape.)
    def write(df: DataFrame, name: String): Unit = {
      if (only.nonEmpty && !only.contains(name)) return
      import org.apache.hadoop.fs.Path
      val conf = spark.sparkContext.hadoopConfiguration
      val tmp  = new Path(s"$outDir/.gen_$name")
      val fs   = tmp.getFileSystem(conf)
      // ~16 MB row groups: a single flat file stays scan-parallel
      // (each FileScan split reads the row groups whose midpoint lands
      // in its byte range — one giant row group would serialize the
      // scan no matter how many splits Spark makes)
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", (16 * 1024 * 1024).toString)
        .parquet(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file under $tmp"))
      val dest = new Path(s"$outDir/$name.parquet")
      fs.delete(dest, true)
      require(fs.rename(part, dest), s"rename $part -> $dest failed")
      fs.delete(tmp, true)
      println(s"gen: $name done")
    }

    val id = col("id")

    write(Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"), (4, "MIDDLE EAST"))
      .toDF("r_regionkey", "r_name"), "region")

    write(spark.range(25).select(
      id.cast("int").as("n_nationkey"),
      format_string("NATION_%d", id).as("n_name"),
      (id % 5).cast("int").as("n_regionkey")), "nation")

    val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    write(spark.range(nCust).select(
      id.as("c_custkey"),
      format_string("Customer#%09d", id).as("c_name"),
      h("c_nat", 25, id).cast("int").as("c_nationkey"),
      round(lit(-1000.0) + u("c_bal", id) * 11000.0, 2).as("c_acctbal"),
      pick(segments, h("c_seg", 5, id)).as("c_mktsegment")), "customer")

    write(spark.range(nSupp).select(
      id.as("s_suppkey"),
      format_string("Supplier#%09d", id).as("s_name"),
      h("s_nat", 25, id).cast("int").as("s_nationkey"),
      round(lit(-1000.0) + u("s_bal", id) * 11000.0, 2).as("s_acctbal")), "supplier")

    val adjectives = Seq("large", "small", "hot", "cold", "blue", "green", "dim", "bright")
    val nouns      = Seq("ring", "bolt", "gear", "cog", "pin", "washer", "spring", "lever")
    val pTypes     = Seq("LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO")
    write(spark.range(nPart).select(
      id.as("p_partkey"),
      concat_ws(" ", pick(adjectives, h("p_adj", 8, id)), pick(nouns, h("p_noun", 8, id))).as("p_name"),
      format_string("Brand#%d", h("p_brand", 25, id) + 1).as("p_brand"),
      pick(pTypes, h("p_type", 6, id)).as("p_type"),
      (h("p_size", 50, id) + 1).cast("int").as("p_size"),
      round(lit(900.0) + u("p_price", id) * 100.0, 2).as("p_retailprice")), "part")

    // orders + lineitem share the per-order draws (custkey, orderdate,
    // line count), re-derived from o_orderkey on each side — no join.
    val orderDate = timestamp_seconds(
      lit(java.time.Instant.parse("1995-01-01T00:00:00Z").getEpochSecond) +
        h("o_date", 2404, id) * 86400L)
    write(spark.range(nOrder).select(
      id.as("o_orderkey"),
      h("o_cust", nCust, id).as("o_custkey"),
      pick(Seq("F", "O", "P"), when(u("o_stat", id) < 0.49, 0)
        .when(u("o_stat", id) < 0.98, 1).otherwise(2)).as("o_orderstatus"),
      round(lit(1000.0) + u("o_total", id) * 499000.0, 2).as("o_totalprice"),
      orderDate.as("o_orderdate"),
      pick(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
        h("o_prio", 5, id)).as("o_orderpriority")), "orders")

    val li = spark.range(nOrder)
      .select(id.as("l_orderkey"), orderDate.as("od"),
        explode(sequence(lit(1), (h("l_n", 7, id) + 1).cast("int"))).as("l_linenumber"))
    val lid = Seq(col("l_orderkey"), col("l_linenumber"))
    val qty = (h("l_qty", 50, lid: _*) + 1).cast("double")
    write(li.select(
      col("l_orderkey"),
      h("l_part", nPart, lid: _*).as("l_partkey"),
      h("l_supp", nSupp, lid: _*).as("l_suppkey"),
      col("l_linenumber"),
      qty.as("l_quantity"),
      round(qty * (lit(900.0) + u("l_px", lid: _*) * 1200.0), 2).as("l_extendedprice"),
      (h("l_disc", 11, lid: _*).cast("double") / 100.0).as("l_discount"),
      (h("l_tax", 9, lid: _*).cast("double") / 100.0).as("l_tax"),
      pick(Seq("A", "N", "R"), h("l_rf", 3, lid: _*)).as("l_returnflag"),
      pick(Seq("F", "O"), h("l_ls", 2, lid: _*)).as("l_linestatus"),
      date_add(col("od").cast("date"), (h("l_ship", 95, lid: _*) + 1).cast("int"))
        .cast("timestamp").as("l_shipdate")),
      "lineitem")

    // ts matches the driver's CURRENT layout: parquet
    // TIMESTAMP(isAdjustedToUTC=false, MICROS), which Spark reads as
    // TIMESTAMP_NTZ and Tables.normalizeEventTs lifts to TimestampType
    // (the driver originally shipped TIMESTAMP(NANOS); the normalizer
    // still handles that layout, specs cover it via raw-long files).
    write(spark.range(nEvent).select(
      id.as("event_id"),
      timestamp_micros(
        lit(java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond * 1000000L) +
          (u("e_ts", id) * 30.0 * 86400.0 * 1e6).cast("long"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("ts"),
      h("e_user", nUser, id).as("user_id"),
      pick(Seq("click", "error", "purchase", "signup", "view"), h("e_type", 5, id)).as("event_type"),
      round(u("e_val", id) * 100.0, 4).as("value"),
      format_string("{\"k\": %d}", h("e_k", 100, id)).as("props")), "events")

    // ~5% of docs (id >= 1000) are near-duplicates of a uniformly-drawn
    // earlier doc: same words with the last 3 replaced — long shared
    // prefix + high Jaccard/low Hamming, matching the measured sf0.1
    // near-dup rate (256 prefix-identical pairs / 5000 docs).
    val isDup  = (id >= 1000) && (h("doc_dup", 100, id) < 5)
    val srcId  = pmod(xxhash64(lit("doc_src"), id), id)
    val base   = wordsOf(id)
    val src    = wordsOf(srcId)
    val dupped = concat(
      slice(src, lit(1), greatest(size(src) - 3, lit(1))),
      transform(sequence(lit(0), lit(2)),
        j => element_at(array(Vocab.map(lit): _*), (pmod(xxhash64(lit("doc_p"), id, j), lit(31)) + 1).cast("int"))))
    val text = array_join(when(isDup, dupped).otherwise(base), " ")
    val langKey = h("doc_lang", 100, id)
    write(spark.range(nDoc).select(
      id.as("doc_id"),
      text.as("text"),
      when(langKey < 41, "en").when(langKey < 56, "zh").when(langKey < 71, "es")
        .when(langKey < 86, "fr").otherwise("de").as("lang"),
      format_string("src%d", h("doc_srcn", 20, id)).as("source"),
      length(text).as("n_chars")), "documents")

    // ISOTROPIC unit vectors in 64-d with 10 labels attached — NOT
    // directional clusters. Measured on the driver's sf0.1 table:
    // within-label and cross-label cosine distributions are
    // identical (mean 0.000, p99 0.287, max ~0.5-0.6), i.e. labels
    // carry no cosine signal, and the near-dup/ε-graph tail is just
    // the isotropic background (7.2e-5 of pairs ≥ 0.45 ⇒ the 144 d5
    // pairs). The first cut of this generator used centroid-shaped
    // clusters (within-label mean cosine 0.674) — that floods every
    // similarity threshold the fixtures use (10% of ALL pairs ≥
    // τ=0.45; 19.9M d5 pairs at sf1 vs 144 on driver data) and turns
    // every thresholded-similarity scale measurement into a
    // different, output-quadratic task. Distribution parity in the
    // similarity TAIL is exactly what "matched to the driver's data"
    // must mean for a2/d5/v4/d10.
    val label = h("v_lab", 10, id)
    val raw = transform(sequence(lit(0), lit(63)),
      d => gauss("v_n", id, d))
    val norm = sqrt(aggregate(raw, lit(0.0), (acc, x) => acc + x * x))
    write(spark.range(nVec).select(
      id.as("vec_id"),
      transform(raw, x => (x / norm).cast("float")).as("embedding"),
      label.cast("int").as("label")), "embeddings")
  }
}
