package graft.queries

import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Pins the driver's test-data layout AS THE ENGINE SEES IT, so a
  * data regeneration that changes a column surfaces as ONE red test
  * naming the table and column — not as a dozen silent query
  * failures. (Round 9: `events.ts` moved from parquet
  * TIMESTAMP(NANOS) to TIMESTAMP_NTZ micros; 12 queries broke with
  * zero code changes.)
  *
  * Two layers are pinned per table:
  *   - the NORMALIZED schema [[Tables.apply]] hands to every query —
  *     exact, because the query registry is written against it
  *     (timestamps arrive parquet-NTZ and stay NTZ except
  *     `events.ts`, which [[Tables.normalizeEventTs]] lifts to
  *     TimestampType for the `unix_micros` call sites);
  *   - the RAW `events.ts` type — any of the three layouts
  *     [[Tables.normalizeEventTs]] supports is accepted, because
  *     supporting all three is the point.
  */
final class TestDataLayoutSpec extends SparkTestBase {

  private val sfDir = testData("sf0.01")

  /** table -> expected (column, type) list as Tables.apply serves it. */
  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq(
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_tax" -> DoubleType, "l_returnflag" -> StringType,
      "l_linestatus" -> StringType, "l_shipdate" -> TimestampNTZType),
    "events" -> Seq(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType)
  )

  private def describeDiff(table: String, got: StructType,
                           want: Seq[(String, DataType)]): Seq[String] = {
    val gotMap  = got.fields.map(f => f.name -> f.dataType).toMap
    val wantMap = want.toMap
    val missing = want.collect { case (n, t) if !gotMap.contains(n) =>
      s"$table.$n ($t) MISSING from data" }
    val extra = got.fields.collect { case f if !wantMap.contains(f.name) =>
      s"$table.${f.name} (${f.dataType}) NEW in data" }.toSeq
    val changed = want.collect {
      case (n, t) if gotMap.contains(n) && gotMap(n).catalogString != t.catalogString =>
        s"$table.$n CHANGED: engine expected $t, data now serves ${gotMap(n)}"
    }
    missing ++ extra ++ changed
  }

  for ((table, want) <- expected.toSeq.sortBy(_._1))
    test(s"normalized schema of `$table` is what the query registry was written against") {
      val got  = Tables(spark, sfDir, table).schema
      val diff = describeDiff(table, got, want)
      assert(diff.isEmpty,
        s"\nDRIVER DATA LAYOUT CHANGED — fix graft.queries.Tables (and any " +
        s"affected call sites) for:\n  ${diff.mkString("\n  ")}")
    }

  test("raw events.ts on disk is one of the three supported layouts") {
    val raw = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    assert(Seq[DataType](LongType, TimestampNTZType, TimestampType).exists(_.catalogString == raw.catalogString),
      s"\nevents.ts arrived as $raw — a FOURTH layout; teach " +
      "Tables.normalizeEventTs about it (one edit normalizes batch AND stream)")
  }

  test("every driver table at every scale factor is present") {
    for (sf <- testDataSfs; table <- expected.keys) {
      val path = s"${testData(sf)}/$table.parquet"
      assert(new java.io.File(path).exists(), s"$path vanished")
    }
  }
}
