package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Contract of [[Tables.normalizeEventTs]]: the SAME instants come
  * back as the SAME TimestampType micros from every on-disk layout
  * the driver has shipped — nanos-as-long, TIMESTAMP_NTZ micros, and
  * UTC-adjusted TIMESTAMP micros. This is the unit-level pin behind
  * the stream≡batch parity test in EventsPipelineSpec: any fourth
  * layout fails here with the layout named.
  */
final class TablesSpec extends SparkTestBase {

  // 2024-03-07 11:22:33.123456 UTC and an earlier instant, as micros
  private val micros = Seq(1709810553123456L, 1704067200000000L)

  test("nanos-as-long, NTZ-micros, and UTC-micros layouts normalize to identical instants") {
    import spark.implicits._
    val base = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")

    val asNanosLong = base.select(col("event_id"), (col("us") * 1000L).as("ts"))
    val asNtz       = base.select(col("event_id"),
      timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    val asUtc       = base.select(col("event_id"), timestamp_micros(col("us")).as("ts"))

    val dirs = Seq("nanos" -> asNanosLong, "ntz" -> asNtz, "utc" -> asUtc).map {
      case (name, df) =>
        val dir = tmpDir(s"tables-$name")
        df.write.mode("overwrite").parquet(dir)
        name -> dir
    }

    val expected = micros.sorted
    for ((name, dir) <- dirs) {
      val got = Tables.normalizeEventTs(spark.read.parquet(dir))
      assert(got.schema("ts").dataType == TimestampType,
        s"layout '$name': normalized type is ${got.schema("ts").dataType}")
      val vals = got.select(unix_micros(col("ts"))).as[Long].collect().sorted.toSeq
      assert(vals == expected,
        s"layout '$name': instants drifted — got $vals, want $expected")
    }
  }
}
