package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.ZOrder

final class ZOrderSpec extends SparkTestBase {

  import spark.implicits._

  test("zValue interleaves bits round-robin") {
    val got = Seq((1L, 0L), (0L, 1L), (3L, 3L), (2L, 3L), (5L, 2L))
      .toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), bits = 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // bit b of x -> position 2b, bit b of y -> position 2b+1
    // (1,0)->1; (0,1)->2; (3,3)->15; (2,3)->14; (5,2)->x:1|16, y:8 = 25
    assert(got == Seq(1L, 2L, 15L, 14L, 25L))
  }

  test("bucketed reduces keys to the bit budget without breaking low-bit locality") {
    val got = Seq((1048577L, 3L)) // 2^20 + 1 folds to 1
      .toDF("x", "y")
      .select(ZOrder.bucketed(Seq(col("x"), col("y")), bits = 20).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // x=1 -> bit at pos 0; y=3 -> bits at pos 1 and 3
    assert(got == Seq(1L | 2L | 8L))
  }

  test("zValueSql mirrors the column arithmetic") {
    val sql = ZOrder.zValueSql(Seq("x", "y"), bits = 4)
    val viaSql = Seq((5L, 2L), (9L, 14L), (15L, 0L))
      .toDF("x", "y")
      .selectExpr(s"CAST($sql AS BIGINT) AS z")
      .collect().map(_.getLong(0)).toSeq
    val viaCols = Seq((5L, 2L), (9L, 14L), (15L, 0L))
      .toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), bits = 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCols)
  }

  test("z-ordered layout gives tighter multi-dim file boxes than a range sort") {
    // a full 64x64 grid: every (x, y) once
    val grid = spark.range(4096)
      .select((col("id") % 64).as("x"), expr("id div 64").as("y"))

    val zPath = tmpDir("zorder") + "/z"
    val rPath = tmpDir("zorder") + "/r"
    Sinks.zOrderedParquet(grid, zPath, nFiles = 16, bits = 6, col("x"), col("y"))
    Sinks.rangeClusteredParquet(grid, rPath, 16, col("x"), col("y"))

    // per-file min/max boxes — exactly what parquet footer stats give
    // a reader; a file is prunable for a predicate iff its box misses
    def boxes(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("minx"), max("x").as("maxx"),
        min("y").as("miny"), max("y").as("maxy"))
      .collect()

    // the box predicate a time+key or geo query makes: y in [8, 15],
    // any x. The range layout sorted on (x, y) scatters every y range
    // across ALL files; the z layout confines it to the files whose
    // curve quadrant intersects.
    def hits(path: String): Int =
      boxes(path).count(r => !(r.getAs[Long]("maxy") < 8 || r.getAs[Long]("miny") > 15))

    val (zHits, rHits) = (hits(zPath), hits(rPath))
    val zFiles = boxes(zPath).length
    assert(zFiles >= 8, s"expected ~16 z files, got $zFiles")
    assert(rHits >= 12, s"range layout should leave y unpruned nearly everywhere; got $rHits")
    assert(zHits * 2 <= rHits,
      s"z-order should prune at least 2x better on the non-leading dim: z=$zHits range=$rHits")

    // layout must not change the data
    assert(spark.read.parquet(zPath).count() == 4096L)
    val sums = spark.read.parquet(zPath).agg(sum("x"), sum("y")).head
    val rsums = spark.read.parquet(rPath).agg(sum("x"), sum("y")).head
    assert(sums == rsums)
  }
}
