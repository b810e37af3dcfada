package graft

import org.apache.spark.sql.functions._

import graft.functions.{DotProduct, VectorOps}

final class GraftFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("SQL registration: every function callable from spark.sql") {
    GraftFunctions.register(spark)
    Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f), Array("a", "b", "a", "c")))
      .toDF("x", "y", "toks")
      .createOrReplaceTempView("vfns")

    val row = spark.sql(
      """SELECT dot_product(x, y) AS dp,
        |  cosine_sim(x, x) AS cs,
        |  simhash(toks) AS sh,
        |  size(minhash(toks, 8)) AS mh,
        |  size(shingles(toks, 2)) AS sg,
        |  content_fingerprint(toks) AS fp,
        |  size(hyperplane_sketches(x, 3, 4, 6, 42)) AS hp,
        |  glob_match('a/foo/bar', 'a/*/bar') AS gm,
        |  glob_match('a/foo/x/bar', 'a/*/bar') AS gm2,
        |  glob_extract('a/foo/bar', 'a/*/bar', 1) AS gx
        |FROM vfns""".stripMargin).head()

    assert(math.abs(row.getAs[Double]("dp") - 32.0) < 1e-12)
    assert(math.abs(row.getAs[Double]("cs") - 1.0) < 1e-12)
    assert(row.getAs[Int]("mh") == 8)
    assert(row.getAs[Int]("sg") == 3) // a b | b a | a c
    assert(row.getAs[Int]("hp") == 6) // one sketch per table
    assert(row.getAs[Boolean]("gm"))
    assert(!row.getAs[Boolean]("gm2")) // * must not cross '/'
    assert(row.getAs[String]("gx") == "foo")
  }

  test("weighted_mean UDAF registered for SQL") {
    GraftFunctions.register(spark)
    Seq((1.0, 1.0), (3.0, 3.0)).toDF("x", "w").createOrReplaceTempView("wm")
    val r = spark.sql("SELECT weighted_mean(x, w) FROM wm").head().getDouble(0)
    assert(math.abs(r - 2.5) < 1e-12) // (1*1 + 3*3) / 4
  }

  test("dot_product equals the composable higher-order form bit-for-bit") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").as("v"))
      .limit(50)
    val both = df.select(
      DotProduct(col("v"), col("v")).as("fast"),
      VectorOps.dot(col("v"), col("v")).as("hof"))
    assert(both.filter(col("fast") =!= col("hof")).isEmpty)
  }

  test("int_dot_product equals the composable long-accumulator form exactly") {
    val df = graft.ann.Quantize.int8(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
          .select(col("vec_id").as("id"), col("embedding").as("vec")))
      .select(col("qvec").as("q"))
      .limit(50)
    val hof = org.apache.spark.sql.functions.aggregate(
      org.apache.spark.sql.functions.zip_with(col("q"), col("q"),
        (x, y) => x.cast("long") * y.cast("long")),
      org.apache.spark.sql.functions.lit(0L), (acc, v) => acc + v)
    val both = df.select(
      graft.functions.IntDotProduct(col("q"), col("q")).as("fast"), hof.as("hof"))
    assert(both.filter(col("fast") =!= col("hof")).isEmpty)
    // self-dot of a quantized vector is positive for any nonzero vector
    assert(both.filter(col("fast") <= 0L).isEmpty)
  }

  test("extensions class injects functions into a fresh session") {
    val s2 = spark.newSession()
    new GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions())
    // injection API itself is exercised via builder config in prod;
    // here just confirm the builders produce working expressions
    GraftFunctions.register(s2)
    assert(s2.sql("SELECT glob_match('x', '*')").head().getBoolean(0))
  }
}
