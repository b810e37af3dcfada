package graft.ann

import org.apache.spark.sql.functions._

import graft.SparkTestBase

final class ProjectionSpec extends SparkTestBase {
  import spark.implicits._

  test("matrix cells are exactly ±1/√outDim and stable across calls") {
    val r0 = Projection.matrixRow(64, 16, "v3", 0)
    assert(r0.length == 64)
    assert(r0.forall(x => x == 0.25f || x == -0.25f))
    assert(r0.sameElements(Projection.matrixRow(64, 16, "v3", 0)))
    // distinct seeds / rows actually differ
    assert(!r0.sameElements(Projection.matrixRow(64, 16, "v3", 1)))
    assert(!r0.sameElements(Projection.matrixRow(64, 16, "other", 0)))
  }

  test("basis vector e_i projects to column i of the matrix") {
    val dim = 8; val out = 4
    val e2 = Array.tabulate(dim)(i => if (i == 2) 1.0f else 0.0f)
    val got = Seq(Tuple1(e2)).toDF("vec")
      .select(Projection.project(col("vec"), dim, out, "s").as("y"))
      .collect().head.getSeq[Double](0)
    val expected = (0 until out).map(j => Projection.matrixRow(dim, out, "s", j)(2).toDouble)
    assert(got == expected)
  }

  test("projection is deterministic under repartitioning") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run(d: org.apache.spark.sql.DataFrame) = d
      .select(col("vec_id"), Projection.project(col("embedding"), 64, 16, "v3").as("y"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(run(df) == run(df.repartition(13)))
  }

  test("JL quality on the fixture: norms and pairwise cosines are preserved") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .orderBy("vec_id").limit(40)
      .select(col("vec_id"), col("embedding"),
        Projection.project(col("embedding"), 64, 16, "v3").as("y"))
      .collect()
      .map(r => (r.getSeq[Float](1).map(_.toDouble).toArray,
                 r.getSeq[Double](2).toArray))
    def norm(a: Array[Double]) = math.sqrt(a.map(x => x * x).sum)
    def cos(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum / (norm(a) * norm(b))
    // E[‖y‖²] = ‖x‖² for ±1/√k matrices; at k=16 allow 2× either way
    vecs.foreach { case (x, y) =>
      val ratio = norm(y) / norm(x)
      assert(ratio > 0.5 && ratio < 2.0, s"norm ratio $ratio out of bounds")
    }
    // cosine distortion: mean abs error small, no catastrophic flip
    val errs = for {
      i <- vecs.indices; j <- (i + 1) until vecs.length
    } yield math.abs(cos(vecs(i)._1, vecs(j)._1) - cos(vecs(i)._2, vecs(j)._2))
    val mean = errs.sum / errs.size
    assert(mean < 0.25, s"mean cosine distortion $mean")
    // k=16 is an aggressive compression: the worst fixture pair sits
    // at 0.760 (deterministic — fixed matrix, fixed fixture); the
    // bound asserts no sign-flipping catastrophe, not tight JL
    assert(errs.max < 0.85, s"max cosine distortion ${errs.max}")
  }
}
