package graft.tools

import org.apache.spark.sql.SparkSession

/** Offline tuning harness for the d5 LSH blocking parameters.
  *
  * Collects the (small) embeddings fixtures and, in pure Scala,
  * replicates `functions.HyperplaneSketches`'s plane generation
  * (`scala.util.Random(seed + table)`, `planes × dim` Gaussians in
  * plane-major order) to measure, per (planes, tables, seed) config:
  * recall of the banded candidates against the exact ≥ τ pair set,
  * and candidate volume vs all-pairs. Not part of the library
  * surface — a measurement tool.
  */
object TuneD5 {

  final case class Fixture(name: String, ids: Array[Long], vecs: Array[Array[Float]],
                           exact: Array[(Int, Int)]) {
    val n: Int = ids.length
    val allPairs: Long = n.toLong * (n - 1) / 2
  }

  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args.toSeq
                 else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val tau = 0.45
    val dim = 64

    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fixtures = sfDirs.map { d =>
      val rows = spark.read.parquet(s"$d/embeddings.parquet")
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        .sortBy(_._1)
      val ids = rows.map(_._1)
      val vecs = rows.map(_._2)
      val norms = vecs.map(v => math.sqrt(v.map(x => x.toDouble * x).sum))
      val exact = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
      for (i <- vecs.indices; j <- (i + 1) until vecs.length) {
        var dot = 0.0
        var k = 0
        while (k < dim) { dot += vecs(i)(k).toDouble * vecs(j)(k); k += 1 }
        if (dot / (norms(i) * norms(j)) >= tau) exact += ((i, j))
      }
      println(s"$d: n=${ids.length} exact pairs=${exact.size}")
      Fixture(d.split('/').last, ids, vecs, exact.toArray)
    }
    spark.stop()

    val maxTables = 64
    val tableCounts = Seq(16, 24, 32, 48, 64)

    for (planes <- Seq(3, 4, 5, 6, 8)) {
      var reported = 0
      var seed = 42L
      while (reported < 4 && seed < 42L + 60) {
        // per fixture: sketches[table][row]
        val sketchesPerFixture = fixtures.map { f =>
          Array.tabulate(maxTables) { t =>
            val rnd = new scala.util.Random(seed + t)
            val mat = Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
            val out = new Array[Long](f.n)
            var i = 0
            while (i < f.n) {
              var bits = 0L
              var p = 0
              while (p < planes) {
                var dot = 0.0
                var k = 0
                val pl = mat(p); val v = f.vecs(i)
                while (k < dim) { dot += v(k) * pl(k); k += 1 }
                if (dot >= 0) bits |= (1L << p)
                p += 1
              }
              out(i) = bits
              i += 1
            }
            out
          }
        }
        for (tables <- tableCounts) {
          val perFixture = fixtures.zip(sketchesPerFixture).map { case (f, sk) =>
            val missed = f.exact.count { case (i, j) =>
              !(0 until tables).exists(t => sk(t)(i) == sk(t)(j))
            }
            // candidate volume: sum over tables of sum_buckets C(size,2)
            var cand = 0L
            var t = 0
            while (t < tables) {
              val counts = new scala.collection.mutable.HashMap[Long, Long]()
              sk(t).foreach(b => counts.update(b, counts.getOrElse(b, 0L) + 1))
              counts.values.foreach(c => cand += c * (c - 1) / 2)
              t += 1
            }
            (f, missed, cand)
          }
          if (perFixture.forall(_._2 == 0)) {
            val summary = perFixture.map { case (f, _, cand) =>
              f"${f.name}: cand=${cand}%d (${cand * 100.0 / f.allPairs}%.0f%% of ${f.allPairs})"
            }.mkString("  ")
            println(s"RECALL-1.0 planes=$planes tables=$tables seed=$seed  $summary")
            reported += 1
          }
        }
        seed += 1
      }
      if (reported == 0) println(s"planes=$planes: no recall-1.0 config in seed range")
    }
  }
}
