package graft.operators

import graft.SparkTestBase

final class MergeSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val target = Seq(
    (1L, "alpha"), (2L, "beta"), (3L, "gamma")
  ).toDF("id", "body")

  test("upsert: matched keys take the source version, others carry over, new keys insert") {
    val source = Seq((2L, "BETA*"), (9L, "new")).toDF("id", "body")
    val out = Merge.upsert(target, source, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "alpha", 2L -> "BETA*", 3L -> "gamma", 9L -> "new"))
  }

  test("diff classifies added/removed/changed/unchanged; null content is not row absence") {
    val oldSnap = Seq((1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]),
      (4L, Some("d"))).toDF("id", "body")
    val newSnap = Seq((2L, Some("B")), (3L, None: Option[String]),
      (4L, Some("d")), (5L, None: Option[String])).toDF("id", "body")
    val out = Merge.diff(oldSnap, newSnap, Seq("id"), "body")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "removed",
      2L -> "changed",
      3L -> "unchanged", // null == null content, row present both sides
      4L -> "unchanged",
      5L -> "added"      // present-with-null-content is still PRESENT
    ))
  }

  test("upsertParquet: creates on first write, merges thereafter, leaves no temp dirs") {
    val dir = tmpDir("merge-upsert")
    val path = s"$dir/table"
    Merge.upsertParquet(Seq((1L, "a"), (2L, "b")).toDF("id", "body"), path, Seq("id"))
    Merge.upsertParquet(Seq((2L, "B2"), (5L, "e")).toDF("id", "body"), path, Seq("id"))
    val got = Merge.readUpsertTable(spark, path)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B2", 5L -> "e"))
    val leftovers = new java.io.File(dir).listFiles().map(_.getName)
      .filter(n => n.contains(".tmp-") || n.contains(".bak-"))
    assert(leftovers.isEmpty, s"staging/backup dirs not cleaned: ${leftovers.mkString(",")}")
  }

  /** (file name, md5 of bytes) for every data file under a dir tree. */
  private def fileHashes(dir: java.io.File): Map[String, String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet")).map { f =>
      val md = java.security.MessageDigest.getInstance("MD5")
      f.getName -> md.digest(java.nio.file.Files.readAllBytes(f.toPath))
        .map("%02x".format(_)).mkString
    }.toMap
  }

  test("upsertParquet: untouched partitions are never rewritten (byte-identical files)") {
    val dir = tmpDir("merge-prune")
    val path = s"$dir/table"
    val nParts = 8
    // 64 keys spread over all 8 hash partitions
    Merge.upsertParquet((1L to 64L).map(i => (i, s"v$i")).toDF("id", "body"),
      path, Seq("id"), nParts)
    val partDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__part=")).sortBy(_.getName)
    assert(partDirs.length == nParts, "expected every hash partition populated")
    val before = partDirs.map(d => d.getName -> fileHashes(d)).toMap

    // a single-key batch touches exactly one partition
    Merge.upsertParquet(Seq((7L, "V7*")).toDF("id", "body"), path, Seq("id"), nParts)
    val touchedPart = {
      import org.apache.spark.sql.functions.{pmod, xxhash64, lit}
      Seq(Tuple1(7L)).toDF("id")
        .select(pmod(xxhash64($"id"), lit(8L)).cast("int")).head.getInt(0)
    }
    val after = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__part="))
      .map(d => d.getName -> fileHashes(d)).toMap
    assert(after.keySet == before.keySet)
    before.foreach { case (name, hashes) =>
      if (name == s"__part=$touchedPart")
        assert(after(name) != hashes, "touched partition must be rewritten")
      else
        assert(after(name) == hashes,
          s"untouched partition $name was rewritten (files or bytes changed)")
    }
    // and the merge itself is correct
    val got = Merge.readUpsertTable(spark, path)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 64 && got(7L) == "V7*" && got(8L) == "v8")
  }

  test("upsertParquet: legacy flat table migrates to the partitioned layout on first upsert") {
    val dir = tmpDir("merge-legacy")
    val path = s"$dir/table"
    Seq((1L, "a"), (2L, "b")).toDF("id", "body").write.parquet(path) // flat layout
    Merge.upsertParquet(Seq((2L, "B2"), (5L, "e")).toDF("id", "body"), path, Seq("id"))
    assert(new java.io.File(path).listFiles().exists(_.getName.startsWith("__part=")),
      "migration should produce hash-partition directories")
    val got = Merge.readUpsertTable(spark, path)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B2", 5L -> "e"))
  }

  test("upsertParquet: mismatched nParts vs the table's layout is rejected") {
    val dir = tmpDir("merge-nparts")
    val path = s"$dir/table"
    Merge.upsertParquet((1L to 64L).map(i => (i, s"v$i")).toDF("id", "body"),
      path, Seq("id"), nParts = 64)
    val e = intercept[IllegalArgumentException] {
      Merge.upsertParquet(Seq((1L, "x")).toDF("id", "body"), path, Seq("id"), nParts = 8)
    }
    assert(e.getMessage.contains("fan-out"))
  }

  test("applyChangelog: highest seq wins, deletes drop the key, re-insert resurrects") {
    val log = Seq(
      // key 1: insert then update — latest update wins
      (1L, 1L, "I", "v1"), (1L, 2L, "U", "v2"),
      // key 2: insert then delete — absent
      (2L, 1L, "I", "x1"), (2L, 2L, "D", null.asInstanceOf[String]),
      // key 3: insert, delete, re-insert — resurrected with the new value
      (3L, 1L, "I", "y1"), (3L, 2L, "D", null.asInstanceOf[String]), (3L, 3L, "I", "y3"),
      // key 4: single delete for a never-seen key — absent, no error
      (4L, 1L, "D", null.asInstanceOf[String])
    ).toDF("id", "seq", "op", "body")
    val out = Merge.applyChangelog(log, Seq("id"), "seq", "op")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "v2", 3L -> "y3"))
  }

  test("applyChangelog over a base: base rows act as seq = -inf inserts") {
    val base = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "body")
    val log = Seq(
      (2L, 1L, "U", "BETA*"),                    // update a base key
      (3L, 1L, "D", null.asInstanceOf[String]),  // delete a base key
      (9L, 1L, "I", "new")                       // insert a fresh key
    ).toDF("id", "seq", "op", "body")
    val out = Merge.applyChangelog(base, log, Seq("id"), "seq", "op", "D")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "alpha", 2L -> "BETA*", 9L -> "new"))

    // equivalence: base+log == one log where base rows are min-seq inserts
    val asLog = base.select($"id", org.apache.spark.sql.functions.lit(Long.MinValue).as("seq"),
      org.apache.spark.sql.functions.lit("I").as("op"), $"body").unionByName(log)
    val viaOneLog = Merge.applyChangelog(asLog, Seq("id"), "seq", "op")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(viaOneLog == out)
  }

  test("applyChangelog: null seq ranks lowest — beaten by any non-null, all-null keys survive") {
    val log = Seq(
      // key 1: a null-seq entry must lose to the non-null update (the
      // window form's `desc nulls last`) — bare max_by(v, seq) would
      // make this nondeterministic
      (1L, Some(5L), "U", "winner"), (1L, None: Option[Long], "U", "null-seq"),
      // key 2: ALL entries null-seq — the key must still be present
      // (bare max_by ignores null ordering values and DROPS the key)
      (2L, None: Option[Long], "I", "only")
    ).toDF("id", "seq", "op", "body")
    val out = Merge.applyChangelog(log, Seq("id"), "seq", "op")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "winner", 2L -> "only"))
  }

  test("applyChangelog: keyCols resolve case-insensitively against the changelog") {
    val log = Seq((1L, 1L, "I", "v1"), (1L, 2L, "U", "v2"))
      .toDF("Id", "seq", "op", "body")
    // "id" vs the frame's "Id": the key must not leak into the value
    // struct (which would duplicate the output column)
    val out = Merge.applyChangelog(log, Seq("id"), "seq", "op")
    assert(out.columns.count(_.equalsIgnoreCase("id")) == 1)
    assert(out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap == Map(1L -> "v2"))
  }

  test("upsert then diff round-trip: the diff of target vs upserted is exactly the batch") {
    val source = Seq((2L, "BETA*"), (9L, "new")).toDF("id", "body")
    val merged = Merge.upsert(target, source, Seq("id"))
    val out = Merge.diff(target, merged, Seq("id"), "body")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged", 9L -> "added"))
  }
}
