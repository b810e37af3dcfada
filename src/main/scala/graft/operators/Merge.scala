package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot evolution: the relational MERGE INTO / diff pair
  * for immutable-file corpora (the corpus-scale analogue of
  * `runs.ParquetTable.upsert`, which does the same anti-join ∪
  * incoming dance for the KB-scale runs ledger — and of the MERGE a
  * Delta/Iceberg table format would run transactionally).
  *
  * Scale shape: `upsert` is one keyed anti-join (target rows not
  * replaced) plus a union — the target never shuffles more than
  * once, and with both sides bucketed on the key it plans
  * shuffle-free. `diff` is one full-outer equi-join on the key.
  * Nothing driver-side at any size.
  */
object Merge {

  /** MERGE semantics by key: matched target rows take the source
    * version, unmatched target rows carry over, source-only rows
    * insert. Schemas must align by name. The source must be
    * key-unique (dedupe first if not) — duplicate source keys all
    * insert, which is the same contract SQL MERGE enforces with an
    * error.
    */
  def upsert(target: DataFrame, source: DataFrame, keyCols: Seq[String]): DataFrame =
    target.join(source, keyCols, "left_anti").unionByName(source)

  /** Snapshot diff by key: one row per key in either snapshot with
    * `status` ∈ added | removed | changed | unchanged, where
    * changed/unchanged compares `contentCol` null-safely.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keyCols: Seq[String],
           contentCol: String): DataFrame = {
    // explicit presence flags: a null CONTENT value must not read as
    // an absent ROW (they'd be indistinguishable from join nullness)
    val o = oldSnap.select(
      keyCols.map(col) :+ col(contentCol).as("__old") :+ lit(true).as("__in_old"): _*)
    val n = newSnap.select(
      keyCols.map(col) :+ col(contentCol).as("__new") :+ lit(true).as("__in_new"): _*)
    o.join(n, keyCols, "full_outer")
      .withColumn("status",
        when(col("__in_new").isNull, "removed")
          .when(col("__in_old").isNull, "added")
          .when(col("__old") <=> col("__new"), "unchanged")
          .otherwise("changed"))
      .select(keyCols.map(col) :+ col("status"): _*)
  }

  /** CDC changelog compaction: reduce an ordered stream of
    * insert/update/delete entries to the final table state. Per key,
    * the entry with the highest `seqCol` wins (the (key, seq) pair
    * must be unique — the usual CDC LSN/offset contract); if that
    * winning entry's `opCol` equals `deleteOp` the key is absent from
    * the result, so a later re-insert after a delete resurrects the
    * key naturally.
    *
    * Scale shape: one hash shuffle on the key feeding a partial
    * TakeOrdered-style window (row_number, rn=1) — the standard
    * "compact the changelog" reduction Debezium/Delta CDF consumers
    * run; no driver-side state, AQE-skew-splittable.
    */
  def applyChangelog(changelog: DataFrame, keyCols: Seq[String],
                     seqCol: String, opCol: String,
                     deleteOp: String = "D"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol).desc)
    changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= deleteOp)
      .drop("__rn", opCol)
  }

  /** CDC apply over a base snapshot: base rows behave as seq = −∞
    * inserts, so any changelog entry for a key supersedes the base
    * row (including a delete, which removes it). Base keys never
    * touched by the log carry over unchanged — one key-only
    * anti-join; the log compacts exactly as [[applyChangelog]].
    */
  def applyChangelog(base: DataFrame, changelog: DataFrame, keyCols: Seq[String],
                     seqCol: String, opCol: String, deleteOp: String): DataFrame = {
    val touched = changelog.select(keyCols.map(col): _*).distinct()
    val carried = base.join(touched, keyCols, "left_anti")
    carried.unionByName(
      applyChangelog(changelog, keyCols, seqCol, opCol, deleteOp)
        .select(base.columns.map(col).toIndexedSeq: _*))
  }

  /** Upsert a batch into a parquet path: read-if-exists ∪ merge,
    * MATERIALIZE to a fresh temp path (so the plan never reads the
    * path it is about to replace), then swap. The corpus-scale
    * mutable-table primitive behind the streaming MERGE sink; the
    * same documented caveat as `ParquetTable.writeAtomic` applies —
    * on raw object storage the swap wants a table format's atomic
    * commit (Delta/Iceberg MERGE is this function transactionally).
    */
  def upsertParquet(batch: DataFrame, tablePath: String, keyCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val path  = new org.apache.hadoop.fs.Path(tablePath)
    val fs    = path.getFileSystem(hconf)
    val merged =
      if (fs.exists(path)) upsert(spark.read.parquet(tablePath), batch, keyCols)
      else batch
    val tmp = new org.apache.hadoop.fs.Path(tablePath + s".tmp-${System.nanoTime()}")
    merged.write.mode("overwrite").parquet(tmp.toString)
    // Swap via rename-aside, never delete-then-rename: a crash between
    // a delete and the rename-in would lose the table outright (old
    // data gone, only the .tmp dir left). Renaming the live dir aside
    // first means every failure point leaves a recoverable copy, and
    // the unreadable window shrinks to the instant between the two
    // renames.
    val bak = new org.apache.hadoop.fs.Path(tablePath + s".bak-${System.nanoTime()}")
    val hadOld = fs.exists(path)
    if (hadOld && !fs.rename(path, bak))
      throw new java.io.IOException(s"rename $path -> $bak failed")
    if (!fs.rename(tmp, path)) {
      if (hadOld) fs.rename(bak, path) // best-effort restore of the old table
      throw new java.io.IOException(s"rename $tmp -> $path failed")
    }
    if (hadOld) fs.delete(bak, true)
  }
}
