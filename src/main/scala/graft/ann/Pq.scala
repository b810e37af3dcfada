package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{PqAdc, VectorOps}

/** Product quantization (PQ) — the compressed-index half of the
  * canonical billion-scale ANN design (IVF for the coarse partition,
  * PQ for the in-cell scan; Jégou et al., TPAMI 2011 / FAISS
  * `IndexIVFPQ`).
  *
  * The vector is split into `m` contiguous subspaces of `dim/m`
  * elements; each subspace gets its own `ksub`-centroid codebook
  * (per-subspace k-means, trained with the same deterministic recipe
  * as [[Ann.kmeansCentroids]]: md5-hash-sampled seeds, fixed
  * iteration count, round-6 double means — so any engine retrains
  * bit-identical codebooks). A vector is stored as `m` small codes —
  * at the measured gate config (m=16, ksub=64; tools/TunePq) that is
  * 16 six-bit codes standing in for 64 floats: 256 B → 12 B of true
  * entropy (21×) for a packing writer, 72 B (3.5×) as the raw int
  * array the codegen kernel reads. Quantization grain is the
  * caller's dial: isotropic fixtures need this much resolution to
  * hold exactness gates; real clustered embeddings get away with
  * far coarser books (the classic m=8, ksub=256 byte-code layout).
  *
  * Search is asymmetric (ADC): the query stays full-precision; per
  * query one `m·ksub` lookup table of subspace dot products is built
  * against the codebooks, and each candidate's approximate dot is
  * `Σₘ lut[codes[m]]` — the [[graft.functions.PqAdc]] fused loop,
  * `m` array reads instead of `dim` multiplies, over an index 32×
  * smaller than the raw vectors. ADC ranks candidates; the top
  * `rerank ≫ k` are re-scored on the exact float path, so (with
  * rerank slack, spec-checked like SQ8's) the OUTPUT equals exact
  * search over the same candidate cells while full-precision vectors
  * are touched for only `rerank` rows per query.
  *
  * Scale shape: codebooks are a broadcast-sized literal table
  * (m·ksub·(dim/m) doubles); encoding is one broadcast join + a
  * map-side argmin, no shuffle of the corpus beyond the groupBy id
  * that assembles code arrays; stage-1 serving scans ONLY
  * (id, codes, nrm) — the property [[saveIvfPqIndex]] materializes
  * and `PqSpec` asserts on the plan.
  */
object Pq {

  /** Per-subspace codebooks: (sub, code, cent: array<double>) with
    * `code` a GLOBAL lut index in [sub·ksub, (sub+1)·ksub) — see
    * [[graft.functions.PqAdc]] for why global beats stride math.
    *
    * Determinism (what makes an operator built on this oracle-able):
    * seeds are, per subspace, the `ksub` subvectors of the vectors
    * with the smallest md5(id) (the [[Ann.kmeansCentroids]] recipe —
    * the SAME seed vectors in every subspace, so one hash ranking
    * drives all m codebooks); assignment argmin breaks ties toward
    * the lowest code; means are rounded to 6 decimals; the iteration
    * count is fixed. A code that loses all members disappears —
    * encode can never emit it, and the ADC lut fills its slot with a
    * hole that is never read.
    */
  def trainCodebooks(vecs: DataFrame, m: Int, ksub: Int, iters: Int): DataFrame = {
    val sub = subVectors(vecs, m)
    val hashed = vecs.select(col("id"),
      graft.functions.Md5Bucket60(
        concat_ws("|", lit("pq"), col("id").cast("string"))).as("hkey"))
    val seedW = Window.orderBy(col("hkey"), col("id"))
    val seedIds = hashed.orderBy(col("hkey"), col("id")).limit(ksub)
      .withColumn("cidx", (row_number().over(seedW) - 1).cast("int"))
      .select(col("id"), col("cidx"))
    var books = sub.join(broadcast(seedIds), Seq("id"))
      .select(col("sub"), (col("sub") * ksub + col("cidx")).as("code"),
        transform(col("svec"), x => round(x.cast("double"), 6)).as("cent"))
    for (_ <- 1 to iters) {
      val assigned = assignCodes(sub, books)
      books = sub.join(assigned, Seq("id", "sub"))
        .select(col("sub"), col("code"), posexplode(col("svec")).as(Seq("pos", "x")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(round(avg(col("x").cast("double")), 6).as("mu"))
        .groupBy(col("sub"), col("code"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mu")))).as("pm"))
        .select(col("sub"), col("code"),
          transform(col("pm"), p => p.getField("mu")).as("cent"))
        .localCheckpoint(false)
    }
    books
  }

  /** Probe-cell assignment for external measurement tools: the
    * [[Ann.assignN]] top-`nprobe` coarse cells per query, projected
    * to (query_id, cell).
    */
  def probeCells(queries: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame =
    Ann.assignN(queries, centroids, nprobe, "query_id", "qvec", "qnorm")
      .select(col("query_id"), col("cell"))

  /** PQ-encode: (id, vec) → (id, codes: array<int>) where `codes(s)`
    * is the global lut index of subspace s's nearest codebook entry
    * (L2 argmin, ties to the lowest code). One broadcast join; the
    * only shuffle is the m→1 groupBy that assembles each id's code
    * array.
    */
  def encode(vecs: DataFrame, codebooks: DataFrame, m: Int): DataFrame =
    assignCodes(subVectors(vecs, m), codebooks)
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("sub"), col("code")))).as("sc"))
      .select(col("id"), transform(col("sc"), p => p.getField("code")).as("codes"))

  // (id, sub, svec): vec split into m contiguous subspaces. slice is
  // 1-indexed; svec keeps the source element type (float), cast to
  // double inside the fused dot like every other scoring path.
  private def subVectors(vecs: DataFrame, m: Int): DataFrame =
    vecs.select(col("id"), explode(sequence(lit(0), lit(m - 1))).as("sub"),
        col("vec"))
      .select(col("id"), col("sub"),
        slice(col("vec"), col("sub") * subDim(col("vec"), m) + lit(1),
          subDim(col("vec"), m)).as("svec"))

  // dim/m as an int column (Spark's `/` on columns is double division)
  private def subDim(vec: org.apache.spark.sql.Column, m: Int) =
    (size(vec) / m).cast("int")

  // argmin-L2 codebook assignment per (id, sub): ‖x−c‖² ordering ≡
  // (‖c‖² − 2·x·c) ordering (‖x‖² is constant per row), so the scan
  // needs one fused dot per candidate and no per-pair allocation.
  // Ties break to the lowest code via the struct-max trick
  // ([[Ann.assignCells]]): max of (-score, -code) picks min score
  // then min code.
  private def assignCodes(sub: DataFrame, codebooks: DataFrame): DataFrame = {
    val books = broadcast(codebooks.select(col("sub"), col("code"), col("cent"),
      VectorOps.dot(col("cent"), col("cent")).as("cn2")))
    sub.join(books, Seq("sub"))
      .select(col("id"), col("sub"),
        struct(
          (lit(2.0) * VectorOps.fdot(col("svec"), col("cent")) - col("cn2")).as("negd"),
          (-col("code")).as("negcode"), col("code")).as("sc"))
      .groupBy(col("id"), col("sub"))
      .agg(max(col("sc")).as("best"))
      .select(col("id"), col("sub"), col("best.code").as("code"))
  }

  /** Per-query ADC lookup table: (query_id, qvec, qnorm, lut) where
    * `lut` has length m·ksub and `lut(sub·ksub + code) =
    * dot(q_sub, cent)`. Dead-code slots hold 0.0 — encode never
    * emits them, so the value is never read. Queries are the
    * broadcast-sized side; the HOF form is fine here (it runs once
    * per query, not per pair).
    */
  def adcLut(queries: DataFrame, codebooks: DataFrame, m: Int, ksub: Int): DataFrame = {
    val books = broadcast(codebooks.select(col("sub"), col("code"), col("cent")))
    val q = queries.select(col("id").as("query_id"), col("vec").as("qvec"),
      VectorOps.fnorm(col("vec")).as("qnorm"))
    q.join(books)
      .select(col("query_id"), col("qvec"), col("qnorm"), col("code"),
        VectorOps.fdot(
          slice(col("qvec"), col("sub") * subDim(col("qvec"), m) + lit(1),
            subDim(col("qvec"), m)),
          col("cent")).as("lv"))
      .groupBy(col("query_id"), col("qvec"), col("qnorm"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("code"), col("lv"))))).as("lm"))
      .select(col("query_id"), col("qvec"), col("qnorm"),
        transform(sequence(lit(0), lit(m * ksub - 1)),
          i => coalesce(element_at(col("lm"), i), lit(0.0))).as("lut"))
  }

  /** Full-corpus PQ search: ADC-rank every (query, corpus) pair over
    * the compressed index, exact-re-rank the top `rerank`. With
    * rerank slack the output EQUALS [[Ann.bruteForceTopK]]
    * (spec-checked) — a1's oracle gates it verbatim, the SQ8
    * pattern at 32× (vs 4×) scan compression.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, codebooks: DataFrame,
             k: Int, m: Int, ksub: Int, rerank: Int = 64): DataFrame = {
    val cIdx = encode(corpus, codebooks, m)
      .join(corpus.select(col("id"), VectorOps.fnorm(col("vec")).as("nrm")), Seq("id"))
      .select(col("id").as("nbr_id"), col("codes"), col("nrm").as("cnorm"))
    val qIdx = adcLut(queries, codebooks, m, ksub)
    rerankStage(adcStage(cIdx, qIdx, rerank), corpus, queries, k)
  }

  /** IVF·PQ: coarse-probe `nprobe` cells ([[Ann.assignN]], the a3/a5
    * structure), ADC-rank ONLY the probed cells' members on the
    * compressed index, exact-re-rank the top `rerank`. With rerank
    * slack the output EQUALS [[Ann.ivfTopK]] over the same centroids
    * (spec-checked) — so a3's full-replay oracle gates the whole
    * composition, and the approximation surface the caller reasons
    * about stays exactly IVF's structural recall (probed-cell
    * misses), not PQ error.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
                codebooks: DataFrame, k: Int, m: Int, ksub: Int,
                nprobe: Int = 2, rerank: Int = 64): DataFrame = {
    val cells = Ann.ivfAssignments(corpus, centroids)
    val cIdx = cells.select(col("cell"), col("id"), col("nrm"))
      .join(encode(corpus, codebooks, m), Seq("id"))
      .select(col("cell"), col("id").as("nbr_id"), col("codes"),
        col("nrm").as("cnorm"))
    val qIdx = Ann.assignN(queries, centroids, nprobe, "query_id", "qvec", "qnorm")
      .select(col("query_id"), col("cell"))
      .join(adcLut(queries, codebooks, m, ksub), Seq("query_id"))
    rerankStage(adcStage(cIdx, qIdx, rerank, joinKeys = Seq("cell")),
      corpus, queries, k)
  }

  /** Persist an IVF·PQ index: `<prefix>_centroids` + `<prefix>_books`
    * (both broadcast-tiny), `<prefix>_codes` (cell, id, codes, nrm —
    * the stage-1 scan table, cell-bucketed so probes join without a
    * shuffle, NO vector column: this table is what a 100 TB serving
    * scan reads, at ~1/32 of the raw bytes), and `<prefix>_vecs`
    * (id, vec, nrm — touched only by the rerank semi-join,
    * id-bucketed). `append` encodes a new batch against the FROZEN
    * centroids + codebooks — the [[Ann.saveIvfIndex]] contract: a
    * growing corpus is assigned and encoded once, ever.
    */
  def saveIvfPqIndex(corpus: DataFrame, centroids: DataFrame, codebooks: DataFrame,
                     tablePrefix: String, m: Int, nBuckets: Int = 32,
                     append: Boolean = false): Unit = {
    if (!append) {
      centroids.select(col("cell"), col("vec"))
        .write.mode("overwrite").format("parquet")
        .saveAsTable(s"${tablePrefix}_centroids")
      codebooks.select(col("sub"), col("code"), col("cent"))
        .write.mode("overwrite").format("parquet")
        .saveAsTable(s"${tablePrefix}_books")
    }
    val cells = Ann.ivfAssignments(corpus, centroids)
    cells.select(col("cell"), col("id"), col("nrm"))
      .join(encode(corpus, codebooks, m), Seq("id"))
      .select(col("cell"), col("id"), col("codes"), col("nrm"))
      .write.mode(if (append) "append" else "overwrite")
      .bucketBy(nBuckets, "cell").format("parquet")
      .saveAsTable(s"${tablePrefix}_codes")
    cells.select(col("id"), col("vec"), col("nrm"))
      .write.mode(if (append) "append" else "overwrite")
      .bucketBy(nBuckets, "id").format("parquet")
      .saveAsTable(s"${tablePrefix}_vecs")
  }

  /** [[ivfPqTopK]] against a PRECOMPUTED [[saveIvfPqIndex]] index:
    * stage 1 reads ONLY `<prefix>_codes` — no vector column exists in
    * that table, so the compressed-scan property holds by storage
    * construction, not just projection (PqSpec asserts the stage-1
    * subtree's ReadSchema). Full vectors enter via the rerank join
    * against `<prefix>_vecs`, `rerank` rows per query.
    */
  def ivfPqTopKIndexed(spark: SparkSession, tablePrefix: String, queries: DataFrame,
                       k: Int, m: Int, ksub: Int, nprobe: Int = 2,
                       rerank: Int = 64): DataFrame = {
    val centroids = spark.table(s"${tablePrefix}_centroids")
    val books     = spark.table(s"${tablePrefix}_books")
    val cIdx = spark.table(s"${tablePrefix}_codes")
      .select(col("cell"), col("id").as("nbr_id"), col("codes"),
        col("nrm").as("cnorm"))
    val qIdx = Ann.assignN(queries, centroids, nprobe, "query_id", "qvec", "qnorm")
      .select(col("query_id"), col("cell"))
      .join(adcLut(queries, books, m, ksub), Seq("query_id"))
    val vecs = spark.table(s"${tablePrefix}_vecs")
      .select(col("id"), col("vec"), col("nrm"))
    rerankFromVecs(adcStage(cIdx, qIdx, rerank, joinKeys = Seq("cell")),
      vecs, queries, k)
  }

  // stage 1: ADC-score the (broadcast query × candidate) product —
  // equi-keyed on `joinKeys` when probing cells, the full product
  // when scanning — and keep the top `rerank` ids per query with the
  // bounded TopKAgg (map-side combine; ≤rerank rows per query per
  // partition cross the shuffle, never the scored product).
  private def adcStage(cIdx: DataFrame, qIdx: DataFrame, rerank: Int,
                       joinKeys: Seq[String] = Nil): DataFrame = {
    val q = broadcast(qIdx.select(
      (col("query_id") +: joinKeys.map(col)) :+ col("lut"): _*))
    val joined =
      if (joinKeys.isEmpty) cIdx.join(q, col("query_id") =!= col("nbr_id"))
      else cIdx.join(q, joinKeys).filter(col("query_id") =!= col("nbr_id"))
    joined
      .withColumn("qsim", PqAdc(col("codes"), col("lut")) / col("cnorm"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.distinct(col("qsim"), col("nbr_id"), rerank).as("top"))
      .select(col("query_id"), explode(col("top.tag")).as("nbr_id"))
  }
  // (qnorm divides identically on every candidate of a query — it
  // cannot change the per-query ADC ranking, so stage 1 skips it.)

  // stage 2: bare (query, nbr) id pairs pull full-precision vectors
  // back in; exact cosine; final top-k — byte-identical scoring to
  // bruteForceTopK/ivfTopK, which is what makes the exact oracles
  // transfer.
  private def rerankStage(cands: DataFrame, corpus: DataFrame,
                          queries: DataFrame, k: Int): DataFrame =
    rerankFromVecs(cands,
      corpus.select(col("id"), col("vec"), VectorOps.fnorm(col("vec")).as("nrm")),
      queries, k)

  private def rerankFromVecs(cands: DataFrame, vecs: DataFrame,
                             queries: DataFrame, k: Int): DataFrame = {
    val rescored = cands
      .join(vecs.select(col("id").as("nbr_id"), col("vec").as("cvec"),
        col("nrm").as("cnorm")), Seq("nbr_id"))
      .join(broadcast(queries.select(col("id").as("query_id"), col("vec").as("qv"),
        VectorOps.fnorm(col("vec")).as("qnorm"))), Seq("query_id"))
      .withColumn("sim",
        VectorOps.cosinePre(col("qv"), col("cvec"), col("qnorm"), col("cnorm")))
    Ann.topK(rescored, k, dedup = true)
  }
}
