package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two strategies:
  *   - [[bruteForceTopK]] — exact: broadcast the (small) query set
  *     against the corpus, one scan, windowed top-k. The correctness
  *     baseline and the right plan whenever |queries| is small enough
  *     to broadcast (the common case: a query batch vs a 100 TB
  *     corpus — embarrassingly parallel, no shuffle of the corpus).
  *   - [[lshTopK]] — signed-random-hyperplane bucketing: corpus and
  *     queries are bucketed by sketch; only same/near buckets are
  *     compared (a bucket equi-join instead of a cross product),
  *     trading recall for a corpus-sized shuffle-free probe. Multi-
  *     probe (flipping each sketch bit) recovers most recall.
  */
object Ann {

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param corpus  (id, vec) rows
    * @param queries (id, vec) rows — must be broadcast-sized
    */
  /** Spread a compute-dense scoring input across the session's
    * shuffle-partition count. Spark sizes scan splits by BYTES, but
    * the broadcast-product / sketch passes below cost
    * O(|broadcast| · dim) or O(tables · planes · dim) work PER ROW —
    * a byte-small input (one parquet split, or the 1-partition result
    * of an orderBy+limit sample) serializes the whole pass onto one
    * core (measured at sf0.1: v4's 2M-cosine exact pair scoring ran
    * as one 1.2 s task on a 32-core session; d17's 601-table sketch
    * emission likewise). A no-op whenever the input already has at
    * least the configured parallelism — at 100 TB the scan arrives
    * with thousands of splits and nothing is shuffled — so the extra
    * exchange exists exactly where it buys core-count speedup over a
    * bounded relation (guide §2.5 "input skew": one unsplittable
    * input, repartition after the read).
    */
  private[graft] def spread(df: DataFrame): DataFrame =
    graft.core.Partitioning.spread(df)

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = spread(corpus).select(
      col("id").as("nbr_id"), col("vec").as("cvec"),
      VectorOps.fnorm(col("vec")).as("cnorm"))
    val q = queries.select(
      col("id").as("query_id"), col("vec").as("qvec"),
      VectorOps.fnorm(col("vec")).as("qnorm"))
    val scored = c
      .join(broadcast(q), col("query_id") =!= col("nbr_id"))
      .withColumn("sim",
        VectorOps.cosinePre(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")))
    // bounded map-side top-k (TopKAgg), not a row_number window: the
    // window would shuffle + totally sort the |corpus|×|queries|
    // scored product; the aggregator ships ≤k rows per query per
    // partition (same (sim desc, nbr_id asc) order)
    topK(scored, k)
  }

  // shared tail of every top-k search: per-query bounded aggregation
  // over (query_id, nbr_id, sim) candidates → (query_id, nbr_id,
  // sim, rank), ranked (sim desc, nbr_id asc) exactly like the
  // row_number window it replaces. `dedupTags` additionally keeps one
  // (best) entry per nbr — subsuming a dropDuplicates(query, nbr)
  // that would otherwise shuffle the candidate multiset with its
  // wide vector payloads still attached.
  private[ann] def topK(scored: DataFrame, k: Int,
                        dedup: Boolean = false): DataFrame = {
    val agg =
      if (dedup) graft.functions.TopKAgg.distinct(col("sim"), col("nbr_id"), k)
      else graft.functions.TopKAgg(col("sim"), col("nbr_id"), k)
    scored
      .groupBy(col("query_id"))
      .agg(agg.as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.tag").as("nbr_id"),
        col("t.score").as("sim"), (col("pos") + 1).as("rank"))
  }

  /** Two-stage SQ8 search: stage 1 ranks every (query, corpus) pair
    * by the int8-quantized dot product — EXACT integer arithmetic
    * over the 4×-compressed representation ([[Quantize.int8]]), so
    * at scale the scoring scan reads a quarter of the bytes and does
    * integer (SIMD-friendly) math — and keeps the top `rerank` ids
    * per query. Stage 2 re-joins ONLY those ids to the full-precision
    * vectors (bare id pairs cross the shuffle, never payloads) and
    * re-ranks by exact cosine. With `rerank` ≫ k the quantized
    * candidate set contains the exact top-k (spec-checked against
    * [[bruteForceTopK]] on the gate fixtures), so the output EQUALS
    * brute force while the full-precision vectors are touched for
    * only `rerank` rows per query.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    rerank: Int = 64): DataFrame = {
    def enc(df: DataFrame) = df
      .join(Quantize.int8(df, "id", "vec").select(col("id"), col("scale"), col("qvec")),
        Seq("id"))
      .select(col("id"), col("vec"), col("scale"), col("qvec"),
        VectorOps.fnorm(col("vec")).as("nrm"))
    val c = enc(corpus)
    val q = enc(queries)
    // stage 1 reads only the quantized index (qvec, scale, nrm) —
    // the full float vectors stay out of the broadcast product
    val cIdx = c.select(col("id").as("nbr_id"), col("qvec").as("cq"),
      col("scale").as("cscale"), col("nrm").as("cnorm"))
    val qIdx = q.select(col("id").as("query_id"), col("qvec").as("qq"),
      col("scale").as("qscale"), col("nrm").as("qnorm"))
    // fused codegen integer dot (graft.functions.IntDotProduct): the
    // composable aggregate(zip_with(...)) form allocates per pair and
    // interprets its lambdas — stage 1 touches every (query, corpus)
    // pair, so it gets the same fused-loop treatment as the float path
    val intDot = graft.functions.IntDotProduct(col("qq"), col("cq"))
    // stage-1 candidate cut is a bounded aggregation (TopKAgg), not a
    // window: the window would shuffle + sort the full quantized
    // product; the aggregator ships ≤rerank rows per query per
    // partition
    val cands = cIdx.join(broadcast(qIdx), col("query_id") =!= col("nbr_id"))
      .withColumn("qsim", intDot.cast("double") * col("qscale") * col("cscale") /
        (col("qnorm") * col("cnorm")))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg(col("qsim"), col("nbr_id"), rerank).as("top"))
      .select(col("query_id"), explode(col("top.tag")).as("nbr_id"))
    // stage 2: bare (query, nbr) ids pull full vectors back in
    val rescored = cands
      .join(c.select(col("id").as("nbr_id"), col("vec").as("cvec"),
        col("nrm").as("cnorm")), Seq("nbr_id"))
      .join(broadcast(q.select(col("id").as("query_id"), col("vec").as("qv"),
        col("nrm").as("qnorm"))), Seq("query_id"))
      .withColumn("sim",
        VectorOps.cosinePre(col("qv"), col("cvec"), col("qnorm"), col("cnorm")))
    topK(rescored, k)
  }

  /** Table count needed to hold the hyperplane-LSH recall budget at a
    * given scale — the executable form of the honest-recall math in
    * SCALE.md (validated against measurement at sf1 by tools/SpotSf1:
    * predicted 309 misses vs 285 measured for 6×48 over 16,778 pairs).
    *
    * A pair at similarity `sim` collides in one `planes`-bit table
    * with probability p^planes where p = 1 − acos(sim)/π, so it is
    * missed by all `tables` tables with probability
    * (1 − p^planes)^tables — independent of corpus size. EXPECTED
    * misses therefore grow with the true-pair count, which is why a
    * config tuned to measured recall 1.0 at one scale silently drops
    * pairs at 10×. Bounding every pair by the worst case (sim = the
    * threshold `minCos`), expected misses ≤ ε needs
    *
    *   tables ≥ ln(expectedPairs / ε) / −ln(1 − p^planes)
    *
    * — LOGARITHMIC in the pair count, so exactness stays affordable
    * at any scale you can estimate (and a sampled pair-count estimate
    * is one cheap pre-pass). ε is expected MISSED PAIRS, not a rate:
    * ε = 0.05 makes a single dropped pair 20-to-1 unlikely; for a
    * recall target instead, pass ε = (1 − recall) × expectedPairs.
    */
  def tablesForRecall(minCos: Double, planes: Int,
                      expectedPairs: Double, maxExpectedMisses: Double): Int = {
    require(minCos > -1 && minCos < 1 && planes > 0 &&
      expectedPairs > 0 && maxExpectedMisses > 0, "out-of-range recall budget")
    val p = 1.0 - math.acos(minCos) / math.Pi
    val missPerTable = 1.0 - math.pow(p, planes)
    // when p^planes underflows to 0, missPerTable rounds to exactly
    // 1.0 and −log(1.0) = 0 → +Infinity → toInt saturates at
    // Int.MaxValue — a nonsensical "answer" for a configuration NO
    // table count can satisfy. Fail loudly instead.
    require(missPerTable < 1.0,
      s"unsatisfiable recall budget: a $planes-plane table at minCos=$minCos has " +
      "collision probability that underflows to 0 — use fewer planes per table")
    math.ceil(math.log(expectedPairs / maxExpectedMisses) / -math.log(missPerTable)).toInt.max(1)
  }

  /** Sampled estimate of the corpus' true ≥ `minCos` pair count — the
    * cheap pre-pass that feeds [[tablesForRecall]] (and the DBSCAN
    * dispatch): a deterministic hash-sample of `sampleSize` vectors is
    * brute-force pair-counted (≤ sampleSize² fused dots — trivial) and
    * scaled by n(n−1)/s(s−1). Hash-ordering makes the sample a pure
    * function of the ids, so the estimate replays identically across
    * runs and engines; the corpus itself is scanned once (per-
    * partition top-s, nothing corpus-sized shuffles). Pair counts at
    * a fixed τ concentrate tightly under uniform sampling (each
    * sampled pair is an unbiased indicator), so s = 2000 — 2 M
    * scored pairs — bounds the relative error at the few-percent
    * level that a LOGARITHMIC consumer like tablesForRecall shrugs
    * off: ±30% on the estimate moves T by ±ln(1.3)/−ln(miss) ≈ ±4
    * tables at the d5 gate config.
    */
  def estimatePairCount(df: DataFrame, minCos: Double,
                        sampleSize: Int = 2000, seed: Long = 42L): Double = {
    val n = df.count()
    if (n < 2) return 0.0
    val s = math.min(sampleSize.toLong, n)
    val sample = df.select(col("id"), col("vec"))
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(s.toInt)
    val sampled = cosinePairsExact(sample, minCos).count()
    sampled.toDouble * (n.toDouble * (n - 1)) / (s.toDouble * (s - 1))
  }

  /** The measured-at-scale sizing law as a default: table count for
    * exactness-at-budget on THIS corpus, from a sampled pair-count
    * estimate fed to [[tablesForRecall]]. `maxExpectedMisses = 0.05`
    * makes even one dropped pair 20-to-1 unlikely. Floored at 8 (the
    * historic fixture default) so tiny/empty corpora still get a
    * multi-table index rather than a degenerate one.
    */
  def autoTables(df: DataFrame, minCos: Double, planes: Int,
                 seed: Long = 42L, maxExpectedMisses: Double = 0.05): Int = {
    val est = estimatePairCount(df, minCos, seed = seed)
    tablesForRecall(minCos, planes, math.max(est, 1.0), maxExpectedMisses).max(8)
  }

  /** One sampled pre-flight, three numbers: the estimated true ≥τ
    * pair count, the recall-budget table count for it, and — the
    * candidateVolume idea applied to the sketch join — the expected
    * CANDIDATE FRACTION: the probability a background pair (sim drawn
    * from the sampled all-pairs distribution) collides in ≥ 1 of the
    * `tables` tables, E[1 − (1 − p(sim)^planes)^T]. That fraction is
    * what decides whether bucketing actually prunes: at a gap-less τ
    * it approaches 1 (SCALE.md's measured 82% at the d5 gate — LSH
    * then wins only by its distributable equi-join SHAPE, never by
    * comparison count), while at a real near-dup τ it collapses and
    * the index is doing its job. One hash-sample is scored once
    * (≤ sampleSize² fused dots) and feeds all three numbers.
    */
  def lshProfile(df: DataFrame, minCos: Double, planes: Int,
                 sampleSize: Int = 2000, seed: Long = 42L,
                 maxExpectedMisses: Double = 0.05): LshProfile = {
    val n = df.count()
    if (n < 2) return LshProfile(0.0, 8, 0.0)
    val s = math.min(sampleSize.toLong, n)
    val sample = df.select(col("id"), col("vec"))
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(s.toInt)
    val v = sample.select(col("id"), col("vec"), VectorOps.fnorm(col("vec")).as("nrm"))
    // spread the streamed side of the s²/2 sampled product (see
    // [[spread]]: orderBy+limit leaves one partition)
    val sims = spread(v).select(col("id").as("a"), col("vec").as("va"), col("nrm").as("na"))
      .join(broadcast(v.select(col("id").as("b"), col("vec").as("vb"), col("nrm").as("nb"))),
        col("a") < col("b"))
      .select(VectorOps.cosinePre(col("va"), col("vb"), col("na"), col("nb")).as("sim"))
      .localCheckpoint(eager = false) // consumed by two aggregates
    val sampled = sims.filter(col("sim") >= minCos).count()
    val scale = (n.toDouble * (n - 1)) / (s.toDouble * (s - 1))
    val estPairs = sampled * scale
    val tables = tablesForRecall(minCos, planes,
      math.max(estPairs, 1.0), maxExpectedMisses).max(8)
    val p = pow(lit(1.0) - acos(greatest(lit(-1.0), least(col("sim"), lit(1.0)))) / lit(math.Pi),
      lit(planes))
    val frac = sims.agg(avg(lit(1.0) - pow(lit(1.0) - p, lit(tables))))
      .collect().head.getDouble(0)
    LshProfile(estPairs, tables, frac)
  }

  /** See [[lshProfile]]. */
  final case class LshProfile(estPairs: Double, tables: Int, candidateFraction: Double)

  /** EXACT candidate volume of a [[cosineNearDupPairsLSH]] config on
    * THIS corpus — the vector-side analogue of
    * `NgramJaccard.candidateVolume`: one sketch pass and one
    * group-by, linear in `tables × n`, no pair ever materialized.
    * Where [[lshProfile]]'s `candidateFraction` is a sampled
    * ESTIMATE of the distinct-pair collision probability, this is
    * the exact MULTISET count Σ c·(c−1)/2 over every (table, bucket)
    * — the number of fused dot products the join will actually
    * evaluate (cross-table re-collisions included, exactly as the
    * join pays for them). The two agree within the multiplicity of
    * true near-dups (few, by definition at a selective τ), so either
    * can veto a config; this one also surfaces `max_bucket`, the
    * skew bound on a single join task. One row:
    * (bucket_rows, distinct_buckets, max_bucket, candidate_volume).
    * `candidate_volume` stays in Long arithmetic end to end for the
    * same ~1e15-regime reason as the n-gram form.
    */
  def lshCandidateVolume(df: DataFrame, dim: Int, planes: Int,
                         tables: Int, seed: Long = 42L): DataFrame =
    df.select(posexplode(
        graft.functions.HyperplaneSketches(col("vec"), dim, planes, tables, seed))
        .as(Seq("table", "bucket")))
      .groupBy(col("table"), col("bucket")).agg(count(lit(1)).as("len"))
      .agg(sum(col("len")).as("bucket_rows"),
        count(lit(1)).as("distinct_buckets"),
        max(col("len")).as("max_bucket"),
        sum(expr("len * (len - 1) DIV 2")).as("candidate_volume"))

  /** LSH-bucketed approximate top-k: the standard L-table structure.
    * Each of `tables` independent hash tables assigns every vector a
    * `planes`-bit hyperplane-sign bucket; only (query, corpus) pairs
    * colliding in at least one table are scored, optionally probing
    * all 1-bit-flipped buckets too (`multiProbe`). The corpus index
    * is `tables`× its size; the scoring join is a bucket equi-join —
    * never a cross product — which is what makes the 100 TB case
    * tractable.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              dim: Int, planes: Int = 8, tables: Int = 8,
              multiProbe: Boolean = true, seed: Long = 42L): DataFrame = {
    def indexed(df: DataFrame, idAs: String, vecAs: String, normAs: String,
                probe: Boolean): DataFrame = {
      val withSketches = df.select(
        col("id").as(idAs), col("vec").as(vecAs),
        VectorOps.fnorm(col("vec")).as(normAs),
        graft.functions.HyperplaneSketches(col("vec"), dim, planes, tables, seed).as("sketches"))
        .select(col(idAs), col(vecAs), col(normAs),
          posexplode(col("sketches")).as(Seq("table", "sketch")))
      if (!probe)
        withSketches.select(col(idAs), col(vecAs), col(normAs),
          col("table"), col("sketch").as("bucket"))
      else {
        val masks = array((0L +: (0 until planes).map(p => 1L << p).toSeq).map(lit): _*)
        withSketches
          .withColumn("mask", explode(masks))
          .select(col(idAs), col(vecAs), col(normAs), col("table"),
            col("sketch").bitwiseXOR(col("mask")).as("bucket"))
      }
    }
    val c = indexed(corpus, "nbr_id", "cvec", "cnorm", probe = false)
    val q = indexed(queries, "query_id", "qvec", "qnorm", probe = multiProbe)
    // scoring is inline (a repeated collision re-evaluates its fused
    // dot — map-side CPU) and the multi-table dedup rides the top-k
    // aggregation itself (TopKAgg.distinct keeps one entry per nbr):
    // the old dropDuplicates + window pair shuffled the candidate
    // multiset twice, still carrying both vector arrays
    val scored = c
      .join(broadcast(q), Seq("table", "bucket"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("sim",
        VectorOps.cosinePre(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")))
    topK(scored, k, dedup = true)
  }

  /** Thresholded kNN graph via LSH: for EVERY vector, its top-k
    * neighbors among those with cosine ≥ `minCos` — the similarity
    * graph behind near-dup clustering and semantic dedup, built from
    * [[cosineNearDupPairsLSH]]'s bucket self-join (never all-pairs;
    * nothing is broadcast, so the query side may be the whole
    * corpus). Thresholding is what makes LSH *exact* here: with
    * (planes, tables) tuned to recall 1.0 at `minCos` (see
    * `tools/TuneD5.scala` / `tools/TuneAnn.scala`), every qualifying
    * pair collides in some table, so the graph equals the brute-force
    * thresholded graph — unthresholded global top-k has no such
    * guarantee (the k-th neighbor can be near-orthogonal, which no
    * sublinear index recalls reliably).
    */
  def cosineKnnGraphLSH(df: DataFrame, minCos: Double, k: Int, dim: Int,
                        planes: Int = 10, tables: Int = -1,
                        seed: Long = 42L, checkpoint: Boolean = true): DataFrame = {
    // the pair plan (48-table bucket join + verify) feeds BOTH union
    // branches; checkpoint the tiny thresholded pair set so the LSH
    // pipeline executes once, not once per direction (exchange reuse
    // does not cover the post-shuffle verify operators).
    // `checkpoint = false` exists for plan auditing ONLY: the lazy
    // localCheckpoint truncates lineage to a LogicalRDD, hiding the
    // bucket self-join from the executed-plan string — the exact gap
    // that let the d4 broadcast drift live unaudited for three
    // rounds. PlanAuditSpec runs this same construction un-truncated
    // (at the cost of planning the LSH pipeline per branch) and pins
    // the join shape; production callers keep the default.
    val pairs = cosineNearDupPairsLSH(df, minCos, dim, planes, tables, seed)
    val undirected = if (checkpoint) pairs.localCheckpoint(eager = false) else pairs
    knnFromPairs(undirected, k)
  }

  /** The top-k step of [[cosineKnnGraphLSH]] over an already-built
    * undirected (a, b, sim) pair set — factored out so cross-path
    * checks (LSH vs exact ε-graph at scale, `tools/SpotSf1`) run the
    * IDENTICAL downstream dataflow on both graphs.
    */
  def knnFromPairs(undirected: DataFrame, k: Int): DataFrame = {
    val directed = undirected
      .select(col("a").as("query_id"), col("b").as("nbr_id"), col("sim"))
      .unionByName(undirected
        .select(col("b").as("query_id"), col("a").as("nbr_id"), col("sim")))
    // bounded aggregation, not a window: the window would totally
    // sort both directions of the survivor graph; TopKAgg ships ≤k
    // rows per vector per partition
    topK(directed, k)
  }

  /** IVF (inverted-file) approximate top-k: a coarse quantizer — a
    * small broadcastable centroid table, e.g. k-means centroids or
    * per-label means — partitions the corpus into cells; each query
    * probes only its `nprobe` nearest cells. The corpus is scanned
    * once to assign cells (a broadcast join, no shuffle of vectors),
    * and scoring is a cell equi-join — the index structure behind
    * FAISS-style IVF-Flat, expressed relationally.
    *
    * @param centroids (cell, vec) rows — must be broadcast-sized
    */
  /** Distributed fixed-iteration spherical k-means — the coarse
    * quantizer builder for [[ivfTopK]] and SemDeDup-style semantic
    * dedup, so cell count is a real scale knob (thousands of cells
    * on a real corpus) instead of whatever labels happen to exist.
    *
    * Deterministic and cross-engine replayable by construction (the
    * v1/a3 recipe): seeds are the `k` vectors with the smallest
    * md5(id) (hash-sampled, any engine recomputes the same set),
    * assignment is [[assignCells]]' argmax cosine with ties to the
    * lowest cell, the update is the per-(cell, pos) double mean
    * ROUNDED to 6 decimals (round-6 absorbs float partial-sum
    * order), and the iteration count is FIXED — no convergence test,
    * so the recursion unrolls identically everywhere. A cell that
    * loses all members disappears (standard k-means behavior, same
    * on every engine).
    *
    * Scale shape: per iteration, one broadcast join against the
    * k×dim centroid table (vectors never shuffle for assignment) and
    * one (cell, pos)-keyed aggregate whose width is cells × dims,
    * not corpus size. Each round's centroids are lazily
    * localCheckpointed so the lineage stays flat across iterations.
    */
  def kmeansCentroids(vecs: DataFrame, k: Int, iters: Int): DataFrame = {
    val hashed = vecs.select(col("id"), col("vec"),
      graft.functions.Md5Bucket60(
        concat_ws("|", lit("km"), col("id").cast("string"))).as("hkey"))
    val seedW = Window.orderBy(col("hkey"), col("id"))
    var cents = hashed.orderBy(col("hkey"), col("id")).limit(k)
      .withColumn("cell", (row_number().over(seedW) - 1).cast("long"))
      .select(col("cell"),
        transform(col("vec"), x => round(x.cast("double"), 6)).as("vec"))
    for (_ <- 1 to iters) {
      val assigned = assignCells(vecs, cents).select(col("id"), col("cell"))
      cents = vecs.join(assigned, Seq("id"))
        .select(col("cell"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(round(avg(col("x").cast("double")), 6).as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell"), transform(col("pm"), p => p.getField("m")).as("vec"))
        .localCheckpoint(false)
    }
    cents
  }

  /** Nearest-cell assignment: (id, vec) rows × (cell, vec) centroids
    * → (id, cell, ccos), each vector's argmax cell (ties to the
    * lowest cell id) and its cosine to that centroid. The coarse-
    * quantizer step shared by [[ivfTopK]] and SemDeDup-style
    * semantic dedup.
    *
    * Scale shape: scoring is the broadcast (row × cell) product kept
    * entirely inside one codegen stage — [[graft.functions.DotProduct]]
    * (fused loop, float OR double centroid elements, bit-identical to
    * the HOF form the oracle replays) feeds a `min(struct(-csim,
    * cell, csim))` aggregate whose partial (map-side) combine reduces
    * the n·k scored rows to n BEFORE the exchange, so the shuffle
    * carries one narrow row per vector no matter how many cells the
    * k* = √n sizing rule asks for. The previous window form shuffled
    * all n·k rows still carrying both vector arrays — measured 8× on
    * sf1's auto-k path. The struct ordering replays the window's
    * `csim DESC, cell ASC` exactly: struct max compares csim first
    * with Spark's NaN-is-greatest total order (identical to what the
    * desc sort used), then -cell breaks ties toward the lowest cell.
    */
  def assignCells(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val cents = broadcast(centroids.select(
      col("cell"), col("vec").as("centvec"),
      sqrt(VectorOps.dot(col("vec"), col("vec"))).as("centnorm")))
    vecs.select(col("id"), col("vec"), VectorOps.fnorm(col("vec")).as("nrm"))
      .join(cents)
      .withColumn("csim",
        VectorOps.fdot(col("vec"), col("centvec")) / (col("nrm") * col("centnorm")))
      .select(col("id"),
        struct(col("csim"), (-col("cell")).as("negcell"), col("cell")).as("sc"))
      .groupBy(col("id"))
      .agg(max(col("sc")).as("best"))
      .select(col("id"), col("best.cell").as("cell"), col("best.csim").as("ccos"))
  }

  // nearest `n` cells for a (id, vec) side against broadcast
  // centroids, (idAs, vecAs, normAs, cell) out. Scoring is the fused
  // [[graft.functions.DotProduct]] (float or double centroid
  // elements, bit-identical to the HOF form), and only narrow
  // (id, cell, csim) rows ever reach an exchange: n=1 (the corpus
  // side of every IVF build) aggregates the argmax with a map-side
  // partial combine — one row per vector crosses the wire — and
  // n>1 windows over the narrow projection; the wide vector columns
  // rejoin by id afterwards. Both forms replay the original window's
  // `csim DESC (NaN first), cell ASC` order exactly.
  private[ann] def assignN(df: DataFrame, centroids: DataFrame, n: Int,
                           idAs: String, vecAs: String, normAs: String): DataFrame = {
    val cents = broadcast(centroids.select(
      col("cell"), col("vec").as("centvec"),
      sqrt(VectorOps.dot(col("vec"), col("vec"))).as("centnorm")))
    val base = df.select(col("id").as(idAs), col("vec").as(vecAs),
      VectorOps.fnorm(col("vec")).as(normAs))
    val scored = base.join(cents)
      .select(col(idAs), col("cell"),
        (VectorOps.fdot(col(vecAs), col("centvec")) /
          (col(normAs) * col("centnorm"))).as("csim"))
    val chosen =
      if (n == 1)
        scored
          .select(col(idAs),
            struct(col("csim"), (-col("cell")).as("negcell"), col("cell")).as("sc"))
          .groupBy(col(idAs))
          .agg(max(col("sc")).as("best"))
          .select(col(idAs), col("best.cell").as("cell"))
      else {
        val w = Window.partitionBy(col(idAs))
          .orderBy(col("csim").desc, col("cell").asc)
        scored.withColumn("crank", row_number().over(w))
          .filter(col("crank") <= n)
          .select(col(idAs), col("cell"))
      }
    base.join(chosen, Seq(idAs))
      .select(col(idAs), col(vecAs), col(normAs), col("cell"))
  }

  /** The corpus side of an IVF index: each vector in its single
    * nearest cell, with its norm precomputed — (cell, id, vec, nrm).
    * This IS the expensive half of every [[ivfTopK]] call; persist
    * it with [[saveIvfIndex]] so serving recomputes nothing.
    */
  def ivfAssignments(corpus: DataFrame, centroids: DataFrame): DataFrame =
    assignN(corpus, centroids, 1, "id", "vec", "nrm")
      .select(col("cell"), col("id"), col("vec"), col("nrm"))

  // probe: score each query's nprobe cells' members on the fused
  // float path, keep the per-query top k
  private def ivfProbe(assignments: DataFrame, queries: DataFrame,
                       centroids: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val c = assignments.select(col("cell"), col("id").as("nbr_id"),
      col("vec").as("cvec"), col("nrm").as("cnorm"))
    val q = assignN(queries, centroids, nprobe, "query_id", "qvec", "qnorm")
    // (query, nbr) pairs are unique by construction (each nbr lives
    // in exactly one cell and a query's probe cells are distinct) —
    // the dedup in TopKAgg.distinct is defensive; either way the old
    // dropDuplicates + window double shuffle collapses into one
    // bounded aggregation
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("sim",
        VectorOps.cosinePre(col("qvec"), col("cvec"), col("qnorm"), col("cnorm")))
    topK(scored, k, dedup = true)
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              k: Int, nprobe: Int = 2): DataFrame =
    ivfProbe(ivfAssignments(corpus, centroids), queries, centroids, k, nprobe)

  /** Persist an IVF index as two catalog tables: the (tiny) trained
    * centroids at `<prefix>_centroids` and the corpus assignment at
    * `<prefix>_cells`, hash-bucketed on `cell` — the probe's join
    * key — so the stored side joins without shuffling. `append`
    * adds a new batch's assignments (vectors quantized against the
    * SAME frozen centroids — the standard serve-time contract; re-
    * train + full rebuild is the offline path). The dedup/sketch
    * stored-index parity: a growing corpus is assigned ONCE, ever.
    */
  def saveIvfIndex(corpus: DataFrame, centroids: DataFrame, tablePrefix: String,
                   nBuckets: Int = 32, append: Boolean = false): Unit = {
    if (!append)
      centroids.select(col("cell"), col("vec"))
        .write.mode("overwrite").format("parquet")
        .saveAsTable(s"${tablePrefix}_centroids")
    ivfAssignments(corpus, centroids)
      .write.mode(if (append) "append" else "overwrite")
      .bucketBy(nBuckets, "cell")
      .format("parquet")
      .saveAsTable(s"${tablePrefix}_cells")
  }

  /** [[ivfTopK]] against a PRECOMPUTED index saved by
    * [[saveIvfIndex]]: the corpus-side assignment (the expensive
    * half) is read, never recomputed — only the query batch is
    * quantized per call. Semantics identical to the recompute form
    * (equivalence-spec'd in AnnSpec).
    */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, tablePrefix: String,
                     queries: DataFrame, k: Int, nprobe: Int = 2): DataFrame =
    ivfProbe(spark.table(s"${tablePrefix}_cells"),
      queries, spark.table(s"${tablePrefix}_centroids"), k, nprobe)

  /** Scale path for embedding near-dup pairs: hyperplane-sketch
    * blocking (L tables), so candidate pairs come from bucket
    * self-joins instead of the all-pairs product; each candidate is
    * then exactly scored and thresholded. Recall depends on how far
    * τ's angle is from orthogonal — high for true near-dups
    * (cos ≥ 0.9), as the spec shows on clustered data.
    */
  /** Exact ε-graph: every (a < b) pair with cosine ≥ minCos, scored
    * by the broadcast brute-force form (the a1 baseline shape: the
    * corpus never shuffles, each partition scans against the
    * broadcast side). This is the RIGHT tool when the threshold is
    * unselective — a low-τ neighbor graph is near-quadratic however
    * it is found, and brute force skips the LSH candidate dedup that
    * then dominates ([[cosineNearDupPairsLSH]] stays the scale path
    * for selective thresholds, where bucketing actually prunes;
    * `DbscanSpec` pins both paths to identical output).
    */
  def cosinePairsExact(df: DataFrame, minCos: Double): DataFrame = {
    val v = df.select(col("id"), col("vec"), VectorOps.fnorm(col("vec")).as("nrm"))
    // spread the STREAMED side: the broadcast nested-loop product
    // evaluates |v|²/2 fused cosines, and a 1-split input runs them
    // all on one core (see [[spread]])
    spread(v).select(col("id").as("a"), col("vec").as("va"), col("nrm").as("na"))
      .join(broadcast(v.select(col("id").as("b"), col("vec").as("vb"), col("nrm").as("nb"))),
        col("a") < col("b"))
      .withColumn("sim",
        VectorOps.cosinePre(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("sim") >= minCos)
      .select(col("a"), col("b"), col("sim"))
  }

  /** `tables ≤ 0` (the default) sizes the index from THIS corpus —
    * and as of round 16 the un-pinned path IS the margin-guided
    * multi-probe join ([[cosineNearDupPairsLSHMP]]): identical
    * (a, b, sim) output on every gated fixture, at 6–9× fewer tables
    * for the same 0.05 expected-miss budget (sf1: 13 vs 180 tables,
    * 18.3 vs 69.0 s; sf10: 33 vs 236, 75 vs 159 s — SCALE.md), with
    * a measured fallback that drops the probes and falls back to the
    * analytic [[autoTables]] sizing when the corpus has no sampled
    * true pairs to measure a catch rate on. `probes = 0` forces the
    * classic single-probe auto sizing; a pinned `tables > 0` keeps
    * the single-probe emission verbatim (gate/bench configs pin and
    * stay pure plan construction — the un-pinned path pays the same
    * two cheap pre-flight actions as before, a count and a
    * 2000-vector sampled pair estimate, just measuring catch instead
    * of assuming the analytic worst case). The r11 audit's lesson
    * still governs: a fixed table count tuned to measured recall 1.0
    * at one scale silently drops pairs at 10× (expected misses grow
    * with the true-pair count), so defaults must size to the corpus.
    *
    * `maxCandidateVolume` is the same loud-refusal guard as
    * `NgramJaccard.pairs`: when set below `Long.MaxValue`, one extra
    * linear pre-flight ([[lshCandidateVolume]] — exact, one sketch
    * pass) counts the dot products the bucket join would evaluate
    * and throws if the corpus is on the gap-less side of the cliff
    * (SCALE.md: at τ with no similarity gap, candidates are a
    * constant fraction of n²/2 NO MATTER the table sizing — the
    * measured 82% at the d5 gate; at a selective τ the same config
    * prunes 5–70×, SPOTCHECK_tau.txt). The default keeps the call
    * pure plan construction.
    */
  def cosineNearDupPairsLSH(df: DataFrame, minCos: Double, dim: Int,
                            planes: Int = 10, tables: Int = -1,
                            seed: Long = 42L,
                            maxCandidateVolume: Long = Long.MaxValue,
                            probes: Int = 2): DataFrame = {
    if (tables <= 0 && probes > 0)
      return cosineNearDupPairsLSHMP(df, minCos, dim, planes, tables = -1,
        probes = math.min(probes, planes - 1), seed = seed,
        maxCandidateVolume = maxCandidateVolume)
    val nTables = if (tables > 0) tables else autoTables(df, minCos, planes, seed)
    if (maxCandidateVolume < Long.MaxValue) {
      val r = lshCandidateVolume(df, dim, planes, nTables, seed).collect().head
      val vol = r.getAs[Long]("candidate_volume")
      if (vol > maxCandidateVolume)
        throw new IllegalStateException(
          s"cosineNearDupPairsLSH pre-flight: bucket-join candidate volume $vol exceeds " +
          s"maxCandidateVolume=$maxCandidateVolume ($nTables tables × $planes planes, " +
          s"max bucket ${r.getAs[Long]("max_bucket")}). At this τ the corpus has no " +
          "similarity gap — candidates are a constant fraction of all pairs however the " +
          "index is sized. Raise τ to a selective threshold (candidates then track TRUE " +
          "pairs — SPOTCHECK_tau.txt), add planes per table, use SemDeDup.runAuto " +
          "(cell-bounded, n^1.5 total work), or raise the budget.")
    }
    // Vectors ride INTO the bucket rows and collisions are scored
    // inline, so only τ-SURVIVORS ever reach a pair-level shuffle.
    // The shuffled volume is tables × n rows (each carrying one
    // vector) — linear in the corpus — while the candidate pair
    // multiset, which at a gap-less τ is a constant fraction of
    // n²/2, stays INSIDE the join's output iterator and dies in the
    // codegen'd filter. The previous shape (dedup bare-id pairs
    // first, then join vectors back per side) shuffled the
    // candidate-quadratic pair set twice — and the second join
    // shipped a vector per PAIR: measured at sf1 (20 k vectors,
    // ~1e8 candidates) 240.8 s vs 3.95 s for this form, identical
    // output. Duplicate cross-table collisions cost only redundant
    // dot products (rare pairs collide in ~1 table; only true
    // near-dups — few — collide in many), and the final distinct
    // dedups survivors, not candidates. SHUFFLE_HASH pins the
    // symmetric self-join's Exchange-reuse shape for the same
    // reason as SimHash.pairs (the d4 drift).
    // spread before sketching: the emission costs tables×planes×dim
    // multiplies PER ROW — a byte-small 1-split scan would compute
    // every table's sketches for the whole corpus on one core (see
    // [[spread]]; a no-op at scale where the scan is already split)
    val sketched = spread(df).select(col("id"), col("vec"),
      graft.functions.VectorOps.fnorm(col("vec")).as("nrm"),
      posexplode(graft.functions.HyperplaneSketches(col("vec"), dim, planes, nTables, seed))
        .as(Seq("table", "bucket")))
    val l = sketched.select(col("table"), col("bucket"),
      col("id").as("a"), col("vec").as("va"), col("nrm").as("na"))
    val r = sketched.select(col("table"), col("bucket"),
      col("id").as("b"), col("vec").as("vb"), col("nrm").as("nb"))
    l.hint("shuffle_hash").join(r, Seq("table", "bucket"))
      .filter(col("a") < col("b"))
      .withColumn("sim",
        graft.functions.VectorOps.cosinePre(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("sim") >= minCos)
      .select("a", "b", "sim")
      // dedup cross-table collisions on the PAIR KEY, not (a, b, sim):
      // a distinct over the sim column would depend on the score being
      // bitwise-identical across tables — true today (cosinePre is a
      // pure fused dot) but not a property correctness should lean on.
      // max is order-independent, so the output stays deterministic
      // even if scoring ever became path-dependent in low bits.
      .groupBy(col("a"), col("b"))
      .agg(max(col("sim")).as("sim"))
  }

  /** Sampled per-table CATCH RATE of the margin-guided multi-probe
    * scheme on THIS corpus' true ≥ `minCos` pairs — measured, not
    * modeled: the analytic multi-probe catch needs the probability
    * that the disagreeing plane ranks among a vector's `probes`
    * smallest margins, which depends on the pair-angle distribution
    * in a way no closed form captures honestly. Instead, the same
    * hash-sample as [[estimatePairCount]] is self-joined for its true
    * pairs, both probe-sketch arrays are computed inline over
    * `trialTables` independent trial tables, and the fraction of
    * (pair, table) trials where the emission sets intersect IS the
    * per-table catch probability — unbiased, since tables are iid
    * draws of the same Gaussian scheme the production index uses.
    * Returns (rate, catches, trials); callers wanting a conservative
    * sizing should deflate by the binomial CI (see [[mpAutoTables]]).
    * Cost: one corpus scan for the sample + |truePairs| × trialTables
    * small-array intersections — trivial, and interpreted HOFs are
    * fine OFF the hot path.
    */
  def mpCatchRate(df: DataFrame, minCos: Double, dim: Int, planes: Int,
                  probes: Int, trialTables: Int = 32,
                  sampleSize: Int = 2000, seed: Long = 42L): (Double, Long, Long) = {
    val m = mpSample(df, minCos, dim, planes, probes, trialTables, sampleSize, seed)
    val trials = m.sampledPairs * trialTables
    (if (trials == 0) 0.0 else m.catches.toDouble / trials, m.catches, trials)
  }

  private final case class MpSample(n: Long, s: Long, sampledPairs: Long,
                                    catches: Long, hist: Map[Int, Long])

  /** Exactly-unbiased estimator of a pair's T-table miss probability
    * (1−r)^T from c catches in K iid trial tables: C(K−c, T)/C(K, T)
    * — the probability that T trials drawn without replacement from
    * the K observed are all misses, whose expectation over the
    * binomial draw is (1−r)^T for every T ≤ K (a U-statistic; no
    * plug-in bias, no convexity gap). 0 when T > K − c (more tables
    * demanded than observed misses — the sample can't certify a miss).
    */
  private def mpMissProb(trials: Int, c: Int, t: Int): Double =
    if (t > trials - c) 0.0
    else {
      var p = 1.0
      var j = 0
      while (j < t) { p *= (trials - c - j).toDouble / (trials - j); j += 1 }
      p
    }

  /** One sampled pre-flight pass shared by the multi-probe sizing:
    * the [[estimatePairCount]] hash-sample is self-joined once, and a
    * single aggregate returns BOTH the true ≥τ pair count (→ the
    * recall budget's expected-pair estimate) and the probe-scheme
    * catch events over `trialTables` trial tables (→ the measured
    * per-table catch rate). Splitting these into two passes scored
    * the same s² fused dots twice — measured at ~2× the sizing cost.
    */
  private def mpSample(df: DataFrame, minCos: Double, dim: Int, planes: Int,
                       probes: Int, trialTables: Int,
                       sampleSize: Int, seed: Long): MpSample = {
    val n = df.count()
    if (n < 2) return MpSample(n, 0L, 0L, 0L, Map.empty)
    val width = probes + 1
    val s = math.min(sampleSize.toLong, n)
    val sample = df.select(col("id"), col("vec"))
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(s.toInt)
    val v = sample.select(col("id"), col("vec"), VectorOps.fnorm(col("vec")).as("nrm"))
    // spread the streamed side: orderBy+limit leaves ONE partition,
    // which would run the s²/2 sampled cosines and the survivors'
    // trial-table probe sketches on one core (see [[spread]])
    val pairs = spread(v).select(col("id").as("a"), col("vec").as("va"), col("nrm").as("na"))
      .join(broadcast(v.select(col("id").as("b"), col("vec").as("vb"), col("nrm").as("nb"))),
        col("a") < col("b"))
      .filter(VectorOps.cosinePre(col("va"), col("vb"), col("na"), col("nb")) >= minCos)
      .select(
        graft.functions.HyperplaneProbeSketches(col("va"), dim, planes, trialTables, seed, probes).as("sa"),
        graft.functions.HyperplaneProbeSketches(col("vb"), dim, planes, trialTables, seed, probes).as("sb"))
    val catchCnt = aggregate(
      sequence(lit(0), lit(trialTables - 1)), lit(0L),
      (acc, t) => acc + when(arrays_overlap(
        slice(col("sa"), t * width + 1, lit(width)),
        slice(col("sb"), t * width + 1, lit(width))), 1L).otherwise(0L))
    // the full per-pair catch-count HISTOGRAM, not just the sum: the
    // heterogeneity-aware sizing needs the distribution of c over
    // pairs (≤ trialTables+1 rows — a scalar-sized collect)
    val rows = pairs.select(catchCnt.as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("cnt")).collect()
    val hist = rows.map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val sampledPairs = hist.valuesIterator.sum
    val catches = hist.iterator.map { case (c, cnt) => c.toLong * cnt }.sum
    MpSample(n, s, sampledPairs, catches, hist)
  }

  /** Auto table count for the multi-probe pair join: the recall-
    * budget law of [[tablesForRecall]] driven by the MEASURED
    * [[mpCatchRate]] instead of the analytic single-probe p^planes.
    * The rate is deflated to its 95% binomial lower bound before
    * sizing (sampling noise must oversize, never undersize), and the
    * result is FLOORED by a heterogeneity-aware sizing over the
    * per-pair catch-count histogram (the average-rate law alone is
    * average-case: Jensen lets τ-marginal pairs exceed the miss
    * budget on corpora whose typical dup sits well above τ — see
    * the `misses(t)` U-statistic in [[mpSizing]]), then clamped by
    * the analytic single-probe answer — probing strictly adds catch
    * events (the base sketch is emission 0), so a larger-than-
    * analytic demand can only be noise or an infeasible budget.
    * Floors at 8 like [[autoTables]]. Falls back to the single-probe
    * sizing when the sample has no true pairs to measure (a super-
    * selective τ) — conservative, since every emitted probe then
    * only adds recall.
    */
  def mpAutoTables(df: DataFrame, minCos: Double, dim: Int, planes: Int,
                   probes: Int, seed: Long = 42L,
                   maxExpectedMisses: Double = 0.05,
                   trialTables: Int = 32, sampleSize: Int = 2000): Int =
    mpSizing(df, minCos, dim, planes, probes, seed, maxExpectedMisses,
      trialTables, sampleSize)._1

  /** (table count, probes-pay) from ONE sampled pass — the second
    * element is true only when the measured sizing beats the analytic
    * single-probe law STRICTLY (and a catch rate was measurable at
    * all); the auto join drops the probes otherwise, so the plan is
    * the classic single-probe emission at the analytic count whenever
    * probing wouldn't shrink the index. When it is false, the first
    * element ALWAYS equals the floored single-probe sizing.
    */
  private def mpSizing(df: DataFrame, minCos: Double, dim: Int, planes: Int,
                       probes: Int, seed: Long = 42L,
                       maxExpectedMisses: Double = 0.05,
                       trialTables: Int = 32, sampleSize: Int = 2000): (Int, Boolean) = {
    val m = mpSample(df, minCos, dim, planes, probes, trialTables, sampleSize, seed)
    val est = if (m.s < 2) 1.0 else math.max(
      m.sampledPairs.toDouble * (m.n.toDouble * (m.n - 1)) / (m.s.toDouble * (m.s - 1)), 1.0)
    val single = tablesForRecall(minCos, planes, est, maxExpectedMisses)
    val trials = m.sampledPairs * trialTables
    val sized =
      if (m.catches == 0) single
      else {
        val rate = m.catches.toDouble / trials
        val low = math.max(rate - 1.96 * math.sqrt(rate * (1 - rate) / trials),
          1.0 / (2.0 * trials)) // never let the CI zero out a measured rate
        val tAvg = math.ceil(math.log(est / maxExpectedMisses) / -math.log1p(-low)).toInt
        // Heterogeneity floor (round-16 ADVICE): the average-rate law
        // under-sizes on mixed corpora — (1−r)^T is convex in r, so
        // E[(1−rᵢ)^T] ≥ (1−r̄)^T (Jensen) and τ-marginal pairs can blow
        // the budget while well-separated dups drag r̄ up. Instead of
        // one rate, size against the MEASURED per-pair distribution:
        // expected misses at T ≈ (est/s)·Σ_c hist(c)·C(K−c,T)/C(K,T),
        // each term an exactly-unbiased estimate of that pair's
        // (1−rᵢ)^T ([[mpMissProb]]). Smallest feasible T ≤ K wins; a
        // never-caught pair (c=0) keeps its term at 1 for every T, so
        // an infeasible budget falls through to the single-probe
        // analytic worst-case via the clamp below — probes stay ON
        // (they were measured to catch; they only add recall).
        val scale = est / m.sampledPairs.toDouble
        def misses(t: Int): Double =
          scale * m.hist.iterator.map { case (c, cnt) =>
            cnt * mpMissProb(trialTables, c, t) }.sum
        val tHet = (1 to trialTables).find(t => misses(t) <= maxExpectedMisses)
          .getOrElse(Int.MaxValue)
        math.max(tAvg, tHet)
      }
    val tMp = math.min(sized, single).max(8)
    val tSingle = single.max(8)
    // Probes must PAY FOR THEMSELVES IN TABLES: width-(probes+1)
    // emission at T tables costs what single-probe emission costs at
    // width×T — so unless the measured sizing beats the analytic
    // single-probe law STRICTLY, probing is all cost and no saving
    // (round-16 sf1 sweep: d17 at planes=10 measured weak per-table
    // catch, clamped to the single law's 180 tables, and the kept
    // probes tripled the emission — 69 → 205 s for identical output).
    // Equal-or-worse sizing therefore drops the probes and emits the
    // classic single-probe plan at the analytic count.
    (tMp, m.catches > 0 && tMp < tSingle)
  }

  /** EXACT candidate volume of a [[cosineNearDupPairsLSHMP]] config —
    * [[lshCandidateVolume]] for the probe emission: Σ e·(e−1)/2 over
    * every (table, bucket) of the widened emission multiset, the
    * number of fused dots the symmetric probe join will evaluate. A
    * point emits at most one entry per (table, bucket) (distinct
    * single-bit flips are distinct buckets), so e counts distinct
    * points and the self-pair term subtracts exactly.
    */
  def mpCandidateVolume(df: DataFrame, dim: Int, planes: Int, tables: Int,
                        probes: Int, seed: Long = 42L): DataFrame = {
    val width = probes + 1
    df.select(posexplode(
        graft.functions.HyperplaneProbeSketches(col("vec"), dim, planes, tables, seed, probes))
        .as(Seq("pos", "bucket")))
      .select(expr(s"pos DIV $width").as("table"), col("bucket"))
      .groupBy(col("table"), col("bucket")).agg(count(lit(1)).as("len"))
      .agg(sum(col("len")).as("bucket_rows"),
        count(lit(1)).as("distinct_buckets"),
        max(col("len")).as("max_bucket"),
        sum(expr("len * (len - 1) DIV 2")).as("candidate_volume"))
  }

  /** Margin-guided multi-probe near-dup pair join — the same
    * τ-thresholded (a, b, sim) contract as [[cosineNearDupPairsLSH]],
    * at a FRACTION of its table count: each vector emits, per table,
    * its base bucket plus `probes` one-bit-flips at its smallest
    * |projection| planes ([[graft.functions.HyperplaneProbeSketches]]),
    * and the self-join matches on ANY emission collision — so a pair
    * is caught not only when a table's full signature agrees but also
    * when it disagrees in one straddled bit (either side's probe) or
    * two (probe meets probe). Catch probability per table is measured
    * on the corpus ([[mpCatchRate]]) and fed to the same recall-
    * budget law, which at the d-family gate config sizes ~4–5× fewer
    * tables than the single-probe index for the SAME expected-miss
    * budget. What that buys at 100 TB: the sketch pass, the bucket-
    * shuffle bytes, and any persisted index all scale with
    * tables × width × n — the dominant cost at a selective τ where
    * candidates track true pairs (SPOTCHECK_tau) — while at a
    * gap-less τ the candidate side grows only by the in-bucket width
    * factor. Both sides derive from ONE sketched subtree, so the
    * symmetric join keeps the single-Exchange reuse shape (and the
    * SHUFFLE_HASH pin) of the single-probe form; a<b canonicalizes
    * orientation; the final groupBy-max dedups cross-table and
    * cross-bucket re-collisions on the pair key exactly as in
    * [[cosineNearDupPairsLSH]].
    */
  def cosineNearDupPairsLSHMP(df: DataFrame, minCos: Double, dim: Int,
                              planes: Int = 6, tables: Int = -1, probes: Int = 2,
                              seed: Long = 42L,
                              maxCandidateVolume: Long = Long.MaxValue): DataFrame = {
    // auto path: when the sizing sample has no true pairs to measure a
    // catch rate on (a super-selective τ on this corpus), OR when the
    // measured sizing fails to beat the analytic single-probe law
    // strictly (weak per-table catch — probing buys tables nothing),
    // the table count falls back to the single-probe law and the
    // probes themselves are DROPPED so the join degenerates to exactly
    // the single-probe emission volume instead of paying width× rows
    // for no index saving. A pinned `tables` keeps the caller's probes
    // verbatim.
    val (nTables, effProbes) =
      if (tables > 0) (tables, probes)
      else {
        val (t, measurable) = mpSizing(df, minCos, dim, planes, probes, seed)
        (t, if (measurable) probes else 0)
      }
    val width = effProbes + 1
    if (maxCandidateVolume < Long.MaxValue) {
      // effProbes, not probes: the pre-flight must price the emission
      // the join below actually builds — measuring the full-probe
      // config under a dropped-probe fallback both over-counts the
      // volume (spurious refusals) and mis-prices the real plan
      val r = mpCandidateVolume(df, dim, planes, nTables, effProbes, seed).collect().head
      val vol = r.getAs[Long]("candidate_volume")
      if (vol > maxCandidateVolume)
        throw new IllegalStateException(
          s"cosineNearDupPairsLSHMP pre-flight: probe-join candidate volume $vol exceeds " +
          s"maxCandidateVolume=$maxCandidateVolume ($nTables tables × $planes planes × " +
          s"width $width, max bucket ${r.getAs[Long]("max_bucket")}). Raise τ, add planes, " +
          "or raise the budget — same regimes as the single-probe guard.")
    }
    // spread before sketching (the single-probe join's rationale: the
    // widened emission costs tables×width×planes×dim work per row)
    val sketched = spread(df).select(col("id"), col("vec"),
      VectorOps.fnorm(col("vec")).as("nrm"),
      // effProbes, not probes: with probes=2 dropped to 0 the sketch
      // would still emit width-3 arrays while `pos DIV (0+1)` treats
      // every probe slot as its own table — slot-wise matching at the
      // full width× emission cost the fallback exists to avoid
      // (round-16 ADVICE; AnnSpec pins the fallback plan's sketch
      // expressions at probes=0 — emission exactly tables × n)
      posexplode(graft.functions.HyperplaneProbeSketches(
        col("vec"), dim, planes, nTables, seed, effProbes)).as(Seq("pos", "bucket")))
      .select(col("id"), col("vec"), col("nrm"),
        expr(s"pos DIV $width").as("table"), col("bucket"))
    val l = sketched.select(col("table"), col("bucket"),
      col("id").as("a"), col("vec").as("va"), col("nrm").as("na"))
    val r = sketched.select(col("table"), col("bucket"),
      col("id").as("b"), col("vec").as("vb"), col("nrm").as("nb"))
    l.hint("shuffle_hash").join(r, Seq("table", "bucket"))
      .filter(col("a") < col("b"))
      .withColumn("sim",
        VectorOps.cosinePre(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("sim") >= minCos)
      .select("a", "b", "sim")
      .groupBy(col("a"), col("b"))
      .agg(max(col("sim")).as("sim"))
  }

  /** Exact-score candidate (a, b) pairs against the vector table and
    * threshold, via two equi-joins on id: the candidate rows (two
    * longs) shuffle to each side's vectors, and the vector table
    * shuffles once per side on id (one Exchange, reused) — never
    * once per PAIR, which is what a melt + groupBy(a, b) carrying
    * both vectors through the aggregate shuffle costs (measured as
    * the dominant byte-volume at 50 k vectors: each surviving pair
    * re-shipped two ~1 KB arrays through the group-by Exchange).
    *
    * Used by the INCREMENTAL paths only, where it is the right
    * shape: their candidate sets are bounded by the incoming batch's
    * collisions (small), while carrying the whole EXISTING corpus'
    * vectors through the index join — what in-bucket scoring would
    * require — costs a corpus-sized vector shuffle per batch. The
    * full self-join ([[cosineNearDupPairsLSH]]) has the opposite
    * asymmetry (candidate-quadratic pairs, corpus-linear buckets)
    * and scores in-bucket instead.
    */
  private def verifyCandidates(cands: DataFrame, vecSource: DataFrame,
                               minCos: Double): DataFrame = {
    val vecs = vecSource.select(col("id"), col("vec"), VectorOps.fnorm(col("vec")).as("nrm"))
    cands
      .join(vecs.select(col("id").as("a"), col("vec").as("va"), col("nrm").as("na")), Seq("a"))
      .join(vecs.select(col("id").as("b"), col("vec").as("vb"), col("nrm").as("nb")), Seq("b"))
      .withColumn("sim", VectorOps.cosinePre(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("sim") >= minCos)
      .select("a", "b", "sim")
  }

  /** Incremental embedding near-dup: pairs involving at least one
    * NEW vector, from sketch-bucket collisions of the incoming batch
    * against (existing ∪ new) — the existing×existing join never
    * runs, which is what makes re-checking a growing corpus per
    * batch affordable. New ids must sort after existing ids; every
    * output pair's `b` is a new vector. Same tuned (planes, tables,
    * seed) semantics as [[cosineNearDupPairsLSH]]. This form
    * re-sketches the existing side each call; the production loop
    * uses [[cosineNearDupPairsLSHIndexed]] with a stored
    * [[sketchIndex]] so existing vectors are sketched once, ever.
    */
  def cosineNearDupPairsLSHIncremental(existing: DataFrame, incoming: DataFrame,
                                       minCos: Double, dim: Int,
                                       planes: Int = 10, tables: Int = 8,
                                       seed: Long = 42L,
                                       checkpoint: Boolean = true): DataFrame = {
    val all = existing.select(col("id"), col("vec"))
      .unionByName(incoming.select(col("id"), col("vec")))
    val cands = sketchIndex(all, dim, planes, tables, seed)
      .select(col("table"), col("bucket"), col("id").as("a"))
      .join(sketchIndex(incoming, dim, planes, tables, seed)
        .select(col("table"), col("bucket"), col("id").as("b")),
        Seq("table", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()
      // materialize the (bounded, two-long-row) candidate set once:
      // it feeds the candidate-id semi-join AND both verify joins,
      // and without the checkpoint each reference re-derives the
      // whole sketch-explode + bucket-join subtree (the d19 plan
      // carried 19 copies of the embeddings scan). `checkpoint =
      // false` un-truncates the lineage so specs can assert the
      // plan's storage properties (the a2KnnGraph pattern).
      .transform(c => if (checkpoint) c.localCheckpoint(false) else c)
    verifyCandidates(cands, all, minCos)
  }

  /** The persistent hyperplane-LSH index: exploded (id, table,
    * bucket) rows — what [[cosineNearDupPairsLSHIndexed]] consumes
    * for the existing side so a growing corpus is sketched ONCE.
    * Deterministic given (dim, planes, tables, seed): an index row
    * equals what a recompute would produce.
    */
  def sketchIndex(df: DataFrame, dim: Int, planes: Int = 10,
                  tables: Int = 8, seed: Long = 42L): DataFrame =
    df.select(col("id"),
      posexplode(graft.functions.HyperplaneSketches(col("vec"), dim, planes, tables, seed))
        .as(Seq("table", "bucket")))

  /** Store a sketch index as a bucketed catalog table (hash-clustered
    * on `bucket`, a subset of the candidate join key (table, bucket),
    * so the stored side joins without shuffling). `append = true`
    * adds a processed batch — the per-batch maintenance step.
    */
  def saveSketchIndex(index: DataFrame, table: String, nBuckets: Int = 32,
                      append: Boolean = false): Unit =
    index.write.mode(if (append) "append" else "overwrite")
      .bucketBy(nBuckets, "bucket")
      .format("parquet")
      .saveAsTable(table)

  /** The persistent MULTI-PROBE index: exploded (id, table, bucket)
    * rows of the widened emission ([[graft.functions.HyperplaneProbeSketches]]
    * — base bucket + `probes` one-bit flips per table). Same storage
    * schema as [[sketchIndex]] (so [[saveSketchIndex]]'s bucketed
    * layout applies unchanged), `probes + 1` rows per (id, table) —
    * but the measured-catch sizing needs ~6–9× fewer tables for the
    * same miss budget, so the PERSISTED index is net ~2–3× smaller
    * than the single-probe one and every per-batch probe shuffles
    * proportionally fewer bytes. probes = 0 is bit-identical to
    * [[sketchIndex]].
    */
  def probeSketchIndex(df: DataFrame, dim: Int, planes: Int = 6,
                       tables: Int = 16, seed: Long = 42L,
                       probes: Int = 2): DataFrame = {
    val width = probes + 1
    df.select(col("id"),
      posexplode(graft.functions.HyperplaneProbeSketches(
        col("vec"), dim, planes, tables, seed, probes)).as(Seq("pos", "bucket")))
      .select(col("id"), expr(s"pos DIV $width").as("table"), col("bucket"))
  }

  /** [[cosineNearDupPairsLSHIndexed]] with a MULTI-PROBE stored
    * index: the existing side arrives as persisted widened-emission
    * (id, table, bucket) rows ([[probeSketchIndex]]) plus the vector
    * table; the incoming batch is probe-sketched with the SAME
    * (dim, planes, tables, seed, probes) and candidates are any
    * emission collision — a pair is caught when a table's base
    * sketches agree OR either side's probe straddles the disagreeing
    * plane. Only candidate-touched existing vectors are read for
    * exact scoring, so per-batch cost is collisions + a semi-join,
    * never a corpus re-sketch. Every output pair's `b` is a new
    * vector (new ids sort after existing ids); equivalence with the
    * full multi-probe self-join restricted to new-touching pairs is
    * spec'd, and `d19_embed_neardup_incr` gates the whole dataflow
    * against the exact all-pairs oracle.
    */
  def cosineNearDupPairsLSHIndexedMP(existingIndex: DataFrame,
                                     existingVecs: DataFrame,
                                     incoming: DataFrame,
                                     minCos: Double, dim: Int,
                                     planes: Int = 6, tables: Int = 16,
                                     probes: Int = 2,
                                     seed: Long = 42L,
                                     checkpoint: Boolean = true): DataFrame = {
    val newSketches = probeSketchIndex(incoming, dim, planes, tables, seed, probes)
    val allSketches = existingIndex.select(col("id"), col("table"), col("bucket"))
      .unionByName(newSketches)
    val cands = allSketches.select(col("table"), col("bucket"), col("id").as("a"))
      .join(newSketches.select(col("table"), col("bucket"), col("id").as("b")),
        Seq("table", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()
      // materialize the (bounded, two-long-row) candidate set once:
      // it feeds the candidate-id semi-join AND both verify joins,
      // and without the checkpoint each reference re-derives the
      // whole sketch-explode + bucket-join subtree (the d19 plan
      // carried 19 copies of the embeddings scan). `checkpoint =
      // false` un-truncates the lineage so specs can assert the
      // plan's storage properties (the a2KnnGraph pattern).
      .transform(c => if (checkpoint) c.localCheckpoint(false) else c)
    val candIds = cands.select(col("a").as("id"))
      .unionByName(cands.select(col("b").as("id")))
      .distinct()
    val vecsNeeded = existingVecs.select(col("id"), col("vec"))
      .join(candIds, Seq("id"), "left_semi")
      .unionByName(incoming.select(col("id"), col("vec")))
    verifyCandidates(cands, vecsNeeded, minCos)
  }

  /** [[cosineNearDupPairsLSHIncremental]] against a PRECOMPUTED
    * index: the existing side arrives as stored (id, table, bucket)
    * rows plus the vector table — nothing existing is re-sketched,
    * and only existing vectors that appear in a candidate pair are
    * read for exact scoring. Semantics identical to the recompute
    * form (equivalence-spec'd); new ids sort after existing ids.
    */
  def cosineNearDupPairsLSHIndexed(existingIndex: DataFrame,
                                   existingVecs: DataFrame,
                                   incoming: DataFrame,
                                   minCos: Double, dim: Int,
                                   planes: Int = 10, tables: Int = 8,
                                   seed: Long = 42L,
                                   checkpoint: Boolean = true): DataFrame = {
    val newSketches = sketchIndex(incoming, dim, planes, tables, seed)
    val allSketches = existingIndex.select(col("id"), col("table"), col("bucket"))
      .unionByName(newSketches)
    val cands = allSketches.select(col("table"), col("bucket"), col("id").as("a"))
      .join(newSketches.select(col("table"), col("bucket"), col("id").as("b")),
        Seq("table", "bucket"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()
      // materialize the (bounded, two-long-row) candidate set once:
      // it feeds the candidate-id semi-join AND both verify joins,
      // and without the checkpoint each reference re-derives the
      // whole sketch-explode + bucket-join subtree (the d19 plan
      // carried 19 copies of the embeddings scan). `checkpoint =
      // false` un-truncates the lineage so specs can assert the
      // plan's storage properties (the a2KnnGraph pattern).
      .transform(c => if (checkpoint) c.localCheckpoint(false) else c)
    val candIds = cands.select(col("a").as("id"))
      .unionByName(cands.select(col("b").as("id")))
      .distinct()
    val vecsNeeded = existingVecs.select(col("id"), col("vec"))
      .join(candIds, Seq("id"), "left_semi")
      .unionByName(incoming.select(col("id"), col("vec")))
    verifyCandidates(cands, vecsNeeded, minCos)
  }

  /** Embedding-cosine near-duplicate pairs (a < b, cosine ≥ τ).
    * All-pairs form — kept ONLY as the ground truth for the recall
    * spec; the gated d5 query and the scale path are both
    * [[cosineNearDupPairsLSH]]. Never use this on a large corpus:
    * the theta-only join plans as a broadcast-nested-loop product.
    */
  def cosineNearDupPairs(df: DataFrame, minCos: Double): DataFrame = {
    val v = df.select(col("id"), col("vec"), VectorOps.fnorm(col("vec")).as("nrm"))
    val a = v.select(col("id").as("a"), col("vec").as("va"), col("nrm").as("na"))
    val b = v.select(col("id").as("b"), col("vec").as("vb"), col("nrm").as("nb"))
    a.join(b, col("a") < col("b"))
      .withColumn("sim", VectorOps.cosinePre(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("sim") >= minCos)
      .select("a", "b", "sim")
  }
}
