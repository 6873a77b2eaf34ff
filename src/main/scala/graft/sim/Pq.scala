package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorExprs

/** Product quantization (PQ) ANN — Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search" (public) — the third scale
  * tier next to [[Similarity.lshTopK]] and [[Ivf]]: the vector is split
  * into `m` subvectors, each quantized against its own `codebookSize`-entry
  * k-means codebook, and a candidate's inner product is approximated by
  * table lookups (ADC — asymmetric distance computation): the query stays
  * exact, only the corpus side is quantized.
  *
  * Storage story at 100 TB: a 64-dim float vector is 256 B; its PQ code is
  * `m` small ints (m=4, 16 codes → 4 B with byte packing) — a 64× scan-IO
  * cut, steeper than [[Similarity.quantizedTopK]]'s 4×, at the cost of a
  * coarser approximation and a training step.
  *
  * Execution shape, all Spark-first:
  *   1. TRAIN: `m` seeded MLlib k-means fits over (optionally sampled)
  *      subvector slices — centroids are m·codebookSize·(dim/m) floats of
  *      driver-side constants, broadcast everywhere below.
  *   2. ENCODE: `m` map-only `model.transform` passes assign each corpus
  *      vector its m codes — no shuffle; at scale this materializes as the
  *      stored index.
  *   3. LUT: each query dots its subvectors against every centroid —
  *      |queries|·m·codebookSize tiny rows, aggregated into one flat
  *      lookup array per query.
  *   4. SCORE: corpus codes ⋈ broadcast LUTs (the corpus never shuffles);
  *      the ADC score is `m` codegen'd `element_at` lookups summed — no
  *      interpreted HOF in the hot path — and the per-query top-k is the
  *      bounded-heap `topk_desc` aggregate (k rows per query per partition
  *      on the only shuffle).
  *
  * Exactness property (pinned by PqSpec): when every subspace has at most
  * `codebookSize` distinct subvectors, k-means recovers them exactly and
  * ADC equals the exact inner product — so the whole pipeline is testable
  * against a brute-force oracle, the same trick [[Ivf]] uses with
  * nprobe = nlist. */
/** Storable PQ index ([[Pq.buildIndex]] → [[Pq.probeTopK]]), the [[IvfIndex]]
  * analog: `codebooks` = (j, code, flat, cent) — m·codebookSize constant
  * rows; `codes` = (cand_id, __c0..__c{m-1}) — the encoded corpus, m small
  * ints per vector (the 64× compressed serving representation). */
case class PqIndex(codebooks: DataFrame, codes: DataFrame)

object Pq {

  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 4, codebookSize: Int = 16,
             idCol: String = "vec_id", vecCol: String = "embedding",
             trainFraction: Double = 1.0, seed: Long = 42L): DataFrame =
    probeTopK(buildIndex(corpus, m, codebookSize, idCol, vecCol,
      trainFraction, seed), queries, k, idCol, vecCol)

  /** TRAIN + ENCODE — the storable halves of [[pqTopK]] (steps 1–2 of the
    * scaladoc above). `codebooks` is m·codebookSize constant-sized rows
    * (j, code, flat, cent); `codes` is the ENCODED CORPUS — one row of m
    * small ints per vector, the 64× compressed representation that IS the
    * PQ index at 100 TB (the serving scan reads codes, never raw floats).
    * Both are plain DataFrames so they persist to parquet and read back;
    * [[probeTopK]] consumes either the in-memory or the read-back form. */
  def buildIndex(corpus: DataFrame, m: Int = 4, codebookSize: Int = 16,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 trainFraction: Double = 1.0, seed: Long = 42L,
                 keepCols: Seq[String] = Nil): PqIndex = {
    require(m > 0 && codebookSize > 1, s"need m > 0, codebookSize > 1; got $m/$codebookSize")
    require(trainFraction > 0 && trainFraction <= 1.0,
      s"trainFraction must be in (0, 1], got $trainFraction")
    val spark = corpus.sparkSession
    import spark.implicits._
    // one-row scalar gate (dimension), same sanctioned shape as Quality's;
    // an empty corpus is an explicit argument error, not a bare
    // NoSuchElementException out of the probe
    val dim = corpus.select(size(col(vecCol)).as("d")).limit(1)
      .collect().headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        "buildIndex: empty corpus — nothing to train codebooks on"))
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m subspaces")
    val sub = dim / m

    // 1. TRAIN — m seeded fits; sample the corpus for training at scale
    //    (codebooks need representative structure, not every row).
    //    The m fits are INDEPENDENT (separate seeds, separate subvector
    //    slices), and each is a chain of many small jobs (k-means|| init
    //    + Lloyd iterations) whose wall time is mostly sequential
    //    scheduling gaps on an underloaded cluster — run them
    //    concurrently (guide §2.6; graft.util.Parallel) so later fits
    //    back-fill cores the earlier ones leave idle. Each model is
    //    bit-identical to its sequential run: seeds and inputs are
    //    per-fit, only wall-clock overlaps.
    val models = graft.util.Parallel.all(spark)((0 until m).map { j =>
      () => {
        val fv = corpus.select(
          array_to_vector(slice(col(vecCol), j * sub + 1, sub)).as("__fv"))
        val train = if (trainFraction < 1.0)
          fv.sample(withReplacement = false, trainFraction, seed + j) else fv
        // maxIter 10, like Ivf: codebooks converge in a few iterations on
        // clustered data, and training is the dominant cost of the operator
        new KMeans().setK(codebookSize).setSeed(seed + j).setMaxIter(10)
          .setFeaturesCol("__fv").setPredictionCol("__code")
          .fit(train)
      }
    }: _*)

    // 2. ENCODE — m map-only transforms; codes stay as m int columns so the
    //    ADC scoring expression is pure codegen (no array HOF). `keepCols`
    //    attributes ride the map-only pass onto the thin code rows — the
    //    filtered-search denormalization ([[Ivf.assignPortable]] contract).
    var enc = corpus.select(col(idCol).as("cand_id") +:
      col(vecCol).as("cvec") +: keepCols.map(col): _*)
    for (j <- 0 until m) {
      enc = models(j).setPredictionCol(s"__c$j").transform(
          enc.withColumn("__fv",
            array_to_vector(slice(col("cvec"), j * sub + 1, sub))))
        .drop("__fv")
    }
    val codes = enc.select(col("cand_id") +:
      ((0 until m).map(j => col(s"__c$j")) ++ keepCols.map(col)): _*)

    // K-means can legitimately return FEWER than `codebookSize` centers
    // when a subspace has fewer distinct points (exactly the exact-recovery
    // regime), so the flat LUT index uses per-subspace offsets computed
    // from the ACTUAL center counts — a constant j*codebookSize stride
    // would silently misalign every subspace after a deficient one.
    val offsets = models.map(_.clusterCenters.length).scanLeft(0)(_ + _)
    val cents = (for {
      j <- 0 until m
      (c, code) <- models(j).clusterCenters.zipWithIndex
    } yield (j, code, offsets(j) + code, c.toArray.map(_.toFloat)))
      .toDF("__j", "__code", "__flat", "__cent")
    PqIndex(cents, codes)
  }

  /** LUT + SCORE over a PREBUILT index (steps 3–4) — the steady-state
    * serving path: the codebook geometry (subspace count, subvector width,
    * flat-LUT offsets) is re-derived from the index's own rows, so a
    * parquet round-trip of both frames probes bit-identically to the
    * in-memory build (`sim_pq_probe` pins this against the brute-force
    * oracle in the exact-recovery regime; PqSpec pins stored ≡ in-memory
    * on trained codebooks). The corpus never appears: scoring reads the
    * encoded codes — the m-small-ints-per-vector frame that is the whole
    * point of PQ at 100 TB — joins the broadcast per-query LUTs, and
    * reduces through the bounded-heap top-k. */
  def probeTopK(index: PqIndex, queries: DataFrame, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding",
                filter: Option[Column] = None): DataFrame = {
    val geo = codebookGeometry(index.codebooks)
    // 4. SCORE — codes stream once, LUTs broadcast; m element_at lookups.
    //    The optional candidate predicate lands on the code frame BEFORE
    //    the LUT join: k survivors are k MATCHING survivors, and since
    //    flat PQ streams the whole code frame per probe, the equality
    //    cuts the scanned/scored rows — it rides the codes scan as a
    //    data filter, not a post-rank trim.
    val cand = filter.map(index.codes.filter).getOrElse(index.codes)
    val scored = cand
      .crossJoin(broadcast(lutFor(queries, index.codebooks, geo, idCol, vecCol)))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("score", round(adcExpr(geo), 6))
    Similarity.topKExplode(scored, "score", k)
  }

  /** ENCODE against FROZEN stored codebooks — the O(delta) ingest kernel
    * of the PQ family ([[buildIndex]] trains AND encodes; this only
    * encodes): each vector's j-th subvector scores the broadcast
    * codebook rows of subspace j and keeps the (L2 dist², code)
    * minimum — the assignment `KMeans.predict` makes under the same
    * centers (first-min tie-break = lowest code). m·codebookSize
    * constant rows broadcast, one conditional-min aggregate per vector,
    * output schema identical to [[buildIndex]]'s `codes` — so appended
    * codes union straight into a stored layout. */
  def encodeWithCodebooks(vectors: DataFrame, codebooks: DataFrame,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding",
                          keepCols: Seq[String] = Nil): DataFrame = {
    val geo = codebookGeometry(codebooks)
    val sv = slice(col("cvec"), col("__j") * geo.sub + lit(1), lit(geo.sub))
    val d2 = VectorExprs.dot(sv, sv) -
      lit(2.0) * VectorExprs.dot(sv, col("__cent")) +
      VectorExprs.dot(col("__cent"), col("__cent"))
    val scored = vectors.select(col(idCol).as("cand_id") +:
        col(vecCol).as("cvec") +: keepCols.map(col): _*)
      .crossJoin(broadcast(
        codebooks.select(col("__j"), col("__code"), col("__cent"))))
      .select(col("cand_id") +: col("__j") +:
        struct(d2.as("d"), col("__code").as("c")).as("__dc") +:
        keepCols.map(col): _*)
    val codeCols = (0 until geo.m).map(j =>
      min(when(col("__j") === j, col("__dc"))).getField("c").as(s"__c$j"))
    // attributes are constant within a cand_id's m·codebookSize scored
    // rows, so first() carries them exactly (the buildIndex keepCols
    // contract — appended codes union straight into a stored layout)
    val keepAggs = keepCols.map(c => first(col(c)).as(c))
    scored.groupBy("cand_id").agg(codeCols.head, codeCols.tail ++ keepAggs: _*)
  }

  /** Attribute columns a flat code frame carries beyond the core schema
    * (cand_id + __c*) — what the lifecycle ops must preserve. */
  private def extraCols(codes: DataFrame): Seq[String] =
    codes.columns
      .filterNot(c => c == "cand_id" || c.startsWith("__c")).toSeq

  /** O(delta) incremental ingest into a flat PQ index — the
    * [[IvfPq.appendToIndex]] shape without the coarse tier: delta
    * vectors are encoded against the FROZEN codebooks
    * ([[encodeWithCodebooks]] — per-vector function of (vector, stored
    * codebooks), so merged ≡ rebuilt under the same codebooks;
    * `sim_pq_merge` hash-certifies it on the grid construction) and
    * union straight into the code frame. PRECONDITION: delta ids are
    * NEW (the family contract). */
  def appendToIndex(index: PqIndex, delta: DataFrame,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): PqIndex =
    PqIndex(index.codebooks,
      index.codes.unionByName(
        encodeWithCodebooks(delta, index.codebooks, idCol, vecCol,
          keepCols = extraCols(index.codes))))

  /** O(removed) deletion — drop the removal set's thin code rows via a
    * broadcast anti-join; codebooks untouched ([[Ivf.removeFromIndex]]'s
    * contract: removed ≡ rebuilt-on-remainder trivially, rows are
    * per-vector). */
  def removeFromIndex(index: PqIndex, removedIds: DataFrame,
                      idCol: String = "vec_id"): PqIndex =
    PqIndex(index.codebooks,
      index.codes.join(
        broadcast(removedIds.select(col(idCol).as("cand_id"))),
        Seq("cand_id"), "left_anti"))

  /** Live corpus recovery shared by the LOSSY-code retrain family (this
    * flat tier and [[IvfPq]]'s two forms): the raw store restricted to
    * the ids the code frame currently holds — appends and takedowns both
    * respected, since both are reflected in the codes. FAIL FAST, twice:
    * attribute columns the index denormalizes must exist in the raw
    * store, and the live slice must cover the id set EXACTLY (a gapped
    * store would silently drop vectors from the retrained index, a
    * duplicate-id store would duplicate them; the two O(n) counts are
    * migration-time cost, never probe-time). */
  private[sim] def liveSlice(codes: DataFrame, attrs: Seq[String],
                             rawStore: DataFrame, idCol: String): DataFrame = {
    val missing = attrs.filterNot(rawStore.columns.contains)
    require(missing.isEmpty,
      s"raw store is missing attribute column(s) ${missing.mkString(", ")} " +
        s"the index denormalizes (found: ${rawStore.columns.mkString(", ")})")
    val live = rawStore.join(
      codes.select(col("cand_id").as(idCol)), Seq(idCol), "left_semi")
    val nLive = live.count()
    val nCodes = codes.count()
    require(nLive == nCodes,
      s"raw store yields $nLive rows for $nCodes live index ids — a " +
        "retrain over a gapped (or duplicate-id) raw store would silently " +
        "drop or duplicate vectors; reconcile the store first")
    live
  }

  /** Codebook RETRAIN + migration for the flat tier — the
    * [[IvfPq.retrainResidualIndex]] shape without the coarse quantizer:
    * codes are lossy, so live ids come from the index and raw vectors
    * from the raw store ([[liveSlice]]), then one fresh [[buildIndex]].
    * The trigger is [[meanDistortion]] (no cell occupancy exists to
    * skew here — what drifts is the QUANTIZATION ERROR as ingest moves
    * the data away from the trained codebooks). */
  def retrainIndex(index: PqIndex, rawStore: DataFrame,
                   m: Int = 4, codebookSize: Int = 16,
                   trainFraction: Double = 1.0, seed: Long = 42L,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): PqIndex = {
    val attrs = extraCols(index.codes)
    buildIndex(liveSlice(index.codes, attrs, rawStore, idCol),
      m, codebookSize, idCol, vecCol, trainFraction, seed, keepCols = attrs)
  }

  /** Quantization-distortion audit — the PQ tier's layout-health check
    * and retrain trigger, the codebook analog of [[Ivf.cellStats]]'s
    * occupancy balance: per subspace, the vector count and the summed
    * squared reconstruction error Σ|v_j − cent(code_j)|² (round-6).
    * Distortion is what frozen-codebook ingest ([[appendToIndex]],
    * [[graft.streaming.StreamOps.pqIngestBatch]]) silently grows as the
    * data drifts — ADC scores degrade with no visible failure — so a
    * nightly audit reads it and [[retrainIndexIfDistorted]] acts on it.
    * Needs the raw store (codes alone can't measure their own error);
    * one broadcast codebook join over the melted (vector, subspace)
    * rows, one aggregate — a maintenance-window pass, never probe-time.
    * `sim_pq_distortion` hash-certifies it against a CLOSED-FORM oracle
    * (exact-recovery slice contributes 0, a dyadically shifted slice
    * contributes exactly 0.0625·sub per vector per subspace). */
  def distortionStats(index: PqIndex, rawStore: DataFrame,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    val geo = codebookGeometry(index.codebooks)
    val attrs = extraCols(index.codes)
    val withVec = liveSlice(index.codes, attrs, rawStore, idCol)
      .select(col(idCol).as("cand_id"), col(vecCol).as("cvec"))
      .join(index.codes.select(col("cand_id") +:
        (0 until geo.m).map(j => col(s"__c$j")): _*), "cand_id")
    val melted = withVec.select(col("cvec"),
      posexplode(array((0 until geo.m).map(j => col(s"__c$j")): _*))
        .as(Seq("__j", "__code")))
    val sub = slice(col("cvec"), col("__j") * geo.sub + lit(1), lit(geo.sub))
    val diff = VectorExprs.sub(sub, col("__cent"))
    melted
      .join(broadcast(index.codebooks.select(col("__j"), col("__code"),
        col("__cent"))), Seq("__j", "__code"))
      .select(col("__j"), VectorExprs.dot(diff, diff).as("__e"))
      .groupBy(col("__j").as("subspace"))
      .agg(count(lit(1)).as("n_vecs"), round(sum(col("__e")), 6).as("sse"))
      .select(col("subspace"), col("n_vecs"), col("sse"))
  }

  /** Mean squared reconstruction error per vector (all subspaces summed)
    * — the scalar retrain trigger. One-row collect over the audit. */
  def meanDistortion(index: PqIndex, rawStore: DataFrame,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): Double = {
    val r = distortionStats(index, rawStore, idCol, vecCol)
      .agg(sum(col("sse")).as("sse"),
        (sum(col("n_vecs")) / countDistinct(col("subspace"))).as("n"))
      .collect()(0)
    if (r.isNullAt(1) || r.getDouble(1) == 0.0) 0.0
    else r.getDouble(0) / r.getDouble(1)
  }

  /** Trigger wired to handler: retrain iff the mean per-vector squared
    * reconstruction error exceeds `maxMeanSse` — the nightly
    * maintenance call ([[Ivf.retrainIfSkewed]]'s flat-PQ twin; the
    * threshold is in the embedding's own squared-norm units, so callers
    * set it relative to their vectors' scale). */
  def retrainIndexIfDistorted(index: PqIndex, rawStore: DataFrame,
                              maxMeanSse: Double,
                              m: Int = 4, codebookSize: Int = 16,
                              trainFraction: Double = 1.0, seed: Long = 42L,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding"): PqIndex =
    if (meanDistortion(index, rawStore, idCol, vecCol) > maxMeanSse)
      retrainIndex(index, rawStore, m, codebookSize, trainFraction, seed,
        idCol, vecCol)
    else index

  /** Codebook geometry re-derived from the (constant-sized) codebook rows
    * themselves — the stored form carries everything a probe needs, like
    * Ivf's centroids. Shared by [[probeTopK]] and [[IvfPq.probeTopK]]. */
  private[sim] case class CodebookGeometry(m: Int, sub: Int, offsets: Seq[Int])

  private[sim] def codebookGeometry(codebooks: DataFrame): CodebookGeometry = {
    val cb = codebooks.select(col("__j"), col("__code"), col("__flat"),
        col("__cent")).collect()
    require(cb.nonEmpty, "probeTopK: empty codebook frame")
    val m = cb.iterator.map(_.getInt(0)).max + 1
    val sub = cb.head.getSeq[Float](3).length
    require(cb.forall(_.getSeq[Float](3).length == sub),
      "probeTopK: codebook entries disagree on subvector width")
    val flats = cb.map(_.getInt(2)).sorted
    require(flats.sameElements(cb.indices),
      s"probeTopK: flat LUT indices not contiguous 0..${cb.length - 1}")
    CodebookGeometry(m, sub,
      (0 until m).map(j => cb.iterator.filter(_.getInt(0) == j).map(_.getInt(2)).min))
  }

  /** Step 3 — per-query flat LUT: each query row dots its subvectors
    * against every centroid; m·codebookSize tiny rows per query, folded
    * into one flat array ordered by the stored flat index. */
  private[sim] def lutFor(queries: DataFrame, codebooks: DataFrame,
                          geo: CodebookGeometry,
                          idCol: String, vecCol: String): DataFrame =
    queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .crossJoin(broadcast(codebooks))
      .withColumn("__partial", VectorExprs.dot(
        slice(col("qvec"), col("__j") * geo.sub + 1, lit(geo.sub)), col("__cent")))
      .groupBy("query_id")
      .agg(transform(array_sort(collect_list(struct(
          col("__flat").as("i"),
          col("__partial").as("p")))),
        e => e.getField("p")).as("__lut"))

  /** ADC score over a joined (codes ⋈ __lut) row: m element_at lookups,
    * summed left-to-right. */
  private[sim] def adcExpr(geo: CodebookGeometry): Column =
    (0 until geo.m).map(j =>
        element_at(col("__lut"),
          (lit(geo.offsets(j)) + col(s"__c$j") + 1).cast(IntegerType)))
      .reduce(_ + _)

  /** Two-stage serving: ADC shortlist → EXACT cosine re-rank — the
    * standard production ANN refinement (Jégou et al. 2011 §V.B: keep the
    * compressed-domain scan cheap, then correct the quantization error on
    * a handful of full vectors). Stage 1 scans PQ codes only (the 64×
    * compressed index) for the top-`shortlist` candidates per query;
    * stage 2 fetches ONLY those |queries|·shortlist raw vectors and ranks
    * the final k by exact rounded cosine.
    *
    * Scale shape: the shortlist frame is |queries|·shortlist ids — small
    * by construction — so it is BROADCAST against the raw corpus
    * (`corpus ⋈ bcast(shortlist)`): the 100 TB vector store is scanned,
    * never shuffled, and at 1000 executors the fetch is the selective
    * probe a serving tier actually pays (R point-reads per query), not a
    * second corpus pass. Queries broadcast as usual; the final top-k is
    * the bounded-heap aggregate. Same (rounded score, cand_id) tie-break
    * as [[Similarity.bruteForceTopK]], so `shortlist = |corpus|` degrades
    * to exact brute force (pinned by PqSpec). */
  def probeRerankTopK(index: PqIndex, corpus: DataFrame, queries: DataFrame,
                      k: Int, shortlist: Int,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    rerank(probeTopK(index, queries, shortlist, idCol, vecCol),
      corpus, queries, k, idCol, vecCol)
  }

  /** [[probeRerankTopK]] over the PORTABLE (id-strided codebook) PQ —
    * every stage SQL-replayable, so rerank recall@k is a hash-checkable
    * number (`sim_pq_rerank_recall`): the portable ADC shortlist, the
    * raw-vector fetch, the rounded-cosine re-rank, and the recall ratio
    * all replay in the DuckDB oracle. */
  def pqRerankTopKPortable(corpus: DataFrame, queries: DataFrame,
                           k: Int, shortlist: Int,
                           m: Int = 4, codebookSize: Int = 16, stride: Int = 29,
                           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    rerank(pqTopKPortable(corpus, queries, shortlist, m, codebookSize, stride,
      idCol, vecCol), corpus, queries, k, idCol, vecCol)
  }

  /** Stage 2 shared tail: exact rounded-cosine re-rank of a (query_id,
    * cand_id) shortlist against raw corpus vectors. The shortlist and the
    * queries broadcast; the corpus only streams. */
  private[sim] def rerank(shortlist: DataFrame, corpus: DataFrame, queries: DataFrame,
                     k: Int, idCol: String, vecCol: String): DataFrame = {
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cvec"),
      VectorExprs.norm(col(vecCol)).as("cn"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      VectorExprs.norm(col(vecCol)).as("qn"))
    val fetched = c.join(broadcast(shortlist.select("query_id", "cand_id")),
        Seq("cand_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", round(
        when(col("qn") > 0 && col("cn") > 0,
          VectorExprs.dot(col("qvec"), col("cvec")) / (col("qn") * col("cn")))
          .otherwise(lit(0.0)), 6))
    Similarity.topKExplode(fetched, "cosine", k)
  }

  /** PORTABLE PQ — the oracle bridge of the PQ family (`sim_pq_recall`):
    * identical encode (nearest-codebook-entry per subspace, squared-L2,
    * ties to the lowest code) and ADC scoring arithmetic as [[pqTopK]],
    * with the k-means training replaced by a DETERMINISTIC id-strided
    * codebook sample — entry `c` of subspace `j` is the subvector of the
    * corpus row with the (c+1)-th smallest id among ids divisible by
    * `stride`. Sampling-as-training is the k-means init step run for zero
    * Lloyd iterations (random codeword selection, Jégou et al. 2011 §III);
    * recall is a bit lower than trained codebooks, but every arithmetic
    * step — codebook selection, the squared-L2 assignment
    * (round(‖x‖² − 2·x·c + ‖c‖², 6), compared with a (dist, code)
    * lexicographic tie-break), the per-subspace LUT dot products, and the
    * left-to-right partial sum — replays exactly in SQL, which makes
    * recall@k of a REAL approximate-regime PQ a hash-checkable number
    * (`sim_pq_recall`); [[pqTopK]] (trained codebooks) stays the
    * production default, its recall floor pinned by PqSpec.
    *
    * Scale shape is [[pqTopK]]'s: the codebook is m·codebookSize
    * driver-side constant rows (the sanctioned `clusterCenters` analog,
    * fetched with an orderBy(id).limit — a TakeOrderedAndProject, no
    * global sort), assignment is a broadcast crossJoin + one groupBy
    * shuffle carrying one row per (vector, subspace), LUTs broadcast,
    * scoring is codegen'd `element_at` lookups, and the only corpus-sized
    * shuffle is the bounded-heap top-k. */
  def pqTopKPortable(corpus: DataFrame, queries: DataFrame, k: Int,
                     m: Int = 4, codebookSize: Int = 16, stride: Int = 29,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m > 0 && codebookSize > 1, s"need m > 0, codebookSize > 1; got $m/$codebookSize")
    require(stride > 0, s"stride must be > 0, got $stride")
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = corpus.select(size(col(vecCol)).as("d")).limit(1)
      .collect().headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException(
        "pqTopKPortable: empty corpus — nothing to sample codebooks from"))
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m subspaces")
    val sub = dim / m

    // TRAIN (deterministic sample): codebookSize whole vectors, sliced
    // driver-side into m per-subspace entries. orderBy+limit collapses to
    // TakeOrderedAndProject — constant-size driver result, like Pq's
    // clusterCenters.
    val sampled = corpus.filter(col(idCol) % stride === 0)
      .orderBy(col(idCol)).limit(codebookSize)
      .select(col(vecCol)).as[Array[Float]].collect()
    require(sampled.length == codebookSize,
      s"corpus has only ${sampled.length} ids divisible by stride=$stride; " +
        s"need codebookSize=$codebookSize (lower stride or codebookSize)")
    val cents = (for {
      j <- 0 until m
      (v, code) <- sampled.zipWithIndex
    } yield (j, code, j * codebookSize + code, v.slice(j * sub, (j + 1) * sub)))
      .toDF("__j", "__code", "__flat", "__cent")

    // ENCODE: broadcast crossJoin against the m·codebookSize constant rows,
    // per-(vector, subspace) argmin on the ROUNDED squared-L2 with a
    // (dist, code) lexicographic min — deterministic and SQL-replayable,
    // unlike min_by's arbitrary tie resolution. One shuffle, one row per
    // (vector, subspace); the centroid rides the struct (never compared:
    // equal (dist, code) implies the same entry).
    val sv = slice(col("cvec"), col("__j") * sub + 1, lit(sub))
    val dist = round(
      VectorExprs.dot(sv, sv) - lit(2.0) * VectorExprs.dot(sv, col("__cent")) +
        VectorExprs.dot(col("__cent"), col("__cent")), 6)
    val codes = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cvec"))
      .crossJoin(broadcast(cents))
      .select(col("cand_id"), col("__j"),
        struct(dist.as("d"), col("__code").as("c")).as("__dc"))
      .groupBy("cand_id")
      .agg((0 until m).map(j =>
          min(when(col("__j") === j, col("__dc"))).getField("c").as(s"__c$j")).head,
        (1 until m).map(j =>
          min(when(col("__j") === j, col("__dc"))).getField("c").as(s"__c$j")): _*)

    // LUT + SCORE: exactly pqTopK's tail (constant j*codebookSize offsets —
    // the sampled codebook is never deficient).
    val lut = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .crossJoin(broadcast(cents))
      .withColumn("__partial", VectorExprs.dot(
        slice(col("qvec"), col("__j") * sub + 1, lit(sub)), col("__cent")))
      .groupBy("query_id")
      .agg(transform(array_sort(collect_list(struct(
          col("__flat").as("i"),
          col("__partial").as("p")))),
        e => e.getField("p")).as("__lut"))
    val adc = (0 until m).map(j =>
        element_at(col("__lut"),
          (lit(j * codebookSize) + col(s"__c$j") + 1).cast(IntegerType)))
      .reduce(_ + _)
    val scored = codes.crossJoin(broadcast(lut))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("score", round(adc, 6))
    Similarity.topKExplode(scored, "score", k)
  }
}
