package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorExprs

/** A built IVF-PQ index: `centroids` is the coarse quantizer (cell, cent),
  * `codebooks` the per-subspace PQ codebooks (__j, __code, __flat, __cent),
  * `codes` the encoded corpus WITH its cell assignment
  * (cand_id, cell, __c0..__c{m-1}) — m small ints + a cell id per vector.
  * All three are plain DataFrames; write `codes` partitioned by `cell` and
  * a partial probe prunes whole partitions at the scan while reading only
  * PQ codes, never raw floats — the combined layout 100 TB ANN serving
  * actually uses (coarse pruning × 64× compression). */
case class IvfPqIndex(centroids: DataFrame, codebooks: DataFrame, codes: DataFrame)

/** IVF-PQ — the composite of [[Ivf]] (inverted-file coarse pruning) and
  * [[Pq]] (product-quantized ADC scoring), the standard large-scale ANN
  * index (Jégou et al. 2011 §V, public): the coarse quantizer selects
  * `nprobe` cells per query, and candidates inside those cells are scored
  * from their PQ codes by table lookup — the scan touches nprobe/nlist of
  * the corpus AND reads ~64× fewer bytes per touched vector.
  *
  * Two build forms share the probe plumbing: [[buildIndex]] quantizes RAW
  * vectors (flat PQ), [[buildResidualIndex]] quantizes residuals
  * `v − centroid(cell)` (IVFADC) — the standard recall refinement at the
  * same compression, scored as `q·centroid + ADC` by
  * [[probeResidualTopK]].
  *
  * Exactness pin (the [[Ivf]] nprobe = nlist × [[Pq]] grid-recovery tricks
  * COMPOSED): probing every cell makes the coarse quantizer drop out, and
  * a grid corpus makes ADC equal the exact inner product — so the whole
  * composite pipeline (train × 2, encode, cell join, LUT scoring, heap
  * rerank) reproduces brute force bit-for-bit and shares the brute-force
  * SQL oracle (`sim_ivfpq_exact`). */
object IvfPq {

  /** TRAIN + ENCODE: one IVF coarse quantizer, m PQ codebooks, and a
    * single build-time join attaching each vector's cell to its codes
    * (both halves are map-only encodes of the same corpus; the join is
    * paid once at build, never at probe). */
  def buildIndex(corpus: DataFrame, nlist: Int = 16,
                 m: Int = 4, codebookSize: Int = 16,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 trainFraction: Double = 1.0, seed: Long = 42L,
                 keepCols: Seq[String] = Nil): IvfPqIndex = {
    // The coarse-quantizer fit and the m codebook fits are independent
    // seeded trainings over the same corpus — overlap them (guide §2.6,
    // graft.util.Parallel; models unchanged, only wall-clock overlaps).
    val (ivf, pq) = graft.util.Parallel.par2(corpus.sparkSession)(
      () => Ivf.buildIndex(corpus, nlist, idCol, vecCol, seed),
      () => Pq.buildIndex(corpus, m, codebookSize, idCol, vecCol,
        trainFraction, seed))
    val codes = pq.codes.join(
      ivf.assigned.select(col("cand_id"), col("cell")), "cand_id")
    IvfPqIndex(ivf.centroids, pq.codebooks,
      withAttributes(codes, corpus, idCol, keepCols))
  }

  /** Denormalize attribute columns (filtered-ANN `keepCols`) onto the
    * thin code rows — attributes must live IN the index for a probe-time
    * predicate to avoid a per-request join against the raw corpus. */
  private def withAttributes(codes: DataFrame, corpus: DataFrame,
                             idCol: String, keepCols: Seq[String]): DataFrame =
    if (keepCols.isEmpty) codes
    else codes.join(
      corpus.select(col(idCol).as("cand_id") +: keepCols.map(col): _*),
      "cand_id")

  /** PROBE: rank cells per query by centroid distance (broadcast
    * constants), keep `nprobe`, join the probed cells against the coded
    * corpus (shuffle bounded by nprobe/nlist of the CODES — thin rows),
    * ADC-score from broadcast LUTs, bounded-heap top-k. The raw corpus
    * never appears. */
  def probeTopK(index: IvfPqIndex, queries: DataFrame, k: Int,
                nprobe: Int = 4,
                idCol: String = "vec_id", vecCol: String = "embedding",
                filter: Option[Column] = None): DataFrame = {
    val geo = Pq.codebookGeometry(index.codebooks)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scoredCells = q.crossJoin(broadcast(index.centroids))
      .withColumn("__dist2",
        VectorExprs.dot(col("qvec"), col("qvec"))
          - lit(2.0) * VectorExprs.dot(col("qvec"), col("cent"))
          + VectorExprs.dot(col("cent"), col("cent")))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("__dist2"), col("cell"))
    val probes = scoredCells
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("cell"))
    val lut = Pq.lutFor(queries, index.codebooks, geo, idCol, vecCol)
    // filtered ANN: the attribute predicate restricts the thin code rows
    // BELOW the top-k (k survivors are k MATCHING survivors)
    val codes = filter.map(index.codes.filter).getOrElse(index.codes)
    val scored = codes
      .join(probes.hint("broadcast"), Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .join(broadcast(lut), "query_id")
      .withColumn("score", round(Pq.adcExpr(geo), 6))
    Similarity.topKExplode(scored, "score", k)
  }

  /** Self-contained build + probe — the registry-oracle form. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nlist: Int = 16, nprobe: Int = 4,
                m: Int = 4, codebookSize: Int = 16,
                idCol: String = "vec_id", vecCol: String = "embedding",
                seed: Long = 42L): DataFrame =
    probeTopK(buildIndex(corpus, nlist, m, codebookSize, idCol, vecCol,
      trainFraction = 1.0, seed), queries, k, nprobe, idCol, vecCol)

  /** TRAIN + ENCODE with RESIDUAL encoding (Jégou et al. 2011 §V-A: the
    * IVFADC variant): PQ quantizes `r = v − centroid(cell)` instead of
    * the raw vector. Subtracting the coarse centroid removes the
    * between-cell offset — the dominant variance component on clustered
    * data — so the per-subspace codebooks spend their codebookSize
    * entries on WITHIN-cell structure and recall rises at identical
    * (nlist, m, codebookSize). The index frames have the same shapes as
    * [[buildIndex]]'s (store `codes` partitioned by cell, read back,
    * probe); probing must go through [[probeResidualTopK]], whose score
    * is `q·centroid(cell) + q·r̂` (inner product against the
    * reconstruction `centroid + r̂`).
    *
    * Scale shape: one extra broadcast join (nlist constant rows) and a
    * codegen'd `vec_sub` map step over the corpus at BUILD time; probe
    * cost is identical to the flat form — the per-(query, probed-cell)
    * `q·centroid` constant rides the existing probes frame. */
  def buildResidualIndex(corpus: DataFrame, nlist: Int = 16,
                         m: Int = 4, codebookSize: Int = 16,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         trainFraction: Double = 1.0, seed: Long = 42L,
                         keepCols: Seq[String] = Nil): IvfPqIndex = {
    val ivf = Ivf.buildIndex(corpus, nlist, idCol, vecCol, seed)
    val residuals = ivf.assigned
      .join(broadcast(ivf.centroids), Seq("cell"))
      .select(col("cand_id"), col("cell"),
        VectorExprs.sub(col("cvec"), col("cent")).as("__rvec"))
    val pq = Pq.buildIndex(residuals, m, codebookSize,
      idCol = "cand_id", vecCol = "__rvec",
      trainFraction = trainFraction, seed = seed)
    val codes = pq.codes.join(
      residuals.select(col("cand_id"), col("cell")), "cand_id")
    IvfPqIndex(ivf.centroids, pq.codebooks,
      withAttributes(codes, corpus, idCol, keepCols))
  }

  /** FROZEN-quantizer cell assignment shared by both append forms: exact
    * (unrounded) L2 to each broadcast centroid, (dist², cell) minimum —
    * `KMeans.predict` semantics without the model object, so a stored
    * centroid frame is all an ingest job needs. */
  private def assignFrozen(vectors: DataFrame, centroids: DataFrame,
                           idCol: String, vecCol: String): DataFrame = {
    val d2 = VectorExprs.dot(col("cvec"), col("cvec")) -
      lit(2.0) * VectorExprs.dot(col("cvec"), col("cent")) +
      VectorExprs.dot(col("cent"), col("cent"))
    vectors.select(col(idCol).as("cand_id"), col(vecCol).as("cvec"))
      .crossJoin(broadcast(centroids))
      .select(col("cand_id"), col("cvec"),
        struct(d2.as("d"), col("cell").as("c")).as("__dc"))
      .groupBy("cand_id")
      .agg(min(col("__dc")).getField("c").as("cell"),
        first(col("cvec")).as("cvec"))
  }

  /** O(delta) incremental ingest into a FLAT IVF-PQ index: delta vectors
    * are assigned to the FROZEN coarse cells and encoded against the
    * FROZEN codebooks ([[Pq.encodeWithCodebooks]]) — neither quantizer
    * retrains, the base corpus is never re-read, and on a
    * cell-partitioned stored layout the thin code rows append into only
    * the delta's cells. Both steps are per-vector functions of
    * (vector, stored quantizers), which is what makes the index
    * mergeable: merged ≡ rebuilt under the same quantizers.
    * PRECONDITION: delta ids are NEW (the family contract). */
  def appendToIndex(index: IvfPqIndex, delta: DataFrame,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): IvfPqIndex = {
    val assigned = assignFrozen(delta, index.centroids, idCol, vecCol)
    val newCodes = Pq.encodeWithCodebooks(assigned, index.codebooks,
        idCol = "cand_id", vecCol = "cvec")
      .join(assigned.select(col("cand_id"), col("cell")), "cand_id")
    IvfPqIndex(index.centroids, index.codebooks,
      index.codes.unionByName(
        withAttributes(newCodes, delta, idCol, extraCols(index.codes))))
  }

  /** Attribute columns a code frame carries beyond the core schema —
    * what the append paths must preserve (the delta provides them). */
  private def extraCols(codes: DataFrame): Seq[String] =
    codes.columns
      .filterNot(c => c == "cand_id" || c == "cell" || c.startsWith("__c"))
      .toSeq

  /** O(delta) incremental ingest into a RESIDUAL (IVFADC) index — the
    * [[appendToIndex]] shape with the residual subtraction in between:
    * frozen cell assignment, `r = v − centroid(cell)`, frozen-codebook
    * encode of the residual. The `sim_ivfpq_merge` face hash-certifies
    * the appended cells/scores against the grid brute-force oracle;
    * IvfPqSpec pins nonzero-residual append ≡ rebuild on the dyadic
    * two-cluster construction. */
  def appendToResidualIndex(index: IvfPqIndex, delta: DataFrame,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): IvfPqIndex =
    IvfPqIndex(index.centroids, index.codebooks,
      index.codes.unionByName(
        encodeDeltaResidual(index, delta, idCol, vecCol)))

  /** The delta-encoding kernel of [[appendToResidualIndex]], exposed for
    * streaming ingest ([[graft.streaming.StreamOps.ivfPqIngestStream]]):
    * frozen cell assignment → residual against the stored centroid →
    * frozen-codebook encode, returning ONLY the new thin code rows
    * (cand_id, __c*, cell) — the frame a stored layout appends,
    * partitioned by cell. Never reads `index.codes`. */
  def encodeDeltaResidual(index: IvfPqIndex, delta: DataFrame,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val assigned = assignFrozen(delta, index.centroids, idCol, vecCol)
    val residuals = assigned.join(broadcast(index.centroids), Seq("cell"))
      .select(col("cand_id"), col("cell"),
        VectorExprs.sub(col("cvec"), col("cent")).as("__rvec"))
    val newCodes = Pq.encodeWithCodebooks(residuals, index.codebooks,
        idCol = "cand_id", vecCol = "__rvec")
      .join(residuals.select(col("cand_id"), col("cell")), "cand_id")
    withAttributes(newCodes, delta, idCol, extraCols(index.codes))
  }

  /** O(removed) deletion — the [[Ivf.removeFromIndex]] twin for both
    * PQ-coded forms (flat and residual share the codes schema): drop the
    * removal set's thin code rows, quantizers untouched. */
  def removeFromIndex(index: IvfPqIndex, removedIds: DataFrame,
                      idCol: String = "vec_id"): IvfPqIndex =
    IvfPqIndex(index.centroids, index.codebooks,
      index.codes.join(
        broadcast(removedIds.select(col(idCol).as("cand_id"))),
        Seq("cand_id"), "left_anti"))

  /** Live corpus recovery for the retrain family: the raw store
    * restricted to the ids the index currently holds. The code frame is
    * LOSSY (m small ints per vector), so — unlike the flat IVF family,
    * whose assigned frame carries every raw vector — the corpus cannot
    * be reconstructed from the index; what the index DOES hold
    * authoritatively is the LIVE ID SET (every [[appendToIndex]] /
    * [[appendToResidualIndex]] ingest and every [[removeFromIndex]]
    * takedown is reflected in `codes`). One id semi-join against the
    * raw store — the same store the IVFADC+R rerank tier
    * ([[probeResidualRerankTopK]]) already keeps next to the index —
    * paid once per migration, never per probe.
    *
    * FAIL FAST, twice: attribute columns the index denormalizes must
    * exist in the raw store (they are re-denormalized by the rebuild),
    * and the live slice must cover the id set EXACTLY — a gapped raw
    * store would silently drop documents from the retrained index, and
    * duplicate store ids would duplicate them (the two O(n) counts are
    * migration-time cost, not probe-time). */
  private def liveSlice(index: IvfPqIndex, rawStore: DataFrame,
                        idCol: String): (DataFrame, Seq[String]) = {
    val attrs = extraCols(index.codes)
    (Pq.liveSlice(index.codes, attrs, rawStore, idCol), attrs)
  }

  /** Quantizer RETRAIN + migration for the RESIDUAL (IVFADC) index — the
    * [[Ivf.retrainIndex]] handler for the compressed tier's
    * balance-factor trigger: months of frozen-quantizer ingest drift the
    * data away from both the coarse centroids (probe-latency skew — one
    * hot cell) and the residual codebooks (ADC distortion creep); the
    * remedy retrains BOTH on the current live corpus. Live ids come from
    * the index, raw vectors from the raw store ([[liveSlice]] — codes
    * are lossy), then one fresh [[buildResidualIndex]] over that slice;
    * attribute columns (filtered-ANN keepCols) are re-denormalized from
    * the store. Retrained ≡ built-fresh-on-live-corpus BY CONSTRUCTION;
    * what needs certifying is the live-set recovery, and the
    * `sim_ivfpq_retrain` face does exactly that — it drifts an index
    * with an append AND a removal before retraining, so a wrong live set
    * surfaces as a missing/extra candidate in the grid-exact hash.
    * IvfPqSpec pins that a skewed balance factor drops. */
  def retrainResidualIndex(index: IvfPqIndex, rawStore: DataFrame,
                           nlist: Int = 16, m: Int = 4, codebookSize: Int = 16,
                           trainFraction: Double = 1.0, seed: Long = 42L,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): IvfPqIndex = {
    val (live, attrs) = liveSlice(index, rawStore, idCol)
    buildResidualIndex(live, nlist, m, codebookSize, idCol, vecCol,
      trainFraction, seed, keepCols = attrs)
  }

  /** [[retrainResidualIndex]] for the FLAT form ([[buildIndex]]'s raw
    * PQ codes) — same live-set recovery, same fail-fast contract. */
  def retrainIndex(index: IvfPqIndex, rawStore: DataFrame,
                   nlist: Int = 16, m: Int = 4, codebookSize: Int = 16,
                   trainFraction: Double = 1.0, seed: Long = 42L,
                   idCol: String = "vec_id",
                   vecCol: String = "embedding"): IvfPqIndex = {
    val (live, attrs) = liveSlice(index, rawStore, idCol)
    buildIndex(live, nlist, m, codebookSize, idCol, vecCol,
      trainFraction, seed, keepCols = attrs)
  }

  /** Balance factor `n_max · nlist / n_total` of the coarse partitioning
    * (ideal 1; grows as frozen-quantizer ingest drifts) — the retrain
    * trigger, read from only the thin `cell` column of the code frame
    * ([[Ivf.cellStats]] machinery; the codes schema carries `cell`). */
  def balanceFactor(index: IvfPqIndex): Double =
    Ivf.balanceFactorOf(index.centroids.count(), index.codes)

  /** Trigger wired to handler for the residual tier: retrain iff the
    * balance factor exceeds `maxBalance` — the call a nightly
    * maintenance job makes unconditionally ([[Ivf.retrainIfSkewed]]'s
    * twin; the raw store rides along because codes are lossy). */
  def retrainResidualIfSkewed(index: IvfPqIndex, rawStore: DataFrame,
                              maxBalance: Double = 2.0,
                              nlist: Int = 16, m: Int = 4,
                              codebookSize: Int = 16,
                              trainFraction: Double = 1.0, seed: Long = 42L,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding"): IvfPqIndex =
    if (balanceFactor(index) > maxBalance)
      retrainResidualIndex(index, rawStore, nlist, m, codebookSize,
        trainFraction, seed, idCol, vecCol)
    else index

  /** Quantization-distortion audit for the RESIDUAL (IVFADC) index —
    * [[Pq.distortionStats]]'s compressed-tier twin and the second half
    * of the layout-health pair ([[Ivf.cellStats]] watches the coarse
    * quantizer's occupancy; this watches the residual codebooks'
    * reconstruction error, which frozen-quantizer ingest silently grows
    * as data drifts — ADC scores degrade with no visible failure): per
    * subspace, the vector count and Σ|v_j − (centroid(cell)_j + r̂_j)|²
    * (round-6) — the error against the FULL reconstruction, coarse +
    * residual codeword. Needs the raw store (codes can't measure their
    * own error; [[Pq.liveSlice]]'s fail-fast contract applies); one
    * broadcast join per quantizer artifact over the melted rows — a
    * maintenance-window pass. `sim_ivfpq_distortion` hash-certifies it
    * against the same closed-form oracle as the flat tier (zero-residual
    * slice contributes 0, the dyadically shifted slice exactly
    * 0.0625·sub per vector per subspace). */
  def distortionResidualStats(index: IvfPqIndex, rawStore: DataFrame,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding"): DataFrame = {
    val geo = Pq.codebookGeometry(index.codebooks)
    val attrs = extraCols(index.codes)
    val withVec = Pq.liveSlice(index.codes, attrs, rawStore, idCol)
      .select(col(idCol).as("cand_id"), col(vecCol).as("cvec"))
      .join(index.codes.select(col("cand_id") +: col("cell") +:
        (0 until geo.m).map(j => col(s"__c$j")): _*), "cand_id")
      .join(broadcast(index.centroids), Seq("cell"))
    val melted = withVec.select(col("cvec"), col("cent"),
      posexplode(array((0 until geo.m).map(j => col(s"__c$j")): _*))
        .as(Seq("__j", "__code")))
    val start = col("__j") * geo.sub + lit(1)
    val residual = VectorExprs.sub(
      slice(col("cvec"), start, lit(geo.sub)),
      slice(col("cent"), start, lit(geo.sub)))
    val diff = VectorExprs.sub(residual, col("__cent"))
    melted
      .join(broadcast(index.codebooks.select(col("__j"), col("__code"),
        col("__cent"))), Seq("__j", "__code"))
      .select(col("__j"), VectorExprs.dot(diff, diff).as("__e"))
      .groupBy(col("__j").as("subspace"))
      .agg(count(lit(1)).as("n_vecs"), round(sum(col("__e")), 6).as("sse"))
      .select(col("subspace"), col("n_vecs"), col("sse"))
  }

  /** Mean squared reconstruction error per vector for the residual
    * index — the codebook-drift scalar beside [[balanceFactor]]'s
    * occupancy scalar; together they trigger
    * [[retrainResidualIfSkewed]]-class maintenance. */
  def meanResidualDistortion(index: IvfPqIndex, rawStore: DataFrame,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding"): Double = {
    val r = distortionResidualStats(index, rawStore, idCol, vecCol)
      .agg(sum(col("sse")).as("sse"),
        (sum(col("n_vecs")) / countDistinct(col("subspace"))).as("n"))
      .collect()(0)
    if (r.isNullAt(1) || r.getDouble(1) == 0.0) 0.0
    else r.getDouble(0) / r.getDouble(1)
  }

  /** PROBE over a residual-encoded index: identical movement to
    * [[probeTopK]] (broadcast cell ranking, bounded candidate join,
    * broadcast LUTs, bounded-heap top-k) — the only difference is the
    * score, `q·centroid(cell) + ADC(q, r̂)`, whose first term is computed
    * once per (query, probed cell) while ranking cells and carried on the
    * probes frame (nprobe rows per query, broadcast). */
  def probeResidualTopK(index: IvfPqIndex, queries: DataFrame, k: Int,
                        nprobe: Int = 4,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        filter: Option[Column] = None): DataFrame = {
    val geo = Pq.codebookGeometry(index.codebooks)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scoredCells = q.crossJoin(broadcast(index.centroids))
      .withColumn("__qc", VectorExprs.dot(col("qvec"), col("cent")))
      .withColumn("__dist2",
        VectorExprs.dot(col("qvec"), col("qvec"))
          - lit(2.0) * col("__qc")
          + VectorExprs.dot(col("cent"), col("cent")))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("__dist2"), col("cell"))
    val probes = scoredCells
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("cell"), col("__qc"))
    val lut = Pq.lutFor(queries, index.codebooks, geo, idCol, vecCol)
    // filtered ANN: predicate over denormalized attribute columns on the
    // thin code rows, below the top-k — and at the probed cells' scan on
    // a stored layout
    val codes = filter.map(index.codes.filter).getOrElse(index.codes)
    val scored = codes
      .join(probes.hint("broadcast"), Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .join(broadcast(lut), "query_id")
      .withColumn("score", round(col("__qc") + Pq.adcExpr(geo), 6))
    Similarity.topKExplode(scored, "score", k)
  }

  /** Self-contained residual build + probe — the registry-oracle form. */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                        nlist: Int = 16, nprobe: Int = 4,
                        m: Int = 4, codebookSize: Int = 16,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        seed: Long = 42L): DataFrame =
    probeResidualTopK(buildResidualIndex(corpus, nlist, m, codebookSize,
      idCol, vecCol, trainFraction = 1.0, seed), queries, k, nprobe, idCol, vecCol)

  /** IVFADC+R (Jégou, Tavenard, Douze, Amsaleg 2011, "Searching in one
    * billion vectors: re-rank with source coding", public): the full
    * production ANN serving stack — coarse cells prune the scan, residual
    * PQ codes ADC-score the survivors into a top-`shortlist`, and ONLY
    * those |queries|·shortlist raw vectors are fetched for the exact
    * cosine re-rank to the final k. Three tiers of data movement: cell
    * pruning (nprobe/nlist of the code frame), 64×-compressed ADC
    * scoring, and point-reads of the shortlist against the raw store
    * ([[Pq.rerank]]'s broadcast-shortlist join — the corpus streams,
    * never shuffles).
    *
    * Exactness composition (IvfPqSpec): nprobe = nlist makes coarse
    * pruning drop out and shortlist = |corpus| makes the ADC stage a
    * pass-through, so the whole three-tier pipeline must equal exact
    * brute force bit-for-bit. At production parameters the spec pins
    * rerank recall ≥ plain residual-ADC recall. */
  def probeResidualRerankTopK(index: IvfPqIndex, corpus: DataFrame,
                              queries: DataFrame, k: Int, shortlist: Int,
                              nprobe: Int = 4,
                              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    Pq.rerank(probeResidualTopK(index, queries, shortlist, nprobe, idCol, vecCol),
      corpus, queries, k, idCol, vecCol)
  }
}
