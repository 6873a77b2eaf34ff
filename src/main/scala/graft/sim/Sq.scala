package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExprs

/** Int8 SCALAR quantization (SQ8) as a stored index family — the 4×
  * tier of the quantized-serving spectrum (flat float 1× → SQ8 4× →
  * PQ/IVF-PQ 64×), the symmetric per-vector form Faiss ships as
  * `ScalarQuantizer` (Jégou et al., Faiss, public) and vector stores
  * default to when recall must stay near-exact.
  *
  * Construction (all inside whole-stage codegen — the
  * [[graft.functions.VectorExprs.quantizeI8]] /
  * [[graft.functions.VectorExprs.dotI8]] expressions):
  * scale = max|x|/127 PER VECTOR, q_d = floor(x_d/scale + 0.5) clamped
  * to a signed byte; score(q, c) = q.scale · c.scale · Σ q_d·c_d with
  * the sum in exact 64-bit integers. Two properties fall out:
  *
  *   - NOTHING IS TRAINED. The scale is a per-vector statistic, so
  *     append ≡ rebuild EXACTLY (not just under frozen artifacts like
  *     the k-means tiers), takedown cannot drift anything, and the
  *     family legitimately has no retrain handler — the [[Similarity]]
  *     RP story, with even stronger merge semantics.
  *   - The ranking is HASH-PORTABLE: the integer dot is
  *     order-independent, and the two scale factors are one IEEE
  *     multiply each — the whole stored probe replays in SQL
  *     (`sim_sq_*` faces are hash-green, unlike the trained tiers whose
  *     full-probe faces are rows-only).
  *
  * Storage story at 100 TB: a 64-dim float32 vector is 256 B; its SQ8
  * row is 64 bytes + one double — the scan-IO cut the probe pays for
  * with one multiply per candidate, no codebook broadcast, no LUT. The
  * quantized frame is UNPARTITIONED like flat PQ's codes (every probe
  * scans it); cell-pruned variants compose by quantizing inside an IVF
  * cell layout instead. */
case class SqIndex(quantized: DataFrame)

object Sq {

  /** Map-only per-vector quantization — (idCol → cand_id, scale, q,
    * keepCols...). The flattened struct is parquet-friendly and is the
    * at-rest 4× representation; [[probeTopK]] rebuilds the struct
    * column-wise (the dot expression checks types, not names). */
  def quantize(vectors: DataFrame, idCol: String = "vec_id",
               vecCol: String = "embedding",
               keepCols: Seq[String] = Nil): DataFrame =
    vectors.select(col(idCol).as("cand_id") +:
        VectorExprs.quantizeI8(col(vecCol)).as("__sq") +:
        keepCols.map(col): _*)
      .select(col("cand_id") +: col("__sq.scale").as("scale") +:
        col("__sq.q").as("q") +: keepCols.map(col): _*)

  /** Build = quantize (no training step — see the object scaladoc). */
  def buildIndex(corpus: DataFrame, idCol: String = "vec_id",
                 vecCol: String = "embedding",
                 keepCols: Seq[String] = Nil): SqIndex =
    SqIndex(quantize(corpus, idCol, vecCol, keepCols))

  private def quantStruct(scale: Column, q: Column): Column =
    struct(scale.as("scale"), q.as("q"))

  /** Top-k by reconstructed inner product over the stored quantized
    * frame: queries are quantized on the fly (same expression as the
    * build — symmetric SQ), broadcast against one stream of the thin
    * frame, scored by the codegen'd byte dot, ranked by the bounded-heap
    * top-k. `filter` is the family's candidate predicate: applied to the
    * quantized frame BEFORE scoring, so k survivors are k MATCHING
    * survivors and every filtered row is scan work saved. Self-pairs
    * (query id present in the corpus) are excluded, the [[Similarity]]
    * id-space contract.
    *
    * `knownDim`: callers that ALREADY validated both sides against a
    * known dimension (e.g. [[graft.serve.AnnSqService]], which probes
    * the stored width once at open time and `require`s every request
    * vector against it) pass it here to skip the per-invocation one-row
    * dim probes — two driver-blocking Spark jobs saved per request on
    * the serving path. */
  def probeTopK(index: SqIndex, queries: DataFrame, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding",
                filter: Option[Column] = None,
                knownDim: Option[Int] = None): DataFrame = {
    // dotI8 dots the COMMON PREFIX of the two byte arrays — a
    // wrong-width query would return a plausible-but-truncated ranking
    // silently. One-row dim probes on both sides (the sanctioned scalar
    // gate, [[Pq.buildIndex]]'s shape) make it a loud argument error;
    // skipped only when the caller certified the dim (`knownDim`).
    if (knownDim.isEmpty) {
      val idxDim = index.quantized
        .select(length(col("q")).cast("int").as("d")).limit(1)
        .collect().headOption.map(_.getInt(0))
      val qDim = queries.select(size(col(vecCol)).as("d")).limit(1)
        .collect().headOption.map(_.getInt(0))
      (idxDim, qDim) match {
        case (Some(di), Some(dq)) => require(di == dq,
          s"query vectors have $dq dims; the index carries $di")
        case _ => () // an empty side yields an empty result anyway
      }
    }
    val q = queries.select(col(idCol).as("query_id"),
      VectorExprs.quantizeI8(col(vecCol)).as("qq"))
    val cand = filter.map(index.quantized.filter).getOrElse(index.quantized)
    val scored = cand
      .join(broadcast(q), col("query_id") =!= col("cand_id"))
      .withColumn("score", round(
        VectorExprs.dotI8(col("qq"),
          quantStruct(col("scale"), col("q"))), 6))
    Similarity.topKExplode(scored, "score", k)
  }

  /** Attribute columns beyond the core (cand_id, scale, q) schema —
    * what the lifecycle ops must preserve. */
  private def extraCols(quantized: DataFrame): Seq[String] =
    quantized.columns
      .filterNot(c => c == "cand_id" || c == "scale" || c == "q").toSeq

  /** O(delta) ingest: per-vector quantization has no frozen artifact to
    * respect, so append is exactly a quantize + union — merged ≡ rebuilt
    * identically (`sim_sq_merge` hash-certifies against the full-corpus
    * replay). PRECONDITION: delta ids are new (the family contract). */
  def appendToIndex(index: SqIndex, delta: DataFrame,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): SqIndex =
    SqIndex(index.quantized.unionByName(
      quantize(delta, idCol, vecCol, keepCols = extraCols(index.quantized))))

  /** O(removed) deletion — broadcast anti-join on the thin rows; removed
    * ≡ rebuilt-on-remainder holds trivially (rows are per-vector). */
  def removeFromIndex(index: SqIndex, removedIds: DataFrame,
                      idCol: String = "vec_id"): SqIndex =
    SqIndex(index.quantized.join(
      broadcast(removedIds.select(col(idCol).as("cand_id"))),
      Seq("cand_id"), "left_anti"))
}
