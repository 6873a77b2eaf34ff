package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
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
object Pq {

  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 4, codebookSize: Int = 16,
             idCol: String = "vec_id", vecCol: String = "embedding",
             trainFraction: Double = 1.0, seed: Long = 42L): DataFrame = {
    require(m > 0 && codebookSize > 1, s"need m > 0, codebookSize > 1; got $m/$codebookSize")
    require(trainFraction > 0 && trainFraction <= 1.0,
      s"trainFraction must be in (0, 1], got $trainFraction")
    val spark = corpus.sparkSession
    import spark.implicits._
    // one-row scalar gate (dimension), same sanctioned shape as Quality's
    val dim = corpus.select(size(col(vecCol)).as("d")).limit(1).head().getInt(0)
    require(dim % m == 0, s"vector dim $dim not divisible by m=$m subspaces")
    val sub = dim / m

    // 1. TRAIN — m seeded fits; sample the corpus for training at scale
    //    (codebooks need representative structure, not every row).
    val models = (0 until m).map { j =>
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

    // 2. ENCODE — m map-only transforms; codes stay as m int columns so the
    //    scoring expression below is pure codegen (no array HOF).
    var enc = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cvec"))
    for (j <- 0 until m) {
      enc = models(j).setPredictionCol(s"__c$j").transform(
          enc.withColumn("__fv",
            array_to_vector(slice(col("cvec"), j * sub + 1, sub))))
        .drop("__fv")
    }
    val codes = enc.select(col("cand_id") +: (0 until m).map(j => col(s"__c$j")): _*)

    // 3. LUT — centroids are driver-side constants; each query row builds a
    //    flat array. K-means can legitimately return FEWER than
    //    `codebookSize` centers when a subspace has fewer distinct points
    //    (exactly the exact-recovery regime), so the flat index uses
    //    per-subspace offsets computed from the ACTUAL center counts — a
    //    constant j*codebookSize stride would silently misalign every
    //    subspace after a deficient one.
    val offsets = models.map(_.clusterCenters.length).scanLeft(0)(_ + _)
    // the flat LUT index is a pure driver-side constant per centroid row —
    // precompute it into the broadcast frame rather than re-deriving it
    // with a per-row conditional in the crossJoin
    val cents = (for {
      j <- 0 until m
      (c, code) <- models(j).clusterCenters.zipWithIndex
    } yield (j, code, offsets(j) + code, c.toArray.map(_.toFloat)))
      .toDF("__j", "__code", "__flat", "__cent")
    val lut = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .crossJoin(broadcast(cents))
      .withColumn("__partial", VectorExprs.dot(
        slice(col("qvec"), col("__j") * sub + 1, lit(sub)), col("__cent")))
      .groupBy("query_id")
      .agg(transform(array_sort(collect_list(struct(
          col("__flat").as("i"),
          col("__partial").as("p")))),
        e => e.getField("p")).as("__lut"))

    // 4. SCORE — corpus streams once, LUTs broadcast; m element_at lookups.
    val adc = (0 until m).map(j =>
        element_at(col("__lut"),
          (lit(offsets(j)) + col(s"__c$j") + 1).cast(IntegerType)))
      .reduce(_ + _)
    val scored = codes.crossJoin(broadcast(lut))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("score", round(adc, 6))
    Similarity.topKExplode(scored, "score", k)
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
    val dim = corpus.select(size(col(vecCol)).as("d")).limit(1).head().getInt(0)
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
