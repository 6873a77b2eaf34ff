package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.text.TextOps

/** Deduplication family for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (the part that matters at 100 TB):
  *   - exact dedup = hash-groupBy — one shuffle on a 64-bit key.
  *   - MinHash-LSH = shingle → minhash signature (map-only) → band keys →
  *     EXPLODE bands → shuffle on (band, bandHash) buckets → candidate
  *     pairs only within buckets. Never an all-pairs product: candidate
  *     count is data-dependent, not O(n²).
  *   - SimHash = 64-bit signature map-only; near-dup candidates via exact
  *     signature (or banded sub-signatures) — again bucketed.
  *   - verification joins re-check candidates with the exact measure, so
  *     LSH recall/precision trade is explicit and auditable. */
object Dedup {

  /** Exact duplicate groups: key = 64-bit fingerprint of normalized text.
    * Returns one row per group with the canonical (min) id and group size. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextOps.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))

  /** Exact dedup: keep the lowest-id row of each normalized-text group.
    * Window over the fingerprint — single shuffle, no join back. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(TextOps.fingerprint(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature: `numHashes` permutations approximated by seeded
    * xxhash64 over the shingle set (standard public construction).
    *
    * Single pass over the shingles: each shingle emits its `numHashes`
    * seeded hashes once and the signature is the element-wise running min.
    * (The naive per-seed formulation re-evaluates the shingle expression
    * `numHashes` times after Catalyst's CollapseProject inlines it — 64×
    * the work at 100 TB.) */
  def minHashSignature(textCol: Column, numHashes: Int = 64, shingleK: Int = 5): Column =
    aggregate(
      TextOps.charShingles(textCol, shingleK),
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, s) => zip_with(
        acc,
        transform(sequence(lit(0), lit(numHashes - 1)), i => xxhash64(s, i)),
        (a, b) => least(a, b)))

  /** MinHash-LSH candidate pairs: signature split into `bands` bands of
    * rows; docs sharing any band bucket become candidates; candidates are
    * verified with exact shingle-Jaccard and filtered by `threshold`.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    *
    * numHashes = bands * rowsPerBand. The band-bucket join shuffles on
    * (band index, band hash) — load-balanced, never all-pairs. */
  def minHashNearDups(df: DataFrame, textCol: String, idCol: String,
                      threshold: Double = 0.7, bands: Int = 16,
                      rowsPerBand: Int = 4, shingleK: Int = 5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sig = df.select(
      col(idCol).as("id"),
      col(textCol).as("text"),
      minHashSignature(col(textCol), numHashes, shingleK).as("sig"))

    val banded = sig.select(
      col("id"), col("text"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))), b).as("bucket"))))
        .as("bb"))
      .select(col("id"), col("text"), col("bb.band"), col("bb.bucket"))

    val a = banded.alias("a")
    val b = banded.alias("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
              col("a.text").as("text_a"), col("b.text").as("text_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard", shingleJaccard(col("text_a"), col("text_b"), shingleK))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact Jaccard over char-shingle sets (the verification measure). */
  def shingleJaccard(a: Column, b: Column, k: Int = 5): Column = {
    val sa = TextOps.charShingles(a, k)
    val sb = TextOps.charShingles(b, k)
    val inter = size(array_intersect(sa, sb)).cast(DoubleType)
    val uni = size(array_union(sa, sb)).cast(DoubleType)
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  /** Word n-gram Jaccard similarity (token-level near-dup measure). */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column = {
    val sa = array_distinct(TextOps.wordNgrams(a, n))
    val sb = array_distinct(TextOps.wordNgrams(b, n))
    val inter = size(array_intersect(sa, sb)).cast(DoubleType)
    val uni = size(array_union(sa, sb)).cast(DoubleType)
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  /** SimHash: 64-bit locality-sensitive signature — per-token hashes vote
    * ±1 on each bit; sign of the vote sets the bit.
    *
    * One pass over the tokens (64-long vote vector as the aggregation
    * state, bit-packing in the finish lambda) — the per-bit formulation
    * would rescan the token array 64 times. Map-side only. */
  def simHash(textCol: Column): Column = {
    val toks = array_distinct(TextOps.tokens(lower(textCol)))
    aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(
          acc,
          transform(sequence(lit(0), lit(63)),
            b => when(call_function("shiftright", h, b.cast(IntegerType)).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)),
          (a, v) => a + v)
      },
      votes => aggregate(
        zip_with(votes, sequence(lit(0), lit(63)),
          (v, b) => when(v > 0, call_function("shiftleft", lit(1L), b.cast(IntegerType))).otherwise(0L)),
        lit(0L), (a, x) => a + x))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates: docs whose signatures agree on one of the
    * four 16-bit sub-blocks (guaranteeing recall for distance ≤ 3 by the
    * pigeonhole principle), verified by full Hamming distance ≤ maxDist. */
  def simHashNearDups(df: DataFrame, textCol: String, idCol: String,
                      maxDist: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sig"))
    val blocked = sigs.select(col("id"), col("sig"),
      explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("blk"),
          call_function("shiftright", col("sig"), (b * 16).cast(IntegerType)).bitwiseAND(0xFFFFL).as("key"))))
        .as("bb"))
      .select(col("id"), col("sig"), col("bb.blk"), col("bb.key"))
    val a = blocked.alias("a"); val b = blocked.alias("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingDistance(col("a.sig"), col("b.sig")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxDist)
  }
}
