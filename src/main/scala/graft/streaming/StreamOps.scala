package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.dedup.Dedup

/** Streaming counterparts of the batch dedup family. */
object StreamOps {

  /** Streaming exact dedup: drop rows whose `keys` were already seen within
    * the watermark horizon. State is evicted once the event-time watermark
    * passes, so state size is bounded by the horizon — the only
    * mechanically safe way to run exact dedup over an unbounded stream. */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
                           tsCol: String = "ts",
                           watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Streaming MinHash near-dup suppression: drop a document whose MinHash
    * signature key was already seen within the watermark horizon.
    *
    * Shape: the signature is a pure per-row expression
    * (`Dedup.minHashSigKey` — map-only, value-identical to the batch
    * aggregate path), so the whole pipeline has exactly ONE stateful
    * operator, the watermark-bounded dropDuplicates. State holds one
    * fixed-width 64-bit key per distinct signature in the horizon — never
    * the text — so state size is bounded by (docs in horizon) × ~tens of
    * bytes regardless of document length.
    *
    * Semantics: signature-IDENTICAL suppression. Exact duplicates always
    * collapse (same text ⇒ same signature, so the kept set is a subset of
    * batch [[graft.dedup.Dedup.exactDedup]]'s); near-identical docs
    * collapse only when their shingle sets coincide. Banded
    * any-bucket-match recall (the batch `minHashNearDups` contract) needs
    * cross-row candidate JOINS, which an unbounded stream can't do with
    * bounded state — run the batch operator over micro-batch compactions
    * when that recall is required. */
  def nearDupSuppressWithinWatermark(docs: DataFrame, textCol: String,
                                     tsCol: String = "ts",
                                     watermark: String = "1 hour",
                                     numHashes: Int = 64,
                                     shingleK: Int = 5): DataFrame =
    docs.withColumn("__sig_key",
        Dedup.minHashSigKey(col(textCol), numHashes, shingleK))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__sig_key")
      .drop("__sig_key")
}
