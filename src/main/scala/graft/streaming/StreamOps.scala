package graft.streaming

import org.apache.spark.sql.DataFrame

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
}
