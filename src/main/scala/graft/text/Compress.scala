package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** zlib compression-ratio quality signal — the classic cheap boilerplate
  * detector public corpus pipelines ship (RedPajama-v2 and Dolma both
  * publish a per-document compression/entropy signal): templated or
  * highly repetitive text deflates far below natural prose, while
  * random junk refuses to deflate at all, so the ratio
  * `deflate_bytes / raw_bytes` separates the three populations with one
  * pass of a byte-level codec over each document.
  *
  * This is the ONE text operator implemented with `mapPartitions`
  * instead of Catalyst expressions (the [[graft.multimodal.Multimodal]]
  * codec-decode argument applies verbatim): Deflater is a native-library
  * codec with internal buffer state, not an expression. The op is still
  * map-only and embarrassingly parallel — one Deflater per partition,
  * `reset()` between documents, no shuffle — so it scales exactly like
  * the expression-based signals.
  *
  * Portability note: deflate OUTPUT LENGTH depends on the zlib build, so
  * this is a rows-only face by the repo's portability law — CompressSpec
  * pins the discriminating behavior (repetitive ≪ prose ≪ random,
  * in-JVM determinism, empty/null handling) instead of a SQL oracle. */
object Compress {

  /** Per-document compression signal: (doc_id, raw_bytes, deflate_bytes,
    * ratio). `ratio` is one IEEE division of exact longs; an empty (or
    * null) document reports ratio 1.0 — "nothing to compress" must not
    * read as "perfectly compressible". */
  def compressionSignals(df: DataFrame, textCol: String, idCol: String,
                         level: Int = 6): DataFrame = {
    require(level >= 1 && level <= 9, s"level must be in [1, 9], got $level")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(textCol).cast(StringType))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(level)
        // release the native zlib buffers when the task ends (success OR
        // failure) instead of waiting for the Cleaner — long-lived
        // executors run many partitions between GCs
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](8192)
        it.map { case (id, t) =>
          val raw =
            if (t == null) Array.emptyByteArray else t.getBytes("UTF-8")
          if (raw.length == 0) (id, 0L, 0L, 1.0) // don't pay 8 header bytes
          else {
            deflater.reset()
            deflater.setInput(raw)
            deflater.finish()
            var out = 0L
            while (!deflater.finished()) out += deflater.deflate(buf)
            (id, raw.length.toLong, out, out.toDouble / raw.length.toDouble)
          }
        }
      }
      .toDF("doc_id", "raw_bytes", "deflate_bytes", "ratio")
  }
}
