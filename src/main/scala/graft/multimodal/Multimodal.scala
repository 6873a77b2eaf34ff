package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata structs.
  *
  * The Spark-side contract (schema, partition behavior, batch-friendly
  * per-partition processing) is real and tested; the actual media decode is
  * STUBBED with a deterministic fake (this environment ships no codec
  * libraries). Swap `decodeImageStub` for a real decoder (e.g. a
  * `mapPartitions` that feeds a JNI codec, or `mapInPandas`+PIL on PySpark
  * clusters) without touching any schema or caller.
  *
  * Scale notes: payload bytes live in ONE binary column so Parquet keeps
  * them in a single large column chunk; metadata extraction is columnar and
  * map-only; `mapPartitions` amortizes decoder init per partition (the same
  * shape a vectorized Pandas-UDF batch has). */
object Multimodal {

  /** Metadata schema attached to every decoded media column. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("sha", StringType)))

  /** Wrap a string column as a binary payload column (test harness for the
    * plumbing; real pipelines read payloads from parquet/object storage). */
  def asPayload(df: DataFrame, srcCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, col(srcCol).cast(BinaryType))

  /** Cheap columnar metadata: byte length + content hash — no decode, pure
    * expressions. */
  def withByteMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("n_bytes", length(col(payloadCol)).cast(LongType))
      .withColumn("sha", sha2(col(payloadCol), 256))

  /** DECODE STUB — deterministic fake image decode: "dimensions" derived
    * from the payload hash. Runs per-partition so a real decoder's
    * initialization cost is amortized exactly like the eventual codec. */
  def decodeImageStub(df: DataFrame, payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("media", mediaMetaSchema))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    val rdd = df.rdd.mapPartitions { it =>
      // real decoder init would go here, once per partition
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val meta = if (bytes == null) null else {
          val h = java.util.Arrays.hashCode(bytes)
          Row("fake/img", math.abs(h % 1920) + 1, math.abs((h / 1920) % 1080) + 1,
            bytes.length.toLong, f"${h}%08x")
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling stub: produce `n` evenly spaced "frame" rows per video
    * payload — exercises the explode fan-out shape (1 row → n rows) a real
    * frame sampler has. */
  def sampleFramesStub(df: DataFrame, n: Int, payloadCol: String = "payload"): DataFrame =
    df.withColumn("frame_no", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_sha",
        sha2(concat(col(payloadCol), col("frame_no").cast(StringType).cast(BinaryType)), 256))

  /** Resize stub: records the requested target box alongside the payload
    * (a real implementation transforms bytes; the schema contract is what
    * downstream relies on). */
  def resizeStub(df: DataFrame, w: Int, h: Int, payloadCol: String = "payload"): DataFrame =
    df.withColumn("resized",
      struct(lit(w).as("width"), lit(h).as("height"),
        sha2(col(payloadCol), 256).as("sha")))
}
