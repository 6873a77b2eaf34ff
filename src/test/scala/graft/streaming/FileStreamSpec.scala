package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming over a real file source: the events parquet consumed through
  * readStream with Trigger.AvailableNow must produce exactly the batch
  * windowed counts — the "same code, both modes" contract. */
class FileStreamSpec extends SparkSpec {

  test("streaming corpus scoring (lang-id + quality gate + per-lang stats) ≡ batch") {
    import graft.text.TextOps
    val src = Paths.get("/root/testdata/sf0.001/documents.parquet")
    val dir = Files.createTempDirectory("graft_stream_docs")
    Files.copy(src, dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)

    // the text family is pure stateless expressions + one aggregate, so the
    // SAME transform runs batch and streaming unchanged
    def clean(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        TextOps.langId(col("text")).as("lang_pred"),
        TextOps.qualityScore(col("text")).as("quality"),
        TextOps.tokenCount(col("text")).as("n_tokens"))
      .filter(col("quality") >= 0.5 && col("lang_pred") =!= "und")
      .groupBy("lang_pred")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("quality")), 6).as("avg_quality"))

    val schema = spark.read.parquet(dir.toString).schema
    val q = clean(spark.readStream.schema(schema).parquet(dir.toString))
      .writeStream.format("memory").queryName("corpus_clean")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val batch = clean(spark.read.parquet(dir.toString))
      .orderBy("lang_pred").collect().map(_.toSeq)
    val stream = spark.table("corpus_clean")
      .orderBy("lang_pred").collect().map(_.toSeq)
    assert(stream.toSeq === batch.toSeq && batch.nonEmpty)
  }

  test("readStream parquet → windowedCounts ≡ batch, via AvailableNow") {
    // restore after: this is the shared JVM-wide session, and leaving the
    // legacy nanos conf on would silently change how LATER suites read
    // nanosecond-timestamp parquet (suite-order-dependent results)
    val nanosWas = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
    val src = Paths.get("/root/testdata/sf0.001/events.parquet")
    val dir = Files.createTempDirectory("graft_stream_events")
    Files.copy(src, dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    // mirror the parquet's actual ts type (nanos-as-long for older
    // generator vintages, plain timestamp for newer ones) so the same
    // spec covers both; normalize to TimestampType after the scan either
    // way, exactly as ExtensionQueries.events does
    val tsType = spark.read.parquet(dir.toString).schema("ts").dataType
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    def convert(df: org.apache.spark.sql.DataFrame) = tsType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }

    val streamed = convert(
      spark.readStream.schema(schema).parquet(dir.toString))
    val q = Sessionize.windowedCounts(streamed, "1 hour")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val batch = Sessionize.windowedCounts(
        convert(spark.read.parquet(dir.toString)), "1 hour")
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq)
    val stream = spark.table("win_out")
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq)
    assert(stream.length === batch.length)
    assert(stream.toSeq === batch.toSeq)
    } finally {
      nanosWas match {
        case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
    }
  }
}
