package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((1L, "hello payload"), (2L, "x"), (3L, null))
    .toDF("id", "txt")

  test("asPayload + withByteMeta: binary column with length and sha-256") {
    val df = Multimodal.withByteMeta(Multimodal.asPayload(docs, "txt"))
    assert(df.schema("payload").dataType.typeName === "binary")
    val r = df.orderBy("id").select("n_bytes", "sha").collect()
    assert(r(0).getLong(0) === 13L)
    assert(r(0).getString(1) ===
      java.security.MessageDigest.getInstance("SHA-256")
        .digest("hello payload".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString)
    assert(r(2).isNullAt(0))   // null payload → null meta, no crash
  }

  test("decodeImageStub: per-partition decode attaches the media struct") {
    val out = Multimodal.decodeImageStub(Multimodal.asPayload(docs, "txt"))
    assert(out.schema("media").dataType === Multimodal.mediaMetaSchema)
    val rows = out.orderBy("id").select("media.format", "media.n_bytes").collect()
    assert(rows(0).getString(0) === "fake/img" && rows(0).getLong(1) === 13L)
    assert(rows(2).isNullAt(0)) // null payload → null media
    // determinism: same payload → same fake dimensions on re-run
    val again = Multimodal.decodeImageStub(Multimodal.asPayload(docs, "txt"))
      .orderBy("id").select("media.width", "media.height").collect()
    val first = out.orderBy("id").select("media.width", "media.height").collect()
    assert(again.map(_.toSeq).toSeq === first.map(_.toSeq).toSeq)
  }

  test("sampleFramesStub: 1 payload → n frame rows with distinct frame hashes") {
    val out = Multimodal.sampleFramesStub(
      Multimodal.asPayload(docs.filter($"txt".isNotNull), "txt"), 3)
    assert(out.count() === 6)
    assert(out.select("frame_no").distinct().count() === 3)
    val hashes = out.filter($"id" === 1).select("frame_sha").as[String].collect()
    assert(hashes.distinct.length === 3) // frame hash varies per frame_no
  }

  test("resizeStub: records target box without touching payload schema") {
    val out = Multimodal.resizeStub(
      Multimodal.asPayload(docs.filter($"txt".isNotNull), "txt"), 224, 224)
    val r = out.select("resized.width", "resized.height").head()
    assert((r.getInt(0), r.getInt(1)) === ((224, 224)))
  }
}
