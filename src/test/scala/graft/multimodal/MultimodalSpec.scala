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

  test("synthesizePng + decodeImage: real PNG round-trip recovers planted dims") {
    val ids = Seq(0L, 1L, 47L, 48L, 95L).toDF("id")
    val out = Multimodal.decodeImage(Multimodal.synthesizePng(ids, "id"))
    assert(out.schema("media").dataType === Multimodal.mediaMetaSchema)
    val rows = out.orderBy("id")
      .select("id", "media.format", "media.width", "media.height", "media.n_bytes")
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) === "png")
      assert(r.getInt(2) === (id % 48).toInt + 8, s"width of id=$id")
      assert(r.getInt(3) === (id % 32).toInt + 8, s"height of id=$id")
      assert(r.getLong(4) > 50L) // a real PNG, not a magic-number shell
    }
  }

  test("decodeImage: null and undecodable payloads yield null media, no failure") {
    val out = Multimodal.decodeImage(Multimodal.asPayload(docs, "txt"))
    val rows = out.orderBy("id").select("media").collect()
    assert(rows.forall(_.isNullAt(0))) // text bytes aren't an image; null not crash
  }

  test("synthesizeWav + decodeAudio: real WAV round-trip recovers planted params") {
    val ids = Seq(0L, 3L, 7L, 99L).toDF("id")
    val out = Multimodal.decodeAudio(Multimodal.synthesizeWav(ids, "id"))
      .orderBy("id")
      .select("id", "audio.format", "audio.sample_rate", "audio.channels", "audio.n_frames")
      .collect()
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) === "wave")
      assert(r.getInt(2) === 8000 + (id % 8).toInt * 1000)
      assert(r.getInt(3) === 1)
      assert(r.getLong(4) === 800L + id % 100)
    }
  }

  test("decodeAudio: non-audio bytes yield null audio, no failure") {
    val out = Multimodal.decodeAudio(Multimodal.asPayload(docs, "txt"))
    assert(out.orderBy("id").select("audio").collect().forall(_.isNullAt(0)))
  }

  test("resizeImage: real bilinear resize re-encodes to the target box") {
    val ids = Seq(1L, 50L).toDF("id")
    val resized = Multimodal.resizeImage(
      Multimodal.synthesizePng(ids, "id"), w = 32, h = 24)
    val dims = Multimodal.decodeImage(resized, payloadCol = "resized")
      .select("media.width", "media.height").collect()
    assert(dims.forall(r => r.getInt(0) === 32 && r.getInt(1) === 24))
    // non-image payloads pass through with null resized bytes
    val nulls = Multimodal.resizeImage(Multimodal.asPayload(docs, "txt"), 8, 8)
      .select("resized").collect()
    assert(nulls.forall(_.isNullAt(0)))
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
