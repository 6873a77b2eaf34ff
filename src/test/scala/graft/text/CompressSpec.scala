package graft.text

import graft.SparkSpec

/** The compression signal's discriminating behavior — the properties the
  * quality filter relies on, pinned without a cross-engine oracle
  * (deflate output length is zlib-build-dependent). */
class CompressSpec extends SparkSpec {
  import spark.implicits._

  test("compressionSignals separates repetitive / prose / random; edge cases") {
    val rnd = new scala.util.Random(7)
    val repetitive = "spam ham " * 400
    val prose = ("the quick brown fox jumps over the lazy dog and then " +
      "considers whether partition pruning applies to its dinner plans ") * 40
    val random = (0 until 3200).map(_ => (rnd.nextInt(94) + 33).toChar).mkString
    val df = Seq((1L, repetitive), (2L, prose), (3L, random),
      (4L, ""), (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Compress.compressionSignals(df, "text", "doc_id")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val (rep, pro, ran) = (out(1L)._4, out(2L)._4, out(3L)._4)
    assert(rep < pro && pro < ran,
      s"expected repetitive < prose < random, got $rep / $pro / $ran")
    assert(rep < 0.05, s"heavy repetition should deflate hard: $rep")
    assert(ran > 0.7, s"printable-random should barely deflate: $ran")
    // empty and null both report 'nothing to compress' = ratio 1.0
    assert(out(4L) === ((4L, 0L, 0L, 1.0)))
    assert(out(5L) === ((5L, 0L, 0L, 1.0)))
    // raw_bytes is the UTF-8 length, not the char count
    assert(out(3L)._2 === random.getBytes("UTF-8").length.toLong)
    // deterministic within a JVM: a second run is bit-identical
    val again = Compress.compressionSignals(df, "text", "doc_id")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(again === out)
    intercept[IllegalArgumentException] {
      Compress.compressionSignals(df, "text", "doc_id", level = 0)
    }
  }
}
