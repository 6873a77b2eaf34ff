package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Positional postings + exact phrase search. */
class PhraseSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "cat sat cat sat cat"),          // overlapping repeats
    (3L, "the cat  SAT on nothing"),      // case + double space
    (4L, "sat the cat"),                  // words present, order wrong
    (5L, ""),                             // empty doc
    (6L, "cat")                           // phrase longer than doc
  ).toDF("doc_id", "text")

  private def postings = TextOps.positionalPostings(docs, "text", "doc_id")

  test("positionalPostings: 0-based positions, lowercased, empty docs " +
      "contribute nothing") {
    val p = postings.as[(Long, Int, String)].collect().toSet
    assert(p.contains((1L, 0, "the")) && p.contains((1L, 5, "mat")))
    assert(p.contains((3L, 2, "sat")), "case-folded and double-space safe")
    assert(!p.exists(_._1 == 5L), "empty doc has no postings")
    assert(p.count(_._1 == 2L) === 5)
  }

  test("phraseMatches: exact adjacency, overlap counting, order " +
      "sensitivity, case-insensitive query") {
    val m = TextOps.phraseMatches(postings, Seq("cat", "SAT"))
      .as[(Long, Long)].collect().toMap
    // doc 2 has "cat sat" at positions 0 and 2 — two occurrences
    assert(m === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    // order + adjacency: "sat cat" appears only inside doc 2's repeats;
    // doc 4's "sat the cat" has both words but never adjacent
    val rev = TextOps.phraseMatches(postings, Seq("sat", "cat"))
      .as[(Long, Long)].collect().toMap
    assert(rev === Map(2L -> 2L))
  }

  test("phraseMatches: trigram alignment and repeated-term phrases") {
    val tri = TextOps.phraseMatches(postings, Seq("the", "cat", "sat"))
      .as[(Long, Long)].collect().toMap
    assert(tri === Map(1L -> 1L, 3L -> 1L))
    val rep = TextOps.phraseMatches(postings, Seq("cat", "sat", "cat"))
      .as[(Long, Long)].collect().toMap
    assert(rep === Map(2L -> 2L), "repeated query term aligns per slot")
  }

  test("phraseSearchTopK: rank by hits desc then doc_id, k bounds") {
    val top = TextOps.phraseSearchTopK(postings, Seq("cat", "sat"), k = 2)
      .as[(Long, Long, Int)].collect().toList
    assert(top === List((2L, 2L, 1), (1L, 1L, 2)))
    val all = TextOps.phraseSearchTopK(postings, Seq("cat", "sat"), k = 10)
      .as[(Long, Long, Int)].collect().toList
    assert(all === List((2L, 2L, 1), (1L, 1L, 2), (3L, 1L, 3)))
  }

  test("proximityMatches: ordered window pairs, window sensitivity, " +
      "guards") {
    // doc 2 "cat sat cat sat cat": window 1 → cat@0-sat@1, cat@2-sat@3;
    // window 3 adds cat@0-sat@3
    val w1 = TextOps.proximityMatches(postings, "cat", "sat", window = 1)
      .as[(Long, Long)].collect().toMap
    assert(w1 === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    val w3 = TextOps.proximityMatches(postings, "cat", "SAT", window = 3)
      .as[(Long, Long)].collect().toMap
    assert(w3(2L) === 3L, "wider window finds the skip pair")
    // ORDER matters: b must follow a
    val rev = TextOps.proximityMatches(postings, "sat", "cat", window = 1)
      .as[(Long, Long)].collect().toMap
    assert(rev === Map(2L -> 2L))
    // doc 4 "sat the cat": within window 2 even though not adjacent
    val gap = TextOps.proximityMatches(postings, "sat", "cat", window = 2)
      .as[(Long, Long)].collect().toMap
    assert(gap(4L) === 1L)
    intercept[IllegalArgumentException] {
      TextOps.proximityMatches(postings, "cat", "sat", window = 0)
    }
    intercept[IllegalArgumentException] {
      TextOps.proximityMatches(postings, "cat sat", "on", window = 2)
    }
  }

  test("phraseMatches: argument guards (empty phrase, multi-word term, k)") {
    intercept[IllegalArgumentException] {
      TextOps.phraseMatches(postings, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TextOps.phraseMatches(postings, Seq("cat sat"))
    }
    intercept[IllegalArgumentException] {
      TextOps.phraseSearchTopK(postings, Seq("cat"), k = 0)
    }
  }

  test("single-term phrase ≡ term frequency") {
    val m = TextOps.phraseMatches(postings, Seq("cat"))
      .as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 1L, 2L -> 3L, 3L -> 1L, 4L -> 1L, 6L -> 1L))
  }

  test("PhraseSearchService + POST /phrase: stored build, golden probe, " +
      "compaction keeps pruning, strict request shapes") {
    import graft.serve.{PhraseSearchService, HttpQueryServer, QueryService}
    val root = java.nio.file.Files.createTempDirectory("phrase_srv_").toString
    PhraseSearchService.buildIndex(docs, "text", "doc_id", root)
    val svc = PhraseSearchService.overParquetDir(spark, root, maxK = 10)
    assert(svc.topK(Seq("cat", "sat"), 2) ===
      Seq((2L, 2L, 1), (1L, 1L, 2)))
    // REGRESSION: bucket pruning must hash the NORMALIZED term — the
    // stored postings are lowercase, so a mixed-case or padded phrase
    // previously pruned to the RAW terms' buckets and silently
    // returned empty/partial results
    assert(svc.topK(Seq("CAT", " Sat "), 2) ===
      Seq((2L, 2L, 1), (1L, 1L, 2)))
    intercept[IllegalArgumentException] { svc.topK(Seq("cat"), 0) }
    intercept[IllegalArgumentException] {
      svc.topK(Seq.fill(9)("cat"), 2) // maxTerms = 8
    }
    // compaction keeps serving identical (services RE-OPEN after
    // maintenance — the family contract; the old handle's file listing
    // is stale by design)
    PhraseSearchService.compactIndex(spark, root)
    val svc2 = PhraseSearchService.overParquetDir(spark, root, maxK = 10)
    assert(svc2.topK(Seq("cat", "sat"), 2) === Seq((2L, 2L, 1), (1L, 1L, 2)))

    val qsvc = QueryService.overParquetDir(spark, "/root/testdata/sf0.001",
      Seq("nation"), Map("nation" -> Seq("n_nationkey")))
    val srv = new HttpQueryServer(qsvc, 1000, phrase = Some(svc2))
    val port = srv.start()
    def post(body: String): java.net.http.HttpResponse[String] = {
      val client = java.net.http.HttpClient.newHttpClient()
      client.send(java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(s"http://127.0.0.1:$port/phrase"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build(), java.net.http.HttpResponse.BodyHandlers.ofString())
    }
    try {
      val ok = post("""{"phrase": "cat sat", "k": 2}""")
      assert(ok.statusCode() === 200, ok.body())
      assert(ok.body().contains(""""id":2,"n_hits":2,"rank":1"""), ok.body())
      // mixed-case phrase through the HTTP path — same pruned result
      val mixed = post("""{"phrase": "Cat SAT", "k": 2}""")
      assert(mixed.statusCode() === 200, mixed.body())
      assert(mixed.body().contains(""""id":2,"n_hits":2,"rank":1"""),
        mixed.body())
      // k mentioned but malformed → 400, never silently defaulted
      assert(post("""{"phrase": "cat sat", "k": 2.5}""").statusCode() === 400)
      // missing / empty phrase → 400
      assert(post("""{"k": 2}""").statusCode() === 400)
      assert(post("""{"phrase": "   ", "k": 2}""").statusCode() === 400)
      // over the term cap → 400 via the service guard
      assert(post(s"""{"phrase": "${Seq.fill(9)("cat").mkString(" ")}"}""")
        .statusCode() === 400)
    } finally srv.stop()
  }

  test("stored bucket-partitioned postings probe ≡ in-memory (pruned scan)") {
    val out = java.nio.file.Files.createTempDirectory("phrase_idx_").toString
    val withBucket = postings
      .withColumn("bucket", TextOps.bm25Bucket(col("term")))
    graft.io.Sinks.onePerPartitionValue(withBucket, Seq("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(out)
    val phrase = Seq("cat", "sat")
    val stored = spark.read.parquet(out)
      .filter(phrase.map(tm => col("bucket") === TextOps.bm25Bucket(lit(tm)))
        .reduce(_ || _))
      .drop("bucket")
    val viaStore = TextOps.phraseMatches(stored, phrase)
      .as[(Long, Long)].collect().toMap
    assert(viaStore === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    // the bucket equality is a PARTITION filter on the probe's scan —
    // only the phrase terms' buckets are read (the 100 TB access pattern)
    import org.apache.spark.sql.execution.FileSourceScanExec
    val probe = TextOps.phraseMatches(stored, phrase)
    probe.collect()
    val scans = allPlanNodes(probe.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters
        .exists(_.references.exists(_.name == "bucket"))),
      s"phrase probe lost bucket pruning: ${scans.map(_.partitionFilters)}")
  }
}
