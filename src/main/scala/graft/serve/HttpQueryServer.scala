package graft.serve

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Minimal HTTP front-end over [[QueryService]] — the engine analog of the
  * reference's Flask endpoint (`POST /get_data {table, limit}`,
  * finalprojectapi.py:17-42): same route, same two-field request, JSON
  * response instead of the reference's stringified-tuples text.
  *
  * Hardening the reference lacks, by construction:
  *   - the table name never reaches SQL — it is a registry (whitelist)
  *     lookup in [[QueryService.getData]]; the reference concatenates it
  *     into a query string (finalprojectapi.py:24);
  *   - the limit is parsed as digits and CAPPED at `maxLimit`, so a
  *     request can never pull an unbounded result set onto one JVM;
  *   - an unknown table or malformed body is a 400 with a JSON error, not
  *     a stack trace.
  *
  * Serving shape: the bounded `limit` makes the per-request `collect()`
  * driver-safe (rows ≤ maxLimit by construction); the DataFrame plan
  * still pushes the limit into the scan. Zero dependencies — the JDK's
  * built-in HTTP server, so the library stays pure Spark. Field
  * extraction is two anchored regexes over the (tiny) request body — the
  * contract is exactly two scalar fields, not arbitrary JSON. */
final class HttpQueryServer(service: QueryService, maxLimit: Int = 1000,
                            ann: Option[AnnBackend] = None,
                            search: Option[SearchService] = None,
                            annBackends: Map[String, AnnBackend] = Map.empty,
                            nearDup: Option[NearDupLookupService] = None,
                            phrase: Option[PhraseSearchService] = None) {
  require(maxLimit > 0, s"maxLimit must be > 0, got $maxLimit")
  annBackends.keys.foreach(n => require(n.matches("[A-Za-z0-9_-]+"),
    s"ann backend name must be [A-Za-z0-9_-]+, got '$n'"))

  @volatile private var server: HttpServer = _

  /** Bind (port 0 → ephemeral) and serve; returns the bound port. */
  def start(port: Int = 0): Int = synchronized {
    require(server == null, "server already started")
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/get_data", handler)
    ann.foreach(a => server.createContext("/ann", annHandler(a)))
    // named-backend registry: flat IVF, residual IVF-PQ and RP indexes
    // serve side by side as `/ann/{name}` (the JDK server dispatches to
    // the LONGEST matching context path, so these coexist with a default
    // backend at bare `/ann`)
    annBackends.foreach { case (name, b) =>
      server.createContext(s"/ann/$name", annHandler(b)) }
    search.foreach(s => server.createContext("/search", searchHandler(s)))
    // hybrid retrieval needs BOTH backends — registered only when the
    // default vector backend and the keyword service are present
    for (a <- ann; s <- search)
      server.createContext("/hybrid", hybridHandler(a, s))
    nearDup.foreach(n => server.createContext("/neardup", nearDupHandler(n)))
    phrase.foreach(p => server.createContext("/phrase", phraseHandler(p)))
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
  }

  // table restricted to identifier chars (defense in depth in FRONT of the
  // registry whitelist); limit accepted bare or quoted (the reference's
  // client sends it as a string) but digits-only either way
  private val TableRe = """"table"\s*:\s*"([A-Za-z0-9_]+)"""".r
  // delimiter-anchored like KRe/ThresholdRe below: "limit": 5.7 or a
  // 10-digit value must 400, never silently coerce via a prefix match
  private val LimitRe = """"limit"\s*:\s*"?(\d{1,9})"?(?=\s*[,}\]])""".r

  private def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json; charset=utf-8")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  // ANN request fields: a bounded numeric array and a small integer k.
  // Like the table route, nothing here ever reaches SQL text — the vector
  // enters the plan as a typed literal.
  private val VecRe = """"vec"\s*:\s*\[([0-9eE+\-.,\s]{0,65536})\]""".r
  // The trailing lookahead anchors the number to a JSON delimiter:
  // without it, out-of-range or junk values silently COERCE instead of
  // 400ing through the mentions-the-key-but-malformed path ("k": 5.7
  // would parse as 5; "threshold": 1.5 would match the '1' prefix and
  // parse as 1.0 — a silently wrong-parameter 200).
  private val KRe = """"k"\s*:\s*"?(\d{1,4})"?(?=\s*[,}\]])""".r
  private val NumRe = """-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?""".r
  // optional equality filter: {"filter": {"col": "lang", "value": "en"}}.
  // The column name is identifier-restricted IN FRONT of the backend's
  // whitelist (defense in depth, the table route's pattern); the value is
  // a bounded token that enters the plan only as a typed literal.
  private val FilterRe =
    (""""filter"\s*:\s*\{\s*"col"\s*:\s*"([A-Za-z0-9_]{1,64})"\s*,\s*""" +
      """"value"\s*:\s*"?([A-Za-z0-9_ .\-]{1,256}?)"?\s*\}""").r

  /** `POST /ann {"vec": [f, ...], "k": n}` → bounded top-k over the stored
    * IVF index. k is CAPPED at the service's maxK (mirror of the table
    * route's limit cap); a wrong-dimension or malformed vector is a 400. */
  private def annHandler(svc: AnnBackend): HttpHandler = (ex: HttpExchange) =>
    try {
      // the JDK server dispatches by LONGEST STRING PREFIX, so without an
      // exact-path check /ann/<unknown> falls through to the bare /ann
      // default (HTTP 200 from the WRONG index) and /ann/foo would also
      // capture /ann/foobar — unknown or extended names must be a 404
      if (ex.getRequestURI.getPath != ex.getHttpContext.getPath)
        respond(ex, 404, """{"error":"unknown ann backend"}""")
      else if (ex.getRequestMethod != "POST")
        respond(ex, 405, """{"error":"POST only"}""")
      else {
        val body =
          new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        (VecRe.findFirstMatchIn(body), KRe.findFirstMatchIn(body)) match {
          case (Some(v), Some(km)) =>
            val elems = v.group(1).split(",").map(_.trim).filter(_.nonEmpty)
            if (!elems.forall(NumRe.matches(_)))
              respond(ex, 400, """{"error":"vec must be a JSON array of numbers"}""")
            else {
              try {
                val vec = elems.map(_.toFloat).toSeq
                // clamp ONCE so the echoed "k" always matches the k served
                val k = math.min(math.max(km.group(1).toInt, 1), svc.maxK)
                val filter = FilterRe.findFirstMatchIn(body)
                  .map(m => (m.group(1), m.group(2)))
                // a body that MENTIONS "filter" but fails the strict shape
                // (reversed keys, out-of-alphabet value, oversized token)
                // must be a 400, never a silently UNFILTERED 200 — an
                // ignored predicate returning wrong results with no error
                // is exactly the failure mode the backend whitelist exists
                // to reject
                // key-position check ("filter" followed by a colon), not
                // a raw substring: a VALUE that merely equals "filter"
                // (e.g. {"note":"filter"}) must not trip the guard
                if (filter.isEmpty &&
                    """"filter"\s*:""".r.findFirstIn(body).isDefined)
                  respond(ex, 400,
                    """{"error":"filter must be {\"col\": \"<identifier>\", \"value\": \"<token>\"}"}""")
                else {
                val hits = svc.topK(vec, k, filter)
                  .map { case (id, score, rank) =>
                    s"""{"id":$id,"score":$score,"rank":$rank}""" }
                  .mkString("[", ",", "]")
                respond(ex, 200, s"""{"k":$k,"results":$hits}""")
                }
              } catch {
                case e: IllegalArgumentException =>
                  respond(ex, 400, s"""{"error":"${jsonEscape(e.getMessage)}"}""")
              }
            }
          case _ =>
            respond(ex, 400,
              """{"error":"body must carry a numeric array 'vec' and an integer 'k'"}""")
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        try respond(ex, 500, s"""{"error":"${jsonEscape(String.valueOf(e.getMessage))}"}""")
        catch { case scala.util.control.NonFatal(_) => () }
    } finally ex.close()

  // Search request fields: a bounded array of quoted terms + integer k.
  // Terms are extracted as quoted strings (no escapes — search terms are
  // plain tokens) and reach the plan only as typed literals.
  private val TermsRe = """"terms"\s*:\s*\[([^\]]{0,4096})\]""".r
  private val TermRe = """"([^"\\]{1,64})"""".r

  /** `POST /search {"terms": ["t", ...], "k": n}` → BM25 top-k over the
    * stored inverted index. k capped at the service's maxK; a term list
    * over its maxTerms is a 400 (never silently truncated — the scores
    * for a reduced query are NOT the scores for the query the client
    * sent); an empty term list is a 400. */
  private def searchHandler(svc: SearchService): HttpHandler = (ex: HttpExchange) =>
    try {
      if (ex.getRequestMethod != "POST")
        respond(ex, 405, """{"error":"POST only"}""")
      else {
        val body =
          new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        (TermsRe.findFirstMatchIn(body), KRe.findFirstMatchIn(body)) match {
          case (Some(tm), Some(km)) =>
            val terms = TermRe.findAllMatchIn(tm.group(1)).map(_.group(1)).toSeq
            if (terms.isEmpty)
              respond(ex, 400, """{"error":"terms must be a non-empty array of strings"}""")
            else {
              try {
                // clamp ONCE so the echoed "k" always matches the k served
                val k = math.min(math.max(km.group(1).toInt, 1), svc.maxK)
                // terms pass through UNMODIFIED: the service's maxTerms
                // require surfaces here as a 400, matching the explicit
                // clamp-and-echo contract (no silent query reduction)
                val hits = svc.topK(terms, k)
                  .map { case (id, score, rank) =>
                    s"""{"id":$id,"score":$score,"rank":$rank}""" }
                  .mkString("[", ",", "]")
                respond(ex, 200, s"""{"k":$k,"results":$hits}""")
              } catch {
                case e: IllegalArgumentException =>
                  respond(ex, 400, s"""{"error":"${jsonEscape(e.getMessage)}"}""")
              }
            }
          case _ =>
            respond(ex, 400,
              """{"error":"body must carry a string array 'terms' and an integer 'k'"}""")
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        try respond(ex, 500, s"""{"error":"${jsonEscape(String.valueOf(e.getMessage))}"}""")
        catch { case scala.util.control.NonFatal(_) => () }
    } finally ex.close()

  /** `POST /hybrid {"vec": [f, ...], "terms": ["t", ...], "k": n}` →
    * reciprocal-rank fusion of the vector backend's and the keyword
    * service's top-k ([[HybridSearch.fuseRanked]] — pure driver-side
    * arithmetic over the two collected k-row lists). k is clamped to
    * the SMALLER of the two backends' caps so both lists exist at the
    * fused depth; the same strict field shapes as the /ann and /search
    * routes (mentioned-but-malformed is a 400, never a silent
    * coercion). */
  private def hybridHandler(a: AnnBackend, svc: SearchService): HttpHandler =
    (ex: HttpExchange) =>
    try {
      if (ex.getRequestMethod != "POST")
        respond(ex, 405, """{"error":"POST only"}""")
      else {
        val body =
          new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        (VecRe.findFirstMatchIn(body), TermsRe.findFirstMatchIn(body),
            KRe.findFirstMatchIn(body)) match {
          case (Some(vm), Some(tm), Some(km)) =>
            val elems = vm.group(1).split(",").map(_.trim).filter(_.nonEmpty)
            val terms = TermRe.findAllMatchIn(tm.group(1)).map(_.group(1)).toSeq
            if (!elems.forall(NumRe.matches(_)))
              respond(ex, 400, """{"error":"vec must be a JSON array of numbers"}""")
            else if (terms.isEmpty)
              respond(ex, 400,
                """{"error":"terms must be a non-empty array of strings"}""")
            else if (""""filter"\s*:""".r.findFirstIn(body).isDefined)
              // the keyword side cannot apply an attribute predicate, so
              // a filtered fusion would surface keyword-only candidates
              // that violate it — a silently WRONG 200; reject instead
              // (the mentioned-knob-never-silently-dropped contract)
              respond(ex, 400,
                """{"error":"filter is not supported on /hybrid; use /ann for filtered vector search"}""")
            else {
              try {
                val vec = elems.map(_.toFloat).toSeq
                val k = math.min(math.max(km.group(1).toInt, 1),
                  math.min(a.maxK, svc.maxK))
                // the two backend probes are independent Spark jobs —
                // run them concurrently so the route pays max, not sum
                val vaFut = java.util.concurrent.CompletableFuture
                  .supplyAsync(() => a.topK(vec, k).map(t => (t._1, t._3)))
                val kb = svc.topK(terms, k).map(t => (t._1, t._3))
                val va = vaFut.join()
                val hits = HybridSearch.fuseRanked(va, kb, k)
                  .map { case (id, s, r) =>
                    s"""{"id":$id,"rrf":$s,"rank":$r}""" }
                  .mkString("[", ",", "]")
                respond(ex, 200, s"""{"k":$k,"results":$hits}""")
              } catch {
                case e: IllegalArgumentException =>
                  respond(ex, 400, s"""{"error":"${jsonEscape(e.getMessage)}"}""")
                case e: java.util.concurrent.CompletionException
                    if e.getCause.isInstanceOf[IllegalArgumentException] =>
                  respond(ex, 400,
                    s"""{"error":"${jsonEscape(e.getCause.getMessage)}"}""")
              }
            }
          case _ =>
            respond(ex, 400,
              """{"error":"body must carry a numeric array 'vec', a string array 'terms' and an integer 'k'"}""")
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        try respond(ex, 500, s"""{"error":"${jsonEscape(String.valueOf(e.getMessage))}"}""")
        catch { case scala.util.control.NonFatal(_) => () }
    } finally ex.close()

  // Near-dup lookup request fields: one bounded plain-text document (no
  // escape processing — the probe contract is raw text tokens, matching
  // the search route's posture), an optional threshold in (0, 1], an
  // optional integer k. Nothing reaches SQL text; the document enters
  // the plan as a typed literal row. The regex bound is a parse-layer
  // sanity cap only — the SERVICE's configurable maxTextLen is the real
  // limit, enforced in lookup() with an accurate error (a tighter regex
  // bound here would silently disable a larger configured knob and
  // misreport over-length text as a missing field).
  private val TextRe = """"text"\s*:\s*"([^"\\]{1,1048576})"""".r
  private val ThresholdRe =
    """"threshold"\s*:\s*(1(?:\.0{1,6})?|0?\.\d{1,6})(?=\s*[,}\]])""".r

  // a phrase is 1+ space-separated word tokens — quotes/backslashes and
  // empty phrases fail the shape (strict-field contract of the family);
  // length-bounded so a pathological body can't build a huge join chain
  private val PhraseRe = """"phrase"\s*:\s*"([^"\\]{1,512})"""".r

  /** `POST /phrase {"phrase": "exact word sequence", "k": 5}` → the k
    * documents with the most occurrences of the CONSECUTIVE phrase over
    * the stored positional index ([[PhraseSearchService.topK]] — bucket-
    * pruned scan, integer counts). k defaults to 10 (capped at the
    * service's maxK); a body that mentions k but fails its strict shape
    * is a 400, and a phrase that is empty after tokenization or longer
    * than the service's term cap surfaces as a 400 via the service's
    * argument errors. */
  private def phraseHandler(svc: PhraseSearchService): HttpHandler =
    (ex: HttpExchange) =>
    try {
      if (ex.getRequestMethod != "POST")
        respond(ex, 405, """{"error":"POST only"}""")
      else {
        val body =
          new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        PhraseRe.findFirstMatchIn(body) match {
          case Some(pm) =>
            val km = KRe.findFirstMatchIn(body).map(_.group(1).toInt)
            if (km.isEmpty && """"k"\s*:""".r.findFirstIn(body).isDefined)
              respond(ex, 400, """{"error":"k must be a positive integer"}""")
            else {
              try {
                val k = math.min(math.max(km.getOrElse(10), 1), svc.maxK)
                val terms = pm.group(1).trim.split("\\s+").toSeq
                  .filter(_.nonEmpty)
                require(terms.nonEmpty, "phrase must carry at least one word")
                val hits = svc.topK(terms, k)
                  .map { case (id, n, rank) =>
                    s"""{"id":$id,"n_hits":$n,"rank":$rank}""" }
                  .mkString("[", ",", "]")
                respond(ex, 200, s"""{"k":$k,"results":$hits}""")
              } catch {
                case e: IllegalArgumentException =>
                  respond(ex, 400, s"""{"error":"${jsonEscape(e.getMessage)}"}""")
              }
            }
          case _ =>
            respond(ex, 400,
              """{"error":"body must carry a plain-text 'phrase' field"}""")
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        try respond(ex, 500, s"""{"error":"${jsonEscape(String.valueOf(e.getMessage))}"}""")
        catch { case scala.util.control.NonFatal(_) => () }
    } finally ex.close()

  /** `POST /neardup {"text": "...", "threshold": 0.8, "k": 5}` →
    * indexed near-duplicates of the document over the stored MinHash
    * layout ([[NearDupLookupService.lookup]]). threshold defaults to
    * 0.7, k to 10 (capped at the service's maxK); a body that MENTIONS
    * either knob but fails its strict shape is a 400, never a silently
    * defaulted 200 (the filter-guard contract of the /ann route). */
  private def nearDupHandler(svc: NearDupLookupService): HttpHandler =
    (ex: HttpExchange) =>
    try {
      if (ex.getRequestMethod != "POST")
        respond(ex, 405, """{"error":"POST only"}""")
      else {
        val body =
          new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        TextRe.findFirstMatchIn(body) match {
          case Some(tm) =>
            val th = ThresholdRe.findFirstMatchIn(body).map(_.group(1).toDouble)
            val km = KRe.findFirstMatchIn(body).map(_.group(1).toInt)
            if (th.isEmpty && """"threshold"\s*:""".r.findFirstIn(body).isDefined)
              respond(ex, 400,
                """{"error":"threshold must be a number in (0, 1]"}""")
            else if (km.isEmpty && """"k"\s*:""".r.findFirstIn(body).isDefined)
              respond(ex, 400, """{"error":"k must be a positive integer"}""")
            else {
              try {
                val k = math.min(math.max(km.getOrElse(10), 1), svc.maxK)
                val hits = svc.lookup(tm.group(1), th.getOrElse(0.7), k)
                  .map { case (id, est, rank) =>
                    s"""{"id":$id,"est_jaccard":$est,"rank":$rank}""" }
                  .mkString("[", ",", "]")
                respond(ex, 200, s"""{"k":$k,"results":$hits}""")
              } catch {
                case e: IllegalArgumentException =>
                  respond(ex, 400, s"""{"error":"${jsonEscape(e.getMessage)}"}""")
              }
            }
          case _ =>
            respond(ex, 400,
              """{"error":"body must carry a plain-text 'text' field"}""")
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        try respond(ex, 500, s"""{"error":"${jsonEscape(String.valueOf(e.getMessage))}"}""")
        catch { case scala.util.control.NonFatal(_) => () }
    } finally ex.close()

  private def handler: HttpHandler = (ex: HttpExchange) =>
    try {
      if (ex.getRequestMethod != "POST")
        respond(ex, 405, """{"error":"POST only"}""")
      else {
        val body =
          new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        (TableRe.findFirstMatchIn(body), LimitRe.findFirstMatchIn(body)) match {
          case (Some(t), Some(l)) =>
            val table = t.group(1)
            val limit = math.min(l.group(1).toLong, maxLimit.toLong).toInt
            try {
              val df = service.getData(table, limit)
              val cols = df.columns
                .map(c => "\"" + jsonEscape(c) + "\"").mkString("[", ",", "]")
              // toJSON: per-row JSON objects rendered by Spark (typed,
              // null-safe); bounded by the capped limit, so collecting to
              // the serving JVM is safe by construction.
              val rows = df.toJSON.collect().mkString("[", ",", "]")
              respond(ex, 200, s"""{"table":"${jsonEscape(table)}",""" +
                s""""limit_applied":$limit,"columns":$cols,"rows":$rows}""")
            } catch {
              case e: IllegalArgumentException =>
                respond(ex, 400, s"""{"error":"${jsonEscape(e.getMessage)}"}""")
            }
          case _ =>
            respond(ex, 400,
              """{"error":"body must carry a string 'table' and an integer 'limit'"}""")
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        try respond(ex, 500, s"""{"error":"${jsonEscape(String.valueOf(e.getMessage))}"}""")
        catch { case scala.util.control.NonFatal(_) => () }
    } finally ex.close()
}
