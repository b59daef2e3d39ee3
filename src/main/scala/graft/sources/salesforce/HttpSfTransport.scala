package graft.sources.salesforce

import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.reverse.{BulkUpload, UploadResult}

/** HTTP error surfaced by the Salesforce endpoints (4xx/5xx after
  * retries; analogue of `BulkApiError`, `salesforce_bulk.py:34-41`).
  */
final class SfApiError(val statusCode: Int, message: String)
    extends RuntimeException(s"[$statusCode] $message")

/** Parsed `Sforce-Limit-Info` api-usage (`api.py:472-485` Usage). */
final case class ApiUsage(used: Long, total: Long) {
  def fractionUsed: Double = if (total == 0) 0.0 else used.toDouble / total
}

/** Production [[SfTransport]] + [[BulkUpload.UploadTransport]]: the
  * wire protocols the reference speaks, over real HTTP.
  *
  *  - REST SOQL with `query/` vs `queryAll/` endpoint split and
  *    `nextRecordsUrl` pagination (`simple_salesforce/api.py:343-425`);
  *    auth is the `Authorization: Bearer` header (`api.py:180-183`).
  *  - COUNT pushdown as `SELECT COUNT() ... WHERE ...` answered from
  *    `totalSize` (`query.py:53-65`).
  *  - Bulk V1 job lifecycle: XML `jobInfo` create with the
  *    `Sforce-Enable-PKChunking: chunkSize=N;` header, batch post,
  *    close/abort docs, `X-SFDC-Session` auth
  *    (`salesforce_bulk/salesforce_bulk.py:147-208,235-296`).
  *  - Batch polling with retry-on-connection-error and the 600 s/10 s
  *    wait semantics (`download.py:50-80`, `upload_table.py:89-96`,
  *    `salesforce_bulk.py:505-511`).
  *  - Streamed batch results with NUL bytes stripped
  *    (`salesforce_bulk.py:461-496`), decoded by RESPONSE
  *    Content-Type (CSV via [[CsvWire]], JSON via [[JsonWire]] —
  *    `get_query_batch_result_ids`' dispatch, `:440-459`), and
  *    per-record `UploadResult(id, success, created, error)` parsing
  *    for upload batches in all three result formats
  *    (`salesforce_bulk.py:498-546` CSV/JSON/XML branches); job docs
  *    carry the `contentType` keyword (`:252-274`).
  *
  * Partition tokens returned by [[pkChunks]] are `(jobId, batchId)` —
  * the server does the chunk split, so one Spark partition maps to one
  * server-side batch, exactly the reference's unit of download
  * parallelism. Thread-safe: `HttpClient` is shared and immutable
  * state only. Resolved on executors via [[SfTransports]] by name —
  * the instance itself never crosses a task boundary.
  */
final class HttpSfTransport(
    instanceUrl: String,
    sessionId: String,
    apiVersion: String = "52.0",
    pollIntervalMs: Long = 10000, // reference sleep_interval = 10 s
    pollTimeoutMs: Long = 600000, // reference timeout = 600 s
    maxRetries: Int = 3) extends SfTransport with BulkUpload.UploadTransport {

  @transient private lazy val client: HttpClient = HttpClient.newHttpClient()
  @transient private lazy val mapper = new ObjectMapper()

  private def restBase = s"$instanceUrl/services/data/v$apiVersion/"
  private def bulkBase = s"$instanceUrl/services/async/$apiVersion"

  // ---- low-level HTTP -------------------------------------------------

  /** Send with retry on connection errors for IDEMPOTENT requests only
    * — the reference retries polling READS (`download.py:76-80`,
    * `upload_table.py:89-96`), never job/batch POSTs: a connection that
    * drops AFTER the server accepted a POST would re-post on retry and
    * create duplicate bulk jobs/batches (duplicate records written on
    * the reverse-ETL path). Non-idempotent requests fail fast and leave
    * the job inspectable/abortable, exactly like the reference.
    */
  private def send(b: HttpRequest.Builder,
      idempotent: Boolean = true): HttpResponse[Array[Byte]] = {
    var attempt = 0
    while (true) {
      try {
        val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
        if (resp.statusCode() >= 400)
          throw new SfApiError(resp.statusCode(),
            new String(resp.body(), UTF_8).take(500))
        return resp
      } catch {
        case _: java.io.IOException if idempotent && attempt < maxRetries =>
          attempt += 1
          Thread.sleep(math.min(pollIntervalMs, 1000L) * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Latest `Sforce-Limit-Info: api-usage=used/total` seen on a REST
    * response (`api.py:466-500`) — quota observability so an
    * orchestrator can throttle before the org's daily limit trips.
    */
  @volatile var apiUsage: Option[ApiUsage] = None

  private val UsagePattern = """[^-]?api-usage=(\d+)/(\d+).*""".r

  private def restGetJson(url: String): JsonNode = {
    val resp = send(HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Authorization", "Bearer " + sessionId)
      .header("Content-Type", "application/json")
      .GET())
    resp.headers().firstValue("Sforce-Limit-Info").ifPresent {
      case UsagePattern(used, total) =>
        apiUsage = Some(ApiUsage(used.toLong, total.toLong))
      case _ => ()
    }
    mapper.readTree(new String(resp.body(), UTF_8))
  }

  private def bulkRequest(path: String): HttpRequest.Builder =
    HttpRequest.newBuilder(java.net.URI.create(bulkBase + path))
      .header("X-SFDC-Session", sessionId)

  private def bulkGet(path: String): HttpResponse[Array[Byte]] =
    send(bulkRequest(path).GET())

  private def bulkPost(path: String, body: String, contentType: String,
      extraHeaders: Map[String, String] = Map.empty): HttpResponse[Array[Byte]] = {
    val b = bulkRequest(path)
      .header("Content-Type", s"$contentType; charset=UTF-8")
      .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8))
    extraHeaders.foreach { case (k, v) => b.header(k, v) }
    send(b, idempotent = false) // POSTs never auto-retry (no duplicate jobs/batches)
  }

  // ---- XML helpers (jobInfo / batchInfoList / result-list) ------------

  private def parseXml(bytes: Array[Byte]): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(bytes))
  }

  private def childMap(el: org.w3c.dom.Element): Map[String, String] = {
    val ns = el.getChildNodes
    (0 until ns.getLength).flatMap { i =>
      ns.item(i) match {
        case e: org.w3c.dom.Element => Some(e.getLocalName -> e.getTextContent)
        case _ => None
      }
    }.toMap
  }

  private def elements(doc: org.w3c.dom.Document, tag: String): Seq[org.w3c.dom.Element] = {
    val ns = doc.getElementsByTagNameNS("*", tag)
    (0 until ns.getLength).map(ns.item(_).asInstanceOf[org.w3c.dom.Element])
  }

  private val JobNs = "http://www.force.com/2009/06/asyncapi/dataload"

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private val JobContentTypes = Set("CSV", "JSON", "XML")

  /** `create_job_doc` field order: operation, object,
    * [externalIdFieldName], [concurrencyMode], contentType
    * (`salesforce_bulk.py:252-274`); `contentType` parameterized like
    * the reference's keyword (CSV default — the format pgsf itself
    * speaks — with JSON/XML accepted).
    */
  private def jobDoc(objectName: String, operation: String,
      externalIdField: Option[String] = None,
      contentType: String = "CSV"): String = {
    require(JobContentTypes(contentType),
      s"unsupported bulk contentType '$contentType' (one of CSV/JSON/XML)")
    s"""<?xml version="1.0" encoding="UTF-8"?>""" +
      s"""<jobInfo xmlns="$JobNs">""" +
      s"<operation>$operation</operation>" +
      s"<object>${xmlEscape(objectName)}</object>" +
      externalIdField.map(f =>
        s"<externalIdFieldName>${xmlEscape(f)}</externalIdFieldName>").getOrElse("") +
      s"<contentType>$contentType</contentType></jobInfo>"
  }

  private def stateDoc(state: String): String =
    s"""<?xml version="1.0" encoding="UTF-8"?>""" +
      s"""<jobInfo xmlns="$JobNs"><state>$state</state></jobInfo>"""

  // ---- SfTransport ----------------------------------------------------

  /** GET sobjects/{name}/describe → field metadata
    * (`api.py:555-567`, consumed by `tabledesc.py:24-33`) — the FULL
    * attribute record the mapping rules key off: `calculated` and
    * `compoundFieldName` (default-selection exclusions), `unique` and
    * `defaultValue` (column DDL). `isIndexed` is NOT in describe — it
    * merges from [[fieldIndexes]] via `describeWithIndexes`.
    */
  override def describe(objectName: String): Seq[SfFieldMeta] = {
    val json = restGetJson(restBase + s"sobjects/$objectName/describe")
    def optNode(f: JsonNode, key: String): Option[JsonNode] =
      Option(f.get(key)).filterNot(_.isNull)
    json.get("fields").elements().asScala.map { f =>
      SfFieldMeta(
        name = f.get("name").asText(),
        sfType = f.get("type").asText(),
        length = if (f.has("length")) f.get("length").asInt() else 0,
        precision = if (f.has("precision")) f.get("precision").asInt() else 0,
        scale = if (f.has("scale")) f.get("scale").asInt() else 0,
        nillable = !f.has("nillable") || f.get("nillable").asBoolean(),
        unique = f.path("unique").asBoolean(false),
        calculated = f.path("calculated").asBoolean(false),
        compoundFieldName = optNode(f, "compoundFieldName").map(_.asText()),
        defaultValue = optNode(f, "defaultValue").map(JsonWire.scalar))
    }.toSeq
  }

  /** FieldDefinition IsIndexed fetch (`tabledesc.py:35-51`): the table
    * requires a reified-column filter (an unfiltered scan is a
    * MALFORMED_QUERY per the reference's note), so the SOQL pins
    * EntityDefinitionId — one paginated REST query, QualifiedApiName →
    * IsIndexed.
    */
  override def fieldIndexes(objectName: String): Map[String, Boolean] =
    restQueryRows("FieldDefinition", Seq("QualifiedApiName", "IsIndexed"),
        Some(s"EntityDefinitionId='$objectName'"), limit = None,
        includeDeleted = false)
      .flatMap { r =>
        r.get("QualifiedApiName").map(_.toString -> (r.get("IsIndexed") match {
          case Some(b: Boolean) => b
          case Some(x) => x.toString.equalsIgnoreCase("true")
          case None => false
        }))
      }.toMap

  private def queryEndpoint(includeDeleted: Boolean): String =
    if (includeDeleted) "queryAll/" else "query/"

  override def count(objectName: String, where: Option[String],
      includeDeleted: Boolean): Long = {
    val soql = s"SELECT COUNT() FROM $objectName" +
      where.map(w => s" WHERE $w").getOrElse("")
    val url = restBase + queryEndpoint(includeDeleted) +
      "?q=" + URLEncoder.encode(soql, "UTF-8")
    restGetJson(url).get("totalSize").asLong()
  }

  /** Bulk scan plan: create a PK-chunked query job, post the SOQL
    * batch, wait for the server's chunk split to finish (the
    * `numberBatchesQueued/InProgress` poll of `download.py:50-80`),
    * and return one `(jobId, batchId)` token per spawned batch. The
    * original batch ends `NotProcessed` under chunking and is excluded
    * (`bulk_states.py` ERROR_STATES). Empty result = server rejected
    * chunking for this object (`query_bulk.py:26-36` fallback).
    */
  override def pkChunks(objectName: String, fields: Seq[String],
      where: Option[String], includeDeleted: Boolean,
      chunkSize: Int): Seq[(String, String)] = {
    val operation = if (includeDeleted) "queryAll" else "query"
    val jobId =
      try {
        val resp = bulkPost("/job", jobDoc(objectName, operation), "application/xml",
          Map("Sforce-Enable-PKChunking" -> s"chunkSize=$chunkSize;"))
        childMap(parseXml(resp.body()).getDocumentElement)("id")
      } catch {
        case e: SfApiError if e.getMessage.contains("PKChunking") =>
          return Nil // S2 fallback: single-partition REST scan
      }
    val soql = s"SELECT ${fields.mkString(",")} FROM $objectName" +
      where.map(w => s" WHERE $w").getOrElse("")
    bulkPost(s"/job/$jobId/batch", soql, "text/csv")
    waitJobBatches(jobId)
    batchList(jobId)
      .filter(b => b.getOrElse("state", "") != "NotProcessed")
      .map(b => jobId -> b("id"))
  }

  private def batchList(jobId: String): Seq[Map[String, String]] =
    elements(parseXml(bulkGet(s"/job/$jobId/batch").body()), "batchInfo")
      .map(childMap)

  /** Poll job status until no batches are queued or in progress
    * (`download.py:50-80`); connection errors retry inside [[send]].
    */
  private def waitJobBatches(jobId: String): Unit = {
    val deadline = System.nanoTime() + pollTimeoutMs * 1000000L
    while (true) {
      val st = childMap(parseXml(bulkGet(s"/job/$jobId").body()).getDocumentElement)
      val pending = st.getOrElse("numberBatchesQueued", "0").toInt +
        st.getOrElse("numberBatchesInProgress", "0").toInt
      if (pending == 0) return
      if (System.nanoTime() > deadline)
        throw new SfApiError(408, s"job $jobId still has $pending pending batches " +
          s"after ${pollTimeoutMs / 1000} s")
      Thread.sleep(pollIntervalMs)
    }
  }

  override def query(objectName: String, fields: Seq[String],
      where: Option[String], limit: Option[Int], includeDeleted: Boolean,
      pkRange: Option[(String, String)]): Iterator[Map[String, Any]] =
    pkRange match {
      case Some((jobId, batchId)) => bulkBatchRows(jobId, batchId)
      case None => restQueryRows(objectName, fields, where, limit, includeDeleted)
    }

  // ---- REST path: paginated SOQL --------------------------------------

  /** Lazily follows `nextRecordsUrl` until `done` — the `query_all`
    * loop (`api.py:396-425`) as an iterator, so a page is only fetched
    * when the reader drains the previous one.
    */
  private def restQueryRows(objectName: String, fields: Seq[String],
      where: Option[String], limit: Option[Int],
      includeDeleted: Boolean): Iterator[Map[String, Any]] = {
    val soql = s"SELECT ${fields.mkString(",")} FROM $objectName" +
      where.map(w => s" WHERE $w").getOrElse("") +
      limit.map(n => s" LIMIT $n").getOrElse("")
    val first = restBase + queryEndpoint(includeDeleted) +
      "?q=" + URLEncoder.encode(soql, "UTF-8")
    new Iterator[Map[String, Any]] {
      private var page = restGetJson(first)
      private var recs = pageRecords(page)
      override def hasNext: Boolean = {
        while (!recs.hasNext && !page.path("done").asBoolean(true)) {
          // nextRecordsUrl is instance-relative (`api.py:382-385`)
          page = restGetJson(instanceUrl + page.get("nextRecordsUrl").asText())
          recs = pageRecords(page)
        }
        recs.hasNext
      }
      override def next(): Map[String, Any] = {
        if (!hasNext) throw new NoSuchElementException
        recs.next()
      }
    }
  }

  private def pageRecords(page: JsonNode): Iterator[Map[String, Any]] =
    page.get("records").elements().asScala.map { rec =>
      rec.properties().asScala
        .filter(_.getKey != "attributes")
        .map(e => e.getKey -> jsonValue(e.getValue)).toMap
    }

  private def jsonValue(n: JsonNode): Any = JsonWire.scalar(n)

  /** SOSL: GET search/?q=<SOSL> → {"searchRecords":[…]}; each
    * record's `attributes.type` lands as `_sobject_type` (the search
    * result set spans objects, unlike SOQL)
    * (`simple_salesforce/api.py:296-315`).
    */
  override def search(sosl: String): Seq[Map[String, Any]] =
    restGetJson(restBase + "search/?q=" + URLEncoder.encode(sosl, "UTF-8"))
      .path("searchRecords").elements().asScala.map { rec =>
        rec.properties().asScala
          .filter(_.getKey != "attributes")
          .map(e => e.getKey -> jsonValue(e.getValue)).toMap +
          ("_sobject_type" -> rec.path("attributes").path("type").asText())
      }.toSeq

  // ---- Per-record CRUD (simple_salesforce SFType, api.py:591-713) -----

  private def sobjectUrl(objectName: String, tail: String = ""): String =
    restBase + s"sobjects/$objectName/" +
      (if (tail.isEmpty) "" else URLEncoder.encode(tail, "UTF-8")
        .replace("%2F", "/"))

  private def jsonBody(data: Map[String, Any]): String = {
    val node = mapper.createObjectNode()
    data.foreach {
      case (k, null) => node.putNull(k)
      case (k, v: Boolean) => node.put(k, v)
      case (k, v: Int) => node.put(k, v)
      case (k, v: Long) => node.put(k, v)
      case (k, v: Double) => node.put(k, v)
      case (k, v) => node.put(k, v.toString)
    }
    mapper.writeValueAsString(node)
  }

  private def restSend(method: String, url: String, body: Option[String],
      idempotent: Boolean): HttpResponse[Array[Byte]] = {
    val b = HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Authorization", "Bearer " + sessionId)
      .header("Content-Type", "application/json")
      .method(method, body.map(s => HttpRequest.BodyPublishers.ofString(s, UTF_8))
        .getOrElse(HttpRequest.BodyPublishers.noBody()))
    send(b, idempotent)
  }

  private def nodeToMap(n: JsonNode): Map[String, Any] =
    n.properties().asScala.filter(_.getKey != "attributes")
      .map(e => e.getKey -> jsonValue(e.getValue)).toMap

  override def recordGet(objectName: String, recordId: String): Map[String, Any] =
    nodeToMap(restGetJson(sobjectUrl(objectName, recordId)))

  override def recordGetByExternalId(objectName: String, externalIdField: String,
      value: String): Map[String, Any] =
    nodeToMap(restGetJson(sobjectUrl(objectName, s"$externalIdField/$value")))

  /** POST returns `{"id": "...", "success": true}` (`api.py:629-645`);
    * non-idempotent — never auto-retried (a duplicate create is data
    * corruption, same rule as bulk job POSTs).
    */
  override def recordCreate(objectName: String, data: Map[String, Any]): String = {
    val resp = restSend("POST", sobjectUrl(objectName),
      Some(jsonBody(data)), idempotent = false)
    mapper.readTree(new String(resp.body(), UTF_8)).path("id").asText()
  }

  /** PATCH is idempotent by semantics (same final state on replay). */
  override def recordUpdate(objectName: String, recordId: String,
      data: Map[String, Any]): Int =
    restSend("PATCH", sobjectUrl(objectName, recordId),
      Some(jsonBody(data)), idempotent = true).statusCode()

  override def recordUpsertByExternalId(objectName: String, externalIdField: String,
      value: String, data: Map[String, Any]): Int =
    restSend("PATCH", sobjectUrl(objectName, s"$externalIdField/$value"),
      Some(jsonBody(data)), idempotent = true).statusCode()

  override def recordDelete(objectName: String, recordId: String): Int =
    restSend("DELETE", sobjectUrl(objectName, recordId), None,
      idempotent = true).statusCode()

  // ---- S7: Get Updated / Get Deleted ----------------------------------

  private val IsoTz = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd'T'HH:mm:ss'+00:00'")
    .withZone(java.time.ZoneOffset.UTC)

  private def rangeUrl(objectName: String, resource: String,
      start: java.sql.Timestamp, end: java.sql.Timestamp): String =
    restBase + s"sobjects/$objectName/$resource/?start=" +
      URLEncoder.encode(IsoTz.format(start.toInstant), "UTF-8") +
      "&end=" + URLEncoder.encode(IsoTz.format(end.toInstant), "UTF-8")

  /** GET sobjects/{name}/updated/?start=…&end=… → {"ids":[…]}
    * (`api.py:737-754`; surfaced by `query.py:26-34`).
    */
  override def updatedIds(objectName: String, start: java.sql.Timestamp,
      end: java.sql.Timestamp): Seq[String] =
    restGetJson(rangeUrl(objectName, "updated", start, end))
      .path("ids").elements().asScala.map(_.asText()).toSeq

  /** GET sobjects/{name}/deleted/?start=…&end=… →
    * {"deletedRecords":[{"id":…,"deletedDate":…}]} (`api.py:715-735`).
    */
  override def deletedIds(objectName: String, start: java.sql.Timestamp,
      end: java.sql.Timestamp): Seq[(String, java.sql.Timestamp)] =
    restGetJson(rangeUrl(objectName, "deleted", start, end))
      .path("deletedRecords").elements().asScala.map { r =>
        r.get("id").asText() ->
          java.sql.Timestamp.from(java.time.Instant.parse(r.get("deletedDate").asText()))
      }.toSeq

  // ---- Bulk path: batch download --------------------------------------

  /** One server-side batch → rows: poll the batch to Completed, list
    * its result ids, stream each result body with NUL bytes stripped
    * (`salesforce_bulk.py:440-496`). Result bodies are consumed as a
    * STREAM (ofInputStream → incremental NUL-strip → wire decoder over
    * a Reader), never materialized whole: a result file can approach
    * 1 GB, and one byte[] + String copy of it would OOM the executor.
    *
    * The result-id listing and each result body dispatch on the
    * RESPONSE Content-Type the way `get_query_batch_result_ids`
    * (`salesforce_bulk.py:440-459`) does: JSON jobs answer with a JSON
    * id array and JSON record arrays; CSV jobs with the XML result
    * list and CSV bodies.
    */
  private def bulkBatchRows(jobId: String, batchId: String): Iterator[Map[String, Any]] = {
    waitBatch(jobId, batchId)
    val listResp = bulkGet(s"/job/$jobId/batch/$batchId/result")
    val resultIds: Seq[String] =
      if (responseContentType(listResp).contains("json"))
        mapper.readTree(new String(listResp.body(), UTF_8))
          .elements().asScala.map(_.asText()).toSeq
      else elements(parseXml(listResp.body()), "result").map(_.getTextContent)
    resultIds.iterator.flatMap { rid =>
      val (in, ctype) = bulkGetStream(s"/job/$jobId/batch/$batchId/result/$rid")
      // the wire decoder closes the stream at EOF, but a partially-
      // consumed iterator (LIMIT pushdown, task abort) is simply
      // abandoned — the PartitionReader's close() cannot reach it.
      // Register the close with the task, so the socket is released
      // when the task ends however it ends (close() is idempotent;
      // outside a task — unit specs — the EOF close is the only path).
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => in.close()))
      if (ctype.contains("json")) JsonWire.parse(mapper, nulStripReader(in))
      else CsvWire.parse(nulStripReader(in))
    }
  }

  private def responseContentType(resp: HttpResponse[_]): String =
    resp.headers().firstValue("Content-Type").orElse("").toLowerCase

  /** Streaming GET for (idempotent) result downloads: retries
    * establishing the connection like [[send]]; a drop MID-stream
    * surfaces to the reader — the task rereads the partition on retry,
    * which the scan path tolerates (at-least-once reads). Returns the
    * stream plus the response Content-Type (lowercased) so the caller
    * can pick the wire decoder.
    */
  private def bulkGetStream(path: String): (java.io.InputStream, String) = {
    var attempt = 0
    while (true) {
      try {
        val resp = client.send(bulkRequest(path).GET().build(),
          HttpResponse.BodyHandlers.ofInputStream())
        if (resp.statusCode() >= 400) {
          val msg = try new String(resp.body().readNBytes(500), UTF_8)
            finally resp.body().close()
          throw new SfApiError(resp.statusCode(), msg)
        }
        return (resp.body(), responseContentType(resp))
      } catch {
        case _: java.io.IOException if attempt < maxRetries =>
          attempt += 1
          Thread.sleep(math.min(pollIntervalMs, 1000L) * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Incremental NUL strip (`salesforce_bulk.py:495`) over a streamed
    * body — the Reader twin of the old whole-string `.replace`; an
    * all-NUL refill loops instead of returning 0 chars.
    */
  private def nulStripReader(in: java.io.InputStream): java.io.Reader =
    new java.io.FilterReader(
        new java.io.InputStreamReader(new java.io.BufferedInputStream(in), UTF_8)) {
      override def read(): Int = {
        var c = super.read()
        while (c == 0) c = super.read()
        c
      }
      override def read(cbuf: Array[Char], off: Int, len: Int): Int = {
        var kept = 0
        while (kept == 0) {
          val n = super.read(cbuf, off, len)
          if (n == -1) return -1
          var w = off
          var i = off
          while (i < off + n) {
            if (cbuf(i) != 0.toChar) { cbuf(w) = cbuf(i); w += 1 }
            i += 1
          }
          kept = w - off
        }
        kept
      }
    }
  /** `wait_for_batch` (`salesforce_bulk.py:505-511`): poll batch state
    * every `pollIntervalMs` up to `pollTimeoutMs`; error states raise
    * (`is_batch_done`, `:498-503`). NotProcessed is terminal-OK here:
    * under PK chunking it marks the original batch, which has no data.
    */
  override def waitBatch(jobId: String, batchId: String): Unit = {
    val deadline = System.nanoTime() + pollTimeoutMs * 1000000L
    while (true) {
      val st = childMap(parseXml(
        bulkGet(s"/job/$jobId/batch/$batchId").body()).getDocumentElement)
      st.getOrElse("state", "") match {
        case "Completed" | "NotProcessed" => return
        case "Failed" | "Aborted" =>
          throw new SfApiError(400, s"batch $batchId of job $jobId failed: " +
            st.getOrElse("stateMessage", "(no stateMessage)"))
        case _ =>
          if (System.nanoTime() > deadline)
            throw new SfApiError(408,
              s"batch $batchId not done after ${pollTimeoutMs / 1000} s")
          Thread.sleep(pollIntervalMs)
      }
    }
  }

  // ---- UploadTransport (reverse ETL, K5) ------------------------------

  override def createJob(objectName: String, operation: String,
      externalIdField: Option[String] = None,
      contentType: String = "CSV"): String = {
    val resp = bulkPost("/job",
      jobDoc(objectName, operation, externalIdField, contentType),
      "application/xml")
    childMap(parseXml(resp.body()).getDocumentElement)("id")
  }

  override def postBatch(jobId: String, chunkCsv: String): String = {
    val resp = bulkPost(s"/job/$jobId/batch", chunkCsv, "text/csv")
    childMap(parseXml(resp.body()).getDocumentElement)("id")
  }

  override def closeJob(jobId: String): Unit =
    bulkPost(s"/job/$jobId", stateDoc("Closed"), "application/xml")

  /** Per-record upload outcome of GET job/batch/result, dispatched on
    * the RESPONSE Content-Type exactly like `get_batch_results`
    * (`salesforce_bulk.py:498-546`): the CSV `"Id","Success",
    * "Created","Error"` rows, the JSON `[{id, success, created,
    * errors:[...]}]` array, or the jobNS XML `<result>` elements. The
    * reference keeps JSON/XML error LISTS; this engine's
    * [[UploadResult.error]] is a single string, so structured errors
    * flatten to "statusCode:message" entries joined with "; " (the
    * job-abort decision downstream only tests emptiness).
    */
  override def batchResults(jobId: String, batchId: String): Seq[UploadResult] = {
    val resp = bulkGet(s"/job/$jobId/batch/$batchId/result")
    val ctype = responseContentType(resp)
    if (ctype.contains("json")) {
      def flag(n: JsonNode): Boolean =
        if (n.isBoolean) n.booleanValue() else n.asText("").equalsIgnoreCase("true")
      mapper.readTree(new String(resp.body(), UTF_8).replace("\u0000", ""))
        .elements().asScala.map { r =>
          UploadResult(
            id = r.path("id").asText(""),
            success = flag(r.path("success")),
            created = flag(r.path("created")),
            error = r.path("errors").elements().asScala.map(e =>
              (e.path("statusCode").asText("") + ":" +
                e.path("message").asText("")).stripPrefix(":"))
              .mkString("; "))
        }.toSeq
    } else if (ctype.contains("xml")) {
      elements(parseXml(resp.body()), "result").map { el =>
        val m = childMap(el)
        val errs = el.getElementsByTagNameNS("*", "errors")
        val error = (0 until errs.getLength).map { i =>
          val em = childMap(errs.item(i).asInstanceOf[org.w3c.dom.Element])
          (em.getOrElse("statusCode", "") + ":" + em.getOrElse("message", ""))
            .stripPrefix(":")
        }.mkString("; ")
        UploadResult(
          id = m.getOrElse("id", ""),
          success = m.getOrElse("success", "false").equalsIgnoreCase("true"),
          created = m.getOrElse("created", "false").equalsIgnoreCase("true"),
          error = error)
      }
    } else {
      val csv = new String(resp.body(), UTF_8).replace("\u0000", "")
      CsvWire.parse(csv).map { row =>
        UploadResult(
          id = row.getOrElse("Id", "").toString,
          success = row.getOrElse("Success", "false").toString.equalsIgnoreCase("true"),
          created = row.getOrElse("Created", "false").toString.equalsIgnoreCase("true"),
          error = row.getOrElse("Error", "").toString)
      }.toSeq
    }
  }
}

/** Minimal RFC-4180 CSV decoder for bulk result bodies: quoted fields,
  * doubled-quote escapes, embedded commas/newlines. Header row names
  * the fields; every value is a String (typed decode happens in
  * SfRowReader against the Spark schema).
  */
private[graft] object CsvWire {

  def parse(text: String): Iterator[Map[String, Any]] =
    parse(new java.io.StringReader(text))

  /** Streaming variant: rows decode as the Reader drains — nothing
    * requires the whole body in memory (bulk result files can approach
    * 1 GB). The reader closes at EOF.
    */
  def parse(reader: java.io.Reader): Iterator[Map[String, Any]] = {
    val rows = parseRows(reader)
    if (!rows.hasNext) return Iterator.empty
    val header = rows.next()
    rows.map(r => header.zip(r).toMap[String, Any])
  }

  private[graft] def parseRows(text: String): Iterator[Seq[String]] =
    parseRows(new java.io.StringReader(text))

  private[graft] def parseRows(reader: java.io.Reader): Iterator[Seq[String]] =
    new Iterator[Seq[String]] {
      private val in = new java.io.BufferedReader(reader)
      private var c: Int = in.read()
      private var closed = false
      private def advance(): Unit = {
        c = in.read()
        if (c == -1 && !closed) { closed = true; in.close() }
      }
      private def skipNewlines(): Unit =
        while (c == '\n' || c == '\r') advance()
      skipNewlines()
      override def hasNext: Boolean = c != -1
      override def next(): Seq[String] = {
        val fields = Seq.newBuilder[String]
        val sb = new StringBuilder
        var inQuotes = false
        var done = false
        while (!done) {
          if (c == -1) {
            fields += sb.result(); done = true
          } else if (inQuotes) {
            if (c == '"') {
              advance()
              if (c == '"') { sb.append('"'); advance() }
              else inQuotes = false
            } else { sb.append(c.toChar); advance() }
          } else c.toChar match {
            case '"' => inQuotes = true; advance()
            case ',' => fields += sb.result(); sb.clear(); advance()
            case '\n' | '\r' =>
              fields += sb.result(); done = true
              skipNewlines()
            case other => sb.append(other); advance()
          }
        }
        fields.result()
      }
    }
}

/** Streaming decoder for bulk JSON result bodies — the JSON twin of
  * [[CsvWire]]: the body is one top-level array of record objects
  * (`salesforce_bulk.py:512-517` JSON branch consumes the same shape
  * via `json.load`); records decode one at a time off the Jackson
  * parser, so nothing requires the whole body in memory. `attributes`
  * envelopes are dropped exactly like the REST page decoder; scalars
  * keep native types (SfRowReader converts against the Spark schema
  * either way). The parser closes at the end of the array.
  */
private[graft] object JsonWire {

  def scalar(n: JsonNode): Any =
    if (n == null || n.isNull) null
    else if (n.isBoolean) n.booleanValue()
    else if (n.isIntegralNumber) n.longValue()
    else if (n.isNumber) n.doubleValue()
    else n.asText()

  def parse(mapper: ObjectMapper, reader: java.io.Reader): Iterator[Map[String, Any]] = {
    import com.fasterxml.jackson.core.JsonToken
    val p = mapper.getFactory.createParser(reader)
    val first = p.nextToken()
    if (first == null) { p.close(); return Iterator.empty }
    require(first == JsonToken.START_ARRAY,
      s"bulk JSON result must be a top-level array, got $first")
    new Iterator[Map[String, Any]] {
      private var tok = p.nextToken()
      override def hasNext: Boolean = {
        val more = tok == JsonToken.START_OBJECT
        if (!more) {
          // anything but the array's close is a malformed result —
          // treating it as end-of-stream would silently truncate the
          // download (a stray null/scalar mid-array drops every
          // record after it); fail as loudly as the top-level require
          if (tok != JsonToken.END_ARRAY)
            throw new IllegalStateException(
              s"bulk JSON result: expected a record object or end of " +
                s"array, got $tok — refusing to truncate the download")
          if (!p.isClosed) p.close()
        }
        more
      }
      override def next(): Map[String, Any] = {
        if (!hasNext) throw new NoSuchElementException
        val node = p.readValueAsTree[JsonNode]()
        tok = p.nextToken()
        node.properties().asScala
          .filter(_.getKey != "attributes")
          .map(e => e.getKey -> scalar(e.getValue)).toMap
      }
    }
  }
}
