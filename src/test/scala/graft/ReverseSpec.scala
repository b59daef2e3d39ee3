package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.reverse.{BulkUpload, MockUploadTransport}

/** Chunker invariants (property-based, SURVEY.md §5 #2) and the
  * end-to-end upload path over the mock bulk transport.
  */
class ReverseSpec extends AnyFunSuite {

  test("chunker invariants: bounds respected, header repeated, content preserved") {
    val recGen = Gen.listOf(Gen.alphaNumStr.map(s => "\"" + s.take(40) + "\""))
    val prop = Prop.forAll(recGen, Gen.chooseNum(50, 400), Gen.chooseNum(1, 7)) {
      (recs: List[String], maxBytes: Int, maxRecords: Int) =>
        val header = "\"Id\",\"Name\""
        val chunks = BulkUpload.chunk(header, recs.iterator, maxBytes, maxRecords).toList
        val headerOk = chunks.forall(_.startsWith(header + "\n"))
        val countOk = chunks.forall(_.linesIterator.size <= maxRecords + 1)
        // byte bound may be exceeded only by a single oversized record
        val bytesOk = chunks.forall { c =>
          c.linesIterator.size <= 2 || c.getBytes("UTF-8").length <= maxBytes
        }
        val contentOk = chunks.flatMap(_.linesIterator.drop(1)) == recs
        headerOk && countOk && bytesOk && contentOk
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(result.passed, result.status.toString)
  }

  test("value encoding: t/f booleans, quote doubling, NUL strip, NULL as empty (T1)") {
    assert(BulkUpload.encodeValue(null) == "")
    assert(BulkUpload.encodeValue(true) == "t")
    assert(BulkUpload.encodeValue(false) == "f")
    assert(BulkUpload.encodeValue("say \"hi\"") == "\"say \"\"hi\"\"\"")
    assert(BulkUpload.encodeValue("nul\u0000led") == "\"nulled\"")
    assert(BulkUpload.encodeValue(42) == "42")
    assert(BulkUpload.encodeValue(
      java.sql.Timestamp.valueOf("2024-01-02 03:04:05")).endsWith("Z"))
  }
}

/** Spark-side end-to-end upload (separate suite: needs the session). */
class ReverseUploadSpec extends SparkSpec {
  import spark.implicits._

  test("upload chunks every partition and closes the job (K5)") {
    val t = new MockUploadTransport
    MockUploadTransport.register("up1", t)
    val df = (1 to 250).map(i => (s"003$i", s"name-$i", i % 2 == 0))
      .toDF("Id", "Name", "Active").repartition(3)
    val jobId = BulkUpload.upload(df, "Contact", "up1", maxRecords = 40)
    assert(t.closedJobs.contains(jobId))
    val chunks = t.batches.values.toList
    // 250 rows over 3 partitions, <=40 records per chunk -> >= 7 chunks
    assert(chunks.size >= 7)
    val allRows = chunks.flatMap(_.linesIterator.drop(1)).sorted
    assert(allRows.size == 250)
    // bool encoding t/f present
    assert(allRows.head.endsWith(",t") || allRows.head.endsWith(",f"))
    // every chunk within the record bound (+header)
    assert(chunks.forall(_.linesIterator.size <= 41))
  }

  test("operation validation: upsert needs the external id, others reject it") {
    val t = new MockUploadTransport
    MockUploadTransport.register("up2", t)
    val df = Seq(("e1", "a")).toDF("Ext_Id__c", "Name")
    // upsert without an external-id field is the reference client's
    // error (create_upsert_job requires external_id_name)
    intercept[IllegalArgumentException] {
      BulkUpload.upload(df, "Contact", "up2", operation = "upsert")
    }
    intercept[IllegalArgumentException] {
      BulkUpload.upload(df, "Contact", "up2", operation = "update",
        externalIdField = Some("Ext_Id__c"))
    }
    intercept[IllegalArgumentException] {
      BulkUpload.upload(df, "Contact", "up2", operation = "merge")
    }
    // the happy paths thread the field (or its absence) to the job doc
    val job = BulkUpload.upload(df, "Contact", "up2", operation = "upsert",
      externalIdField = Some("Ext_Id__c"))
    assert(job.contains("-upsert-") && t.lastExternalIdField == Some("Ext_Id__c"))
    val del = BulkUpload.upload(df.select("Ext_Id__c"), "Contact", "up2",
      operation = "delete")
    assert(del.contains("-delete-") && t.lastExternalIdField.isEmpty)
  }
  test("uploadResultCensus: per-batch failure census matches hand-computed chunks") {
    val t = new MockUploadTransport(failEvery = 7)
    MockUploadTransport.register("up3", t)
    // 103 ordered rows, 40 per batch -> batches of 40/40/23; every 7th
    // position in each batch fails -> 5/5/3 failures
    val df = (1 to 103).map(i => (i.toLong, s"name-$i")).toDF("Id", "Name")
      .repartition(4) // census re-lays-out to one ordered stream itself
    val out = BulkUpload.uploadResultCensus(df, "Id", "Contact", "up3",
      maxRecords = 40)
      .as[(Int, Long, Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1, 40L, 35L, 35L, 5L, "MOCK_FAILURE:row rejected"),
      (2, 40L, 35L, 35L, 5L, "MOCK_FAILURE:row rejected"),
      (3, 23L, 20L, 20L, 3L, "MOCK_FAILURE:row rejected")), out.toString)
  }
}
