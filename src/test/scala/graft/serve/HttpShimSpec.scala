package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.etl.ChunkerConfig
import graft.pipeline.{IngestPipeline, ProcessingConfig}
import graft.store.{ObjectStore, TableStore}

/** S13/§2.12 end to end over the wire: ingest a real document, then
  * exercise every REST route of the reference contract (api.py:71-218)
  * through an actual HTTP round trip — JSON listings, nested detail,
  * range queries, the PNG byte route with its content type, 404 guards,
  * and the upload path feeding the watch directory.
  */
class HttpShimSpec extends AnyFunSuite with SharedSpark {

  private val now = Timestamp.valueOf("2026-01-15 08:30:00")

  private def fixture(): (HttpShim, Int, String, DocumentStore) = {
    val inbox = tmpDir("shim-inbox")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(inbox, "report.pdf"),
      ("""Quarterly Report:
         |The overall revenue of the group grew steadily this quarter again.
         |TABLE: revenue by region
         |""".stripMargin).getBytes(StandardCharsets.UTF_8))
    val root = tmpDir("shim-store")
    val tables = new TableStore(spark, s"$root/tables")
    val objects = new ObjectStore(spark, s"$root/bucket")
    new IngestPipeline(spark, tables, objects,
      ProcessingConfig(chunker = ChunkerConfig(minTokens = 5, maxTokens = 2000)))
      .ingest(inbox, now)
    val store = new DocumentStore(spark, tables, objects)
    val uploadDir = tmpDir("shim-upload")
    val shim = new HttpShim(store, uploadDir)
    val port = shim.start()
    (shim, port, uploadDir, store)
  }

  private val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("every reference route answers over the wire") {
    val (shim, port, uploadDir, _) = fixture()
    try {
      // GET /documents — JSON array with the ingested row
      val list = get(port, "/documents")
      assert(list.statusCode() == 200)
      assert(list.headers().firstValue("Content-Type").get() == "application/json")
      assert(list.body().startsWith("[") && list.body().contains("\"filename\":\"report.pdf\""))
      // spark can parse the shim's JSON back — schema round trips
      import spark.implicits._
      val parsed = spark.read.json(Seq(list.body()).toDS())
      val docId = parsed.select("id").head().getLong(0)

      // GET /documents/{id} — nested detail with chunks + charts
      val detail = get(port, s"/documents/$docId")
      assert(detail.statusCode() == 200)
      assert(detail.body().contains("\"chunks\":") && detail.body().contains("\"charts\":"))

      // GET chunks with a range; bounds honoured
      val chunks = get(port, s"/documents/$docId/chunks?start_chunk=0&end_chunk=0")
      assert(chunks.statusCode() == 200)
      assert(chunks.body().contains("\"chunk_index\":0"))
      assert(!chunks.body().contains("\"chunk_index\":1"))

      // GET charts listing, then the PNG byte route with content type
      val charts = get(port, s"/documents/$docId/charts")
      assert(charts.statusCode() == 200 && charts.body().contains("\"image_path\""))
      val chartId = spark.read.json(Seq(charts.body()).toDS())
        .select("id").head().getLong(0)
      val img = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/documents/$docId/charts/$chartId"))
          .GET().build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(img.statusCode() == 200)
      assert(img.headers().firstValue("Content-Type").get() == "image/png")
      val magic = img.body().take(4).map(_ & 0xff)
      assert(magic.sameElements(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)))

      // 404 guards: absent document, absent chart, wrong-owner chart
      assert(get(port, "/documents/999999").statusCode() == 404)
      assert(get(port, "/documents/999999/chunks").statusCode() == 404)
      assert(get(port, s"/documents/999999/charts/$chartId").statusCode() == 404)

      // POST /documents/upload — bytes land in the watch dir (S1 feed);
      // path-bearing names are confined to their basename
      val up = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/documents/upload?filename=..%2Fnew.pdf"))
          .POST(HttpRequest.BodyPublishers.ofString("Note:\nuploaded body"))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      assert(up.statusCode() == 200 && up.body().contains("\"status\":\"uploaded\""))
      val landed = java.nio.file.Paths.get(uploadDir, "new.pdf")
      assert(java.nio.file.Files.exists(landed))
      assert(new String(java.nio.file.Files.readAllBytes(landed),
        StandardCharsets.UTF_8).contains("uploaded body"))
      // missing filename is a 400, not a crash
      val bad = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:$port/documents/upload"))
          .POST(HttpRequest.BodyPublishers.ofString("x")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(bad.statusCode() == 400)
    } finally shim.stop()
  }
}
