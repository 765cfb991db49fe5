package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.etl.ChunkerConfig
import graft.pipeline.{IngestPipeline, ProcessingConfig}
import graft.store.{ObjectStore, TableStore}

/** S13/§2.12 end to end over the wire: ingest a real document, then
  * exercise every REST route of the reference contract (api.py:71-218)
  * through an actual HTTP round trip — JSON listings, nested detail,
  * range queries, the PNG byte route with its content type, 404 guards,
  * multipart upload (the reference's UploadFile contract) feeding the
  * watch directory byte-identically, FastAPI-shaped 422 validation for
  * malformed query params, and the 413 body cap.
  */
class HttpShimSpec extends AnyFunSuite with SharedSpark {

  private val now = Timestamp.valueOf("2026-01-15 08:30:00")

  // one ingested corpus + running shim shared by every test in the suite
  private lazy val (port, uploadDir, shimTablesRoot, shimTables)
      : (Int, String, String, TableStore) = {
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
    val dir = tmpDir("shim-upload")
    val shim = new HttpShim(store, dir, maxUploadBytes = 64 * 1024)
    val p = shim.start()
    sys.addShutdownHook(shim.stop())
    (p, dir, s"$root/tables", tables)
  }

  private val client = HttpClient.newHttpClient()

  private def get(path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private def post(path: String, body: Array[Byte],
                   contentType: Option[String] = None): HttpResponse[String] = {
    val builder = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofByteArray(body))
    contentType.foreach(ct => builder.header("Content-Type", ct))
    client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
  }

  test("every reference read route answers over the wire") {
    // GET /documents — JSON array with the ingested row
    val list = get("/documents")
    assert(list.statusCode() == 200)
    assert(list.headers().firstValue("Content-Type").get() == "application/json")
    assert(list.body().startsWith("[") && list.body().contains("\"filename\":\"report.pdf\""))
    // spark can parse the shim's JSON back — schema round trips
    import spark.implicits._
    val parsed = spark.read.json(Seq(list.body()).toDS())
    val docId = parsed.select("id").head().getLong(0)

    // GET /documents/{id} — nested detail with chunks + charts
    val detail = get(s"/documents/$docId")
    assert(detail.statusCode() == 200)
    assert(detail.body().contains("\"chunks\":") && detail.body().contains("\"charts\":"))

    // GET chunks with a range; bounds honoured
    val chunks = get(s"/documents/$docId/chunks?start_chunk=0&end_chunk=0")
    assert(chunks.statusCode() == 200)
    assert(chunks.body().contains("\"chunk_index\":0"))
    assert(!chunks.body().contains("\"chunk_index\":1"))
    // bounds pass through verbatim: end_chunk=-1 is an EMPTY range
    // (chunk_index <= -1, the reference's ORM-filter semantics), not
    // "no upper bound"
    val negRange = get(s"/documents/$docId/chunks?end_chunk=-1")
    assert(negRange.statusCode() == 200 && negRange.body() == "[]")

    // GET charts listing, then the PNG byte route with content type
    val charts = get(s"/documents/$docId/charts")
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
    assert(get("/documents/999999").statusCode() == 404)
    assert(get("/documents/999999/chunks").statusCode() == 404)
    assert(get(s"/documents/999999/charts/$chartId").statusCode() == 404)

    // [EXT] batch hydrate: present ids return, absent ids just don't;
    // malformed or pagination-mixed params are 422s
    val batch = get(s"/documents?ids=$docId,999999")
    assert(batch.statusCode() == 200 &&
      batch.body().contains("\"filename\":\"report.pdf\""))
    assert(spark.read.json(Seq(batch.body()).toDS()).count() == 1)
    assert(get("/documents?ids=1,abc").statusCode() == 422)
    assert(get(s"/documents?ids=$docId&skip=0").statusCode() == 422)

    // [EXT] keyset pagination: anchor below the id → the row returns;
    // anchor at/above it → empty page; malformed/mixed params → 422
    val page = get(s"/documents?after_id=${docId - 1}&limit=5")
    assert(page.statusCode() == 200 &&
      page.body().contains("\"filename\":\"report.pdf\""))
    assert(get(s"/documents?after_id=$docId").body() == "[]")
    assert(get("/documents?after_id=abc").statusCode() == 422)
    assert(get(s"/documents?after_id=0&skip=1").statusCode() == 422,
      "after_id and skip must not silently combine")
    assert(get(s"/documents?after_id=0&limit=-1").statusCode() == 422)
  }

  test("the ops route serves a table report; unknown tables 404") {
    import spark.implicits._
    val r = get("/ops/tables/documents")
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Type").get() == "application/json")
    val rep = spark.read.json(Seq(r.body()).toDS()).head()
    assert(rep.getAs[String]("table") == "documents")
    assert(rep.getAs[Long]("files") >= 1 && rep.getAs[Long]("bytes") > 0)
    assert(rep.getAs[Boolean]("swap_debris") == false)
    assert(Set("none", "live-own", "expired-own")
      .contains(rep.getAs[String]("lease_state")),
      "the ingest pipeline's own lease may still be visible, a foreign one never")
    // the chunks table is hive-partitioned: partition_dirs > 0
    val chunks = spark.read.json(Seq(get("/ops/tables/document_chunks").body()).toDS()).head()
    assert(chunks.getAs[Long]("partition_dirs") >= 1)
    // a table that never existed (and has no debris) is a 404
    assert(get("/ops/tables/no_such_table").statusCode() == 404)
    // path-shaped names must not address outside the table namespace
    assert(get("/ops/tables/%2e%2e").statusCode() == 404)
    assert(get("/ops/tables/_graft_pre_leases").statusCode() == 404)
    // the INDEX: one response, every table's report
    val idx = get("/ops/tables")
    assert(idx.statusCode() == 200 && idx.body().startsWith("["))
    val tables = spark.read.json(Seq(idx.body()).toDS())
      .select("table").as[String].collect().toSet
    assert(Set("documents", "document_chunks", "chart_data").subsetOf(tables),
      s"index must list the corpus tables, got $tables")
    // a table BEING CREATED (live pre-table lease, no dir yet) reports —
    // that is the moment an operator watches a new stream come up...
    val creator = new TableStore(spark, shimTablesRoot)
    assert(creator.acquireWriterLease("ghost_table", ttlMs = 60000L))
    val creating = get("/ops/tables/ghost_table")
    assert(creating.statusCode() == 200 &&
      creating.body().contains("\"lease_state\":\"live-foreign\""))
    // ...but once that lease DIES without the table ever materializing
    // (crashed creator, typo'd target), the name must return to 404 —
    // not answer 200-with-zeros forever (r13 review finding)
    creator.releaseWriterLease("ghost_table")
    assert(get("/ops/tables/ghost_table").statusCode() == 404)
  }

  test("the ops index shares ONE root walk — O(1) listings, not O(tables) (r14)") {
    import spark.implicits._
    // warm the route (lazy caches, first-touch schema reads), then
    // measure: the index must grow the REAL-listing counter by at most
    // one per poll however many tables the store holds — the r13 form
    // paid one listing per table per poll
    assert(get("/ops/tables").statusCode() == 200)
    val before = shimTables.listingsPerformed.get()
    val idx = get("/ops/tables")
    assert(idx.statusCode() == 200)
    val nTables = spark.read.json(Seq(idx.body()).toDS()).count()
    assert(nTables >= 3, "the corpus fixture has at least 3 tables")
    val grew = shimTables.listingsPerformed.get() - before
    assert(grew <= 1,
      s"index poll must share one root walk; did $grew listings for $nTables tables")
  }

  test("multipart upload lands the file part byte-identical in the watch dir") {
    // binary payload with CRLFs, a boundary-lookalike NOT at line start,
    // AND a line that BEGINS with the exact delimiter but continues with
    // other bytes ("--boundaryX...") — data per RFC 2046 (a real delimiter
    // line ends in CRLF or "--"), which a naive prefix match would treat
    // as a boundary and silently truncate the file at
    val boundary = "graftBoundary42"
    val payload = ("PDF-ish\r\nbinary --bound lookalike\r\n" +
      s"--${boundary}X not a boundary\r\n" + "x" * 300)
      .getBytes(StandardCharsets.UTF_8) ++ Array[Byte](0, 1, 2, '\r', '\n', -1)
    val body =
      ("preamble to be ignored\r\n" +                       // RFC 2046 preamble
        s"--$boundary\r\n" +
        "Content-Disposition: form-data; name=\"note\"\r\n\r\n" +
        "a non-file field the parser must skip\r\n" +
        s"--$boundary \t \r\n" + // transport padding after the delimiter (RFC 2046 §5.1.1)
        "Content-Disposition: form-data; name=\"file\"; filename=\"multi.pdf\"\r\n" +
        "Content-Type: application/pdf\r\n\r\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ payload ++
        (s"\r\n--$boundary--\r\nepilogue junk".getBytes(StandardCharsets.ISO_8859_1))
    val up = post("/documents/upload", body,
      Some(s"multipart/form-data; boundary=$boundary"))
    assert(up.statusCode() == 200)
    // the reference's exact response fields (api.py:79-84)
    assert(up.body().contains("\"message\":\"File uploaded successfully\""))
    assert(up.body().contains("\"filename\":\"multi.pdf\""))
    assert(up.body().contains("\"status\":\"pending_processing\""))
    val landed = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(uploadDir, "multi.pdf"))
    assert(java.util.Arrays.equals(landed, payload))
  }

  test("multipart without boundary or file part is a 400") {
    assert(post("/documents/upload", "x".getBytes,
      Some("multipart/form-data")).statusCode() == 400)
    val b = "bb"
    val noFile = (s"--$b\r\nContent-Disposition: form-data; name=\"f\"\r\n\r\nv\r\n--$b--\r\n")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(post("/documents/upload", noFile,
      Some(s"multipart/form-data; boundary=$b")).statusCode() == 400)
  }

  test("raw-body fallback still lands uploads; path-bearing names confined") {
    val up = post("/documents/upload?filename=..%2Fnew.pdf",
      "Note:\nuploaded body".getBytes(StandardCharsets.UTF_8))
    assert(up.statusCode() == 200 && up.body().contains("\"status\":\"pending_processing\""))
    val landed = java.nio.file.Paths.get(uploadDir, "new.pdf")
    assert(java.nio.file.Files.exists(landed))
    assert(new String(java.nio.file.Files.readAllBytes(landed),
      StandardCharsets.UTF_8).contains("uploaded body"))
    // missing filename is a 400, not a crash
    assert(post("/documents/upload", "x".getBytes).statusCode() == 400)
    // '.' and '..' resolve to no file — explicit 400, not a 500 from Files
    assert(post("/documents/upload?filename=.", "x".getBytes).statusCode() == 400)
    assert(post("/documents/upload?filename=..", "x".getBytes).statusCode() == 400)
  }

  test("malformed numeric query params are FastAPI-shaped 422s, not 500s") {
    val badSkip = get("/documents?skip=abc")
    assert(badSkip.statusCode() == 422)
    assert(badSkip.body().contains("\"loc\":[\"query\",\"skip\"]"))
    assert(badSkip.body().contains("not a valid integer"))
    assert(get("/documents?limit=-1").statusCode() == 422)
    assert(get("/documents/1/chunks?start_chunk=x").statusCode() == 422)
    // valid bounds still work
    assert(get("/documents?skip=0&limit=1").statusCode() == 200)
    // non-integer PATH params are 422s too (FastAPI type validation),
    // with absent-but-well-typed ids staying 404
    val badPath = get("/documents/abc")
    assert(badPath.statusCode() == 422)
    assert(badPath.body().contains("\"loc\":[\"path\",\"document_id\"]"))
    assert(get("/documents/abc/chunks").statusCode() == 422)
    assert(get("/documents/1/charts/xyz").statusCode() == 422)
    assert(get("/documents/999999").statusCode() == 404)
  }

  test("a fresh store (no tables yet) serves empty listings, not 500s") {
    // HttpShim legitimately starts before the first streaming batch
    // commits any table; the reference returns 200 [] / 404 there
    val root = tmpDir("shim-empty")
    val store = new DocumentStore(spark,
      new TableStore(spark, s"$root/tables"),
      new ObjectStore(spark, s"$root/bucket"))
    val shim = new HttpShim(store, tmpDir("shim-empty-up"))
    val p = shim.start()
    try {
      val list = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$p/documents"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(list.statusCode() == 200 && list.body() == "[]")
      val detail = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$p/documents/1"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(detail.statusCode() == 404)
    } finally shim.stop()
  }

  test("separator-only filenames are 400s, not 500s") {
    assert(post("/documents/upload?filename=%2F", "x".getBytes).statusCode() == 400)
    assert(post("/documents/upload?filename=%5C", "x".getBytes).statusCode() == 400)
    assert(post("/documents/upload?filename=%2F%2F", "x".getBytes).statusCode() == 400)
  }

  test("uploads beyond the cap are a 413, never an OOM") {
    val big = new Array[Byte](80 * 1024) // cap in fixture is 64 KiB
    assert(post("/documents/upload?filename=big.bin", big).statusCode() == 413)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(uploadDir, "big.bin")))
    val boundary = "capb"
    val multi =
      (s"--$boundary\r\n" +
        "Content-Disposition: form-data; name=\"file\"; filename=\"big2.bin\"\r\n\r\n")
        .getBytes(StandardCharsets.ISO_8859_1) ++ big ++
        (s"\r\n--$boundary--\r\n".getBytes(StandardCharsets.ISO_8859_1))
    assert(post("/documents/upload", multi,
      Some(s"multipart/form-data; boundary=$boundary")).statusCode() == 413)
  }

  test("concurrent uploads and reads land intact — no cross-talk, no 5xx") {
    // 24 clients against the shim's 8-thread pool: 16 distinct multipart
    // uploads (binary payloads big enough to exercise the disk spool)
    // interleaved with Spark-backed reads. Every upload must land its
    // exact bytes under its own name — per-request spool files and
    // staging paths must not collide — and no request may 5xx. This is
    // the pool-wide heap-bound claim of the class doc exercised for real.
    val uploads = 16
    val readers = 8
    val payloads = (0 until uploads).map { i =>
      val b = new Array[Byte](16 * 1024 + i)
      new scala.util.Random(1000 + i).nextBytes(b)
      (s"conc$i.pdf", b)
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(24)
    try {
      val tasks: Seq[java.util.concurrent.Callable[(String, Int)]] =
        payloads.map { case (fname, payload) =>
          { () =>
            val boundary = s"cb-$fname"
            val body =
              (s"--$boundary\r\n" +
                s"""Content-Disposition: form-data; name="file"; filename="$fname"""" +
                "\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1) ++ payload ++
                (s"\r\n--$boundary--\r\n".getBytes(StandardCharsets.ISO_8859_1))
            (fname, post("/documents/upload", body,
              Some(s"multipart/form-data; boundary=$boundary")).statusCode())
          }: java.util.concurrent.Callable[(String, Int)]
        } ++ (0 until readers).map { i =>
          { () =>
            (s"read$i", get("/documents").statusCode())
          }: java.util.concurrent.Callable[(String, Int)]
        }
      val shuffled = new scala.util.Random(7).shuffle(tasks)
      val results = pool.invokeAll(shuffled.asJava).asScala.map(_.get())
      results.foreach { case (who, status) =>
        assert(status == 200, s"$who answered $status under concurrency")
      }
      payloads.foreach { case (fname, payload) =>
        val landed = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(uploadDir, fname))
        assert(java.util.Arrays.equals(landed, payload),
          s"$fname landed ${landed.length} bytes, expected ${payload.length}")
      }
    } finally pool.shutdown()
  }
}
