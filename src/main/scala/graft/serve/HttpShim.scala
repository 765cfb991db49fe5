package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** S13 + §2.12 — the reference's REST contract (api.py:71-218) as a thin
  * JDK `com.sun.net.httpserver` adapter over [[DocumentStore]]. Zero
  * dependencies beyond the JDK; every route delegates to the engine's
  * serving read paths and renders rows with Spark's own `toJSON`, so the
  * query semantics live in exactly one place.
  *
  * Routes (api.py line refs):
  *   - `POST /documents/upload?filename=f.pdf`  (:71) — body bytes land
  *     in the watch directory feeding the S1 streaming ingest. Declared
  *     divergence: raw body + filename query param instead of multipart
  *     (no multipart codec in the JDK; the semantic contract — bytes
  *     reach the watch dir — is preserved).
  *   - `GET /documents`                          (:87)
  *   - `GET /documents/{id}`                     (:106)
  *   - `GET /documents/{id}/chunks?start_chunk=&end_chunk=` (:149)
  *   - `GET /documents/{id}/charts`              (:174)
  *   - `GET /documents/{id}/charts/{chartId}`    (:197) — PNG bytes with
  *     the stored content type.
  *
  * Serving scale note: every handler collects a POINT-SHAPED or
  * paginated result (one document, one chart, one bounded page) — the
  * same bounded reads the reference's ORM session does — never a corpus
  * scan. The driver is the serving node; a production deployment would
  * put this behind the usual replica fan-out, which is out of engine
  * scope.
  */
final class HttpShim(store: DocumentStore, uploadDir: String, port: Int = 0) {

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  /** Start serving; returns the bound port (ephemeral when `port` = 0). */
  def start(): Int = {
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)

  // ---- routing ---------------------------------------------------------

  private def handle(ex: HttpExchange): Unit =
    try route(ex)
    catch {
      case e: Exception =>
        send(ex, 500, "application/json",
          s"""{"detail":${jsonStr(e.getMessage)}}"""
            .getBytes(StandardCharsets.UTF_8))
    } finally ex.close()

  private def route(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val segs = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).toList
    val query = parseQuery(Option(ex.getRequestURI.getRawQuery))
    (method, segs) match {
      case ("POST", List("documents", "upload")) =>
        upload(ex, query)
      case ("GET", List("documents")) =>
        jsonArray(ex, store.listDocuments(
          skip = query.get("skip").map(_.toInt).getOrElse(0),
          limit = query.get("limit").map(_.toInt).getOrElse(100)))
      case ("GET", List("documents", AsLong(id))) =>
        store.getDocument(id).toJSON.collect().headOption match {
          case Some(doc) => send(ex, 200, "application/json",
            doc.getBytes(StandardCharsets.UTF_8))
          case None => notFound(ex, "Document not found")
        }
      case ("GET", List("documents", AsLong(id), "chunks")) =>
        // existence guard before returning children (api.py:110-112)
        if (documentAbsent(id)) notFound(ex, "Document not found")
        else jsonArray(ex, store.getChunks(id,
          query.get("start_chunk").map(_.toInt),
          query.get("end_chunk").map(_.toInt)))
      case ("GET", List("documents", AsLong(id), "charts")) =>
        if (documentAbsent(id)) notFound(ex, "Document not found")
        else jsonArray(ex, store.getCharts(id))
      case ("GET", List("documents", AsLong(id), "charts", AsLong(chartId))) =>
        store.getChartWithImage(id, chartId) match {
          case Some((_, bytes, contentType)) =>
            send(ex, 200, contentType, bytes)
          case None => notFound(ex, "Chart not found") // wrong owner too
        }
      case _ => notFound(ex, "Not found")
    }
  }

  private def upload(ex: HttpExchange, query: Map[String, String]): Unit =
    query.get("filename").filter(_.nonEmpty) match {
      case None =>
        send(ex, 400, "application/json",
          """{"detail":"filename query parameter required"}"""
            .getBytes(StandardCharsets.UTF_8))
      case Some(name) =>
        // basename only: a path-bearing filename must not escape the
        // watch directory
        val base = name.split('/').last.split('\\').last
        val body = ex.getRequestBody.readAllBytes()
        val dir = java.nio.file.Paths.get(uploadDir)
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.write(dir.resolve(base), body)
        send(ex, 200, "application/json",
          s"""{"filename":${jsonStr(base)},"size":${body.length},"status":"uploaded"}"""
            .getBytes(StandardCharsets.UTF_8))
    }

  // ---- helpers ---------------------------------------------------------

  private object AsLong {
    def unapply(s: String): Option[Long] = s.toLongOption
  }

  private def documentAbsent(id: Long): Boolean =
    store.documents.filter(col("id") === id).limit(1).isEmpty

  /** Rows → one JSON array via Spark's own row serialization (bounded:
    * every caller is a paginated or single-document read).
    */
  private def jsonArray(ex: HttpExchange, df: DataFrame): Unit =
    send(ex, 200, "application/json",
      df.toJSON.collect().mkString("[", ",", "]")
        .getBytes(StandardCharsets.UTF_8))

  private def notFound(ex: HttpExchange, detail: String): Unit =
    send(ex, 404, "application/json",
      s"""{"detail":${jsonStr(detail)}}""".getBytes(StandardCharsets.UTF_8))

  private def send(ex: HttpExchange, status: Int, contentType: String,
                   body: Array[Byte]): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, body.length.toLong)
    val os = ex.getResponseBody
    try os.write(body) finally os.close()
  }

  private def jsonStr(s: String): String = {
    val sb = new StringBuilder("\"")
    Option(s).getOrElse("").foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  private def parseQuery(raw: Option[String]): Map[String, String] =
    raw.getOrElse("").split('&').filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
}
