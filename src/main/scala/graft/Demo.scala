package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.pipeline.{IngestPipeline, ProcessingConfig}
import graft.serve.DocumentStore
import graft.store.{ObjectStore, TableStore}

/** The reference's richest executable artifact is the demo scenario in
  * `repository.py:191-371` (create → nested read → range query → metadata
  * update → cascade delete, with printed expectations). This main replays
  * it end-to-end on the Spark engine — `sbt "runMain graft.Demo"` — as the
  * user-visible smoke a reference user would run first after switching.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val now = Timestamp.valueOf("2026-01-15 08:30:00")
    val inbox = Files.createTempDirectory("graft-demo-inbox").toString
    val root = Files.createTempDirectory("graft-demo-store").toString

    Files.write(Paths.get(inbox, "lalalal1.pdf"),
      """Executive Summary:
        |This report analyzes the performance of TechCorp Inc during the recent quarter overall.
        |
        |Market Analysis:
        |The technology sector in Silicon Valley has shown strong growth again this year.
        |TABLE: Quarterly revenue by segment
        |
        |Financial Results:
        |Q4 2023 showed strong growth in revenue and profit margin across all units.
        |FIGURE: Growth trend line
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))

    val tables = new TableStore(spark, s"$root/tables")
    val objects = new ObjectStore(spark, s"$root/bucket")
    val store = new DocumentStore(spark, tables, objects)
    val pipe = new IngestPipeline(spark, tables, objects,
      ProcessingConfig(chunker = graft.etl.ChunkerConfig(minTokens = 10)))

    val stats = pipe.ingest(inbox, now)
    println(s"Ingested: ${stats.documents} document(s), ${stats.chunks} chunks, ${stats.charts} charts")

    val doc = store.listDocuments().collect().head
    val id = doc.getAs[Long]("id")
    println(s"Document ${id}: ${doc.getAs[String]("filename")} " +
      s"(total_chunks=${doc.getAs[Int]("total_chunks")})")

    val detail = store.getDocument(id).collect().head
    val chunks = detail.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("chunks")
    println(s"Nested read: ${chunks.size} chunks in order " +
      chunks.map(_.getAs[Int]("chunk_index")).mkString("[", ",", "]"))
    println(s"First chunk entities: ${chunks.head.getAs[String]("entities")}")

    val ranged = store.getChunks(id, Some(0), Some(1)).collect()
    println(s"Range query chunks 0..1: retrieved ${ranged.length} chunks " +
      "(reference expectation: 2 — repository.py:357-362)")

    store.updateDocumentMetainfo(id, """{"department":"Finance"}""",
      Timestamp.valueOf("2026-01-15 09:00:00"))
    println("Metadata updated: " + store.documents.filter(col("id") === id)
      .collect().head.getAs[String]("metainfo"))

    val chart = store.getCharts(id).collect().head
    val img = store.getChartWithImage(id, chart.getAs[Long]("id"))
    println(s"Chart ${chart.getAs[Long]("id")}: ${img.map(_._2.length).getOrElse(0)} PNG bytes " +
      s"at ${chart.getAs[String]("image_path")}")

    store.deleteDocument(id)
    println(s"Cascade delete: documents=${store.documents.count()}, " +
      s"chunks=${store.chunks.count()}, charts=${store.charts.count()} (all 0 expected)")

    spark.stop()
  }
}
