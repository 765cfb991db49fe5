package graft.probes

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.Tables
import graft.etl.Ner
import graft.pipeline.{IngestPipeline, ProcessingConfig}
import graft.serve.DocumentStore
import graft.store.{ObjectStore, TableStore}

/** Probes driving the document-ETL pipeline (SURVEY §2.9/§2.12) through
  * the driver surface. The ETL operators are not SQL-expressible (chunker/
  * NER/render semantics live in Scala), so these are rows-only probes; the
  * fine-grained semantics are pinned by ScalaTest (ChunkerSpec, NerSpec,
  * IngestDocStoreSpec).
  *
  * Input documents are synthesized deterministically from the testdata
  * `documents` table (text → binary payload), so the whole E1→E8 path runs
  * distributed without touching external fixtures.
  */
object EtlProbes {

  private val fixedNow = Timestamp.valueOf("2026-01-15 08:30:00")

  private def scratchDir(): String = Probe.scratchDir("graft-etl-probe")

  val all: Seq[Probe] = Seq(

    // E1→E2→E4→E7→S10→E5→S11→S12 end-to-end, then the §2.12 listing.
    // Fully oracled (round 6): each synthesized doc is one heading + one
    // single-line text block + one table marker, so the oracle re-derives
    // the whole listing in closed form — 1 chunk (one atomic text element
    // under max_tokens), 1 chart (the table), and metainfo rebuilt
    // byte-for-byte (page_count 1: no form feeds; file_size = payload
    // octet length; fixed clock; content_sha via DuckDB's sha256 over the
    // same payload bytes Spark hashes).
    Probe(
      "etl_ingest_pipeline",
      "WITH sel AS (SELECT doc_id, 'Section heading:' || chr(10) || text || chr(10) || 'TABLE: totals by source' || chr(10) AS content " +
        "FROM documents WHERE doc_id < 50) " +
        "SELECT 'doc_' || doc_id || '.pdf' AS filename, 1 AS total_chunks, " +
        "'{\"page_count\":1,\"file_size\":' || octet_length(encode(content)) || " +
        "',\"extraction_date\":\"2026-01-15 08:30:00\",\"content_sha\":\"' || sha256(content) || '\"}' AS metainfo, " +
        "1 AS n_charts FROM sel ORDER BY filename"
    ) { (s, d) =>
      import s.implicits._
      // binary payloads with a heading + table marker so every stage of the
      // parse (headings, text blocks, table elements) is exercised;
      // doc_id < 50 (not limit) so the input set is order-independent
      val bin = Tables.load(s, d, "documents").filter(col("doc_id") < 50)
        .select(
          format_string("memory://doc_%d.pdf", col("doc_id")).as("path"),
          encode(concat(
            lit("Section heading:\n"), col("text"),
            lit("\nTABLE: totals by source\n")), "utf-8").as("content"))
      // unique per-run scratch root: a fixed path would let concurrent
      // probe runs delete each other's live stores mid-write. The returned
      // DataFrame reads from it lazily, so cleanup is deferred to JVM exit.
      val root = scratchDir()
      val tables = new TableStore(s, s"$root/tables")
      val objects = new ObjectStore(s, s"$root/bucket")
      // ingest sub-phases flow into the bench's phases map; the remaining
      // time of this probe (total − phases) is the read-back listing
      new IngestPipeline(s, tables, objects, ProcessingConfig(),
        onPhase = PhaseTimer.record("etl_ingest_pipeline", _, _))
        .ingestBinary(bin, fixedNow)
      val store = new DocumentStore(s, tables, objects)
      // listing joined with per-doc chart counts + rendered PNG bytes so
      // the probe output witnesses the whole E5/E6/S11 path too
      val chartStats = store.charts.groupBy("document_id")
        .agg(count(lit(1)).as("n_charts"))
      store.listDocuments(0, 100)
        .join(chartStats, col("id") === col("document_id"), "left_outer")
        .select(col("filename"), col("total_chunks"), col("metainfo"),
          coalesce(col("n_charts"), lit(0L)).as("n_charts"))
        .orderBy("filename")
    },

    // E4/A2 — distributed NER bucketing over a deterministic entity-bearing
    // text derived from the corpus. The synthesized preamble varies the
    // location and date with doc_id (the corpus body is lowercase and
    // contributes no entities), so the oracle derives each row's expected
    // 5-bucket JSON in closed form — a per-row, data-dependent check of
    // the extraction rules and the bucketing shape.
    Probe(
      "etl_ner_bucketing",
      """SELECT doc_id, '{"persons":["Ada Byron"],"organizations":["TechCorp Inc"],"dates":["2024-02-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') || '"],"locations":["' || ['London', 'Tokyo', 'Berlin'][CAST(doc_id % 3 AS INT) + 1] || '"],"misc":[{"text":"Report","label":"MISC"}]}' AS entities FROM documents ORDER BY doc_id"""
    ) { (s, d) =>
      import s.implicits._
      Tables.load(s, d, "documents")
        .select(col("doc_id"),
          concat(lit("Report by TechCorp Inc with Dr. Ada Byron in "),
            element_at(array(lit("London"), lit("Tokyo"), lit("Berlin")),
              pmod(col("doc_id"), lit(3)).cast("int") + 1),
            lit(" on 2024-02-"),
            lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0"),
            lit(". "), col("text")).as("t"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, t) => (id, Ner.extract(t)) })
        .toDF("doc_id", "entities")
        .select(col("doc_id"), to_json(col("entities")).as("entities"))
        .repartition(1).sortWithinPartitions("doc_id")
    }
  )
}
