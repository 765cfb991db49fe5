package graft.model

import java.sql.Timestamp

/** Data model mirroring the reference's three-table star (schema.py:11-57)
  * plus the parse-stage IR. Spark type mapping per SURVEY.md §1.2: SERIAL
  * ints become Longs, JSON columns stay JSON strings (preserving the
  * reference's schemalessness — repository.py:235-260 proves the column is
  * truly dynamic), timestamps are UTC with Jakarta rendering left to the
  * presentation edge.
  */

/** `documents` row (schema.py:26-44). `total_chunks` is the write-time
  * denormalized child count (repository.py:22).
  */
final case class DocumentRow(
    id: Long,
    filename: String,
    total_chunks: Int,
    metainfo: String,
    created_at: Timestamp,
    updated_at: Timestamp)

/** `document_chunks` row (schema.py:11-24). `entities` carries the NER
  * JSON (pdf_parser.py:89-107 shape), `chunk_metadata` the token count
  * (pdf_parser.py:196-198).
  */
final case class ChunkRow(
    id: Long,
    document_id: Long,
    chunk_index: Int,
    text_content: String,
    entities: String,
    chunk_metadata: String,
    created_at: Timestamp)

/** `chart_data` row (schema.py:46-57). `image_path` is the object-store
  * key `documents/{doc}/charts/{chart}.png` (minio.py:46).
  */
final case class ChartRow(
    id: Long,
    document_id: Long,
    info: String,
    image_path: String,
    created_at: Timestamp)

/** One layout element of a parsed document, in reading order — the shape
  * docling's element stream exposes (pdf_parser.py:130-186): headings,
  * text blocks, tables, pictures, with optional caption and outline level.
  * `imagePng` carries a real rasterization of the element's page when the
  * parser can render one (docling rasterizes at 2x, pdf_parser.py:30,76;
  * the PDFBox adapter fills it via PDFRenderer) — null otherwise, and the
  * downstream chart extractor substitutes its deterministic placeholder.
  */
final case class DocElement(
    elemType: String, // "heading" | "text" | "table" | "picture"
    level: Int,
    caption: String,
    text: String,
    page: Int,
    imagePng: Array[Byte] = null)

/** Parse-stage IR: one converted document (pdf_parser.py:219 IR).
  * `contentSha` is the sha-256 hex of the raw bytes — the [EXT] dedup key
  * (matches Spark's sha2(content, 256) output format).
  */
final case class ParsedDoc(
    path: String,
    filename: String,
    pageCount: Int,
    fileSize: Long,
    contentSha: String,
    elements: Seq[DocElement])

/** One chunk produced by the tokenizer-aware chunker (pdf_parser.py:221):
  * `serialized` is the heading-context-enriched text the reference gets
  * from `chunker.serialize` (pdf_parser.py:190).
  */
final case class TextChunk(
    chunkIndex: Int,
    text: String,
    serialized: String,
    tokenCount: Int)

/** spaCy-shaped NER output (pdf_parser.py:89-95,107): four fixed buckets
  * plus `misc` carrying (text, label) for everything else.
  */
final case class MiscEntity(text: String, label: String)
final case class Entities(
    persons: Seq[String],
    organizations: Seq[String],
    dates: Seq[String],
    locations: Seq[String],
    misc: Seq[MiscEntity])

/** Chart payload prior to id assignment (pdf_parser.py:152-180 info dict +
  * rendered PNG bytes).
  */
final case class ChartPayload(
    docPath: String,
    chartType: String, // "table" | "figure"
    typeIndex: Int,    // W2 per-type counter within the document
    level: Int,
    caption: String,   // null when absent (hasattr guard pdf_parser.py:158)
    png: Array[Byte])
