package graft.etl

import graft.model.{DocElement, ParsedDoc, TextChunk}

/** E2/E3 — tokenizer-aware, heading-aware chunking (reference
  * pdf_parser.py:64,221: docling HybridChunker with
  * tokenizer="BAAI/bge-small-en-v1.5"; declared config overlap=0,
  * min=100, max=2000 tokens at pdf_parser.py:26-29).
  *
  * The HF wordpiece tokenizer is replaced by a whitespace token-count
  * heuristic (SURVEY §7.5 divergence — the schema/ordering semantics are
  * the contract, not tokenizer fidelity). Semantics kept from the
  * reference:
  *   - chunk ordinals are assigned in parse order, 0-based, *inside* the
  *     per-document computation (repository.py:28 `enumerate`) — no
  *     window function, no shuffle;
  *   - `serialize` re-embeds the active heading path above the chunk text
  *     ("enriched text", pdf_parser.py:190) and NER/token-count run on the
  *     serialized form (pdf_parser.py:188-199).
  *
  * Chunk boundaries: a chunk closes when adding the next block would
  * exceed maxTokens (provided it already holds >= minTokens), or when ANY
  * heading arrives while the chunk holds >= minTokens — headings are
  * section boundaries regardless of level, matching HybridChunker's
  * heading-aware splits.
  *
  * `overlap` is carried for config parity but not implemented — the
  * reference declares overlap too and never wires it through
  * (pdf_parser.py:27-29 vs :64, noted in SURVEY §6); only 0 is accepted.
  */
final case class ChunkerConfig(
    minTokens: Int = 100,
    maxTokens: Int = 2000,
    overlap: Int = 0) {
  require(overlap == 0, "chunk overlap is not implemented (reference parity)")
}

object Chunker {

  private def countTokens(s: String): Int =
    if (s == null || s.isEmpty) 0 else s.split("\\s+").length

  /** Pure per-document chunking; deterministic in element order. */
  def chunk(doc: ParsedDoc, cfg: ChunkerConfig = ChunkerConfig()): Seq[TextChunk] = {
    val headings = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    val chunks = Seq.newBuilder[TextChunk]
    val current = new StringBuilder
    var currentTokens = 0
    var idx = 0
    var headingPathAtOpen: Seq[String] = Seq.empty

    def headingPath: Seq[String] = headings.map(_._2).toSeq

    def closeChunk(): Unit = if (currentTokens > 0) {
      val text = current.toString.trim
      val serialized =
        if (headingPathAtOpen.isEmpty) text
        else headingPathAtOpen.mkString("\n") + "\n" + text
      // token_count counts the RAW chunk text (pdf_parser.py:196-198 sets
      // token_count = len(chunk.text.split())); `serialized` (heading-
      // enriched) is what NER consumes, but it is NOT what gets counted
      chunks += TextChunk(idx, text, serialized, countTokens(text))
      idx += 1
      current.clear()
      currentTokens = 0
    }

    doc.elements.foreach {
      case DocElement("heading", level, _, text, _, _) =>
        // section boundary: close a full-enough chunk before switching
        if (currentTokens >= cfg.minTokens) closeChunk()
        while (headings.nonEmpty && headings.last._1 >= level)
          headings.remove(headings.length - 1)
        headings += ((level, text))
      case DocElement("text", _, _, text, _, _) if text != null && text.nonEmpty =>
        val t = countTokens(text)
        if (currentTokens > 0 && currentTokens + t > cfg.maxTokens &&
          currentTokens >= cfg.minTokens) closeChunk()
        if (currentTokens == 0) headingPathAtOpen = headingPath
        if (current.nonEmpty) current.append("\n")
        current.append(text)
        currentTokens += t
      case _ => // tables/pictures don't contribute chunk text
    }
    closeChunk()
    chunks.result()
  }
}
