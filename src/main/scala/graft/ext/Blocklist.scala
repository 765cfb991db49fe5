package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Large-blocklist phrase matching (Aho & Corasick, "Efficient
  * String Matching: An Aid to Bibliographic Search", CACM 1975) — the
  * operator behind blocklist filtering, contamination phrase screens,
  * and brand/PII term audits once the list outgrows what a regex
  * alternation survives: matching a 100k-phrase list per document is
  * O(chars + matches) against the automaton, vs O(chars × phrases) for
  * per-phrase scans (what a naive `contains` loop or an alternation
  * that RE2/Java regex compiles into effectively costs at this shape).
  *
  * Semantics: every OVERLAPPING occurrence of every phrase counts, as
  * cross-phrase substring containment does ("scan" inside "table scan"
  * reports both) — blocklist screens want the superset; dedupe at the
  * policy layer if a policy wants maximal matches only.
  *
  * Scale story: the automaton builds once on the DRIVER in O(total
  * phrase chars) and ships as ONE broadcast (it is the model, like a
  * vocabulary or centroid table); matching is a zero-shuffle scalar
  * pass, embarrassingly parallel with the scan.
  */
object Blocklist {

  /** Immutable, serializable Aho-Corasick automaton. Node 0 is the root;
    * goto edges live in ONE flat CSR layout (r18): `edgeOff(n)` to
    * `edgeOff(n+1)` bounds node n's slice of the global sorted
    * `edgeChars`/`edgeNext` arrays (binary searched — primitive
    * compares, no per-character boxing or hash probes), and phrase
    * endings likewise slice a flat `endPhrase` array. Flat beats
    * per-node `Array[Array[_]]` at the million-phrase tier where the
    * broadcast cost is object count, not payload: measured at 1M
    * phrases (~4.4M nodes), the nested layout serialized 157 MB in
    * 6.4 s; CSR is 89 MB in 0.3 s (21x) and deserializes on each
    * executor proportionally faster — same hot loop. The measurement
    * is pinned in BlocklistSpec's million-phrase case.
    *
    * Fail links and match outputs are BFS-precomputed. `outCount(n)`
    * aggregates the phrase-endings reachable from n through the whole
    * fail chain, so the hot loop adds one int per position; per-phrase
    * attribution walks `outLink` chains only at actual match sites
    * (O(matches)).
    */
  final class Automaton private[Blocklist] (
      edgeOff: Array[Int],   // CSR node bounds into the edge arrays (n+1)
      edgeChars: Array[Char], // sorted transition chars, all nodes
      edgeNext: Array[Int],   // parallel next-state ids
      val fail: Array[Int],
      endOff: Array[Int],     // CSR node bounds into endPhrase (n+1)
      endPhrase: Array[Int],  // phrase ids ending exactly at each node
      val outCount: Array[Int], // endings through the fail chain
      val outLink: Array[Int],  // nearest fail-ancestor with endings
      val phraseLen: Array[Int], // code-unit length per phrase id
      val nPhrases: Int) extends Serializable {

    def nodeCount: Int = edgeOff.length - 1
    def edgeCount: Int = edgeChars.length

    @inline private def hasEnds(state: Int): Boolean =
      endOff(state + 1) > endOff(state)

    /** Transition lookup: binary search of the node's CSR edge slice;
      * -1 when the node has no edge on c.
      */
    private def next(state: Int, c: Char): Int = {
      var lo = edgeOff(state)
      var hi = edgeOff(state + 1) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val v = edgeChars(mid)
        if (v == c) return edgeNext(mid)
        else if (v < c) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    private def step(state: Int, c: Char): Int = {
      var s = state
      var n = next(s, c)
      while (s != 0 && n < 0) { s = fail(s); n = next(s, c) }
      if (n < 0) 0 else n
    }

    /** (total overlapping occurrences, distinct phrase ids hit). */
    def matchStats(text: String): (Long, java.util.BitSet) = {
      val hit = new java.util.BitSet(nPhrases)
      var total = 0L
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        if (outCount(s) > 0) {
          total += outCount(s)
          var o = if (hasEnds(s)) s else outLink(s)
          while (o != 0) {
            var j = endOff(o)
            while (j < endOff(o + 1)) { hit.set(endPhrase(j)); j += 1 }
            o = outLink(o)
          }
        }
        i += 1
      }
      (total, hit)
    }

    /** Merged character intervals covered by ANY phrase occurrence:
      * half-open `[start, end)`, overlapping/adjacent-nested matches
      * coalesced — the redaction geometry. O(chars + matches) like
      * [[matchStats]]; the merge is a single backward-extend pass over
      * matches, which arrive in nondecreasing END order.
      */
    def matchIntervals(text: String): Array[(Int, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        if (outCount(s) > 0) {
          // longest phrase ending here defines the widest new interval
          var minStart = Int.MaxValue
          var o = if (hasEnds(s)) s else outLink(s)
          while (o != 0) {
            var j = endOff(o)
            while (j < endOff(o + 1)) {
              val st = i + 1 - phraseLen(endPhrase(j))
              if (st < minStart) minStart = st
              j += 1
            }
            o = outLink(o)
          }
          // a long phrase ending late can reach back across SEVERAL
          // earlier intervals — pop and absorb every one it touches
          // (overlap or abut), then push the union
          var curS = minStart
          var curE = i + 1
          while (out.nonEmpty && out.last._2 >= curS) {
            val (ps, pe) = out.remove(out.length - 1)
            curS = math.min(ps, curS)
            curE = math.max(pe, curE)
          }
          out += ((curS, curE))
        }
        i += 1
      }
      out.toArray
    }

    /** First-match short circuit for pure filtering. */
    def containsAny(text: String): Boolean = {
      var s = 0
      var i = 0
      while (i < text.length) {
        s = step(s, text.charAt(i))
        if (outCount(s) > 0) return true
        i += 1
      }
      false
    }
  }

  /** Build the automaton on the driver: trie insert + BFS fail links.
    * Duplicate phrases are deduplicated (distinct-phrase semantics:
    * listing a phrase twice must not double-count its occurrences —
    * phrase ids index the DISTINCT list).
    */
  def automaton(phrases: Seq[String]): Automaton = {
    require(phrases.nonEmpty, "empty blocklist")
    phrases.zipWithIndex.foreach { case (p, i) =>
      require(p != null && p.nonEmpty, s"blocklist phrase $i is null/empty")
    }
    val ps = phrases.distinct
    val goto_ = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    ps.zipWithIndex.foreach { case (p, pi) =>
      var s = 0
      p.foreach { c =>
        s = goto_(s).getOrElseUpdate(c, {
          goto_ += scala.collection.mutable.HashMap.empty[Char, Int]
          ends += Nil
          goto_.length - 1
        })
      }
      ends(s) = pi :: ends(s)
    }
    val n = goto_.length
    val fail = new Array[Int](n)
    val outCount = new Array[Int](n)
    val outLink = new Array[Int](n)
    val queue = scala.collection.mutable.Queue.empty[Int]
    goto_(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      outCount(u) = ends(u).size + outCount(fail(u))
      outLink(u) = if (ends(fail(u)).nonEmpty) fail(u) else outLink(fail(u))
      goto_(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !goto_(f).contains(c)) f = fail(f)
        fail(v) = if (goto_(f).contains(c) && goto_(f)(c) != v) goto_(f)(c) else 0
        queue += v
      }
    }
    // freeze the trie into ONE flat CSR edge layout (r18): a single
    // char array + next array + node offsets — object count no longer
    // scales with nodes, which is what bounds broadcast serialization
    // at the million-phrase tier (see the Automaton doc's measurement)
    val edgeOff = new Array[Int](n + 1)
    var u = 0
    while (u < n) { edgeOff(u + 1) = edgeOff(u) + goto_(u).size; u += 1 }
    val edgeChars = new Array[Char](edgeOff(n))
    val edgeNext = new Array[Int](edgeOff(n))
    u = 0
    while (u < n) {
      val edges = goto_(u).toArray.sortBy(_._1)
      var k = 0
      while (k < edges.length) {
        edgeChars(edgeOff(u) + k) = edges(k)._1
        edgeNext(edgeOff(u) + k) = edges(k)._2
        k += 1
      }
      u += 1
    }
    val endOff = new Array[Int](n + 1)
    u = 0
    while (u < n) { endOff(u + 1) = endOff(u) + ends(u).size; u += 1 }
    val endPhrase = new Array[Int](endOff(n))
    u = 0
    while (u < n) {
      val sorted = ends(u).toArray.sorted
      var k = 0
      while (k < sorted.length) { endPhrase(endOff(u) + k) = sorted(k); k += 1 }
      u += 1
    }
    new Automaton(edgeOff, edgeChars, edgeNext, fail, endOff, endPhrase,
      outCount, outLink, ps.map(_.length).toArray, ps.length)
  }

  /** Per-document match census against the blocklist: one broadcast, one
    * zero-shuffle scalar pass.
    *
    * @return (idCol, n_matches, n_phrases) — total overlapping
    *         occurrences and distinct phrases hit
    */
  def matchCounts(docs: DataFrame, idCol: String, textCol: String,
                  phrases: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(automaton(phrases))
    docs.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        val ac = bc.value
        it.map { case (id, text) =>
          val (total, hit) = ac.matchStats(text)
          (id, total, hit.cardinality().toLong)
        }
      }
      .toDF(idCol, "n_matches", "n_phrases")
  }

  /** Merged match spans per document: one row per maximal covered
    * character interval `[span_start, span_end)` — the redaction
    * geometry, as data (audit trails, span-level policy decisions).
    */
  def matchSpans(docs: DataFrame, idCol: String, textCol: String,
                 phrases: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(automaton(phrases))
    docs.select(col(idCol).cast("long"), col(textCol))
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .as[(Long, String)]
      .mapPartitions { it =>
        val ac = bc.value
        it.flatMap { case (id, text) =>
          ac.matchIntervals(text).iterator.map { case (s, e) =>
            (id, s.toLong, e.toLong)
          }
        }
      }
      .toDF(idCol, "span_start", "span_end")
  }

  /** Length-preserving redaction: every covered character masked, the
    * rest byte-identical — downstream token/offset arithmetic (chunk
    * boundaries, span labels) survives the scrub. One broadcast, one
    * zero-shuffle pass.
    */
  def redact(docs: DataFrame, textCol: String, phrases: Seq[String],
             mask: Char = '*'): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(automaton(phrases))
    val fn = udf { text: String =>
      if (text == null) null
      else {
        val iv = bc.value.matchIntervals(text)
        if (iv.isEmpty) text
        else {
          val cs = text.toCharArray
          iv.foreach { case (s, e) =>
            var i = s
            while (i < e) { cs(i) = mask; i += 1 }
          }
          new String(cs)
        }
      }
    }
    docs.withColumn(textCol, fn(col(textCol)))
  }

  /** Documents with zero blocklist hits — the filter a curation pipeline
    * composes; first match short-circuits the row. The predicate is a
    * single-column UDF (not a Row lambda), so the stage stays inside
    * codegen and column pruning survives: only `textCol` is materialized
    * for the check, whatever width the document rows carry.
    */
  def filterClean(docs: DataFrame, textCol: String,
                  phrases: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(automaton(phrases))
    // the UDF must be null-safe on its own: Spark does not guarantee
    // boolean short-circuit order in WHERE clauses, so the isNotNull
    // conjunct (kept for pushdown/pruning) may evaluate AFTER the UDF
    val dirty = udf { text: String =>
      text != null && bc.value.containsAny(text)
    }
    docs.filter(col(textCol).isNotNull && !dirty(col(textCol)))
  }
}
