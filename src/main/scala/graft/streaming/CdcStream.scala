package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.store.TableStore

/** [EXT] Continuous CDC apply: a STREAMING changefeed (upserts +
  * tombstones) maintained into a [[TableStore]] table — the Structured
  * Streaming composition of [[TableStore.mergeCdc]], and the way an
  * external system-of-record (a database's CDC tap, an upstream
  * curation service) keeps a 100 TB corpus table current without ever
  * rewriting it wholesale.
  *
  * Delivery semantics: foreachBatch is at-least-once across restarts —
  * and `mergeCdc` is IDEMPOTENT for a fixed feed (deletes of the
  * already-deleted no-op, upserts re-apply the same values), so a
  * replayed micro-batch converges instead of corrupting; the effective
  * guarantee is exactly-once STATE. The per-batch key-uniqueness
  * contract applies per micro-batch: a key changed twice inside one
  * trigger must be collapsed upstream (last-writer-wins) before it
  * reaches the sink — across triggers, later batches simply win.
  *
  * Writer fencing: the lease on `table` is acquired before the stream
  * starts and renewed every batch; a foreign live lease fails the query
  * loudly rather than interleaving swaps with another writer.
  */
object CdcStream {

  def apply(tables: TableStore, table: String,
            changefeed: DataFrame, keyCols: Seq[String],
            checkpointDir: String,
            deleteCol: String = "_deleted",
            partitionCols: Seq[String] = Nil,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    require(changefeed.isStreaming, "CdcStream needs a streaming changefeed")
    if (!tables.acquireWriterLease(table))
      throw new IllegalStateException(
        s"CDC stream refused: a live writer lease exists on '$table'")
    val spark = changefeed.sparkSession
    val query = changefeed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // per-batch renewal: a writer usurped after stalling past the
          // lease TTL fails HERE, before touching the table
          if (!tables.acquireWriterLease(table))
            throw new IllegalStateException(
              s"CDC stream lost the writer lease on '$table'")
          tables.mergeCdc(table, batch, keyCols, deleteCol, partitionCols)
        }
        ()
      }
      .start()
    // release on termination so a successor starts without the TTL wait
    val qId = query.id
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == qId) {
          try tables.releaseWriterLease(table)
          catch { case scala.util.control.NonFatal(_) => () }
          spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(listener)
    query
  }
}
