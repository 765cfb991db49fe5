package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins the best-effort single-writer lease (round 12): a second writer
  * refuses swaps while the lease is live, takeover works after expiry,
  * and swap RECOVERY refuses a table whose (possibly mid-swap) lease
  * belongs to a live foreign writer — the "heal a LIVE writer's
  * in-flight swap" hazard. Postgres gave the reference this for free
  * (connection-level locking, db.py:24-33); a file store has to carry
  * its own fencing.
  */
class WriterLeaseSpec extends AnyFunSuite with SharedSpark {

  private def freshTable(root: String): TableStore = {
    import spark.implicits._
    val ts = new TableStore(spark, root)
    ts.append("t", (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"))
    ts
  }

  test("a second writer's swaps refuse while the lease is live") {
    val root = tmpDir("lease-live")
    val a = freshTable(root)
    val b = new TableStore(spark, root)
    assert(a.acquireWriterLease("t"))
    assert(!b.acquireWriterLease("t"), "B must not acquire A's live lease")
    val e = intercept[IllegalStateException] {
      b.updateWhere("t", col("id") === 1L, Map("v" -> lit("x")))
    }
    assert(e.getMessage.contains("lease"))
    intercept[IllegalStateException] {
      b.deleteWhere("t", col("id") === 1L)
    }
    intercept[IllegalStateException] {
      b.overwriteAtomic("t", a.read("t"))
    }
    // the holder's own operations pass, and appends stay additive for
    // everyone (they cannot corrupt the swap protocol)
    a.updateWhere("t", col("id") === 1L, Map("v" -> lit("x")))
    assert(a.read("t").filter(col("v") === "x").count() == 1)
    b.append("t", a.read("t").limit(0))
  }

  test("the lease survives the holder's own swap") {
    val root = tmpDir("lease-swap")
    val a = freshTable(root)
    val b = new TableStore(spark, root)
    assert(a.acquireWriterLease("t"))
    a.deleteWhere("t", col("id") <= 10L) // copy-on-write swap
    assert(a.read("t").count() == 90)
    assert(!b.acquireWriterLease("t"),
      "the lease must ride the swap into the new table dir")
    // release lets the next writer in immediately
    a.releaseWriterLease("t")
    assert(b.acquireWriterLease("t"))
  }

  test("takeover works after expiry, and the loser's next swap refuses") {
    val root = tmpDir("lease-expire")
    val a = freshTable(root)
    val b = new TableStore(spark, root)
    assert(a.acquireWriterLease("t", ttlMs = 150L))
    assert(!b.acquireWriterLease("t"))
    Thread.sleep(300L)
    assert(b.acquireWriterLease("t"), "an expired lease is no lease")
    val e = intercept[IllegalStateException] {
      a.updateWhere("t", col("id") === 1L, Map("v" -> lit("y")))
    }
    assert(e.getMessage.contains("lease"),
      "the usurped writer must fail loudly, not race the new holder")
  }

  test("recovery refuses a table with a live foreign lease") {
    val root = tmpDir("lease-recover")
    val a = freshTable(root)
    val b = new TableStore(spark, root)
    assert(a.acquireWriterLease("t"))
    // fake debris next to the LIVE dir: to B this is indistinguishable
    // from A being mid-maintenance
    val f = new java.io.File(s"$root/t.old-123")
    assert(f.mkdirs())
    intercept[IllegalStateException] { b.recoverSwapDebris("t") }
    intercept[IllegalStateException] {
      b.recoverSwapDebrisScoped(Some(Set("t")))
    }
    assert(f.exists(), "refused recovery must not touch the debris")
    // the holder heals its own table
    assert(a.recoverSwapDebris("t") == SwapRecovery.CleanedUp)
    assert(!f.exists())
  }

  test("recovery sees the lease inside swap siblings when the table is absent") {
    import scala.util.control.NonFatal
    val root = tmpDir("lease-midswap")
    val a = freshTable(root)
    val b = new TableStore(spark, root)
    assert(a.acquireWriterLease("t"))
    // crash A inside the swap window: the table dir is absent and A's
    // lease rides inside the siblings — exactly the state a concurrent
    // recoverer must not "heal" while A lives
    a.failpoint = p => if (p == "old-aside") sys.error("boom")
    try a.deleteWhere("t", col("id") <= 10L)
    catch { case NonFatal(_) => () }
    a.failpoint = _ => ()
    assert(!new java.io.File(s"$root/t").exists(), "crash must be mid-window")
    intercept[IllegalStateException] { b.recoverSwapDebris("t") }
    // the owner recovers its own crash; the table is whole again either way
    val outcome = a.recoverSwapDebris("t")
    assert(outcome == SwapRecovery.RolledForward ||
      outcome == SwapRecovery.RolledBack)
    assert(a.read("t").count() == 100 || a.read("t").count() == 90)
    // and after recovery B still cannot acquire: the lease came back too
    assert(!b.acquireWriterLease("t"))
  }

  test("a missing table fences from the FIRST acquire via the pre-table lease") {
    // round-12 hole: acquire on a not-yet-existing table returned true
    // without persisting anything, so two streams starting concurrently
    // on a fresh table both passed the gate and could interleave the
    // CREATING swaps
    val root = tmpDir("lease-missing")
    val a = new TableStore(spark, root)
    val b = new TableStore(spark, root)
    assert(a.acquireWriterLease("nope"))
    assert(!b.acquireWriterLease("nope"),
      "the pre-table lease must fence a second creator immediately")
    a.releaseWriterLease("nope")
    assert(b.acquireWriterLease("nope"), "release must clear the pre-table file")
    b.releaseWriterLease("nope")
  }

  test("the pre-table lease follows the holder into the materialized table") {
    import spark.implicits._
    val root = tmpDir("lease-pre-follow")
    val a = new TableStore(spark, root)
    val b = new TableStore(spark, root)
    assert(a.acquireWriterLease("t"))
    a.append("t", (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    // renewal after materialization moves the lease in-dir; B still out
    assert(a.acquireWriterLease("t"))
    assert(!b.acquireWriterLease("t"))
    // and a clean release clears BOTH homes, letting B in
    a.releaseWriterLease("t")
    assert(b.acquireWriterLease("t"))
  }

  test("a torn lease file heals instead of wedging every writer forever") {
    // a crash between create and write (or ENOSPC mid-write) leaves an
    // empty/garbage _writer_lease: not a lease at all, so it must be
    // retirable — refusing it would lock the table with no TTL to wait
    // out (r13 review finding)
    val root = tmpDir("lease-torn")
    val a = freshTable(root)
    for (garbage <- Seq("", "not a lease at all")) {
      val p = java.nio.file.Paths.get(s"$root/t/_writer_lease")
      java.nio.file.Files.write(p, garbage.getBytes("UTF-8"))
      assert(a.acquireWriterLease("t"),
        s"an unparseable record (${garbage.length} bytes) must be retirable")
      a.releaseWriterLease("t")
    }
  }

  /** `n` racers (one TableStore instance each — separate writer ids, so
    * the per-instance lock is NOT what serializes them, exactly the two-
    * process shape) all call acquire at a latch; returns the winners.
    */
  private def race(root: String, table: String, n: Int): Seq[TableStore] = {
    val stores = Seq.fill(n)(new TableStore(spark, root))
    val start = new java.util.concurrent.CountDownLatch(1)
    val won = java.util.concurrent.ConcurrentHashMap.newKeySet[TableStore]()
    val threads = stores.map { ts =>
      new Thread(() => {
        start.await()
        if (ts.acquireWriterLease(table)) { won.add(ts); () }
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(30000L))
    import scala.jdk.CollectionConverters._
    won.asScala.toSeq
  }

  test("racing acquisition on an existing table: exactly one instance wins") {
    // the round-12 check-then-write window: two separate processes racing
    // inside it could BOTH pass the foreign-lease check and both write.
    // create-exclusive (O_EXCL on the local fs) + owner re-verify closes
    // it: of 8 simultaneous acquirers, exactly one may win
    val root = tmpDir("lease-race")
    freshTable(root)
    val winners = race(root, "t", 8)
    assert(winners.size == 1, s"expected exactly 1 winner, got ${winners.size}")
    // the winner's lease is real: everyone else refuses swaps
    val loser = new TableStore(spark, root)
    assert(!loser.acquireWriterLease("t"))
  }

  test("racing acquisition on a MISSING table: exactly one creator wins") {
    val root = tmpDir("lease-race-pre")
    val winners = race(root, "fresh", 8)
    assert(winners.size == 1, s"expected exactly 1 winner, got ${winners.size}")
  }

  test("racing TAKEOVER of an expired lease: exactly one usurper wins") {
    // the stale file is retired with an atomic rename before the
    // exclusive create — of N concurrent renamers exactly one succeeds,
    // so expired-lease takeover has the same single-winner guarantee
    val root = tmpDir("lease-race-takeover")
    val a = freshTable(root)
    assert(a.acquireWriterLease("t", ttlMs = 100L))
    Thread.sleep(250L)
    val winners = race(root, "t", 8)
    assert(winners.size == 1, s"expected exactly 1 winner, got ${winners.size}")
    // the old holder stays locked out until the new lease lapses
    assert(!a.acquireWriterLease("t"))
  }
}
