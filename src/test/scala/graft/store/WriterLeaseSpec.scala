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

  test("renewal keeps a parseable record visible at every instant (r14)") {
    // the r13 renewal was truncate-then-write: a poller landing inside
    // the truncation window read an EMPTY file, which retireLeaseFile
    // deliberately treats as retirable torn debris — a foreign writer
    // could retire the LIVE holder mid-renewal. Renewal is now a temp
    // write + atomic rename-over, so every read sees a whole record.
    val root = tmpDir("lease-renew-atomic")
    val a = freshTable(root)
    assert(a.acquireWriterLease("t"))
    val p = java.nio.file.Paths.get(s"$root/t/_writer_lease")
    @volatile var stop = false
    @volatile var torn = 0L
    @volatile var polls = 0L
    val poller = new Thread(() => {
      while (!stop) {
        try {
          val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
          if (!s.startsWith("v1\t") || s.split("\t", -1).length != 3) torn += 1
        } catch { case _: java.io.IOException => torn += 1 } // absent = torn
        polls += 1
      }
    })
    poller.start()
    try for (_ <- 1 to 500)
      assert(a.acquireWriterLease("t"), "the live holder's renewal must win")
    finally { stop = true; poller.join(10000L) }
    assert(polls > 0, "the poller must have actually observed the window")
    assert(torn == 0L,
      s"lease file read torn/absent on $torn of $polls polls mid-renewal")
    a.releaseWriterLease("t")
  }

  test("a foreign acquirer racing renewals never crowns a second owner (r14)") {
    val root = tmpDir("lease-renew-race")
    val a = freshTable(root)
    assert(a.acquireWriterLease("t"))
    val b = new TableStore(spark, root)
    @volatile var stop = false
    @volatile var bWon = false
    val thief = new Thread(() => {
      while (!stop && !bWon) if (b.acquireWriterLease("t")) bWon = true
    })
    thief.start()
    try for (_ <- 1 to 400)
      assert(a.acquireWriterLease("t"), "renewal must not lose to a racer")
    finally { stop = true; thief.join(10000L) }
    assert(!bWon, "no renewal instant may read as 'no live lease' to a racer")
    a.releaseWriterLease("t")
  }

  test("recovery cannot resurrect an expired in-dir record against a live pre-table lease (r14)") {
    import scala.util.control.NonFatal
    // the r13 hole: recoverSwapDebris restored `.old-*` wholesale —
    // including the CRASHED writer's now-expired `_writer_lease` — and
    // acquisition skipped the pre-table read whenever an in-dir record
    // parsed, so a third writer saw only the expired record and won
    // while the recovering creator's pre-table lease was still live
    val root = tmpDir("lease-recover-pre")
    val w = freshTable(root)
    assert(w.acquireWriterLease("t", ttlMs = 200L))
    w.failpoint = p => if (p == "old-aside") sys.error("boom")
    try w.deleteWhere("t", col("id") <= 10L)
    catch { case NonFatal(_) => () }
    w.failpoint = _ => ()
    assert(!new java.io.File(s"$root/t").exists(), "crash must be mid-window")
    Thread.sleep(400L) // W's lease expires inside the debris
    val b = new TableStore(spark, root)
    assert(b.acquireWriterLease("t"),
      "B acquires the pre-table lease on the mid-swap-absent table")
    val outcome = b.recoverSwapDebris("t")
    assert(outcome == SwapRecovery.RolledForward ||
      outcome == SwapRecovery.RolledBack)
    assert(new java.io.File(s"$root/t").exists())
    // fix half 1: the stale record never reappears in the restored dir
    assert(!new java.io.File(s"$root/t/_writer_lease").exists(),
      "recovery must scrub the crashed writer's expired lease record")
    // fix half 2: acquisition reads the pre-table file UNCONDITIONALLY,
    // so even a resurrected in-dir record could not hide B's live lease
    val c = new TableStore(spark, root)
    assert(!c.acquireWriterLease("t"),
      "B's live pre-table lease must fence C after recovery")
    // B's renewal migrates in-dir and keeps fencing; release lets C in
    assert(b.acquireWriterLease("t"))
    assert(!c.acquireWriterLease("t"))
    b.releaseWriterLease("t")
    assert(c.acquireWriterLease("t"))
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
