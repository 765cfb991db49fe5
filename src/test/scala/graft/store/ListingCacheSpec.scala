package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins the opt-in listing TTL cache (round 12): with pruning, a point
  * lookup plans O(matched files) — but still paid an O(#files)
  * recursive listing per query; the cache amortizes one listing per TTL
  * window. Contract: the owning instance always reads its own writes
  * (every mutation invalidates), foreign files are invisible for at
  * most the TTL, and TTL 0 (the default) disables caching entirely.
  */
class ListingCacheSpec extends AnyFunSuite with SharedSpark {

  private def withTtl[T](ms: Long)(body: => T): T = {
    spark.conf.set("spark.graft.listingCacheTtlMs", ms.toString)
    try body finally spark.conf.set("spark.graft.listingCacheTtlMs", "0")
  }

  private def mk(root: String): TableStore = {
    import spark.implicits._
    val ts = new TableStore(spark, root)
    for (b <- 0 until 3)
      ts.append("t", (b * 100L + 1 to b * 100L + 100)
        .map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    ts
  }

  test("default TTL 0: every pruned read lists live") {
    val ts = mk(tmpDir("lcache-off"))
    val before = ts.listingsPerformed.get()
    ts.readRange("t", "id", 120L, 180L).count()
    ts.readRange("t", "id", 120L, 180L).count()
    assert(ts.listingsPerformed.get() - before >= 2)
  }

  test("with a TTL, repeated reads amortize one listing and stay exact") {
    val ts = mk(tmpDir("lcache-on"))
    withTtl(60000L) {
      ts.readRange("t", "id", 120L, 180L).count() // warm
      val before = ts.listingsPerformed.get()
      for (_ <- 1 to 5)
        assert(ts.readRange("t", "id", 120L, 180L).count() == 61)
      assert(ts.listingsPerformed.get() == before,
        "repeated in-TTL reads must not re-list")
    }
  }

  test("own writes invalidate: the owner always reads its own appends") {
    import spark.implicits._
    val ts = mk(tmpDir("lcache-own"))
    withTtl(60000L) {
      assert(ts.readRange("t", "id", 301L, 400L).count() == 0) // caches
      ts.append("t", (301L to 400L).map(i => (i, s"v$i"))
        .toDF("id", "v").coalesce(1))
      assert(ts.readRange("t", "id", 301L, 400L).count() == 100,
        "an append through this instance must be visible immediately")
      // and a swap (copy-on-write delete) is too
      ts.deleteWhere("t", col("id") <= 50L)
      assert(ts.readRange("t", "id", 1L, 100L).count() == 50)
    }
  }

  test("the id allocator bypasses the cache: a foreign append is visible at once") {
    import spark.implicits._
    val root = tmpDir("lcache-maxid")
    val ts = mk(root)
    withTtl(60000L) {
      assert(ts.maxId("t", "id") == 300L) // also warms the cache entry
      // a FOREIGN writer appends higher ids inside the TTL window; the
      // next allocation must see them — a cached answer would mint
      // colliding SERIAL ids (appends are deliberately not lease-gated)
      new TableStore(spark, root).append("t",
        (301L to 350L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
      assert(ts.maxId("t", "id") == 350L,
        "maxId must list fresh, never through the TTL cache")
      // plain reads may still serve the (now refreshed-by-maxId) cache
      assert(ts.readRange("t", "id", 1L, 1000L).count() == 350)
    }
  }

  test("foreign files appear after the TTL window") {
    import spark.implicits._
    val root = tmpDir("lcache-foreign")
    val ts = mk(root)
    withTtl(300L) {
      assert(ts.readRange("t", "id", 1L, 1000L).count() == 300) // caches
      // a FOREIGN writer (separate instance) appends
      new TableStore(spark, root).append("t",
        (401L to 450L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
      Thread.sleep(400L) // past the TTL
      assert(ts.readRange("t", "id", 1L, 1000L).count() == 350,
        "foreign files must be visible once the TTL lapses")
    }
  }
}
