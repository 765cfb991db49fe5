package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins zero-rewrite additive schema evolution and the append fence
  * (round 12): without them, a frame with an extra or missing column
  * writes mixed-schema files that a plain parquet read resolves from
  * one arbitrary footer — columns silently vanish from some reads. The
  * corpus-scale claim: evolving a 100 TB table is one sidecar write,
  * and every pre-evolution byte stays untouched.
  */
class SchemaEvolutionSpec extends AnyFunSuite with SharedSpark {

  private def mk(root: String): TableStore = {
    import spark.implicits._
    val ts = new TableStore(spark, root)
    for (b <- 0 until 2)
      ts.append("t", (b * 100L + 1 to b * 100L + 100)
        .map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    ts
  }

  test("appends that would fork the schema refuse loudly") {
    import spark.implicits._
    val ts = mk(tmpDir("evo-fence"))
    // extra column → refuse, naming the column and the remedy
    val extra = intercept[IllegalArgumentException] {
      ts.append("t", Seq((900L, "x", 1.5)).toDF("id", "v", "score"))
    }
    assert(extra.getMessage.contains("score") &&
      extra.getMessage.contains("evolveSchema"))
    // missing column on an UNDECLARED table → refuse (reads could not
    // null-fill it)
    val missing = intercept[IllegalArgumentException] {
      ts.append("t", Seq(Tuple1(901L)).toDF("id"))
    }
    assert(missing.getMessage.contains("v"))
    // type change → refuse
    val typed = intercept[IllegalArgumentException] {
      ts.append("t", Seq((902, "x")).toDF("id", "v")) // id INT, not BIGINT
    }
    assert(typed.getMessage.contains("type mismatch"))
    // nothing was written by any refusal
    assert(ts.read("t").count() == 200)
    // same shape in a different column order is fine (name-based)
    ts.append("t", Seq(("y", 903L)).toDF("v", "id").select("v", "id"))
    assert(ts.read("t").count() == 201)
  }

  test("evolveSchema adds columns with zero rewrite; old rows read null") {
    import spark.implicits._
    val root = tmpDir("evo-add")
    val ts = mk(root)
    val filesBefore = ts.read("t").inputFiles.toSet
    ts.evolveSchema("t", "score DOUBLE, lang STRING")
    // zero rewrite: the exact same files serve the evolved schema
    assert(ts.read("t").inputFiles.toSet == filesBefore)
    assert(ts.read("t").columns.toSeq == Seq("id", "v", "score", "lang"))
    assert(ts.read("t").filter(col("score").isNull).count() == 200)
    // post-evolution appends carry the new columns...
    ts.append("t", Seq((300L, "new", 0.9, "en")).toDF("id", "v", "score", "lang"))
    assert(ts.read("t").filter(col("lang") === "en").count() == 1)
    // ...and pre-evolution-shaped appends still work (null-filled)
    ts.append("t", Seq((301L, "old-shape")).toDF("id", "v"))
    assert(ts.read("t").count() == 202)
    assert(ts.read("t").filter(col("id") === 301L).head().isNullAt(2))
    // re-declaring an existing column refuses
    val clash = intercept[IllegalArgumentException] {
      ts.evolveSchema("t", "score INT")
    }
    assert(clash.getMessage.contains("score"))
  }

  test("merge accepts pre-evolution sources: evolved-only columns null-fill") {
    import spark.implicits._
    val root = tmpDir("evo-merge")
    val ts = mk(root)
    ts.evolveSchema("t", "lang STRING")
    // a patch batch SHAPED BEFORE the evolution (no lang column) must
    // keep applying — the evolved column null-fills, exactly as reads
    // null-fill pre-evolution files (round-12 refused here, killing any
    // long-running feed at its first post-evolution batch)
    ts.merge("t", Seq((5L, "patched"), (300L, "inserted")).toDF("id", "v"),
      Seq("id"))
    val t = ts.read("t")
    assert(t.filter(col("id") === 5L).head().getString(1) == "patched")
    assert(t.filter(col("id") === 5L).head().isNullAt(2),
      "the merged row's evolved column must read null, like an old file")
    assert(t.filter(col("id") === 300L).count() == 1)
    // a post-evolution source carrying the column still lands its values
    ts.merge("t", Seq((6L, "six", "en")).toDF("id", "v", "lang"), Seq("id"))
    assert(ts.read("t").filter(col("lang") === "en").count() == 1)
    // an ORIGINAL column missing still refuses — null-fill is scoped to
    // evolution-added columns, not caller mistakes
    val e = intercept[IllegalArgumentException] {
      ts.merge("t", Seq(Tuple1(7L)).toDF("id"), Seq("id"))
    }
    assert(e.getMessage.contains("v"))
  }

  test("evolution survives swaps, pruned reads, and sorted packing") {
    import spark.implicits._
    val root = tmpDir("evo-swap")
    val ts = mk(root)
    ts.evolveSchema("t", "score DOUBLE")
    // copy-on-write swap: the declaration (a _graft_ prop) rides across
    ts.deleteWhere("t", col("id") === 1L)
    assert(ts.read("t").columns.contains("score"))
    // pruned reads serve the evolved schema too
    val pruned = ts.readRange("t", "id", 120L, 180L)
    assert(pruned.columns.contains("score") && pruned.count() == 61)
    assert(ts.readIn("t", "id", Seq(5L, 150L)).columns.contains("score"))
    // compaction packs under the declared schema: post-pack files carry
    // the column physically and rows are intact
    ts.append("t", Seq((400L, "x", 1.0)).toDF("id", "v", "score").coalesce(1))
    ts.compactIncremental("t", smallThreshold = 10L * 1024 * 1024,
      targetBytes = 64L * 1024, sortCols = Seq("id"))
    val packed = ts.read("t")
    assert(packed.count() == 200)
    assert(packed.filter(col("score") === 1.0).count() == 1)
    assert(packed.schema.fieldNames.toSeq == Seq("id", "v", "score"))
  }
}
