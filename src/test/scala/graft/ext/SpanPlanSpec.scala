package graft.ext
import org.scalatest.funsuite.AnyFunSuite
import graft.{SharedSpark, Tables}

/** Plan guard: the default-threshold span path must evaluate the posting
  * flatMap once (single shuffle on the gram key + the per-doc islands
  * shuffle — no join, no duplicated posting subtree).
  */
class SpanPlanSpec extends AnyFunSuite with SharedSpark {
  test("default-threshold spans run one posting pass, two exchanges, no join") {
    val df = Dedup.repeatedNgramSpans(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", n = 8)
    df.collect()
    // AQE's toString repeats the initial plan below the final one —
    // assert on the final section only
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    assert(!p.contains("Join"), p)
    assert("MapPartitions".r.findAllIn(p).size == 1, p)
  }
}
