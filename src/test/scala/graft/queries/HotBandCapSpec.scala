package graft.queries

import graft.SparkSuite

/** Adversarial pin for the hot-band cap (`MaxBandMembers`): a band key
  * shared by m documents contributes m(m−1)/2 candidate pairs, so one
  * boilerplate-heavy band — near-identical template pages that survive
  * exact dedup — is the classic quadratic blowup at 100 TB. The derived
  * band width bounds the EXPECTED bucket size; the cap bounds the MAX.
  * These tests drive the shared `candidatePairs` (the single blocking
  * definition every MinHash consumer chains from) with a synthetic
  * 1k-member hot band and pin that:
  *   1. the hot band is dropped entirely (0 of its 499,500 pairs
  *      materialize) while normal bands are untouched — bounded, with
  *      recall preserved for every non-degenerate band;
  *   2. the cap is inclusive — a band at exactly `MaxBandMembers` still
  *      pairs in full (no off-by-one eating legitimate buckets);
  *   3. the worst-case candidate count from any single band is
  *      cap·(cap−1)/2, independent of the band's true size.
  */
class HotBandCapSpec extends SparkSuite {

  private val cap = PipelineQueries.MaxBandMembers

  test("a 1k-member hot band is dropped; normal bands keep full recall") {
    import spark.implicits._
    val hot = (1L to 1000L).map(i => (i, "hot"))
    val cold = Seq((2000L, "c1"), (2001L, "c1"),
      (3000L, "c2"), (3001L, "c2"), (3002L, "c2"))
    val bands = (hot ++ cold).toDF("doc_id", "band")
    val pairs = PipelineQueries.candidatePairs(bands, "lo", "hi")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // uncapped this would be 499,500 hot pairs + 4 cold pairs
    assert(pairs == Set((2000L, 2001L), (3000L, 3001L),
      (3000L, 3002L), (3001L, 3002L)),
      s"expected only the 4 cold-band pairs, got ${pairs.size}")
  }

  test("a band at exactly the cap still pairs in full (inclusive bound)") {
    import spark.implicits._
    val edge = (1L to cap.toLong).map(i => (i, "edge")).toDF("doc_id", "band")
    val n = PipelineQueries.candidatePairs(edge, "lo", "hi").count()
    assert(n == cap.toLong * (cap - 1) / 2,
      s"cap must be inclusive: expected ${cap.toLong * (cap - 1) / 2}, got $n")
  }

  test("one over the cap drops the band: worst case per band is bounded") {
    import spark.implicits._
    val over = (1L to (cap + 1).toLong).map(i => (i, "over"))
      .toDF("doc_id", "band")
    assert(PipelineQueries.candidatePairs(over, "lo", "hi").count() == 0L)
    // and therefore no single band can ever contribute more than
    // cap·(cap−1)/2 pairs regardless of its true membership
  }
}
