package graft.queries

import graft.SparkSuite

/** Pins that the driver-side BPE merge loop (the under-vocab-bound
  * fast path) and the distributed loop learn IDENTICAL rules and
  * produce the IDENTICAL merged word table — the same contract KMeans'
  * literal-vs-join assignment test pins: path choice is a cost
  * decision, never a semantics decision. */
class BpeTrainPathSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("driver-side and distributed BPE trainers agree exactly") {
    val wf0 = CurationQueries.bpeWordTable(spark, d)
    try {
      val (wfL, rulesL) = CurationQueries.bpeTrainLocal(spark, wf0)
      val (wfD, rulesD) = CurationQueries.bpeTrainDistributed(wf0)
      assert(rulesL === rulesD)
      assert(rulesL.nonEmpty, "corpus must yield at least one merge")
      val tblL = wfL.collect().map(r => (r.getString(0), r.getLong(1))).sorted
      val tblD = wfD.collect().map(r => (r.getString(0), r.getLong(1))).sorted
      assert(tblL === tblD)
    } finally TrackedCache.releaseAll()
  }
}
