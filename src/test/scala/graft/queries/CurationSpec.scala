package graft.queries

import graft.SparkSuite
import graft.functions.TextFunctions

/** Pins the non-trivial path of the mixture rebalancer: the testdata
  * corpus has near-uniform sources, where every keep-rate is 1 and the
  * oracle comparison cannot catch a wrong gate — so the skewed case is
  * pinned here against the driver-side hash (the same md5 contract the
  * Column-side gate compiles to). */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  test("balancedBySource downsamples a skewed source to the smallest source's rate") {
    // source "big": ids 0..99, source "small": ids 100..109 → mn = 10
    val docs = ((0L until 100L).map(i => (i, "big")) ++
      (100L until 110L).map(i => (i, "small")))
      .toDF("doc_id", "source")

    val got = CurationQueries.balancedBySource(docs)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // the gate is a pure function of the row — replay it driver-side
    def kept(ids: Range, nSrc: Long): Long = ids.count { i =>
      (TextFunctions.hash60(s"bal:$i") % 1000000L) * nSrc < 10L * 1000000L
    }.toLong
    val expectedBig = kept(0 until 100, 100L)
    assert(got === Map("big" -> ((100L, expectedBig)), "small" -> ((10L, 10L))))

    // the skewed source is actually downsampled (rate 1/10 ± hash noise),
    // the smallest source keeps everything
    assert(expectedBig < 30L && expectedBig > 0L)
  }
}
