package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}
import graft.functions.{SimilarityFunctions => SF}
import graft.tables.Tables

/** Pins the two properties that make `dedup_embedding_cosine` (and the
  * banded candidate stage `sim_ivf_topk` shares) shippable at corpus
  * scale — the exact treatment `dedup_simhash_pairs` received in
  * SimhashBandBoundSpec, adapted to hyperplane LSH where blocking is
  * approximate by design (recall < 1, so the pin is no-false-POSITIVES
  * plus the candidate bound, not all-pairs equivalence):
  *
  *  1. precision — every reported pair really passes the exact cosine
  *     threshold (the verify step is sound: blocked ⊆ brute-force);
  *  2. the candidate join stays ~linear in n — rows-per-band is derived
  *     as ceil(log2(n / targetBucketSize)), so expected bucket size is
  *     a CONSTANT (~16) as n grows: doubling the corpus adds one plane
  *     per band instead of quadrupling each bucket's pair count.
  *     Measured Σ s·(s−1)/2: 16,402 at n=500 (33n) and 72,007 at
  *     n=2,000 (36n) — per-element candidate load stays flat as n
  *     grows 4×; the retired fixed-4-plane width goes quadratic (the
  *     r6 scale-killer measured ~0.5M candidates at n=2,000).
  */
class EmbBandBoundSpec extends SparkSuite {

  private val d001 = "/root/testdata/sf0.01"
  private val d01 = "/root/testdata/sf0.1"
  private val bands = 4
  private val stride = 16
  private val target = 16L

  /** Σ s·(s−1)/2 over every (band, key) bucket at a given width —
    * exactly what the band equi-join materializes before the cosine
    * verify. */
  private def candidatePairs(dir: String, rows: Int): Long =
    Tables.embeddings(spark, dir)
      .select(SF.quantize(col("embedding")).as("v"))
      .select(explode(
        SF.bandedLshKeysQ(col("v"), bands, rows, 64, stride)).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("s"))
      .agg(sum(expr("(s * (s - 1)) div 2")).as("pairs"))
      .collect().head.getLong(0)

  private def derivedRows(dir: String): Int = math.min(stride,
    SF.recommendedRowsPerBand(Tables.embeddings(spark, dir).count(), target))

  test("no false positives: every blocked pair passes the exact cosine gate") {
    val qv = Tables.embeddings(spark, d001).select(col("vec_id"),
      SF.quantize(col("embedding")).as("v")).persist()
    try {
      val cos = SF.intDot(col("a.v"), col("b.v")).cast("double") /
        (sqrt(SF.intDot(col("a.v"), col("a.v")).cast("double")) *
          sqrt(SF.intDot(col("b.v"), col("b.v")).cast("double")))
      val brute = qv.as("a").crossJoin(qv.as("b"))
        .filter(col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id"), col("b.vec_id"), cos.as("c"))
        .filter(col("c") >= 0.35)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val blocked = SparkEntry.queries("dedup_embedding_cosine")(spark, d001)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(blocked.nonEmpty, "corpus must yield at least one pair")
      assert(blocked.subsetOf(brute),
        s"pairs below the exact threshold leaked: ${blocked.diff(brute)}")
    } finally qv.unpersist()
  }

  test("derived width keeps candidate pairs ~linear in n across scale factors") {
    val (rSmall, rBig) = (derivedRows(d001), derivedRows(d01))
    assert(rBig > rSmall, s"width must widen with n ($rSmall -> $rBig)")
    val nSmall = Tables.embeddings(spark, d001).count()
    val nBig = Tables.embeddings(spark, d01).count()
    val pSmall = candidatePairs(d001, rSmall)
    val pBig = candidatePairs(d01, rBig)
    // measured 33n at n=500 and 36n at n=2,000; 128n pins "linear with
    // a bands·targetBucket-sized constant" with ~3× headroom
    assert(pSmall <= 128L * nSmall, s"$pSmall > 128n at n=$nSmall")
    assert(pBig <= 128L * nBig, s"$pBig > 128n at n=$nBig")
    // the adaptive contract itself: per-element candidate load must stay
    // ~flat as n grows. The integer-ceil width ripples expected bucket
    // size by up to 2× across power-of-two boundaries, so allow that
    // factor — fixed-width LSH would grow the load by n (4× here).
    assert(pBig * nSmall <= 2L * pSmall * nBig,
      s"pairs/n grew >2x with n: $pSmall/$nSmall -> $pBig/$nBig")
  }

  test("the retired fixed width goes quadratic where the derived width stays flat") {
    val fixed = candidatePairs(d01, 4) // the r6 parameterization's width
    val adaptive = candidatePairs(d01, derivedRows(d01))
    assert(fixed > 4L * adaptive,
      s"fixed-width pairs $fixed should dwarf adaptive $adaptive")
  }
}
