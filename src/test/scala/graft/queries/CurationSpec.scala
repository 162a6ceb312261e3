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

  test("lm_novelty_filter drops gibberish, keeps supported and sub-bigram docs") {
    // the sf corpora exercise the gate only at the margin (novelty
    // 0–9%); this crafted corpus pins both branches squarely: three
    // mutually-supporting docs (every bigram df=3 → 0% novel), one
    // gibberish doc (every bigram df=1 → 100% novel → dropped), one
    // sub-bigram doc (0 bigrams → vacuously kept)
    val dir = java.nio.file.Files.createTempDirectory("graft-lm-crafted")
    Seq((0L, "the cat sat on the mat"), (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the mat"), (3L, "zxqv wkjh qpmz nvbt lkjd"),
      (4L, "hi"))
      .map { case (i, t) => (i, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("lm_novelty_filter")(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    TrackedCache.releaseAll()
    assert(got.toSeq === Seq((0L, 5L, 0L, true), (1L, 5L, 0L, true),
      (2L, 5L, 0L, true), (3L, 4L, 4L, false), (4L, 0L, 0L, true)))
  }

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

  test("temperatureBySource damps a skewed source to ~sqrt(mn/n), not mn/n") {
    // big: 100 docs, small: 10 → temperature keep rate sqrt(10/100) ≈ 32%,
    // vs the balanced mix's 10%
    val docs = ((0L until 100L).map(i => (i, "big")) ++
      (100L until 110L).map(i => (i, "small")))
      .toDF("doc_id", "source")

    val got = CurationQueries.temperatureBySource(docs)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // replay the squared gate driver-side: g²·n < mn·10¹²
    def kept(ids: Range, nSrc: Long): Long = ids.count { i =>
      val g = BigInt(TextFunctions.hash60(s"sqrt:$i") % 1000000L)
      g * g * nSrc < BigInt(10L) * BigInt("1000000000000")
    }.toLong
    val expectedBig = kept(0 until 100, 100L)
    assert(got === Map("big" -> ((100L, expectedBig)), "small" -> ((10L, 10L))))
    // flattened, not truncated: well above the balanced 10%, below 50%
    assert(expectedBig > 15L && expectedBig < 50L,
      s"sqrt damping should keep ~32 of 100, got $expectedBig")
  }

  test("targetMixBySource keeps everything in the limiting source and tracks weights elsewhere") {
    val docs = ((0L until 100L).map(i => (i, "big")) ++
      (100L until 110L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val wOf = (s: String) => TextFunctions.hash60(s"w:$s") % 4L + 1L
    val (wBig, wSmall) = (wOf("big"), wOf("small"))
    // limiting source = argmin n/w, ratio ties to the lower source
    // NAME ("big" < "small"); replay the cross-multiplied gate
    // driver-side: (h%10⁶)·w_lim·n < w·n_lim·10⁶
    val limIsSmall = BigInt(10) * wBig < BigInt(100) * wSmall
    val (nLim, wLim) = if (limIsSmall) (10L, wSmall) else (100L, wBig)
    def kept(ids: Range, nSrc: Long, w: Long): Long = ids.count { i =>
      BigInt(TextFunctions.hash60(s"mix:$i") % 1000000L) * wLim * nSrc <
        BigInt(w) * nLim * 1000000L
    }.toLong
    val got = CurationQueries.targetMixBySource(docs)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      "big" -> ((100L, wBig, kept(0 until 100, 100L, wBig))),
      "small" -> ((10L, wSmall, kept(100 until 110, 10L, wSmall)))))
    // the limiting source's gate is rate 1 — it keeps every doc
    if (limIsSmall) assert(got("small")._3 === 10L)
    else assert(got("big")._3 === 100L)
  }
}
