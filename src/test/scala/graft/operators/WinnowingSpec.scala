package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** The winnowing contract (Schleimer et al. 2003): selection density,
  * the detection guarantee, and the pair search's heavy-hitter cut. */
class WinnowingSpec extends SparkSuite {

  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def fps(rows: (Long, String)*): DataFrame =
    Winnowing.fingerprints(docs(rows: _*))

  // distinct tokens that share no 3-gram unless the run is shared
  private def run(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("guarantee: a shared run of W+K-1 tokens shares a fingerprint") {
    val shared = run("s", Winnowing.W + Winnowing.K - 1) // 10 tokens
    val f = fps(
      1L -> s"${run("a", 40)} $shared ${run("b", 40)}",
      2L -> s"${run("c", 40)} $shared ${run("d", 40)}")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val f1 = f.collect { case (1L, h) => h }.toSet
    val f2 = f.collect { case (2L, h) => h }.toSet
    assert((f1 & f2).nonEmpty,
      s"winnowing guarantee violated: no shared fingerprint")
  }

  test("disjoint texts share no fingerprint") {
    val f = fps(1L -> run("a", 60), 2L -> run("b", 60))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val f1 = f.collect { case (1L, h) => h }.toSet
    val f2 = f.collect { case (2L, h) => h }.toSet
    assert((f1 & f2).isEmpty)
  }

  test("identical documents select identical fingerprint sets") {
    val t = run("x", 50)
    val f = fps(1L -> t, 2L -> t)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(f.collect { case (1L, h) => h }.toSet ==
      f.collect { case (2L, h) => h }.toSet)
  }

  test("density: a document selects far fewer fingerprints than grams") {
    val n = 200
    val m = n - Winnowing.K + 1 // grams
    val cnt = fps(1L -> run("t", n)).count()
    assert(cnt >= 1 && cnt < m / 2,
      s"expected sparse selection, got $cnt of $m grams")
  }

  test("short documents: < K tokens none, >= K tokens at least one") {
    val f = fps(
      1L -> "a b",                      // 2 tokens < K
      2L -> "a b c",                    // exactly one gram
      3L -> run("z", Winnowing.W / 2))  // grams < W: clamped window
      .collect().map(r => r.getLong(0))
    assert(!f.contains(1L))
    assert(f.count(_ == 2L) == 1)
    assert(f.count(_ == 3L) >= 1)
  }

  test("sharedPairs finds the overlap and respects minShared") {
    val shared = run("s", 30) // long overlap: many shared fingerprints
    val f = fps(
      1L -> s"${run("a", 30)} $shared",
      2L -> s"$shared ${run("b", 30)}",
      3L -> run("c", 60))
    val pairs = Winnowing.sharedPairs(f, maxDf = 10L, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("the df cut drops corpus-wide boilerplate fingerprints") {
    // six identical docs: every fingerprint has df exactly 6, so the
    // cut at 5 drops them all and the cut at 6 keeps every pair
    val rows = (1L to 6L).map(i => i -> run("bp", 40))
    val f = fps(rows: _*)
    val strict = Winnowing.sharedPairs(f, maxDf = 5L, minShared = 1L).count()
    val loose = Winnowing.sharedPairs(f, maxDf = 6L, minShared = 1L).count()
    assert(strict == 0L, s"df-cut pairs should be empty, got $strict")
    assert(loose == 15L, s"all-pairs from shared boilerplate, got $loose")
  }

  test("fingerprints are deterministic across runs") {
    val rows = Seq(1L -> run("p", 80), 2L -> run("q", 25))
    val a = fps(rows: _*).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = fps(rows: _*).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
  }
}
