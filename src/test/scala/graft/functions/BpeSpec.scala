package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.{TextFunctions => TF}

/** Pins the BPE primitives' greedy-merge semantics — the properties
  * that make the marked-string `replace` encoding correct BPE:
  * left-to-right non-overlapping application, and marker-delimited
  * symbol boundaries that make cross-symbol false matches impossible. */
class BpeSpec extends SparkSuite {

  import spark.implicits._

  private def symsAfter(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val m0 = Seq(word).toDF("w").select(TF.bpeMarked(col("w")).as("m"))
    val mN = merges.foldLeft(m0) { case (df, (a, b)) =>
      df.select(TF.bpeApply(col("m"), a, b).as("m"))
    }
    mN.select(TF.bpeSymbols(col("m")).as("s"))
      .collect().head.getSeq[String](0)
  }

  test("marked round-trip: a word's symbols start as its characters") {
    assert(symsAfter("abc", Nil) === Seq("a", "b", "c"))
    assert(symsAfter("a", Nil) === Seq("a"))
  }

  test("overlapping self-pair merges greedily left-to-right (canonical BPE)") {
    // "aaaa" + (a,a): non-overlapping left-to-right → (aa)(aa)
    assert(symsAfter("aaaa", Seq(("a", "a"))) === Seq("aa", "aa"))
    // "aaa": (aa) then a lone a — never the overlapping middle pair
    assert(symsAfter("aaa", Seq(("a", "a"))) === Seq("aa", "a"))
  }

  test("merges never match across symbol boundaries") {
    // after (c,a) the word is symbols [ca, b]; the text "ab" spans the
    // boundary and (a,b) must NOT fire on it
    assert(symsAfter("cab", Seq(("c", "a"), ("a", "b"))) === Seq("ca", "b"))
    // but (ca,b) on the actual symbol pair does fire
    assert(symsAfter("cab", Seq(("c", "a"), ("ca", "b"))) === Seq("cab"))
  }

  test("sequential merges compose: learned symbols merge again") {
    // (a,b) then (ab,ab): "abab" → [ab, ab] → [abab]
    assert(symsAfter("abab", Seq(("a", "b"), ("ab", "ab"))) === Seq("abab"))
  }

  test("pair exhaustion stops training with the learned prefix, encode still total") {
    // 'ab ab ab': step 1 learns (a,b); every word is then one symbol,
    // so steps 2..M find no pair — the trainer must report exactly the
    // learned prefix and the encoder the post-merge vocabulary, not
    // crash. This spec covers the Spark side only; the DuckDB mirror's
    // LEFT-JOIN no-op branch (empty b$k) is argued by fixpoint — an
    // empty p$j keeps w unchanged, so every later b$k is empty too and
    // contributes no UNION row — and was checked end-to-end against
    // this exact corpus through Verify + the DuckDB comparator
    val dir = java.nio.file.Files.createTempDirectory("graft-bpe-exhaust")
    Seq((0L, "ab ab ab", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val merges = graft.SparkEntry.queries("bpe_train_merges")(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    graft.queries.TrackedCache.releaseAll()
    assert(merges.toSeq === Seq((1L, "a", "b", "ab", 3L)))
    val vocab = graft.SparkEntry.queries("bpe_encode_tokens")(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    graft.queries.TrackedCache.releaseAll()
    assert(vocab.toSeq === Seq(("ab", 3L)))
  }
}
