package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  private def onTexts[T: org.apache.spark.sql.Encoder](
      texts: Seq[String], c: org.apache.spark.sql.Column): Seq[T] =
    texts.toDF("text").select(c).as[T].collect().toSeq

  test("tokens trims, lowercases, and drops empty tokens") {
    val got = onTexts[Seq[String]](
      Seq("  Hello   World ", "", "   ", "one"), TextFunctions.tokens(col("text")))
    assert(got === Seq(Seq("hello", "world"), Seq(), Seq(), Seq("one")))
  }

  test("tokenCount is 0 for blank text (ADVICE regression)") {
    val got = onTexts[Int](Seq("", "  ", "a b c"), TextFunctions.tokenCount(col("text")))
    assert(got === Seq(0, 0, 3))
  }

  test("shingles builds word n-grams, empty below n tokens") {
    val got = onTexts[Seq[String]](Seq("a b c d", "a b"),
      TextFunctions.shingles(TextFunctions.tokens(col("text")), 3))
    assert(got === Seq(Seq("a b c", "b c d"), Seq()))
  }

  test("hash60 column form equals hash60 driver form (portability contract)") {
    val inputs = Seq("hello", "", "Zürich", "a b c", "é中文")
    val colForm = onTexts[Long](inputs, TextFunctions.hash60(col("text")))
    val drvForm = inputs.map(TextFunctions.hash60)
    assert(colForm === drvForm)
    assert(colForm.forall(_ >= 0L)) // 15 hex chars always fit positive
  }

  test("wordCount quotes regex metacharacters in the word") {
    val got = onTexts[Int](Seq("i know c++ and c"),
      TextFunctions.wordCount(col("text"), "c++"))
    assert(got === Seq(1))
  }

  test("bpeishCount counts alpha runs, digit runs, isolated punct") {
    val got = onTexts[Int](Seq("ab12 cd!"), TextFunctions.bpeishCount(col("text")))
    assert(got === Seq(4)) // ab | 12 | cd | !
  }

  test("predictedLang picks the marker-heavy language, und when no markers") {
    val got = onTexts[String](Seq(
      "the cat and the dog of it", "der hund und das haus", "xyzzy plugh"),
      TextFunctions.predictedLang(col("text")))
    assert(got === Seq("en", "de", "und"))
  }

  test("wordsCount equals the sum of per-word wordCounts") {
    val texts = Seq("the cat and the dog of it", "and of the the the", "none here")
    val words = Seq("the", "and", "of")
    val together = onTexts[Int](texts, TextFunctions.wordsCount(col("text"), words))
    val summed = words.map(w => onTexts[Int](texts, TextFunctions.wordCount(col("text"), w)))
      .transpose.map(_.sum)
    assert(together === summed)
  }

  test("stopwordRatio and qualityScore stay in [0,1]") {
    val texts = Seq("the a and of to in", "no stop words here!!!", "")
    val ratios = onTexts[Double](texts, TextFunctions.stopwordRatio(col("text")))
    val quals = onTexts[Double](texts, TextFunctions.qualityScore(col("text")))
    assert(ratios.forall(r => r >= 0.0 && r <= 1.0))
    assert(quals.forall(q => q >= 0.0 && q <= 1.0))
    assert(ratios.head === 1.0) // all six tokens are stopwords
  }

  test("contentFingerprint is order- and duplication-invariant") {
    val got = onTexts[String](
      Seq("b a a c", "c b a", "  C  B a", "different words"),
      TextFunctions.contentFingerprint(col("text")))
    assert(got(0) === got(1))
    assert(got(1) === got(2)) // case/whitespace-insensitive too
    assert(got(3) !== got(0))
  }
}
