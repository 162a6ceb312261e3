package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** Batch-perceptron contract: the closed-form first sweep, the
  * fixed-point on separated data, margin signs, and exactness against
  * a hand-computed example. */
class LinearClassifierSpec extends SparkSuite {

  import spark.implicits._

  private val Buckets = 256

  private def feats(docs: (Long, String)*): DataFrame =
    LinearClassifier.hashedFeatures(docs.toDF("doc_id", "text"), Buckets)

  private def lbls(ys: (Long, Long)*): DataFrame = ys.toDF("id", "y")

  // disjoint vocabularies, repeated tokens to exercise counts
  private val goodText = "alpha alpha beta gamma"
  private val badText = "omega omega omega psi"

  test("sweep 1 is Σ y·x and separates disjoint vocabularies") {
    val f = feats(1L -> goodText, 2L -> badText)
    val w = LinearClassifier.fit(f, lbls(1L -> 1L, 2L -> -1L), iters = 1)
    val m = LinearClassifier.margins(f, w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // margin_d = y_d · Σ cnt² when vocabularies are disjoint
    assert(m(1L) == 4L + 1L + 1L, s"good margin: ${m(1L)}")
    assert(m(2L) == -(9L + 1L), s"bad margin: ${m(2L)}")
  }

  test("a sweep with nothing misclassified is a fixed point") {
    val f = feats(1L -> goodText, 2L -> badText)
    val l = lbls(1L -> 1L, 2L -> -1L)
    val w1 = LinearClassifier.fit(f, l, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val w2 = LinearClassifier.fit(f, l, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(w1 == w2, s"separated data must not move the weights")
  }

  test("a misclassified document moves its buckets toward its label") {
    // two docs sharing one vocabulary, opposite labels: sweep 1 sums
    // to w=0 on the shared buckets (cnt 1 each side), every margin 0,
    // both misclassified; sweep 2 re-adds Σ y·x = 0 again — weights
    // stay 0 and both margins stay 0 (keep=false for both): the
    // irreducible-conflict case must not oscillate or blow up
    val f = feats(1L -> "tok tok2", 2L -> "tok tok2")
    val l = lbls(1L -> 1L, 2L -> -1L)
    val w2 = LinearClassifier.fit(f, l, iters = 2)
      .collect().map(r => r.getLong(1))
    assert(w2.forall(_ == 0L), s"conflicting labels must cancel: ${w2.toSeq}")
  }

  test("a token-less document is classified by the learned bias alone") {
    val f = feats(1L -> goodText, 2L -> "")
    val w = LinearClassifier.fit(f, lbls(1L -> 1L, 2L -> -1L), iters = 2)
    val m = LinearClassifier.margins(f, w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // sweep 1: bias weight = (+1) + (−1) = 0, so doc 2's margin is 0
    // → misclassified → sweep 2 adds its −1: the empty doc ends
    // negative purely through the bias
    assert(m.keySet == Set(1L, 2L))
    assert(m(2L) == -1L, s"bias-only margin: ${m(2L)}")
  }

  test("training is deterministic across runs") {
    val docs = Seq(1L -> goodText, 2L -> badText,
      3L -> "alpha omega beta psi", 4L -> "gamma gamma psi")
    val l = lbls(1L -> 1L, 2L -> -1L, 3L -> 1L, 4L -> -1L)
    def w = LinearClassifier.fit(feats(docs: _*), l, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(w.sameElements(w))
  }

  test("literal scoring is integer-identical to the join-margins path") {
    val docs = Seq(1L -> goodText, 2L -> badText,
      3L -> "alpha omega gamma psi", 4L -> "")
    val f = feats(docs: _*)
    val wf = LinearClassifier.fit(f,
      lbls(1L -> 1L, 2L -> -1L, 3L -> 1L, 4L -> -1L), iters = 2)
    val viaJoin = LinearClassifier.margins(f, wf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLit = docs.toDF("doc_id", "text")
      .select(col("doc_id"), LinearClassifier.scoreLiteral(col("text"),
        LinearClassifier.collectWeights(wf), Buckets).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLit == viaJoin, s"$viaLit vs $viaJoin")
  }

  test("literal scoring plans as a pure projection — no shuffle") {
    graft.functions.NativeExpressions.register(spark)
    val w = Map(0L -> 3L, LinearClassifier.BiasBucket -> 2L)
    val plan = Seq(1L -> "a b").toDF("doc_id", "text")
      .select(LinearClassifier.scoreLiteral(col("text"), w, 16))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  test("empty weights score to the zero margin everywhere") {
    val m = Seq(1L -> goodText).toDF("doc_id", "text")
      .select(LinearClassifier.scoreLiteral(col("text"),
        Map.empty[Long, Long], 16))
      .head().getLong(0)
    assert(m == 0L)
  }
}
