package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** Nearest-centroid (Rocchio) contract: ratio featurization
  * invariants, floor-mean training on a hand-computed example,
  * deterministic tie-breaking, and end-to-end separation on
  * disjoint-vocabulary classes. */
class NearestCentroidSpec extends SparkSuite {
  import spark.implicits._

  private val Buckets = 16

  private def vdf(rows: (Long, Seq[Long])*) = rows.toDF("id", "v")
  private def ldf(rows: (Long, Int)*) = rows.toDF("id", "y")

  test("ratioVectors: dim, count slot, per-mille mass, zero-token doc") {
    val docs = Seq(
      1L -> "alpha alpha beta gamma",
      2L -> "omega",
      3L -> "   ").toDF("doc_id", "text")
    val vs = NearestCentroid.ratioVectors(docs, Buckets)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(vs.keySet === Set(1L, 2L, 3L))
    assert(vs.values.forall(_.size == Buckets + 1))
    // the count slot is the raw token count
    assert(vs(1L).last === 4L && vs(2L).last === 1L && vs(3L).last === 0L)
    // ratio slots carry floor(1000·cnt/tot) per distinct token's bucket:
    // doc 1 = {2,1,1}/4 → per-mille {500,250,250} (some buckets may merge)
    assert(vs(1L).dropRight(1).sum === 1000L)
    assert(vs(1L).dropRight(1).filter(_ > 0).sorted.reverse.head === 500L)
    assert(vs(2L).dropRight(1).sum === 1000L)
    assert(vs(3L).forall(_ === 0L))
  }

  test("fit is the per-class floor mean over the FULL class size") {
    val vecs = vdf(
      0L -> Seq(1L, 10L), 1L -> Seq(2L, 0L), 2L -> Seq(4L, 5L),
      3L -> Seq(100L, 7L))
    val cents = NearestCentroid.fit(vecs,
      ldf(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 1))
    assert(cents.map(_.id) === Seq(0L, 1L))
    // floor((1+2+4)/3) = 2, floor((10+0+5)/3) = 5
    assert(cents(0).v === Seq(2L, 5L))
    assert(cents(1).v === Seq(100L, 7L))
  }

  test("predict is argmin d² with ties to the lower class id") {
    val cents = Seq(
      KMeans.Centroid(0L, Seq(0L, 0L)),
      KMeans.Centroid(1L, Seq(4L, 0L)),
      KMeans.Centroid(2L, Seq(10L, 10L)))
    val preds = NearestCentroid.predict(
      vdf(7L -> Seq(2L, 0L), 8L -> Seq(9L, 9L), 9L -> Seq(1L, 0L)),
      cents).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // id 7 is equidistant (d²=4) from classes 0 and 1 → lower wins
    assert(preds === Map(7L -> 0, 8L -> 2, 9L -> 0))
  }

  test("separates disjoint-vocabulary classes end to end") {
    val docs = (0L until 12L).map { i =>
      val text = if (i % 3 == 0) "alpha beta alpha gamma"
      else if (i % 3 == 1) "delta epsilon delta zeta"
      else "omega psi omega chi"
      (i, text)
    }.toDF("doc_id", "text")
    val vecs = NearestCentroid.ratioVectors(docs, Buckets)
    val labels = docs.select(col("doc_id").as("id"),
      (col("doc_id") % 3).cast("int").as("y"))
    val cents = NearestCentroid.fit(vecs, labels)
    assert(cents.map(_.id) === Seq(0L, 1L, 2L))
    val wrong = NearestCentroid.predict(vecs, cents)
      .join(labels, Seq("id")).filter(col("y") =!= col("pred")).count()
    assert(wrong === 0L)
  }

  test("training is deterministic and a class absent from labels has no centroid") {
    val vecs = vdf(0L -> Seq(3L, 1L), 1L -> Seq(5L, 9L))
    val l = ldf(0L -> 2, 1L -> 2)
    assert(NearestCentroid.fit(vecs, l) === NearestCentroid.fit(vecs, l))
    assert(NearestCentroid.fit(vecs, l).map(_.id) === Seq(2L))
  }
}
