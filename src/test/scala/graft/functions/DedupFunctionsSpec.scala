package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DedupFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("jaccard: identical=1, disjoint=0, both-empty=1, dup-insensitive") {
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a"), Seq("b")),
      (Seq.empty[String], Seq.empty[String]),
      (Seq("a", "a", "b"), Seq("a", "b", "b"))).toDF("x", "y")
    val got = df.select(DedupFunctions.jaccard(col("x"), col("y")))
      .as[Double].collect().toSeq
    assert(got === Seq(1.0, 0.0, 1.0, 1.0))
  }

  test("exactDedup groups identical texts under one fingerprint") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val got = DedupFunctions.exactDedup(df, "doc_id", "text")
      .select(col("keeper_id"), col("dup_count"))
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (3L, 1L)))
  }

  test("columnar minhash equals the aggregate-form minhash") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "pack my box with five dozen liquor jugs for the long road"))
      .toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))

    val columnar = sh.select(col("doc_id") +: DedupFunctions.minhashSignature(col("sh")): _*)
    val agg = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"),
        (TextFunctions.hash60(col("s")) % DedupFunctions.MinhashPrime).as("h"))
      .groupBy(col("doc_id"))
      .agg(DedupFunctions.minhashAggExprs(col("h")).head,
        DedupFunctions.minhashAggExprs(col("h")).tail: _*)

    val a = columnar.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = agg.orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("near-duplicate docs collide on at least one LSH band; distinct docs do not") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // 1-token edit
      (3L, "completely different content about spark catalyst execution plans"))
      .toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"),
      TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))
    val sig = sh.select(col("doc_id") +: DedupFunctions.minhashSignature(col("sh")): _*)
    val sigCols = (0 until DedupFunctions.numMinhashes).map(i => col(s"sig$i"))
    val bands = sig.select(col("doc_id"),
      explode(DedupFunctions.bandKeys(sigCols, 4)).as("band"))
    val pairs = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("containment: subset=1 regardless of size ratio, disjoint=0, both-empty=1") {
    val df = Seq(
      // "a b" ⊂ a 6-token superset: jaccard is diluted, containment is 1
      (Seq("a", "b"), Seq("a", "b", "c", "d", "e", "f")),
      (Seq("a", "b"), Seq("x", "y")),
      (Seq.empty[String], Seq.empty[String]),
      // dup-insensitive: multiset noise must not change the ratio
      (Seq("a", "a", "b"), Seq("b", "a", "a", "a", "c"))).toDF("a", "b")
    val got = df.select(
        DedupFunctions.containment(col("a"), col("b")).as("c"),
        DedupFunctions.jaccard(col("a"), col("b")).as("j"))
      .as[(Double, Double)].collect()
    assert(got(0)._1 === 1.0 && got(0)._2 < 0.5) // the signal jaccard dilutes
    assert(got(1)._1 === 0.0)
    assert(got(2)._1 === 1.0)
    assert(got(3)._1 === 1.0)
  }

  test("simhash: identical token bags equal; signature fits requested bits") {
    val df = Seq(
      (1L, "spark catalyst optimizer"),
      (2L, "spark catalyst optimizer"),
      (3L, "entirely unrelated words here")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        DedupFunctions.simhash(TextFunctions.tokens(col("text")), 16).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === got(2L))
    assert(got.values.forall(s => s >= 0 && s < (1L << 16)))
  }
}
