package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{NativeExpressions, TextFunctions => TF}

/** Distributed linear text classifier over hashed bag-of-words
  * features — the trainable analog of the heuristic quality filter,
  * and the shape of every fasttext-style quality/domain classifier a
  * pretraining pipeline applies at corpus scale.
  *
  * Training is the BATCH perceptron: one sweep computes every
  * document's margin under the current weights, then adds
  * `Σ y·x` over the misclassified documents to the weight vector.
  * Unlike SGD (inherently sequential), the batch update is an
  * order-independent aggregate, so a sweep is two map-side-combined
  * shuffles — margins keyed by document, the update keyed by bucket —
  * and the whole training run is exactly replayable by a relational
  * oracle, the same determinism contract as the `KMeans` Lloyd
  * trainer. Integer-exact throughout: counts, weights, and margins
  * are longs, so no engine ever rounds.
  *
  * Scale shape: the weight vector is `buckets` rows (tiny — it rides
  * a broadcast join; at many-iteration production scale collect it to
  * plan literals like `KMeans.fit` does with centroids). The feature
  * table shuffles (id, bucket, cnt) triples — the text itself never
  * moves after feature extraction. Misclassified-document sets stay
  * distributed (corpus-scale in early sweeps — never collected,
  * never broadcast).
  *
  * Reference scope note: the reference connector (kafka-connect-hdfs)
  * has no model-training operators; this belongs to the curation
  * surface built alongside it.
  */
object LinearClassifier {

  /** The bias feature's reserved bucket id (token buckets are ≥ 0). */
  val BiasBucket = -1L

  /** Hashed bag-of-words features (id, bucket, cnt): every token is
    * hashed into one of `buckets` slots (the hashing trick — no
    * vocabulary table to build, ship, or grow stale), plus a constant
    * bias feature ([[BiasBucket]], cnt 1) for every document. Without
    * the bias the decision boundary is pinned through the origin and
    * a threshold-shaped teacher (e.g. "quality ≥ 0.5") is
    * unlearnable — measured on the synthetic corpus, the bias moves
    * sweep-2 teacher agreement from 55% to 71%. */
  def hashedFeatures(docs: DataFrame, buckets: Int,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(buckets >= 1, s"need at least one bucket, got $buckets")
    NativeExpressions.register(docs.sparkSession)
    docs.select(col(idCol).as("id"),
        explode(TF.tokens(col(textCol))).as("t"))
      .select(col("id"),
        pmod(call_function("hash60_md5",
            concat(lit("qcf:"), col("t")).cast("binary")),
          lit(buckets.toLong)).as("bucket"))
      .groupBy(col("id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .unionByName(docs.select(col(idCol).as("id"),
        lit(BiasBucket).as("bucket"), lit(1L).as("cnt")))
  }

  /** Per-document margins `w·x` under the weight frame (bucket, w):
    * (id, margin). Documents with no features have no row (their
    * margin is zero — callers left-join). */
  def margins(feat: DataFrame, w: DataFrame): DataFrame =
    feat.join(broadcast(w), Seq("bucket"), "left")
      .groupBy(col("id"))
      .agg(sum(col("cnt") * coalesce(col("w"), lit(0L))).as("margin"))

  /** One batch-perceptron sweep against labels (id, y = ±1):
    * w ← w + Σ y·x over documents with y·margin ≤ 0. A sweep with
    * nothing misclassified returns the weights unchanged. */
  def step(feat: DataFrame, labels: DataFrame, w: DataFrame): DataFrame = {
    val mis = margins(feat, w)
      .join(labels, Seq("id"))
      .filter(col("y") * col("margin") <= 0)
      .select(col("id"), col("y"))
    val dw = feat.join(mis, Seq("id"))
      .groupBy(col("bucket"))
      .agg(sum(col("y") * col("cnt")).as("dw"))
    w.as("a").join(dw.as("b"), col("a.bucket") === col("b.bucket"), "full")
      .select(coalesce(col("a.bucket"), col("b.bucket")).as("bucket"),
        (coalesce(col("w"), lit(0L)) + coalesce(col("dw"), lit(0L))).as("w"))
  }

  /** `iters` total sweeps. Under zero initial weights every margin is
    * zero, so sweep 1 closes to `w₁ = Σ y·x` over ALL documents —
    * computed directly instead of joining against an empty frame. */
  def fit(feat: DataFrame, labels: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"need at least one sweep, got $iters")
    val w1 = feat.join(labels, Seq("id"))
      .groupBy(col("bucket"))
      .agg(sum(col("y") * col("cnt")).as("w"))
    (2 to iters).foldLeft(w1)((w, _) => step(feat, labels, w))
  }

  /** A fitted weight frame collected to a plan-literal map — the
    * deployment form: `buckets`+1 entries of driver metadata, like
    * `KMeans.fit`'s centroid literals. */
  def collectWeights(w: DataFrame): Map[Long, Long] =
    w.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** The margin of one text column under literal weights, as a pure
    * PROJECTION: tokenize, hash each token into its bucket, look the
    * bucket up in the literal map, sum, add the bias weight. No join,
    * no shuffle, no state — the scan-side scoring form a streaming
    * admission gate or a 100 TB batch filter wants. Integer-identical
    * to [[margins]] over [[hashedFeatures]]: Σ_token w(bucket(token))
    * = Σ_bucket cnt·w. Callers must have `NativeExpressions.register`ed
    * the session (the portable md5 bucket hash). */
  def scoreLiteral(text: Column, w: Map[Long, Long], buckets: Int): Column = {
    require(buckets >= 1, s"need at least one bucket, got $buckets")
    val tokenPart =
      if (w.isEmpty) lit(0L)
      else {
        val wmap = typedLit(w)
        aggregate(TF.tokens(text), lit(0L), (acc, t) =>
          acc + coalesce(element_at(wmap,
            pmod(call_function("hash60_md5",
                concat(lit("qcf:"), t).cast("binary")),
              lit(buckets.toLong))), lit(0L)))
      }
    tokenPart + lit(w.getOrElse(BiasBucket, 0L))
  }
}
