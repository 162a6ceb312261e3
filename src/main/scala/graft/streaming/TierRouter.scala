package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.NativeExpressions
import graft.ingest.FileNaming
import graft.operators.{KMeans, NearestCentroid}

/** Model-in-the-loop ROUTING: the multiclass twin of [[QualityGate]].
  * Where the gate admits or drops, the router sends every record to
  * the topic named by its predicted class — quality tiers into
  * per-tier topics, domains into per-domain corpora — through the
  * SAME multi-topic commit plane a mixed Kafka stream uses
  * ([[StreamIngest.startLoggedMulti]]): per-topic transactional logs,
  * per-topic offset recovery, O(1) write jobs per micro-batch in
  * topic count.
  *
  * The model is a fitted [[NearestCentroid]] (train on a standing
  * corpus in batch, deploy here): centroids enter every batch's plan
  * as LITERALS — C·(buckets+1) longs of driver metadata — so scoring
  * is [[KMeans.cellOf]]'s shuffle-free argmin-d² projection.
  * Featurization ([[NearestCentroid.ratioVectors]]) aggregates the
  * BATCH (explode + two map-side-combined aggregates + one
  * batch-scale equi-join back); like the MinHash gate's per-batch
  * shingling, this is batch-scale work with NO cross-batch state —
  * the index planes, crash windows, and reconcile machinery the
  * stateful gates need simply don't exist here.
  *
  * Crash-replay correctness: routing is a pure function of the
  * record's text under plan-literal centroids, so a replayed record
  * deterministically re-routes to the SAME topic, whose log already
  * holds its (part, off) — the per-topic resume filter drops it. A
  * model retrained mid-stream takes effect on restart (the gate
  * family's snapshot-at-start contract); retraining changes routing
  * only for offsets not yet committed anywhere.
  */
object TierRouter {

  /** Assign `topic` = `tierNames(predicted class)` per record of one
    * batch. Exposed for the spec; [[startLoggedTierRouted]] wires it
    * as the multi-topic loop's per-batch prepare step. */
  def routeBatch(batch: DataFrame, cents: Seq[KMeans.Centroid],
                 tierNames: Seq[String], buckets: Int,
                 textCol: String = "text"): DataFrame = {
    // the routing key is (part, off) — unique per record in the
    // stream contract, deterministic across replays (no synthetic ids)
    val withId = batch.withColumn("_rid",
      concat(col("part").cast("string"), lit(":"),
        col("off").cast("string")))
    val preds = NearestCentroid.predict(
      NearestCentroid.ratioVectors(withId, buckets,
        idCol = "_rid", textCol = textCol), cents)
      .withColumnRenamed("id", "_rid")
    withId.join(preds, Seq("_rid"))
      .withColumn("topic", element_at(typedLit(tierNames), col("pred") + 1))
      .drop("_rid", "pred")
  }

  /** Start a logged stream whose records land in per-tier topics
    * under `outDir`, routed by the fitted centroid model. `cents` ids
    * must index into `tierNames`; a tier no record ever routes to
    * simply never materializes a topic directory. Stream columns:
    * (part, off, `textCol`, ...) — no topic column; the router owns
    * it. */
  def startLoggedTierRouted(stream: DataFrame, outDir: String,
                            cents: Seq[KMeans.Centroid],
                            tierNames: Seq[String], buckets: Int,
                            flushSize: Int, checkpoint: String,
                            trigger: Option[Trigger] = None,
                            format: String = "parquet",
                            pad: Int = FileNaming.DefaultZeroPadWidth,
                            textCol: String = "text"): StreamingQuery = {
    require(tierNames.nonEmpty, "need at least one tier name")
    require(cents.nonEmpty && cents.forall(c =>
        c.id >= 0 && c.id < tierNames.size),
      s"centroid ids must index tierNames (size ${tierNames.size})")
    require(!stream.columns.contains("topic"),
      "the router assigns `topic` itself — drop the stream's column")
    require(stream.columns.contains(textCol),
      s"tier routing needs a `$textCol` column, got: " +
        stream.columns.mkString(", "))
    NativeExpressions.register(stream.sparkSession)
    StreamIngest.startLoggedMulti(stream, outDir, flushSize, checkpoint,
      trigger, format, pad,
      prepare = routeBatch(_, cents, tierNames, buckets, textCol))
  }
}
