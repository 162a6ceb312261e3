package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.ingest.CommitLog
import graft.operators.LinearClassifier

/** The classifier quality gate: sub-margin records never land, a batch
  * with nothing admissible still advances, and replays stay out. */
class QualityGateSpec extends SparkSuite {

  import spark.implicits._

  private val Buckets = 256

  /** Weights separating a good/bad disjoint vocabulary, fitted the
    * batch way and collected to the literal deployment form. */
  private def trainedWeights: Map[Long, Long] = {
    val docs = Seq(1L -> "good fine nice", 2L -> "bad awful")
      .toDF("doc_id", "text")
    val labels = Seq((1L, 1L), (2L, -1L)).toDF("id", "y")
    LinearClassifier.collectWeights(LinearClassifier.fit(
      LinearClassifier.hashedFeatures(docs, Buckets), labels, iters = 2))
  }

  private def readAll(root: String) =
    spark.read.parquet(s"$root/t").select("off", "text")
      .as[(Long, String)](org.apache.spark.sql.Encoders.product[(Long, String)])
      .collect().toSet

  test("sub-margin records never land; an all-rejected batch still advances") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-qg-stream").toString
    val ckpt = Files.createTempDirectory("graft-qg-ckpt").toString
    val w = trainedWeights
    val s = MemoryStream[(Long, Long, String)]
    val q = QualityGate.startLoggedQualityFiltered(
      s.toDF().toDF("part", "off", "text"), out, "t", w, Buckets,
      flushSize = 10, ckpt)
    s.addData((0L, 0L, "good nice"), (0L, 1L, "awful bad bad"),
      (0L, 2L, "fine good"))
    q.processAllAvailable()
    // every record below the bar: publishes nothing, still advances
    s.addData((0L, 3L, "bad awful awful"))
    q.processAllAvailable()
    s.addData((0L, 4L, "nice nice"))
    q.processAllAvailable()
    q.stop()
    assert(readAll(out) === Set((0L, "good nice"), (2L, "fine good"),
      (4L, "nice nice")))
    // exactly two published versions — the all-rejected batch is none
    assert(CommitLog.latestVersion(spark, out, "t") === 1L)
  }

  test("a replay after restart stays out; the gate keeps filtering new offsets") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-qg-restart").toString
    val ckpt1 = Files.createTempDirectory("graft-qg-ckpt1").toString
    val w = trainedWeights
    val s1 = MemoryStream[(Long, Long, String)]
    val q1 = QualityGate.startLoggedQualityFiltered(
      s1.toDF().toDF("part", "off", "text"), out, "t", w, Buckets,
      flushSize = 10, ckpt1)
    s1.addData((0L, 0L, "good good"), (0L, 1L, "awful"))
    q1.processAllAvailable()
    q1.stop()
    // "crash": fresh checkpoint, the source replays everything plus
    // one admissible and one rejectable new record
    val ckpt2 = Files.createTempDirectory("graft-qg-ckpt2").toString
    val s2 = MemoryStream[(Long, Long, String)]
    val q2 = QualityGate.startLoggedQualityFiltered(
      s2.toDF().toDF("part", "off", "text"), out, "t", w, Buckets,
      flushSize = 10, ckpt2)
    s2.addData((0L, 0L, "good good"), (0L, 1L, "awful"),
      (0L, 2L, "fine nice"), (0L, 3L, "bad bad"))
    q2.processAllAvailable()
    q2.stop()
    assert(readAll(out) === Set((0L, "good good"), (2L, "fine nice")))
  }

  test("a calibrated minMargin raises the bar above the raw sign") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-qg-bar").toString
    val ckpt = Files.createTempDirectory("graft-qg-bar-ckpt").toString
    val w = trainedWeights
    val s = MemoryStream[(Long, Long, String)]
    val q = QualityGate.startLoggedQualityFiltered(
      s.toDF().toDF("part", "off", "text"), out, "t", w, Buckets,
      flushSize = 10, ckpt, minMargin = 3L)
    // margins under the disjoint-vocabulary weights: 3 and 2 — only
    // the first clears a bar of 3
    s.addData((0L, 0L, "good fine nice"), (0L, 1L, "good nice"))
    q.processAllAvailable()
    q.stop()
    assert(readAll(out) === Set((0L, "good fine nice")))
  }
}
