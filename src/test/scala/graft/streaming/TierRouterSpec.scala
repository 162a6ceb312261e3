package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ingest.CommitLog
import graft.operators.NearestCentroid

/** Model-in-the-loop routing: per-tier topics through the multi-topic
  * commit plane, deterministic replay, and the routing function
  * itself. */
class TierRouterSpec extends SparkSuite {
  import spark.implicits._

  private val Buckets = 16
  private val Tiers = Seq("lo", "hi")

  private val loText = "alpha beta alpha gamma"
  private val hiText = "omega psi omega chi"

  /** Centroids fitted on disjoint-vocabulary exemplars — routing on
    * the same vocabularies is then exact, so every assertion below is
    * deterministic. */
  private lazy val cents = {
    val docs = Seq(1L -> loText, 2L -> loText, 3L -> hiText, 4L -> hiText)
      .toDF("doc_id", "text")
    NearestCentroid.fit(
      NearestCentroid.ratioVectors(docs, Buckets),
      Seq(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1).toDF("id", "y"))
  }

  test("routeBatch assigns the fitted tier per record") {
    val batch = Seq((0L, 0L, loText), (0L, 1L, hiText), (1L, 0L, hiText))
      .toDF("part", "off", "text")
    val routed = TierRouter.routeBatch(batch, cents, Tiers, Buckets)
      .select(col("off"), col("part"), col("topic"))
      .as[(Long, Long, String)].collect().toSet
    assert(routed === Set((0L, 0L, "lo"), (1L, 0L, "hi"), (0L, 1L, "hi")))
  }

  test("records land in per-tier topics; replay re-routes and dedups") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-tier-route").toString
    val ckpt1 = Files.createTempDirectory("graft-tier-ckpt1").toString

    val s1 = MemoryStream[(Long, Long, String)]
    val q1 = TierRouter.startLoggedTierRouted(
      s1.toDF().toDF("part", "off", "text"), out, cents, Tiers, Buckets,
      flushSize = 2, checkpoint = ckpt1)
    s1.addData((0L, 0L, loText), (0L, 1L, hiText), (0L, 2L, loText),
      (1L, 0L, hiText))
    q1.processAllAvailable()
    q1.stop()

    val lo = CommitLog.read(spark, out, "lo")
    val hi = CommitLog.read(spark, out, "hi")
    assert(lo.count() === 2 && hi.count() === 2)
    assert(lo.select(col("text")).as[String].collect().toSet === Set(loText))
    assert(hi.select(col("text")).as[String].collect().toSet === Set(hiText))
    // per-topic offsets are the SOURCE offsets of the routed records
    assert(CommitLog.maxOffsets(spark, out, "lo") === Map(0L -> 2L))
    assert(CommitLog.maxOffsets(spark, out, "hi") === Map(0L -> 1L, 1L -> 0L))

    // crash-restart: full replay + new data — replayed records
    // re-route deterministically and fall to each topic's resume
    // filter; only the new offsets commit
    val ckpt2 = Files.createTempDirectory("graft-tier-ckpt2").toString
    val s2 = MemoryStream[(Long, Long, String)]
    val q2 = TierRouter.startLoggedTierRouted(
      s2.toDF().toDF("part", "off", "text"), out, cents, Tiers, Buckets,
      flushSize = 2, checkpoint = ckpt2)
    s2.addData((0L, 0L, loText), (0L, 1L, hiText), (0L, 2L, loText),
      (1L, 0L, hiText), (0L, 3L, hiText), (1L, 1L, loText))
    q2.processAllAvailable()
    q2.stop()

    val lo2 = CommitLog.read(spark, out, "lo")
    val hi2 = CommitLog.read(spark, out, "hi")
    assert(lo2.count() === 3 && hi2.count() === 3)
    assert(lo2.select(countDistinct(col("part"), col("off"))).as[Long]
      .head() === 3)
    assert(hi2.select(countDistinct(col("part"), col("off"))).as[Long]
      .head() === 3)
    assert(CommitLog.maxOffsets(spark, out, "lo") ===
      Map(0L -> 2L, 1L -> 1L))
    assert(CommitLog.maxOffsets(spark, out, "hi") ===
      Map(0L -> 3L, 1L -> 0L))
  }

  test("a tier nothing routes to never materializes a topic") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-tier-onesided").toString
    val ckpt = Files.createTempDirectory("graft-tier-ckpt3").toString
    val s = MemoryStream[(Long, Long, String)]
    val q = TierRouter.startLoggedTierRouted(
      s.toDF().toDF("part", "off", "text"), out, cents, Tiers, Buckets,
      flushSize = 2, checkpoint = ckpt)
    s.addData((0L, 0L, loText), (0L, 1L, loText))
    q.processAllAvailable()
    q.stop()
    assert(CommitLog.read(spark, out, "lo").count() === 2)
    assert(!new java.io.File(s"$out/hi").exists())
  }

  test("guards: topic column, missing text, centroid ids out of range") {
    implicit val sqlCtx = spark.sqlContext
    val s = MemoryStream[(Long, Long, String)]
    val withTopic = s.toDF().toDF("part", "off", "text")
      .withColumn("topic", lit("x"))
    intercept[IllegalArgumentException] {
      TierRouter.startLoggedTierRouted(withTopic, "/tmp/x", cents, Tiers,
        Buckets, 2, "/tmp/ck")
    }
    intercept[IllegalArgumentException] {
      TierRouter.startLoggedTierRouted(
        s.toDF().toDF("part", "off", "payload"), "/tmp/x", cents, Tiers,
        Buckets, 2, "/tmp/ck")
    }
    intercept[IllegalArgumentException] {
      TierRouter.startLoggedTierRouted(
        s.toDF().toDF("part", "off", "text"), "/tmp/x", cents,
        Seq("onlyone"), Buckets, 2, "/tmp/ck")
    }
  }
}
