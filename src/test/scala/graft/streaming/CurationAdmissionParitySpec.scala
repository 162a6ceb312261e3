package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.{DedupFunctions => DF}
import graft.ingest.CommitLog
import graft.queries.PipelineQueries

/** Batch/streaming ADMISSION PARITY for the curation gates (VERDICT
  * r16 task #4): `curation_incremental` claims its served `_fp`/`_mh`
  * plane probes are the batch stand-in for what the streaming gates
  * decide at commit time — and the r16 fingerprint fix touched exactly
  * that seam. This spec commits ONE corpus, streams the SAME arriving
  * batch through [[DedupIngest.startLoggedDeduped]] (exact gate) and
  * [[DedupIngest.startLoggedMinhashDeduped]] (near-dup gate), runs the
  * batch through the incremental query's OWN plane probes
  * ([[DedupIngest.fingerprint]] → anti-join [[DedupIngest.fingerprintIndex]];
  * [[DedupIngest.sigOf]] → [[DedupIngest.dupAgainstIndex]] with the
  * query's hot-band cap), and asserts the admitted doc_id sets are
  * IDENTICAL — the shared owners (`fingerprint`, `sigOf`,
  * `dupAgainstIndex`) make drift structurally hard; this pins it.
  *
  * Known, documented asymmetry kept OUT of the parity surface: the
  * in-batch near-dup stage. The streaming minhash gate checks the
  * COMMITTED corpus only (batch-internal near-dups land together, per
  * its scaladoc); `curation_incremental` additionally prunes in-batch
  * near-dups through `candidatePairs` — a batch-side EXTRA stage, not
  * a plane probe, tested with the other candidatePairs consumers.
  */
class CurationAdmissionParitySpec extends SparkSuite {

  private val topic = "t"

  // Proven MinhashGateSpec vectors: 10 tokens → 8 3-shingles; the
  // appended-token near-dup is Jaccard 8/9 and band-collides.
  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val nearDup = base + " lambda"
  private val c2 = "one two three four five six seven eight nine ten eleven"
  private val tiny = "tiny doc" // < 3 tokens: no signature, mh-gate bypass
  private val novel =
    "moon sun star cloud rain snow wind storm thunder light"
  private val pairTxt =
    "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10" // in-batch exact duplicate pair

  /** The committed corpus + its `_fp`/`_mh` planes, installed by the
    * SAME rebuild hooks `servedCurationPlanes` uses. Each streaming
    * gate mutates its corpus dir, so each caller gets a fresh build
    * (writeLogged + rebuild are deterministic — identical states). */
  private def buildCorpus(): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-parity").toString
    val corpus = Seq(100L -> base, 101L -> c2, 102L -> tiny)
      .toDF("id", "text")
      .select((col("id") % 8).as("part"), col("id").as("off"), col("text"))
    CommitLog.writeLogged(corpus, dir, topic, flushSize = 1 << 20)
    DedupIngest.rebuildFingerprints(spark, dir, topic)
    DedupIngest.rebuildSignatures(spark, dir, topic, "text")
    dir
  }

  // the arriving batch: off ≥ 1000 keeps it beyond the corpus offsets
  private val batchRows = Seq(
    1000L -> base,    // exact dup of committed → exact-dropped, mh-dropped
    1001L -> nearDup, // near-dup of committed → exact-admitted, mh-dropped
    1002L -> novel,   // novel → admitted by both
    1003L -> tiny,    // exact dup of committed short → exact-dropped, mh-bypass
    1004L -> "zz yy", // novel short → admitted by both (mh via bypass)
    1005L -> pairTxt, // in-batch exact pair: exact gate keeps lowest
    1006L -> pairTxt) //   (both mh-admitted — neither is a CORPUS dup)

  private def batchDf: DataFrame = {
    import spark.implicits._
    batchRows.toDF("id", "text")
      .select((col("id") % 8).as("part"), col("id").as("off"), col("text"))
  }

  private def streamAdmitted(run: (DataFrame, String, String) => Unit)
      : Set[Long] = {
    val dir = buildCorpus()
    val ckpt = Files.createTempDirectory("graft-parity-ckpt").toString
    run(batchDf, dir, ckpt)
    spark.read.parquet(s"$dir/$topic").filter(col("off") >= 1000L)
      .select("off").collect().map(_.getLong(0)).toSet
  }

  test("exact gate: streamed admission == the incremental query's fp-plane probe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // streaming side: the admission IS what lands in the corpus
    val streamed = streamAdmitted { (batch, dir, ckpt) =>
      val s = MemoryStream[(Long, Long, String)]
      val q = DedupIngest.startLoggedDeduped(
        s.toDF().toDF("part", "off", "text"), dir, topic,
        flushSize = 1 << 20, ckpt)
      s.addData(batchRows.map { case (id, t) => (id % 8, id, t) }: _*)
      q.processAllAvailable(); q.stop()
    }
    // batch side: curation_incremental's exact-admission stages —
    // envelope-excluded fingerprint, lowest in-batch id per fp, then
    // anti-join the served `_fp` plane
    val dir = buildCorpus()
    val fpSrc = batchDf.select(col("off"), col("text"))
    val bFp = fpSrc.select(col("off").as("doc_id"),
      DedupIngest.fingerprint(fpSrc).as("fp"))
    val lowest = bFp.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    val probed = bFp.join(lowest, Seq("fp", "doc_id"), "left_semi")
      .join(DedupIngest.fingerprintIndex(spark, dir, topic),
        Seq("fp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(probed === streamed)
    assert(streamed === Set(1001L, 1002L, 1004L, 1005L))
  }

  test("near-dup gate: streamed admission == the incremental query's mh-plane probe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val streamed = streamAdmitted { (batch, dir, ckpt) =>
      val s = MemoryStream[(Long, Long, String)]
      val q = DedupIngest.startLoggedMinhashDeduped(
        s.toDF().toDF("part", "off", "text"), dir, topic,
        flushSize = 1 << 20, ckpt, textCol = "text")
      s.addData(batchRows.map { case (id, t) => (id % 8, id, t) }: _*)
      q.processAllAvailable(); q.stop()
    }
    // batch side: curation_incremental's near-dup probe — sigOf over
    // (doc_id, text), dupAgainstIndex at the gate's own parameters
    // (minAgree = half the slots, rowsPerBand = 4) WITH the query's
    // hot-band cap on the index side
    val dir = buildCorpus()
    val sigB = DedupIngest.sigOf(
      batchDf.select(col("off").as("doc_id"), col("text")),
      "text", Seq("doc_id"))
    def dupIds(cap: DataFrame => DataFrame): Set[Long] =
      DedupIngest.dupAgainstIndex(spark, dir, topic, sigB, Seq("doc_id"),
          minAgree = DF.numMinhashes / 2, rowsPerBand = 4, capIndex = cap)
        .collect().map(_.getLong(0)).toSet
    val capped = dupIds(df => PipelineQueries.dropHotBands(df, "band"))
    // the cap must be a NO-OP on an un-degenerate corpus — otherwise
    // this parity claim would be comparing different gate rules
    assert(capped === dupIds(identity),
      "hot-band cap changed the probe's decision on a healthy corpus")
    val probed = batchRows.map(_._1).toSet -- capped
    assert(probed === streamed)
    assert(streamed === Set(1002L, 1003L, 1004L, 1005L, 1006L))
  }
}
