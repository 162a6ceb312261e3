package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSuite
import graft.ingest.CommitLog

/** The MinHash near-dup admission gate: textual near-duplicates (not
  * just byte-identical payloads) are dropped at ingestion against the
  * `_mh` signature index, under the same watermark/reconcile/compaction
  * contract as the exact gate's fingerprint index. */
class MinhashGateSpec extends SparkSuite {

  // 10 tokens → 8 3-gram shingles
  private val base =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  // one appended token: Jaccard 8/9 ≈ 0.89 — well over the 8/16
  // slot-agreement gate, and band collision verified by this suite
  private val nearDup = base + " lambda"
  private val novel =
    "one two three four five six seven eight nine ten eleven"

  private def readAll(root: String) =
    spark.read.parquet(s"$root/t").select("off", "payload")
      .as[(Long, String)](org.apache.spark.sql.Encoders.product[(Long, String)])
      .collect().toSet

  test("near-duplicate text is dropped across batches; novel and short docs admitted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-mh-stream").toString
    val ckpt = Files.createTempDirectory("graft-mh-ckpt").toString
    val s = MemoryStream[(Long, Long, String)]
    val q = DedupIngest.startLoggedMinhashDeduped(
      s.toDF().toDF("part", "off", "payload"), out, "t",
      flushSize = 10, ckpt, textCol = "payload")
    s.addData((0L, 0L, base), (0L, 1L, "tiny doc"))
    q.processAllAvailable()
    // batch 2: a paraphrase-grade near-dup of a COMMITTED doc is
    // rejected; novel text and a repeated sub-3-token doc (gate
    // bypass — the exact gate's job) are admitted
    s.addData((0L, 2L, nearDup), (0L, 3L, novel), (0L, 4L, "tiny doc"))
    q.processAllAvailable()
    q.stop()
    assert(readAll(out) === Set((0L, base), (1L, "tiny doc"),
      (3L, novel), (4L, "tiny doc")))
    // one signature file per published version; short docs index nothing
    assert(CommitLog.latestVersion(spark, out, "t") === 1L)
    assert(DedupIngest.minhashIndex(spark, out, "t").count() === 2L)
  }

  test("the gate holds across a restart with full source replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-mh-restart").toString
    val ckpt1 = Files.createTempDirectory("graft-mh-ckpt1").toString
    val s1 = MemoryStream[(Long, Long, String)]
    val q1 = DedupIngest.startLoggedMinhashDeduped(
      s1.toDF().toDF("part", "off", "payload"), out, "t",
      flushSize = 10, ckpt1, textCol = "payload")
    s1.addData((0L, 0L, base))
    q1.processAllAvailable()
    q1.stop()
    // "crash": fresh checkpoint — old offsets replay (resume-filtered),
    // the near-dup arrives at a NEW offset (signature-filtered), one
    // novel record lands
    val ckpt2 = Files.createTempDirectory("graft-mh-ckpt2").toString
    val s2 = MemoryStream[(Long, Long, String)]
    val q2 = DedupIngest.startLoggedMinhashDeduped(
      s2.toDF().toDF("part", "off", "payload"), out, "t",
      flushSize = 10, ckpt2, textCol = "payload")
    s2.addData((0L, 0L, base), (0L, 1L, nearDup), (0L, 2L, novel))
    q2.processAllAvailable()
    q2.stop()
    assert(readAll(out) === Set((0L, base), (2L, novel)))
  }

  test("reconcileSignatures rebuilds the crash-window version from committed data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-mh-reconcile").toString
    val ckpt1 = Files.createTempDirectory("graft-mh-rckpt1").toString
    val s1 = MemoryStream[(Long, Long, String)]
    val q1 = DedupIngest.startLoggedMinhashDeduped(
      s1.toDF().toDF("part", "off", "payload"), out, "t",
      flushSize = 10, ckpt1, textCol = "payload")
    s1.addData((0L, 0L, base), (0L, 1L, novel))
    q1.processAllAvailable()
    q1.stop()
    // simulate the crash window: data published, index never installed
    val mh0 = new Path(s"$out/t/_mh/v0.parquet")
    val fs = mh0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(mh0, false))
    assert(DedupIngest.minhashIndex(spark, out, "t").count() === 0)
    val ckpt2 = Files.createTempDirectory("graft-mh-rckpt2").toString
    val s2 = MemoryStream[(Long, Long, String)]
    val q2 = DedupIngest.startLoggedMinhashDeduped(
      s2.toDF().toDF("part", "off", "payload"), out, "t",
      flushSize = 10, ckpt2, textCol = "payload")
    s2.addData((0L, 2L, nearDup))
    q2.processAllAvailable()
    q2.stop()
    assert(readAll(out) === Set((0L, base), (1L, novel)))
    assert(DedupIngest.minhashIndex(spark, out, "t").count() === 2L)
  }

  test("compactSignatures merges per-version files; the gate still rejects") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-mh-compact").toString
    val ckpt1 = Files.createTempDirectory("graft-mh-cckpt1").toString
    val s1 = MemoryStream[(Long, Long, String)]
    val q1 = DedupIngest.startLoggedMinhashDeduped(
      s1.toDF().toDF("part", "off", "payload"), out, "t",
      flushSize = 10, ckpt1, textCol = "payload")
    s1.addData((0L, 0L, base))
    q1.processAllAvailable()
    s1.addData((0L, 1L, novel))
    q1.processAllAvailable()
    q1.stop()
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new Path(s"$out/t/_mh")).length === 2)
    assert(DedupIngest.compactSignatures(spark, out, "t") === 1L)
    assert(fs.listStatus(new Path(s"$out/t/_mh")).length === 1)
    assert(DedupIngest.minhashIndex(spark, out, "t").count() === 2L)
    val ckpt2 = Files.createTempDirectory("graft-mh-cckpt2").toString
    val s2 = MemoryStream[(Long, Long, String)]
    val q2 = DedupIngest.startLoggedMinhashDeduped(
      s2.toDF().toDF("part", "off", "payload"), out, "t",
      flushSize = 10, ckpt2, textCol = "payload")
    s2.addData((0L, 2L, nearDup), (0L, 3L, novel + " twelve"))
    q2.processAllAvailable()
    q2.stop()
    // nearDup rejected against the compacted index; the novel
    // extension is itself a near-dup of the committed `novel`
    assert(readAll(out) === Set((0L, base), (1L, novel)))
  }

  test("batch-internal near-dups land together — the gate checks the committed corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-mh-inbatch").toString
    val ckpt = Files.createTempDirectory("graft-mh-ickpt").toString
    val s = MemoryStream[(Long, Long, String)]
    val q = DedupIngest.startLoggedMinhashDeduped(
      s.toDF().toDF("part", "off", "payload"), out, "t",
      flushSize = 10, ckpt, textCol = "payload")
    s.addData((0L, 0L, base), (0L, 1L, nearDup))
    q.processAllAvailable()
    q.stop()
    assert(readAll(out) === Set((0L, base), (1L, nearDup)))
  }

  test("batch admission probes the gate-maintained planes — one served state, one rule") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-mh-unified").toString
    val ckpt = Files.createTempDirectory("graft-mh-uckpt").toString
    val s = MemoryStream[(Long, Long, String)]
    val q = DedupIngest.startLoggedMinhashDeduped(
      s.toDF().toDF("part", "off", "payload"), out, "t",
      flushSize = 10, ckpt, textCol = "payload")
    s.addData((0L, 0L, base), (0L, 1L, novel))
    q.processAllAvailable()
    q.stop()
    // upgrade path: install the exact-fp plane over the SAME topic
    // (the documented reconciliation for topics another gate wrote)
    DedupIngest.rebuildFingerprints(spark, out, "t")

    // a DAILY BATCH probing the streaming gate's served state through
    // the batch query's own constructions (curation_incremental's
    // stage 2 and 3): an exact dup of a committed payload, a near-dup
    // of one, and a fresh doc
    val batch = Seq((10L, base), (11L, nearDup),
      (12L, "red orange yellow green blue indigo violet crimson amber teal"))
      .toDF("doc_id", "payload")
    val fpSrc = batch.select(col("doc_id").as("off"), col("payload"))
    val bFp = fpSrc.select(col("off").as("doc_id"),
      DedupIngest.fingerprint(fpSrc).as("fp"))
    val exactDup = bFp
      .join(DedupIngest.fingerprintIndex(spark, out, "t"), Seq("fp"), "left_semi")
      .select("doc_id").as[Long].collect().toSet
    assert(exactDup === Set(10L),
      "the gate-side fingerprint matches the plane built from committed files")
    val sigB = DedupIngest.sigOf(batch, "payload", Seq("doc_id"))
    val nearDups = DedupIngest.dupAgainstIndex(spark, out, "t", sigB,
      Seq("doc_id"), minAgree = 8, rowsPerBand = 4)
      .as[Long].collect().toSet
    assert(nearDups === Set(10L, 11L),
      "identical text agrees on all slots, the paraphrase on >= 8, fresh on none")
    // the batch survivor set = what the streaming gate itself would
    // have admitted had these arrived on the stream
    assert(Set(10L, 11L, 12L) -- exactDup -- nearDups === Set(12L))
  }
}
