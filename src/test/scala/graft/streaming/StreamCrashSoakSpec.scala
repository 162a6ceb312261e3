package graft.streaming

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ingest.BatchWriter

/** Randomized kill-between-batches soak for the streaming commit
  * loop (SURVEY §5 port-plan item 3; the reference's recovery
  * contract is `HdfsSinkTask.java:145-149` — offsets restored from
  * committed filenames, duplicates discarded on replay).
  *
  * Each round is one "process lifetime": a fresh query over a fresh
  * MemoryStream + fresh checkpoint (the worst-case crash — ALL source
  * progress lost, full at-least-once replay), fed the complete replay
  * of everything ever produced plus new offsets, in shuffled chunks,
  * then KILLED at a random point — sometimes mid-feed with batches
  * still unprocessed, sometimes after a drain. Chunk boundaries,
  * flush sizes, kill points, and interleavings are all seeded-random,
  * so every lifetime crashes somewhere new: before the first commit,
  * between commits, with staged `+tmp` files in flight.
  *
  * The invariant that must survive all of it: after a final lifetime
  * that replays the full history and drains, every (part, off) ever
  * produced is committed EXACTLY once — no duplicate from the replays,
  * no loss from the kills — and the max committed offset per
  * partition equals the produced max. */
class StreamCrashSoakSpec extends SparkSuite {

  test("exactly-once survives 20+ randomized kill points across restarts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(20260816L)
    val out = Files.createTempDirectory("graft-soak").toString

    // full produced history: the at-least-once source replays all of
    // it on every restart (MemoryStream has no persisted offsets, so
    // a fresh stream IS the full-replay crash model)
    val produced = scala.collection.mutable.LinkedHashSet[(Long, Long)]()
    val nextOff = scala.collection.mutable.Map(0L -> 0L, 1L -> 0L, 2L -> 0L)
    def payload(p: Long, o: Long) = s"v$p-$o"

    var kills = 0
    var cleans = 0
    val rounds = 30
    for (round <- 1 to rounds) {
      // new offsets for this lifetime, on random partitions
      val fresh = (1 to (1 + rnd.nextInt(5))).map { _ =>
        val p = rnd.nextInt(3).toLong
        val o = nextOff(p); nextOff(p) = o + 1
        (p, o)
      }
      produced ++= fresh
      // replay-everything + fresh as a random MERGE of the per-
      // partition sequences: interleaving across partitions is
      // arbitrary, but each partition's offsets arrive in order —
      // the Kafka delivery contract the recover-from-max-committed
      // rule is sound under (an out-of-order partition feed would
      // make offset gaps unrecoverable by design, there as here)
      val queues = produced.toSeq.groupBy(_._1).view
        .mapValues(s => scala.collection.mutable.Queue(s.sortBy(_._2): _*))
        .toMap
      val feed = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      while (queues.values.exists(_.nonEmpty)) {
        val live = queues.filter(_._2.nonEmpty).keys.toSeq.sorted
        feed += queues(live(rnd.nextInt(live.size))).dequeue()
      }

      val ckpt = Files.createTempDirectory(s"graft-soak-ckpt$round").toString
      val s = MemoryStream[(Long, Long, String)]
      val q = StreamIngest.start(
        s.toDF().toDF("part", "off", "payload"),
        out, "t", flushSize = 1 + rnd.nextInt(4), ckpt)

      // feed in random chunks; kill somewhere random — possibly before
      // anything is fed, possibly mid-history. Drawing past feed.size
      // makes the kill unreachable, so ~1/4 of lifetimes shut down
      // CLEANLY instead (both exit paths must be exercised; a
      // kill-every-round soak would never test the clean handoff)
      val killAt = rnd.nextInt(feed.size + feed.size / 3 + 1)
      var fed = 0
      var killed = false
      while (fed < feed.size && !killed) {
        val chunk = feed.slice(fed, fed + 1 + rnd.nextInt(3))
        s.addData(chunk.map { case (p, o) => (p, o, payload(p, o)) }.toSeq: _*)
        fed += chunk.size
        // sometimes let the micro-batch engine drain, sometimes pile
        // more data on so the kill lands with batches in flight
        if (rnd.nextInt(3) == 0) q.processAllAvailable()
        if (fed >= killAt) killed = true
      }
      if (!killed) { q.processAllAvailable(); cleans += 1 } // clean round
      else kills += 1
      q.stop() // abrupt when killed=true: unprocessed batches are lost
    }
    assert(kills >= 20, s"soak degenerate: only $kills kill points")
    assert(cleans >= 2, s"soak degenerate: only $cleans clean shutdowns")

    // final lifetime: full replay, full drain, clean stop
    val ckptF = Files.createTempDirectory("graft-soak-final").toString
    val sF = MemoryStream[(Long, Long, String)]
    val qF = StreamIngest.start(
      sF.toDF().toDF("part", "off", "payload"),
      out, "t", flushSize = 3, ckptF)
    sF.addData(produced.toSeq.map { case (p, o) => (p, o, payload(p, o)) }: _*)
    qF.processAllAvailable()
    qF.stop()

    val back = BatchWriter.read(spark, out, "t")
      .select(col("part").cast("long"), col("off").cast("long"),
        col("payload"))
      .as[(Long, Long, String)].collect()
    val expected = produced.toSet
    assert(back.length === expected.size,
      s"dup or loss: committed ${back.length} rows for ${expected.size} " +
        "produced offsets")
    assert(back.map(r => (r._1, r._2)).toSet === expected)
    // payloads rode along intact (a dup-suppressed replay must not
    // have clobbered a committed row with a different write)
    back.foreach { case (p, o, v) => assert(v === payload(p, o)) }
    val maxByPart = expected.groupBy(_._1).map { case (p, s) => p -> s.map(_._2).max }
    assert(BatchWriter.maxCommittedOffsets(spark, out, "t") === maxByPart)
  }
}
