package graft.ingest

import java.nio.file.Files

import graft.SparkSuite

/** Randomized model check of the commit-log PROTOCOL surface —
  * publish (appends and swaps), checkpoint, truncate — against a
  * driver-side model of the live set. The point is the INTERLEAVINGS:
  * each feature is unit-tested in CommitLogSpec, but
  * checkpoint-after-swap-after-truncate-style sequences are where a
  * replay-base bug would hide. Pure metadata (no Spark jobs), so
  * hundreds of ops run in seconds.
  *
  * Invariants driven after every op:
  *   - snapshot(HEAD) == the model's live set, always;
  *   - a pinned historical snapshot either reproduces EXACTLY what
  *     was recorded at pin time, or (once truncation has passed it)
  *     fails loudly — it never silently answers with a partial set;
  *   - maxOffsets == the max end offset per partition of the model's
  *     live files (offset recovery never sees pre-truncation ghosts).
  */
class CommitLogProtocolSpec extends SparkSuite {

  private val Part = 0L

  test("randomized publish/swap/checkpoint/truncate keep snapshot == model; pins never lie") {
    val out = Files.createTempDirectory("clog-fuzz").toString
    val rnd = new scala.util.Random(20260814L)
    var live = Set.empty[String]
    var nextOff = 0L
    var pins = Map.empty[Long, Set[String]]
    var checkpoints = 0
    var truncations = 0

    def newFile(): String = {
      val o = nextOff; nextOff += 1
      f"partition=$Part/t+$Part+$o%010d+$o%010d.parquet"
    }

    for (step <- 1 to 150) {
      rnd.nextInt(10) match {
        case k if k < 4 => // APPEND: 1-3 new files
          val adds = Seq.fill(1 + rnd.nextInt(3))(newFile())
          CommitLog.publish(spark, out, "t", adds)
          live ++= adds
        case k if k < 6 && live.size >= 2 => // SWAP: rewrite some live files
          val removes = rnd.shuffle(live.toSeq).take(1 + rnd.nextInt(2))
          val adds = Seq(newFile())
          CommitLog.publish(spark, out, "t", adds, removes)
          live = live -- removes ++ adds
        case 6 =>
          CommitLog.checkpoint(spark, out, "t")
          checkpoints += 1
        case 7 =>
          CommitLog.truncateLog(spark, out, "t")
          truncations += 1
        case _ if live.nonEmpty => // PIN the current version
          pins += (CommitLog.latestVersion(spark, out, "t") -> live)
        case _ => ()
      }
      if (CommitLog.latestVersion(spark, out, "t") >= 0) {
        // HEAD truth
        assert(CommitLog.snapshot(spark, out, "t").toSet === live,
          s"HEAD snapshot diverged from model at step $step")
        // offset recovery truth (filename-as-metadata over the live set)
        val wantMax = live.map(_.split('+').last.stripSuffix(".parquet").toLong)
        if (wantMax.nonEmpty)
          assert(CommitLog.maxOffsets(spark, out, "t") ===
            Map(Part -> wantMax.max), s"maxOffsets diverged at step $step")
        // every pin reproduces exactly or fails loudly — never partial
        pins = pins.filter { case (v, want) =>
          try {
            assert(CommitLog.snapshot(spark, out, "t", asOf = v).toSet === want,
              s"pinned snapshot at version $v lied at step $step")
            true
          } catch {
            case _: IllegalStateException => false // truncated past: drop pin
          }
        }
      }
    }
    // the run must actually have exercised the interesting ops
    assert(checkpoints >= 5 && truncations >= 5,
      s"fuzz too tame: $checkpoints checkpoints, $truncations truncations")
    assert(CommitLog.snapshot(spark, out, "t").toSet === live)
  }

  test("randomized clones from surviving pins carry the re-encoded live set exactly") {
    // data files must exist for cloneTopic's copy — drive the REAL
    // write path, then branch at random pins and check each clone's
    // snapshot is the pinned model with the topic re-encoded
    val out = Files.createTempDirectory("clog-clone-fuzz").toString
    val rnd = new scala.util.Random(7L)
    import spark.implicits._
    var nextOff = 0L
    var pinned = Vector.empty[(Long, Set[String])]
    for (_ <- 1 to 6) {
      val n = 1 + rnd.nextInt(3)
      val rows = (0 until n).map { _ =>
        val o = nextOff; nextOff += 1; (0L, o, s"v$o")
      }
      CommitLog.writeLogged(rows.toDF("part", "off", "payload"),
        out, "src", flushSize = 1 + rnd.nextInt(2))
      if (rnd.nextBoolean())
        pinned :+= (CommitLog.latestVersion(spark, out, "src") ->
          CommitLog.snapshot(spark, out, "src").toSet)
      if (rnd.nextInt(3) == 0)
        CommitLog.compactLogged(spark, out, "src", targetRecords = 4)
    }
    assert(pinned.nonEmpty)
    pinned.zipWithIndex.foreach { case ((v, want), i) =>
      val dst = s"branch$i"
      CommitLog.cloneTopic(spark, out, "src", dst, asOf = v)
      val got = CommitLog.snapshot(spark, out, dst).toSet
      // same files, every name re-encoded to the branch topic
      assert(got === want.map(_.replace("/src+", s"/$dst+")),
        s"clone of pin $v diverged")
      // and the branch's data equals the pinned read of the source
      assert(CommitLog.read(spark, out, dst).count() ===
        CommitLog.read(spark, out, "src", asOf = v).count())
      // offset recovery on the branch sees the re-encoded names
      assert(CommitLog.maxOffsets(spark, out, dst).nonEmpty)
    }
  }
}
