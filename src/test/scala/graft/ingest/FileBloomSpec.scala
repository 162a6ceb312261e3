package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bloom file skipping: point predicates on high-cardinality,
  * order-uncorrelated columns — where range stats keep every file —
  * refute most files, with no false negatives, conservative behavior
  * on uncovered files, and refresh re-coverage after maintain. */
class FileBloomSpec extends SparkSuite {
  import spark.implicits._

  /** 4096 rows over 16 files; `uid` is a scrambled high-cardinality
    * key, so every file's (min, max) range spans ~everything. */
  private def ingest(out: String): Unit = {
    val rows = (0 until 4096).map { i =>
      val uid = (i * 2654435761L) % 100000
      (i.toLong % 4, i.toLong, uid, s"u-$uid", s"payload-$i")
    }
    CommitLog.writeLogged(
      rows.toDF("part", "off", "uid", "uname", "payload"),
      out, "t", flushSize = 256, statsCols = Seq("uid"))
  }

  test("point predicates prune where range stats cannot; never a false negative") {
    val out = Files.createTempDirectory("graft-bloom").toString
    ingest(out)
    FileBloom.install(spark, out, "t", Seq("uid", "uname"))
    val snap = CommitLog.snapshot(spark, out, "t")
    // range stats are near-useless: every file spans ~the full domain
    // (extreme values CAN range-prune, so probe mid-domain keys)
    val probes = Seq(17, 801, 2047, 4000).map(i => (i * 2654435761L) % 100000)
    for (v <- probes) {
      val pred = $"uid" === v
      assert(FileStats.pruneRels(spark, out, "t", pred, snap).size >=
        snap.size * 3 / 4, s"range stats pruned suspiciously for uid = $v")
      val kept = FileBloom.pruneRels(spark, out, "t", pred, snap)
      assert(kept.size <= snap.size / 2,
        s"bloom must refute most files for uid = $v (kept ${kept.size}/${snap.size})")
      // no false negatives: the pruned read returns exactly the rows
      val a = FileBloom.readPruned(spark, out, "t", pred)
        .select($"off").as[Long].collect().sorted
      val b = CommitLog.read(spark, out, "t").filter(pred)
        .select($"off").as[Long].collect().sorted
      assert(a.nonEmpty && a.sameElements(b), s"uid = $v")
    }
    // a value that exists nowhere prunes everything (fp-rate aside)
    val ghost = FileBloom.pruneRels(spark, out, "t", $"uid" === -12345L, snap)
    assert(ghost.size <= 2, s"nonexistent key kept ${ghost.size} files")
    // string column too
    val sKept = FileBloom.pruneRels(spark, out, "t",
      $"uname" === s"u-${probes.head}", snap)
    assert(sKept.size <= snap.size / 2)
  }

  test("IN lists keep the union of admitted files; conjuncts compose") {
    val out = Files.createTempDirectory("graft-bloom").toString
    ingest(out)
    FileBloom.install(spark, out, "t", Seq("uid"))
    val snap = CommitLog.snapshot(spark, out, "t")
    val v1 = (17L * 2654435761L) % 100000
    val v2 = (801L * 2654435761L) % 100000
    val inKept = FileBloom.pruneRels(spark, out, "t",
      $"uid".isin(v1, v2), snap)
    val k1 = FileBloom.pruneRels(spark, out, "t", $"uid" === v1, snap).toSet
    val k2 = FileBloom.pruneRels(spark, out, "t", $"uid" === v2, snap).toSet
    assert(inKept.toSet == (k1 union k2))
    // conjunction with a non-equality clause: the bloom leg still prunes
    val mixed = FileBloom.pruneRels(spark, out, "t",
      $"uid" === v1 && $"payload".startsWith("payload"), snap)
    assert(mixed.toSet == k1)
    // contradictory conjunction of two point values: intersection
    val both = FileBloom.pruneRels(spark, out, "t",
      $"uid" === v1 && $"uid" === v2, snap)
    assert(both.toSet == (k1 intersect k2))
  }

  test("uncovered files are kept; commit-time installFor covers appends") {
    val out = Files.createTempDirectory("graft-bloom").toString
    ingest(out)
    FileBloom.install(spark, out, "t", Seq("uid"))
    // append WITHOUT coverage: new files must always be kept
    val extra = (5000 until 5200).map(i =>
      (i.toLong % 4, i.toLong, 777777L, s"u", s"p")).toDF(
      "part", "off", "uid", "uname", "payload")
    CommitLog.writeLogged(extra, out, "t", flushSize = 100)
    val snap = CommitLog.snapshot(spark, out, "t")
    val kept = FileBloom.pruneRels(spark, out, "t",
      $"uid" === 777777L, snap).toSet
    val rows = FileBloom.readPruned(spark, out, "t", $"uid" === 777777L).count()
    assert(rows == 200, "rows in uncovered files must never be lost")
    assert(kept.nonEmpty)
    // a covered-plane refresh picks the appends up and keeps pruning
    FileBloom.refresh(spark, out, "t")
    val kept2 = FileBloom.pruneRels(spark, out, "t",
      $"uid" === 777777L, snap)
    assert(FileBloom.readPruned(spark, out, "t", $"uid" === 777777L)
      .count() == 200)
    // the ghost key now prunes across the WHOLE topic again
    assert(FileBloom.pruneRels(spark, out, "t", $"uid" === -1L, snap)
      .size <= 2)
    assert(kept2.nonEmpty)
  }

  test("unservable shapes never prune: casts, ranges, null literals") {
    val out = Files.createTempDirectory("graft-bloom").toString
    ingest(out)
    FileBloom.install(spark, out, "t", Seq("uid"))
    val snap = CommitLog.snapshot(spark, out, "t")
    for (pred <- Seq(
        $"uid" > 50L, // range: not this plane's business
        $"uid".cast("string") === "17", // cast over the column
        $"uid" === lit(null).cast("long"), // null literal
        $"payload" === "payload-1")) { // un-bloomed column
      assert(FileBloom.pruneRels(spark, out, "t", pred, snap).size ==
        snap.size, s"must keep everything for $pred")
    }
  }

  test("updateWhere redaction: the REPLACEMENT value is findable through the plane") {
    val out = Files.createTempDirectory("graft-bloom").toString
    ingest(out)
    FileBloom.install(spark, out, "t", Seq("uid"))
    val victim = (17L * 2654435761L) % 100000
    // rewrite the victim's rows to a sentinel uid the plane has never
    // seen: rewritten files carry NEW names (the swap's split logic
    // never reuses a name), so they are uncovered -> conservative scan
    CommitLog.updateWhere(spark, out, "t", $"uid" === victim,
      Map("uid" -> lit(424242L)))
    val found = FileBloom.readPruned(spark, out, "t", $"uid" === 424242L)
    assert(found.count() == (0 until 4096)
      .count(i => (i * 2654435761L) % 100000 == victim))
    // and the old value is gone regardless of which files pruning opens
    assert(FileBloom.readPruned(spark, out, "t", $"uid" === victim)
      .count() == 0)
    // refresh re-covers the rewrites; the sentinel still findable
    FileBloom.refresh(spark, out, "t")
    assert(FileBloom.readPruned(spark, out, "t", $"uid" === 424242L)
      .count() > 0)
  }

  test("deleteWhere on a point predicate composes with the bloom plane") {
    val out = Files.createTempDirectory("graft-bloom").toString
    ingest(out)
    FileBloom.install(spark, out, "t", Seq("uid"))
    val victim = (801L * 2654435761L) % 100000
    CommitLog.deleteWhere(spark, out, "t", $"uid" === victim)
    val remaining = CommitLog.read(spark, out, "t")
    assert(remaining.filter($"uid" === victim).count() == 0)
    val expectGone = (0 until 4096)
      .count(i => (i * 2654435761L) % 100000 == victim)
    assert(expectGone > 0 && remaining.count() == 4096 - expectGone)
  }

  test("floating-point equality pins: -0.0 and every NaN bit pattern agree with Spark") {
    // Spark says -0.0 === 0.0 and NaN === NaN (any bit pattern); the
    // plane's install/probe hashes must agree or a file holding -0.0
    // would be refuted for `d === 0.0`. This holds because Catalyst's
    // xxhash64 normalizes both (verified empirically); pin it so a
    // hash-function change can never silently re-introduce the skew.
    val out = Files.createTempDirectory("graft-bloom-fp").toString
    val oddNaN = java.lang.Double.longBitsToDouble(0xfff0000000000001L)
    CommitLog.writeLogged(Seq(
        (0L, 0L, -0.0), (0L, 1L, oddNaN), (0L, 2L, 3.5))
      .toDF("part", "off", "d"), out, "t", flushSize = 1)
    FileBloom.install(spark, out, "t", Seq("d"))
    val snap = CommitLog.snapshot(spark, out, "t")
    for ((pred, wantOffs) <- Seq(
        ($"d" === 0.0, Set(0L)),
        ($"d" === -0.0, Set(0L)),
        ($"d" === Double.NaN, Set(1L)),
        ($"d" === 3.5, Set(2L)))) {
      val keep = FileBloom.pruneRels(spark, out, "t", pred, snap)
      val got = CommitLog.readFiles(spark, out, "t", keep)
        .filter(pred).select("off").as[Long].collect().toSet
      assert(got === wantOffs, s"$pred diverged through the bloom plane")
    }
  }
}
