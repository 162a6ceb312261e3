package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Data skipping over the commit log: the `_stats` sidecar plane
  * prunes files whose column ranges refute a predicate, is
  * conservative by absence (new/rewritten files always scan), and
  * composes with row-level DML. */
class FileStatsSpec extends SparkSuite {
  import spark.implicits._

  private val T = "t"

  /** Three appends of 100 rows each — distinct `v` ranges per publish,
    * small files within, so both the file COUNT and the range spread
    * give pruning something to bite on. */
  private def build(out: String): Unit =
    for (base <- Seq(0, 100, 200)) {
      val rows = (base until base + 100).map { i =>
        (i.toLong % 2, i.toLong, i.toLong * 10,
          f"k$i%03d", i.toDouble / 4.0)
      }
      CommitLog.writeLogged(
        rows.toDF("part", "off", "v", "s", "d"), out, T, flushSize = 25)
    }

  test("pruned reads equal full filtered reads, and actually skip files") {
    val out = Files.createTempDirectory("fs-prune").toString
    build(out)
    assert(FileStats.install(spark, out, T, Seq("v", "s", "d")) === 2L)
    val snap = CommitLog.snapshot(spark, out, T)
    for (pred <- Seq(
        col("v") > 2500L, col("v") === 1230L, col("v") <= 40L,
        col("s") === "k042", col("s") < "k005",
        col("d") >= 70.0, col("d") === 12.25,
        col("v").between(980L, 1020L),
        col("v") === 40L || col("s") === "k270",
        col("v").isin(10L, 2990L),
        lit(5L) > col("v"))) {
      val kept = FileStats.pruneRels(spark, out, T, pred, snap)
      assert(kept.size < snap.size, s"$pred pruned nothing")
      val pruned = FileStats.readPruned(spark, out, T, pred)
        .select("part", "off", "v", "s", "d").collect().toSet
      val full = CommitLog.read(spark, out, T).filter(pred)
        .select("part", "off", "v", "s", "d").collect().toSet
      assert(pruned === full, s"$pred pruned read diverged")
    }
    // a predicate no file can satisfy prunes everything, and the
    // schema-anchor read still answers (empty) correctly
    assert(FileStats.pruneRels(spark, out, T, col("v") < 0L, snap).isEmpty)
    assert(FileStats.readPruned(spark, out, T, col("v") < 0L).count() === 0L)
  }

  test("readPruned forwards the format to the resolution probe (json topic)") {
    val out = Files.createTempDirectory("fs-json").toString
    for (base <- Seq(0, 100)) {
      val rows = (base until base + 100).map(i => (i.toLong % 2, i.toLong, i.toLong * 10))
      CommitLog.writeLogged(rows.toDF("part", "off", "v"), out, T,
        flushSize = 50, format = "json")
    }
    assert(FileStats.install(spark, out, T, Seq("v"), format = "json") === 1L)
    // pre-fix, pruneRels probed the predicate against a json data
    // file with the PARQUET reader and threw at plan time
    val pruned = FileStats.readPruned(spark, out, T, col("v") >= 1500L,
      format = "json")
    assert(pruned.select("off").as[Long].collect().sorted ===
      (150L until 200L).toArray)
  }

  test("unsupported shapes, casts, and non-ASCII never refute") {
    val out = Files.createTempDirectory("fs-maybe").toString
    build(out)
    FileStats.install(spark, out, T, Seq("v", "s"))
    val snap = CommitLog.snapshot(spark, out, T)
    // arithmetic on the column: not a stats shape — keep everything
    assert(FileStats.pruneRels(spark, out, T, col("v") % 7 === 0, snap)
      === snap)
    // non-ASCII literal against ASCII bounds: compared in UTF-8 byte
    // order (Spark's own), "ké" sorts above every k0NN bound — all
    // files refute, and the anchored read still answers (empty)
    assert(FileStats.pruneRels(spark, out, T, col("s") === "ké", snap)
      .isEmpty)
    assert(FileStats.readPruned(spark, out, T, col("s") === "ké")
      .count() === 0L)
    // long→double is NOT an exact embedding (rounds past 2^53): the
    // attr-side cast refuses to unwrap and everything stays a
    // candidate — conservative, never wrong
    assert(FileStats.pruneRels(spark, out, T,
      col("v").cast("double") > 2500.0, snap) === snap)
    // …but the pruned read is still CORRECT through the kept files
    assert(FileStats.readPruned(spark, out, T,
        col("v").cast("double") > 2500.0).count() ===
      CommitLog.read(spark, out, T)
        .filter(col("v").cast("double") > 2500.0).count())
  }

  test("conservative by absence: files landing after install always scan") {
    val out = Files.createTempDirectory("fs-stale").toString
    build(out)
    FileStats.install(spark, out, T, Seq("v"))
    CommitLog.writeLogged(Seq((0L, 300L, 9999L, "x", 0.0))
      .toDF("part", "off", "v", "s", "d"), out, T, flushSize = 25)
    val snap = CommitLog.snapshot(spark, out, T)
    // 9999 is outside every INSTALLED range, but the new file has no
    // stats row — it must stay a candidate and the row must be found
    val kept = FileStats.pruneRels(spark, out, T, col("v") === 9999L, snap)
    assert(kept.size === 1)
    assert(FileStats.readPruned(spark, out, T, col("v") === 9999L)
      .count() === 1L)
    // re-install covers it again
    FileStats.install(spark, out, T, Seq("v"))
    assert(FileStats.pruneRels(spark, out, T, col("v") === 123456L,
      CommitLog.snapshot(spark, out, T)).isEmpty)
  }

  test("null semantics: IS NULL prunes to null-holding files, all-null refutes ranges") {
    val out = Files.createTempDirectory("fs-null").toString
    // one file with nulls in `s`, one without, one with s entirely null
    CommitLog.writeLogged(
      Seq((0L, 0L, 1L, "a"), (0L, 1L, 2L, null.asInstanceOf[String]))
        .toDF("part", "off", "v", "s"), out, T, flushSize = 10)
    CommitLog.writeLogged(Seq((0L, 2L, 3L, "b"), (0L, 3L, 4L, "c"))
      .toDF("part", "off", "v", "s"), out, T, flushSize = 10)
    CommitLog.writeLogged(
      Seq((0L, 4L, 5L), (0L, 5L, 6L)).toDF("part", "off", "v")
        .withColumn("s", lit(null).cast("string")), out, T, flushSize = 10)
    FileStats.install(spark, out, T, Seq("v", "s"))
    val snap = CommitLog.snapshot(spark, out, T)
    assert(FileStats.pruneRels(spark, out, T, col("s").isNull, snap).size === 2)
    assert(FileStats.pruneRels(spark, out, T, col("s").isNotNull, snap).size === 2)
    // every comparison against the all-null file is refuted
    assert(FileStats.pruneRels(spark, out, T, col("s") <= "zzz", snap).size === 2)
    assert(FileStats.readPruned(spark, out, T, col("s").isNull)
      .count() === 3L)
    assert(FileStats.readPruned(spark, out, T, col("s") >= "b")
      .select("off").as[Long].collect().toSet === Set(2L, 3L))
  }

  test("maintain refreshes the plane: compaction's rewrites are re-covered") {
    val out = Files.createTempDirectory("fs-maint").toString
    build(out)
    FileStats.install(spark, out, T, Seq("v", "s"))
    // compaction merges the small files — every merged output is a NEW
    // rel with no stats row; maintain's refresh step re-installs over
    // the plane's own recorded column set
    CommitLog.maintain(spark, out, T, targetRecords = 1000, graceMs = 0L)
    val snap = CommitLog.snapshot(spark, out, T)
    // full coverage again: an impossible predicate prunes EVERY file
    assert(FileStats.pruneRels(spark, out, T, col("v") < 0L, snap).isEmpty)
    assert(FileStats.pruneRels(spark, out, T, col("s") > "zzz", snap).isEmpty)
    // and selective reads still answer exactly through the new files
    assert(FileStats.readPruned(spark, out, T, col("v") === 2990L)
      .count() === 1L)
  }

  test("commit-time coverage and metadata-only aggregates") {
    val out = Files.createTempDirectory("fs-commit").toString
    for (base <- Seq(0, 100, 200)) {
      val rows = (base until base + 100).map { i =>
        (i.toLong % 2, i.toLong, i.toLong * 10,
          f"k$i%03d", i.toDouble / 4.0)
      }
      CommitLog.writeLogged(rows.toDF("part", "off", "v", "s", "d"),
        out, T, flushSize = 25, statsCols = Seq("v", "s"))
    }
    // pruning bites with ZERO install() calls — coverage landed at
    // commit time, one plane file per publish
    val snap = CommitLog.snapshot(spark, out, T)
    assert(FileStats.pruneRels(spark, out, T, col("v") > 2500L, snap).size
      < snap.size)
    // full coverage → count/min/max answered without opening data
    val (total, m) = FileStats.metaAggregates(spark, out, T)
      .getOrElse(fail("full commit-time coverage must aggregate"))
    assert(total === 300L)
    assert((m("v").lLo, m("v").lHi) === ((Some(0L), Some(2990L))))
    assert((m("s").sLo, m("s").sHi) === ((Some("k000"), Some("k299"))))
    assert(m("v").nNull === 0L && m("v").nRow === 300L)
    // an UNstatted publish opens a coverage gap: aggregates refuse
    // (falling back to a scan) rather than answer from partial stats
    CommitLog.writeLogged(Seq((0L, 300L, 5000L, "zz", 1.0))
      .toDF("part", "off", "v", "s", "d"), out, T, flushSize = 25)
    assert(FileStats.metaAggregates(spark, out, T).isEmpty)
    // ...while pruned reads stay correct (the gap file always scans)
    assert(FileStats.readPruned(spark, out, T, col("v") === 5000L)
      .count() === 1L)
    // refresh reconverges coverage over the plane's recorded columns
    FileStats.refresh(spark, out, T)
    val (total2, m2) = FileStats.metaAggregates(spark, out, T).get
    assert(total2 === 301L)
    assert(m2("v").lHi === Some(5000L))
  }

  test("deleteWhere rides the plane: pruned target selection, exact erasure") {
    val out = Files.createTempDirectory("fs-dml").toString
    build(out)
    FileStats.install(spark, out, T, Seq("v"))
    CommitLog.deleteWhere(spark, out, T, col("v").between(1000L, 1200L))
    val left = CommitLog.read(spark, out, T).select("v").as[Long]
      .collect().toSet
    assert(!left.exists(v => v >= 1000L && v <= 1200L))
    assert(left.size === 300 - 21)
    // the rewrite's files carry no stats rows — a second DML on the
    // SAME range finds no candidates via stats only where stats
    // exist, scans the rewrites, and converges to a no-op
    val ver = CommitLog.latestVersion(spark, out, T)
    assert(CommitLog.deleteWhere(spark, out, T,
      col("v").between(1000L, 1200L)) === ver)
  }

  test("NaN follows Spark's order: never wrongly pruned, meta min skips NaN") {
    val out = Files.createTempDirectory("fs-nan").toString
    // file A plain, file B NaN mixed with real values, file C all NaN —
    // Spark orders NaN GREATER than everything (`NaN > x` is true,
    // `NaN === NaN` is true); pre-fix, the driver-side IEEE compares
    // refuted `d > 100` for B/C even though their NaN rows match
    CommitLog.writeLogged(Seq((0L, 0L, 1.0), (0L, 1L, 5.0))
      .toDF("part", "off", "d"), out, T, flushSize = 10)
    CommitLog.writeLogged(Seq((0L, 2L, 7.0), (0L, 3L, Double.NaN))
      .toDF("part", "off", "d"), out, T, flushSize = 10)
    CommitLog.writeLogged(Seq((0L, 4L, Double.NaN))
      .toDF("part", "off", "d"), out, T, flushSize = 10)
    FileStats.install(spark, out, T, Seq("d"))
    val snap = CommitLog.snapshot(spark, out, T)
    for (pred <- Seq(
        col("d") > 100.0, col("d") >= 100.0, col("d") === Double.NaN,
        col("d") >= Double.NaN, col("d") < Double.NaN,
        col("d") > 6.0, col("d") < 2.0, col("d") <= 0.5,
        col("d") === 7.0)) {
      val pruned = FileStats.readPruned(spark, out, T, pred)
        .select("off").as[Long].collect().toSet
      val full = CommitLog.read(spark, out, T).filter(pred)
        .select("off").as[Long].collect().toSet
      assert(pruned === full, s"$pred diverged under NaN")
    }
    // refutation still bites where NaN cannot satisfy the predicate:
    // `< 2.0` is false for NaN (greatest), so only file A survives
    assert(FileStats.pruneRels(spark, out, T, col("d") < 2.0, snap)
      .size === 1)
    // metadata-only aggregates agree with a real scan: min SKIPS NaN
    // (JVM math.min would have reported NaN), max is NaN
    val (total, m) = FileStats.metaAggregates(spark, out, T).get
    assert(total === 5L)
    assert(m("d").dLo === Some(1.0))
    assert(m("d").dHi.exists(_.isNaN))
  }

  test("string pruning in Spark's UTF-8 order, exactly where UTF-16 diverges") {
    // U+1F600 (emoji, surrogate pair D83D DE00) vs U+FFFD: the JVM
    // sorts the emoji BELOW U+FFFD (first code unit D83D < FFFD),
    // Spark's UTF-8 byte order sorts it ABOVE (F0 9F… > EF BF…).
    // A driver-side JVM compare would REFUTE the emoji file for
    // `s > U+FFFE` and lose its matching rows; UTF-8 compare keeps it
    // and refutes the replacement-char file instead.
    val out = Files.createTempDirectory("fs-utf8").toString
    CommitLog.writeLogged(Seq((0L, 0L, "�"))
      .toDF("part", "off", "s"), out, T, flushSize = 1)
    CommitLog.writeLogged(Seq((0L, 1L, "😀")) // 😀
      .toDF("part", "off", "s"), out, T, flushSize = 1)
    FileStats.install(spark, out, T, Seq("s"))
    val snap = CommitLog.snapshot(spark, out, T)
    val pred = col("s") > "￾"
    val kept = FileStats.pruneRels(spark, out, T, pred, snap)
    assert(kept.size === 1, s"want only the emoji file kept, got $kept")
    assert(FileStats.readPruned(spark, out, T, pred)
      .select("off").as[Long].collect().toSeq === Seq(1L))
    // the reverse side: `s < U+FFFE` keeps only the U+FFFD file
    assert(FileStats.readPruned(spark, out, T, col("s") < "￾")
      .select("off").as[Long].collect().toSeq === Seq(0L))
    // metadata-only extrema merge in the same order: max is the emoji
    val (_, m) = FileStats.metaAggregates(spark, out, T).get
    assert(m("s").sHi === Some("😀"))
    assert(m("s").sLo === Some("�"))
  }

  test("non-binary collations never refute: the UTF8_BINARY gate") {
    // bounds are installed (and compared) in UTF8_BINARY byte order;
    // under any other collation that order is wrong both ways, so a
    // collated string column must degrade to "scan", never refute.
    // UTF8_LCASE: 'b' < 'a' is FALSE binary-wise for a file holding
    // only "B" (binary min "B" < "a"), but case-insensitively the
    // file's "B" equals "b" — refuting on binary bounds would need
    // collation-aware reasoning this plane does not do.
    val out = Files.createTempDirectory("fs-collate").toString
    CommitLog.writeLogged(Seq((0L, 0L, "B"))
      .toDF("part", "off", "s"), out, T, flushSize = 1)
    CommitLog.writeLogged(Seq((0L, 1L, "y"))
      .toDF("part", "off", "s"), out, T, flushSize = 1)
    FileStats.install(spark, out, T, Seq("s"))
    val snap = CommitLog.snapshot(spark, out, T)
    // sanity: the binary-collated predicate still prunes
    assert(FileStats.pruneRels(spark, out, T, col("s") > "c", snap)
      .size === 1)
    // the SAME shape under a non-binary collation keeps every file
    val collated = FileStats.pruneRels(spark, out, T,
      collate(col("s"), "UTF8_LCASE") > "c", snap)
    assert(collated.size === 2,
      s"collated column must never refute, got $collated")
    assert(FileStats.pruneRels(spark, out, T,
      collate(col("s"), "UNICODE") === "b", snap).size === 2)
  }

  test("property fuzz: pruned reads equal unpruned filters on hostile data") {
    // randomized files over long / double / string columns seeded with
    // the hostile values (NaN, infinities, -0.0, nulls, negatives,
    // non-ASCII, empty strings) x a random predicate grammar — the
    // three-valued walk must NEVER change filter semantics, only I/O.
    // 60 rounds would have caught the Spark-vs-IEEE NaN order bug.
    val rnd = new scala.util.Random(1913)
    val out = Files.createTempDirectory("fs-fuzz").toString
    val hostileD = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, -0.0, 0.0, -1e300, 1e-300, 2.5, -7.25)
    val hostileS = Seq("", "a", "zz", "k042", "éclair", "中文", "ZZ9",
      "😀", "�", "￿", "a😀b")
    def rl(): java.lang.Long =
      if (rnd.nextInt(8) == 0) null
      else Long.box(rnd.nextInt(41) - 20L)
    def rd(): java.lang.Double =
      if (rnd.nextInt(8) == 0) null
      else Double.box(if (rnd.nextInt(3) == 0)
        hostileD(rnd.nextInt(hostileD.size)) else rnd.nextInt(21) - 10.0)
    def rs(): String =
      if (rnd.nextInt(8) == 0) null
      else if (rnd.nextInt(3) == 0) hostileS(rnd.nextInt(hostileS.size))
      else f"k${rnd.nextInt(60)}%03d"
    for (base <- 0 until 3) {
      val rows = (0 until 20).map(i =>
        (base.toLong, (base * 20 + i).toLong, rl(), rd(), rs()))
      CommitLog.writeLogged(rows.toDF("part", "off", "l", "d", "s"),
        out, T, flushSize = 5)
    }
    FileStats.install(spark, out, T, Seq("l", "d", "s"))
    def rndPred(depth: Int): org.apache.spark.sql.Column = {
      def leaf(): org.apache.spark.sql.Column = rnd.nextInt(3) match {
        case 0 =>
          val v = rnd.nextInt(45) - 22L
          rnd.nextInt(5) match {
            case 0 => col("l") === v; case 1 => col("l") < v
            case 2 => col("l") >= v; case 3 => col("l").isNull
            case _ => col("l").isin(v, v + 3, v - 9)
          }
        case 1 =>
          val v = if (rnd.nextInt(4) == 0) hostileD(rnd.nextInt(hostileD.size))
                  else rnd.nextInt(25) - 12.5
          rnd.nextInt(5) match {
            case 0 => col("d") === v; case 1 => col("d") > v
            case 2 => col("d") <= v; case 3 => col("d").isNotNull
            case _ => col("d") >= v
          }
        case _ =>
          val v = if (rnd.nextInt(3) == 0) hostileS(rnd.nextInt(hostileS.size))
                  else f"k${rnd.nextInt(60)}%03d"
          rnd.nextInt(4) match {
            case 0 => col("s") === v; case 1 => col("s") < v
            case 2 => col("s") >= v; case _ => col("s").isNull
          }
      }
      if (depth == 0 || rnd.nextInt(3) == 0) leaf()
      else if (rnd.nextBoolean()) rndPred(depth - 1) && rndPred(depth - 1)
      else rndPred(depth - 1) || rndPred(depth - 1)
    }
    val full = CommitLog.read(spark, out, T).cache()
    full.count()
    for (round <- 0 until 60) {
      val pred = rndPred(2)
      val got = FileStats.readPruned(spark, out, T, pred)
        .select("off").as[Long].collect().toSet
      val want = full.filter(pred).select("off").as[Long].collect().toSet
      assert(got === want, s"round $round diverged on predicate: $pred")
    }
    full.unpersist()
  }
}
