package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Z-order clustering: content is preserved exactly, the rewrite is a
  * NEW-topic atomic publish, and — the point of the operator — the
  * stats plane prunes files on EVERY clustered column afterwards,
  * where the ingest-ordered original prunes on none of them. */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  /** 4k rows whose `a`/`b` are decorrelated from arrival order (and
    * from each other): every ingest-ordered file spans nearly the full
    * a/b range, so range predicates can't skip anything until the
    * layout is clustered. */
  private def ingest(out: String): Unit = {
    val rows = (0 until 4096).map { i =>
      val a = (i * 2654435761L) % 1000 // Knuth-hash scramble
      val b = (i * 40503L + 7) % 1000
      (i.toLong % 4, i.toLong, a, b, s"payload-$i")
    }
    CommitLog.writeLogged(rows.toDF("part", "off", "a", "b", "payload"),
      out, "raw", flushSize = 256, statsCols = Seq("a", "b"))
  }

  test("clustering preserves content exactly and keeps provenance") {
    val out = Files.createTempDirectory("graft-zorder").toString
    ingest(out)
    ZOrder.cluster(spark, out, "raw", "clustered", Seq("a", "b"),
      flushSize = 256, numParts = 4)
    val src = CommitLog.read(spark, out, "raw")
      .select($"part", $"off", $"a", $"b", $"payload")
    val dst = CommitLog.read(spark, out, "clustered")
      .select($"src_part".as("part"), $"src_off".as("off"),
        $"a", $"b", $"payload")
    assert(dst.exceptAll(src).isEmpty && src.exceptAll(dst).isEmpty,
      "clustered rows must be exactly the source rows")
    // curve-order coordinates are a valid log addressing: offsets
    // unique per destination partition
    val dups = CommitLog.read(spark, out, "clustered")
      .groupBy($"part", $"off").count().filter($"count" > 1).count()
    assert(dups == 0)
  }

  test("stats plane prunes on BOTH clustered columns; original prunes on neither") {
    val out = Files.createTempDirectory("graft-zorder").toString
    ingest(out)
    // 32 clustered files: fine enough granularity that the pruning
    // ratio is stable across range-sampler draws
    ZOrder.cluster(spark, out, "raw", "clustered", Seq("a", "b"),
      flushSize = 128, numParts = 4)
    def survivors(topic: String, pred: org.apache.spark.sql.Column): Int = {
      val snap = CommitLog.snapshot(spark, out, topic)
      FileStats.pruneRels(spark, out, topic, pred, snap).size
    }
    def total(topic: String): Int =
      CommitLog.snapshot(spark, out, topic).size
    for (pred <- Seq($"a" >= 100L && $"a" < 200L,
        $"b" >= 700L && $"b" < 800L,
        $"a" < 150L && $"b" < 150L)) {
      val rawKept = survivors("raw", pred)
      val zKept = survivors("clustered", pred)
      // arrival order is scrambled: raw files span ~the full range, so
      // skipping barely bites (an occasional file misses a 10% slab)
      assert(rawKept >= total("raw") * 85 / 100,
        s"raw pruned suspiciously well for $pred: $rawKept/${total("raw")}")
      assert(zKept <= total("clustered") / 2,
        s"clustered layout must prune most files for $pred " +
          s"(kept $zKept of ${total("clustered")})")
    }
    // and the pruned read returns the same rows as the full scan
    val pred = $"a" >= 100L && $"a" < 200L && $"b" < 500L
    val pruned = FileStats.readPruned(spark, out, "clustered", pred)
      .select($"src_off").as[Long].collect().sorted
    val full = CommitLog.read(spark, out, "clustered").filter(pred)
      .select($"src_off").as[Long].collect().sorted
    assert(pruned.sameElements(full))
  }

  test("mortonInterleave lays bit i of column c at position i*k + c") {
    val df = (0 until 4096).map { i =>
      ((i / 64).toLong, (i % 64).toLong)
    }.toDF("x", "y")
    val z = df.select($"x", $"y",
      ZOrder.mortonInterleave(Seq($"x", $"y")).as("z")).collect()
    def morton(a: Long, b: Long): Long = {
      var r = 0L
      for (i <- 0 until 6) {
        r |= ((a >> i) & 1L) << (2 * i)
        r |= ((b >> i) & 1L) << (2 * i + 1)
      }
      r
    }
    z.foreach { row =>
      val (x, y, got) = (row.getLong(0), row.getLong(1), row.getLong(2))
      assert(got == morton(x, y), s"z($x,$y)")
    }
    // withZValue composes equi-depth ranks into that interleave: equal
    // inputs share a z, and the curve origin is the all-minimum corner
    val withZ = ZOrder.withZValue(df, Seq("x", "y"))
      .select($"x", $"y", $"__z").collect()
    val zOf = withZ.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(zOf((0L, 0L)) == withZ.map(_.getLong(2)).min,
      "the all-minimum corner must sit at the curve origin")
    assert(zOf((63L, 63L)) == withZ.map(_.getLong(2)).max,
      "the all-maximum corner must sit at the curve end")
  }

  test("nulls rank first and cluster together") {
    val out = Files.createTempDirectory("graft-zorder").toString
    val rows = (0 until 1024).map { i =>
      val a: java.lang.Long = if (i % 8 == 0) null else (i * 37L) % 500
      (i.toLong % 2, i.toLong, a, s"p$i")
    }
    CommitLog.writeLogged(rows.toDF("part", "off", "a", "payload"),
      out, "raw", flushSize = 128)
    ZOrder.cluster(spark, out, "raw", "clustered", Seq("a"),
      flushSize = 128, numParts = 2)
    val dst = CommitLog.read(spark, out, "clustered")
    assert(dst.count() == 1024)
    assert(dst.filter($"a".isNull).count() == 128)
    // nulls share z = 0, the curve's origin: they land at the head of
    // one destination partition, interleaved only with whatever
    // non-null values share the first bucket — never scattered
    val nullHome = dst.filter($"a".isNull)
      .agg(countDistinct($"part"), max($"off")).collect()(0)
    assert(nullHome.getLong(0) == 1L, "nulls must share one partition")
    assert(nullHome.getLong(1) < 256L,
      "nulls must sit within the curve head (first files), got max off " +
        nullHome.getLong(1))
  }

  test("clustering survives the nightly maintain: compaction merges adjacent curve segments") {
    val out = Files.createTempDirectory("graft-zorder").toString
    ingest(out)
    ZOrder.cluster(spark, out, "raw", "clustered", Seq("a", "b"),
      flushSize = 128, numParts = 2)
    val filesBefore = CommitLog.snapshot(spark, out, "clustered").size
    // compaction merges ADJACENT offset ranges = adjacent z-curve
    // segments, so merged files still cover contiguous curve spans and
    // maintain's stats refresh re-covers them
    CommitLog.maintain(spark, out, "clustered", targetRecords = 256,
      graceMs = 0L)
    val snap = CommitLog.snapshot(spark, out, "clustered")
    assert(snap.size < filesBefore, "compaction must have merged files")
    val pred = $"a" >= 100L && $"a" < 200L
    val kept = FileStats.pruneRels(spark, out, "clustered", pred, snap).size
    // merging adjacent segments COARSENS the boxes (each file now spans
    // a longer curve stretch) but cannot scatter them — a 10% slab must
    // still skip a solid share of the merged files
    assert(kept <= snap.size * 3 / 4,
      s"pruning must still bite after maintain (kept $kept of ${snap.size})")
    // and the merged layout still reads back the full content
    assert(CommitLog.read(spark, out, "clustered").count() == 4096)
  }

  test("plan shape: z-value assignment is a pure projection, the rewrite's only exchange is the range shuffle") {
    val out = Files.createTempDirectory("graft-zorder").toString
    ingest(out)
    val data = CommitLog.read(spark, out, "raw")
      .withColumnRenamed("part", "src_part")
      .withColumnRenamed("off", "src_off")
    // AQE off for the inspection: AdaptiveSparkPlanExec is a leaf, so
    // collecting exchanges through it would pass vacuously
    def exchanges(df: org.apache.spark.sql.DataFrame) = {
      val conf = spark.conf
      val prev = conf.get("spark.sql.adaptive.enabled")
      conf.set("spark.sql.adaptive.enabled", "false")
      try df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      finally conf.set("spark.sql.adaptive.enabled", prev)
    }
    // bucket lookup + interleave never shuffle (the quantile pass is a
    // separate bounded aggregate, not part of this plan)
    assert(exchanges(ZOrder.withZValue(data, Seq("a", "b"))).isEmpty,
      "withZValue must be projection-only")
    val arranged = ZOrder.withZValue(data, Seq("a", "b"))
      .repartitionByRange(4, $"__z").sortWithinPartitions($"__z")
    val ex = exchanges(arranged)
    assert(ex.size == 1, s"the rewrite pays exactly ONE shuffle, got ${ex.size}")
    assert(ex.head.outputPartitioning
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RangePartitioning],
      "and it is the z-range exchange")
  }

  test("string columns cluster by leading-bytes order: domain predicates prune") {
    val out = Files.createTempDirectory("graft-zorder").toString
    val rows = (0 until 4096).map { i =>
      val dom = f"site-${(i * 2654435761L) % 500}%03d.example"
      (i.toLong % 4, i.toLong, dom, i.toLong)
    }
    CommitLog.writeLogged(
      rows.toDF("part", "off", "domain", "payload"),
      out, "raw", flushSize = 256, statsCols = Seq("domain"))
    ZOrder.cluster(spark, out, "raw", "clustered", Seq("domain"),
      flushSize = 256, numParts = 4)
    val snap = CommitLog.snapshot(spark, out, "clustered")
    val pred = $"domain" >= "site-100" && $"domain" < "site-200"
    val kept = FileStats.pruneRels(spark, out, "clustered", pred, snap).size
    assert(kept <= snap.size / 2,
      s"string range must prune most clustered files (kept $kept/${snap.size})")
    // raw layout: arrival order is scrambled, nothing prunes
    val rawSnap = CommitLog.snapshot(spark, out, "raw")
    assert(FileStats.pruneRels(spark, out, "raw", pred, rawSnap).size == rawSnap.size)
    // pruned read still exact
    val a = FileStats.readPruned(spark, out, "clustered", pred)
      .select($"src_off").as[Long].collect().sorted
    val b = CommitLog.read(spark, out, "clustered").filter(pred)
      .select($"src_off").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("recluster refreshes the layout after source growth and DML, atomically") {
    val out = Files.createTempDirectory("graft-zorder").toString
    ingest(out)
    ZOrder.cluster(spark, out, "raw", "clustered", Seq("a", "b"),
      flushSize = 256, numParts = 4)
    // the source grows AND takes an erasure
    val extra = (4096 until 5120).map { i =>
      val a = (i * 2654435761L) % 1000
      val b = (i * 40503L + 7) % 1000
      (i.toLong % 4, i.toLong, a, b, s"payload-$i")
    }
    CommitLog.writeLogged(extra.toDF("part", "off", "a", "b", "payload"),
      out, "raw", flushSize = 256)
    CommitLog.deleteWhere(spark, out, "raw", $"payload" === "payload-17")
    val before = CommitLog.latestVersion(spark, out, "clustered")
    ZOrder.recluster(spark, out, "raw", "clustered", flushSize = 256,
      numParts = 4)
    val after = CommitLog.latestVersion(spark, out, "clustered")
    assert(after == before + 1, "one atomic swap version")
    // new generation = exactly the current source content
    val src = CommitLog.read(spark, out, "raw")
      .select($"part", $"off", $"a", $"b", $"payload")
    val dst = CommitLog.read(spark, out, "clustered")
      .select($"src_part".as("part"), $"src_off".as("off"),
        $"a", $"b", $"payload")
    assert(dst.count() == 5119)
    assert(dst.exceptAll(src).isEmpty && src.exceptAll(dst).isEmpty)
    // pruning re-covers the new generation (cols recovered from the
    // stats plane, not re-passed)
    val snap = CommitLog.snapshot(spark, out, "clustered")
    val kept = FileStats.pruneRels(spark, out, "clustered",
      $"a" >= 100L && $"a" < 200L, snap)
    assert(kept.size <= snap.size * 3 / 4,
      s"kept ${kept.size}/${snap.size}")
    // time travel: the PREVIOUS generation still reads whole, as of
    // its version — layout swaps are versions like any other
    val old = CommitLog.read(spark, out, "clustered", asOf = before)
    assert(old.count() == 4096)
    // generations never share partition ids
    val oldParts = old.select($"part").distinct().as[Long].collect().toSet
    val newParts = CommitLog.read(spark, out, "clustered")
      .select($"part").distinct().as[Long].collect().toSet
    assert(oldParts.intersect(newParts).isEmpty)
  }

  test("maintainClustered: bootstrap, change-gated refresh, generation reclaim") {
    val out = Files.createTempDirectory("graft-zorder").toString
    ingest(out)
    // tick 1: bootstrap
    ZOrder.maintainClustered(spark, out, "raw", "clustered",
      cols = Seq("a", "b"), flushSize = 256, numParts = 4, graceMs = 0L)
    val v1 = CommitLog.latestVersion(spark, out, "clustered")
    assert(CommitLog.read(spark, out, "clustered").count() == 4096)
    // tick 2: source unchanged — NO spurious rewrite
    ZOrder.maintainClustered(spark, out, "raw", "clustered",
      flushSize = 256, numParts = 4, graceMs = 0L)
    assert(CommitLog.latestVersion(spark, out, "clustered") == v1,
      "an unchanged source must not trigger a generation")
    // source erasure, tick 3: converges, old generation reclaimed
    CommitLog.deleteWhere(spark, out, "raw", $"payload" === "payload-7")
    ZOrder.maintainClustered(spark, out, "raw", "clustered",
      flushSize = 256, numParts = 4, graceMs = 0L)
    val dst = CommitLog.read(spark, out, "clustered")
    assert(dst.count() == 4095)
    assert(dst.filter($"payload" === "payload-7").count() == 0)
    // tick 4 (still unchanged): maintain's truncate+vacuum (grace 0)
    // has reclaimed the superseded generation's physical files
    ZOrder.maintainClustered(spark, out, "raw", "clustered",
      flushSize = 256, numParts = 4, graceMs = 0L)
    val onDisk = BatchWriter.listCommittedRel(spark, out, "clustered")
    val live = CommitLog.snapshot(spark, out, "clustered").toSet
    assert(onDisk.forall(live.contains),
      s"superseded generations must vacuum away: ${onDisk.filterNot(live)}")
  }

  test("interleave refuses bit positions beyond a Long (JVM shifts wrap at 64)") {
    intercept[IllegalArgumentException] {
      ZOrder.mortonInterleave((1 to 8).map(i => lit(i.toLong)), bits = 10)
    }
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      // 8 columns x 10 bits = 80 positions: shiftleft(_, 79) would
      // actually shift by 15 and fold coordinates silently
      ZOrder.withZValue(df.select((1 to 8).map(i =>
        lit(i.toLong).as(s"c$i")): _*), (1 to 8).map(i => s"c$i"), bits = 10)
    }
  }

  test("refuses an existing destination topic and log-coordinate columns") {
    val out = Files.createTempDirectory("graft-zorder").toString
    ingest(out)
    ZOrder.cluster(spark, out, "raw", "clustered", Seq("a"),
      flushSize = 256, numParts = 2)
    intercept[IllegalArgumentException] {
      ZOrder.cluster(spark, out, "raw", "clustered", Seq("b"),
        flushSize = 256, numParts = 2)
    }
    intercept[IllegalArgumentException] {
      ZOrder.cluster(spark, out, "raw", "c2", Seq("off"),
        flushSize = 256, numParts = 2)
    }
    intercept[IllegalArgumentException] {
      ZOrder.cluster(spark, out, "raw", "raw", Seq("a"),
        flushSize = 256, numParts = 2)
    }
  }
}
