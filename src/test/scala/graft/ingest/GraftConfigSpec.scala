package graft.ingest

import java.nio.file.Files

import graft.SparkSuite

/** Mirrors the reference's config suite
  * (`HdfsSinkConnectorConfigTest.java:57-245`): every supported codec
  * constructs, an unsupported one fails with the valid list,
  * enumerated keys expose recommended values, and
  * partitioner-dependent keys toggle visibility. */
class GraftConfigSpec extends SparkSuite {

  private val base = Map("flush.size" -> "3")

  test("every supported avro codec constructs (testAvroCompressionSettings)") {
    GraftConfig.AvroCodecs.foreach { codec =>
      val cfg = GraftConfig(base + ("avro.codec" -> codec))
      assert(cfg.avroCodec === codec)
    }
  }

  test("format.class accepts the reference's FQCNs across BOTH Format-API generations") {
    // old-API and new-API connectors carry the SAME config strings —
    // normalizing them is the whole OldRecordWriterWrapper story here
    for ((fqcn, short) <- GraftConfig.FormatClassAliases) {
      val cfg = GraftConfig(base + ("format.class" -> fqcn))
      assert(cfg.format === short, fqcn)
    }
    // engine short names still pass through untouched
    assert(GraftConfig(base + ("format.class" -> "json")).format === "json")
    // an unknown class is still rejected with the roster
    val e = intercept[IllegalArgumentException] {
      GraftConfig(base + ("format.class" -> "com.example.MyFormat"))
    }
    assert(e.getMessage.contains("unknown format"))
  }

  test("unsupported codec fails with the valid-values list (testUnsupportedAvroCompressionSettings)") {
    val e = intercept[IllegalArgumentException] {
      GraftConfig(base + ("avro.codec" -> "abc"))
    }
    assert(e.getMessage.contains("abc"))
    assert(e.getMessage.contains("null, deflate, snappy, bzip2"))
  }

  test("enumerated keys carry recommended values (testRecommendedValues)") {
    val vs = GraftConfig.validate(base).map(v => v.name -> v).toMap
    assert(vs("format.class").recommended === GraftConfig.Formats)
    assert(vs("avro.codec").recommended ===
      Seq("null", "deflate", "snappy", "bzip2"))
    assert(vs("partitioner.class").recommended ===
      Seq("default", "field", "time", "daily", "hourly"))
  }

  test("partitioner choice toggles dependent-key visibility") {
    def vis(partitioner: String): Map[String, Boolean] =
      GraftConfig.validate(base + ("partitioner.class" -> partitioner))
        .map(v => v.name -> v.visible).toMap
    val dependents = Seq("partition.field.name", "partition.duration.ms",
      "path.format", "locale", "timezone")

    val default = vis("default")
    dependents.foreach(k => assert(!default(k), s"$k visible under default"))

    val field = vis("field")
    assert(field("partition.field.name"))
    Seq("partition.duration.ms", "path.format", "locale", "timezone")
      .foreach(k => assert(!field(k), s"$k visible under field"))

    for (p <- Seq("daily", "hourly")) {
      val v = vis(p)
      assert(v("locale") && v("timezone"), p)
      assert(!v("partition.field.name") && !v("partition.duration.ms") &&
        !v("path.format"), p)
    }

    val time = vis("time")
    Seq("partition.duration.ms", "path.format", "locale", "timezone")
      .foreach(k => assert(time(k), s"$k invisible under time"))
  }

  test("invalid values fail at construction with ALL errors aggregated") {
    val e = intercept[IllegalArgumentException] {
      GraftConfig(Map(
        "flush.size" -> "-2",
        "timezone" -> "Mars/Olympus",
        "rotate.interval.ms" -> "0",
        "partitioner.class" -> "field")) // partition.field.name missing
    }
    val msg = e.getMessage
    assert(msg.contains("flush.size must be a positive record count"))
    assert(msg.contains("invalid timezone 'Mars/Olympus'"))
    assert(msg.contains("America/Chicago"), "timezone error suggests examples")
    assert(msg.contains("rotate.interval.ms must be -1 (disabled) or a positive"))
    assert(msg.contains("partition.field.name is required by the field partitioner"))
  }

  test("flush.size is required; unknown keys are rejected") {
    val e1 = intercept[IllegalArgumentException] { GraftConfig(Map.empty) }
    assert(e1.getMessage.contains("flush.size is required"))
    val e2 = intercept[IllegalArgumentException] {
      GraftConfig(base + ("flsh.size" -> "9"))
    }
    assert(e2.getMessage.contains("unknown configuration key 'flsh.size'"))
  }

  test("defaults mirror the reference's") {
    val cfg = GraftConfig(base)
    assert(cfg.flushSize === 3)
    assert(cfg.rotateIntervalMs === -1L)
    assert(cfg.rotateScheduleIntervalMs === -1L)
    assert(cfg.retryBackoffMs === 5000L)
    assert(cfg.shutdownTimeoutMs === 3000L)
    assert(cfg.zeroPadWidth === FileNaming.DefaultZeroPadWidth)
    assert(cfg.topicsDir === "topics")
    assert(cfg.directoryDelim === "/")
    assert(cfg.fileDelim === "+")
  }

  test("partition.duration.ms is required by the time partitioner only") {
    val e = intercept[IllegalArgumentException] {
      GraftConfig(base + ("partitioner.class" -> "time"))
    }
    assert(e.getMessage.contains(
      "partition.duration.ms is required by the time partitioner"))
    // -1 is fine everywhere else
    assert(GraftConfig(base).partitionDurationMs === -1L)
  }

  test("the config constructs the configured partitioner (partitioner.class + dependents)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 2015-04-02 01:00 UTC = 2015-04-01 18:00 America/Los_Angeles
    val df = Seq((3L, "click", java.sql.Timestamp.valueOf("2015-04-02 01:00:00")))
      .toDF("part", "event_type", "ts")
    def path(cfg: GraftConfig): String =
      df.select(cfg.partitionPath(col("part"), col("ts"), col).as("p"))
        .as[String].head()

    assert(path(GraftConfig(base)) === "partition=3")
    assert(path(GraftConfig(base ++ Map(
      "partitioner.class" -> "field",
      "partition.field.name" -> "event_type"))) === "event_type=click")
    assert(path(GraftConfig(base + ("partitioner.class" -> "daily"))) ===
      "year=2015/month=04/day=02")
    assert(path(GraftConfig(base ++ Map(
      "partitioner.class" -> "hourly",
      "timezone" -> "America/Los_Angeles"))) ===
      "year=2015/month=04/day=01/hour=18")
    assert(path(GraftConfig(base ++ Map(
      "partitioner.class" -> "time",
      "partition.duration.ms" -> "3600000",
      "timezone" -> "UTC",
      "locale" -> "fr-FR"))) === "year=2015/month=avril/day=02/hour=1")
  }

  test("partitioner.class shapes the written directory layout (field + daily)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(
      (0L, 0L, java.sql.Timestamp.valueOf("2026-03-01 10:00:00"), "click", "a"),
      (0L, 1L, java.sql.Timestamp.valueOf("2026-03-01 11:00:00"), "view", "b"),
      (0L, 2L, java.sql.Timestamp.valueOf("2026-03-02 09:00:00"), "click", "c"))
      .toDF("part", "off", "timestamp", "event_type", "payload")

    val outF = Files.createTempDirectory("cfg-field").toString
    GraftConfig(Map("flush.size" -> "10", "partitioner.class" -> "field",
      "partition.field.name" -> "event_type")).write(df, outF, "t")
    // one directory per field value (the reference's FieldPartitioner
    // layout, TopicPartitionWriterTest.java:153-207)
    assert(new java.io.File(s"$outF/topics/t").listFiles().map(_.getName).toSet ===
      Set("event_type=click", "event_type=view"))
    val clicks = spark.read.parquet(s"$outF/topics/t/event_type=click")
    assert(clicks.select(col("payload")).as[String].collect().toSet === Set("a", "c"))
    // offset recovery is layout-independent (recursive + filenames)
    assert(BatchWriter.maxCommittedOffsets(spark, s"$outF/topics", "t") === Map(0L -> 2L))

    val outD = Files.createTempDirectory("cfg-daily").toString
    GraftConfig(Map("flush.size" -> "10",
      "partitioner.class" -> "daily")).write(df, outD, "t")
    assert(new java.io.File(s"$outD/topics/t/year=2026/month=03/day=01").exists())
    assert(new java.io.File(s"$outD/topics/t/year=2026/month=03/day=02").exists())
    assert(spark.read.parquet(s"$outD/topics/t/year=2026/month=03/day=01").count() === 2)
  }

  test("rotate.interval.ms splits files on record-time buckets") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-03-01 10:00:00").getTime
    val df = (0L until 6L).map(o =>
        (0L, o, new java.sql.Timestamp(t0 + o * 30000L), s"v$o"))
      .toDF("part", "off", "timestamp", "payload")
    val out = Files.createTempDirectory("cfg-interval").toString
    // 60s buckets over 30s-spaced records: offsets {0,1},{2,3},{4,5}
    GraftConfig(Map("flush.size" -> "100",
      "rotate.interval.ms" -> "60000")).write(df, out, "t")
    assert(BatchWriter.listCommitted(spark, s"$out/topics", "t") === Seq(
      "t+0+0000000000+0000000001.parquet",
      "t+0+0000000002+0000000003.parquet",
      "t+0+0000000004+0000000005.parquet"))
    assert(BatchWriter.read(spark, s"$out/topics", "t").count() === 6)
  }

  test("out-of-order event time rotates on bucket CHANGE — ranges stay disjoint") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // offsets in order, event time zig-zagging across 60s buckets: a
    // group-by-bucket-value grouping would emit [1..2] and [0..3] —
    // overlapping ranges that compaction healing would then destroy
    val df = Seq(
      (0L, 0L, t("2026-03-01 10:00:30"), "a"),
      (0L, 1L, t("2026-03-01 09:59:30"), "b"),
      (0L, 2L, t("2026-03-01 09:59:40"), "c"),
      (0L, 3L, t("2026-03-01 10:00:40"), "d"))
      .toDF("part", "off", "timestamp", "payload")
    val out = Files.createTempDirectory("cfg-ooo").toString
    GraftConfig(Map("flush.size" -> "100",
      "rotate.interval.ms" -> "60000")).write(df, out, "t")
    assert(BatchWriter.listCommitted(spark, s"$out/topics", "t") === Seq(
      "t+0+0000000000+0000000000.parquet",
      "t+0+0000000001+0000000002.parquet",
      "t+0+0000000003+0000000003.parquet"))
  }

  test("rotation invariant under seeded random out-of-order time: per-dir ranges disjoint, no loss") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val t0 = java.sql.Timestamp.valueOf("2026-03-01 00:00:00").getTime
    // 2 kafka partitions × 2 field values × shuffled event times across
    // ~6 one-minute buckets — the adversarial mix of encoding gaps and
    // out-of-order time
    val rows = for (p <- Seq(0L, 1L); o <- 0L until 40L) yield
      (p, o, new java.sql.Timestamp(t0 + rnd.nextInt(360) * 1000L),
        if (rnd.nextBoolean()) "click" else "view", s"v-$p-$o")
    val df = rows.toDF("part", "off", "timestamp", "event_type", "payload")
    val out = Files.createTempDirectory("cfg-rand").toString
    GraftConfig(Map("flush.size" -> "7", "rotate.interval.ms" -> "60000",
      "partitioner.class" -> "field", "partition.field.name" -> "event_type"))
      .write(df, out, "t")

    // no loss, no duplication, payload routed with its record. (Like
    // the reference's value-only files, the kafka partition is
    // filename metadata, not file content — payload carries (p, o)
    // here, so distinct payloads prove exactly-once.)
    val back = spark.read.parquet(s"$out/topics/t/event_type=*")
    assert(back.count() === 80)
    assert(back.select(countDistinct(col("payload"))).as[Long].head() === 80)

    // within every directory, committed ranges are pairwise disjoint —
    // the invariant that keeps offset-ranged names meaningful
    val re = FileNaming.CommittedFilenameRegex.r
    for (dir <- new java.io.File(s"$out/topics/t").listFiles(); if dir.isDirectory) {
      val ranges = dir.listFiles().map(_.getName).collect {
        case re(_, p, s, e, _) => (p.toLong, s.toLong, e.toLong)
      }
      assert(ranges.nonEmpty, s"no committed files matched in ${dir.getName} " +
        "— naming/layout drifted and the disjointness check went vacuous")
      for (part <- ranges.map(_._1).distinct) {
        val rs = ranges.filter(_._1 == part).map(r => (r._2, r._3)).sortBy(_._1)
        rs.sliding(2).foreach {
          case Array((_, e1), (s2, _)) =>
            assert(s2 > e1, s"overlap in ${dir.getName} part $part: $rs")
          case _ =>
        }
      }
    }
  }

  test("a null partition-field value fails actionably and cleans staging") {
    import spark.implicits._
    val df = Seq((0L, 0L, "click", "a"), (0L, 1L, null, "b"))
      .toDF("part", "off", "event_type", "payload")
    val out = Files.createTempDirectory("cfg-nullenc").toString
    val e = intercept[IllegalArgumentException] {
      GraftConfig(Map("flush.size" -> "10", "partitioner.class" -> "field",
        "partition.field.name" -> "event_type")).write(df, out, "t")
    }
    assert(e.getMessage.contains("null/empty"))
    assert(!new java.io.File(s"$out/topics/+tmp/t").exists(), "staging cleaned")
    assert(BatchWriter.listCommitted(spark, s"$out/topics", "t").isEmpty, "nothing committed")
  }

  test("text format with a time partitioner drops the routing timestamp") {
    import spark.implicits._
    val df = Seq(
      (0L, 0L, java.sql.Timestamp.valueOf("2026-03-01 10:00:00"), "hello"),
      (0L, 1L, java.sql.Timestamp.valueOf("2026-03-02 10:00:00"), "world"))
      .toDF("part", "off", "timestamp", "payload")
    val out = Files.createTempDirectory("cfg-text-daily").toString
    GraftConfig(Map("flush.size" -> "10", "format.class" -> "text",
      "partitioner.class" -> "daily")).write(df, out, "t")
    val f = s"$out/topics/t/year=2026/month=03/day=01"
    assert(new java.io.File(f).exists())
    val lines = spark.read.text(s"$f/*.txt").collect().map(_.getString(0))
    assert(lines.toSeq === Seq("hello"))
  }

  test("text format with interval rotation works (ts consumed by rotation, then dropped)") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-03-01 10:00:00").getTime
    val df = (0L until 4L).map(o =>
        (0L, o, new java.sql.Timestamp(t0 + o * 45000L), s"line$o"))
      .toDF("part", "off", "timestamp", "payload")
    val out = Files.createTempDirectory("cfg-text-rot").toString
    GraftConfig(Map("flush.size" -> "100", "format.class" -> "text",
      "rotate.interval.ms" -> "60000")).write(df, out, "t")
    // 45s spacing over 60s buckets: bucket seq 0,0,1,2 → files [0,1],[2],[3]
    assert(BatchWriter.listCommitted(spark, s"$out/topics", "t") === Seq(
      "t+0+0000000000+0000000001.txt",
      "t+0+0000000002+0000000002.txt",
      "t+0+0000000003+0000000003.txt"))
    val lines = spark.read.text(s"$out/topics/t/partition=0/*.txt")
      .collect().map(_.getString(0)).sorted
    assert(lines.toSeq === Seq("line0", "line1", "line2", "line3"))
  }

  test("compact refuses encoded-layout topics up front") {
    import spark.implicits._
    val df = Seq(
      (0L, 0L, java.sql.Timestamp.valueOf("2026-03-01 10:00:00"), "click", "a"),
      (0L, 1L, java.sql.Timestamp.valueOf("2026-03-01 11:00:00"), "view", "b"))
      .toDF("part", "off", "timestamp", "event_type", "payload")
    val out = Files.createTempDirectory("cfg-compact-enc").toString
    GraftConfig(Map("flush.size" -> "1", "partitioner.class" -> "field",
      "partition.field.name" -> "event_type")).write(df, out, "t")
    val e = intercept[IllegalArgumentException] {
      BatchWriter.compact(spark, s"$out/topics", "t", targetRecords = 10)
    }
    assert(e.getMessage.contains("not in the default partition=<p> layout"))
  }

  test("timestamp.field must be non-empty") {
    val e = intercept[IllegalArgumentException] {
      GraftConfig(base + ("timestamp.field" -> " "))
    }
    assert(e.getMessage.contains("timestamp.field must name"))
  }

  test("avro rejects partitioned layouts and interval rotation fast") {
    import spark.implicits._
    val df = Seq((0L, 0L, "x")).toDF("part", "off", "payload")
    val out = Files.createTempDirectory("cfg-avro-bad").toString
    intercept[IllegalArgumentException] {
      GraftConfig(Map("flush.size" -> "2", "format.class" -> "avro",
        "partitioner.class" -> "field", "partition.field.name" -> "payload"))
        .write(df, out, "t")
    }
  }

  test("pinned knobs fail fast instead of being silently ignored") {
    val e = intercept[IllegalArgumentException] {
      GraftConfig(base ++ Map(
        "path.format" -> "'year'=YYYY",
        "directory.delim" -> "_",
        "file.delim" -> "-"))
    }
    // path.format only has a consumer on the time partitioner (base
    // config is the default partitioner) — still a refusal, not a
    // silent ignore
    assert(e.getMessage.contains("path.format applies only to the time"))
    assert(e.getMessage.contains("directory.delim supports only '/'"))
    assert(e.getMessage.contains("file.delim supports only '+'"))
  }

  test("custom Joda path.format: reference patterns accepted, layout matches, bad tokens refuse") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // the two spellings the reference's tests exercise
    // (TimeBasedPartitionerTest.java:38-48 and its DST test)
    for (pat <- Seq("'year'=YYYY/'month'=MMMM/'day'=dd/'hour'=H/",
                    "'year='YYYY/'month='MMMM/'day='dd/'hour='H/")) {
      val cfg = GraftConfig(base ++ Map(
        "partitioner.class" -> "time",
        "partition.duration.ms" -> "7200000",
        "path.format" -> pat,
        "timestamp.field" -> "ts",
        "locale" -> "en-US",
        "timezone" -> "America/Los_Angeles"))
      assert(cfg.pathFormat === pat)
      // golden vector: 2015-01-01 03:00 LA (= 11:00Z), 2h buckets →
      // topic/year=2015/month=January/day=01/hour=2/
      val t = java.sql.Timestamp.valueOf("2015-01-01 11:00:00")
      val rendered = Seq(t).toDF("ts")
        .select(cfg.partitionPath(col("part"), col("ts"), n => col(n))
          .as("p")).as[String].head()
      assert("topic/" + rendered + "/" ===
        "topic/year=2015/month=January/day=01/hour=2/")
    }
    // DST fall-back vector under the CUSTOM pattern: 08:30Z (01:30
    // PDT) and 09:30Z (01:30 PST) render identical paths
    val cfgH = GraftConfig(base ++ Map(
      "partitioner.class" -> "time",
      "partition.duration.ms" -> "3600000",
      "path.format" -> "'year'=YYYY/'month'=MMMM/'day'=dd/'hour'=H/",
      "timestamp.field" -> "ts",
      "timezone" -> "America/Los_Angeles"))
    val p = cfgH.partitionPath(col("part"), col("ts"), n => col(n))
    val paths = Seq(java.sql.Timestamp.valueOf("2015-11-01 08:30:00"),
      java.sql.Timestamp.valueOf("2015-11-01 09:30:00"))
      .toDF("ts").select(p.as("p")).as[String].collect()
    assert(paths(0) === paths(1))
    assert(paths(0) === "year=2015/month=November/day=01/hour=1")
    // offset-ambiguous zones (Europe/Moscow) render z through the
    // era-keyed chain since r15 — the config surface accepts them and
    // lands Joda's own names across the 2011 rule change
    val cfgM = GraftConfig(base ++ Map(
      "partitioner.class" -> "time",
      "partition.duration.ms" -> "3600000",
      "path.format" -> "'zone'=zz/",
      "timezone" -> "Europe/Moscow",
      "timestamp.field" -> "ts"))
    val pm = cfgM.partitionPath(col("part"), col("ts"), n => col(n))
    val mskPaths = Seq(
        java.sql.Timestamp.valueOf("2010-07-01 11:00:00"), // MSD era
        java.sql.Timestamp.valueOf("2015-01-20 11:00:00")) // MSK (+03)
      .toDF("ts").select(pm.as("p")).as[String].collect()
    assert(mskPaths.toSeq === Seq("zone=MSD", "zone=MSK"))
    // untranslatable tokens refuse at construction with the token
    // named: letters Joda itself rejects, and zone ids Joda cannot
    // resolve
    val e = intercept[IllegalArgumentException] {
      GraftConfig(base ++ Map(
        "partitioner.class" -> "time",
        "partition.duration.ms" -> "3600000",
        "path.format" -> "'zone'=zz/",
        "timezone" -> "Not/AZone",
        "timestamp.field" -> "ts"))
    }
    assert(e.getMessage.contains("untranslatable"))
    assert(e.getMessage.contains("zz"))
    // the same zz pattern is fine on a functional zone (PST/PDT)
    val cfgZ = GraftConfig(base ++ Map(
      "partitioner.class" -> "time",
      "partition.duration.ms" -> "3600000",
      "path.format" -> "'zone'=zz/",
      "timezone" -> "America/Los_Angeles",
      "timestamp.field" -> "ts"))
    val renderedZ = Seq(java.sql.Timestamp.valueOf("2015-01-01 11:00:00"))
      .toDF("ts")
      .select(cfgZ.partitionPath(col("part"), col("ts"), n => col(n))
        .as("p")).as[String].head()
    assert(renderedZ === "zone=PST")
    // the formerly-refused week fields now translate (ISO week 1)
    val cfgW = GraftConfig(base ++ Map(
      "partitioner.class" -> "time",
      "partition.duration.ms" -> "3600000",
      "path.format" -> "'year'=xxxx/'week'=ww/",
      "timestamp.field" -> "ts"))
    val tW = java.sql.Timestamp.valueOf("2015-01-01 11:00:00")
    val renderedW = Seq(tW).toDF("ts")
      .select(cfgW.partitionPath(col("part"), col("ts"), n => col(n))
        .as("p")).as[String].head()
    assert(renderedW === "year=2015/week=01")
  }

  test("schema.compatibility validates against the reference lattice") {
    assert(GraftConfig(base).schemaCompatibility === "NONE")
    assert(GraftConfig(base + ("schema.compatibility" -> "backward"))
      .schemaCompatibility === "BACKWARD")
    val e = intercept[IllegalArgumentException] {
      GraftConfig(base + ("schema.compatibility" -> "SIDEWAYS"))
    }
    assert(e.getMessage.contains("NONE, BACKWARD, FORWARD, FULL"))
    val vs = GraftConfig.validate(base).map(v => v.name -> v).toMap
    assert(vs("schema.compatibility").recommended ===
      Seq("NONE", "BACKWARD", "FORWARD", "FULL"))
  }

  test("timestamp.extractor selects the record-time source (Wallclock/Record/RecordField)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // RecordField (the engine default) reads timestamp.field; Record
    // reads the stream envelope's ts — same rows, different routing
    val df = Seq((0L, 0L, t("2026-03-01 10:00:00"), t("2027-07-04 10:00:00"), "a"))
      .toDF("part", "off", "timestamp", "ts", "payload")
    val outF = Files.createTempDirectory("cfg-exfield").toString
    GraftConfig(Map("flush.size" -> "10", "partitioner.class" -> "daily"))
      .write(df, outF, "t")
    assert(new java.io.File(s"$outF/topics/t/year=2026/month=03/day=01").exists())
    val outR = Files.createTempDirectory("cfg-exrecord").toString
    GraftConfig(Map("flush.size" -> "10", "partitioner.class" -> "daily",
      "timestamp.extractor" -> "Record")).write(df, outR, "t")
    assert(new java.io.File(s"$outR/topics/t/year=2027/month=07/day=04").exists())
    // Wallclock stamps the write time: the record lands under today —
    // captured BEFORE and AFTER the write, accepting either, so a run
    // straddling UTC midnight can't flake
    val outW = Files.createTempDirectory("cfg-exwall").toString
    val before = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
    GraftConfig(Map("flush.size" -> "10", "partitioner.class" -> "daily",
      "timestamp.extractor" -> "Wallclock")).write(df, outW, "t")
    val after = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
    def dayDir(d: java.time.LocalDate) =
      new java.io.File(f"$outW/topics/t/year=${d.getYear}%04d/" +
        f"month=${d.getMonthValue}%02d/day=${d.getDayOfMonth}%02d")
    assert(dayDir(before).exists() || dayDir(after).exists())
    // unknown extractor fails with the roster
    val e = intercept[IllegalArgumentException] {
      GraftConfig(base + ("timestamp.extractor" -> "Sundial"))
    }
    assert(e.getMessage.contains("Wallclock, Record, RecordField"))
  }

  test("store.url is consumed as the write root, overriding hdfs.url") {
    import spark.implicits._
    val df = Seq((0L, 0L, "a")).toDF("part", "off", "payload")
    val s1 = Files.createTempDirectory("cfg-store").toString
    val s2 = Files.createTempDirectory("cfg-hdfsurl").toString
    GraftConfig(Map("flush.size" -> "2", "store.url" -> s1,
      "hdfs.url" -> s2)).write(df, "t")
    assert(BatchWriter.listCommitted(spark, s"$s1/topics", "t").nonEmpty)
    assert(BatchWriter.listCommitted(spark, s"$s2/topics", "t").isEmpty)
    // hdfs.url alone also works (the deprecated spelling)
    GraftConfig(Map("flush.size" -> "2", "hdfs.url" -> s2)).write(df, "t")
    assert(BatchWriter.listCommitted(spark, s"$s2/topics", "t").nonEmpty)
    val e = intercept[IllegalArgumentException] {
      GraftConfig(base).write(df, "t")
    }
    assert(e.getMessage.contains("no store root configured"))
  }

  test("plane-replacing and pinned reference keys fail fast with the replacement named") {
    val e1 = intercept[IllegalArgumentException] {
      GraftConfig(base + ("hive.metastore.uris" -> "thrift://x:9083"))
    }
    assert(e1.getMessage.contains("graft.catalog.TableCatalog"))
    val e2 = intercept[IllegalArgumentException] {
      GraftConfig(base + ("connect.hdfs.keytab" -> "/k.keytab"))
    }
    assert(e2.getMessage.contains("spark.kerberos"))
    val e3 = intercept[IllegalArgumentException] {
      GraftConfig(base + ("logs.dir" -> "wal"))
    }
    assert(e3.getMessage.contains("_commitlog"))
    val e4 = intercept[IllegalArgumentException] {
      GraftConfig(base + ("hive.integration" -> "true"))
    }
    assert(e4.getMessage.contains("TableCatalog"))
    val e5 = intercept[IllegalArgumentException] {
      GraftConfig(base + ("schema.cache.size" -> "500"))
    }
    assert(e5.getMessage.contains("not tunable"))
    // defaults of the pinned keys construct fine
    GraftConfig(base ++ Map("logs.dir" -> "logs",
      "hive.integration" -> "false", "schema.cache.size" -> "1000"))
  }

  test("topics.dir roots the layout (reference FileUtils path scheme) and is validated") {
    import spark.implicits._
    val df = Seq((0L, 0L, "a")).toDF("part", "off", "payload")
    val out = Files.createTempDirectory("cfg-topicsdir").toString
    val cfg = GraftConfig(Map("flush.size" -> "2", "topics.dir" -> "data/raw"))
    assert(cfg.topicsRoot(out) === s"$out/data/raw")
    cfg.write(df, out, "t")
    assert(BatchWriter.listCommitted(spark, s"$out/data/raw", "t") ===
      Seq("t+0+0000000000+0000000000.parquet"))
    for (bad <- Seq("/abs", "a//b", "..", "x/../y", "trail/")) {
      val e = intercept[IllegalArgumentException] {
        GraftConfig(base + ("topics.dir" -> bad))
      }
      assert(e.getMessage.contains("topics.dir must be a relative path"), bad)
    }
  }

  test("the typed config drives the write dispatch (parquet + avro/bzip2)") {
    import spark.implicits._
    val df = (0L until 4L).map(o => (0L, o, s"v$o")).toDF("part", "off", "payload")

    val outP = Files.createTempDirectory("cfg-parquet").toString
    GraftConfig(Map("flush.size" -> "2")).write(df, outP, "t")
    assert(BatchWriter.listCommitted(spark, s"$outP/topics", "t") === Seq(
      "t+0+0000000000+0000000001.parquet", "t+0+0000000002+0000000003.parquet"))

    val outA = Files.createTempDirectory("cfg-avro").toString
    val cfgA = GraftConfig(Map("flush.size" -> "4",
      "format.class" -> "avro", "avro.codec" -> "bzip2",
      "filename.offset.zero.pad.width" -> "4"))
    val m = cfgA.write(df, outA, "t")
    assert(BatchWriter.listCommitted(spark, s"$outA/topics", "t") === Seq("t+0+0000+0003.avro"))
    val (_, rows) = AvroSink.readFile(m.head.path.stripPrefix("file:"))
    assert(rows.map(_("payload")) === Seq("v0", "v1", "v2", "v3"))
  }

  // ---- custom plug-in classes (the reference's reflection extension
  //      point, DataWriter.java:537-558 / docs/hdfs_connector.rst:205-208) ----

  test("a custom partitioner.class loads, configures, and shapes the layout") {
    import spark.implicits._
    val df = (0L until 4L).map(o => (o % 3, o, s"v$o"))
      .toDF("part", "off", "payload")
    val out = Files.createTempDirectory("cfg-custom-part").toString
    // path.format doubles as the plug-in's own knob — the full
    // property map reaches configure(), as in Connect
    GraftConfig(Map("flush.size" -> "10",
      "partitioner.class" -> "graft.ingest.ModPartitioner",
      "path.format" -> "2")).write(df, out, "t")
    assert(new java.io.File(s"$out/topics/t").listFiles().map(_.getName).toSet ===
      Set("mod=0", "mod=1"))
    // parts {0, 2} land even, part 1 odd under mod 2
    assert(spark.read.parquet(s"$out/topics/t/mod=0")
      .select("payload").as[String].collect().toSet === Set("v0", "v2", "v3"))
    assert(BatchWriter.maxCommittedOffsets(spark, s"$out/topics", "t") ===
      Map(0L -> 3L, 1L -> 1L, 2L -> 2L))
  }

  test("a custom timestamp.extractor drives the time-partitioner family") {
    import spark.implicits._
    val df = Seq((0L, 0L, "v0")).toDF("part", "off", "payload")
    val out = Files.createTempDirectory("cfg-custom-ts").toString
    GraftConfig(Map("flush.size" -> "10",
      "partitioner.class" -> "daily",
      "timestamp.extractor" -> "graft.ingest.FixedTimestampExtractor"))
      .write(df, out, "t")
    // the extractor's constant routes the record regardless of payload
    assert(new java.io.File(s"$out/topics/t/year=2020/month=01/day=05").exists())
  }

  test("plug-in load failures are config-validation errors, not stack traces") {
    val missing = intercept[IllegalArgumentException] {
      GraftConfig(base + ("partitioner.class" -> "no.such.Clazz"))
    }
    assert(missing.getMessage.contains(
      "class 'no.such.Clazz' not found on the classpath"))

    val wrongIface = intercept[IllegalArgumentException] {
      GraftConfig(base + ("partitioner.class" -> "graft.ingest.NotAPartitioner"))
    }
    assert(wrongIface.getMessage.contains(
      "does not implement graft.partition.PluggablePartitioner"))

    val wrongIfaceTs = intercept[IllegalArgumentException] {
      GraftConfig(base + ("timestamp.extractor" -> "graft.ingest.ModPartitioner"))
    }
    assert(wrongIfaceTs.getMessage.contains(
      "does not implement graft.partition.PluggableTimestampExtractor"))

    // a roster typo (no dot) still gets the roster message + the
    // extension hint, never a reflection attempt
    val typo = intercept[IllegalArgumentException] {
      GraftConfig(base + ("partitioner.class" -> "daly"))
    }
    assert(typo.getMessage.contains("unknown partitioner 'daly'"))
    assert(typo.getMessage.contains("PluggablePartitioner"))
  }

  test("dependent keys stay visible and path.format free under a custom partitioner") {
    val vs = GraftConfig.validate(base ++ Map(
        "partitioner.class" -> "graft.ingest.ModPartitioner",
        "path.format" -> "3"))
      .map(v => v.name -> v).toMap
    for (k <- Seq("partition.field.name", "partition.duration.ms",
        "path.format", "locale", "timezone"))
      assert(vs(k).visible, s"$k hidden under a custom partitioner")
    assert(vs("path.format").errors.isEmpty,
      "path.format rejected under a custom partitioner")
  }
}

/** Test plug-in: `mod=<part % N>` layout, N read from `path.format`
  * in configure() — exercises both the reflection load and the
  * Connect-style configure handshake. */
class ModPartitioner extends graft.partition.PluggablePartitioner {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{concat, lit, pmod}
  private var mod = 2L
  override def configure(props: Map[String, String]): Unit =
    mod = props.get("path.format").filter(_.nonEmpty).fold(2L)(_.toLong)
  def encode(kafkaPartition: Column, ts: Column,
             field: String => Column): Column =
    concat(lit("mod="), pmod(kafkaPartition, lit(mod)).cast("string"))
}

/** Test plug-in: a constant record time — makes time-routing
  * assertions deterministic. */
class FixedTimestampExtractor
    extends graft.partition.PluggableTimestampExtractor {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.lit
  def recordTime(field: String => Column): Column =
    lit(java.sql.Timestamp.valueOf("2020-01-05 07:00:00"))
}

/** Deliberately implements neither SPI. */
class NotAPartitioner
