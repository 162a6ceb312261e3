package graft.partition

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Vectors from the reference partitioner tests:
  * `partitioner/TimeBasedPartitionerTest.java:38-48` (long month-name
  * format, hour without zero-pad), `DailyPartitionerTest.java:36`,
  * `HourlyPartitionerTest.java:36`. The reference evaluates in a
  * configured timezone; this engine standardizes on session UTC. */
class PartitionersSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def one(c: org.apache.spark.sql.Column, t: Timestamp): String =
    Seq(t).toDF("ts").select(c).as[String].head()

  test("timeBasedPath renders the long format vector year=2015/month=January/day=01/hour=2") {
    assert(one(Partitioners.timeBasedPath(col("ts")), ts("2015-01-01 02:00:00")) ===
      "year=2015/month=January/day=01/hour=2")
  }

  test("dailyPath matches year=YYYY/month=MM/day=dd") {
    assert(one(Partitioners.dailyPath(col("ts")), ts("2015-04-02 01:00:00")) ===
      "year=2015/month=04/day=02")
  }

  test("hourlyPath matches year=YYYY/month=MM/day=dd/hour=HH") {
    assert(one(Partitioners.hourlyPath(col("ts")), ts("2015-04-02 01:00:00")) ===
      "year=2015/month=04/day=02/hour=01")
  }

  test("parameterized timeBasedPath: BiHourly LA vector with locale month names") {
    // reference TimeBasedPartitionerTest.java:38-48: 2015-01-01 03:00
    // America/Los_Angeles (= 11:00Z), 2h buckets -> bucket start 02:00
    val t = ts("2015-01-01 11:00:00") // session TZ is UTC -> this is 11:00Z
    val en = one(Partitioners.timeBasedPath(col("ts"), 7200000L,
      "America/Los_Angeles", java.util.Locale.ENGLISH), t)
    assert(en === "year=2015/month=January/day=01/hour=2")
    val fr = one(Partitioners.timeBasedPath(col("ts"), 7200000L,
      "America/Los_Angeles", java.util.Locale.FRENCH), t)
    assert(fr === "year=2015/month=janvier/day=01/hour=2")
  }

  test("DST spring-forward: a bucket start in the skipped hour renders one hour later") {
    // 2024-03-10 LA: clocks jump 02:00 -> 03:00. 10:30Z is 03:30 PDT;
    // its 2h wall floor is the NONEXISTENT 02:00, which Joda's lenient
    // convertLocalToUTC resolves to 10:00Z = 03:00 PDT — the rendered
    // path says hour=3, never the skipped hour=2 (this is the shape the
    // partition_time_zoned oracle mirrors with its gap CASE).
    val t = ts("2024-03-10 10:30:00")
    val en = one(Partitioners.timeBasedPath(col("ts"), 7200000L,
      "America/Los_Angeles", java.util.Locale.ENGLISH), t)
    assert(en === "year=2024/month=March/day=10/hour=3")
    // an instant before the gap stays on its raw floor
    val pre = one(Partitioners.timeBasedPath(col("ts"), 7200000L,
      "America/Los_Angeles", java.util.Locale.ENGLISH),
      ts("2024-03-10 09:30:00")) // 01:30 PST
    assert(pre === "year=2024/month=March/day=10/hour=0")
  }

  test("a java.time-valid zone Joda cannot resolve refuses z at config time") {
    // ZoneId.of accepts the legacy "SystemV/AST4"; Joda's
    // DateTimeZone.forID throws. The zone gate must surface that as a
    // refusal, not swallow it and crash mid-write.
    val bad = Partitioners.jodaUnsupported(
      "yyyy/MM z", "SystemV/AST4", java.util.Locale.ENGLISH)
    assert(bad.exists(_.contains("not a Joda zone id")), bad.toString)
    // the same pattern without z passes (nothing else needs Joda zones)
    assert(Partitioners.jodaUnsupported(
      "yyyy/MM", "SystemV/AST4", java.util.Locale.ENGLISH).isEmpty)
  }

  test("DST fall-back: both occurrences of the repeated local hour render one path") {
    // reference TimeBasedPartitionerTest.java:51-60: 2015-11-01 LA,
    // clocks fall back 02:00 -> 01:00; 08:30Z is 01:30 PDT and 09:30Z
    // is 01:30 PST -- one local hour, one rendered partition path.
    val pdt = ts("2015-11-01 08:30:00")
    val pst = ts("2015-11-01 09:30:00")
    val path = Partitioners.timeBasedPath(col("ts"), 3600000L,
      "America/Los_Angeles", java.util.Locale.ENGLISH)
    val a = one(path, pdt)
    val b = one(path, pst)
    assert(a === b)
    assert(a === "year=2015/month=November/day=01/hour=1")
  }

  test("jodaPath: token subset renders per Joda semantics; unknown tokens refuse") {
    val t = ts("2015-01-01 11:07:09") // 03:07:09 LA local
    def render(pat: String, durMs: Long = 7200000L,
               loc: java.util.Locale = java.util.Locale.ENGLISH): String =
      one(Partitioners.jodaPath(col("ts"), durMs, "America/Los_Angeles",
        loc, pat), t)
    // reference's documented example (docs/configuration_options.rst:197):
    // numeric month + zero-padded hour
    assert(render("'year'=YYYY/'month'=MM/'day'=dd/'hour'=HH/") ===
      "year=2015/month=01/day=01/hour=02")
    // full month names are locale-driven; trailing slash collapses
    assert(render("'year'=YYYY/'month'=MMMM/'day'=dd/'hour'=H/",
      loc = java.util.Locale.FRENCH) ===
      "year=2015/month=janvier/day=01/hour=2")
    // abbreviated month, short year, minute granularity (1-min bucket
    // keeps minutes), escaped quote literal
    assert(render("MMM-yy/HH''mm", durMs = 60000L) === "Jan-15/03'07")
    // bucket floor zeroes sub-bucket fields: a 2h bucket renders m/s 0
    assert(render("HH:mm:ss") === "02:00:00")
    // letters outside the Joda alphabet are named in the refusal
    val e = intercept[IllegalArgumentException] {
      render("YYYY/QQ")
    }
    assert(e.getMessage.contains("QQ"))
    assert(Partitioners.jodaUnsupported("'year'=YYYY/'month'=MMMM/") === Nil)
    // unquoted letters are pattern tokens (Joda's own lexing): every
    // unsupported one is flagged ('d', 'e' pass — day-of-month and
    // ISO day-of-week number)
    assert(Partitioners.jodaUnsupported("unquoted") ===
      Seq("u", "n", "q", "o", "t"))
    // over-long runs zero-pad to the run width, never truncating —
    // Joda's minimum-digits print rule (yyyyy -> 02015, HHH -> 002)
    assert(render("yyyyy/MM") === "02015/01")
    assert(render("YYYY/HHH:mmm") === "2015/002:000")
    assert(render("MMMMM") === "January")   // >=4 letters = full name
    assert(render("ddd") === "001")
  }

  test("jodaPath: widened alphabet — week/weekyear, halfday hours, offsets") {
    val t = ts("2015-01-01 11:07:09") // Thu 03:07:09 LA local
    def render(pat: String, durMs: Long = 7200000L,
               loc: java.util.Locale = java.util.Locale.ENGLISH): String =
      one(Partitioners.jodaPath(col("ts"), durMs, "America/Los_Angeles",
        loc, pat), t)
    // 2015-01-01 is a Thursday in ISO week 1 of weekyear 2015
    assert(render("x-'W'ww-e") === "2015-W01-4")
    assert(render("xx") === "15")           // two-digit weekyear
    assert(render("EEE/EEEE") === "Thu/Thursday")
    assert(render("EEEE", loc = java.util.Locale.FRENCH) === "jeudi")
    assert(render("D/DDD") === "1/001")     // day-of-year, pad to width
    // halfday fields at an 02:00 bucket: h=2, K=2, k=2, a=AM
    assert(render("h'h' K'K' k'k' a") === "2h 2K 2k AM")
    // midnight bucket: clockhours print 24 (k) and 12 (h), K prints 0
    val mid = ts("2015-01-01 09:30:00")     // 01:30 LA -> 00:00 bucket
    def renderAt(pat: String, at: java.sql.Timestamp): String =
      one(Partitioners.jodaPath(col("ts"), 7200000L,
        "America/Los_Angeles", java.util.Locale.ENGLISH, pat), at)
    assert(renderAt("k/h/K/a", mid) === "24/12/0/AM")
    // noon bucket: h=12, K=0, PM
    val noon = ts("2015-01-01 20:30:00")    // 12:30 LA -> 12:00 bucket
    assert(renderAt("k/h/K/a", noon) === "12/12/0/PM")
    // zone offset: numeric for 1-2 letters (DST-aware), id for >=3
    assert(render("Z") === "-0800")
    assert(render("ZZ") === "-08:00")
    assert(render("ZZZ") === "America/Los_Angeles")
    assert(renderAt("Z", ts("2015-07-01 11:07:09")) === "-0700") // PDT
    // era and century are CE constants over Spark's timestamp domain
    assert(render("G/C") === "AD/20")
    // fraction-of-second: n digits of the bucket's millis fraction
    assert(render("s.SSS", durMs = 1000L) === "9.000")
  }

  test("jodaPath is pure foldable expressions: literal input constant-folds to the path literal") {
    // the whole translation — bucketing, DST resolution, locale text
    // tables, offset arithmetic — must stay inside Catalyst's
    // expression domain: no UDF anywhere, and a literal timestamp
    // folds the entire path to ONE string literal at plan time
    // (2023-11-14T22:13:20Z = 14:13 PST -> 2h bucket 14:00)
    val c = Partitioners.jodaPath(
      timestamp_millis(lit(1700000000000L)), 7200000L,
      "America/Los_Angeles", java.util.Locale.ENGLISH,
      "'d'=yyyy-MM-dd'/h'=HH z Z")
    val optimized = spark.range(1).select(c.as("p"))
      .queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("udf"), optimized)
    assert(optimized.contains("d=2023-11-14/h=14 PST -0800"),
      s"expected the folded path literal in:\n$optimized")
  }

  test("jodaPath: zone-name token z — offset chain for functional zones, interval chain for Moscow-class") {
    def render(pat: String, at: java.sql.Timestamp): String =
      one(Partitioners.jodaPath(col("ts"), 3600000L,
        "America/Los_Angeles", java.util.Locale.ENGLISH, pat), at)
    // DST-aware short and long names from the plan-time name table
    assert(render("z", ts("2015-01-01 11:07:09")) === "PST")
    assert(render("z", ts("2015-07-01 11:07:09")) === "PDT")
    assert(render("zzzz", ts("2015-01-01 11:07:09")) ===
      "Pacific Standard Time")
    // Europe/Moscow maps +0300/+0400 each to both MSK and MSD across
    // the 2011/2014 rule changes — offset alone can't name it, so the
    // renderer keys on the transition interval. Parity-pinned against
    // Joda's own printer either side of BOTH rule changes (r15; this
    // zone used to refuse at construction).
    assert(Partitioners.jodaUnsupported("'y'=yyyy/z", "Europe/Moscow",
      java.util.Locale.ENGLISH) === Nil)
    def msk(pat: String, at: java.sql.Timestamp): Unit = {
      val zone = org.joda.time.DateTimeZone.forID("Europe/Moscow")
      val adjusted = zone.convertUTCToLocal(at.getTime)
      val bucketUtc = zone.convertLocalToUTC(
        (adjusted / 3600000L) * 3600000L, false)
      val want = org.joda.time.format.DateTimeFormat.forPattern(pat)
        .withZone(zone).withLocale(java.util.Locale.ENGLISH)
        .print(new org.joda.time.DateTime(bucketUtc))
      assert(one(Partitioners.jodaPath(col("ts"), 3600000L,
        "Europe/Moscow", java.util.Locale.ENGLISH, pat), at) === want)
    }
    for (at <- Seq(
        ts("2010-07-01 11:07:09"),   // pre-2011 summer: MSD (+04)
        ts("2010-12-01 11:07:09"),   // pre-2011 winter: MSK (+03)
        ts("2011-06-01 11:07:09"),   // post-2011 permanent +04: MSK
        ts("2013-01-15 11:07:09"),   // permanent +04 winter: MSK
        ts("2015-01-20 11:07:09"),   // post-2014 permanent +03: MSK
        ts("2015-07-20 11:07:09"));
        pat <- Seq("z", "zzzz", "yyyy/MM/dd/z"))
      msk(pat, at)
    // the remaining refusal surface: ids Joda itself rejects
    assert(Partitioners.jodaUnsupported("z", "Not/AZone",
      java.util.Locale.ENGLISH).exists(_.contains("not a Joda zone")))
  }

  test("timeBucketLocal floors on the LOCAL wall clock (half-hour zone)") {
    // Hourly buckets in Asia/Kolkata (+05:30) must start on the local
    // hour: 10:00Z = 15:30 IST -> bucket start 15:00 IST wall time.
    val got = Seq(ts("2015-04-02 10:00:00")).toDF("ts")
      .select(date_format(Partitioners.timeBucketLocal(col("ts"), 3600000L,
        "Asia/Kolkata"), "HH:mm")).as[String].head()
    assert(got === "15:00")
  }

  test("defaultPartition and fieldPartition encode k=v directories") {
    val df = Seq((12, "click")).toDF("p", "et")
    val (d, f) = df.select(
      Partitioners.defaultPartition(col("p")),
      Partitioners.fieldPartition("event_type", col("et"))).as[(String, String)].head()
    assert(d === "partition=12" && f === "event_type=click")
  }

  test("timeBucketMillis floors to the duration grid (2h)") {
    val t = ts("2015-01-01 03:59:59")
    val got = Seq(t).toDF("ts")
      .select(Partitioners.timeBucketMillis(col("ts"), 7200000L)).as[Long].head()
    assert(got === ts("2015-01-01 02:00:00").getTime)
  }

  test("RecordField extractor roundtrips epoch millis") {
    val ms = 1420099200123L
    val got = Seq(ms).toDF("f")
      .select(unix_millis(TimestampExtractors.recordField(col("f")))).as[Long].head()
    assert(got === ms)
  }
}
