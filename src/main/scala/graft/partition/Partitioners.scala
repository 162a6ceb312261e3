package graft.partition

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Partition-path encoders, re-expressed as pure `Column` functions so
  * Catalyst can fold/prune them and `DataFrameWriter.partitionBy` can
  * reuse the same expressions at write time.
  *
  * Reference semantics:
  *  - Default:   `partition=<kafkaPartition>`
  *    (`/root/reference/src/main/java/io/confluent/connect/hdfs/partitioner/DefaultPartitioner.java:23-26`,
  *     behavior documented in `docs/hdfs_connector.rst:107-110`)
  *  - Field:     `<field>=<value>`
  *    (`partitioner/FieldPartitioner.java:23-26`)
  *  - TimeBased: floor(ts / partition.duration.ms) rendered through a
  *    date path format (`partitioner/TimeBasedPartitioner.java:23-26`,
  *    semantics in `partitioner/TimeBasedPartitionerTest.java:38-48`)
  *  - Daily / Hourly specializations
  *    (`partitioner/DailyPartitioner.java:23-26`, `HourlyPartitioner.java:23-26`)
  */
object Partitioners {

  /** `partition=<kafkaPartition>` — preserves source partitioning. */
  def defaultPartition(kafkaPartition: Column): Column =
    concat(lit("partition="), kafkaPartition.cast("string"))

  /** `<fieldName>=<value>` — one directory per distinct field value. */
  def fieldPartition(fieldName: String, value: Column): Column =
    concat(lit(s"$fieldName="), value.cast("string"))

  /** Start of the `durationMs`-wide bucket containing `ts`, as epoch millis.
    * This is the TimeBasedPartitioner bucketing function with the path
    * rendering factored out. */
  def timeBucketMillis(ts: Column, durationMs: Long): Column =
    (unix_millis(ts).cast("long") - pmod(unix_millis(ts), lit(durationMs))).as("bucket_ms")

  /** `year=YYYY/month=MM/day=dd` path (DailyPartitioner). */
  def dailyPath(ts: Column): Column =
    date_format(ts, "'year='yyyy'/month='MM'/day='dd")

  /** `year=YYYY/month=MM/day=dd/hour=HH` path (HourlyPartitioner). */
  def hourlyPath(ts: Column): Column =
    date_format(ts, "'year='yyyy'/month='MM'/day='dd'/hour='HH")

  /** TimeBased path with the reference's default-ish long format,
    * e.g. `year=2015/month=January/day=01/hour=2` —
    * vector from `partitioner/TimeBasedPartitionerTest.java:44-47`.
    * Renders in the session timezone, English month names. */
  def timeBasedPath(ts: Column): Column =
    concat(
      lit("year="), date_format(ts, "yyyy"),
      lit("/month="), date_format(ts, "MMMM"),
      lit("/day="), date_format(ts, "dd"),
      lit("/hour="), date_format(ts, "H"))

  /** Duration-bucket start in the LOCAL wall time of `tz` — the
    * reference's bucketing semantics (`TimeBasedPartitioner.java`
    * `getPartition`: the floor is applied to the zone-ADJUSTED
    * timestamp, then mapped back; an hourly bucket in a +05:30 zone
    * starts on the local hour, not the UTC one). Returns the bucket
    * start as a wall-clock timestamp (render it directly; the repo's
    * session-timezone convention is UTC). */
  def timeBucketLocal(ts: Column, durationMs: Long, tz: String): Column = {
    val local = from_utc_timestamp(ts, tz)
    timestamp_millis(unix_millis(local) - pmod(unix_millis(local), lit(durationMs)))
  }

  /** Fully parameterized TimeBased partitioner path — the reference's
    * configuration surface (`docs/configuration_options.rst:189-215`:
    * `partition.duration.ms`, `timezone`, `locale`; long path format).
    * Month names come from a plan-time per-locale name table because
    * `date_format` has no locale parameter; everything stays a foldable
    * Column expression. DST behavior matches the reference
    * (`TimeBasedPartitionerTest.java:51-60`): on fall-back the repeated
    * local hour renders the same path for both UTC instants. */
  def timeBasedPath(ts: Column, durationMs: Long, tz: String,
                    locale: java.util.Locale): Column = {
    val b = timeBucketLocal(ts, durationMs, tz)
    val monthNames = (1 to 12).map(m => lit(java.time.Month.of(m)
      .getDisplayName(java.time.format.TextStyle.FULL, locale)))
    concat(
      lit("year="), date_format(b, "yyyy"),
      lit("/month="), element_at(array(monthNames: _*), month(b)),
      lit("/day="), date_format(b, "dd"),
      lit("/hour="), date_format(b, "H"))
  }

  // ----------------------------------------------------------------
  // Custom Joda `path.format` patterns (reference:
  // `docs/configuration_options.rst:189-215`, exercised in
  // `partitioner/TimeBasedPartitionerTest.java:38-48`). The reference
  // hands the pattern to Joda's DateTimeFormat verbatim; this engine
  // translates the exercised token subset into a foldable Column
  // chain over the SAME duration bucket, and fail-fasts (at CONFIG
  // time, via [[jodaUnsupported]]) on anything outside it — a wrong
  // directory tree is worse than a refusal.
  // ----------------------------------------------------------------

  /** Lexed pattern atom: either a literal string or a letter run. */
  private[partition] sealed trait JodaTok
  private[partition] final case class JLit(s: String) extends JodaTok
  private[partition] final case class JField(c: Char, n: Int) extends JodaTok

  /** Lex a Joda pattern: quoted literals (`''` = escaped quote),
    * same-letter runs, everything else literal — Joda's own lexing
    * rules for the subset we take. */
  private[partition] def jodaLex(pattern: String): List[JodaTok] = {
    val out = List.newBuilder[JodaTok]
    var i = 0
    while (i < pattern.length) {
      val c = pattern(i)
      if (c == '\'') {
        if (i + 1 < pattern.length && pattern(i + 1) == '\'') {
          out += JLit("'"); i += 2
        } else {
          val close = pattern.indexOf('\'', i + 1)
          require(close >= 0, s"unterminated quote in path.format at $i")
          out += JLit(pattern.substring(i + 1, close)); i = close + 1
        }
      } else if (c.isLetter) {
        var j = i
        while (j < pattern.length && pattern(j) == c) j += 1
        out += JField(c, j - i); i = j
      } else {
        var j = i
        while (j < pattern.length && !pattern(j).isLetter &&
          pattern(j) != '\'') j += 1
        out += JLit(pattern.substring(i, j)); i = j
      }
    }
    out.result()
  }

  /** Joda letters this engine renders: year (y/Y — Joda's Y is
    * year-of-era, identical to y for CE dates), month number or
    * locale name (M), day-of-month (d), hour-of-day (H),
    * minute (m), second (s). */
  private val JodaSupported = Set('y', 'Y', 'M', 'd', 'H', 'm', 's')

  /** Longest translatable run per supported letter: year fields pad
    * exactly like Joda up to width 4, month names top out at the full
    * style (MMMM), and the 2-digit numeric fields (d/H/m/s) have no
    * wider Joda rendering this engine reproduces (Joda pads ddd to
    * 3 digits — a tree this translation would silently diverge from,
    * so longer runs REFUSE instead of clamping). */
  private val JodaMaxRun: Map[Char, Int] =
    Map('y' -> 4, 'Y' -> 4, 'M' -> 4, 'd' -> 2, 'H' -> 2,
      'm' -> 2, 's' -> 2)

  /** The letter runs of `pattern` this engine can NOT translate —
    * unknown letters AND over-long runs of supported ones (Joda pads
    * `yyyyy` to 5 digits, `HHH` to 3: clamping would render a
    * DIFFERENT directory tree than the reference, and a wrong tree is
    * worse than a refusal). Empty means [[jodaPath]] will accept it.
    * Config validation calls this so a bespoke layout refuses at
    * construction, not mid-write. */
  def jodaUnsupported(pattern: String): Seq[String] =
    try jodaLex(pattern).collect {
      case JField(c, n) if n > JodaMaxRun.getOrElse(c, 0) => s"$c" * n
    }.distinct
    catch { case e: IllegalArgumentException => Seq(e.getMessage) }

  /** Render one letter run over the bucket timestamp `b`. Runs longer
    * than [[JodaMaxRun]] were refused by [[jodaUnsupported]] before
    * this is reached. */
  private def jodaField(b: Column, c: Char, n: Int,
                        locale: java.util.Locale): Column = c match {
    case 'y' | 'Y' => date_format(b, "y" * n)
    case 'M' if n <= 2 => date_format(b, "M" * n)
    case 'M' => // 3 = abbreviated, 4 = full month name, in `locale`
      val style = if (n == 3) java.time.format.TextStyle.SHORT
                  else java.time.format.TextStyle.FULL
      val names = (1 to 12).map(m =>
        lit(java.time.Month.of(m).getDisplayName(style, locale)))
      element_at(array(names: _*), month(b))
    case 'd' => date_format(b, "d" * n)
    case 'H' => date_format(b, "H" * n)
    case 'm' => date_format(b, "m" * n)
    case 's' => date_format(b, "s" * n)
    case other => throw new IllegalArgumentException(
      s"unsupported path.format token '${other.toString * n}'")
  }

  /** TimeBased partitioner path under a CUSTOM Joda `path.format` —
    * the reference's `TimeUtils.encodeTimestamp(durationMs, pathFormat,
    * tz, ts)` re-expressed as one foldable Column: bucket in local
    * wall time, then render each pattern atom. A single trailing `/`
    * (the reference's patterns end with one; its path join collapses
    * it) is dropped so the rendered value is a clean relative path.
    * DST fall-back matches the reference (`TimeBasedPartitionerTest
    * .java:49-60`): both UTC instants of a repeated local hour render
    * the same path, because bucketing and rendering both read the
    * zone-adjusted wall clock. */
  def jodaPath(ts: Column, durationMs: Long, tz: String,
               locale: java.util.Locale, pattern: String): Column = {
    val bad = jodaUnsupported(pattern)
    require(bad.isEmpty,
      s"path.format '$pattern' has untranslatable tokens: ${bad.mkString(", ")}")
    val b = timeBucketLocal(ts, durationMs, tz)
    val toks = jodaLex(if (pattern.endsWith("/")) pattern.dropRight(1)
                       else pattern)
    val parts = toks.map {
      case JLit(s) => lit(s)
      case JField(c, n) => jodaField(b, c, n, locale)
    }
    if (parts.isEmpty) lit("") else concat(parts: _*)
  }
}

/** The reference's pluggable `TimestampExtractor`s
  * (`/root/reference/src/main/java/io/confluent/connect/hdfs/TopicPartitionWriter.java:174-185`,
  * config `docs/configuration_options.rst:217-229`):
  * Wallclock = processing time, Record = the stream envelope timestamp,
  * RecordField = an epoch-millis field inside the value.
  */
object TimestampExtractors {
  /** Wallclock: processing time at evaluation. */
  def wallclock(): Column = current_timestamp()

  /** Record: the record/envelope timestamp column (Kafka record ts). */
  def record(tsCol: Column): Column = tsCol

  /** RecordField: epoch-millis long field inside the value struct. */
  def recordField(epochMillis: Column): Column = timestamp_millis(epochMillis.cast("long"))
}
