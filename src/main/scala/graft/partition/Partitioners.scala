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
    * session-timezone convention is UTC). NOTE: the raw floor can
    * land on a nonexistent local time (a DST spring-forward gap —
    * e.g. a 2 h bucket flooring 03:30 local to 02:00 when
    * 02:00–03:00 was skipped); the path renderers resolve it through
    * [[jodaResolveLocal]], reproducing the reference's
    * `convertLocalToUTC(partitionedTime, false)`
    * (`TimeUtils.java:33-38`). */
  def timeBucketLocal(ts: Column, durationMs: Long, tz: String): Column = {
    val local = from_utc_timestamp(ts, tz)
    timestamp_millis(unix_millis(local) - pmod(unix_millis(local), lit(durationMs)))
  }

  /** Zone offset (millis) of `tz` at UTC-instant-millis `i`, as a
    * foldable Column — `from_utc_timestamp` used as the zone-rules
    * oracle. */
  private def offsetAtMillis(i: Column, tz: String): Column =
    unix_millis(from_utc_timestamp(timestamp_millis(i), tz)) - i

  /** Joda's LENIENT local→UTC resolution
    * (`DateTimeZone.convertLocalToUTC(instantLocal, false)`), which
    * the reference's encoder applies to the bucket start
    * (`TimeUtils.java:33-38`), re-expressed over wall-millis `L`:
    * first estimate `o1 = getOffset(L-as-instant)`, re-estimate
    * `o2 = getOffset(L - o1)`, and return `L - o2` — except when the
    * estimates differ in a WESTERN zone (`o1 < 0`) and `L` sits in a
    * spring-forward gap, where Joda keeps the first estimate
    * (`L - o1`). This differs from java.time's resolution at
    * EASTERN-hemisphere overlaps (Joda picks the later instant,
    * java.time the earlier) — observable through the `Z` offset
    * token — so `to_utc_timestamp` alone is not faithful. The gap
    * test (`no instant maps to L`) uses the java.time round-trip,
    * which agrees with Joda's straddle test wherever a gap exists. */
  private[partition] def jodaResolveLocal(wallMillis: Column, tz: String): Column = {
    val o1 = offsetAtMillis(wallMillis, tz)
    val o2 = offsetAtMillis(wallMillis - o1, tz)
    val javaRt = to_utc_timestamp(timestamp_millis(wallMillis), tz)
    val inGap =
      unix_millis(from_utc_timestamp(javaRt, tz)) =!= wallMillis
    when(o1 =!= o2 && o1 < 0 && inGap, wallMillis - o1)
      .otherwise(wallMillis - o2)
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
    val b = jodaBucketWall(ts, durationMs, tz)
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
  // translates the FULL Joda print alphabet into a foldable Column
  // chain over the SAME duration bucket, and fail-fasts (at CONFIG
  // time, via [[jodaUnsupported]]) on anything outside it — a wrong
  // directory tree is worse than a refusal. The locale zone name `z`
  // renders every Joda-resolvable zone: a 2-branch offset chain when
  // the offset→name map is unambiguous ([[zoneOffsetNames]]), an
  // era-keyed chain otherwise ([[zoneNameEras]]).
  // Locale-sensitive text (month/day/zone names, halfday, era) is
  // derived at plan time from the classpath Joda itself so the
  // rendered names match the reference printer byte-for-byte.
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
          // scan the quoted literal char-by-char: '' INSIDE an open
          // literal is an escaped quote that keeps it open, and an
          // unterminated quote makes the remainder one literal —
          // both Joda's own rules (fuzz-caught: a bare indexOf-close
          // mis-lexed '/''  as "/" instead of "/'")
          val sb = new StringBuilder
          var j = i + 1
          var open = true
          while (open && j < pattern.length) {
            if (pattern(j) == '\'') {
              if (j + 1 < pattern.length && pattern(j + 1) == '\'') {
                sb.append('\''); j += 2
              } else { open = false; j += 1 }
            } else { sb.append(pattern(j)); j += 1 }
          }
          out += JLit(sb.toString); i = j
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

  /** Joda letters this engine renders — the FULL Joda print alphabet
    * (`DateTimeFormat` Javadoc table): era (G), century (C),
    * weekyear (x), week (w), ISO day-of-week number (e) and text (E),
    * year (y/Y — Joda's Y is year-of-era, identical to y for CE
    * dates, and Spark timestamps are CE-only: min 0001-01-01),
    * day-of-year (D), month number or locale name (M), day-of-month
    * (d), halfday text (a), hour fields in all four Joda numberings
    * (H 0-23, k 1-24, K 0-11, h 1-12), minute (m), second (s),
    * fraction-of-second (S), zone offset / id (Z), and the locale
    * zone name (z — offset or era chain, see [[zoneOffsetNames]]/[[zoneNameEras]]). */
  private val JodaSupported: Set[Char] =
    Set('G', 'C', 'x', 'w', 'e', 'E', 'y', 'Y', 'D', 'M', 'd',
      'a', 'H', 'k', 'K', 'h', 'm', 's', 'S', 'Z', 'z')

  /** The letter runs of `pattern` this engine can NOT translate on
    * syntax alone — letters Joda itself rejects. Empty means the
    * pattern lexes and every letter is in the print alphabet; the
    * zone-name token `z` additionally needs the zone check in the
    * (pattern, tz, locale) overload, which [[jodaPath]] and config
    * validation use so a bespoke layout refuses at construction, not
    * mid-write. */
  def jodaUnsupported(pattern: String): Seq[String] =
    try jodaLex(pattern).collect {
      case JField(c, n) if !JodaSupported(c) => s"$c" * n
    }.distinct
    catch { case e: IllegalArgumentException => Seq(e.getMessage) }

  /** [[jodaUnsupported]] plus the zone-name gate: `z` runs refuse
    * only when the zone id is not a Joda zone at all (java.time
    * accepts ids like "GMT+05:30" that Joda's forID rejects).
    * Offset-ambiguous zones (Europe/Moscow) no longer refuse — the
    * renderer keys those on (instant interval) instead of offset
    * alone (see [[zoneNameEras]]). */
  def jodaUnsupported(pattern: String, tz: String,
                      locale: java.util.Locale): Seq[String] = {
    // the lex try and the zone-resolution try are SEPARATE: a lex
    // error is already reported by the pattern-only overload, but a
    // zone Joda can't resolve (java.time accepts ids like
    // "GMT+05:30" that Joda's forID rejects) must surface as a
    // refusal here — swallowing it would pass config validation and
    // throw mid-write, the exact failure mode this gate exists for
    val zRuns =
      try jodaLex(pattern).collect { case JField('z', n) => n }.distinct
      catch { case _: IllegalArgumentException => Nil } // lex error above
    jodaUnsupported(pattern) ++ zRuns.flatMap { n =>
      try { zoneNameEras(tz, locale, long = n >= 4); Nil }
      catch {
        case e: IllegalArgumentException =>
          Seq(("z" * n) + s" (zone '$tz' is not a Joda zone id: ${e.getMessage})")
      }
    }
  }

  /** The zone's offset→display-name table over 1970–2100, walked at
    * PLAN time through Joda's own name provider (`getShortName` /
    * `getName` — exactly what Joda's `z` printer emits). Left when
    * two intervals with the same offset carry different names (e.g.
    * Europe/Moscow, where +0300 and +0400 each map to both MSK and
    * MSD across the 2011/2014 rule changes) — such zones render
    * through the era-keyed chain of [[zoneNameEras]]
    * instead of this 2-branch offset chain. Every common zone is
    * functional: offset alternates between standard and DST, each
    * with one name (PST/PDT, CET/CEST, AEST/AEDT, CHAST/CHADT…). */
  private[partition] def zoneOffsetNames(
      tz: String, locale: java.util.Locale,
      long: Boolean): Either[String, Seq[(Long, String)]] = {
    val zone = org.joda.time.DateTimeZone.forID(tz)
    val end = 4102444800000L // 2100-01-01T00:00Z
    val m = scala.collection.mutable.LinkedHashMap[Long, String]()
    var t = 0L
    var more = true
    while (more && t < end) {
      val off = zone.getOffset(t).toLong
      val name = if (long) zone.getName(t, locale)
                 else zone.getShortName(t, locale)
      m.get(off) match {
        case Some(prev) if prev != name =>
          return Left(s"zone $tz maps offset ${off} ms to both " +
            s"'$prev' and '$name' over 1970-2100")
        case _ => m.update(off, name)
      }
      val n = zone.nextTransition(t)
      if (n == t) more = false else t = n
    }
    Right(m.toSeq)
  }

  /** The zone's name ERAS over 1970–2100 — the Moscow-class fallback
    * when [[zoneOffsetNames]] is ambiguous. An era is a maximal run
    * of transition intervals over which the offset→name map is
    * CONSTANT (a new era starts exactly when some offset re-appears
    * under a different name — Moscow has two: {+03→MSK, +04→MSD}
    * until the 2011 rule change, {+04→MSK, +03→MSK} after). Walked
    * through Joda's own name provider at plan time; the renderer
    * emits one instant-range branch per era, each containing the
    * usual tiny offset chain — O(rule changes) branches, NOT
    * O(transitions) (a per-transition chain measured an 8 MiB task
    * binary on this zone). Entries are (eraStartMs, offset→name
    * table), ascending; instants before 1970 take the first era,
    * instants past 2100 the last. Throws IllegalArgumentException
    * when `tz` is not a Joda zone id (the remaining refusal
    * surface). */
  private[partition] def zoneNameEras(
      tz: String, locale: java.util.Locale,
      long: Boolean): Seq[(Long, Seq[(Long, String)])] = {
    val zone = org.joda.time.DateTimeZone.forID(tz)
    val end = 4102444800000L // 2100-01-01T00:00Z
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[(Long, String)])]
    val m = scala.collection.mutable.LinkedHashMap[Long, String]()
    var eraStart = 0L
    var t = 0L
    var more = true
    while (more && t < end) {
      val off = zone.getOffset(t).toLong
      val name = if (long) zone.getName(t, locale)
                 else zone.getShortName(t, locale)
      m.get(off) match {
        case Some(prev) if prev != name =>
          out += ((eraStart, m.toSeq))
          eraStart = t
          m.clear()
          m.update(off, name)
        case _ => m.update(off, name)
      }
      val n = zone.nextTransition(t)
      if (n == t) more = false else t = n
    }
    out += ((eraStart, m.toSeq))
    out.toSeq
  }

  /** Zero-pad `v` to minimum width `n` without ever truncating —
    * Joda's numeric-field print rule (token run length = minimum
    * digits; `D` prints 365, `DDDD` prints 0365). */
  private def jodaPad(n: Int, v: Column): Column =
    format_string(s"%0${n}d", v.cast("int"))

  /** ISO day-of-week (Monday=1 … Sunday=7), Joda's `e` numbering,
    * from Spark's Sunday=1 `dayofweek`. */
  private def isoDow(b: Column): Column =
    pmod(dayofweek(b) + lit(5), lit(7)) + lit(1)

  /** Locale text tables, derived at PLAN time from Joda itself (the
    * classpath joda-time that Spark distributions ship for Hive) so
    * the rendered names match the reference's
    * `DateTimeFormat.forPattern(..).withLocale(..)` byte-for-byte in
    * every locale — java.time's CLDR tables differ from Joda's
    * `DateFormatSymbols` in some locales. Driver-side only: the
    * names are baked into the plan as foldable literals, executors
    * never touch Joda. */
  private def jodaPrint(pat: String, locale: java.util.Locale,
                        y: Int, m: Int, d: Int, h: Int): String =
    org.joda.time.format.DateTimeFormat.forPattern(pat)
      .withLocale(locale)
      .print(new org.joda.time.DateTime(y, m, d, h, 0,
        org.joda.time.DateTimeZone.UTC))

  /** Render one letter run over the bucket timestamp `b` (the LOCAL
    * wall-clock bucket start). Letters outside [[JodaSupported]]
    * were refused by [[jodaUnsupported]] before this is reached. */
  private def jodaField(b: Column, c: Char, n: Int,
                        locale: java.util.Locale, tz: String,
                        offMs: Column): Column = c match {
    // year / year-of-era: java.time's print rules match Joda's for
    // every width (yy = two-digit, yyy+ = zero-pad to width)
    case 'y' | 'Y' => date_format(b, "y" * n)
    case 'x' => // ISO weekyear = year of the Thursday of b's ISO week
      val wy = year(date_add(to_date(b), lit(4) - isoDow(b)))
      if (n == 2) jodaPad(2, pmod(wy, lit(100))) else jodaPad(n, wy)
    case 'w' => jodaPad(n, weekofyear(b)) // Spark weekofyear is ISO
    case 'e' => jodaPad(n, isoDow(b))
    case 'E' => // <4 = abbreviated, >=4 = full day name, in `locale`
      val style = if (n < 4) "EEE" else "EEEE"
      // 2024-01-01 is a Monday; index table Monday-first to match isoDow
      val names = (0 to 6).map(i =>
        lit(jodaPrint(style, locale, 2024, 1, 1 + i, 12)))
      element_at(array(names: _*), isoDow(b))
    case 'D' => jodaPad(n, dayofyear(b))
    case 'M' if n <= 2 => jodaPad(n, month(b))
    case 'M' => // 3 = abbreviated, >=4 = full month name, in `locale`
      val style = if (n == 3) "MMM" else "MMMM"
      val names = (1 to 12).map(m =>
        lit(jodaPrint(style, locale, 2024, m, 15, 12)))
      element_at(array(names: _*), month(b))
    case 'd' => jodaPad(n, dayofmonth(b))
    case 'a' => // halfday text; run length irrelevant in Joda
      element_at(array(lit(jodaPrint("a", locale, 2024, 1, 1, 0)),
        lit(jodaPrint("a", locale, 2024, 1, 1, 12))),
        when(hour(b) < 12, 1).otherwise(2))
    case 'G' => // era text: Spark timestamps are CE-only (min year 1)
      lit(jodaPrint("G", locale, 2024, 1, 1, 12))
    case 'C' => // century-of-era: floor(yearOfEra / 100)
      jodaPad(n, floor(year(b) / lit(100)))
    case 'H' => jodaPad(n, hour(b))           // hour-of-day 0-23
    case 'k' => // clockhour-of-day 1-24 (midnight prints 24)
      jodaPad(n, when(hour(b) === 0, 24).otherwise(hour(b)))
    case 'K' => jodaPad(n, pmod(hour(b), lit(12)))  // 0-11
    case 'h' => // clockhour-of-halfday 1-12 (midnight and noon print 12)
      jodaPad(n, pmod(hour(b) + lit(11), lit(12)) + lit(1))
    case 'm' => jodaPad(n, minute(b))
    case 's' => jodaPad(n, second(b))
    case 'S' => // fraction-of-second: exactly n digits (truncate or
      // zero-extend the 3-digit millis fraction)
      val f3 = format_string("%03d", pmod(unix_millis(b), lit(1000L)).cast("int"))
      if (n <= 3) substring(f3, 1, n) else rpad(f3, n, "0")
    case 'Z' => // 1 = ±HHmm, 2 = ±HH:mm, >=3 = zone id (a config constant)
      if (n >= 3) lit(tz)
      else {
        // offset of the bucket instant in `tz` (whole minutes for
        // all post-1970 zone rules), precomputed by the caller from
        // the Joda-resolved bucket instant
        val offMin = (offMs / lit(60000L)).cast("int")
        val absMin = abs(offMin)
        concat(when(offMin < 0, "-").otherwise("+"),
          format_string("%02d", (absMin / lit(60)).cast("int")),
          if (n == 2) lit(":") else lit(""),
          format_string("%02d", pmod(absMin, lit(60))))
      }
    case 'z' => // locale zone name: short (<4 letters) / long (>=4),
      // rendered from the plan-time offset→name table ([[zoneOffsetNames]])
      // when unambiguous (2-branch chain for every common zone). Domain is
      // the walked 1970–2100 window — out-of-range instants fall back
      // to the standard-offset name rather than null-poisoning the path.
      zoneOffsetNames(tz, locale, long = n >= 4) match {
        case Right(names) =>
          val stdOff = org.joda.time.DateTimeZone.forID(tz)
            .getStandardOffset(4102444799999L).toLong
          val fallback = names.collectFirst { case (o, nm) if o == stdOff => nm }
            .getOrElse(names.head._2)
          names.tail
            .foldLeft(when(offMs === lit(names.head._1), lit(names.head._2))) {
              case (acc, (o, nm)) => acc.when(offMs === lit(o), lit(nm))
            }
            .otherwise(lit(fallback))
        case Left(_) =>
          // Moscow-class zone (one offset, two names across rule
          // changes): one instant-range branch per ERA, each holding
          // the usual offset chain — exact, and O(rule changes)
          // branches. The instant is recovered from the wall clock
          // and its offset (b = utc + offMs in [[jodaPath]]).
          val eras = zoneNameEras(tz, locale, long = n >= 4)
          val inst = unix_millis(b) - offMs
          // out-of-table fallback mirrors the unambiguous branch: an
          // offset absent from the era's table (post-2100 instants in
          // the open-ended latest era) renders the era's STANDARD-
          // offset name, not whichever name was walked first
          val zone = org.joda.time.DateTimeZone.forID(tz)
          def offChain(eraRep: Long, tbl: Seq[(Long, String)]): Column = {
            val stdOff = zone.getStandardOffset(eraRep).toLong
            val fb = tbl.collectFirst { case (o, nm) if o == stdOff => nm }
              .getOrElse(tbl.head._2)
            if (tbl.size == 1) lit(tbl.head._2)
            else tbl.tail
              .foldLeft(when(offMs === lit(tbl.head._1), lit(tbl.head._2))) {
                case (acc, (o, nm)) => acc.when(offMs === lit(o), lit(nm))
              }
              .otherwise(lit(fb))
          }
          val endRep = 4102444799999L // same instant the 2-branch path uses
          if (eras.size == 1) offChain(endRep, eras.head._2)
          else {
            val later = eras.tail.reverse // latest era first
            later.tail
              .foldLeft(when(inst >= lit(later.head._1),
                offChain(endRep, later.head._2))) {
                case (acc, (s, tbl)) =>
                  acc.when(inst >= lit(s), offChain(s, tbl))
              }
              .otherwise(offChain(eras.head._1, eras.head._2))
          }
      }
    case other => throw new IllegalArgumentException(
      s"unsupported path.format token '${other.toString * n}'")
  }

  /** TimeBased partitioner path under a CUSTOM Joda `path.format` —
    * the reference's `TimeUtils.encodeTimestamp(durationMs, pathFormat,
    * tz, ts)` (`/root/reference/src/test/java/io/confluent/connect/hdfs/partitioner/TimeUtils.java:26-38`)
    * re-expressed as one foldable Column: bucket in local wall time,
    * then render each pattern atom. Every Joda print token is
    * translated (`z` via offset or era chain — see [[zoneNameEras]]);
    * parity with Joda's own printer is property-pinned in
    * `JodaParitySpec`. A single trailing `/`
    * (the reference's patterns end with one; its path join collapses
    * it) is dropped so the rendered value is a clean relative path.
    * DST fall-back matches the reference (`TimeBasedPartitionerTest
    * .java:49-60`): both UTC instants of a repeated local hour render
    * the same path, because bucketing and rendering both read the
    * zone-adjusted wall clock. One documented divergence: for
    * PRE-1970 local bucket times the reference's `getPartition`
    * truncates the negative local millis toward zero (a Java integer
    * division artifact), while [[timeBucketLocal]] floors uniformly —
    * unreachable for Kafka record timestamps, which are nonnegative
    * epoch millis. */
  def jodaPath(ts: Column, durationMs: Long, tz: String,
               locale: java.util.Locale, pattern: String): Column = {
    val bad = jodaUnsupported(pattern, tz, locale)
    require(bad.isEmpty,
      s"path.format '$pattern' has untranslatable tokens: ${bad.mkString(", ")}")
    val utc = jodaResolveLocal(
      unix_millis(timeBucketLocal(ts, durationMs, tz)), tz)
    val offMs = offsetAtMillis(utc, tz)
    val b = timestamp_millis(utc + offMs) // wall clock Joda would print
    // drop the single trailing slash at the TOKEN level: a string-level
    // dropRight would corrupt a pattern ending in a QUOTED slash
    // ("...'/'" loses its closing quote and fails the re-lex)
    val toks = jodaLex(pattern) match {
      case init :+ JLit(s) if s.endsWith("/") =>
        if (s == "/") init else init :+ JLit(s.dropRight(1))
      case other => other
    }
    val parts = toks.map {
      case JLit(s) => lit(s)
      case JField(c, n) => jodaField(b, c, n, locale, tz, offMs)
    }
    if (parts.isEmpty) lit("") else concat(parts: _*)
  }

  /** The wall-clock bucket timestamp the reference's formatter would
    * print: raw local floor, Joda-lenient resolution to a UTC
    * instant, then back to that instant's wall clock (identical to
    * the raw floor everywhere outside DST gaps). */
  private def jodaBucketWall(ts: Column, durationMs: Long, tz: String): Column = {
    val utc = jodaResolveLocal(
      unix_millis(timeBucketLocal(ts, durationMs, tz)), tz)
    timestamp_millis(utc + offsetAtMillis(utc, tz))
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
