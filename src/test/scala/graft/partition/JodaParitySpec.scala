package graft.partition

import scala.util.Random

import org.apache.spark.sql.functions._
import org.joda.time.{DateTime, DateTimeZone}
import org.joda.time.format.DateTimeFormat

import graft.SparkSuite

/** Byte-for-byte parity of [[Partitioners.jodaPath]] with the
  * REFERENCE's own encoder — `TimeUtils.encodeTimestamp(durationMs,
  * pathFormat, tz, ts)`
  * (`/root/reference/src/test/java/io/confluent/connect/hdfs/partitioner/TimeUtils.java:26-38`):
  * Joda `DateTimeFormat.forPattern(..).withZone(tz).withLocale(loc)`
  * printed over `convertLocalToUTC(floor(convertUTCToLocal(ts)), false)`.
  * The expected side below IS that recipe, run against the classpath
  * joda-time; the actual side is the engine's foldable-Column
  * translation evaluated by Spark. Randomized patterns cover the full
  * translated alphabet (G C x w e E y Y D M d a H k K h m s S Z plus
  * quoted/unquoted literals) across zones with half-hour and
  * 45-minute offsets, DST-transition windows, four locales, and
  * sub-second to daily bucket durations. */
class JodaParitySpec extends SparkSuite {
  import spark.implicits._

  // the last three are ambiguous-history zones (rule churn and/or
  // non-hour offsets: Moscow's 2011/2014 same-offset renames, Chile's
  // midnight-transition DST, Iran's :30 offset with on/off DST years)
  // that exercise the era-keyed z path — r16 widening, so the
  // era-table rendering is certified beyond the zone it was built for
  private val zones = Seq("UTC", "America/Los_Angeles", "Asia/Kolkata",
    "Australia/Sydney", "Europe/Paris", "Pacific/Chatham",
    "Europe/Moscow", "America/Santiago", "Asia/Tehran")
  private val locales = Seq(java.util.Locale.ENGLISH, java.util.Locale.FRENCH,
    java.util.Locale.GERMAN, java.util.Locale.JAPANESE)
  private val durations = Seq(250L, 1000L, 60000L, 900000L, 3600000L,
    7200000L, 43200000L, 86400000L)

  /** Letters with the run lengths worth exercising (wider than any
    * natural field width, the two-digit year/weekyear special case,
    * text-vs-number style switches). */
  private val tokens = Seq(
    'G' -> 2, 'C' -> 3, 'x' -> 4, 'w' -> 3, 'e' -> 2, 'E' -> 5,
    'y' -> 5, 'Y' -> 4, 'D' -> 4, 'M' -> 5, 'd' -> 3, 'a' -> 2,
    'H' -> 3, 'k' -> 2, 'K' -> 2, 'h' -> 2, 'm' -> 3, 's' -> 3,
    'S' -> 4, 'Z' -> 3, 'z' -> 4)
  private val seps =
    Seq("/", "-", ".", ":", "_", "=", " ", "'y='", "''", "'/'", "'d/'")

  /** The reference recipe, verbatim. */
  private def expected(pat: String, tzId: String, loc: java.util.Locale,
                       durMs: Long, tsMillis: Long): String = {
    val zone = DateTimeZone.forID(tzId)
    val adjusted = zone.convertUTCToLocal(tsMillis)
    val partitioned = (adjusted / durMs) * durMs
    val bucketUtc = zone.convertLocalToUTC(partitioned, false)
    DateTimeFormat.forPattern(pat).withZone(zone).withLocale(loc)
      .print(new DateTime(bucketUtc))
  }

  /** Instants per zone: every DST transition 2010–2030 sampled just
    * before / at / inside the changed hour, plus seeded-random
    * instants over 1971–2035. */
  private def instants(rnd: Random, tzId: String): Seq[Long] = {
    val zone = DateTimeZone.forID(tzId)
    val end = new DateTime(2030, 1, 1, 0, 0, DateTimeZone.UTC).getMillis
    val transitions = {
      val buf = List.newBuilder[Long]
      var t = new DateTime(2010, 1, 1, 0, 0, DateTimeZone.UTC).getMillis
      var more = true
      while (more && t < end) {
        val n = zone.nextTransition(t) // fixed-offset zones return t itself
        if (n == t) more = false else { buf += n; t = n }
      }
      buf.result()
    }
    val aroundDst = rnd.shuffle(transitions).take(6).flatMap(t =>
      Seq(t - 1, t, t + 1, t + 30 * 60000L, t + 90 * 60000L, t - 45 * 60000L))
    val randoms = Seq.fill(40)(
      31536000000L + ((rnd.nextLong() & Long.MaxValue) % (64L * 31536000000L)))
    aroundDst ++ randoms
  }

  private def randomPattern(rnd: Random): String = {
    val n = 2 + rnd.nextInt(6)
    val sb = new StringBuilder
    for (_ <- 1 to n) {
      val (c, maxRun) = tokens(rnd.nextInt(tokens.size))
      sb.append(c.toString * (1 + rnd.nextInt(maxRun)))
      sb.append(seps(rnd.nextInt(seps.size)))
    }
    sb.toString
  }

  private def assertParity(pat: String, tzId: String,
                           loc: java.util.Locale, durMs: Long,
                           millis: Seq[Long]): Unit = {
    val got = millis.toDF("ms")
      .select(Partitioners.jodaPath(timestamp_millis(col("ms")), durMs,
        tzId, loc, pat).as("p"))
      .as[String].collect()
    millis.zip(got).foreach { case (ts, actual) =>
      val want = {
        // jodaPath drops ONE trailing slash (reference patterns end
        // with one; its path join collapses it). Mirror the engine's
        // TOKEN-level condition via the same lexer — a trailing
        // QUOTED slash ('/'...) is dropped too, which a raw
        // pat.endsWith check gets wrong
        val e = expected(pat, tzId, loc, durMs, ts)
        val endsInSlashLit = Partitioners.jodaLex(pat) match {
          case _ :+ Partitioners.JLit(s) => s.endsWith("/")
          case _ => false
        }
        if (endsInSlashLit) e.dropRight(1) else e
      }
      assert(actual === want,
        s"pattern='$pat' tz=$tzId locale=$loc durMs=$durMs tsMillis=$ts")
    }
  }

  test("full-alphabet pattern matches the reference recipe in every zone/locale") {
    val pat = "G C/xxxx-'W'ww-e EEEE yyyy.YY DDD MMMM dd a hh KK kk HH:mm:ss.SSS Z/ZZ"
    for (tz <- zones; loc <- locales.take(2)) {
      val r = new Random(tz.hashCode * 31 + loc.hashCode)
      assertParity(pat, tz, loc, 3600000L, instants(r, tz))
    }
  }

  test("randomized patterns/zones/locales/durations match the reference recipe") {
    val rnd = new Random(20260816L)
    for (i <- 1 to 48) {
      val tz = zones(rnd.nextInt(zones.size))
      val loc = locales(rnd.nextInt(locales.size))
      val dur = durations(rnd.nextInt(durations.size))
      val pat = randomPattern(rnd)
      assertParity(pat, tz, loc, dur, instants(rnd, tz).take(30))
    }
  }

  test("two-digit year and weekyear truncate; wide runs zero-pad (Joda print rules)") {
    // the special-cased widths the r13 translation refused
    for (pat <- Seq("yy", "YY", "xx", "yyyyy", "xxxx", "HHH", "mmm",
                    "sss", "ddd", "DDDD", "MMMMM", "EEEEE", "SSSS", "CC")) {
      val rnd = new Random(pat.hashCode)
      assertParity(pat, "America/Los_Angeles", java.util.Locale.ENGLISH,
        7200000L, instants(rnd, "America/Los_Angeles").take(20))
    }
  }

  test("zone-name token z matches the reference printer in every functional zone") {
    // all six test zones have a functional offset→name map, so z/zzzz
    // translate; parity covers DST flips (PST↔PDT, AEST↔AEDT, …) and
    // locale-provided names
    for (tz <- zones; loc <- Seq(java.util.Locale.ENGLISH, java.util.Locale.FRENCH)) {
      val rnd = new Random(tz.hashCode ^ loc.hashCode)
      assertParity("z Z/zzzz", tz, loc, 3600000L, instants(rnd, tz).take(25))
    }
  }

  test("raw-string pattern fuzz: refusal parity and render parity with Joda's lexer") {
    // arbitrary character soup — valid letters, INVALID letters (u, l,
    // L, T), separators, quotes (possibly unterminated): either BOTH
    // engines refuse the pattern, or both render identically. This
    // pins the LEXER (quoted literals, '' escapes, run grouping)
    // rather than the per-token translation.
    val rnd = new Random(99L)
    val alphabet = "yMdHmsSwxeEaGCkKhzZDY" + "ulLT" + "/:-. ='''"
    val tz = "America/Los_Angeles"
    val loc = java.util.Locale.ENGLISH
    val zone = DateTimeZone.forID(tz)
    val ts = instants(rnd, tz).take(8)
    var refused = 0
    for (_ <- 1 to 120) {
      val pat = Seq.fill(1 + rnd.nextInt(10))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val jodaOk =
        try { DateTimeFormat.forPattern(pat).withZone(zone).withLocale(loc)
          .print(ts.head); true }
        catch { case _: IllegalArgumentException => false }
      val mineOk = Partitioners.jodaUnsupported(pat, tz, loc).isEmpty
      assert(mineOk === jodaOk,
        s"refusal divergence on pattern '$pat': joda=$jodaOk engine=$mineOk")
      if (jodaOk) assertParity(pat, tz, loc, 3600000L, ts)
      else refused += 1
    }
    assert(refused > 10, s"fuzz degenerate: only $refused refusals")
  }

  test("sub-second buckets render the millis fraction the reference would") {
    val rnd = new Random(7L)
    assertParity("HH:mm:ss.SSS", "Asia/Kolkata", java.util.Locale.ENGLISH,
      250L, instants(rnd, "Asia/Kolkata").take(20))
    assertParity("s'x'S", "UTC", java.util.Locale.ENGLISH, 250L,
      Seq(1234567891L, 1234567891250L % Long.MaxValue, 99999L))
  }
}
