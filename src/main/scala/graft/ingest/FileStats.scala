package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.DedupIngest

/** Per-file column statistics for a logged topic — DATA SKIPPING, the
  * lakehouse staple that turns "scan the topic" into "scan the files
  * whose [min, max] can possibly satisfy the predicate". At 100 TB
  * this is the difference between a right-to-be-forgotten
  * [[CommitLog.deleteWhere]] touching every file and touching the
  * handful that can hold the user's rows.
  *
  * The stats live in a SIDECAR PLANE (`<topic>/_stats`), the same
  * versioned-watermark skeleton as the dedup gates' `_fp`/`_mh`
  * indexes, with the same safety-by-conservatism contract:
  *
  *   - a file WITHOUT a stats row is always scanned — so a stale
  *     plane (files appended or rewritten by DML since the last
  *     [[install]]) degrades to the unpruned scan, never to a wrong
  *     answer. (Correctness also leans on the log's committed-file
  *     immutability: a LIVE rel name never changes content — DML
  *     splits rename, compaction purges colliding orphans — so a
  *     stats row can never describe different bytes than the live
  *     file it names.)
  *   - pruning is three-valued: a file is skipped only when the
  *     predicate PROVABLY cannot be true for any row in it; any
  *     unsupported expression shape degrades that subtree to "maybe".
  *   - string bounds compare in SPARK's own order — unsigned UTF-8
  *     bytes ([[utf8Cmp]]) — so non-ASCII bounds (CJK, emoji) prune
  *     exactly instead of degrading to "maybe" (JVM UTF-16 order
  *     disagrees with UTF-8 order beyond the BMP boundary). That
  *     order is the UTF8_BINARY collation, Spark's default; a column
  *     carrying any OTHER collation (Spark 4 collated strings) is
  *     gated out of refutation entirely — its comparisons answer
  *     "maybe" and the file scans.
  *
  * [[install]] rebuilds the plane wholesale from the CURRENT live
  * snapshot in ONE distributed pass (group by source file), through
  * the shared crash-ordered plane installer. Schedule it with
  * [[CommitLog.maintain]]; between installs the plane only loses
  * coverage, never correctness.
  *
  * Reference: the connector (`io.confluent.connect.hdfs`) delegates
  * all querying to Hive and keeps no file statistics; this is the
  * Spark-native replacement for that missing plane.
  */
object FileStats {

  /** One column's stats within one file. Bounds are None when every
    * row is null (or the type is unsupported — such columns are never
    * written). */
  final case class Stat(typ: String, lLo: Option[Long], lHi: Option[Long],
                        dLo: Option[Double], dHi: Option[Double],
                        sLo: Option[String], sHi: Option[String],
                        nNull: Long, nRow: Long)

  private val StatsSchema = StructType(Seq(
    StructField("rel", StringType), StructField("col", StringType),
    StructField("typ", StringType),
    StructField("llo", LongType), StructField("lhi", LongType),
    StructField("dlo", DoubleType), StructField("dhi", DoubleType),
    StructField("slo", StringType), StructField("shi", StringType),
    StructField("nnull", LongType), StructField("nrow", LongType)))

  private def statsDir(outDir: String, topic: String) =
    new Path(s"$outDir/$topic/_stats")

  /** The long-domain canonicalization per supported type: integrals
    * as-is, booleans 0/1, timestamps as epoch micros, dates as epoch
    * days — each matching the Catalyst LITERAL's internal value, so
    * pruning compares like with like. */
  private def longView(name: String, dt: DataType): Option[Column] = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      Some(col(name).cast(LongType))
    case BooleanType => Some(col(name).cast(LongType))
    case TimestampType => Some(unix_micros(col(name)))
    case DateType => Some(unix_date(col(name)).cast(LongType))
    case _ => None
  }

  /** Compute and atomically install the plane for `cols` (silently
    * skipping unsupported-typed names) from the current live
    * snapshot. One distributed scan: per-file min/max/null-count via
    * a group-by on the source file name. Returns the covered log
    * version, or -1 when the topic has no commits. */
  def install(spark: SparkSession, outDir: String, topic: String,
              cols: Seq[String], format: String = "parquet"): Long = {
    val latest = CommitLog.latestVersion(spark, outDir, topic)
    if (latest < 0) return -1L
    DedupIngest.rebuildIndexFromSnapshot(spark, outDir, topic,
      statsDir(outDir, topic), StatsSchema,
      rels => statsOf(spark, outDir, topic, cols, format, rels))
    latest
  }

  private def statsOf(spark: SparkSession, outDir: String, topic: String,
                      cols: Seq[String], format: String,
                      rels: Seq[String]): DataFrame = {
    val df = CommitLog.readFiles(spark, outDir, topic, rels, format)
    val schema = df.schema
    // rel = the last two path segments (the enforced default
    // partition=<p>/<name> layout) of the file each row came from
    val parts = split(input_file_name(), "/")
    val rel = concat_ws("/", element_at(parts, -2), element_at(parts, -1))
    // (column name, its stat domain, install-time lo/hi expressions) —
    // unsupported types get NO stats row and are therefore always
    // scanned
    val typed: Seq[(String, String, Column, Column)] =
      cols.distinct.flatMap { c =>
        schema.fieldNames.find(_.equalsIgnoreCase(c)).flatMap { fn =>
          longView(fn, schema(fn).dataType) match {
            case Some(lv) => Some((fn, "l", min(lv), max(lv)))
            case None => schema(fn).dataType match {
              case FloatType | DoubleType | _: DecimalType =>
                Some((fn, "d", min(col(fn).cast(DoubleType)),
                  max(col(fn).cast(DoubleType))))
              case StringType => Some((fn, "s", min(col(fn)), max(col(fn))))
              case _ => None
            }
          }
        }
      }
    require(typed.nonEmpty, s"no stats-capable column among $cols in $topic")
    val aggs = typed.flatMap { case (c, _, lo, hi) =>
      Seq(lo.as(s"__lo_$c"), hi.as(s"__hi_$c"),
        count(when(col(c).isNull, 1)).as(s"__nn_$c"))
    }
    val grouped = df.withColumn("__rel", rel)
      .groupBy(col("__rel"))
      .agg(count(lit(1)).as("__nrow"), aggs: _*)
    // reshape driver-side: #files × #cols rows — plane-sized metadata
    val rows = grouped.collect().toSeq.flatMap { r =>
      val relV = r.getAs[String]("__rel")
      val nrow = r.getAs[Long]("__nrow")
      typed.map { case (c, t, _, _) =>
        val nn = r.getAs[Long](s"__nn_$c")
        def opt[A](n: String): Option[A] = {
          val i = r.fieldIndex(n)
          if (r.isNullAt(i)) None else Some(r.getAs[A](i))
        }
        val (llo, lhi) =
          if (t == "l") (opt[Long](s"__lo_$c"), opt[Long](s"__hi_$c"))
          else (None, None)
        val (dlo, dhi) =
          if (t == "d") (opt[Double](s"__lo_$c"), opt[Double](s"__hi_$c"))
          else (None, None)
        val (slo, shi) =
          if (t == "s") (opt[String](s"__lo_$c"), opt[String](s"__hi_$c"))
          else (None, None)
        org.apache.spark.sql.Row(relV, c.toLowerCase, t,
          llo.orNull, lhi.orNull, dlo.orNull, dhi.orNull,
          slo.orNull, shi.orNull, nn, nrow)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), StatsSchema)
  }

  /** INCREMENTAL coverage: stats for just `rels` appended as one
    * `v<version>.parquet` plane file (the `_fp` accrual model — the
    * read side merges every version file; a rel appears in exactly
    * one, since committed files commit once and [[install]]/
    * [[refresh]] replace the file set wholesale). This is what
    * [[CommitLog.writeLogged]] runs at commit time when asked, so a
    * hot topic's newest files are covered without waiting for the
    * nightly sweep. Idempotent per version (replays skip). */
  def installFor(spark: SparkSession, outDir: String, topic: String,
                 cols: Seq[String], version: Long, rels: Seq[String],
                 format: String = "parquet"): Unit = {
    if (rels.isEmpty) return
    DedupIngest.installVersionFile(DedupIngest.hfs(spark, outDir),
      statsDir(outDir, topic), version,
      statsOf(spark, outDir, topic, cols, format, rels))
  }

  /** Re-[[install]] using the column set the existing plane already
    * covers (recorded in its own rows) — the nightly-sweep hook
    * [[CommitLog.maintain]] runs after compaction, restoring full
    * coverage over rewritten and appended files. No-op when the
    * topic was never statted. */
  def refresh(spark: SparkSession, outDir: String, topic: String,
              format: String = "parquet"): Long = {
    val plane = read(spark, outDir, topic)
    if (plane.isEmpty) return -1L
    val cols = plane.valuesIterator.flatMap(_.keys).toSeq.distinct.sorted
    install(spark, outDir, topic, cols, format)
  }

  /** The installed plane as rel → (lower-cased col → [[Stat]]), or
    * empty when never installed. */
  def read(spark: SparkSession, outDir: String,
           topic: String): Map[String, Map[String, Stat]] = {
    val files = DedupIngest.fpFiles(DedupIngest.hfs(spark, outDir),
      statsDir(outDir, topic)).map(_._2.toString)
    if (files.isEmpty) return Map.empty
    spark.read.schema(StatsSchema).parquet(files: _*).collect()
      .groupBy(_.getString(0))
      .map { case (rel, rs) =>
        rel -> rs.map { r =>
          def o[A](i: Int): Option[A] =
            if (r.isNullAt(i)) None else Some(r.getAs[A](i))
          r.getString(1) -> Stat(r.getString(2), o[Long](3), o[Long](4),
            o[Double](5), o[Double](6), o[String](7), o[String](8),
            r.getLong(9), r.getLong(10))
        }.toMap
      }
  }

  /** METADATA-ONLY aggregates: when the plane covers every live file,
    * row count and per-column min/max/null-count are answered from
    * the plane alone — zero data files open (the same trick a
    * lakehouse pulls for `SELECT count(*)/min/max`). Returns None
    * when any live file lacks coverage or the topic is empty — the
    * caller falls back to a real scan. Only columns covered in EVERY
    * live file appear (mixed-column planes from differing
    * [[installFor]] calls restrict to the intersection). */
  def metaAggregates(spark: SparkSession, outDir: String,
                     topic: String): Option[(Long, Map[String, Stat])] = {
    val snap = CommitLog.snapshot(spark, outDir, topic)
    if (snap.isEmpty) return None
    val plane = read(spark, outDir, topic)
    if (snap.exists(r => !plane.contains(r))) return None
    val live = snap.map(plane)
    val total = live.map(_.head._2.nRow).sum
    val cols = live.map(_.keySet).reduce(_ intersect _)
    val merged = cols.map { c =>
      val sts = live.map(_(c))
      def mo[A](f: Stat => Option[A], pick: (A, A) => A): Option[A] =
        sts.flatMap(f(_)).reduceOption(pick)
      // double merges follow SPARK's NaN order (NaN greatest): min
      // prefers the non-NaN side — `math.min(1.0, NaN)` is NaN on the
      // JVM, which would report min = NaN where a real scan says 1.0
      // (a per-file min of NaN only happens when that file is ALL NaN)
      c -> Stat(sts.head.typ,
        mo(_.lLo, math.min(_: Long, _: Long)),
        mo(_.lHi, math.max(_: Long, _: Long)),
        mo(_.dLo, (a: Double, b: Double) =>
          if (a.isNaN) b else if (b.isNaN) a else math.min(a, b)),
        mo(_.dHi, (a: Double, b: Double) =>
          if (a.isNaN || b.isNaN) Double.NaN else math.max(a, b)),
        // string extrema merge in SPARK's order (UTF-8 bytes), not the
        // JVM's UTF-16 order — they disagree beyond the BMP boundary
        mo(_.sLo, (a: String, b: String) => if (utf8Cmp(a, b) <= 0) a else b),
        mo(_.sHi, (a: String, b: String) => if (utf8Cmp(a, b) >= 0) a else b),
        sts.map(_.nNull).sum, sts.map(_.nRow).sum)
    }.toMap
    Some((total, merged))
  }

  /** Keep only the rels whose stats CANNOT refute `predicate` — plus
    * every rel without stats (conservative). Driver-side metadata
    * work; the file list is the unit of pruning, as in every
    * snapshot-driven read here. The predicate is RESOLVED against the
    * topic's schema (one footer read) so attribute and literal types
    * are bound before the three-valued walk. */
  def pruneRels(spark: SparkSession, outDir: String, topic: String,
                predicate: Column, rels: Seq[String],
                format: String = "parquet"): Seq[String] = {
    if (rels.isEmpty) return rels
    val plane = read(spark, outDir, topic)
    if (plane.isEmpty) return rels
    // resolution probe against ONE file's schema; on a mixed-schema
    // topic (schema evolution, metadata-less appends) the predicate's
    // column may be absent from that file — resolution failure must
    // degrade to "never refute", not a thrown plan error
    val cond =
      try CommitLog.readFiles(spark, outDir, topic, rels.take(1), format)
        .filter(predicate).queryExecution.analyzed
        .collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition
        }
      catch { case scala.util.control.NonFatal(_) => None }
    cond match {
      case Some(expr) =>
        rels.filter(rel => plane.get(rel).forall(mayMatch(expr, _)))
      case None => rels // no Filter node surfaced: never refute
    }
  }

  /** Read the topic's live rows matching `predicate`, scanning only
    * files the stats plane cannot refute. Identical results to
    * `CommitLog.read(...).filter(predicate)` at a fraction of the
    * I/O when the predicate is selective on an installed column. */
  def readPruned(spark: SparkSession, outDir: String, topic: String,
                 predicate: Column,
                 format: String = "parquet"): DataFrame = {
    val snap = CommitLog.snapshot(spark, outDir, topic)
    if (snap.isEmpty)
      return CommitLog.read(spark, outDir, topic, format).filter(predicate)
    val keep = pruneRels(spark, outDir, topic, predicate, snap, format)
    // all files refuted: one file still anchors the schema (its rows
    // are filtered by the same predicate the stats already refuted)
    val paths = if (keep.nonEmpty) keep else snap.take(1)
    CommitLog.readFiles(spark, outDir, topic, paths, format)
      .filter(predicate)
  }

  // ----------------------------------------------------------------
  // Three-valued pruning: mayMatch == false ONLY when the predicate
  // cannot be true for any row of the file. Unknown shapes → true.
  // ----------------------------------------------------------------

  /** Casts through which the attribute's stats remain comparable:
    * EXACT value embeddings only (integral widening; byte/short/int
    * and float into double). A lossy cast (long→double, anything→
    * float, temporal↔numeric, narrowing) maps column values to
    * DIFFERENT numbers than the stats bounds describe, so unwrapping
    * it could refute a true match — those stay "maybe". */
  private def exactWiden(from: DataType, to: DataType): Boolean = {
    def irank(dt: DataType): Int = dt match {
      case ByteType => 1
      case ShortType => 2
      case IntegerType => 3
      case LongType => 4
      case _ => -1
    }
    val (fi, ti) = (irank(from), irank(to))
    (fi > 0 && ti > 0 && fi <= ti) ||
      (to == DoubleType &&
        (fi > 0 && fi <= 3 || from == FloatType || from == DoubleType))
  }

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.nameParts.mkString(".").toLowerCase)
    // COLLATION GATE: string min/max pruning compares in UTF8_BINARY
    // order ([[utf8Cmp]]). Under a non-binary collation (Spark 4
    // collated strings: UNICODE, UTF8_LCASE, ...) that order is wrong
    // BOTH ways — bounds were merged in byte order and the engine
    // compares in collation order — so a collated string column must
    // never refute a file. Returning None degrades every comparison
    // on it to "maybe" (scan), the conservative direction.
    case a: AttributeReference => a.dataType match {
      // `StringType` (the object) IS the UTF8_BINARY default; any
      // other collation compares unequal (equality is by collation)
      case st: StringType if st != StringType => None
      case _ => Some(a.name.toLowerCase)
    }
    case c: Cast if exactWiden(c.child.dataType, c.dataType) =>
      attrName(c.child)
    case _ => None
  }

  private def litValue(e: Expression): Option[(Any, DataType)] = e match {
    case Literal(v, dt) if v != null => Some((v, dt))
    case c: Cast if c.foldable =>
      // evaluate the analyzer-inserted (or user-written) cast so the
      // comparison uses the POST-cast value — exact even for lossy
      // casts, because that IS the value the predicate compares
      val v = try c.eval(null) catch { case _: Exception => null }
      if (v == null) None else Some((v, c.dataType))
    case _ => None
  }

  /** Compare two strings in SPARK's order — unsigned lexicographic
    * over UTF-8 bytes. JVM `String.compareTo` is UTF-16 code-unit
    * order, which disagrees beyond ASCII (supplementary code points
    * U+10000+ encode as surrogates and sort BEFORE U+E000..U+FFFF in
    * UTF-16, after them in UTF-8/code-point order) — comparing in the
    * engine's own order lets non-ASCII bounds prune instead of
    * degrading to "maybe". */
  private[ingest] def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Literal → the stat's comparison domain. None = incomparable →
    * caller must answer "maybe". */
  private def asLong(v: Any): Option[Long] = v match {
    case b: Boolean => Some(if (b) 1L else 0L)
    case b: Byte => Some(b.toLong)
    case s: Short => Some(s.toLong)
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case _ => None
  }

  private def asDouble(v: Any): Option[Double] = v match {
    case b: Byte => Some(b.toDouble)
    case s: Short => Some(s.toDouble)
    case i: Int => Some(i.toDouble)
    case l: Long => Some(l.toDouble)
    case f: Float => Some(f.toDouble)
    case d: Double => Some(d)
    case d: Decimal => Some(d.toDouble)
    case d: java.math.BigDecimal => Some(d.doubleValue)
    case _ => None
  }

  private sealed trait Cmp
  private case object Lt extends Cmp
  private case object Le extends Cmp
  private case object Gt extends Cmp
  private case object Ge extends Cmp
  private case object Eq extends Cmp

  private def isNaN(v: Any): Boolean = v match {
    case f: Float => f.isNaN
    case d: Double => d.isNaN
    case _ => false
  }

  /** Can `col <cmp> lit` be true for some non-null value in [lo, hi]?
    * Works in whichever domain the stat carries; double bounds are
    * widened one ulp each way so decimal→double install rounding can
    * never refute a true match.
    *
    * NaN follows SPARK's total order, not IEEE: NaN is GREATER than
    * every value and NaN = NaN is TRUE (`functions.min` skips NaN, so
    * an install-time max of NaN means the file HAS a NaN and a min of
    * NaN means EVERY value is NaN) — naive Scala comparisons here
    * would refute `col > x` for a file whose max is NaN even though
    * its NaN rows satisfy the predicate in Spark. */
  private def rangeMay(st: Stat, cmp: Cmp, v: Any): Boolean = {
    if (st.nRow == st.nNull) return false // all null: no comparison is true
    if (isNaN(v)) {
      // literal NaN: only NaN values satisfy Eq/Ge; nothing satisfies
      // Gt; every non-null value satisfies Le; Lt needs a non-NaN value
      if (st.typ == "s") return true // not reachable via attrName; safe
      val hasNaN = st.typ == "d" && st.dHi.exists(_.isNaN)
      val allNaN = st.typ == "d" && st.dLo.exists(_.isNaN)
      return cmp match {
        case Eq | Ge => hasNaN
        case Gt => false
        case Le => true
        case Lt => !allNaN
      }
    }
    st.typ match {
      case "l" =>
        (asLong(v), st.lLo, st.lHi) match {
          case (Some(x), Some(lo), Some(hi)) => cmp match {
            case Lt => lo < x
            case Le => lo <= x
            case Gt => hi > x
            case Ge => hi >= x
            case Eq => lo <= x && x <= hi
          }
          case _ =>
            // fractional literal against integral bounds — widened one
            // ulp each way, since long→double itself rounds past 2^53
            (asDouble(v), st.lLo, st.lHi) match {
              case (Some(x), Some(lo0), Some(hi0)) =>
                val lo = Math.nextDown(lo0.toDouble)
                val hi = Math.nextUp(hi0.toDouble)
                cmp match {
                  case Lt => lo < x
                  case Le => lo <= x
                  case Gt => hi > x
                  case Ge => hi >= x
                  case Eq => lo <= x && x <= hi
                }
              case _ => true
            }
        }
      case "d" =>
        (asDouble(v), st.dLo, st.dHi) match {
          case (Some(x), Some(lo0), Some(hi0)) =>
            // NaN bounds, Spark order: max = NaN ⇒ the file HAS a NaN,
            // which satisfies any `>`/`>=` (NaN is greatest); min =
            // NaN ⇒ EVERY value is NaN, so no non-NaN literal matches
            // `<`/`<=`/`=`. When NaN rows coexist with real ones the
            // non-NaN maximum is unknown — Eq keeps only its lower
            // bound check.
            val hasNaN = hi0.isNaN
            val allNaN = lo0.isNaN
            if (hasNaN && (cmp == Gt || cmp == Ge)) return true
            if (allNaN) return false
            // a few ulps of slack: decimal→double happened once at
            // install and once on the literal — refutation must
            // survive both roundings
            val lo = Iterator.iterate(lo0)(Math.nextDown).drop(4).next()
            val hi = Iterator.iterate(hi0)(Math.nextUp).drop(4).next()
            cmp match {
              case Lt => lo < x
              case Le => lo <= x
              case Gt => hi > x
              case Ge => hi >= x
              case Eq => lo <= x && (hasNaN || x <= hi)
            }
          case _ => true
        }
      case "s" =>
        val sv = v match {
          case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
          case s: String => Some(s)
          case _ => None
        }
        (sv, st.sLo, st.sHi) match {
          case (Some(x), Some(lo), Some(hi)) => cmp match {
            // Spark's string order (UTF8_BINARY default collation) IS
            // unsigned UTF-8 byte order — compared in that domain,
            // non-ASCII bounds prune exactly
            case Lt => utf8Cmp(lo, x) < 0
            case Le => utf8Cmp(lo, x) <= 0
            case Gt => utf8Cmp(hi, x) > 0
            case Ge => utf8Cmp(hi, x) >= 0
            case Eq => utf8Cmp(lo, x) <= 0 && utf8Cmp(x, hi) <= 0
          }
          case _ => true
        }
      case _ => true
    }
  }

  /** Three-valued evaluation of `e` against one file's stats. */
  private[graft] def mayMatch(e: Expression,
                              stats: Map[String, Stat]): Boolean = e match {
    case And(l, r) => mayMatch(l, stats) && mayMatch(r, stats)
    case Or(l, r) => mayMatch(l, stats) || mayMatch(r, stats)
    case Literal(b: Boolean, BooleanType) => b
    case EqualTo(a, b) => cmpMay(a, b, Eq, Eq, stats)
    case EqualNullSafe(a, b) => cmpMay(a, b, Eq, Eq, stats)
    case LessThan(a, b) => cmpMay(a, b, Lt, Gt, stats)
    case LessThanOrEqual(a, b) => cmpMay(a, b, Le, Ge, stats)
    case GreaterThan(a, b) => cmpMay(a, b, Gt, Lt, stats)
    case GreaterThanOrEqual(a, b) => cmpMay(a, b, Ge, Le, stats)
    case In(a, vs) => attrName(a) match {
      case Some(n) => stats.get(n) match {
        case Some(st) => vs.exists {
          case Literal(v, _) if v != null => rangeMay(st, Eq, v)
          case Literal(_, _) => false // col IN (... NULL ...) is never TRUE for the null
          case _ => true
        }
        case None => true
      }
      case None => true
    }
    case IsNull(a) => attrName(a).flatMap(stats.get) match {
      case Some(st) => st.nNull > 0
      case None => true
    }
    case IsNotNull(a) => attrName(a).flatMap(stats.get) match {
      case Some(st) => st.nRow > st.nNull
      case None => true
    }
    case _ => true // unsupported shape: never refute
  }

  /** `a <cmp> b` with the attribute on either side (`flip` is the
    * mirrored operator for `lit <cmp> col`). */
  private def cmpMay(a: Expression, b: Expression, cmp: Cmp, flip: Cmp,
                     stats: Map[String, Stat]): Boolean = {
    (attrName(a), litValue(b)) match {
      case (Some(n), Some((v, _))) =>
        stats.get(n).forall(rangeMay(_, cmp, v))
      case _ => (litValue(a), attrName(b)) match {
        case (Some((v, _)), Some(n)) =>
          stats.get(n).forall(rangeMay(_, flip, v))
        case _ => true
      }
    }
  }
}
