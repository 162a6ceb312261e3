package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, EqualTo, Expression, In, Literal, XxHash64}
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.DedupIngest

/** Bloom-filter file skipping for EQUALITY predicates — the plane
  * [[FileStats]]' min/max ranges cannot serve: a point lookup on a
  * high-cardinality, order-uncorrelated column (user id, document
  * hash, URL) falls inside almost every file's range, so range stats
  * keep everything. A per-file Bloom filter refutes `col = value` for
  * every file whose set provably lacks the value — no false negatives
  * by construction, so pruning skips FILES, never rows. This is the
  * right-to-be-forgotten cost model at its sharpest: `deleteWhere
  * (col("user_id") === x)` opens only the files whose filter admits x.
  *
  * Plane layout (the `_fp`/`_stats` versioned-sidecar skeleton, shared
  * installer): one row per (file, column, 64-bit WORD of the bitset)
  * that has any bit set, plus a coverage marker row (`word = -1`,
  * `bits` = row count) per (file, column) — sparse storage, so a small
  * file costs k·rows words at most, never m/64. Absence of the marker
  * means "not covered" and the file is conservatively kept.
  *
  * Scale shape: the build is ONE distributed scan — k positions per
  * row per column from a 64-bit xxhash (Kirsch–Mitzenmacher double
  * hashing: the two 32-bit halves drive k indexes), explode → one
  * map-side-combinable `bit_or` group-by; no UDAF, no driver data.
  * The probe reads the plane parquet TWICE with pushdown (coverage
  * rows to learn each file's (m, k); then exactly the probe words) —
  * metadata-scale I/O independent of data size. Build-side and
  * probe-side hashing share one code path: the probe evaluates the
  * very Catalyst `XxHash64(Literal)` the executors ran, so a type
  * mismatch is impossible by construction — and any shape the walker
  * does not recognize (casts, expressions over the column) simply
  * does not prune.
  *
  * Reference anchor: the connector delegates querying to Hive and
  * keeps no per-file indexes; this plane is the Spark-native
  * counterpart of the Bloom indexes production lakehouses attach to
  * point-lookup columns. */
object FileBloom {

  /** Default filter size in bits (2^16 → 8 KiB dense worst case, far
    * less sparse) and probe count. At 10 bits/key this covers ~6.5k
    * distinct keys per file at ~1% false-positive — size up via
    * [[install]]'s `mBits` for bigger flush sizes. */
  val DefaultMBits = 1 << 16
  val DefaultK = 6

  private val BloomSchema = StructType(Seq(
    StructField("rel", StringType), StructField("col", StringType),
    StructField("m", IntegerType), StructField("k", IntegerType),
    StructField("word", IntegerType), StructField("bits", LongType)))

  private def bloomDir(outDir: String, topic: String) =
    new Path(s"$outDir/$topic/_bloom")

  /** Types whose executor-side `xxhash64` the driver-side probe can
    * reproduce exactly from a resolved literal. */
  private def hashable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType |
         FloatType | DoubleType | StringType | BinaryType | DateType |
         TimestampType => true
    case _ => false
  }

  /** Compute and atomically install the plane for `cols` from the
    * current live snapshot (wholesale replace — the [[FileStats]]
    * lifecycle). Returns the covered log version, -1 when empty. */
  def install(spark: SparkSession, outDir: String, topic: String,
              cols: Seq[String], mBits: Int = DefaultMBits,
              k: Int = DefaultK, format: String = "parquet"): Long = {
    val latest = CommitLog.latestVersion(spark, outDir, topic)
    if (latest < 0) return -1L
    DedupIngest.rebuildIndexFromSnapshot(spark, outDir, topic,
      bloomDir(outDir, topic), BloomSchema,
      rels => bloomOf(spark, outDir, topic, cols, mBits, k, format, rels))
    latest
  }

  /** Incremental commit-time coverage for just-published `rels` (the
    * `_fp` accrual model) — what [[CommitLog.writeLogged]] runs when
    * asked, so hot topics stay point-prunable between sweeps. */
  def installFor(spark: SparkSession, outDir: String, topic: String,
                 cols: Seq[String], version: Long, rels: Seq[String],
                 mBits: Int = DefaultMBits, k: Int = DefaultK,
                 format: String = "parquet"): Unit = {
    if (rels.isEmpty) return
    DedupIngest.installVersionFile(DedupIngest.hfs(spark, outDir),
      bloomDir(outDir, topic), version,
      bloomOf(spark, outDir, topic, cols, mBits, k, format, rels))
  }

  /** Re-[[install]] over the column set (and m/k) the existing plane
    * records — the [[CommitLog.maintain]] hook restoring coverage
    * after compaction rewrites. No-op when never bloomed. */
  def refresh(spark: SparkSession, outDir: String, topic: String,
              format: String = "parquet"): Long = {
    val f = DedupIngest.hfs(spark, outDir)
    val files = DedupIngest.fpFiles(f, bloomDir(outDir, topic))
      .map(_._2.toString)
    if (files.isEmpty) return -1L
    val hdr = spark.read.schema(BloomSchema).parquet(files: _*)
      .filter(col("word") === -1)
      .select(col("col"), col("m"), col("k")).distinct().collect()
    if (hdr.isEmpty) return -1L
    val cols = hdr.map(_.getString(0)).toSeq.distinct.sorted
    // one (m, k) per plane: a mixed plane re-covers at the LARGEST m
    // recorded (monotone safe — the probe reads m per coverage row)
    val m = hdr.map(_.getInt(1)).max
    val kk = hdr.map(_.getInt(2)).max
    install(spark, outDir, topic, cols, m, kk, format)
  }

  /** One distributed pass: per file × column × touched word, the
    * OR of the k set bits of every row's value. */
  private def bloomOf(spark: SparkSession, outDir: String, topic: String,
                      cols: Seq[String], mBits: Int, k: Int,
                      format: String, rels: Seq[String]): DataFrame = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      s"mBits must be a power of two >= 64, got $mBits")
    require(k >= 1 && k <= 16, s"k must be 1..16, got $k")
    val df = CommitLog.readFiles(spark, outDir, topic, rels, format)
    val schema = df.schema
    val parts = split(input_file_name(), "/")
    val rel = concat_ws("/", element_at(parts, -2), element_at(parts, -1))
    val typed = cols.distinct.flatMap(c =>
      schema.fieldNames.find(_.equalsIgnoreCase(c))
        .filter(fn => hashable(schema(fn).dataType)))
    require(typed.nonEmpty, s"no bloom-capable column among $cols in $topic")
    // (col name, [k positions]) structs per row, two explodes → one
    // (rel, col, pos) row per probe position
    val colPos = typed.map { fn =>
      val h = xxhash64(col(fn))
      val h1 = h.bitwiseAND(lit(0xffffffffL))
      val h2 = shiftrightunsigned(h, 32).bitwiseOR(lit(1L))
      val ps = array((0 until k).map(i =>
        pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong))): _*)
      struct(lit(fn.toLowerCase).as("c"), ps.as("ps"))
    }
    val positions = df
      .select(rel.as("rel"), explode(array(colPos: _*)).as("cp"))
      .select(col("rel"), col("cp.c").as("col"), explode(col("cp.ps")).as("p"))
    // ONE data scan: the word bitmaps carry their position counts, and
    // the coverage markers derive from those counts (every row
    // contributes exactly k positions per column, nulls included —
    // xxhash64 of a null is the seed) — plane-over-plane aggregation,
    // never a second pass over the data
    val bitRows = positions
      .groupBy(col("rel"), col("col"),
        shiftright(col("p"), 6).cast(IntegerType).as("word"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(pmod(p, 64) as int)))")
        .as("bits"), count(lit(1)).as("__cnt"))
    val cover = bitRows.groupBy(col("rel"), col("col"))
      .agg((sum(col("__cnt")) / k).cast(LongType).as("bits"))
      .select(col("rel"), col("col"), lit(-1).as("word"), col("bits"))
    bitRows.select(col("rel"), col("col"), col("word"), col("bits"))
      .unionByName(cover)
      .select(col("rel"), col("col"), lit(mBits).as("m"), lit(k).as("k"),
        col("word").cast(IntegerType).as("word"),
        col("bits").cast(LongType).as("bits"))
  }

  /** (word, mask) probe positions of one resolved literal under (m, k)
    * — the driver evaluates the SAME Catalyst XxHash64 the executors
    * ran at build time. */
  private def probe(l: Literal, m: Int, k: Int): Seq[(Int, Long)] = {
    val h = XxHash64(Seq(l), 42L).eval(null).asInstanceOf[Long]
    val h1 = h & 0xffffffffL
    val h2 = (h >>> 32) | 1L
    (0 until k).map { i =>
      val p = java.lang.Math.floorMod(h1 + i * h2, m.toLong).toInt
      (p >> 6, 1L << (p & 63))
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  /** Equality conjuncts the plane can serve: bare attribute vs
    * same-typed non-null literal(s). Anything else (casts, functions
    * of the column, null-safe-to-null comparisons) never prunes. */
  private def eqConjuncts(cond: Expression): Seq[(String, Seq[Literal])] =
    conjuncts(cond).flatMap {
      case EqualTo(a: AttributeReference, l: Literal)
          if l.value != null && a.dataType == l.dataType && hashable(a.dataType) =>
        Some(a.name.toLowerCase -> Seq(l))
      case EqualTo(l: Literal, a: AttributeReference)
          if l.value != null && a.dataType == l.dataType && hashable(a.dataType) =>
        Some(a.name.toLowerCase -> Seq(l))
      case EqualNullSafe(a: AttributeReference, l: Literal)
          if l.value != null && a.dataType == l.dataType && hashable(a.dataType) =>
        Some(a.name.toLowerCase -> Seq(l))
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && hashable(a.dataType) && vs.forall {
            case l: Literal => l.value != null && l.dataType == a.dataType
            case _ => false
          } =>
        Some(a.name.toLowerCase -> vs.map(_.asInstanceOf[Literal]))
      case _ => None
    }

  /** Keep only rels whose Bloom filters cannot refute `predicate`'s
    * equality conjuncts — plus every rel without coverage. A file is
    * refuted when, for some conjunct, NONE of its listed values has
    * all k bits present. */
  def pruneRels(spark: SparkSession, outDir: String, topic: String,
                predicate: Column, rels: Seq[String],
                format: String = "parquet"): Seq[String] = {
    if (rels.isEmpty) return rels
    val f = DedupIngest.hfs(spark, outDir)
    val files = DedupIngest.fpFiles(f, bloomDir(outDir, topic))
      .map(_._2.toString)
    if (files.isEmpty) return rels
    // same degradation rule as FileStats.pruneRels: the resolution
    // probe runs against ONE file's schema, and on a schema-evolved
    // topic the predicate's column may be absent from that file —
    // resolution failure must degrade to "never refute", not a
    // thrown plan error
    val cond =
      (try CommitLog.readFiles(spark, outDir, topic, rels.take(1), format)
        .filter(predicate).queryExecution.analyzed
        .collectFirst { case fl: logical.Filter => fl.condition }
      catch { case scala.util.control.NonFatal(_) => None })
        .getOrElse(return rels)
    val eqs = eqConjuncts(cond)
    if (eqs.isEmpty) return rels
    val colNames = eqs.map(_._1).distinct
    val plane = spark.read.schema(BloomSchema).parquet(files: _*)
    // pass 1 (pushdown): coverage rows → each (rel, col)'s (m, k)
    val covered = plane
      .filter(col("word") === -1 && col("col").isin(colNames: _*))
      .select(col("rel"), col("col"), col("m"), col("k")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getInt(2), r.getInt(3)))
      .toMap
    if (covered.isEmpty) return rels
    // probe positions per (literal, m, k) — keyed by the literal, NOT
    // the column: two conjuncts on the same column (uid = a AND
    // uid = b) carry different literals and must probe independently
    val mks = covered.values.toSeq.distinct
    val probes: Map[(Literal, Int, Int), Seq[(Int, Long)]] =
      (for { (_, lits) <- eqs; l <- lits; (m, kk) <- mks }
        yield (l, m, kk) -> probe(l, m, kk)).toMap
    val wordsNeeded = probes.valuesIterator
      .flatMap(_.iterator.map(_._1)).toSeq.distinct
    // pass 2 (pushdown): exactly the probe words
    val bits = plane
      .filter(col("col").isin(colNames: _*) &&
        col("word").isin(wordsNeeded: _*))
      .select(col("rel"), col("col"), col("word"), col("bits")).collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
      .map { case (key, rs) =>
        key -> rs.map(r => r.getInt(2) -> r.getLong(3)).toMap
      }
    rels.filter { rel =>
      eqs.forall { case (c, lits) =>
        covered.get((rel, c)) match {
          case None => true // not covered: conservative keep
          case Some((m, kk)) =>
            val wordMap = bits.getOrElse((rel, c), Map.empty[Int, Long])
            lits.exists(l => probes((l, m, kk)).forall { case (w, mask) =>
              (wordMap.getOrElse(w, 0L) & mask) != 0L
            })
        }
      }
    }
  }

  /** Read the topic's live rows matching `predicate`, scanning only
    * files neither the range plane ([[FileStats]]) nor this plane can
    * refute — identical results to a full filtered scan. */
  def readPruned(spark: SparkSession, outDir: String, topic: String,
                 predicate: Column,
                 format: String = "parquet"): DataFrame = {
    val snap = CommitLog.snapshot(spark, outDir, topic)
    if (snap.isEmpty)
      return CommitLog.read(spark, outDir, topic, format).filter(predicate)
    val keep = pruneRels(spark, outDir, topic, predicate,
      FileStats.pruneRels(spark, outDir, topic, predicate, snap, format),
      format)
    val paths = if (keep.nonEmpty) keep else snap.take(1)
    CommitLog.readFiles(spark, outDir, topic, paths, format)
      .filter(predicate)
  }
}
