package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions
import graft.ingest.CommitLog

/** The SERVED IVF index: train-once / search-many, with the trained
  * artifact published through the transactional [[CommitLog]] instead
  * of living inside every query's plan.
  *
  * Lifecycle:
  *   - [[build]] runs Lloyd ONCE (the only time the corpus is scanned
  *     for training), then publishes two logged topics under the index
  *     root: `ivf_centroids` (K rows — the quantizer) and
  *     `ivf_vectors` (the assigned corpus `(id, v, cell)`).
  *   - [[search]] is probe-only: load the K-row centroid table
  *     (driver literal, one tiny file), read the assigned corpus as a
  *     log snapshot, broadcast the probes, bounded-heap top-k. No
  *     Lloyd iteration appears anywhere in the serving plan.
  *   - [[append]] grows the index without retraining: new vectors are
  *     assigned under the FROZEN quantizer and published as the next
  *     log version — searchers atomically see the grown index, and
  *     `CommitLog.readAddedSince` feeds downstream incrementals.
  *     (Centroid drift is a rebuild, by design: an index whose
  *     geometry silently shifts under running queries is not servable.
  *     `emb_drift_cells` is the monitor that says when to rebuild.)
  *
  * 100 TB story: the vectors topic is the only corpus-scale artifact
  * and it is written through the same offset-ranged / atomic-commit
  * protocol as every other topic (compactable, vacuumable,
  * time-travelable) — PARTITIONED BY CELL: the commit-log `part` IS
  * the cell id, so a search prunes the snapshot's FILE LIST to the
  * probed cells before any scan is planned. The serving read touches
  * ~nprobe/K of the index's bytes at the storage layer — not a scan
  * filter, an unread file.
  */
object IvfIndex {

  val VectorsTopic = "ivf_vectors"
  val CentroidsTopic = "ivf_centroids"

  /** Filtered-serving metadata contract: exactly ONE row per id. A
    * duplicate would fan the advisory LEFT join out and commit the
    * same vector twice — duplicate (part, off) offsets in the topic,
    * corrupting top-k results and the commit contract — so refuse
    * loudly BEFORE the join. One aggregation job over the skinny meta
    * frame, paid only at (re)build/append time. */
  private def requireUniqueMeta(meta: DataFrame): DataFrame = {
    val dup = meta.groupBy(col("id")).count()
      .filter(col("count") > 1).limit(1).count()
    require(dup == 0,
      "index metadata carries duplicate ids — filtered serving needs " +
        "exactly one meta row per vector id (a duplicate would commit " +
        "the same vector twice); dedupe meta before build/append")
    meta
  }

  /** Train the quantizer and publish the index. `vecs` = (id, v) with
    * quantized Array[Long] vectors. Returns the vectors topic's log
    * version (0 for a fresh build).
    *
    * `meta` (optional, `(id, <metadata columns...>)`) rides along in
    * the vectors topic — the payload of FILTERED search: a predicate
    * over these columns restricts the candidate set index-side.
    * `statsCols` installs the per-file min/max stats plane on the
    * named columns at commit time ([[FileStats]]), so
    * [[searchVectorsFiltered]] can skip whole files the predicate
    * refutes BEFORE scan planning — at 100 TB, when appends arrive
    * clustered by the filter column (ingest day, source, tenant),
    * a filtered search reads ~the matching slice, not the corpus.
    * `bloomCols` installs the [[graft.ingest.FileBloom]] point plane
    * the same way — the plane that prunes EQUALITY predicates
    * (lang = 'en', source = x) whose values interleave across files,
    * where a min/max range can never refute. */
  def build(vecs: DataFrame, indexDir: String, k: Int, iters: Int,
            flushSize: Int = 1 << 20,
            meta: Option[DataFrame] = None,
            statsCols: Seq[String] = Nil,
            bloomCols: Seq[String] = Nil): Long = {
    val spark = vecs.sparkSession
    // BEFORE any topic commits: serving (probeCells) embeds the
    // centroid table as plan literals and refuses k beyond
    // LiteralAssignMaxK — a build that exceeded it would commit an
    // index its own search entry can never read
    require(k > 0 && k <= KMeans.LiteralAssignMaxK,
      s"k=$k: serving embeds centroids as plan literals " +
        s"(≤ ${KMeans.LiteralAssignMaxK} cells) — shard the corpus " +
        "across indexes instead of widening one quantizer")
    require(CommitLog.latestVersion(spark, indexDir, VectorsTopic) < 0,
      s"index at $indexDir already built — append() grows it, " +
        "a retrain is a new index dir")
    meta.foreach(requireUniqueMeta) // before ANY topic commits
    val cents = KMeans.fit(vecs, k, iters)
    import spark.implicits._
    val cdf = cents.map(c => (0L, c.id, c.v)).toDF("part", "off", "cv")
    CommitLog.writeLogged(cdf, indexDir, CentroidsTopic,
      flushSize = math.max(cents.size, 1))
    val assigned0 = KMeans.assign(vecs, cents)
      .select(col("cell").as("part"), col("id").as("off"), col("v"),
        col("cell"))
    // LEFT join: metadata is advisory — a vector without a metadata
    // row stays indexed (its NULL columns never satisfy a predicate,
    // the conservative direction)
    val assigned = meta.fold(assigned0)(m =>
      assigned0.join(m.withColumnRenamed("id", "off"), Seq("off"), "left"))
    CommitLog.writeLogged(assigned, indexDir, VectorsTopic, flushSize,
      statsCols = statsCols, bloomCols = bloomCols)
  }

  /** The frozen quantizer (K driver-held centroids). */
  def centroids(spark: SparkSession, indexDir: String): Seq[KMeans.Centroid] =
    CommitLog.read(spark, indexDir, CentroidsTopic)
      .select(col("off"), col("cv")).collect()
      .map(r => KMeans.Centroid(r.getLong(0), r.getSeq[Long](1)))
      .toIndexedSeq.sortBy(_.id)

  /** The assigned corpus `(id, v, cell)` as a log snapshot — the
    * exact live file list, so a concurrent append/compaction can
    * never tear a search. */
  def vectors(spark: SparkSession, indexDir: String): DataFrame =
    CommitLog.read(spark, indexDir, VectorsTopic)
      .select(col("off").as("id"), col("v"), col("cell"))

  /** The snapshot's file list PRUNED to `cells` — the storage-layer
    * payoff of the cell-partitioned layout: the partition directory
    * embedded in each topic-relative path is the cell id, so the
    * driver drops every unprobed cell's files before Spark ever plans
    * a scan. Returns (pruned rels, total snapshot size) so callers
    * can report the pruning ratio. */
  private[graft] def prunedRels(spark: SparkSession, indexDir: String,
                                cells: Set[Long],
                                topic: String = VectorsTopic)
      : (Seq[String], Int) = {
    val rels = CommitLog.snapshot(spark, indexDir, topic)
    val keep = rels.filter { rel =>
      rel.split('/').head match {
        case s if s.startsWith("partition=") =>
          cells.contains(s.stripPrefix("partition=").toLong)
        case _ => true // unexpected layout: never silently drop data
      }
    }
    (keep, rels.size)
  }

  /** Grow the index under the frozen quantizer: assign `newVecs`
    * (ids must be new — same contract as any topic append) and
    * publish as the next log version. Returns that version. */
  def append(newVecs: DataFrame, indexDir: String,
             flushSize: Int = 1 << 20,
             meta: Option[DataFrame] = None,
             statsCols: Seq[String] = Nil,
             bloomCols: Seq[String] = Nil): Long = {
    val spark = newVecs.sparkSession
    meta.foreach(requireUniqueMeta) // before the commit
    val cents = centroids(spark, indexDir)
    val assigned0 = KMeans.assign(newVecs, cents)
      .select(col("cell").as("part"), col("id").as("off"), col("v"),
        col("cell"))
    // LEFT join: metadata is advisory — a vector without a metadata
    // row stays indexed (its NULL columns never satisfy a predicate,
    // the conservative direction)
    val assigned = meta.fold(assigned0)(m =>
      assigned0.join(m.withColumnRenamed("id", "off"), Seq("off"), "left"))
    CommitLog.writeLogged(assigned, indexDir, VectorsTopic, flushSize,
      statsCols = statsCols, bloomCols = bloomCols)
  }

  /** Probe-only top-k over an ALREADY-ASSIGNED corpus frame — the
    * shared search construction: broadcast the probes, equi-join on
    * cell, bounded-heap top-k. `assigned` = (id, v, cell), `probes` =
    * (q_id, qv, cell). Unordered (q_id, neighbor_id, dot, rnk ≤ k). */
  def searchAssigned(assigned: DataFrame, probes: DataFrame,
                     k: Int): DataFrame = {
    NativeExpressions.register(assigned.sparkSession)
    // a vector lives in one cell and probe cells are distinct, so
    // (q, neighbor) pairs are already unique
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("neighbor_id"),
        call_function("dot_i64", col("qv"), col("v")).as("dot"))
      .groupBy(col("q_id"))
      .agg(call_function("topk_pairs", col("dot"), col("neighbor_id"),
        lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("q_id"), col("p.id").as("neighbor_id"),
        col("p.ord").as("dot"), (col("pos") + 1).cast("long").as("rnk"))
  }

  /** Serve a query batch from the published index: no training, no
    * assignment of the corpus — and no scan of unprobed cells. The
    * probe cells come back to the driver (Q×nprobe values,
    * metadata-scale), the snapshot's file list prunes to them, and
    * only then is the candidate scan planned. `queryIds` are looked
    * up in the index itself (query-by-member — a skinny (id, v)
    * column read); external query vectors take [[searchVectors]] and
    * skip even that. */
  def search(spark: SparkSession, indexDir: String, queryIds: Seq[Long],
             nprobe: Int, k: Int): DataFrame = {
    val cents = centroids(spark, indexDir)
    val qvecs = vectors(spark, indexDir)
      .filter(col("id").isin(queryIds: _*)).select(col("id"), col("v"))
    searchVectors(spark, indexDir, qvecs, nprobe, k, cents)
  }

  /** The production serving entry: `queries` = (id, v) EXTERNAL query
    * vectors (quantized like the corpus). Zero full-snapshot reads —
    * probes rank against the driver-held centroids, and the corpus
    * scan is pruned to the probed cells' files. Query ids must not
    * collide with indexed ids: the self-match filter is by id, so a
    * reused id would silently exclude that corpus vector from its own
    * neighborhood (query-by-member is [[search]]'s job). */
  def searchVectors(spark: SparkSession, indexDir: String,
                    queries: DataFrame, nprobe: Int, k: Int,
                    loadedCents: Seq[KMeans.Centroid] = Seq.empty)
      : DataFrame = {
    val cents =
      if (loadedCents.nonEmpty) loadedCents else centroids(spark, indexDir)
    val probes = KMeans.probeCells(queries, cents, nprobe)
      .select(col("id").as("q_id"), col("v").as("qv"), col("cell"))
    // driver-side probe-cell set: Q×nprobe longs. This one tiny job is
    // what buys the file-level pruning below.
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSet
    val (keep, _) = prunedRels(spark, indexDir, cells)
    if (keep.isEmpty) {
      // every probed cell is empty (sparse/fresh index) — a legitimate
      // production query that simply has no neighbors; return the
      // schema-correct empty frame instead of failing the query
      import spark.implicits._
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("q_id", "neighbor_id", "dot", "rnk")
    }
    val assigned = CommitLog
      .readFiles(spark, indexDir, VectorsTopic, keep)
      .select(col("off").as("id"), col("v"), col("cell"))
    searchAssigned(assigned, probes, k)
  }

  /** FILTERED serving: [[searchVectors]] with a metadata `predicate`
    * over the columns [[build]]'s `meta` committed alongside the
    * vectors. Pre-filter semantics — candidates are filtered BEFORE
    * scoring, so the bounded heap never holds an excluded neighbor.
    * File skipping composes two planes before any scan planning:
    *   1. cell pruning (partition directories outside the probed
    *      cells), as in every serving read here;
    *   2. the [[graft.ingest.FileStats]] min/max plane on the
    *      predicate's columns (installed via `statsCols`) — files
    *      whose ranges refute the predicate are dropped from the
    *      surviving cell files;
    *   3. the [[graft.ingest.FileBloom]] point plane (installed via
    *      `bloomCols`) — equality conjuncts probe each survivor's
    *      Bloom filters, pruning files a min/max range can never
    *      refute (values interleaved across files).
    * Conservative by absence at every layer: no plane or uncovered
    * files simply scan. The predicate is then still APPLIED row-level
    * on the survivors — pruning is an I/O optimization, never a
    * semantics change. */
  def searchVectorsFiltered(spark: SparkSession, indexDir: String,
                            queries: DataFrame, nprobe: Int, k: Int,
                            predicate: org.apache.spark.sql.Column,
                            loadedCents: Seq[KMeans.Centroid] = Seq.empty)
      : DataFrame = {
    val cents =
      if (loadedCents.nonEmpty) loadedCents else centroids(spark, indexDir)
    val probes = KMeans.probeCells(queries, cents, nprobe)
      .select(col("id").as("q_id"), col("v").as("qv"), col("cell"))
    val cells = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSet
    val (cellKeep, _) = prunedRels(spark, indexDir, cells)
    val keep = graft.ingest.FileBloom.pruneRels(
      spark, indexDir, VectorsTopic, predicate,
      graft.ingest.FileStats.pruneRels(
        spark, indexDir, VectorsTopic, predicate, cellKeep))
    if (keep.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("q_id", "neighbor_id", "dot", "rnk")
    }
    val assigned = CommitLog
      .readFiles(spark, indexDir, VectorsTopic, keep)
      .filter(predicate)
      .select(col("off").as("id"), col("v"), col("cell"))
    searchAssigned(assigned, probes, k)
  }

  /** [[searchVectorsFiltered]] by corpus membership: query vectors
    * resolve from the index itself (queries need NOT satisfy the
    * predicate — they rank against the predicate-respecting corpus). */
  def searchFiltered(spark: SparkSession, indexDir: String,
                     queryIds: Seq[Long], nprobe: Int, k: Int,
                     predicate: org.apache.spark.sql.Column): DataFrame = {
    val cents = centroids(spark, indexDir)
    val qvecs = vectors(spark, indexDir)
      .filter(col("id").isin(queryIds: _*)).select(col("id"), col("v"))
    searchVectorsFiltered(spark, indexDir, qvecs, nprobe, k, predicate,
      cents)
  }

  // ---------------------------------------------------------------
  // Index GENERATIONS: the rebuild story. A quantizer is frozen for
  // its index's lifetime (searches against shifting geometry are not
  // servable), so when `emb_drift_cells` says the corpus has moved,
  // the answer is a NEW index — built in full behind the running one,
  // then installed with one atomic pointer flip. Layout under a
  // generation root:
  //
  //   <root>/gen=<n>/...        a complete index (its own topics)
  //   <root>/_current           one line: the serving generation n
  //
  // Searchers resolve `_current` once per query batch and read that
  // generation's log snapshot — a rebuild installing mid-flight can
  // never tear them (the old generation stays intact until explicitly
  // dropped after its readers drain). The pointer write is
  // stage+rename, same as every commit in this engine.
  // ---------------------------------------------------------------

  private val CurrentPtr = "_current"

  private def genDir(root: String, gen: Long) = s"$root/gen=$gen"

  /** The serving generation under `root`, or -1 before any install. */
  def currentGeneration(spark: SparkSession, root: String): Long = {
    val f = fs(spark, root)
    val p = new Path(s"$root/$CurrentPtr")
    if (!f.exists(p)) return -1L
    val in = f.open(p)
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      buf.toString("UTF-8").trim
    } finally in.close()
    require(text.nonEmpty && text.forall(_.isDigit),
      s"corrupt generation pointer at $p: '$text'")
    text.toLong
  }

  /** Resolve the CURRENT generation's index dir — what every serving
    * call reads once up front. [[installPointer]]'s delete→rename flip
    * has a brief no-pointer window; a short bounded backoff loop
    * (8 attempts, ~765 ms worst case) distinguishes that transient
    * from a truly uninstalled root, so a searcher resolving mid-flip
    * doesn't throw a spurious serving failure even on a slow/remote
    * FS or under a GC pause. */
  def currentDir(spark: SparkSession, root: String): String = {
    var gen = currentGeneration(spark, root)
    var delayMs = 3L
    while (gen < 0 && delayMs <= 384L) {
      Thread.sleep(delayMs)
      delayMs *= 2
      gen = currentGeneration(spark, root)
    }
    require(gen >= 0, s"no index generation installed under $root")
    genDir(root, gen)
  }

  /** Build generation N+1 in full behind the serving one, then flip
    * `_current` atomically. Returns the new generation number. The
    * prior generation is left intact — drop it with [[dropGeneration]]
    * once its in-flight readers have drained (the vacuum grace
    * contract, one level up). */
  def rebuild(vecs: DataFrame, root: String, k: Int, iters: Int,
              flushSize: Int = 1 << 20): Long = {
    val spark = vecs.sparkSession
    val next = currentGeneration(spark, root) + 1
    build(vecs, genDir(root, next), k, iters, flushSize)
    installPointer(spark, root, next)
    next
  }

  /** [[rebuild]]'s PQ twin: retrain the codebooks and re-encode the
    * corpus as generation N+1, flip the same `_current` pointer. (A
    * root serves ONE index flavor — the pointer names a generation,
    * not a flavor; co-locating both under one root would couple their
    * rebuild cadences.) */
  def rebuildPq(vecs: DataFrame, root: String, m: Int, subDims: Int,
                k: Int, iters: Int, parts: Int = 4,
                flushSize: Int = 1 << 20): Long = {
    val spark = vecs.sparkSession
    val next = currentGeneration(spark, root) + 1
    buildPq(vecs, genDir(root, next), m, subDims, k, iters, parts, flushSize)
    installPointer(spark, root, next)
    next
  }

  private def installPointer(spark: SparkSession, root: String,
                             gen: Long): Unit = {
    val f = fs(spark, root)
    val tmp = new Path(root, s".${java.util.UUID.randomUUID()}.tmp")
    // a failed write/rename must not leak the uniquely-named staging
    // file (nothing ever reclaims a UUID orphan under the root)
    try {
      val out = f.create(tmp, false)
      try out.write(gen.toString.getBytes("UTF-8")) finally out.close()
      val dest = new Path(s"$root/$CurrentPtr")
      // rename-over-existing is not atomic-replace on every FS; delete
      // then rename — a crash between the two leaves NO pointer, which
      // currentGeneration reports loudly (-1) rather than serving a
      // half-installed state, and a re-run converges
      if (f.exists(dest)) f.delete(dest, false)
      if (!f.rename(tmp, dest))
        throw new java.io.IOException(s"rename failed installing $CurrentPtr")
    } finally { f.delete(tmp, false); () }
  }

  /** Delete a drained generation's files. Refuses the serving one. */
  def dropGeneration(spark: SparkSession, root: String, gen: Long): Unit = {
    require(gen != currentGeneration(spark, root),
      s"generation $gen is currently serving")
    val f = fs(spark, root)
    f.delete(new Path(genDir(root, gen)), true)
    ()
  }

  /** GC the generation lifecycle under `root` — the piece of the
    * nightly sweep [[dropGeneration]] alone doesn't schedule. Two
    * kinds of reclaimable state accumulate under a generation root:
    *
    *   - RETIRED generations (gen < current): every [[rebuild]]
    *     leaves its predecessor intact for in-flight readers, and
    *     nothing else ever deletes it — without a sweep, a weekly
    *     rebuild cadence keeps 52 full index copies a year on disk.
    *   - ORPHANED generations (gen > current): a rebuild that crashed
    *     after building but before the pointer flip. Worse than dead
    *     weight: the next rebuild targets current+1 — the orphan's
    *     own slot — and [[build]]'s fresh-dir refusal rejects the
    *     half-built leftovers, so until the orphan is purged the root
    *     cannot rebuild at all.
    *
    * `graceMs` mirrors [[graft.ingest.CommitLog.vacuum]]'s retention
    * contract, applied to each racer:
    *
    *   - retired generations drop only once the LAST pointer flip is
    *     at least `graceMs` old. The flip that installed the current
    *     generation is exactly the moment the newest retired one
    *     stopped serving, and every older one retired earlier still —
    *     so one driver-side mtime check bounds the drain age of all
    *     of them. (Right after a flip nothing drops; the next sweep
    *     converges. Size it above the longest search runtime, same
    *     rule as vacuum.)
    *   - orphans drop only once their NEWEST file is `graceMs` old,
    *     so a rebuild actively writing gen=current+1 right now is
    *     never swept out from under its builder.
    *
    * Returns the dropped generation numbers. Idempotent; a crash
    * mid-sweep leaves some generations dropped and a re-run
    * converges. */
  def maintainGenerations(spark: SparkSession, root: String,
                          graceMs: Long = 15 * 60 * 1000L): Seq[Long] = {
    val f = fs(spark, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) return Seq.empty
    val cur = currentGeneration(spark, root)
    val gens = f.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.matches("gen=\\d+"))
      .map(_.getPath.getName.stripPrefix("gen=").toLong).sorted
    val now = System.currentTimeMillis()
    val flipAgeMs =
      if (cur < 0) -1L
      else now - f.getFileStatus(new Path(s"$root/$CurrentPtr"))
        .getModificationTime
    val dropped = Seq.newBuilder[Long]
    gens.foreach { g =>
      if (g < cur && flipAgeMs >= graceMs) {
        dropGeneration(spark, root, g)
        dropped += g
      } else if (g > cur) {
        var newest = f.getFileStatus(new Path(genDir(root, g)))
          .getModificationTime
        val it = f.listFiles(new Path(genDir(root, g)), true)
        while (it.hasNext)
          newest = math.max(newest, it.next().getModificationTime)
        if (now - newest >= graceMs) {
          dropGeneration(spark, root, g)
          dropped += g
        }
      }
    }
    dropped.result()
  }

  /** One-call nightly maintenance for a generation root — the index
    * leg of the sweep [[graft.ingest.CommitLog.maintainAll]] runs for
    * plain log stores: GC retired/orphaned generations, then run the
    * full log-plane lifecycle (compact → checkpoint → truncate →
    * vacuum) over the CURRENT generation's topics. Compaction
    * preserves the `partition=<cell>` layout, so the cell-pruned
    * serving path ([[prunedRels]]) is exactly as selective after the
    * sweep — appends under the frozen quantizer accrete small
    * per-cell files and this is what merges them. No-ops (beyond the
    * orphan scan) on a root with nothing installed yet. */
  def maintainIndex(spark: SparkSession, root: String,
                    targetRecords: Long,
                    graceMs: Long = 15 * 60 * 1000L)
      : (Seq[Long], Map[String, CommitLog.Maintenance]) = {
    val droppedGens = maintainGenerations(spark, root, graceMs)
    val logPlane =
      if (currentGeneration(spark, root) < 0) Map.empty[String, CommitLog.Maintenance]
      else CommitLog.maintainAll(spark, currentDir(spark, root),
        targetRecords, graceMs)
    (droppedGens, logPlane)
  }

  private def fs(spark: SparkSession, root: String): FileSystem =
    FileSystem.get(new Path(root).toUri,
      spark.sparkContext.hadoopConfiguration)

  // ---------------------------------------------------------------
  // Product-quantization flavor: same train-once / search-many
  // lifecycle, the artifact being the M per-subspace codebooks plus
  // the M-code encoding of every vector. The codes topic ALSO keeps
  // the raw vector column — parquet column pruning means the ADC
  // serving scan reads only (id, codes) (M bytes-ish per vector, the
  // PQ point), while query-by-member and exact re-ranking can still
  // fetch `v` for just the rows that need it.
  // ---------------------------------------------------------------

  val PqCodesTopic = "pq_codes"
  val PqCodebooksTopic = "pq_codebooks"

  /** Train the M codebooks (one fused Lloyd pass per step —
    * `KMeans.fitSubspaces`) and publish codebooks + per-vector codes.
    * Returns the codes topic's log version (0 for a fresh build). */
  def buildPq(vecs: DataFrame, indexDir: String, m: Int, subDims: Int,
              k: Int, iters: Int, parts: Int = 4,
              flushSize: Int = 1 << 20): Long = {
    val spark = vecs.sparkSession
    require(k > 0 && k <= KMeans.LiteralAssignMaxK,
      s"k=$k: codebook cells embed as plan literals " +
        s"(≤ ${KMeans.LiteralAssignMaxK})") // before any topic commits
    require(CommitLog.latestVersion(spark, indexDir, PqCodesTopic) < 0,
      s"PQ index at $indexDir already built — a retrain is a new index dir")
    val books = KMeans.fitSubspaces(vecs, m, subDims, k, iters)
    import spark.implicits._
    // codes are centroid IDS (first-k init ids), not 0..k-1 — the off
    // must therefore be the codebook ROW position, not the code value
    val cdf = books.zipWithIndex.flatMap { case (cents, mi) =>
      cents.zipWithIndex.map { case (c, j) =>
        (0L, mi.toLong * k + j, mi, c.id, c.v)
      }
    }.toDF("part", "off", "m", "code", "cv")
    CommitLog.writeLogged(cdf, indexDir, PqCodebooksTopic,
      flushSize = math.max(books.map(_.size).sum, 1))
    val codesCol = array((0 until m).map { mi =>
      KMeans.cellOf(slice(col("v"), mi * subDims + 1, subDims), books(mi))
    }: _*)
    val encoded = vecs.select(pmod(col("id"), lit(parts.toLong)).as("part"),
      col("id").as("off"), col("v"), codesCol.as("codes"))
    CommitLog.writeLogged(encoded, indexDir, PqCodesTopic, flushSize)
  }

  /** The published codebooks as a broadcastable (m, code, cv) frame —
    * M·K rows. */
  def pqCodebooks(spark: SparkSession, indexDir: String): DataFrame =
    CommitLog.read(spark, indexDir, PqCodebooksTopic)
      .select(col("m"), col("code"), col("cv"))

  /** ADC top-k from the published PQ index: LUT the queries against
    * the loaded codebooks, re-assemble candidate scores from code
    * lookups alone — no training, and the corpus-side scan never
    * touches raw vectors (column pruning keeps it to (id, codes)). */
  def searchPq(spark: SparkSession, indexDir: String, queryIds: Seq[Long],
               subDims: Int, k: Int): DataFrame = {
    NativeExpressions.register(spark)
    val codesT = CommitLog.read(spark, indexDir, PqCodesTopic)
    val q = codesT.filter(col("off").isin(queryIds: _*))
      .select(col("off").as("q_id"), col("v").as("qv"))
    val lut = q.crossJoin(broadcast(pqCodebooks(spark, indexDir)))
      .select(col("q_id"), col("m"), col("code"),
        call_function("dot_i64",
          slice(col("qv"), col("m") * lit(subDims) + lit(1), lit(subDims)),
          col("cv")).as("partial"))
    val codes = codesT.select(col("off").as("id"),
      posexplode(col("codes")).as(Seq("m", "code")))
    codes.join(broadcast(lut), Seq("m", "code"))
      .filter(col("id") =!= col("q_id"))
      .groupBy(col("q_id"), col("id"))
      .agg(sum(col("partial")).as("adc"))
      .groupBy(col("q_id"))
      .agg(call_function("topk_pairs", col("adc"), col("id"),
        lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("q_id"), col("p.id").as("neighbor_id"),
        col("p.ord").as("adc"), (col("pos") + 1).cast("long").as("rnk"))
  }

  /** Two-stage retrieval from the published PQ index — the standard
    * production shape: ADC ranks the WHOLE corpus from code lookups
    * alone (stage 1, [[searchPq]] with k = `shortlist`), then only the
    * shortlist's full vectors are fetched for an exact re-rank (stage
    * 2). At 100 TB the corpus scan still reads M code bytes per
    * vector; the raw-vector column is touched for q·shortlist rows
    * only — the shortlist broadcasts into the codes topic, so the
    * fetch is a scan-side hash probe, never a corpus shuffle. Recall
    * is bounded below by ADC-only top-k (re-ranking a superset with
    * the exact metric can only fix inversions), pinned by
    * `sim_pq_refined_recall` / PqRefineSpec. */
  def searchPqRefined(spark: SparkSession, indexDir: String,
                      queryIds: Seq[Long], subDims: Int, shortlist: Int,
                      k: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover top-$k")
    NativeExpressions.register(spark)
    val codesT = CommitLog.read(spark, indexDir, PqCodesTopic)
    val q = codesT.filter(col("off").isin(queryIds: _*))
      .select(col("off").as("q_id"), col("v").as("qv"))
    val short = searchPq(spark, indexDir, queryIds, subDims, shortlist)
      .select(col("q_id"), col("neighbor_id"))
    codesT.select(col("off").as("neighbor_id"), col("v"))
      .join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        call_function("dot_i64", col("qv"), col("v")).as("dot"))
      .groupBy(col("q_id"))
      .agg(call_function("topk_pairs", col("dot"), col("neighbor_id"),
        lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("q_id"), col("p.id").as("neighbor_id"),
        col("p.ord").as("dot"), (col("pos") + 1).cast("long").as("rnk"))
  }

  // ---------------------------------------------------------------
  // IVF-PQ: the two flavors composed into the layout actually
  // deployed at billion-vector scale — a coarse quantizer partitions
  // the corpus into cells (the IVF file-pruning story) and PQ encodes
  // each vector's RESIDUAL v − centroid(cell) (residuals are smaller
  // and better-centered than raw vectors, so the same code budget
  // quantizes them more faithfully). Search probes nprobe cells,
  // prunes the FILE LIST to them, and ADC-scores only those cells'
  // codes: score(q, v) = dot(q, centroid) + Σ_m lut[m][code_m], with
  // the LUT built from the FULL query's subspace slices against the
  // residual codebooks. Storage per vector: M code bytes in the scan
  // path (the raw vector column rides the topic for query-by-member
  // and re-ranking but parquet column pruning keeps it out of the
  // corpus-side ADC scan).
  // ---------------------------------------------------------------

  val IvfPqCodesTopic = "ivfpq_codes"
  val IvfPqCodebooksTopic = "ivfpq_codebooks"

  /** Train coarse quantizer + residual codebooks, publish all three
    * artifacts (centroids topic shared with the plain-IVF layout;
    * codes topic partitioned BY CELL so probes prune files). Returns
    * the codes topic's log version (0 for a fresh build). */
  def buildIvfPq(vecs: DataFrame, indexDir: String, k: Int, iters: Int,
                 m: Int, subDims: Int, pqK: Int, pqIters: Int,
                 flushSize: Int = 1 << 20,
                 meta: Option[DataFrame] = None,
                 statsCols: Seq[String] = Nil,
                 bloomCols: Seq[String] = Nil): Long = {
    val spark = vecs.sparkSession
    // BEFORE any topic commits: both the encode path (cellOf) and
    // serving embed centroid/codebook tables as plan literals — a k
    // or pqK past LiteralAssignMaxK would crash AFTER the centroids
    // topic committed, leaving a dir that can neither finish building
    // nor rebuild (the already-built guards below refuse the retry)
    require(k > 0 && k <= KMeans.LiteralAssignMaxK,
      s"k=$k: encode/serving embed centroids as plan literals " +
        s"(≤ ${KMeans.LiteralAssignMaxK} cells)")
    require(pqK > 0 && pqK <= KMeans.LiteralAssignMaxK,
      s"pqK=$pqK: codebook cells embed as plan literals " +
        s"(≤ ${KMeans.LiteralAssignMaxK})")
    require(CommitLog.latestVersion(spark, indexDir, IvfPqCodesTopic) < 0,
      s"IVF-PQ index at $indexDir already built — a retrain is a new dir")
    // the coarse quantizer shares CentroidsTopic with plain IVF, so a
    // dir that already holds an IVF build must refuse too: appending a
    // second centroid set with overlapping ids would corrupt cell
    // assignment for BOTH flavors (centroids() reads the whole topic)
    require(CommitLog.latestVersion(spark, indexDir, CentroidsTopic) < 0,
      s"$indexDir already holds a centroid set (plain-IVF build?) — " +
        "an IVF-PQ index needs its own dir")
    meta.foreach(requireUniqueMeta) // before ANY topic commits
    val cents = KMeans.fit(vecs, k, iters)
    import spark.implicits._
    CommitLog.writeLogged(
      cents.map(c => (0L, c.id, c.v)).toDF("part", "off", "cv"),
      indexDir, CentroidsTopic, flushSize = math.max(cents.size, 1))
    val centsDf = cents.map(c => (c.id, c.v)).toDF("cell", "ccv")
    val resid = KMeans.assign(vecs, cents)
      .join(broadcast(centsDf), Seq("cell"))
      .select(col("id"), col("v"), col("cell"),
        zip_with(col("v"), col("ccv"), (a, b) => a - b).as("r"))
    val books = KMeans.fitSubspaces(
      resid.select(col("id"), col("r").as("v")), m, subDims, pqK, pqIters)
    CommitLog.writeLogged(
      books.zipWithIndex.flatMap { case (bs, mi) =>
        bs.zipWithIndex.map { case (c, j) =>
          (0L, mi.toLong * pqK + j, mi, c.id, c.v)
        }
      }.toDF("part", "off", "m", "code", "cv"),
      indexDir, IvfPqCodebooksTopic,
      flushSize = math.max(books.map(_.size).sum, 1))
    // encode through the same frozen-artifact projection the append
    // and streaming paths use (assignment and residual are
    // deterministic, so this is bit-identical to encoding `resid`)
    val encoded0 = ivfPqEncodeFrame(vecs, cents, books, subDims)
    // metadata rides the codes topic for filtered serving (same LEFT
    // join discipline as the plain-IVF [[build]])
    val encoded = meta.fold(encoded0)(mt =>
      encoded0.join(mt.withColumnRenamed("id", "off"), Seq("off"), "left"))
    CommitLog.writeLogged(encoded, indexDir, IvfPqCodesTopic, flushSize,
      statsCols = statsCols, bloomCols = bloomCols)
  }

  /** Serve top-k from the IVF-PQ index: probe `nprobe` cells against
    * the driver-held coarse centroids, prune the codes topic's FILE
    * LIST to them, ADC-score only those cells' codes (centroid dot +
    * residual LUT sum — exact integer arithmetic), bounded-heap top-k.
    * No training anywhere in the plan; the corpus-side scan reads
    * (id, cell, codes) only. */
  def searchIvfPq(spark: SparkSession, indexDir: String,
                  queryIds: Seq[Long], subDims: Int, nprobe: Int,
                  k: Int): DataFrame =
    searchIvfPqImpl(spark, indexDir, queryIds, subDims, nprobe, k, None)

  /** [[searchIvfPq]] under a metadata `predicate` (columns committed
    * by [[buildIvfPq]]'s `meta`) — the filtered twin of
    * [[searchFiltered]] on the full production stack: cell pruning,
    * then [[graft.ingest.FileStats]] refutation of the surviving
    * files, then the predicate applied row-level on the scan. The
    * residual-ADC ranking runs over the predicate-respecting corpus
    * only, so the bounded heap never holds an excluded neighbor. */
  def searchIvfPqFiltered(spark: SparkSession, indexDir: String,
                          queryIds: Seq[Long], subDims: Int, nprobe: Int,
                          k: Int,
                          predicate: org.apache.spark.sql.Column)
      : DataFrame =
    searchIvfPqImpl(spark, indexDir, queryIds, subDims, nprobe, k,
      Some(predicate))

  private def searchIvfPqImpl(spark: SparkSession, indexDir: String,
                              queryIds: Seq[Long], subDims: Int,
                              nprobe: Int, k: Int,
                              predicate: Option[org.apache.spark.sql.Column])
      : DataFrame = {
    NativeExpressions.register(spark)
    val cents = centroids(spark, indexDir)
    val codesT = CommitLog.read(spark, indexDir, IvfPqCodesTopic)
    val q = codesT.filter(col("off").isin(queryIds: _*))
      .select(col("off").as("id"), col("v"))
    val probes = KMeans.probeCells(q, cents, nprobe)
      .select(col("id").as("q_id"), col("v").as("qv"), col("cell"))
    val cellSet = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSet
    val (cellKeep, _) = prunedRels(spark, indexDir, cellSet, IvfPqCodesTopic)
    val keep = predicate.fold(cellKeep)(p =>
      graft.ingest.FileBloom.pruneRels(spark, indexDir, IvfPqCodesTopic, p,
        graft.ingest.FileStats
          .pruneRels(spark, indexDir, IvfPqCodesTopic, p, cellKeep)))
    if (keep.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("q_id", "neighbor_id", "adc", "rnk")
    }
    val read = CommitLog.readFiles(spark, indexDir, IvfPqCodesTopic, keep)
    val scan = predicate.fold(read)(read.filter)
      .select(col("off").as("id"), col("cell"), col("codes"))
    ivfPqAdcRank(spark, indexDir, cents, scan, probes, subDims, k)
  }

  /** The residual-ADC ranking body shared by the one-stage serve and
    * the refined serve's shortlist stage: LUT the probe queries
    * against the residual codebooks, score `scan`'s codes (centroid
    * dot + LUT sum — exact integer arithmetic), bounded-heap top-k.
    * `scan` is the (id, cell, codes) projection of an already
    * file-pruned (and possibly predicate-filtered) codes read. */
  private def ivfPqAdcRank(spark: SparkSession, indexDir: String,
                           cents: Seq[KMeans.Centroid], scan: DataFrame,
                           probes: DataFrame, subDims: Int, k: Int)
      : DataFrame = {
    val cb = CommitLog.read(spark, indexDir, IvfPqCodebooksTopic)
      .select(col("m"), col("code"), col("cv"))
    val qv = probes.select(col("q_id"), col("qv")).distinct()
    val lut = qv.crossJoin(broadcast(cb))
      .select(col("q_id"), col("m"), col("code"),
        call_function("dot_i64",
          slice(col("qv"), col("m") * lit(subDims) + lit(1), lit(subDims)),
          col("cv")).as("partial"))
    import spark.implicits._
    val centsDf = broadcast(cents.map(c => (c.id, c.v)).toDF("cell", "ccv"))
    val cdot = probes.join(centsDf, Seq("cell"))
      .select(col("q_id"), col("cell"),
        call_function("dot_i64", col("qv"), col("ccv")).as("cd"))
    scan.join(broadcast(probes.select(col("q_id"), col("cell"))), Seq("cell"))
      .filter(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id"), col("cell"),
        posexplode(col("codes")).as(Seq("m", "code")))
      .join(broadcast(lut), Seq("q_id", "m", "code"))
      .groupBy(col("q_id"), col("id"), col("cell"))
      .agg(sum(col("partial")).as("rsum"))
      .join(broadcast(cdot), Seq("q_id", "cell"))
      .select(col("q_id"), col("id"), (col("cd") + col("rsum")).as("adc"))
      .groupBy(col("q_id"))
      .agg(call_function("topk_pairs", col("adc"), col("id"),
        lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("q_id"), col("p.id").as("neighbor_id"),
        col("p.ord").as("adc"), (col("pos") + 1).cast("long").as("rnk"))
  }

  /** [[searchPqRefined]]'s IVF-PQ twin — the full production stack:
    * file-pruned cell probe, residual-ADC shortlist, exact re-rank of
    * only the shortlist's full vectors. Recall converges to plain
    * IVF's at the same nprobe (the re-rank removes the residual
    * quantization error; only cell coverage remains approximate). */
  def searchIvfPqRefined(spark: SparkSession, indexDir: String,
                         queryIds: Seq[Long], subDims: Int, nprobe: Int,
                         shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must cover top-$k")
    NativeExpressions.register(spark)
    val cents = centroids(spark, indexDir)
    val codesT = CommitLog.read(spark, indexDir, IvfPqCodesTopic)
    val q = codesT.filter(col("off").isin(queryIds: _*))
      .select(col("off").as("q_id"), col("v").as("qv"))
    val probes = KMeans.probeCells(
        q.select(col("q_id").as("id"), col("qv").as("v")), cents, nprobe)
      .select(col("id").as("q_id"), col("v").as("qv"), col("cell"))
    val cellSet = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSet
    val (keep, _) = prunedRels(spark, indexDir, cellSet, IvfPqCodesTopic)
    if (keep.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("q_id", "neighbor_id", "dot", "rnk")
    }
    val read = CommitLog.readFiles(spark, indexDir, IvfPqCodesTopic, keep)
    val short = ivfPqAdcRank(spark, indexDir, cents,
        read.select(col("off").as("id"), col("cell"), col("codes")),
        probes, subDims, k = shortlist)
      .select(col("q_id"), col("neighbor_id"))
    // the exact re-rank fetches full vectors from the SAME cell-pruned
    // file set the shortlist stage scanned — every shortlist member
    // came from a probed cell, so at scale this stage reads ~nprobe/K
    // of the index's files instead of re-scanning the whole topic
    read.select(col("off").as("neighbor_id"), col("v"))
      .join(broadcast(short), Seq("neighbor_id"))
      .join(broadcast(q), Seq("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        call_function("dot_i64", col("qv"), col("v")).as("dot"))
      .groupBy(col("q_id"))
      .agg(call_function("topk_pairs", col("dot"), col("neighbor_id"),
        lit(k)).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("q_id"), col("p.id").as("neighbor_id"),
        col("p.ord").as("dot"), (col("pos") + 1).cast("long").as("rnk"))
  }

  /** The published codebooks as driver values: one centroid table per
    * subspace, plus the subspace width — what the frozen-codebook
    * encoders ([[appendPq]], `IndexIngest.startPqIngest`) load once.
    * `topic` selects the flavor: raw-vector PQ (default) or the
    * IVF-PQ residual codebooks. */
  def pqBooks(spark: SparkSession, indexDir: String,
              topic: String = PqCodebooksTopic)
      : (Seq[Seq[KMeans.Centroid]], Int) = {
    val rows = CommitLog.read(spark, indexDir, topic)
      .select(col("m"), col("code"), col("cv")).collect()
    val m = rows.map(_.getInt(0)).max + 1
    val books = (0 until m).map { mi =>
      rows.filter(_.getInt(0) == mi)
        .map(r => KMeans.Centroid(r.getLong(1), r.getSeq[Long](2)))
        .toIndexedSeq.sortBy(_.id): Seq[KMeans.Centroid]
    }
    (books, books.head.head.v.size)
  }

  /** Encode `(id, v)` vectors into the codes-topic stream shape under
    * GIVEN codebooks — a pure projection (the M cellOf argmins are
    * literal-centroid expressions), so it runs in batch and streaming
    * plans alike. */
  private[graft] def pqEncodeFrame(vecs: DataFrame,
                                   books: Seq[Seq[KMeans.Centroid]],
                                   subDims: Int, parts: Int): DataFrame = {
    val codesCol = array(books.indices.map { mi =>
      KMeans.cellOf(slice(col("v"), mi * subDims + 1, subDims), books(mi))
    }: _*)
    vecs.select(pmod(col("id"), lit(parts.toLong)).as("part"),
      col("id").as("off"), col("v"), codesCol.as("codes"))
  }

  /** Grow the PQ index under the FROZEN codebooks: encode `newVecs`
    * and publish as the next codes version. */
  def appendPq(newVecs: DataFrame, indexDir: String, parts: Int = 4,
               flushSize: Int = 1 << 20): Long = {
    val spark = newVecs.sparkSession
    val (books, subDims) = pqBooks(spark, indexDir)
    CommitLog.writeLogged(pqEncodeFrame(newVecs, books, subDims, parts),
      indexDir, PqCodesTopic, flushSize)
  }

  /** Encode `(id, v)` vectors into the IVF-PQ codes-topic stream shape
    * under a GIVEN coarse quantizer + residual codebooks: assign the
    * cell, subtract its centroid, PQ-encode the residual — all as ONE
    * projection (the centroid lookup is a plan-literal cell→vector
    * map, the argmins are literal-centroid expressions), so it runs in
    * batch and streaming plans alike with no join and no extra job. */
  private[graft] def ivfPqEncodeFrame(vecs: DataFrame,
                                      cents: Seq[KMeans.Centroid],
                                      books: Seq[Seq[KMeans.Centroid]],
                                      subDims: Int): DataFrame = {
    val centMap = map(cents.flatMap(c =>
      Seq(lit(c.id), array(c.v.map(lit): _*))): _*)
    val resid = vecs
      .select(col("id"), col("v"), KMeans.cellOf(col("v"), cents).as("cell"))
      .select(col("id"), col("v"), col("cell"),
        zip_with(col("v"), element_at(centMap, col("cell")),
          (a, b) => a - b).as("r"))
    val codesCol = array(books.indices.map { mi =>
      KMeans.cellOf(slice(col("r"), mi * subDims + 1, subDims), books(mi))
    }: _*)
    resid.select(col("cell").as("part"), col("id").as("off"), col("v"),
      col("cell"), codesCol.as("codes"))
  }

  /** Grow the IVF-PQ index under BOTH frozen quantizers (coarse cells
    * AND residual codebooks): new vectors assign, residual-encode, and
    * publish as the next codes version — still partitioned by cell, so
    * the appended files prune at serving time exactly like built ones.
    * Neither the centroids nor the codebooks topic advances. */
  def appendIvfPq(newVecs: DataFrame, indexDir: String,
                  flushSize: Int = 1 << 20): Long = {
    val spark = newVecs.sparkSession
    val cents = centroids(spark, indexDir)
    val (books, subDims) = pqBooks(spark, indexDir, IvfPqCodebooksTopic)
    CommitLog.writeLogged(ivfPqEncodeFrame(newVecs, cents, books, subDims),
      indexDir, IvfPqCodesTopic, flushSize)
  }

  /** [[rebuild]]'s IVF-PQ twin: retrain coarse quantizer + residual
    * codebooks and re-encode the corpus as generation N+1 behind the
    * serving one, then flip the shared `_current` pointer. */
  def rebuildIvfPq(vecs: DataFrame, root: String, k: Int, iters: Int,
                   m: Int, subDims: Int, pqK: Int, pqIters: Int,
                   flushSize: Int = 1 << 20): Long = {
    val spark = vecs.sparkSession
    val next = currentGeneration(spark, root) + 1
    buildIvfPq(vecs, genDir(root, next), k, iters, m, subDims, pqK,
      pqIters, flushSize)
    installPointer(spark, root, next)
    next
  }
}
