package graft.queries

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{NativeExpressions, TextFunctions => TF}
import graft.operators.Packing
import graft.tables.Tables

/** Training-data curation operators beyond dedup/similarity: PII
  * scrubbing, repetition (Gopher-style) quality signals, TF-IDF term
  * extraction, sequence packing into fixed context windows, document
  * chunking, and stratified corpus sampling. All run over `documents`
  * and hash-match a DuckDB oracle; float outputs are identically-
  * parenthesized expression trees on both engines.
  */
object CurationQueries {

  import OracleSql._

  /** Context-window width for pack_sequences (tokens). */
  private val PackCtx = 512L
  /** Prefix-sum shard width — at this SF one shard is ~64 docs; at
    * corpus scale set ~1e6 so the single-task shard-offset window sees
    * metadata, not data (see `operators/Packing`). */
  private val PackShard = 64L
  /** Token-window width for chunk_documents. */
  private val ChunkW = 32
  /** Merge rules learned by bpe_train_merges (driver state is O(this),
    * like KMeans' centroid table). */
  private val BpeMerges = 24
  /** Merge steps between lineage truncations in [[bpeTrain]]. */
  private val BpeCheckpointEvery = 8
  /** shuffle_shards: hash-range bucket count (at corpus scale set
    * ~4096 so each ranking task sees ~n/buckets rows — see
    * `operators/Shuffle`) and rows per training shard. */
  private val ShufBuckets = 16
  private val ShufShardDocs = 64L

  /** Mixture-rebalancing core (shared by `sample_balanced_sources` and
    * its skewed-source unit test): downsample every source to the
    * smallest source's size via the integer-exact hash gate
    * `(h60 % 1e6) · n_src < min_src · 1e6`, returning per-source
    * (n_src, n_kept). Package-visible so the non-trivial gate (keep
    * rate < 1) is pinned by CurationSpec on a skewed frame — the
    * testdata corpus has near-uniform sources, where the gate is
    * trivially always-true. */
  /** Shared frame for the per-source sampling gates: docs joined with
    * their source's size and the global minimum (tiny counts aggregate
    * spread by a metadata-scale window + one broadcast join), filtered
    * by `keep` (a predicate over doc columns + `n_src`/`mn`), reduced
    * to per-source (n_src, n_kept). */
  private def keptBySource(docs: org.apache.spark.sql.DataFrame,
                           keep: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    // global min via a 1-row aggregate cross-joined back (both sides
    // are per-source counts — metadata-scale); an unpartitioned
    // min().over(Window) computes the same thing but funnels through a
    // single-partition WindowExec and warns on every run
    val perSource = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_src"))
    val counts = perSource.crossJoin(
      broadcast(perSource.agg(min(col("n_src")).as("mn"))))
    docs.join(broadcast(counts), Seq("source"))
      .filter(keep)
      .groupBy(col("source"), col("n_src"))
      .agg(count(lit(1)).as("n_kept"))
      .orderBy(col("source"))
  }

  private[graft] def balancedBySource(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    keptBySource(docs,
      (TF.hash60(concat(lit("bal:"), col("doc_id").cast("string"))) % 1000000L)
        * col("n_src") < col("mn") * 1000000L)

  /** Temperature-mix core (shared by `sample_temperature_mix` and its
    * skewed-source unit test): keep ~sqrt(mn/n_src) per source via the
    * SQUARED integer gate g²·n_src < mn·10¹² in decimal(38) — no sqrt
    * is ever evaluated, so the keep decision is exact in any engine at
    * any corpus size. */
  private[graft] def temperatureBySource(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val g = (TF.hash60(concat(lit("sqrt:"), col("doc_id").cast("string")))
      % 1000000L).cast("decimal(38,0)")
    keptBySource(docs,
      g * g * col("n_src").cast("decimal(38,0)") <
        col("mn").cast("decimal(38,0)") *
          lit(1000000000000L).cast("decimal(38,0)"))
  }

  /** Target-mixture core (shared by `sample_target_mix` and its skewed
    * unit test): sample the corpus toward PRESCRIBED per-source mixture
    * weights (the static DoReMi-style mix a pretraining run configures)
    * — scaled to the largest feasible corpus, i.e. the limiting source
    * (argmin n/w) keeps everything and every other source downsamples
    * to w_i·n_lim/w_lim docs. Weights derive from the source NAME
    * (w ∈ 1..4), so the op is total over any source roster. All
    * decisions are integer-exact: the argmin compares n·(12 div w)
    * (12 = lcm of the weight range, so the rational order is exact),
    * and the keep gate cross-multiplies in decimal(38,0) —
    * `(h%10⁶)·w_lim·n_src < w·n_lim·10⁶` — no division ever. */
  private[graft] def targetMixBySource(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val perSource = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_src"))
      .withColumn("w",
        (TF.hash60(concat(lit("w:"), col("source"))) % 4L) + 1L)
    // the limiting source: per-source counts are metadata-scale, so
    // the 1-row orderBy/limit is a driver-side decision, not a sort
    // of data
    val lim = perSource
      .orderBy(expr("n_src * (12 div w)"), col("source")).limit(1)
      .select(col("n_src").as("n_lim"), col("w").as("w_lim"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val g = dec(TF.hash60(concat(lit("mix:"), col("doc_id").cast("string")))
      % 1000000L)
    docs.join(broadcast(perSource), Seq("source"))
      .crossJoin(broadcast(lim))
      .filter(g * dec(col("w_lim")) * dec(col("n_src")) <
        dec(col("w")) * dec(col("n_lim")) * dec(lit(1000000L)))
      .groupBy(col("source"), col("n_src"), col("w"))
      .agg(count(lit(1)).as("n_kept"))
      .orderBy(col("source"))
  }

  /** Epoch-plan core shared by `epoch_plan` and the upsampler: per
    * source — count, the prescribed weight (same source-name-derived
    * roster as [[targetMixBySource]], total over any source set), the
    * doc target under a 2×-corpus budget, and its split into full
    * epochs + remainder. Source-scale aggregates and ONE broadcast
    * 1-row totals cross-join; every division is integer. */
  private[graft] def epochPlanFrame(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val perSource = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_src"))
      .withColumn("w",
        (TF.hash60(concat(lit("w:"), col("source"))) % 4L) + 1L)
    val totals = broadcast(perSource.agg(sum(col("n_src")).as("n_tot"),
      sum(col("w")).as("sw")))
    perSource.crossJoin(totals)
      .withColumn("target_docs", expr("(2 * n_tot * w) div sw"))
      .withColumn("full_epochs", expr("target_docs div n_src"))
      .withColumn("rem", expr("target_docs % n_src"))
  }

  /** DuckDB mirror of [[epochPlanFrame]]: CTE chain (prepend `WITH`),
    * ending in `pl` = (source, n_src, w, target_docs, full_epochs,
    * rem). */
  private def epochPlanSql: String = {
    val w = s"((${h60("'w:' || source")} % 4) + 1)"
    s"""ps AS (SELECT source, count(*)::BIGINT AS n_src, $w AS w
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_src) AS BIGINT) AS n_tot,
       |    CAST(sum(w) AS BIGINT) AS sw FROM ps),
       |pl AS (SELECT source, n_src, w,
       |    (2 * n_tot * w) // sw AS target_docs,
       |    ((2 * n_tot * w) // sw) // n_src AS full_epochs,
       |    ((2 * n_tot * w) // sw) % n_src AS rem
       |  FROM ps CROSS JOIN tot)""".stripMargin
  }

  /** Word tables up to this many distinct words train driver-side; a
    * larger vocabulary falls back to the distributed merge loop. Real
    * whitespace vocabularies at corpus scale are 10⁵–10⁷ distinct
    * words — a few MB to a few hundred MB of (string, count) pairs —
    * so the common case is the local loop. */
  private val BpeDriverVocabMax = 1L << 20

  /** The BPE trainer shared by `bpe_train_merges` (reports the rules)
    * and `bpe_encode_tokens` / `bpe_fertility` (apply them): ONE
    * corpus pass aggregates to the vocabulary-scale (word, count)
    * table, then [[BpeMerges]] greedy merge rounds run over it.
    * Returns the fully-merged word table (m, n) and the learned rules
    * (step, lhs, rhs, weighted pair count).
    *
    * This is the KMeans shape: the corpus is touched once, and the
    * model-sized state (the word table — what every real tokenizer
    * trainer loops on) lives where iteration is cheap. Under
    * [[BpeDriverVocabMax]] distinct words that is the DRIVER — M merge
    * steps cost zero Spark jobs instead of 2M scheduler round-trips,
    * and the merged table re-enters the plan as a local (broadcastable)
    * relation for the downstream joins. Past the bound the same greedy
    * loop runs distributed (per-step argmax is ONE collected row;
    * periodic localCheckpoint keeps lineage and recompute O(M)). The
    * two paths are step-for-step identical — argmax tie-break is
    * (count desc, a asc, b asc) with UTF-8 byte string order both
    * engines use, and merge application is the same literal
    * left-to-right marked-string replace ([[TF.bpeApply]] ≡
    * `String.replace`); `BpeSpec` pins path equality. */
  private def bpeTrain(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, Seq[(Long, String, String, Long)]) = {
    // tokens containing the marker controls would corrupt symbol
    // framing — excluded from training in BOTH engines (control-char
    // "words" are not vocabulary)
    val wf0 = bpeWordTable(s, d)
    if (wf0.count() <= BpeDriverVocabMax) bpeTrainLocal(s, wf0)
    else bpeTrainDistributed(wf0)
  }

  /** The one corpus pass: marked (word, count) vocabulary table. */
  private[queries] def bpeWordTable(s: org.apache.spark.sql.SparkSession,
                                    d: String): org.apache.spark.sql.DataFrame =
    TrackedCache.persist(Tables.documents(s, d)
      .select(explode(TF.tokens(col("text"))).as("w"))
      .filter(!col("w").contains(TF.BpeSoh) && !col("w").contains(TF.BpeStx))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(TF.bpeMarked(col("w")).as("m"), col("n")))

  /** Driver-side greedy merge loop over the collected word table —
    * exact mirror of the distributed path (see [[bpeTrain]]). */
  private[queries] def bpeTrainLocal(s: org.apache.spark.sql.SparkSession,
                            wf0: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, Seq[(Long, String, String, Long)]) = {
    val sep = TF.BpeStx + TF.BpeSoh
    // UTF-8 byte order — the string comparison BOTH engines' ORDER BY
    // uses (Spark UTF8String, DuckDB binary collation); JVM
    // compareTo's UTF-16 order diverges on supplementary characters
    def u8lt(x: String, y: String): Boolean = {
      val (a, b) = (x.getBytes(StandardCharsets.UTF_8),
        y.getBytes(StandardCharsets.UTF_8))
      var i = 0
      while (i < a.length && i < b.length) {
        if (a(i) != b(i)) return (a(i) & 0xff) < (b(i) & 0xff)
        i += 1
      }
      a.length < b.length
    }
    // hard bound on the driver materialization: a (marked word, count)
    // row is ~48 B of JVM heap (two boxed fields + array/entry
    // overhead) before the word bytes, so 2^20 rows ≈ 50–150 MB —
    // comfortably driver-sized; an unbounded collect of a
    // pathological vocabulary would not be. bpeTrain routes larger
    // tables to bpeTrainDistributed; direct callers get the same gate.
    val vocabRows = wf0.count()
    require(vocabRows <= BpeDriverVocabMax,
      s"vocabulary has $vocabRows distinct words > $BpeDriverVocabMax " +
        "driver bound — use bpeTrainDistributed")
    var tbl = wf0.collect().map(r => (r.getString(0), r.getLong(1)))
    val rules = Seq.newBuilder[(Long, String, String, Long)]
    var exhausted = false
    for (step <- 1 to BpeMerges if !exhausted) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      tbl.foreach { case (m, n) =>
        // mirror of TF.bpeSymbols: strip the outer markers, split on
        // the STX+SOH seam (literal, no regex metachars in controls)
        val syms = m.substring(1, m.length - 1).split(sep, -1)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), cnt) = counts.reduceLeft { (x, y) =>
          val (((xa, xb), xc), ((ya, yb), yc)) = (x, y)
          if (xc != yc) { if (xc > yc) x else y }
          else if (xa != ya) { if (u8lt(xa, ya)) x else y }
          else if (u8lt(xb, yb)) x else y
        }
        rules += ((step.toLong, a, b, cnt))
        val (from, to) = (TF.BpeSoh + a + TF.BpeStx + TF.BpeSoh + b + TF.BpeStx,
          TF.BpeSoh + a + b + TF.BpeStx)
        tbl = tbl.map { case (m, n) => (m.replace(from, to), n) }
      }
    }
    val sess = s
    import sess.implicits._
    (tbl.toSeq.toDF("m", "n"), rules.result())
  }

  /** Distributed greedy merge loop — the over-[[BpeDriverVocabMax]]
    * path (see [[bpeTrain]]). */
  private[queries] def bpeTrainDistributed(wf0: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, Seq[(Long, String, String, Long)]) = {
    var wf: org.apache.spark.sql.DataFrame = wf0
    val rules = Seq.newBuilder[(Long, String, String, Long)]
    var exhausted = false
    for (step <- 1 to BpeMerges if !exhausted) {
      // a corpus can run out of mergeable pairs before BpeMerges steps
      // (every word a single symbol) — stop with the rules that exist;
      // the oracle's empty b$k rows contribute nothing to its UNION,
      // so both engines report exactly the learned prefix
      val rows = wf
        .select(col("n"), TF.bpeSymbols(col("m")).as("s"))
        .filter(size(col("s")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(1, size(s)-1), i -> struct(s[i-1] AS a, s[i] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (rows.isEmpty) exhausted = true
      else {
        val best = rows(0)
        val (a, b, cnt) = (best.getString(0), best.getString(1), best.getLong(2))
        rules += ((step.toLong, a, b, cnt))
        wf = wf.select(TF.bpeApply(col("m"), a, b).as("m"), col("n"))
        // Without truncation, step k's plan replays all k-1 prior
        // bpeApply projections from wf0 — O(M²) projection passes and
        // an O(M)-deep lineage for an M-merge vocabulary. Periodic
        // localCheckpoint keeps both O(M): each step costs one pass
        // over the materialized word table. (On a cluster with a
        // reliable checkpoint dir, `checkpoint()` plays this role —
        // same pattern as [[graft.operators.ConnectedComponents]].)
        if (step % BpeCheckpointEvery == 0) wf = wf.localCheckpoint()
      }
    }
    (wf, rules.result())
  }

  /** DuckDB mirror of [[bpeTrain]]: CTE chain `w0, s1, p1, b1, w1, …`
    * up to `w\$BpeMerges`, where each `b\$k` is step k's learned rule
    * (a, b, cnt) and each `w\$k` the word table after applying it. */
  private def bpeChainSql: String = {
    // Every w$k / b$k is referenced more than once downstream; DuckDB
    // inlines plain CTEs per reference, which makes a 24-step chain's
    // plan EXPONENTIAL (2^24 copies of the w0 scan — "too many open
    // files" long before it finishes). MATERIALIZED forces each step
    // to evaluate once, keeping the oracle linear in BpeMerges like
    // the Spark side.
    val stepSql = (k: Int) =>
      s"""s$k AS MATERIALIZED (SELECT n, string_split(substr(m, 2, length(m)-2), chr(2)||chr(1)) AS s
         |  FROM w${k - 1}),
         |p$k AS MATERIALIZED (SELECT p.a AS a, p.b AS b, sum(n)::BIGINT AS cnt FROM
         |    (SELECT n, unnest(list_transform(range(1, len(s)),
         |        i -> {'a': s[i], 'b': s[i + 1]})) AS p
         |     FROM s$k WHERE len(s) >= 2)
         |  GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT a, b, cnt FROM p$k
         |  ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
         |w$k AS MATERIALIZED (SELECT CASE WHEN a IS NULL THEN m
         |    ELSE replace(m, chr(1)||a||chr(2)||chr(1)||b||chr(2),
         |      chr(1)||a||b||chr(2)) END AS m, n
         |  FROM w${k - 1} LEFT JOIN b$k ON TRUE)""".stripMargin
    s"""w0 AS MATERIALIZED (SELECT chr(1) ||
       |    array_to_string(list_transform(range(1, len(w) + 1),
       |      i -> substr(w, i, 1)), chr(2)||chr(1)) || chr(2) AS m, n
       |  FROM (SELECT w, count(*) AS n FROM
       |      (SELECT unnest(${toksSql("text")}) AS w FROM documents)
       |    WHERE w NOT LIKE '%' || chr(1) || '%'
       |      AND w NOT LIKE '%' || chr(2) || '%'
       |    GROUP BY w)),
       |${(1 to BpeMerges).map(stepSql).mkString(",\n")}""".stripMargin
  }

  val specs: Seq[QuerySpec] = Seq(

    // ---- PII scrub: typed placeholders for emails / IPv4s / phone
    //      numbers, one codegen'd regexp_replace pass per class. The
    //      synthetic corpus is PII-free, so here the oracle proves the
    //      chain is an exact identity on clean text (the crafted-PII
    //      behavior is pinned by RedactionSpec); the operator is the
    //      per-row scrub a real corpus runs unchanged. ----
    QuerySpec("redact_pii",
      (s, d) => Tables.documents(s, d).select(
          Seq(col("doc_id")) ++ TF.piiCounts(col("text")) :+
            TF.redactPii(col("text")).as("clean"): _*)
        .orderBy(col("doc_id")),
      Some {
        val repl = TF.piiPatterns.foldLeft("text") { case (acc, (_, pat, rep)) =>
          s"regexp_replace($acc, '$pat', '$rep', 'g')"
        }
        val counts = TF.piiPatterns.indices.map { k =>
          val (name, pat, _) = TF.piiPatterns(k)
          val seen = TF.piiPatterns.take(k).foldLeft("text") {
            case (acc, (_, p, r)) => s"regexp_replace($acc, '$p', '$r', 'g')"
          }
          s"len(regexp_extract_all($seen, '$pat'))::BIGINT AS n_${name}s"
        }.mkString(",\n  ")
        s"""SELECT doc_id,
           |  $counts,
           |  $repl AS clean
           |FROM documents ORDER BY doc_id""".stripMargin
      },
      bench = true),

    // ---- Consecutive-run collapse (stutter removal): the INTRA-doc
    //      cleanup the cross-doc span removal doesn't do — crawled
    //      text's repeated-token runs ("batch batch batch") collapse
    //      to one instance, rewriting each document row-locally. Kept
    //      positions come from zipping the token array against its
    //      1-shifted self (the shingle builder's idiom — no
    //      lambda-index back-reference into the tokenizer, which
    //      would re-evaluate it per element); the whole operator is
    //      one scan projection, zero shuffles at any corpus size.
    //      stutter_ppm (collapsed fraction, exact integer ppm) is the
    //      per-doc signal a quality report keeps alongside the
    //      rewrite. ----
    QuerySpec("collapse_token_runs",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), TF.tokens(col("text")).as("t"))
        .withColumn("prev",
          concat(array(lit("")), expr("slice(t, 1, greatest(size(t) - 1, 0))")))
        .withColumn("kept",
          expr("transform(filter(arrays_zip(t, prev), p -> p.t <> p.prev), p -> p.t)"))
        .selectExpr("doc_id",
          "CAST(size(t) AS BIGINT) AS n_before",
          "CAST(size(kept) AS BIGINT) AS n_after",
          "CASE WHEN size(t) > 0 THEN (CAST(size(t) - size(kept) AS BIGINT) * 1000000) div CAST(size(t) AS BIGINT) ELSE CAST(0 AS BIGINT) END AS stutter_ppm",
          "array_join(kept, ' ') AS clean")
        .orderBy(col("doc_id")),
      Some(s"""WITH tok AS (SELECT doc_id, ${toksSql("text")} AS t FROM documents),
              |sh AS (SELECT doc_id, t,
              |    list_prepend('', t[1:greatest(len(t) - 1, 0)]) AS prev
              |  FROM tok),
              |k AS (SELECT doc_id, len(t)::BIGINT AS n_before,
              |    list_transform(list_filter(list_zip(t, prev),
              |      p -> p[1] <> p[2]), p -> p[1]) AS kept
              |  FROM sh)
              |SELECT doc_id, n_before, len(kept)::BIGINT AS n_after,
              |  CASE WHEN n_before > 0
              |    THEN ((n_before - len(kept)) * 1000000) // n_before
              |    ELSE 0 END AS stutter_ppm,
              |  array_to_string(kept, ' ') AS clean
              |FROM k ORDER BY doc_id""".stripMargin)),

    // ---- Repetition signals (the Gopher/MassiveText repetition
    //      filters): duplicate-2gram fraction from set algebra on the
    //      shingle array, top-token fraction via explode → two
    //      map-side-combined aggregates — never a per-doc O(n²) mode
    //      scan inside a lambda. ----
    QuerySpec("repetition_stats",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
        val base = tok
          .select(col("doc_id"), col("toks"),
            TF.shingles(col("toks"), 2).as("g2"))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_tokens"),
            size(col("g2")).cast("long").as("n_2grams"),
            size(array_distinct(col("g2"))).cast("long").as("nd_2grams"))
        val mx = tok.select(col("doc_id"), explode(col("toks")).as("t"))
          .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id")).agg(max(col("c")).as("max_tok"))
        base.join(mx, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"), col("n_2grams"),
            when(col("n_2grams") > 0,
              lit(1.0) - col("nd_2grams").cast("double") / col("n_2grams").cast("double"))
              .otherwise(lit(0.0)).as("dup_2gram_frac"),
            when(col("n_tokens") > 0,
              col("max_tok").cast("double") / col("n_tokens").cast("double"))
              .otherwise(lit(0.0)).as("top_token_frac"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tok AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
              |base AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens,
              |    len(${shinglesSql(2)})::BIGINT AS n_2grams,
              |    len(list_distinct(${shinglesSql(2)}))::BIGINT AS nd_2grams
              |  FROM tok),
              |ex AS (SELECT doc_id, unnest(toks) AS t FROM tok),
              |tc AS (SELECT doc_id, t, count(*) AS c FROM ex GROUP BY 1, 2),
              |mx AS (SELECT doc_id, max(c) AS max_tok FROM tc GROUP BY 1)
              |SELECT base.doc_id, n_tokens, n_2grams,
              |  CASE WHEN n_2grams > 0
              |    THEN CAST(1.0 AS DOUBLE) - CAST(nd_2grams AS DOUBLE) / CAST(n_2grams AS DOUBLE)
              |    ELSE CAST(0.0 AS DOUBLE) END AS dup_2gram_frac,
              |  CASE WHEN n_tokens > 0
              |    THEN CAST(max_tok AS DOUBLE) / CAST(n_tokens AS DOUBLE)
              |    ELSE CAST(0.0 AS DOUBLE) END AS top_token_frac
              |FROM base LEFT JOIN mx ON base.doc_id = mx.doc_id
              |ORDER BY base.doc_id""".stripMargin),
      bench = true),

    // ---- TF-IDF-style salient terms, top-3 per document. Document
    //      frequency joins on the term (vocabulary-sized shuffle, not
    //      corpus-sized); the idf factor is the exact rational 1/df so
    //      both engines rank on bit-identical doubles (log-idf is
    //      monotone in df — same ranking, but libm log is not
    //      guaranteed cross-engine bit-exact). ----
    QuerySpec("tfidf_top_terms",
      (s, d) => {
        val tc = Tables.documents(s, d)
          .select(col("doc_id"), explode(TF.tokens(col("text"))).as("term"))
          .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
        val dl = tc.groupBy(col("doc_id")).agg(sum(col("c")).as("dlen"))
        val dfreq = tc.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term").asc)
        tc.join(dl, Seq("doc_id")).join(dfreq, Seq("term"))
          .select(col("doc_id"), col("term"),
            ((col("c").cast("double") / col("dlen").cast("double")) /
              col("df").cast("double")).as("score"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .orderBy(col("doc_id"), col("rnk"))
      },
      Some(s"""WITH tok AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
              |ex AS (SELECT doc_id, unnest(toks) AS term FROM tok),
              |tc AS (SELECT doc_id, term, count(*) AS c FROM ex GROUP BY 1, 2),
              |dl AS (SELECT doc_id, sum(c) AS dlen FROM tc GROUP BY 1),
              |dfreq AS (SELECT term, count(*) AS df FROM tc GROUP BY 1),
              |scored AS (SELECT tc.doc_id, tc.term,
              |    (CAST(c AS DOUBLE) / CAST(dlen AS DOUBLE)) / CAST(df AS DOUBLE) AS score
              |  FROM tc JOIN dl ON tc.doc_id = dl.doc_id
              |    JOIN dfreq ON tc.term = dfreq.term),
              |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
              |    ORDER BY score DESC, term ASC) AS rnk FROM scored)
              |SELECT doc_id, term, score, rnk FROM r WHERE rnk <= 3
              |ORDER BY doc_id, rnk""".stripMargin),
      bench = true),

    // ---- Sequence packing: concat-then-chunk assignment of documents
    //      to fixed 512-token context windows via the two-level
    //      distributed prefix sum (operators/Packing) — the oracle is
    //      the single-window running sum the distributed form must
    //      equal exactly. ----
    QuerySpec("pack_sequences",
      (s, d) => {
        val counted = Tables.documents(s, d)
          .select(col("doc_id"), TF.tokenCount(col("text")).cast("long").as("n_tokens"))
        Packing.packBins(counted, "doc_id", "n_tokens", PackCtx, PackShard)
          .select(col("doc_id"), col("n_tokens"), col("tok_start"), col("bin"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tok AS (SELECT doc_id,
              |    len(${toksSql("text")})::BIGINT AS n_tokens FROM documents),
              |c AS (SELECT doc_id, n_tokens,
              |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS tok_start
              |  FROM tok)
              |SELECT doc_id, n_tokens, tok_start,
              |  (tok_start // $PackCtx)::BIGINT AS bin
              |FROM c ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- Packing-efficiency report: the waste-vs-splitting tradeoff
    //      behind the context-packing choice, quantified. Streaming
    //      concatenation (pack_sequences' strategy) wastes only the
    //      tail of the last context but SPLITS documents across
    //      context boundaries (truncated attention); padding each doc
    //      to its own context splits nothing but pays
    //      ctx − n_tokens of pad waste per document. One pass over
    //      the packed frame computes both strategies' bin counts,
    //      waste, and split/overflow document counts — the numbers a
    //      pipeline owner weighs before committing a context-fill
    //      policy. Scale shape: everything is ONE aggregate over the
    //      packing frame (whose own windows are shard-bounded — see
    //      operators/Packing); the two report rows are projections of
    //      that single row. ----
    QuerySpec("packing_efficiency",
      (s, d) => {
        val counted = Tables.documents(s, d)
          .select(col("doc_id"),
            TF.tokenCount(col("text")).cast("long").as("n_tokens"))
        val packed = Packing
          .packBins(counted, "doc_id", "n_tokens", PackCtx, PackShard)
          .select(col("n_tokens"), col("tok_start"))
        val agg = packed.agg(
          sum(col("n_tokens")).as("total_tokens"),
          count(lit(1)).as("n_docs"),
          sum(when(col("n_tokens") > 0 &&
              expr(s"tok_start div $PackCtx") =!=
                expr(s"(tok_start + n_tokens - 1) div $PackCtx"), 1L)
            .otherwise(0L)).as("n_crossing"),
          sum(when(col("n_tokens") > PackCtx, 1L).otherwise(0L))
            .as("n_over"),
          sum(greatest(lit(0L), lit(PackCtx) - col("n_tokens")))
            .as("pad_waste"))
        val concat_ = agg.select(
          lit("concat_stream").as("strategy"),
          expr(s"(total_tokens + $PackCtx - 1) div $PackCtx").as("n_bins"),
          col("total_tokens"),
          (expr(s"(total_tokens + $PackCtx - 1) div $PackCtx") * PackCtx -
            col("total_tokens")).as("waste_tokens"),
          col("n_crossing").as("n_split_docs"))
        val padded = agg.select(
          lit("pad_per_doc").as("strategy"),
          col("n_docs").as("n_bins"),
          col("total_tokens"),
          col("pad_waste").as("waste_tokens"),
          col("n_over").as("n_split_docs"))
        concat_.unionByName(padded).orderBy(col("strategy"))
      },
      Some(s"""WITH tok AS (SELECT doc_id,
              |    len(${toksSql("text")})::BIGINT AS n_tokens FROM documents),
              |c AS (SELECT doc_id, n_tokens,
              |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS tok_start
              |  FROM tok),
              |a AS (SELECT sum(n_tokens)::BIGINT AS total_tokens,
              |    count(*)::BIGINT AS n_docs,
              |    sum(CASE WHEN n_tokens > 0 AND tok_start // $PackCtx
              |        <> (tok_start + n_tokens - 1) // $PackCtx
              |      THEN 1 ELSE 0 END)::BIGINT AS n_crossing,
              |    sum(CASE WHEN n_tokens > $PackCtx THEN 1 ELSE 0 END)::BIGINT AS n_over,
              |    sum(greatest(0, $PackCtx - n_tokens))::BIGINT AS pad_waste
              |  FROM c)
              |SELECT * FROM (
              |  SELECT 'concat_stream' AS strategy,
              |    (total_tokens + $PackCtx - 1) // $PackCtx AS n_bins,
              |    total_tokens,
              |    ((total_tokens + $PackCtx - 1) // $PackCtx) * $PackCtx
              |      - total_tokens AS waste_tokens,
              |    n_crossing AS n_split_docs
              |  FROM a
              |  UNION ALL
              |  SELECT 'pad_per_doc', n_docs, total_tokens, pad_waste, n_over
              |  FROM a)
              |ORDER BY strategy""".stripMargin)),

    // ---- Deterministic corpus shuffle + sharding: the global shuffle
    //      every pretraining run does before cutting training shards —
    //      order by an epoch-salted id-keyed hash (reproducible across
    //      runs, engines, and re-partitioning; re-salt for the next
    //      epoch) and assign each doc its shuffled position and shard.
    //      Position via operators/Shuffle's two-level ranking over
    //      uniform hash-range buckets — the oracle is the single-window
    //      global rank the distributed form must equal exactly. ----
    QuerySpec("shuffle_shards",
      (s, d) => {
        val h = Tables.documents(s, d).select(col("doc_id"),
          TF.hash60(concat(lit("shuf0:"), col("doc_id").cast("string")))
            .as("h"))
        graft.operators.Shuffle
          .withShards(h, "h", "doc_id", ShufBuckets, ShufShardDocs)
          .select(col("doc_id"), col("h"), col("pos"), col("shard"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH h AS (SELECT doc_id,
              |    ${h60("'shuf0:' || CAST(doc_id AS VARCHAR)")} AS h
              |  FROM documents),
              |r AS (SELECT doc_id, h,
              |    (row_number() OVER (ORDER BY h, doc_id) - 1)::BIGINT AS pos
              |  FROM h)
              |SELECT doc_id, h, pos, (pos // $ShufShardDocs)::BIGINT AS shard
              |FROM r ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- Document chunking: split each document into fixed 32-token
    //      windows with offsets and materialized chunk text — one
    //      generator expression per doc (explode of a sequence), no
    //      joins, fully parallel. ----
    QuerySpec("chunk_documents",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) > 0)
          .withColumn("n", size(col("toks")).cast("long"))
          .withColumn("nch", expr(s"(n + ${ChunkW - 1}) div $ChunkW"))
        tok.select(col("doc_id"), col("toks"), col("n"),
            explode(sequence(lit(0L), col("nch") - 1)).as("chunk_idx"))
          .select(col("doc_id"), col("chunk_idx"),
            (col("chunk_idx") * ChunkW).as("tok_start"),
            least(lit(ChunkW.toLong), col("n") - col("chunk_idx") * ChunkW)
              .as("n_chunk_tokens"),
            concat_ws(" ", slice(col("toks"),
              (col("chunk_idx") * ChunkW + 1).cast("int"), lit(ChunkW)))
              .as("chunk_text"))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some(s"""WITH tok AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
              |nz AS (SELECT doc_id, toks, len(toks)::BIGINT AS n FROM tok
              |  WHERE len(toks) > 0),
              |ch AS (SELECT doc_id, toks, n,
              |    unnest(range(0, (n + ${ChunkW - 1}) // $ChunkW)) AS chunk_idx
              |  FROM nz)
              |SELECT doc_id, chunk_idx::BIGINT AS chunk_idx,
              |  (chunk_idx * $ChunkW)::BIGINT AS tok_start,
              |  least($ChunkW, n - chunk_idx * $ChunkW)::BIGINT AS n_chunk_tokens,
              |  array_to_string(list_slice(toks, chunk_idx * $ChunkW + 1,
              |    least(n, chunk_idx * $ChunkW + $ChunkW)), ' ') AS chunk_text
              |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ---- Span corruption (the T5/UL2 denoising objective's data
    //      side): mask ~15% of each document in 3-token spans, emit
    //      the corrupted input with numbered sentinels and the target
    //      that restores the masked spans. Mask decisions are the
    //      deterministic content-hash gate per (doc, block) — the
    //      split/sampling discipline applied to objective
    //      construction, so every epoch, engine, and replay corrupts
    //      identically (re-salt for fresh masks). Scale shape:
    //      entirely ROW-LOCAL higher-order expressions over one
    //      tokens array — zero shuffles besides the output sort — and
    //      near-LINEAR in the document: the sentinel numbering comes
    //      from each masked block's POSITION in the masked-index
    //      list — target via the index-lambda transform (O(masked)),
    //      input via array_position against that list (O(masked) per
    //      MASKED block only, ~2% of the O(blocks) the natural
    //      slice-the-prefix-and-count form paid per EVERY block —
    //      that form is O(blocks²) per row; a 100k-token document
    //      would pay ~10⁹ element ops in one task. A fully-linear
    //      stitch-unmasked-runs form was measured 4× SLOWER at this
    //      doc-length mix: it carries the block-text string array
    //      across three extra projections). ----
    QuerySpec("span_corruption_pairs",
      (s, d) => {
        val B = 3
        val h = "cast(conv(substring(md5(cast(concat('mask:', doc_id, " +
          "':', i) as binary)), 1, 15), 16, 10) as bigint)"
        Tables.documents(s, d)
          .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
          .filter(size(col("toks")) > 0)
          .withColumn("nb",
            expr(s"cast((size(toks) + ${B - 1}) div $B as int)"))
          .withColumn("mask",
            expr(s"transform(sequence(0, nb - 1), i -> $h % 100 < 15)"))
          // the ordered masked-index list: sentinel number of a
          // masked block = its position here
          .withColumn("mi", expr(
            "filter(sequence(0, nb - 1), i -> element_at(mask, cast(i + 1 as int)))"))
          .select(col("doc_id"), col("nb").cast("long").as("n_blocks"),
            expr("size(mi)").cast("long").as("n_masked"),
            expr(s"""concat_ws(' ', transform(sequence(0, nb - 1), i ->
                    | CASE WHEN element_at(mask, cast(i + 1 as int))
                    |   THEN concat('<extra_id_', array_position(mi, i) - 1, '>')
                    |   ELSE array_join(slice(toks, cast(i * $B + 1 as int), $B), ' ')
                    | END))""".stripMargin).as("input_text"),
            expr(s"""concat_ws(' ', transform(mi, (i, k) ->
                    | concat('<extra_id_', k, '> ',
                    |   array_join(slice(toks, cast(i * $B + 1 as int), $B), ' '))))""".stripMargin)
              .as("target_text"))
          .orderBy(col("doc_id"))
      },
      Some {
        val h = h60("'mask:' || doc_id || ':' || i")
        s"""WITH tok AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
           |nz AS (SELECT doc_id, toks, (len(toks) + 2) // 3 AS nb FROM tok
           |  WHERE len(toks) > 0),
           |m1 AS (SELECT doc_id, toks, nb,
           |    list_transform(range(0, nb), i -> $h % 100 < 15) AS mask
           |  FROM nz),
           |m2 AS (SELECT *, list_transform(range(0, nb),
           |    i -> len(list_filter(list_slice(mask, 1, i), x -> x))) AS sent
           |  FROM m1)
           |SELECT doc_id, nb::BIGINT AS n_blocks,
           |  len(list_filter(mask, x -> x))::BIGINT AS n_masked,
           |  array_to_string(list_transform(range(0, nb), i ->
           |    CASE WHEN mask[i + 1]
           |      THEN '<extra_id_' || sent[i + 1] || '>'
           |      ELSE array_to_string(list_slice(toks, i * 3 + 1, i * 3 + 3), ' ')
           |    END), ' ') AS input_text,
           |  coalesce(array_to_string(list_transform(
           |    list_filter(range(0, nb), i -> mask[i + 1]),
           |    i -> '<extra_id_' || sent[i + 1] || '> ' ||
           |      array_to_string(list_slice(toks, i * 3 + 1, i * 3 + 3), ' ')), ' '),
           |    '') AS target_text
           |FROM m2 ORDER BY doc_id""".stripMargin
      },
      bench = true),

    // ---- Mixture rebalancing: downsample every source to the
    //      smallest source's size, so the corpus mixture comes out
    //      ~uniform. Per-source counts are a tiny aggregate; the
    //      smallest count spreads via a metadata-scale window + one
    //      broadcast join; the keep-gate is INTEGER-exact
    //      ((h % 1e6) * n_src < min * 1e6 ⟺ h%1e6 < rate·1e6 with no
    //      float rounding) and a pure function of the row. ----
    QuerySpec("sample_balanced_sources",
      (s, d) => balancedBySource(Tables.documents(s, d)),
      Some {
        val gate = h60("'bal:' || CAST(doc_id AS VARCHAR)")
        s"""WITH c AS (SELECT source, count(*) AS n_src FROM documents GROUP BY 1),
           |m AS (SELECT min(n_src) AS mn FROM c),
           |k AS (SELECT d.source, c.n_src
           |  FROM documents d JOIN c ON d.source = c.source CROSS JOIN m
           |  WHERE ($gate % 1000000) * c.n_src < m.mn * 1000000)
           |SELECT source, n_src, count(*) AS n_kept FROM k
           |GROUP BY source, n_src ORDER BY source""".stripMargin
      }),

    // ---- Corpus bigram associations: PMI-style lift of adjacent token
    //      pairs, top-20. Counts shuffle the (small) vocabulary and
    //      bigram set after map-side partial aggregation; the final
    //      top-k is TakeOrdered. Lift is one double division of exact
    //      integer products, so ranking is bit-identical cross-engine
    //      (log-PMI is monotone in lift — same order). ----
    QuerySpec("bigram_lift",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .select(TF.tokens(col("text")).as("toks"))
        val unigrams = tok.select(explode(col("toks")).as("t"))
          .groupBy(col("t")).agg(count(lit(1)).as("n"))
        // total token count from the vocabulary-sized aggregate — NOT a
        // third scan+tokenize pass over the corpus
        val total = unigrams.agg(sum(col("n")).cast("long").as("n_total"))
        val bigrams = tok.select(explode(TF.shingles(col("toks"), 2)).as("big"))
          .groupBy(col("big")).agg(count(lit(1)).as("n_ab"))
          .filter(col("n_ab") >= 5)
          .withColumn("a", split(col("big"), " ").getItem(0))
          .withColumn("b", split(col("big"), " ").getItem(1))
        bigrams
          .join(unigrams.select(col("t").as("a"), col("n").as("n_a")), Seq("a"))
          .join(unigrams.select(col("t").as("b"), col("n").as("n_b")), Seq("b"))
          .crossJoin(broadcast(total))
          // divisions first: the integer products n_ab·N and n_a·n_b
          // overflow long at real corpus sizes (N ~ 1e13 tokens)
          .select(col("big"), col("n_ab"),
            (col("n_ab").cast("double") / col("n_a").cast("double") /
              col("n_b").cast("double") * col("n_total").cast("double")).as("lift"))
          .orderBy(col("lift").desc, col("big").asc)
          .limit(20)
      },
      Some(s"""WITH tok AS (SELECT ${toksSql("text")} AS toks FROM documents),
              |uni AS (SELECT unnest(toks) AS t FROM tok),
              |u AS (SELECT t, count(*) AS n FROM uni GROUP BY 1),
              |tot AS (SELECT count(*)::BIGINT AS n_total FROM uni),
              |bg AS (SELECT unnest(${shinglesSql(2)}) AS big FROM tok),
              |b AS (SELECT big, count(*) AS n_ab FROM bg GROUP BY 1 HAVING count(*) >= 5),
              |sp AS (SELECT big, n_ab, string_split(big, ' ')[1] AS a,
              |    string_split(big, ' ')[2] AS bb FROM b),
              |j AS (SELECT big, n_ab,
              |    CAST(n_ab AS DOUBLE) / CAST(ua.n AS DOUBLE)
              |      / CAST(ub.n AS DOUBLE) * CAST(n_total AS DOUBLE) AS lift
              |  FROM sp JOIN u ua ON sp.a = ua.t JOIN u ub ON sp.bb = ub.t
              |  CROSS JOIN tot)
              |SELECT big, n_ab, lift FROM j
              |ORDER BY lift DESC, big ASC LIMIT 20""".stripMargin)),

    // ---- Character-level surprisal — the char-LM quality signal
    //      orthogonal to the word-level novelty filter below: encoding
    //      noise, wrong-script text, and base64/hex blobs score high
    //      against a corpus character model even when a word model
    //      never sees their "words" twice. Surprisal is quantized to
    //      WHOLE BITS via binary-representation lengths
    //      (bitlen(n_total) − bitlen(n_c) = floor-log2 of the
    //      frequency ratio — the DSIR trick), so the model is
    //      integer-exact in both engines with no libm log anywhere.
    //      Scale shape: the per-doc char histogram shuffle carries at
    //      most doc×alphabet rows after map-side combine; the
    //      frequency and bits tables are alphabet-scale broadcasts;
    //      nothing corpus-scale ever sorts or windows. ----
    QuerySpec("char_surprisal_stats",
      (s, d) => {
        // pinned: the (doc, char) histogram feeds BOTH the corpus
        // frequency table and the per-doc surprisal join
        // split-by-empty-regex, not transform(sequence(..), i ->
        // substring(text, i, 1)): substring's char index resolves by
        // scanning the UTF8 bytes from the start, so the transform
        // form is O(len²) per document — split is one O(len) pass
        // (code-point splits; Java regex never bisects a surrogate
        // pair). The empty-text edge yields [""] — filtered to match
        // the oracle's zero rows.
        val dc = TrackedCache.persist(Tables.documents(s, d)
          .select(col("doc_id"),
            explode(split(col("text"), "")).as("c"))
          .filter(col("c") =!= "")
          .groupBy(col("doc_id"), col("c")).agg(count(lit(1)).as("cnt")))
        val cf = dc.groupBy(col("c")).agg(sum(col("cnt")).as("n_c"))
        val bits = cf
          .crossJoin(broadcast(cf.agg(sum(col("n_c")).as("n_tot"))))
          .select(col("c"),
            (length(conv(col("n_tot"), 10, 2)) -
              length(conv(col("n_c"), 10, 2))).cast("long").as("bits"))
        dc.join(broadcast(bits), Seq("c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("cnt")).as("n_chars"),
            sum(col("cnt") * col("bits")).as("surprisal_bits"))
          .select(col("doc_id"), col("n_chars"), col("surprisal_bits"),
            (col("surprisal_bits").cast("double") /
              col("n_chars").cast("double")).as("bits_per_char"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH ch AS (SELECT doc_id,
             |    unnest(list_transform(range(1, len(text) + 1),
             |      i -> substr(text, i, 1))) AS c
             |  FROM documents),
             |dc AS (SELECT doc_id, c, count(*)::BIGINT AS cnt
             |  FROM ch GROUP BY 1, 2),
             |cf AS (SELECT c, sum(cnt)::BIGINT AS n_c FROM dc GROUP BY 1),
             |tot AS (SELECT sum(n_c)::BIGINT AS n_tot FROM cf),
             |b AS (SELECT c,
             |    (length(bin(n_tot)) - length(bin(n_c)))::BIGINT AS bits
             |  FROM cf CROSS JOIN tot)
             |SELECT dc.doc_id, sum(cnt)::BIGINT AS n_chars,
             |  sum(cnt * bits)::BIGINT AS surprisal_bits,
             |  CAST(sum(cnt * bits)::BIGINT AS DOUBLE)
             |    / CAST(sum(cnt)::BIGINT AS DOUBLE) AS bits_per_char
             |FROM dc JOIN b USING (c) GROUP BY 1 ORDER BY 1""".stripMargin),
      bench = true),

    // ---- LM-novelty quality filter: the integer-exact core of
    //      KenLM/CCNet-style perplexity filtering. The corpus itself is
    //      the language model (bigram document frequencies); a doc's
    //      novelty is the fraction of its bigram INSTANCES unsupported
    //      by any OTHER document (df = 1 — leave-one-out OOV), and the
    //      keep gate drops docs whose text is unusually corpus-unique
    //      (gibberish/noise under an LM filter — exactly what high
    //      perplexity flags). The threshold here is 2%, tuned to this
    //      synthetic corpus's novelty range of 0–9% so both branches
    //      are exercised; a real diverse corpus runs the same gate
    //      nearer 80%. No float log-probs:
    //      counts compare cross-multiplied, so both engines agree at
    //      any corpus size. Scale shape: bigrams shuffle as 8-byte
    //      hashes (never text), df is a map-side-combined count over
    //      the distinct (doc, gram) pairs, and the per-doc verdict is
    //      one hash-keyed join back — the same gram-hash economy as
    //      dedup_span_fraction, pointed at LM quality instead of
    //      duplication. ----
    QuerySpec("lm_novelty_filter",
      (s, d) => {
        graft.functions.NativeExpressions.register(s)
        // pinned: the tokenize→shingle→md5 frame feeds BOTH the df
        // aggregate and the per-doc join — unpersisted it would run
        // the dominant gram pipeline twice (same reasoning as
        // dedup_span_fraction's pinned gram table)
        val db = TrackedCache.persist(Tables.documents(s, d)
          .select(col("doc_id"),
            explode(TF.shingles(TF.tokens(col("text")), 2)).as("big"))
          .select(col("doc_id"),
            call_function("hash60_md5", col("big").cast("binary")).as("g")))
        val dfq = db.distinct()
          .groupBy(col("g")).agg(count(lit(1)).as("df"))
        val per = db.join(dfq, Seq("g"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("nb"),
            sum(when(col("df") === 1, 1L).otherwise(0L)).as("nn"))
        Tables.documents(s, d).select(col("doc_id"))
          .join(per, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("nb"), lit(0L)).as("n_bigrams"),
            coalesce(col("nn"), lit(0L)).as("n_novel"),
            (coalesce(col("nn"), lit(0L)) * 50 <=
              coalesce(col("nb"), lit(0L))).as("lm_keep"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tok AS (SELECT doc_id, ${toksSql("text")} AS toks FROM documents),
              |bg AS (SELECT doc_id, unnest(${shinglesSql(2)}) AS big FROM tok),
              |db AS (SELECT doc_id, ${h60("big")} AS g FROM bg),
              |dfq AS (SELECT g, count(DISTINCT doc_id) AS df FROM db GROUP BY 1),
              |per AS (SELECT doc_id, count(*) AS n_bigrams,
              |    sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS n_novel
              |  FROM db JOIN dfq USING (g) GROUP BY doc_id)
              |SELECT d.doc_id,
              |  coalesce(n_bigrams, 0)::BIGINT AS n_bigrams,
              |  coalesce(n_novel, 0)::BIGINT AS n_novel,
              |  (coalesce(n_novel, 0) * 50 <= coalesce(n_bigrams, 0)) AS lm_keep
              |FROM documents d LEFT JOIN per USING (doc_id)
              |ORDER BY doc_id""".stripMargin),
      bench = true),

    // ---- BPE tokenizer training — the first `BpeMerges` merge rules
    //      learned from the corpus, replayed bit-for-bit by the oracle.
    //      Scale shape (how HF/SentencePiece trainers actually
    //      distribute): ONE corpus pass reduces the data to the
    //      vocabulary-scale (word, count) table; every merge iteration
    //      then runs over DISTINCT words weighted by count — pair
    //      counting is a map-side-combined sum, and only the single
    //      argmax rule row ever reaches the driver per step (O(M)
    //      driver state, like KMeans' centroids). Greedy left-to-right
    //      merge application is encoded ONCE for both engines: symbols
    //      live in a marker-delimited string, so non-regex
    //      `replace` — left-to-right, non-overlapping in Spark and
    //      DuckDB alike — IS the BPE merge rule, with marker-delimited
    //      symbol boundaries making cross-symbol false matches
    //      impossible ("aaaa" + (a,a) → "(aa)(aa)", the canonical
    //      greedy answer). Ties break on (count DESC, lhs, rhs) —
    //      binary string order in both engines. ----
    QuerySpec("bpe_train_merges",
      (s, d) => {
        val (_, rules) = bpeTrain(s, d)
        val sess = s
        import sess.implicits._
        rules.toDF("step", "lhs", "rhs", "cnt")
          .select(col("step"), col("lhs"), col("rhs"),
            concat(col("lhs"), col("rhs")).as("merged"), col("cnt"))
          .orderBy(col("step"))
      },
      Some {
        val rows = (1 to BpeMerges).map(k =>
          s"SELECT $k::BIGINT AS step, a AS lhs, b AS rhs, a||b AS merged, cnt FROM b$k")
          .mkString("\n  UNION ALL ")
        s"""WITH $bpeChainSql
           |SELECT * FROM (
           |  $rows)
           |ORDER BY step""".stripMargin
      },
      bench = true),

    // ---- BPE encoding — the trained tokenizer APPLIED: corpus token
    //      statistics after the learned merges (top symbols by weighted
    //      count), i.e. the vocabulary a pipeline would actually pack
    //      and train on. Same vocabulary-scale economy as training; the
    //      final ranking is a TakeOrdered top-k, never a global sort of
    //      the symbol table. ----
    QuerySpec("bpe_encode_tokens",
      (s, d) => {
        val (wf, _) = bpeTrain(s, d)
        wf.select(col("n"), explode(TF.bpeSymbols(col("m"))).as("sym"))
          .groupBy(col("sym")).agg(sum(col("n")).as("cnt"))
          .orderBy(col("cnt").desc, col("sym").asc)
          .limit(20)
      },
      Some(s"""WITH $bpeChainSql,
              |sy AS (SELECT unnest(string_split(substr(m, 2, length(m)-2),
              |    chr(2)||chr(1))) AS sym, n
              |  FROM w$BpeMerges)
              |SELECT sym, sum(n)::BIGINT AS cnt FROM sy GROUP BY sym
              |ORDER BY cnt DESC, sym ASC LIMIT 20""".stripMargin)),

    // ---- Tokenizer FERTILITY report: after training the BPE merges,
    //      how well does the tokenizer compress each source — tokens
    //      emitted per word (fertility) and characters covered per
    //      token. The standard tokenizer-quality metric a pretraining
    //      team checks per language/domain before committing a vocab
    //      (high-fertility sources pay more sequence length for the
    //      same text). Scale shape: the trained word table is
    //      vocabulary-scale; per-source word counts shuffle on
    //      (source, word) — also vocabulary-scale after the map-side
    //      combine — and the word-keyed equi-join never touches raw
    //      documents again; the final aggregate is one row per
    //      source. ----
    QuerySpec("bpe_fertility",
      (s, d) => {
        val (wf, _) = bpeTrain(s, d)
        // marked form → (original word, symbols after all merges):
        // stripping the SOH/STX framing recovers the word exactly
        // because control-char words were excluded from training
        val words = wf.select(
          translate(col("m"), TF.BpeSoh + TF.BpeStx, "").as("w"),
          size(TF.bpeSymbols(col("m"))).cast("long").as("n_sym"))
        val perSrc = Tables.documents(s, d)
          .select(col("source"), explode(TF.tokens(col("text"))).as("w"))
          .filter(!col("w").contains(TF.BpeSoh) &&
            !col("w").contains(TF.BpeStx))
          .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
        perSrc.join(words, Seq("w"))
          .groupBy(col("source"))
          .agg(sum(col("c")).as("n_words"),
            sum(col("c") * col("n_sym")).as("n_bpe_tokens"),
            sum(col("c") * length(col("w")).cast("long")).as("n_chars"))
          .select(col("source"), col("n_words"), col("n_bpe_tokens"),
            (col("n_bpe_tokens").cast("double") /
              col("n_words").cast("double")).as("fertility"),
            (col("n_chars").cast("double") /
              col("n_bpe_tokens").cast("double")).as("chars_per_token"))
          .orderBy(col("source"))
      },
      Some(s"""WITH $bpeChainSql,
              |ws AS (SELECT replace(replace(m, chr(1), ''), chr(2), '') AS w,
              |    len(string_split(substr(m, 2, length(m)-2),
              |      chr(2)||chr(1)))::BIGINT AS n_sym
              |  FROM w$BpeMerges),
              |pw AS (SELECT source, unnest(${toksSql("text")}) AS w
              |  FROM documents),
              |pc AS (SELECT source, w, count(*)::BIGINT AS c FROM pw
              |  WHERE w NOT LIKE '%' || chr(1) || '%'
              |    AND w NOT LIKE '%' || chr(2) || '%'
              |  GROUP BY 1, 2),
              |ag AS (SELECT source, sum(c)::BIGINT AS n_words,
              |    sum(c * n_sym)::BIGINT AS n_bpe_tokens,
              |    sum(c * len(w))::BIGINT AS n_chars
              |  FROM pc JOIN ws USING (w) GROUP BY 1)
              |SELECT source, n_words, n_bpe_tokens,
              |  CAST(n_bpe_tokens AS DOUBLE) / CAST(n_words AS DOUBLE) AS fertility,
              |  CAST(n_chars AS DOUBLE) / CAST(n_bpe_tokens AS DOUBLE) AS chars_per_token
              |FROM ag ORDER BY source""".stripMargin)),

    // ---- BPE compression curve: corpus token count after 0/8/16/24
    //      merges — the measurement behind "how many merges are worth
    //      training": the marginal compression of each merge tranche,
    //      per-corpus. Replays the learned rule prefix over the
    //      vocabulary-scale word table (4 sample points × ≤24
    //      projection folds over vocab rows — never a corpus pass
    //      beyond the one that built the table), so the curve is
    //      identical whichever trainer path learned the rules. ----
    QuerySpec("bpe_compression_curve",
      (s, d) => {
        val (_, rules) = bpeTrain(s, d)
        val wf0 = bpeWordTable(s, d)
        val steps = Seq(0, 8, 16, 24)
        val frames = steps.map { k =>
          val wfk = rules.take(k).foldLeft(wf0) { case (df, (_, a, b, _)) =>
            df.select(TF.bpeApply(col("m"), a, b).as("m"), col("n"))
          }
          wfk.agg(
            lit(k.toLong).as("step"),
            sum(col("n") * size(TF.bpeSymbols(col("m"))).cast("long"))
              .as("corpus_tokens"),
            sum(col("n")).as("corpus_words"))
        }
        frames.reduce(_ unionByName _)
          .select(col("step"), col("corpus_tokens"), col("corpus_words"),
            (col("corpus_tokens").cast("double") /
              col("corpus_words").cast("double")).as("tokens_per_word"))
          .orderBy(col("step"))
      },
      Some {
        val rows = Seq(0, 8, 16, 24).map { k =>
          s"""SELECT $k::BIGINT AS step,
             |  sum(n * len(string_split(substr(m, 2, length(m)-2),
             |    chr(2)||chr(1))))::BIGINT AS corpus_tokens,
             |  sum(n)::BIGINT AS corpus_words
             |FROM w$k""".stripMargin
        }.mkString("\n  UNION ALL ")
        s"""WITH $bpeChainSql
           |SELECT step, corpus_tokens, corpus_words,
           |  CAST(corpus_tokens AS DOUBLE) / CAST(corpus_words AS DOUBLE)
           |    AS tokens_per_word
           |FROM ($rows)
           |ORDER BY step""".stripMargin
      }),

    // ---- Stratified corpus sampling: per-language keep rates applied
    //      via the deterministic content-hash gate (pure function of
    //      the row — reproducible across runs, engines, partitionings;
    //      the same mechanism as split_train_val_test). The filter is
    //      a pushed-down scan predicate: no shuffle at all. ----
    QuerySpec("sample_stratified",
      (s, d) => {
        val rate = when(col("lang") === "en", 80L)
          .when(col("lang") === "de" || col("lang") === "fr", 60L)
          .when(col("lang") === "es", 40L)
          .otherwise(20L)
        Tables.documents(s, d)
          .filter((TF.hash60(concat(lit("strat:"), col("doc_id").cast("string"))) % 100)
            < rate)
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some {
        val gate = h60("'strat:' || CAST(doc_id AS VARCHAR)")
        s"""SELECT doc_id, lang, source FROM documents
           |WHERE $gate % 100 < CASE WHEN lang = 'en' THEN 80
           |  WHEN lang IN ('de', 'fr') THEN 60
           |  WHEN lang = 'es' THEN 40 ELSE 20 END
           |ORDER BY doc_id""".stripMargin
      }),

    // ---- EXACT-k uniform sample: every hash gate here is rate-based
    //      (size correct only in expectation) — audits, eval pools,
    //      and labeling batches need exactly k. k smallest values of a
    //      deterministic per-doc hash ARE a uniform without-replacement
    //      sample, and the bounded-heap aggregate collects them with
    //      an exchange carrying O(k) rows per partition — no corpus
    //      sort, no window, no second pass. ----
    QuerySpec("sample_exact_k",
      (s, d) => {
        NativeExpressions.register(s)
        Tables.documents(s, d)
          .select(col("doc_id"),
            TF.hash60(concat(lit("uni:"), col("doc_id").cast("string")))
              .as("h"))
          .agg(call_function("topk_pairs", -col("h"), col("doc_id"),
            lit(100)).as("top"))
          .select(explode(col("top")).as("p"))
          .select(col("p.id").as("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some {
        val h = h60("'uni:' || CAST(doc_id AS VARCHAR)")
        s"""SELECT doc_id FROM (SELECT doc_id FROM documents
           |  ORDER BY $h ASC, doc_id ASC LIMIT 100)
           |ORDER BY doc_id""".stripMargin
      }),

    // ---- Temperature-flattened mixture (τ=2, the multilingual
    //      pretraining standard): each source keeps ~sqrt(mn/n_src) of
    //      its docs, so big sources are damped toward the small ones
    //      without truncating to the minimum. No square root is ever
    //      evaluated — the gate compares SQUARES (g²·n_src < mn·10¹²)
    //      in decimal/int128 arithmetic, so the keep decision is exact
    //      in any engine at any corpus size. Same tiny counts
    //      aggregate + broadcast join as the balanced mix. ----
    QuerySpec("sample_temperature_mix",
      (s, d) => temperatureBySource(Tables.documents(s, d)),
      Some {
        val gate = h60("'sqrt:' || CAST(doc_id AS VARCHAR)")
        s"""WITH c AS (SELECT source, count(*) AS n_src FROM documents GROUP BY 1),
           |m AS (SELECT min(n_src) AS mn FROM c),
           |k AS (SELECT d.source, c.n_src
           |  FROM documents d JOIN c ON d.source = c.source CROSS JOIN m
           |  WHERE (($gate % 1000000)::HUGEINT * (($gate) % 1000000)
           |      * c.n_src) < m.mn::HUGEINT * 1000000000000)
           |SELECT source, n_src, count(*) AS n_kept FROM k
           |GROUP BY source, n_src ORDER BY source""".stripMargin
      }),

    // ---- Prescribed-mixture sampling: downsample each source toward
    //      configured mixture WEIGHTS (the static pretraining mix),
    //      scaled so the limiting source keeps everything — see
    //      targetMixBySource for the integer-exact argmin + gate. ----
    QuerySpec("sample_target_mix",
      (s, d) => targetMixBySource(Tables.documents(s, d)),
      Some {
        val gate = h60("'mix:' || CAST(doc_id AS VARCHAR)")
        val w = s"((${h60("'w:' || source")} % 4) + 1)"
        s"""WITH c AS (SELECT source, count(*) AS n_src, $w AS w
           |  FROM documents GROUP BY source),
           |lim AS (SELECT n_src AS n_lim, w AS w_lim FROM c
           |  ORDER BY n_src * (12 // w), source LIMIT 1),
           |k AS (SELECT d.source, c.n_src, c.w
           |  FROM documents d JOIN c ON d.source = c.source CROSS JOIN lim
           |  WHERE ($gate % 1000000)::HUGEINT * w_lim * c.n_src
           |      < c.w::HUGEINT * n_lim * 1000000)
           |SELECT source, n_src, w, count(*) AS n_kept FROM k
           |GROUP BY source, n_src, w ORDER BY source""".stripMargin
      }),

    // ---- Mixture EPOCH PLANNING: the report every data-mixing run
    //      derives before training — given the prescribed per-source
    //      weights (the sample_target_mix roster) and a total token
    //      budget of 2× the corpus (so repetition is forced), how many
    //      full passes over each source does the mix imply, and what
    //      fraction of one more? target_docs = (B·w) div Σw,
    //      full_epochs = target div n, frac_ppm exact — all integer
    //      divisions over source-scale aggregates + ONE broadcast
    //      1-row totals cross-join (never an unpartitioned window). ----
    QuerySpec("epoch_plan",
      (s, d) => epochPlanFrame(Tables.documents(s, d))
        .select(col("source"), col("n_src"), col("w"), col("target_docs"),
          col("full_epochs"),
          expr("(rem * 1000000) div n_src").as("frac_ppm"))
        .orderBy(col("source")),
      Some(s"""WITH $epochPlanSql
              |SELECT source, n_src, w, target_docs, full_epochs,
              |  (rem * 1000000) // n_src AS frac_ppm
              |FROM pl ORDER BY source""".stripMargin)),

    // ---- REALIZE the epoch plan: the upsampling member of the
    //      sampling family (everything else here downsamples). Each
    //      document emits one row per full epoch plus a hash-gated
    //      fractional-epoch row — pmod(h60, n_src) < rem keeps ~rem of
    //      the source's n_src docs in the last partial pass, the
    //      deterministic stratified-gate discipline (decision exact
    //      and replayable per (doc, epoch); the realized count is the
    //      gate's expectation, like sample_stratified). One generator
    //      expression over a broadcast source-plan join: no shuffle,
    //      no window, no self-join — repetition at 100 TB is a scan
    //      that writes more than it reads, and nothing else. ----
    QuerySpec("sample_epoch_upsample",
      (s, d) => Tables.documents(s, d)
        .join(broadcast(epochPlanFrame(Tables.documents(s, d))
          .select(col("source"), col("n_src"), col("full_epochs"),
            col("rem"))), Seq("source"))
        .select(col("doc_id"), col("source"),
          explode(sequence(lit(1L), col("full_epochs") + 1L)).as("epoch"),
          col("n_src"), col("full_epochs"), col("rem"))
        .filter(col("epoch") <= col("full_epochs") ||
          pmod(TF.hash60(concat(lit("ep:"), col("doc_id").cast("string"),
            lit(":"), col("epoch").cast("string"))), col("n_src"))
            < col("rem"))
        .select(col("doc_id"), col("source"), col("epoch"))
        .orderBy(col("source"), col("epoch"), col("doc_id")),
      Some(s"""WITH $epochPlanSql,
              |e AS (SELECT d.doc_id, d.source, pl.n_src, pl.full_epochs,
              |    pl.rem, u.epoch
              |  FROM documents d JOIN pl ON d.source = pl.source,
              |    unnest(range(1, pl.full_epochs + 2)) AS u(epoch)),
              |g AS (SELECT doc_id, source, epoch, n_src, full_epochs, rem,
              |    ${h60("'ep:' || CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)")} AS gate
              |  FROM e)
              |SELECT doc_id, source, epoch FROM g
              |WHERE epoch <= full_epochs OR gate % n_src < rem
              |ORDER BY source, epoch, doc_id""".stripMargin)),

    // ---- UniMax language allocation (Chung et al. 2023): spread a
    //      token budget as UNIFORMLY as possible across languages,
    //      capped at E epochs of each language's corpus — the
    //      published fix for temperature sampling's starve-the-tail /
    //      overcook-the-head tradeoff. The sequential waterfill has a
    //      closed form over the cap-ascending order: a language is
    //      FULLY allocated iff cap·langs_left ≤ budget − Σ smaller
    //      caps (monotone, so one boundary), and every language past
    //      the boundary gets the boundary's equal share. All integer
    //      (floor-div share, like the engine's other gates). Scale
    //      shape: one corpus pass to per-language token counts; the
    //      waterfill windows run over the |languages|-row frame —
    //      value-domain scale, the documented metadata-window
    //      pattern. ----
    QuerySpec("unimax_allocation",
      (s, d) => {
        val E = 2L
        val perLang = Tables.documents(s, d)
          .select(col("lang"), size(TF.tokens(col("text"))).cast("long").as("nt"))
          .groupBy(col("lang")).agg(sum(col("nt")).as("n_tokens"))
          .withColumn("cap", col("n_tokens") * E)
        // budget = 1.5× corpus with a 2-epoch cap: sits BETWEEN "every
        // language fits its cap" and "nobody does", so the waterfill
        // boundary is genuinely exercised — small languages run their
        // full 2 epochs, the largest is clipped to the equal share
        val tot = broadcast(perLang.agg(
          expr("(3 * sum(n_tokens)) div 2").as("budget"),
          count(lit(1)).as("n_langs")))
        val asc = Window.orderBy(col("cap"), col("lang"))
        val en = perLang.crossJoin(tot)
          .withColumn("cum_before", coalesce(sum(col("cap"))
            .over(asc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("idx", row_number().over(asc))
          .withColumn("lft", col("n_langs") - col("idx") + 1L)
          .withColumn("sat",
            col("cap") * col("lft") <= col("budget") - col("cum_before"))
        val boundary = broadcast(en.filter(!col("sat"))
          .orderBy(col("idx")).limit(1)
          .select(expr("(budget - cum_before) div lft").as("share")))
        en.join(boundary, lit(true), "left")
          .select(col("lang"), col("n_tokens"), col("cap"),
            when(col("sat"), col("cap"))
              .otherwise(col("share")).as("alloc_tokens"))
          .withColumn("epochs_ppm",
            expr("(alloc_tokens * 1000000) div n_tokens"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH pl AS (SELECT lang, sum(len(${toksSql("text")}))::BIGINT
              |    AS n_tokens FROM documents GROUP BY lang),
              |cp AS (SELECT lang, n_tokens, n_tokens * 2 AS cap FROM pl),
              |tot AS (SELECT ((3 * sum(n_tokens)) // 2)::BIGINT AS budget,
              |    count(*)::BIGINT AS n_langs FROM cp),
              |en AS (SELECT cp.*, tot.budget, tot.n_langs,
              |    coalesce(sum(cap) OVER (ORDER BY cap, lang
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |      AS cum_before,
              |    row_number() OVER (ORDER BY cap, lang) AS idx
              |  FROM cp CROSS JOIN tot),
              |en2 AS (SELECT *, n_langs - idx + 1 AS lft,
              |    cap * (n_langs - idx + 1) <= budget - cum_before AS sat
              |  FROM en),
              |bd AS (SELECT (budget - cum_before) // lft AS share FROM en2
              |  WHERE NOT sat ORDER BY idx LIMIT 1)
              |SELECT lang, n_tokens, cap,
              |  (CASE WHEN sat THEN cap ELSE share END)::BIGINT
              |    AS alloc_tokens,
              |  (((CASE WHEN sat THEN cap ELSE share END) * 1000000)
              |    // n_tokens)::BIGINT AS epochs_ppm
              |FROM en2 LEFT JOIN bd ON TRUE ORDER BY lang""".stripMargin)),

    // ---- The corpus card: one-row summary every curation run logs.
    //      All aggregates are order-independent (counts, long sums,
    //      distinct counts over md5 fingerprints), so the row is
    //      engine-exact; dup_rate's two float ops share one
    //      parenthesization with the oracle. Exact multi-distinct
    //      plans as an Expand (~4× the scan rows); at the 100 TB tier
    //      swap countDistinct for approx_count_distinct (HLL partial
    //      aggregates, no expand) and bound it like agg_approx_users
    //      — exact is kept here because the card is the oracle-checked
    //      reference point. ----
    QuerySpec("corpus_stats",
      (s, d) => Tables.documents(s, d).agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(col("lang")).as("n_langs"),
          sum(TF.tokenCount(col("text")).cast("long")).as("n_tokens"),
          countDistinct(md5(col("text").cast("binary"))).as("n_unique"))
        .select(col("n_docs"), col("n_sources"), col("n_langs"),
          col("n_tokens"), col("n_unique"),
          (lit(1.0) - col("n_unique").cast("double") /
            col("n_docs").cast("double")).as("dup_rate")),
      Some(s"""SELECT count(*) AS n_docs,
              |  count(DISTINCT source) AS n_sources,
              |  count(DISTINCT lang) AS n_langs,
              |  CAST(sum(len(${toksSql("text")})) AS BIGINT) AS n_tokens,
              |  count(DISTINCT md5(text)) AS n_unique,
              |  CAST(1.0 AS DOUBLE) - CAST(count(DISTINCT md5(text)) AS DOUBLE)
              |    / CAST(count(*) AS DOUBLE) AS dup_rate
              |FROM documents""".stripMargin)),

    // ---- EXACT distributed quantiles of the doc-length distribution
    //      — the corpus-card percentiles (p25/p50/p75/p95 of tokens
    //      per doc) computed WITHOUT sorting the corpus and WITHOUT an
    //      approximation contract: lengths collapse to a value
    //      HISTOGRAM (one map-side-combined aggregate; cardinality =
    //      distinct lengths, value-domain-scale), the cumulative sum
    //      runs over that tiny histogram (the Packing metadata-window
    //      pattern), and each target rank ceil(pct·n/100) — integer
    //      arithmetic, no float ranks — picks its value by min-over-
    //      qualifying. The histogram × 4-rank non-equi join is
    //      histogram-scale, never corpus-scale. The same shape serves
    //      any integer-valued distribution (chunk counts, shard
    //      sizes). ----
    QuerySpec("token_length_quantiles",
      (s, d) => {
        val lens = Tables.documents(s, d)
          .select(TF.tokenCount(col("text")).cast("long").as("len"))
        // the histogram is persisted so n derives from it — the
        // corpus tokenizes ONCE, not once per consumer (n is the
        // histogram's weight sum, not a second corpus count)
        val hist = TrackedCache.persist(
          lens.groupBy(col("len")).agg(count(lit(1)).as("cnt")))
        val cum = hist.withColumn("cum",
          sum(col("cnt")).over(Window.orderBy(col("len"))))
        val n = hist.agg(coalesce(sum(col("cnt")), lit(0L)))
          .head().getLong(0)
        val targets = Seq(25, 50, 75, 95)
          .map(pct => (pct, (pct * n + 99) / 100)) // exact ceil, no floats
        import s.implicits._
        cum.join(broadcast(targets.toDF("pct", "r")), col("cum") >= col("r"))
          .groupBy(col("pct")).agg(min(col("len")).as("value"))
          .orderBy(col("pct"))
      },
      Some(s"""WITH lens AS (SELECT len(${toksSql("text")})::BIGINT AS len
              |    FROM documents),
              |h AS (SELECT len, count(*) AS cnt FROM lens GROUP BY 1),
              |c AS (SELECT len, sum(cnt) OVER (ORDER BY len) AS cum FROM h),
              |n AS (SELECT count(*) AS n FROM lens),
              |tr AS (SELECT pct, (pct * n + 99) // 100 AS r
              |  FROM (SELECT unnest([25, 50, 75, 95]) AS pct) CROSS JOIN n)
              |SELECT pct, min(len) AS value FROM c JOIN tr ON cum >= r
              |GROUP BY pct ORDER BY pct""".stripMargin)),

    // ---- The APPROXIMATE scale path next to the exact quantiles: at
    //      100 TB a value histogram over a high-cardinality measure
    //      stops being metadata, and the right tool is Spark's
    //      approx_percentile (Greenwald–Khanna partial sketches, fixed
    //      size, merged associatively — corpus-size-independent like
    //      the CMS/HLL/Bloom rows). GK's guarantee is a RANK error
    //      bound (≤ n/accuracy), and that contract is what gets
    //      oracle-checked, the agg_approx_users discipline: the
    //      checkable output is `approx_ok` — the sketch value's true
    //      rank interval (from the exact histogram) intersects the
    //      target rank ± tolerance — which the guarantee makes
    //      deterministically TRUE however partitions merge, while the
    //      sketch VALUE itself may legally vary. ----
    QuerySpec("token_length_quantiles_approx",
      (s, d) => {
        val lens = Tables.documents(s, d)
          .select(TF.tokenCount(col("text")).cast("long").as("len"))
        val hist = TrackedCache.persist(
          lens.groupBy(col("len")).agg(count(lit(1)).as("cnt")))
        val cum = TrackedCache.persist(hist.withColumn("cum",
          sum(col("cnt")).over(Window.orderBy(col("len")))))
        val n = hist.agg(coalesce(sum(col("cnt")), lit(0L)))
          .head().getLong(0)
        val pcts = Seq(25, 50, 75, 95)
        val tol = n / 100 + 2 // GK rank bound at accuracy=100, + slack
        val targets = pcts.map(pct => (pct, (pct * n + 99) / 100))
        import s.implicits._
        val exact = cum
          .join(broadcast(targets.toDF("pct", "r")), col("cum") >= col("r"))
          .groupBy(col("pct"), col("r"))
          .agg(min(col("len")).as("exact_len"))
        val approx = lens.agg(percentile_approx(col("len"),
            typedLit(pcts.map(_ / 100.0)), lit(100)).as("ap"))
          .select(posexplode(col("ap")).as(Seq("i", "av")))
          .select((element_at(typedLit(pcts), col("i") + 1)).as("pct"),
            col("av").cast("long").as("av"))
        // true rank interval of the sketch's value from the exact
        // histogram: r_hi = #{x ≤ v}, r_lo = #{x < v}
        val rhi = approx.join(cum, col("len") <= col("av"), "left")
          .groupBy(col("pct"), col("av"))
          .agg(coalesce(max(col("cum")), lit(0L)).as("r_hi"))
        val rlo = approx.join(cum, col("len") < col("av"), "left")
          .groupBy(col("pct"))
          .agg(coalesce(max(col("cum")), lit(0L)).as("r_lo"))
        exact.join(rhi, Seq("pct")).join(rlo, Seq("pct"))
          .select(col("pct"), col("exact_len"),
            (col("r_hi") >= col("r") - tol &&
              col("r_lo") + 1 <= col("r") + tol).as("approx_ok"))
          .orderBy(col("pct"))
      },
      Some(s"""WITH lens AS (SELECT len(${toksSql("text")})::BIGINT AS len
              |    FROM documents),
              |h AS (SELECT len, count(*) AS cnt FROM lens GROUP BY 1),
              |c AS (SELECT len, sum(cnt) OVER (ORDER BY len) AS cum FROM h),
              |n AS (SELECT count(*) AS n FROM lens),
              |tr AS (SELECT pct, (pct * n + 99) // 100 AS r
              |  FROM (SELECT unnest([25, 50, 75, 95]) AS pct) CROSS JOIN n)
              |SELECT pct, min(len) AS exact_len, TRUE AS approx_ok
              |FROM c JOIN tr ON cum >= r
              |GROUP BY pct ORDER BY pct""".stripMargin)))
}
