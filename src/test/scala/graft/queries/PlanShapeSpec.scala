package graft.queries

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

import graft.{SparkEntry, SparkSuite}

/** Plan-shape assertions for the operators whose value IS their plan:
  * a correct result via the wrong plan (nested-loop range join, full
  * sort for a top-k, window-per-stat) would not survive 100 TB. Run at
  * sf0.001 — plan shape is scale-invariant. */
class PlanShapeSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  // AQE must be OFF here: AdaptiveSparkPlanExec is a LeafExecNode, so
  // collecting exchanges/joins through it finds nothing and every
  // count/absence assertion below would pass vacuously.
  private def plan(name: String): SparkPlan = {
    val conf = spark.conf
    val prev = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries(name)(spark, d).queryExecution.executedPlan
    finally conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def collectAll[T](p: SparkPlan)(f: PartialFunction[SparkPlan, T]): Seq[T] =
    p.collect(f) ++ p.subqueries.flatMap(_.collect(f))

  test("range_join_signup_hour is an equi-join, not a nested loop") {
    val p = plan("range_join_signup_hour")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"bucketized rewrite must not plan a nested loop:\n$p")
  }

  test("top_tokens plans TakeOrdered, never a global sort of the vocabulary") {
    val p = plan("top_tokens").toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("sessionize_events shuffles once for the window and once for the agg at most") {
    val p = plan("sessionize_events")
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 2,
      s"want <=2 exchanges (user_id window + session agg), got ${shuffles.size}:\n$p")
  }

  test("asof_last_signup shuffles only on the join key") {
    val p = plan("asof_last_signup")
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    // signup dedup agg + the union window partitioning; never a
    // per-row range probe or nested loop
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty)
    assert(shuffles.size <= 3, s"got ${shuffles.size} exchanges:\n$p")
  }

  test("proj_filter_lineitem pushes the filter into the parquet scan") {
    val p = plan("proj_filter_lineitem").toString
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate"), p)
  }

  test("sample_stratified is a pure scan predicate — zero exchanges") {
    val p = plan("sample_stratified")
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    // the global orderBy is presentation-only in the QuerySpec; the
    // keep-gate itself must not shuffle: one exchange for the sort max
    assert(shuffles.size <= 1, s"got ${shuffles.size} exchanges:\n$p")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty)
  }

  test("bigram_lift ends in TakeOrdered and hash-joins the vocabulary") {
    val p = plan("bigram_lift")
    val s = p.toString
    // (the single-row total legitimately attaches via a broadcast
    // nested loop — a 1-row cross join has no key to hash on)
    assert(s.contains("TakeOrderedAndProject"), s)
    assert(s.contains("BroadcastHashJoin") || s.contains("SortMergeJoin"),
      s"unigram joins must be equi-joins:\n$s")
  }

  test("decontaminate_eval_overlap broadcasts the eval grams — corpus side never shuffles for the join") {
    val p = plan("decontaminate_eval_overlap").toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"eval set must broadcast into a semi-join:\n$p")
  }

  test("pack_sequences' corpus-side window is shard-partitioned, never global") {
    val p = plan("pack_sequences").toString
    assert(!p.contains("windowspecdefinition(doc_id"),
      s"found an unpartitioned per-row window:\n$p")
  }

  test("sample_quota_by_source ranks via the bounded-heap aggregate, not a window") {
    val p = plan("sample_quota_by_source")
    val s = p.toString
    assert(s.contains("topk_pairs"), s"quota must use topk_pairs:\n$s")
    assert(!s.contains("Window"), s"no corpus window allowed:\n$s")
    // two exchanges: the per-source aggregate + the presentation-only
    // global orderBy; the ranking itself must never add one
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 2, s"got ${shuffles.size} exchanges:\n$p")
  }

  test("dedup_simhash_pairs blocks via a band equi-join — never all-pairs") {
    val p = plan("dedup_simhash_pairs")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"band blocking must plan an equi-join:\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"no all-pairs cross product:\n$p")
  }

  test("dedup_embedding_cosine blocks via a band equi-join — never all-pairs") {
    val p = plan("dedup_embedding_cosine")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"banded LSH blocking must plan an equi-join:\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"no all-pairs cross product:\n$p")
  }

  test("knn_graph blocks via a band equi-join and ranks via topk_pairs") {
    val p = plan("knn_graph")
    val s = p.toString
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"banded LSH blocking must plan equi-joins:\n$p")
    assert(!s.contains("CartesianProduct"),
      s"no all-pairs cross product:\n$p")
    assert(s.contains("topk_pairs"),
      s"per-vector ranking must use the bounded-heap aggregate:\n$s")
    // the presentation orderBy is the only full sort allowed; the
    // ranking itself must never sort the candidate set globally
    assert(!s.contains("Window"), s"no corpus window allowed:\n$s")
  }

  test("sim_ivf_topk's candidate and scoring joins stay keyed — never all-pairs") {
    val p = plan("sim_ivf_topk")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"banded multiprobe must plan equi-joins:\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"no all-pairs cross product:\n$p")
  }

  test("sample_target_mix never windows the corpus; exchanges stay bounded") {
    val p = plan("sample_target_mix")
    val s = p.toString
    assert(!s.contains("Window"), s"no corpus window allowed:\n$s")
    // per-source counts agg + final per-source agg + presentation
    // orderBy; the 1-row limiting-source frame must not add a shuffle
    // of data
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 4, s"got ${shuffles.size} exchanges:\n$p")
  }

  test("shuffle_shards ranks inside hash-range buckets — never a global corpus window") {
    val p = plan("shuffle_shards").toString
    // the only unpartitioned window may be the bucket-counts frame; a
    // global rank over the raw hash would sort the corpus in one task
    assert(!p.contains("windowspecdefinition(h#"),
      s"found an unpartitioned corpus window:\n$p")
  }

  test("remove_duplicate_spans joins stay keyed — never all-pairs") {
    val p = plan("remove_duplicate_spans")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"gram-hash dedup must plan equi-joins:\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"no all-pairs cross product:\n$p")
  }

  test("lm_novelty_filter joins stay gram-hash/doc-keyed — never all-pairs") {
    val p = plan("lm_novelty_filter")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"LM scoring must plan equi-joins:\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"no all-pairs cross product:\n$p")
  }

  test("semdedup_prune candidates stay (band, cell)-keyed — never all-pairs") {
    val p = plan("semdedup_prune")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"cluster-scoped near-dup blocking must plan equi-joins:\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"no all-pairs cross product:\n$p")
  }

  test("decontaminate_neardup blocks on bands with the eval side broadcast") {
    val p = plan("decontaminate_neardup")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"band blocking must plan equi-joins:\n$p")
    assert(!p.toString.contains("CartesianProduct"),
      s"no all-pairs cross product:\n$p")
    // the BAND join specifically must be a broadcast hash join (eval
    // side small) — any incidental broadcast elsewhere must not
    // satisfy this pin
    val bandJoins = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if (j.leftKeys ++ j.rightKeys).exists(_.toString.contains("band")) => j
    }
    assert(bandJoins.nonEmpty,
      s"the band equi-join must broadcast the eval side:\n$p")
  }

  test("dedup_incremental is a fingerprint anti-join, no nested loop") {
    val p = plan("dedup_incremental")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"anti-join must stay keyed:\n$p")
    assert(p.toString.contains("LeftAnti"), p.toString)
  }

  test("decontaminate_bloom probes the sketch scan-side, below the verify join") {
    val p = plan("decontaminate_bloom")
    val s = p.toString
    // the bloom probe must be a Filter in the plan (scan-side), and
    // the exact verify must still be a semi-join after it
    assert(s.contains("bloom_might_contain_long"), s"probe missing:\n$s")
    assert(s.contains("LeftSemi"), s"exact verify join missing:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
    // the probe filter must sit BELOW the semi-join: walking down from
    // the first semi-join, its corpus-side subtree contains the probe
    val semi = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType.toString == "LeftSemi" => j
    }
    assert(semi.nonEmpty, s)
    assert(semi.head.left.toString.contains("bloom_might_contain_long") ||
      semi.head.right.toString.contains("bloom_might_contain_long"),
      s"bloom probe must prefilter the join input, not postfilter:\n$s")
  }

  test("sim_pq_adc_topk: ADC lookup is a broadcast equi-join on (m, code); no corpus window") {
    val p = plan("sim_pq_adc_topk")
    val s = p.toString
    // the CORPUS-side join (codes → LUT) must be a broadcast hash
    // join keyed on the code — the only tolerated nested loop is the
    // 3-row query × 32-row codebook LUT build
    val codeJoins = collectAll(p) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
          if (j.leftKeys ++ j.rightKeys).exists(_.toString.contains("code")) => j
    }
    assert(codeJoins.nonEmpty, s"ADC lookup must equi-join on (m, code):\n$s")
    assert(!s.contains("CartesianProduct"), s"no unhinted all-pairs:\n$s")
    assert(s.contains("topk_pairs"), s"final ranking via bounded heap:\n$s")
    assert(!s.contains("Window"), s"no corpus window allowed:\n$s")
  }

  test("curation_pipeline_e2e: stages stay keyed — band equi-join, no cartesian, no corpus window") {
    val p = plan("curation_pipeline_e2e")
    val s = p.toString
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"every stage join must stay keyed:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
    assert(!s.contains("Window"), s"no corpus window:\n$s")
  }

  test("curation_incremental: every join keyed, no cartesian, no corpus window") {
    val p = plan("curation_incremental")
    val s = p.toString
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"batch-vs-corpus admission must stay keyed:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
    assert(!s.contains("Window"), s"no corpus window:\n$s")
  }

  test("dedup_winnow_pairs: keyed sliding-min windows, fp equi-join, no all-pairs") {
    val p = plan("dedup_winnow_pairs")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"pair search must stay an fp equi-join:\n$p")
    assert(!p.toString.contains("CartesianProduct"), s"no all-pairs:\n$p")
    // the fingerprint frame itself is persisted inside the query (its
    // windows hide in the InMemoryRelation), so pin its shape on the
    // operator's own plan — after dropping the cache entry the plan()
    // call above registered, or this plan would match straight into
    // the same InMemoryRelation leaf
    graft.queries.TrackedCache.releaseAll()
    spark.catalog.clearCache()
    val conf = spark.conf
    val prev = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    val fp =
      try graft.operators.Winnowing
        .fingerprints(graft.tables.Tables.documents(spark, d))
        .queryExecution.executedPlan
      finally conf.set("spark.sql.adaptive.enabled", prev)
    val wins = collectAll(fp) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, s"expected the sliding-min window:\n$fp")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      s"every window must be keyed by doc_id, never corpus-wide:\n$fp")
  }

  test("quality_classifier_score: weight joins stay keyed, no corpus window") {
    val p = plan("quality_classifier_score")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"every weight/label join must stay an equi-join:\n$p")
    val s = p.toString
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
    assert(!s.contains("Window"), s"no corpus window:\n$s")
  }

  test("sim_sq8_topk ranks codes via the bounded heap over a broadcast query side") {
    val p = plan("sim_sq8_topk")
    val s = p.toString
    assert(s.contains("topk_pairs"), s)
    assert(!s.contains("Window"), s"no corpus window allowed:\n$s")
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    // partial topk_pairs combine + presentation orderBy only
    assert(shuffles.size <= 2, s"got ${shuffles.size} exchanges:\n$p")
  }

  test("sample_epoch_upsample repeats via a generator over a broadcast plan join") {
    val p = plan("sample_epoch_upsample")
    val s = p.toString
    // the corpus side: scan → broadcast-hash plan join → generate →
    // filter; exchanges belong to the source-scale plan aggregates and
    // the presentation sort only
    assert(s.contains("BroadcastHashJoin"), s"plan join must broadcast:\n$s")
    assert(s.contains("Generate"), s"epoch repetition must be a generator:\n$s")
    assert(!s.contains("Window"), s"no corpus window:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 4, s"got ${shuffles.size} exchanges:\n$p")
  }

  test("knn_label_confusion votes via aggregates, never a corpus window") {
    val p = plan("knn_label_confusion")
    val s = p.toString
    assert(!s.contains("Window"),
      s"the vote argmax must fold through min-struct aggregation:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"band and label joins must stay equi-joins:\n$p")
  }

  test("hard_negatives ranks through the bounded heap with equi-joins only") {
    val p = plan("hard_negatives")
    val s = p.toString
    assert(s.contains("topk_pairs"), s)
    assert(!s.contains("Window"), s"no corpus window:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"band and label joins must stay equi-joins:\n$p")
  }

  test("tier router: prediction is a literal-centroid projection, training a (class, slot) aggregate") {
    val p = plan("tier_confusion_matrix")
    val s = p.toString
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
    // the one Window allowed is none: confusion is aggregates over the
    // shuffle-free prediction projection
    assert(!s.contains("WindowExec"), s"no corpus window:\n$s")
  }

  test("dsir_bucket_weights: bucket-histogram aggregates, no corpus window") {
    val p = plan("dsir_bucket_weights")
    val s = p.toString
    assert(!s.contains("WindowExec"), s"no window at all:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
    // (the 1-row totals frame legitimately attaches via a broadcast
    // nested loop — nothing to hash on)
  }

  test("sample_dsir scores via a broadcast join; cumulation stays on the score histogram") {
    val p = plan("sample_dsir")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"),
      s"the B-row weight table must broadcast into the scoring join:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size <= 1,
      s"only the score-histogram cumulation may window:\n$p")
  }

  test("vocab_growth cumulates over the 20-bucket frame, never the corpus") {
    val p = plan("vocab_growth")
    val s = p.toString
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size <= 1,
      s"one metadata-scale bucket cumulation only:\n$p")
  }

  test("zipf_decade_ratios joins ranks as an equi-join") {
    val p = plan("zipf_decade_ratios")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin") || s.contains("SortMergeJoin"),
      s"the decade join must be an equi-join on rank:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
  }

  test("quality_gopher_rules is one scan projection — no shuffle besides the output sort") {
    val p = plan("quality_gopher_rules")
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    // every rule metric is list-local over one tokens array; the only
    // exchange allowed is the presentation-only orderBy(doc_id)
    assert(shuffles.size <= 1, s"got ${shuffles.size} exchanges:\n$p")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty)
    assert(!p.toString.contains("WindowExec"), s"no window:\n$p")
  }

  test("collapse_token_runs is one scan projection — no shuffle besides the output sort") {
    val p = plan("collapse_token_runs")
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    // the kept positions fold row-locally over the zipped token array;
    // the only exchange allowed is the presentation-only orderBy
    assert(shuffles.size <= 1, s"got ${shuffles.size} exchanges:\n$p")
    assert(!p.toString.contains("Join"), s"no join:\n$p")
    assert(!p.toString.contains("WindowExec"), s"no window:\n$p")
  }

  test("dedup_cross_source_overlap self-joins on the fingerprint — never all-pairs") {
    val p = plan("dedup_cross_source_overlap")
    val s = p.toString
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
    assert(s.contains("BroadcastHashJoin") || s.contains("SortMergeJoin"),
      s"fingerprint self-join must be an equi-join:\n$s")
    assert(!s.contains("WindowExec"), s"no corpus window:\n$s")
  }

  test("sim_ivf_mrr ranks via bounded heaps and keyed joins — no corpus window outside the q-row frames") {
    val p = plan("sim_ivf_mrr")
    val s = p.toString
    assert(s.contains("topk_pairs"),
      s"brute-force truth must use the bounded-heap aggregate:\n$s")
    assert(!s.contains("CartesianProduct"), s"no unbroadcast all-pairs:\n$s")
    // the IVF side's per-query candidate ranking windows over O(q·k)
    // rows (q = 3 probes) — corpus-scale frames must not appear
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.forall(
      _.toString.contains("windowspecdefinition(q_id")),
      s"every window must be q_id-partitioned (candidate-scale):\n$p")
  }

  test("zorder_scan_pruning is bit-arithmetic projections + two aggregates — no window, no corpus cartesian") {
    val p = plan("zorder_scan_pruning")
    val s = p.toString
    assert(!s.contains("WindowExec"), s"no window:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
    // only the 1-row rows_matched frame may attach via a broadcast
    // nested loop (nothing to hash on); both layout reports aggregate
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 5, s"got ${shuffles.size} exchanges:\n$p")
  }

  test("bpe_fertility joins the vocabulary-scale word tables as equi-joins") {
    val p = plan("bpe_fertility")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin") || s.contains("SortMergeJoin"),
      s"the word join must be an equi-join:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
    assert(!s.contains("WindowExec"), s"no window:\n$s")
  }

  test("span_corruption_pairs is row-local — no shuffle besides the output sort") {
    val p = plan("span_corruption_pairs")
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 1, s"got ${shuffles.size} exchanges:\n$p")
    assert(!p.toString.contains("WindowExec"), s"no window:\n$p")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty)
  }

  test("preference_pairs ranks both extremes through bounded heaps, joined on source") {
    val p = plan("preference_pairs")
    val s = p.toString
    assert(s.contains("topk_pairs"), s"extremes must use topk_pairs:\n$s")
    assert(!s.contains("WindowExec"), s"no corpus window:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
  }

  test("char_surprisal_stats broadcasts the alphabet-scale model back into the histogram") {
    val p = plan("char_surprisal_stats")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"),
      s"the bits table must broadcast into the per-doc join:\n$s")
    assert(!s.contains("WindowExec"), s"no window:\n$s")
  }

  test("embedding_drift_cells never windows or cross-joins the corpus") {
    val p = plan("embedding_drift_cells")
    val s = p.toString
    assert(!s.contains("WindowExec"), s"no window:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
    // assignment must stay the literal-centroid projection — the only
    // exchanges are the corpus count, the (cell) aggregate, the K-row
    // totals aggregate, and the output sort
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 4, s"got ${shuffles.size} exchanges:\n$p")
  }

  test("zorder_scan_pruning prunes the events scan to its two coordinates") {
    val p = plan("zorder_scan_pruning").toString
    // a layout report that read every column would be reading the
    // table to decide how not to read the table
    assert(!p.contains("props") && !p.contains("event_type"),
      s"scan must prune to (user_id, ts):\n$p")
  }

  test("minhash_banding_recall's exact truth runs on the broadcast bounded sample") {
    val p = plan("minhash_banding_recall")
    val s = p.toString
    assert(!s.contains("CartesianProduct"),
      s"sample self-join must be broadcast, not a corpus cartesian:\n$s")
    assert(!s.contains("WindowExec"), s"no window:\n$s")
  }

  test("scd2_user_state windows are user-partitioned, never global") {
    val p = plan("scd2_user_state")
    val s = p.toString
    assert(s.contains("windowspecdefinition(user_id"),
      s"change/interval windows must partition by user:\n$s")
    // both windows share the (user_id → (ms, event_id)) partitioning,
    // so Catalyst reuses one exchange; +1 for the presentation sort
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 2, s"got ${shuffles.size} exchanges:\n$p")
  }

  test("pagerank_event_graph: corpus work is one user window + one edge agg; iterations driver-side") {
    // r17: the five power iterations fold driver-side over the
    // collected value-domain edge aggregate (guarded ≤ 256 nodes), so
    // the RETURNED frame is a local relation — no corpus-scale operator
    // may appear in it. The corpus-side work (user-partitioned lag
    // window feeding the edge aggregate) ran eagerly while building
    // the fold's inputs; TrackedCache still holds the edges pin here,
    // whose plan carries that window — pinned below.
    val p = plan("pagerank_event_graph")
    val s = p.toString
    assert(s.contains("LocalTableScan"),
      s"iterations fold driver-side — result is a local relation:\n$s")
    assert(!s.contains("SortMergeJoin") && !s.contains("CartesianProduct"),
      s"no corpus-scale join may survive in the result plan:\n$s")
    assert(!s.contains("windowspecdefinition"),
      s"the user window belongs to the edge build, not the result:\n$s")
    // the corpus-side shape (user-partitioned lag window feeding a
    // keyed aggregate) is pinned by scd2_user_state above — pagerank's
    // edge build is the same windowspecdefinition(user_id) pattern,
    // executed eagerly while the fold collects its value-domain inputs
    graft.queries.TrackedCache.releaseAll()
  }

  test("kmv sketches build via the bounded min-k aggregate — no rank window at all") {
    for (q <- Seq("kmv_distinct_by_source", "kmv_source_jaccard")) {
      val s = plan(q).toString
      assert(s.contains("min_k_distinct"),
        s"$q: the sketch must be the bounded min-k-distinct aggregate:\n$s")
      assert(!s.contains("windowspecdefinition(source"),
        s"$q: no per-source rank window (the aggregate replaced it):\n$s")
      assert(!s.contains("windowspecdefinition(h#"),
        s"$q: no global hash-ordered window:\n$s")
    }
  }

  test("q3_shipping_priority: semi-joined segment filter, TakeOrdered top-10") {
    val p = plan("q3_shipping_priority")
    val s = p.toString
    assert(s.contains("TakeOrderedAndProject"),
      s"top-10 must not be a global sort:\n$s")
    assert(s.contains("LeftSemi"),
      s"the segment filter must be a semi join:\n$s")
    assert(!s.contains("CartesianProduct") &&
      collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"no unkeyed joins:\n$s")
  }

  test("q5_local_supplier_revenue: all six joins are keyed; dimensions broadcast") {
    val p = plan("q5_local_supplier_revenue")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"),
      s"supplier/nation chain must broadcast:\n$s")
    assert(!s.contains("CartesianProduct") &&
      collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"no unkeyed joins:\n$s")
  }

  test("rfm_segments: user-keyed aggregate, no window, grid-scale rollup") {
    val p = plan("rfm_segments")
    val s = p.toString
    assert(!s.contains("WindowExec"), s"no window:\n$s")
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    // user aggregate + grid rollup + presentation sort (+1 slack for
    // the 1-row max-day aggregate's exchange)
    assert(shuffles.size <= 4, s"got ${shuffles.size} exchanges:\n$p")
  }

  test("q18_large_orders: having-filtered aggregate feeds a keyed join, top-20 is TakeOrdered") {
    val p = plan("q18_large_orders")
    val s = p.toString
    assert(s.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
  }

  test("above_avg_spend_customers: global scalar is a broadcast 1-row, never a window") {
    val p = plan("above_avg_spend_customers")
    val s = p.toString
    assert(!s.contains("WindowExec"), s"no window:\n$s")
    // the 1-row totals legitimately attach via a broadcast nested loop
    // (nothing to hash on); what must NOT appear is a cartesian
    assert(!s.contains("CartesianProduct"), s"no cartesian:\n$s")
  }

  test("source_cards: both corpus passes aggregate by source; the KMV sketch is windowless") {
    val p = plan("source_cards")
    val s = p.toString
    assert(s.contains("min_k_distinct"),
      s"the sketch must be the bounded min-k-distinct aggregate:\n$s")
    assert(!s.contains("windowspecdefinition"),
      s"no window anywhere in the card:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
  }

  test("decontaminate_coverage: gram joins stay keyed; no window, no all-pairs") {
    val p = plan("decontaminate_coverage")
    val s = p.toString
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
    assert(!s.contains("WindowExec"), s"no window:\n$s")
    assert(s.contains("BroadcastHashJoin") || s.contains("SortMergeJoin"),
      s"gram membership must be an equi-join:\n$s")
  }

  test("dedup_cluster_purity: majority via max(struct), never a per-cluster window") {
    val p = plan("dedup_cluster_purity")
    val s = p.toString
    assert(!s.contains("WindowExec"), s"no window:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
  }

  test("sim_filtered_topk: metadata filter prunes via a semi join BEFORE ranking; bounded heap, no window") {
    val p = plan("sim_filtered_topk")
    val s = p.toString
    assert(s.contains("LeftSemi"), s"metadata predicate must be a semi join:\n$s")
    assert(s.contains("topk_pairs"), s"ranking must use the bounded heap:\n$s")
    assert(!s.contains("WindowExec"), s"no window:\n$s")
  }

  test("sim_filtered_ivf_topk: predicate semi-joins the assignment before the probe join; heap ranking") {
    val p = plan("sim_filtered_ivf_topk")
    val s = p.toString
    assert(s.contains("LeftSemi"), s"metadata predicate must be a semi join:\n$s")
    assert(s.contains("topk_pairs"), s"ranking must use the bounded heap:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
  }

  test("sim_filtered_served_topk: predicate filters the pruned scan; probes broadcast; heap ranking") {
    val p = plan("sim_filtered_served_topk")
    val s = p.toString
    // pre-filter semantics ride the scan side (a Filter over the
    // pruned file read), probes broadcast, bounded-heap ranking — the
    // corpus never shuffles for the join and never windows
    assert(s.contains("topk_pairs"), s"ranking must use the bounded heap:\n$s")
    assert(s.contains("BroadcastHashJoin") || s.contains("BroadcastExchange"),
      s"probes must broadcast:\n$s")
    assert(!s.contains("CartesianProduct"), s"no all-pairs:\n$s")
    assert(!s.contains("WindowExec"), s"no corpus window:\n$s")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"no nested-loop join:\n$p")
  }

  test("multimodal_frame_pixels: one batched decode pass — no join, no shuffle before the sort") {
    val p = plan("multimodal_frame_pixels")
    val s = p.toString
    // fixture synth + plan + decode live in ONE narrow pipeline; the
    // only exchange is the final presentation orderBy
    assert(collectAll(p) { case e: ShuffleExchangeExec => e }.size <= 1,
      s"decode must not shuffle (one range exchange for the orderBy):\n$s")
    assert(!s.contains("SortMergeJoin") && !s.contains("BroadcastHashJoin"),
      s"no join in the decode pass:\n$s")
  }

  test("q6_forecast_revenue pushes all three predicates into the parquet scan") {
    // the executedPlan's toString TRUNCATES the PushedFilters list, so
    // read the scan's metadata directly instead of string-matching
    val scans = collectAll(plan("q6_forecast_revenue")) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val pushed = scans.head.metadata("PushedFilters")
    for (want <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
        "LessThan(l_quantity"))
      assert(pushed.contains(want), s"missing $want in $pushed")
  }

  test("q10_returned_revenue: dimensions join after the aggregate; top-20 is TakeOrdered") {
    val p = plan("q10_returned_revenue")
    val s = p.toString
    assert(s.contains("TakeOrderedAndProject"), s"top-20 must not global-sort:\n$s")
    assert(!s.contains("CartesianProduct") &&
      collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"no unkeyed joins:\n$s")
  }

  test("q14_promo_revenue_share: part broadcasts; one aggregate, no window") {
    val p = plan("q14_promo_revenue_share")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"), s"part must broadcast:\n$s")
    assert(!s.contains("WindowExec") && !s.contains("CartesianProduct"), s)
  }

  test("q4_late_shipments: the EXISTS correlation is one semi join, never a per-order probe") {
    val p = plan("q4_late_shipments")
    val s = p.toString
    assert(s.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$s")
    assert(!s.contains("CartesianProduct") &&
      collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"no unkeyed joins:\n$s")
  }

  test("q7_nation_trade_volume: both geography chains broadcast; no cartesian") {
    val p = plan("q7_nation_trade_volume")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"),
      s"dimension chains must broadcast:\n$s")
    assert(!s.contains("CartesianProduct") &&
      collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty, s)
  }

  test("q8_market_share: single conditional aggregate — no second corpus pass for the numerator") {
    val p = plan("q8_market_share")
    val s = p.toString
    val aggs = "HashAggregate".r.findAllIn(s).size
    // one partial+final pair over the joined fact; the CASE numerator
    // must ride the same aggregate, not a second join branch
    assert(aggs <= 2, s"numerator and total must share one aggregate:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q13_custorder_distribution: outer join keeps zero-order customers; no cartesian") {
    val p = plan("q13_custorder_distribution")
    val s = p.toString
    assert(s.contains("LeftOuter"), s"customer→orders must stay outer:\n$s")
    assert(!s.contains("CartesianProduct") &&
      collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty, s)
  }

  test("q21_waiting_suppliers: EXISTS/NOT-EXISTS plan as one semi + one anti join, no cartesian") {
    val p = plan("q21_waiting_suppliers")
    val s = p.toString
    assert(s.contains("LeftSemi"), s"EXISTS must be a semi join:\n$s")
    assert(s.contains("LeftAnti"), s"NOT EXISTS must be an anti join:\n$s")
    assert(!s.contains("CartesianProduct") &&
      collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"no unkeyed joins:\n$s")
  }

  test("q15_top_supplier: the argmax is a broadcast of the 1-row max, never a global window") {
    val p = plan("q15_top_supplier")
    val s = p.toString
    assert(!s.contains("WindowExec"), s"no window over the revenue frame:\n$s")
    assert(s.contains("BroadcastHashJoin"), s"max must broadcast back:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("sim_pq_refined_topk: corpus scan stays on codes; shortlist + queries broadcast into the re-rank") {
    val p = plan("sim_pq_refined_topk")
    val s = p.toString
    // stage 2's vector fetch must be broadcast probes against the codes
    // topic, never a corpus-side shuffle join on neighbor ids
    val bhj = "BroadcastHashJoin".r.findAllIn(s).size
    assert(bhj >= 2, s"shortlist and query vectors must broadcast:\n$s")
    assert(!s.contains("SortMergeJoin"),
      s"no corpus-side shuffle join in the serving path:\n$s")
    // the only unkeyed join allowed is the LUT build: Q rows × M·K
    // codebook rows, both broadcast-tiny by construction
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.size <= 1,
      s"only the LUT cross join may be unkeyed:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("sim_ivfpq_topk: no Lloyd in the serving plan; probe/LUT/centroid sides broadcast") {
    val p = plan("sim_ivfpq_topk")
    val s = p.toString
    // serving = pruned codes scan + broadcast probes/LUT/cdot + two
    // map-side-combined aggregates; training never appears
    assert(s.contains("BroadcastHashJoin"), s"probe sides must broadcast:\n$s")
    assert(!s.contains("SortMergeJoin"),
      s"no corpus-side shuffle join in the serving path:\n$s")
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.size <= 1,
      s"only the LUT cross join may be unkeyed:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q17_small_quantity_revenue: correlated avg is one aggregate joined back; brand parts broadcast") {
    val p = plan("q17_small_quantity_revenue")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"), s"brand part list must broadcast:\n$s")
    assert(!s.contains("CartesianProduct") &&
      collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"the correlated average must never be a per-row probe:\n$s")
  }

  test("q22_idle_balance_customers: 1-row global scalar broadcast; no-orders is an anti join") {
    val p = plan("q22_idle_balance_customers")
    val s = p.toString
    assert(s.contains("LeftAnti"), s"NOT EXISTS must be an anti join:\n$s")
    // the only unkeyed join is the 1-row totals broadcast
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.size <= 1,
      s"only the 1-row scalar may be unkeyed:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q19_disjunctive_revenue: the disjunction's per-table halves reach the scans") {
    val p = plan("q19_disjunctive_revenue")
    val s = p.toString
    // Catalyst derives per-scan OR predicates from the cross-table
    // disjunction: part's scan sees the brand/size halves, lineitem's
    // the quantity bounds — BOTH PushedFilters carry a nested Or
    assert("PushedFilters: \\[[^\\]]*Or\\(Or\\(And\\(".r
      .findAllIn(s).size >= 2,
      s"both scans must carry their OR halves:\n$s")
    assert(s.contains("BroadcastHashJoin"), s"part must broadcast:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("unimax_allocation touches the corpus once — the per-language aggregate") {
    val p = plan("unimax_allocation")
    // everything past the (lang) aggregate is the |languages|-row
    // frame; the waterfill windows/joins may not add corpus exchanges
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 4,
      s"want: lang agg + metadata window/sort only, got ${shuffles.size}:\n$p")
    assert(!p.toString.contains("SortMergeJoin"),
      s"boundary share must broadcast:\n$p")
  }

  test("q2_min_cost_supplier: correlated min is one aggregate joined back; top-100 is TakeOrdered") {
    val p = plan("q2_min_cost_supplier")
    val s = p.toString
    assert(s.contains("TakeOrderedAndProject"),
      s"LIMIT after ORDER BY must never be a global sort:\n$s")
    assert(!s.contains("WindowExec"),
      s"the per-part min must not be a window:\n$s")
    assert(!s.contains("CartesianProduct") &&
      collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"the correlated min must never be a per-row probe:\n$s")
  }

  test("q9_product_profit: dims broadcast; the only shuffled joins are fact-keyed") {
    val p = plan("q9_product_profit")
    val s = p.toString
    assert(s.contains("BroadcastHashJoin"),
      s"part/supplier/nation must broadcast:\n$s")
    assert(!s.contains("CartesianProduct") &&
      collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"a five-way star join may contain no unkeyed join:\n$s")
  }

  test("q11_important_stock: the global total is a 1-row broadcast, never a window") {
    val p = plan("q11_important_stock")
    val s = p.toString
    assert(!s.contains("WindowExec"),
      s"no window over the per-part frame:\n$s")
    // the only unkeyed join is the 1-row total attaching
    assert(collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.size <= 1,
      s"only the 1-row scalar may be unkeyed:\n$s")
    assert(!s.contains("CartesianProduct"), s)
  }

  test("q12_shipclass_priority: ship window reaches the parquet scan; one keyed join") {
    val p = plan("q12_shipclass_priority")
    val s = p.toString
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"the ship-year window must push down:\n$s")
    assert(!s.contains("CartesianProduct") &&
      collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty, s)
  }

  test("q16_parts_supplier_counts: NOT IN is one anti join against a broadcast") {
    val p = plan("q16_parts_supplier_counts")
    val s = p.toString
    assert(s.contains("LeftAnti"),
      s"the flagged-supplier exclusion must be an anti join:\n$s")
    assert(s.contains("BroadcastHashJoin"),
      s"flagged suppliers and the part filter must broadcast:\n$s")
    assert(!s.contains("CartesianProduct") &&
      collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty, s)
  }

  test("q20_excess_stock_suppliers: nested IN is semi joins; correlated sum is an aggregate joined back") {
    val p = plan("q20_excess_stock_suppliers")
    val s = p.toString
    assert("LeftSemi".r.findAllIn(s).size >= 2,
      s"part-name and supplier membership must both be semi joins:\n$s")
    assert(!s.contains("CartesianProduct") &&
      collectAll(p) { case j: BroadcastNestedLoopJoinExec => j }.isEmpty,
      s"the correlated availability sum must never be a per-row probe:\n$s")
  }
}
