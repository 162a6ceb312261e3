package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{NativeExpressions, TextFunctions => TF}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every token k-gram, slide a
  * window of `w` consecutive gram hashes over each document, and keep
  * the minimum of every window. The selected set is a LOCAL
  * fingerprint — unlike MinHash (which samples the global token set),
  * winnowing guarantees that any shared token run of at least
  * `w + k - 1` tokens leaves at least one shared fingerprint in both
  * documents, while selecting only ~2/(w+1) of the grams. That makes
  * it the positional complement to the MinHash/SimHash family: it
  * catches long verbatim overlaps between otherwise-dissimilar
  * documents (quotes, boilerplate, license blocks) that whole-document
  * similarity dilutes away.
  *
  * Scale shape: grams explode to (doc_id, pos, 8-byte hash) — the text
  * itself never shuffles — and the sliding minimum is a window frame
  * PARTITIONED BY doc_id (keyed, never corpus-wide). The pair search
  * builds a BOUNDED posting list per fingerprint (min-k aggregate,
  * map-side combined) and drops any list that overflows the
  * document-frequency cut, so one boilerplate fingerprint shared by a
  * million documents is dropped instead of joined quadratically — the
  * same stop-the-heavy-hitter discipline the LSH band monitors
  * enforce — and the surviving pairs expand list-locally without a
  * fingerprint-keyed self-join.
  *
  * Reference scope note: the reference connector (kafka-connect-hdfs)
  * has no similarity operators; this belongs to the training-data
  * curation surface built alongside it.
  */
object Winnowing {

  /** Gram size: fingerprints are over token 3-grams. */
  val K = 3

  /** Window width: one fingerprint selected per `W` consecutive grams;
    * the detection guarantee is matches of ≥ `W + K - 1` tokens. */
  val W = 8

  /** Distinct winnowed fingerprints per document: (doc_id, fp).
    *
    * Selection rule (identical in the DuckDB mirrors): with gram
    * hashes h(1..m), windows start at every position 1..max(m-W+1, 1)
    * and take `min` of the ≤ W hashes from there — the final window is
    * clamped at the document end, so any document with at least one
    * gram (≥ K tokens) yields at least one fingerprint. Plain min (not
    * rightmost-min robust winnowing) keeps the rule a pure function of
    * the hash list that any engine replays exactly; the selected SET
    * is what both sides compare.
    */
  def fingerprints(docs: DataFrame,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    NativeExpressions.register(docs.sparkSession)
    val gh = docs
      .select(col(idCol).as("doc_id"),
        posexplode(TF.shingles(TF.tokens(col(textCol)), K)).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"),
        call_function("hash60_md5",
          concat(lit("win:"), col("g")).cast("binary")).as("h"))
    val byDoc = Window.partitionBy(col("doc_id"))
    val winMin = min(col("h"))
      .over(byDoc.orderBy(col("pos")).rowsBetween(0, W - 1))
    // pos is 0-based: full windows start at 0..m-W; when m < W the
    // single clamped window at 0 is the whole document
    gh.select(col("doc_id"), col("pos"), winMin.as("fp"),
        count(lit(1)).over(byDoc).as("m"))
      .filter(col("pos") <= greatest(col("m") - W, lit(0L)))
      .select(col("doc_id"), col("fp"))
      .distinct()
  }

  /** Document pairs sharing at least `minShared` fingerprints, after
    * dropping fingerprints with document frequency above `maxDf`
    * (boilerplate so common it says nothing — and whose posting list
    * would square in the join). Output: (doc_a, doc_b, n_shared),
    * doc_a < doc_b. */
  def sharedPairs(fps: DataFrame, maxDf: Long, minShared: Long): DataFrame = {
    NativeExpressions.register(fps.sparkSession)
    // Bounded posting-list shape (r17): ONE aggregate builds each
    // fingerprint's ≤(maxDf+1)-doc posting list through the
    // map-side-combined min_k_distinct sketch aggregate — an overflowed
    // list (size maxDf+1) IS the df > maxDf heavy hitter and drops,
    // and a surviving list is the complete distinct doc set (fps rows
    // are distinct per (doc_id, fp)). Pairs then explode list-locally:
    // the list is ascending, so (docs[i], docs[j>i]) is already
    // doc_a < doc_b. Replaces the previous df-count aggregate +
    // semi-join + fp-keyed self-join — two fewer corpus-scale passes
    // over the fingerprint table, and the one exchange that remains
    // carries ≤ maxDf+1 eight-byte ids per fingerprint instead of the
    // full posting rows twice. The per-group pair expansion is
    // interpreted HOF work, but over ≤ maxDf-element arrays at
    // fingerprint-vocabulary scale — never per-token.
    val posting = fps.groupBy(col("fp"))
      .agg(call_function("min_k_distinct", col("doc_id"),
        lit(maxDf.toInt + 1)).as("docs"))
      .filter(size(col("docs")) <= maxDf)
    posting
      .select(explode(expr(
        "flatten(transform(docs, (x, i) -> " +
          "transform(slice(docs, i + 2, size(docs) - i - 1), " +
          "y -> struct(x AS doc_a, y AS doc_b))))")).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
