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
  * is an equi-join on fingerprint with a document-frequency cut first,
  * so one boilerplate fingerprint shared by a million documents is
  * dropped instead of joined quadratically — the same
  * stop-the-heavy-hitter discipline the LSH band monitors enforce.
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
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("fp"))
    val kept = fps.join(rare, Seq("fp"), "left_semi")
    kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
