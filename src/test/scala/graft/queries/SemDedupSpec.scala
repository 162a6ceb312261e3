package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}
import graft.functions.{SimilarityFunctions => SF}
import graft.tables.Tables

/** Pins `semdedup_prune`'s contract — SemDeDup-style semantic pruning
  * where the near-dup decision is scoped to the vector's own k-means
  * cell:
  *
  *  1. soundness — every pruned vector really has a LOWER-id partner in
  *     its OWN cell at exact cosine ≥ 0.35 (checked against the
  *     unblocked within-cell brute force, a SUPERSET of the banded
  *     candidates — so blocking can only under-prune, never mis-prune,
  *     and cross-cluster near-dups never prune anything);
  *  2. representative determinism — the min-id member of every cell is
  *     always kept (it can have no lower-id partner), so a dup-group's
  *     survivor is stable under re-runs and partitioning;
  *  3. totality — every corpus vector appears exactly once with a
  *     verdict.
  */
class SemDedupSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.01"

  test("pruned ⊆ within-cell exact near-dups; cell-min ids kept; output total") {
    val out = SparkEntry.queries("semdedup_prune")(spark, d).collect()
    TrackedCache.releaseAll()
    val n = Tables.embeddings(spark, d).count()
    assert(out.length.toLong == n, s"verdict rows ${out.length} != corpus $n")
    assert(out.map(_.getLong(0)).distinct.length == out.length,
      "one verdict per vector")

    val kept = out.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    val pruned = out.filterNot(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(pruned.nonEmpty, "corpus must exercise the prune branch")

    // the unblocked within-cell brute force (band keys dropped)
    val s = spark
    import s.implicits._
    val cells = out.map(r => (r.getLong(0), r.getLong(1))).toSeq
      .toDF("vec_id", "cell")
    val qv = Tables.embeddings(spark, d)
      .select(col("vec_id"), SF.quantize(col("embedding")).as("v"))
      .join(cells, Seq("vec_id")).persist()
    try {
      val dt = SF.intDot(col("a.v"), col("b.v"))
      val cos = dt.cast("double") /
        (sqrt(SF.intDot(col("a.v"), col("a.v")).cast("double")) *
          sqrt(SF.intDot(col("b.v"), col("b.v")).cast("double")))
      val prunable = qv.as("a").join(qv.as("b"),
          col("a.cell") === col("b.cell") &&
            col("a.vec_id") < col("b.vec_id"))
        .filter(dt > 0 && cos >= 0.35)
        .select(col("b.vec_id")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(pruned.subsetOf(prunable),
        s"pruned without an in-cell exact partner: ${pruned.diff(prunable)}")
    } finally { qv.unpersist(); () }

    val minPerCell = out.groupBy(_.getLong(1))
      .map { case (_, rows) => rows.map(_.getLong(0)).min }
    minPerCell.foreach(id =>
      assert(kept.contains(id), s"cell-min vector $id must be kept"))
  }
}
