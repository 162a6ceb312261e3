package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}
import graft.functions.{SimilarityFunctions => SF}
import graft.tables.Tables

/** Pins the two-stage PQ retrieval contract (`sim_pq_refined_topk`):
  *
  *  1. refined recall ≥ ADC-only recall — re-ranking an ADC superset
  *     with the exact metric can only fix inversions inside the
  *     shortlist, never lose a hit the shortlist already contains;
  *  2. when the shortlist covers the whole corpus (sf0.001 has fewer
  *     vectors than the 50-wide shortlist) the refined top-5 IS the
  *     exact brute-force top-5 — the re-rank stage really applies the
  *     exact metric, not a second approximation.
  */
class PqRefineSpec extends SparkSuite {

  private val d001 = "/root/testdata/sf0.001"
  private val d01 = "/root/testdata/sf0.01"

  private def avgRecall(q: String, d: String): Double = {
    val rows = SparkEntry.queries(q)(spark, d).collect()
    assert(rows.nonEmpty, s"$q returned no rows")
    rows.map(_.getAs[Double]("recall")).sum / rows.length
  }

  test("refined recall is never below ADC-only recall") {
    val adc = avgRecall("sim_pq_recall", d01)
    val refined = avgRecall("sim_pq_refined_recall", d01)
    assert(refined >= adc,
      s"re-rank lost recall: adc=$adc refined=$refined")
    TrackedCache.releaseAll()
  }

  test("full-corpus shortlist makes the refined top-5 exactly brute force") {
    val n = Tables.embeddings(spark, d001).count()
    // build a throwaway PQ index and search with a shortlist covering
    // the whole corpus — stage 2 alone decides the ranking
    val vecs = Tables.embeddings(spark, d001).select(
      col("vec_id").as("id"), SF.quantize(col("embedding")).as("v"))
    val dir = java.nio.file.Files.createTempDirectory("pq-refine-spec").toString
    graft.operators.IvfIndex.buildPq(vecs, dir, m = 8, subDims = 8,
      k = 16, iters = 1)
    val refined = graft.operators.IvfIndex.searchPqRefined(spark, dir,
        Seq(0L, 1L, 2L), subDims = 8, shortlist = n.toInt + 1, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(1)))
    // exact reference ranking, computed independently (window over the
    // tiny corpus — test-only; the product path uses the bounded heap)
    val qv = Tables.embeddings(spark, d001).select(col("vec_id"),
      SF.quantize(col("embedding")).as("v"))
    val q = qv.filter(col("vec_id").isin(0L, 1L, 2L))
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val brute = qv.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        SF.intDot(col("qv"), col("v")).as("dot"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("dot").desc, col("vec_id"))))
      .filter(col("rnk") <= 5)
      .collect().map(r => (r.getLong(0), r.getInt(3).toLong, r.getLong(1)))
    assert(refined.toSet == brute.toSet,
      s"refined != brute force:\n${refined.toSeq.sorted}\n${brute.toSeq.sorted}")
  }
}
