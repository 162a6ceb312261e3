package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

class PackingSpec extends SparkSuite {
  import spark.implicits._

  /** Single-window reference: the textbook (non-scalable) running sum
    * the distributed form must equal exactly. */
  private def reference(rows: Seq[(Long, Long)], ctx: Long): Map[Long, (Long, Long)] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (id, w) =>
      val start = acc
      acc += w
      id -> (start, start / ctx)
    }.toMap
  }

  test("two-level prefix sum equals the single-window reference") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 257L).map(i => (i, rnd.nextInt(300).toLong))
    val got = Packing.packBins(rows.toDF("doc_id", "n"), "doc_id", "n", 512L, 64L)
      .select("doc_id", "tok_start", "bin")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === reference(rows, 512L))
  }

  test("result is invariant to the shard span (including span > n and span 1)") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 100L).map(i => (i, rnd.nextInt(50).toLong))
    val expected = reference(rows, 128L)
    for (span <- Seq(1L, 7L, 64L, 1000L)) {
      val got = Packing.packBins(rows.toDF("doc_id", "n"), "doc_id", "n", 128L, span)
        .select("doc_id", "tok_start", "bin")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got === expected, s"shardSpan=$span")
    }
  }

  test("sparse non-contiguous ids still pack in ascending-id order") {
    val rows = Seq((3L, 10L), (100L, 20L), (4000L, 5L), (4001L, 7L))
    val got = Packing.withTokenOffsets(rows.toDF("doc_id", "n"), "doc_id", "n", 64L)
      .select("doc_id", "tok_start").as[(Long, Long)].collect().toMap
    assert(got === Map(3L -> 0L, 100L -> 10L, 4000L -> 30L, 4001L -> 35L))
  }

  test("the corpus-sized side never goes through a single-partition exchange") {
    // the only single-task window may be over the shard-totals frame;
    // the per-row side must keep a hash/shard partitioning. Assert no
    // plan node repartitions the FULL frame to one partition: every
    // window over the row frame partitions by `shard`.
    val rows = (0L until 64L).map(i => (i, 1L))
    val plan = Packing.packBins(rows.toDF("doc_id", "n"), "doc_id", "n", 16L, 8L)
      .queryExecution.optimizedPlan.toString
    // an unpartitioned per-row window would render its spec with the
    // ORDER column first: windowspecdefinition(doc_id#...)
    assert(!plan.contains("windowspecdefinition(doc_id"),
      s"per-row window must be shard-partitioned:\n$plan")
    assert(plan.contains("windowspecdefinition(__pack_shard"),
      s"expected the shard-partitioned per-row window in:\n$plan")
  }
}
