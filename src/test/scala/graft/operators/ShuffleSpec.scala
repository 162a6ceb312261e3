package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ShuffleSpec extends SparkSuite {
  import spark.implicits._

  /** Single-window reference: the textbook (non-scalable) global rank
    * the distributed ranking must equal exactly. */
  private def reference(rows: Seq[(Long, Long)]): Map[Long, Long] =
    rows.sortBy { case (id, h) => (h, id) }.zipWithIndex
      .map { case ((id, _), pos) => id -> pos.toLong }.toMap

  /** Ids 0..n-1 with a deterministic pseudo-hash in [0, 2^60). */
  private def corpus(n: Int, seed: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0L until n.toLong).map(i => (i, rnd.nextLong() & ((1L << 60) - 1)))
  }

  test("two-level ranking equals the single-window reference") {
    val rows = corpus(257, 7)
    val got = Shuffle.withShufflePosition(rows.toDF("id", "h"), "h", "id", 16)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(got === reference(rows))
  }

  test("pos is a permutation of 0..n-1 and invariant to bucket count and input partitioning") {
    val rows = corpus(100, 11)
    val expected = reference(rows)
    for (buckets <- Seq(1, 3, 16, 1000)) {
      val got = Shuffle.withShufflePosition(
          rows.toDF("id", "h").repartition(buckets % 7 + 2), "h", "id", buckets)
        .select("id", "pos").as[(Long, Long)].collect().toMap
      assert(got === expected, s"buckets=$buckets")
      assert(got.values.toSeq.sorted === (0L until 100L), s"buckets=$buckets")
    }
  }

  test("staged ranking equals the global (stage, h, id) row_number at any bucket count") {
    val rnd = new scala.util.Random(17)
    val rows = (0L until 211L).map(i =>
      (i, rnd.nextInt(4).toLong, rnd.nextLong() & ((1L << 60) - 1)))
    val expected = rows.sortBy { case (id, st, h) => (st, h, id) }
      .zipWithIndex.map { case ((id, _, _), p) => id -> p.toLong }.toMap
    for (buckets <- Seq(1, 5, 64)) {
      val got = Shuffle.withStagedPosition(
          rows.toDF("id", "stage", "h").repartition(3), "stage", "h", "id",
          buckets)
        .select("id", "pos").as[(Long, Long)].collect().toMap
      assert(got === expected, s"buckets=$buckets")
    }
  }

  test("duplicate hashes break ties by the tie column") {
    val rows = Seq((5L, 10L), (1L, 10L), (3L, 10L), (2L, 99L))
    val got = Shuffle.withShufflePosition(rows.toDF("id", "h"), "h", "id", 4)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 3L -> 1L, 5L -> 2L, 2L -> 3L))
  }

  test("shards cut equal rowsPerShard blocks in shuffled order") {
    val rows = corpus(130, 13)
    val got = Shuffle.withShards(rows.toDF("id", "h"), "h", "id", 8, 50L)
      .select("pos", "shard").as[(Long, Long)].collect()
    got.foreach { case (pos, shard) => assert(shard === pos / 50L) }
    val sizes = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes === Map(0L -> 50, 1L -> 50, 2L -> 30))
  }

  test("the top-of-range hash value stays inside the last bucket") {
    val rows = Seq((0L, (1L << 60) - 1L), (1L, 0L), (2L, 1L << 59))
    val got = Shuffle.withShufflePosition(rows.toDF("id", "h"), "h", "id", 16)
      .select("id", "pos").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 0L -> 2L))
  }

  test("the corpus-side window is bucket-partitioned, never global") {
    val rows = corpus(64, 17)
    val plan = Shuffle.withShufflePosition(rows.toDF("id", "h"), "h", "id", 8)
      .queryExecution.executedPlan.toString
    // the only unpartitioned window spec may be the bucket-counts
    // frame (ordered by __shuf_bucket); a global rank over raw h would
    // order the whole corpus in one task
    assert(!plan.contains("windowspecdefinition(h#"),
      s"found an unpartitioned corpus window:\n$plan")
  }
}
