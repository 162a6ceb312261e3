package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for the 100 TB regime beyond plain shuffle joins.
  *
  *  - [[saltedJoin]]: explicit skew mitigation when one key dominates —
  *    the fact side gets a random salt, the dim side is replicated
  *    across all salt values, so a hot key spreads over `saltFactor`
  *    reducers instead of one straggler task. (Spark's AQE skew-join
  *    handles sort-merge skew adaptively; salting is the explicit tool
  *    for aggregate-into-join pipelines and for engines/configs where
  *    AQE can't see the skew.)
  *  - [[writeBucketed]]: co-locate two fact tables on their join key at
  *    write time; subsequent joins read both sides pre-partitioned and
  *    skip the exchange entirely — the "pay the shuffle once" path for
  *    repeatedly-joined 100 TB tables.
  */
object ScaleJoins {

  /** Salt factor DERIVED from the fact side's measured key skew — the
    * scale-honest replacement for a hard-coded constant, which is
    * wrong in both directions: too small leaves the straggler, too
    * large replicates the dim side for nothing. The histogram is ONE
    * sampled aggregate (map-side-combined to |sampled keys| partial
    * rows); the factor is how many times the hottest key overflows a
    * level task:
    *
    *   factor = ceil(hottest / (total / targetTasks)), clamped to
    *   [1, maxFactor]
    *
    * so an unskewed table derives 1 (salting disabled, no replication
    * cost) and a single-hot-key table derives ~targetTasks. Seeded
    * sampling keeps the derivation reproducible run to run; the
    * sample only needs the hot key's SHARE, not exact counts, so 5 %
    * is plenty at any corpus size where skew matters. */
  def deriveSaltFactor(facts: DataFrame, key: String, targetTasks: Int,
                       sampleFraction: Double = 0.05,
                       maxFactor: Int = 64): Int = {
    require(targetTasks > 0, s"targetTasks must be positive: $targetTasks")
    require(sampleFraction > 0 && sampleFraction <= 1.0,
      s"sampleFraction in (0,1]: $sampleFraction")
    val sampled =
      if (sampleFraction >= 1.0) facts
      else facts.sample(withReplacement = false, sampleFraction, seed = 42L)
    val row = sampled.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("hot"), sum(col("n")).as("total")).head()
    if (row.isNullAt(0)) 1 // empty sample: no skew evidence, don't salt
    else {
      val even = math.max(1L, row.getLong(1) / targetTasks)
      math.max(1, math.min(maxFactor,
        math.ceil(row.getLong(0).toDouble / even).toInt))
    }
  }

  /** [[saltedJoin]] with the factor [[deriveSaltFactor]]d from the
    * fact side (default target: the session's shuffle parallelism). */
  def saltedJoinDerived(facts: DataFrame, dims: DataFrame, key: String,
                        targetTasks: Int = 0): DataFrame = {
    val target = if (targetTasks > 0) targetTasks
      else facts.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    saltedJoin(facts, dims, key, deriveSaltFactor(facts, key, target))
  }

  /** Equi-join `facts ⋈ dims` on `key`, spreading each fact key over
    * `saltFactor` partitions. `dims` must be the small-ish side (it is
    * replicated `saltFactor`×). */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val salted = facts.withColumn("__salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = dims.crossJoin(
      facts.sparkSession.range(saltFactor).select(col("id").cast("int").as("__salt")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Range (interval) join at scale: `points ⋈ intervals` on
    * `key` ∧ `ts ∈ [start, end]`. Spark plans a raw non-equi join as a
    * broadcast-nested-loop — O(|points|·|intervals|) and a driver OOM
    * once the intervals side is big. This is the standard bucketization
    * rewrite: both sides are exploded onto a `bucketMs` time grid
    * (intervals onto every bucket they overlap), the join becomes an
    * EQUI-join on (key, bucket) — hash-shuffled, AQE-skew-splittable —
    * and the exact `BETWEEN` is re-checked as a post-filter. Cost is
    * O(points + intervals·span/bucketMs + matches): pick `bucketMs`
    * near the typical interval length so each interval lands in ~1-2
    * buckets.
    *
    * `points` must carry `key`,`ts_ms`; `intervals` `key`,`start_ms`,
    * `end_ms` (inclusive bounds, epoch millis). Returns matched rows
    * with both sides' columns. */
  def bucketedRangeJoin(points: DataFrame, intervals: DataFrame,
                        bucketMs: Long): DataFrame = {
    // pmod(a, 0) is null (non-ANSI), so a zero bucket width would
    // null every join key and silently return ZERO matches — refuse
    // like every sibling operator's parameter guard
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    def bucket(c: org.apache.spark.sql.Column) =
      graft.ingest.Rotation.longDiv(c, lit(bucketMs))
    val p = points.withColumn("__bucket", bucket(col("ts_ms")))
    val i = intervals.withColumn("__bucket",
      explode(sequence(bucket(col("start_ms")), bucket(col("end_ms")))))
    p.join(i, Seq("key", "__bucket"))
      .filter(col("ts_ms").between(col("start_ms"), col("end_ms")))
      .drop("__bucket")
  }

  /** Persist `df` bucketed+sorted by `key` into `numBuckets` buckets as
    * a managed table, enabling exchange-free sort-merge joins between
    * tables bucketed the same way. */
  def writeBucketed(df: DataFrame, table: String, key: String, numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
