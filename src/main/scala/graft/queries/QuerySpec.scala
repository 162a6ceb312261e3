package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a DataFrame program over the testdata
  * tables plus (when SQL-expressible) an equivalent DuckDB oracle.
  * Column names and row order must match between the two — the driver
  * sorts columns by name and hash-compares values.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** include in the per-round Bench headline set */
    bench: Boolean = false)

/** DuckDB fragment builders shared by the query files — each mirrors a
  * Spark-side primitive in `graft.functions` exactly (same hash, same
  * tokenization, same shingle construction), which is what keeps the
  * oracles lockstep with the plans they check. */
private[queries] object OracleSql {

  /** Mirror of `TextFunctions.hash60`. */
  def h60(x: String): String = s"(('0x' || substr(md5($x), 1, 15))::BIGINT)"

  /** Mirror of `TextFunctions.tokens`. */
  def toksSql(t: String): String =
    s"list_filter(string_split_regex(trim(lower($t)), '\\s+'), t -> len(t) > 0)"

  /** Mirror of `TextFunctions.shingles` over a `toks` column
    * (1-based list indexing). */
  def shinglesSql(n: Int): String = {
    val parts = (0 until n).map(k => s"toks[j + $k]").mkString(", ")
    s"CASE WHEN len(toks) >= $n THEN " +
      s"list_transform(range(1, len(toks) - ${n - 2}), j -> concat_ws(' ', $parts)) " +
      "ELSE []::VARCHAR[] END"
  }
}

/** Session-lifetime cache ledger for query-built frames. A QuerySpec
  * lambda returns a LAZY DataFrame (plan pins inspect it unexecuted),
  * so a frame it persists for multi-consumer reuse cannot be released
  * inside the lambda — the harness calls [[releaseAll]] AFTER
  * materializing each query, closing what would otherwise leak cache
  * blocks into a long-lived session. Eagerly-materializing builders
  * (connected components) still release early via [[release]];
  * double-release is a no-op. */
object TrackedCache {
  private val frames =
    scala.collection.mutable.Buffer.empty[org.apache.spark.sql.DataFrame]
  def persist(df: DataFrame): DataFrame = synchronized { frames += df; df.persist() }
  def release(df: DataFrame): Unit = synchronized {
    df.unpersist()
    frames -= df
    ()
  }
  def releaseAll(): Unit = synchronized {
    frames.foreach(_.unpersist())
    frames.clear()
  }
}

object QuerySpec {
  /** The derived "Kafka stream at rest" view of the `events` table:
    * topic/partition/offset columns synthesized deterministically so
    * ingestion-operator demos (partitioning, rotation, filenames) have
    * the reference's envelope (FIXTURES.md §1.6). Mirrored in every
    * oracle as `event_id % 4` / `event_id`.
    */
  val StreamPartitions = 4
}
