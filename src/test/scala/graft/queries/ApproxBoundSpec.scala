package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** The raw HLL estimate is engine-specific, so `agg_approx_users`'
  * registry output is the accuracy FLAG (oracle-checkable); this spec
  * keeps the raw-estimate path bounded directly: at rsd = 0.02 the
  * estimate must land within 3×rsd of the exact distinct count — the
  * standard-error envelope that makes the sketch usable as the 100 TB
  * replacement for the exact-distinct shuffle. */
class ApproxBoundSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.01"

  test("the raw HLL estimate is within 3*rsd of exact distinct at sf0.01") {
    import graft.tables.Tables
    val approx = Tables.events(spark, d).groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
    val exact = SparkEntry.queries("agg_distinct_users")(spark, d)
      .select(col("event_type"), col("n_users"))
    val joined = approx.join(exact, Seq("event_type"))
      .select(col("event_type"), col("approx_users"), col("n_users"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val est = r.getAs[Long]("approx_users").toDouble
      val ex = r.getAs[Long]("n_users").toDouble
      val relErr = math.abs(est - ex) / ex
      assert(relErr <= 0.06,
        s"${r.getAs[String]("event_type")}: approx=$est exact=$ex relErr=$relErr > 3*rsd")
    }
  }

  test("agg_approx_users certifies the bound per group (all approx_ok)") {
    val rows = SparkEntry.queries("agg_approx_users")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("approx_ok"),
      s"${r.getAs[String]("event_type")} estimate broke the 3*rsd bound"))
  }
}
