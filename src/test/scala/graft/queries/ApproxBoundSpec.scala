package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSuite}

/** `agg_approx_users` has no hash oracle by design (HLL estimates are
  * engine-specific), so this bounds it instead: at rsd = 0.02 the
  * estimate must land within 3×rsd of the exact distinct count — the
  * standard-error envelope that makes the sketch usable as the 100 TB
  * replacement for the exact-distinct shuffle. */
class ApproxBoundSpec extends SparkSuite {

  test("agg_approx_users is within 3*rsd of the exact distinct count at sf0.01") {
    val d = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("agg_approx_users")(spark, d)
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
}
