package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SimilarityFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("dot, norm, cosine on known vectors") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val (d, n, c) = df.select(
      SimilarityFunctions.dot(col("a"), col("b")),
      SimilarityFunctions.norm(col("a")),
      SimilarityFunctions.cosine(col("a"), col("b"))).as[(Double, Double, Double)].head()
    assert(d === 32.0)
    assert(math.abs(n - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(c - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
  }

  test("quantize floors toward negative infinity (floor, not truncate)") {
    val df = Seq(Tuple1(Seq(0.0015f, -0.0015f, 1.0f))).toDF("v")
    val got = df.select(SimilarityFunctions.quantize(col("v"), 1000))
      .as[Seq[Long]].head()
    assert(got === Seq(1L, -2L, 1000L))
  }

  test("intDot on quantized vectors is exact") {
    val df = Seq((Seq(2L, -3L, 4L), Seq(5L, 7L, -1L))).toDF("a", "b")
    val got = df.select(SimilarityFunctions.intDot(col("a"), col("b"))).as[Long].head()
    assert(got === 2L * 5 + -3L * 7 + 4L * -1)
  }

  test("hyperplanes are deterministic ±1 and stable across calls") {
    val p1 = SimilarityFunctions.plane(3, 16)
    val p2 = SimilarityFunctions.plane(3, 16)
    assert(p1 === p2)
    assert(p1.forall(x => x == 1 || x == -1))
    assert(SimilarityFunctions.plane(4, 16) !== p1)
  }

  test("lshBucketQ buckets identical vectors together, fits numPlanes bits") {
    // 5 dims with odd quantized values: a ±1-plane dot of 5 odd terms is
    // odd, hence never 0, so the opposite vector flips every sign bit.
    val v = Seq(0.501f, -0.251f, 0.751f, -0.501f, 0.301f)
    val df = Seq((1L, v), (2L, v), (3L, v.map(-_))).toDF("id", "v")
    val got = df.select(col("id"),
        SimilarityFunctions.lshBucketQ(
          SimilarityFunctions.quantize(col("v")), 6, 5).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === got(2L))
    assert(got.values.forall(b => b >= 0 && b < 64))
    // exact opposite vector lands in the complementary bucket
    assert(got(3L) === (~got(1L) & 63))
  }
}
