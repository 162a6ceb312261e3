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

  test("signBitsQ matches the per-plane intDot definition") {
    val rnd = new scala.util.Random(7)
    val vecs = Seq.tabulate(16)(i =>
      (i.toLong, Seq.fill(8)(rnd.nextInt(2001) - 1000L)))
    val df = vecs.toDF("id", "v")
    val fast = df.select(col("id"),
        array(SimilarityFunctions.signBitsQ(col("v"), 6, 8): _*).as("bits"))
      .as[(Long, Seq[Long])].collect().toMap
    val slow = vecs.map { case (id, v) =>
      id -> (0 until 6).map { j =>
        val d = v.zip(SimilarityFunctions.plane(j, 8)).map { case (x, s) => x * s }.sum
        if (d > 0) 1L else 0L
      }
    }.toMap
    assert(fast === slow)
  }

  test("bandedLshKeysQ: identical vectors share every key; keys are band-prefixed") {
    val v = Seq(0.501f, -0.251f, 0.751f, -0.501f, 0.301f, 0.101f, -0.901f, 0.441f)
    val df = Seq((1L, v), (2L, v)).toDF("id", "v")
    val got = df.select(col("id"),
        SimilarityFunctions.bandedLshKeysQ(
          SimilarityFunctions.quantize(col("v")), 3, 2, 8).as("keys"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === got(2L))
    assert(got(1L).size === 3)
    got(1L).zipWithIndex.foreach { case (k, b) =>
      assert(k.matches(s"$b:[0-3]"), s"key $k not <band>:<2-bit sig>")
    }
  }

  test("recommendedRowsPerBand grows by one when n doubles") {
    assert(SimilarityFunctions.recommendedRowsPerBand(512, 16) === 5)
    assert(SimilarityFunctions.recommendedRowsPerBand(1024, 16) === 6)
    assert(SimilarityFunctions.recommendedRowsPerBand(2048, 16) === 7)
    assert(SimilarityFunctions.recommendedRowsPerBand(10, 16) === 1) // floor
    // exact large powers of two: floating log drifts above k at 2^29,
    // 2^31... — the integer form must not
    assert(SimilarityFunctions.recommendedRowsPerBand(16L << 29, 16) === 29)
    assert(SimilarityFunctions.recommendedRowsPerBand(16L << 31, 16) === 31)
    assert(SimilarityFunctions.recommendedRowsPerBand((16L << 29) + 1, 16) === 30)
  }

  test("banded blocking: candidate pairs stay ~linear when rowsPerBand scales with log n") {
    // The scale contract from the header: doubling n while adding one
    // row per band keeps expected candidates ~n²/2^r → growth ≈ 2×,
    // not the 4× a fixed bucket space gives.
    import org.apache.spark.sql.DataFrame
    val rnd = new scala.util.Random(42)
    def vecs(n: Int) = Seq.tabulate(n)(i =>
      (i.toLong, Seq.fill(64)(rnd.nextFloat() * 2f - 1f)))
    def candidates(df: DataFrame, r: Int): Long = {
      val withK = df.select(col("id"),
        SimilarityFunctions.bandedLshKeysQ(
          SimilarityFunctions.quantize(col("v")), 4, r, 64).as("keys"))
      val bk = withK.select(col("id"), explode(col("keys")).as("k"))
      bk.as("a").join(bk.as("b"),
          col("a.k") === col("b.k") && col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).distinct().count()
    }
    val small = candidates(vecs(256).toDF("id", "v"), 4)
    val big = candidates(vecs(512).toDF("id", "v"), 5)
    assert(small > 0)
    assert(big.toDouble / small < 3.0,
      s"candidates grew ${big.toDouble / small}x (want ~2x): $small -> $big")
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
