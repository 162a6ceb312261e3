package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class NativeExpressionsSpec extends SparkSuite {
  import spark.implicits._

  test("dot_i64 equals the HOF intDot, interpreted and codegen'd") {
    NativeExpressions.register(spark)
    val rnd = new scala.util.Random(17)
    val rows = Seq.tabulate(64)(_ =>
      (Seq.fill(64)(rnd.nextInt(4001) - 2000L), Seq.fill(64)(rnd.nextInt(4001) - 2000L)))
    val df = rows.toDF("a", "b")
    val got = df.select(
        call_function("dot_i64", col("a"), col("b")).as("native"),
        SimilarityFunctions.intDot(col("a"), col("b")).as("hof"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, h) => assert(n === h) }
  }

  test("dot_i64 is null-safe and callable from SQL") {
    NativeExpressions.register(spark)
    Seq((Seq(1L, 2L), Option.empty[Seq[Long]])).toDF("a", "b")
      .createOrReplaceTempView("dot_null_t")
    val r = spark.sql("SELECT dot_i64(a, b) AS d, dot_i64(a, a) AS s FROM dot_null_t")
      .collect().head
    assert(r.isNullAt(0))
    assert(r.getLong(1) === 5L)
  }

  test("dot_i64 participates in whole-stage codegen (no fallback)") {
    NativeExpressions.register(spark)
    // spark.range keeps the project in an executed codegen stage (a
    // local relation would be constant-folded at plan time)
    val df = spark.range(3)
      .select(array(col("id"), col("id") + 1).as("a"),
        array(col("id") + 2, col("id") + 3).as("b"))
      .select(call_function("dot_i64", col("a"), col("b")).as("d"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen
    // stage; a CodegenFallback expression would strip it from Project
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dot_i64"), plan)
    // id=0: [0,1]·[2,3] = 3; id=1: [1,2]·[3,4] = 11; id=2: [2,3]·[4,5] = 23
    assert(df.as[Long].collect().sorted === Array(3L, 11L, 23L))
  }

  test("GraftExtensions injects dot_i64 at session construction") {
    import org.apache.spark.sql.SparkSession
    // spark.sql.extensions is a STATIC conf (read from the SparkContext
    // at first-session build — the cluster deployment path); for an
    // in-process check, withExtensions applies the same injection to a
    // fresh session over the shared context
    val active = SparkSession.getActiveSession
    val default = SparkSession.getDefaultSession
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s2 ne spark, "a fresh session must have been constructed")
      val got = s2.sql("SELECT dot_i64(array(1L, 2L), array(3L, 4L))")
        .collect().head.getLong(0)
      assert(got === 11L)
    } finally {
      active.foreach(SparkSession.setActiveSession)
      default.foreach(SparkSession.setDefaultSession)
    }
  }

  test("hash60_md5 is bit-identical to the conv(substring(md5)) column form") {
    NativeExpressions.register(spark)
    val inputs = Seq("hello", "", "Zürich", "a b c", "é中文", "the quick brown fox",
      "\u0000nul", "🙂 emoji")
    val df = inputs.toDF("s")
    val got = df.select(
        call_function("hash60_md5", col("s").cast("binary")).as("native"),
        TextFunctions.hash60(col("s")).as("conv"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, c) => assert(n === c) }
    assert(got.forall(_._1 >= 0L))
    // and equals the driver-side form
    assert(got.map(_._1).toSeq === inputs.map(TextFunctions.hash60))
  }

  test("hash64_md5 equals the 16-hex-char md5 prefix, band slices mirror the oracle") {
    NativeExpressions.register(spark)
    val inputs = Seq("hello", "", "Zürich", "a b c", "é中文", "🙂 emoji")
    val got = inputs.toDF("s")
      .select(call_function("hash64_md5", col("s").cast("binary")).as("h"))
      .as[Long].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    inputs.zip(got).foreach { case (s, h) =>
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      // full value = first 16 hex chars big-endian (signed ok)
      assert(h === java.lang.Long.parseUnsignedLong(hex.substring(0, 16), 16))
      // band b of the signature reads hex chars 1+4*(3-b)..+4 — the
      // DuckDB oracle's substr(md5(t), 1+4*(3-b), 4) slice
      (0 until 4).foreach { b =>
        val slice = java.lang.Long.parseLong(
          hex.substring(4 * (3 - b), 4 * (3 - b) + 4), 16)
        assert(((h >> (16 * b)) & 0xffffL) === slice, s"band $b of '$s'")
      }
    }
  }

  test("dot_i64 matches intDot's null semantics: length mismatch or null element -> NULL") {
    NativeExpressions.register(spark)
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L, 4L)),          // dense
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L)),              // length mismatch
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](3L, 4L)))        // null element
      .toDF("a", "b")
    val got = df.select(
        call_function("dot_i64", col("a"), col("b")).as("native"),
        SimilarityFunctions.intDot(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1))
    }
    assert(got.head.getLong(0) === 11L)
    assert(got(1).isNullAt(0) && got(2).isNullAt(0))
  }

  test("two dot_i64 calls share one codegen scope without clashing") {
    NativeExpressions.register(spark)
    val df = spark.range(2)
      .select(array(col("id"), col("id") + 1).as("a"),
        array(col("id") + 2, col("id") + 3).as("b"),
        array(col("id") + 4, col("id") + 5).as("c"))
      .select(call_function("dot_i64", col("a"), col("b")).as("x"),
        call_function("dot_i64", col("a"), col("c")).as("y"))
    import org.apache.spark.sql.Row
    assert(df.collect().toSeq === Seq(Row(3L, 5L), Row(11L, 17L)))
  }

  test("dot_i64 rejects non-array arguments at analysis") {
    NativeExpressions.register(spark)
    val e = intercept[Exception] {
      Seq((1L, 2L)).toDF("a", "b")
        .select(call_function("dot_i64", col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("dot_i64"))
  }

  private def bloomBytesOf(items: Seq[Long], fpp: Double = 0.01): Array[Byte] = {
    val bf = org.apache.spark.util.sketch.BloomFilter.create(items.size.toLong, fpp)
    items.foreach(bf.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  test("bloom_might_contain_long: no false negatives; fp rate bounded") {
    NativeExpressions.register(spark)
    val rnd = new scala.util.Random(41)
    val members = Seq.fill(500)(rnd.nextLong()).distinct
    val bytes = bloomBytesOf(members, fpp = 0.01)
    val memberSet = members.toSet
    // disjoint probe population 20x the member count
    val probes = Iterator.continually(rnd.nextLong())
      .filterNot(memberSet).take(10000).toSeq
    val hits = (members ++ probes).toDF("x")
      .filter(call_function("bloom_might_contain_long", lit(bytes), col("x")))
      .as[Long].collect().toSet
    assert(members.forall(hits), "bloom dropped a true member")
    val fps = hits.size - members.size
    assert(fps <= 300, s"false-positive count $fps way above the 1% target")
  }

  test("bloom_might_contain_long survives codegen with a referenced filter (no per-row parse)") {
    NativeExpressions.register(spark)
    val bytes = bloomBytesOf(Seq(3L, 5L))
    val df = spark.range(8)
      .select(call_function("bloom_might_contain_long",
        lit(bytes), col("id")).as("hit"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    val got = spark.range(8).toDF("id")
      .filter(call_function("bloom_might_contain_long", lit(bytes), col("id")))
      .as[Long].collect().toSet
    assert(Set(3L, 5L).subsetOf(got))
    assert(got.size < 8) // a 2-item sketch must not read as all-true
  }

  test("bloom_might_contain_long null semantics and analysis checks") {
    NativeExpressions.register(spark)
    val bytes = bloomBytesOf(Seq(1L))
    // null value -> null; null filter -> null
    val r = Seq((Option(1L), Option.empty[Long])).toDF("a", "b")
      .select(
        call_function("bloom_might_contain_long", lit(bytes), col("b")).as("nv"),
        call_function("bloom_might_contain_long",
          lit(null).cast("binary"), col("a")).as("nf"),
        call_function("bloom_might_contain_long", lit(bytes), col("a")).as("hit"))
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.getBoolean(2))
    // non-constant filter argument rejected at analysis
    val e = intercept[Exception] {
      Seq((Array[Byte](1), 2L)).toDF("f", "x")
        .select(call_function("bloom_might_contain_long", col("f"), col("x")))
        .collect()
    }
    assert(e.getMessage.contains("bloom_might_contain_long"))
  }

  test("nearest_cells_i64: sorted (d2 ASC, cell ASC) table, ties to the lower id") {
    NativeExpressions.register(spark)
    import spark.implicits._
    // centroids: 10 at (0,0), 20 at (3,4) [normSq 25], 30 at (0,0)
    // duplicate of 10 — the tie must order 10 before 30
    val df = Seq((1L, Seq(0L, 0L))).toDF("id", "v")
      .select(col("id"), call_function("nearest_cells_i64", col("v"),
        typedlit(Seq(Seq(0L, 0L), Seq(3L, 4L), Seq(0L, 0L))),
        typedlit(Seq(10L, 20L, 30L)),
        typedlit(Seq(0L, 25L, 0L))).as("t"))
    val rows = df.select(explode(col("t")).as("e"))
      .select(col("e.d2"), col("e.cell")).as[(Long, Long)].collect().toSeq
    assert(rows === Seq((0L, 10L), (0L, 30L), (25L, 20L)))
  }

  test("nearest_cells_i64: null vector/element and dim mismatch yield NULL, never a throw") {
    NativeExpressions.register(spark)
    import spark.implicits._
    val cents = typedlit(Seq(Seq(1L, 1L)))
    val ids = typedlit(Seq(5L)); val norms = typedlit(Seq(2L))
    val df = Seq(
      (1L, Some(Seq(Some(1L), Some(2L)))),  // clean
      (2L, None),                           // null vector
      (3L, Some(Seq(Some(1L), None))),      // null element
      (4L, Some(Seq(Some(1L))))             // dim mismatch vs 2-dim centroid
    ).toDF("id", "v")
      .select(col("id"),
        call_function("nearest_cells_i64", col("v"), cents, ids, norms).as("t"))
    val got = df.select(col("id"), col("t").isNull.as("n"))
      .as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
  }

  test("nearest_cells_i64 refuses a non-foldable centroid table at analysis") {
    NativeExpressions.register(spark)
    import spark.implicits._
    val df = Seq((1L, Seq(1L, 2L))).toDF("id", "v")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("nearest_cells_i64", col("v"),
        array(col("v")), typedlit(Seq(1L)), typedlit(Seq(0L)))).collect()
    }
  }

  test("nearest_cells_i64 refuses a ragged quantizer at analysis, not mid-job") {
    NativeExpressions.register(spark)
    import spark.implicits._
    val df = Seq((1L, Seq(1L, 2L))).toDF("id", "v")
    // 2 centroids but only 1 id: without the analysis-time length
    // check this AIOOBEs inside the codegen'd loop on the first row
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("nearest_cells_i64", col("v"),
        typedlit(Seq(Seq(1L, 2L), Seq(3L, 4L))),
        typedlit(Seq(10L)), typedlit(Seq(5L, 25L)))).collect()
    }
    // a null inner centroid vector refuses too
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("nearest_cells_i64", col("v"),
        typedlit(Seq(Some(Seq(1L, 2L)), None)),
        typedlit(Seq(10L, 20L)), typedlit(Seq(5L, 25L)))).collect()
    }
  }
}
