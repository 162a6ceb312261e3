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

  test("dot_i64 rejects non-array arguments at analysis") {
    NativeExpressions.register(spark)
    val e = intercept[Exception] {
      Seq((1L, 2L)).toDF("a", "b")
        .select(call_function("dot_i64", col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("dot_i64"))
  }
}
