package graft.schema

import org.apache.spark.sql.types._

import graft.SparkSuite

/** Compatibility-mode vectors from `schema/SchemaUtils.java:38-61` and
  * the BACKWARD/FORWARD/NONE behaviors of
  * `avro/DataWriterAvroTest.java:268-353`. */
class SchemaEvolutionSpec extends SparkSuite {
  import spark.implicits._

  private val v1 = VersionedSchema(1, StructType(Seq(
    StructField("a", LongType), StructField("b", StringType))))
  private val v2 = VersionedSchema(2, StructType(Seq(
    StructField("a", LongType), StructField("b", StringType),
    StructField("c", DoubleType))))
  private val v1Renamed = VersionedSchema(1, StructType(Seq(
    StructField("a", LongType), StructField("z", StringType))))

  test("first schema always adopted") {
    assert(SchemaEvolution.shouldChangeSchema(v1, None, Compatibility.Backward))
  }

  test("BACKWARD/FULL adopt only newer versions") {
    for (c <- Seq(Compatibility.Backward, Compatibility.Full)) {
      assert(SchemaEvolution.shouldChangeSchema(v2, Some(v1), c))
      assert(!SchemaEvolution.shouldChangeSchema(v1, Some(v2), c))
      assert(!SchemaEvolution.shouldChangeSchema(v1, Some(v1), c))
    }
  }

  test("FORWARD adopts only older versions") {
    assert(SchemaEvolution.shouldChangeSchema(v1, Some(v2), Compatibility.Forward))
    assert(!SchemaEvolution.shouldChangeSchema(v2, Some(v1), Compatibility.Forward))
  }

  test("NONE rotates on any structural inequality regardless of version") {
    assert(SchemaEvolution.shouldChangeSchema(v1Renamed, Some(v1), Compatibility.None))
    assert(!SchemaEvolution.shouldChangeSchema(v1, Some(v1), Compatibility.None))
  }

  test("fromString parses all modes, rejects junk") {
    assert(Compatibility.fromString("backward") === Compatibility.Backward)
    assert(Compatibility.fromString("FULL") === Compatibility.Full)
    intercept[IllegalArgumentException](Compatibility.fromString("sideways"))
  }

  test("project pads missing nullable fields, drops extras, casts") {
    val df = Seq((1, "x", 9.9)).toDF("a", "b", "extra")
    val target = StructType(Seq(
      StructField("a", LongType),          // upcast int -> long
      StructField("b", StringType),
      StructField("c", DoubleType)))       // missing, nullable -> null
    val out = SchemaEvolution.project(df, target)
    assert(out.schema.fieldNames.toSeq === Seq("a", "b", "c"))
    assert(out.schema("a").dataType === LongType)
    assert(out.as[(Long, String, Option[Double])].head() === ((1L, "x", None)))
  }

  test("project applies defaults for missing fields") {
    val df = Seq(Tuple1(5L)).toDF("a")
    val target = StructType(Seq(
      StructField("a", LongType),
      StructField("sev", IntegerType, nullable = false)))
    val out = SchemaEvolution.project(df, target, defaults = Map("sev" -> 7))
    assert(out.as[(Long, Int)].head() === ((5L, 7)))
  }

  test("missing non-nullable field without default throws (reference parity)") {
    val df = Seq(Tuple1(5L)).toDF("a")
    val target = StructType(Seq(
      StructField("a", LongType),
      StructField("req", StringType, nullable = false)))
    intercept[SchemaEvolution.SchemaProjectionException] {
      SchemaEvolution.project(df, target)
    }
  }

  test("project matches source columns case-insensitively (analyzer default)") {
    val df = Seq((1L, "x")).toDF("UserId", "B")
    val target = StructType(Seq(
      StructField("userid", LongType), StructField("b", StringType)))
    assert(SchemaEvolution.project(df, target)
      .as[(Long, String)].head() === ((1L, "x")))
  }

  test("case-insensitive lowering refuses a source with case-colliding columns") {
    val source = StructType(Seq(
      StructField("UserId", LongType), StructField("userid", LongType)))
    val target = StructType(Seq(StructField("userid", LongType)))
    val e = intercept[IllegalArgumentException] {
      SchemaEvolution.projectionTo(source, target)
    }
    assert(e.getMessage.contains("collide"))
  }

  test("unreferenced case collisions don't block the projection") {
    // the analyzer raises AMBIGUOUS_REFERENCE only when the ambiguous
    // name is actually resolved: {UserId, userid, other} -> {other}
    // is legal and must stay legal
    val df = Seq((1L, 2L, "x")).toDF("UserId", "userid", "other")
    val target = StructType(Seq(StructField("other", StringType)))
    assert(SchemaEvolution.project(df, target).as[String].head() === "x")
  }

  test("project honors spark.sql.caseSensitive=true sessions") {
    val prev = spark.conf.get("spark.sql.caseSensitive")
    spark.conf.set("spark.sql.caseSensitive", "true")
    try {
      // a case-sensitive analyzer treats UserId and userid as distinct:
      // the target field is MISSING (nullable -> null-filled), and two
      // source columns differing only in case are NOT a collision
      val df = Seq((1L, 2L)).toDF("UserId", "userid")
      val target = StructType(Seq(
        StructField("userid", LongType), StructField("USERID", LongType)))
      val out = SchemaEvolution.project(df, target)
      assert(out.as[(Option[Long], Option[Long])].head() ===
        ((Some(2L), None)))
    } finally spark.conf.set("spark.sql.caseSensitive", prev)
  }
}
