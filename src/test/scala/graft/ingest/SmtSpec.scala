package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.streaming.StreamIngest

/** Single Message Transforms: parser validation, per-transform
  * semantics (mirroring Connect's documented behavior), and the chain
  * running through both streaming planes. */
class SmtSpec extends SparkSuite {
  import spark.implicits._

  private def parse(props: (String, String)*) =
    Smt.parse(props.toMap, tsField = "timestamp")

  test("parser: undeclared alias, bad type, missing params, reserved columns") {
    val Left(e1) = parse("transforms.x.type" -> "MaskField",
      "transforms.x.fields" -> "a")
    assert(e1.exists(_.contains("'x' is not declared")))

    val Left(e2) = parse("transforms" -> "t",
      "transforms.t.type" -> "HoistField")
    assert(e2.exists(_.contains("unknown")))

    val Left(e3) = parse("transforms" -> "t",
      "transforms.t.type" -> "InsertField")
    assert(e3.exists(_.contains("requires static.field")))

    val Left(e4) = parse("transforms" -> "t",
      "transforms.t.type" -> "MaskField",
      "transforms.t.fields" -> "off")
    assert(e4.exists(_.contains("stream envelope")))

    val Left(e5) = parse("transforms" -> "t",
      "transforms.t.type" -> "RegexRouter",
      "transforms.t.regex" -> "(unclosed",
      "transforms.t.replacement" -> "x")
    assert(e5.exists(_.contains("invalid regex")))

    val Left(e6) = parse("transforms" -> "t",
      "transforms.t.type" -> "MaskField",
      "transforms.t.fields" -> "a",
      "transforms.t.regex" -> "oops")
    assert(e6.exists(_.contains("not a MaskField parameter")))
  }

  test("parser: a valid chain comes back in declared order") {
    val Right(chain) = parse("transforms" -> "route, mask",
      "transforms.route.type" -> "RegexRouter",
      "transforms.route.regex" -> "(.*)-v1",
      "transforms.route.replacement" -> "$1",
      "transforms.mask.type" -> "MaskField",
      "transforms.mask.fields" -> "secret")
    assert(chain.map(_.alias) === Seq("route", "mask"))
    assert(chain.head.routesTopic && !chain(1).routesTopic)
  }

  test("field transforms: insert, replace (rename+exclude), mask") {
    val df = Seq((0L, 1L, "x", "s3cret", 9L))
      .toDF("part", "off", "payload", "secret", "n")
    val Right(chain) = parse("transforms" -> "ins, rep, mask",
      "transforms.ins.type" -> "InsertField",
      "transforms.ins.static.field" -> "origin",
      "transforms.ins.static.value" -> "cdc",
      "transforms.rep.type" -> "ReplaceField",
      "transforms.rep.renames" -> "payload:body",
      "transforms.rep.exclude" -> "n",
      "transforms.mask.type" -> "MaskField",
      "transforms.mask.fields" -> "secret")
    val out = chain.foldLeft(df)((d, t) => t.apply(d))
    assert(out.columns.toSeq ===
      Seq("part", "off", "body", "secret", "origin"))
    val r = out.head()
    assert(r.getAs[String]("origin") === "cdc")
    assert(r.getAs[String]("body") === "x")
    // Connect's MaskField masks to the type's ZERO value, not NULL —
    // downstream non-null assumptions keep holding
    assert(r.getAs[String]("secret") === "")
  }

  test("MaskField zero values follow the field type (Connect's primitive mapping)") {
    val df = Seq(("s", 7L, 1.5, true))
      .toDF("str", "num", "dbl", "flag")
    val Right(Seq(m)) = parse("transforms" -> "m",
      "transforms.m.type" -> "MaskField",
      "transforms.m.fields" -> "str, num, dbl, flag")
    val r = m.apply(df).head()
    assert(r.getAs[String]("str") === "")
    assert(r.getAs[Long]("num") === 0L)
    assert(r.getAs[Double]("dbl") === 0.0)
    assert(r.getAs[Boolean]("flag") === false)

    // non-primitive columns refuse masking, like Connect's DataException
    val arr = Seq((Seq(1, 2), 0L)).toDF("xs", "n")
    val e = intercept[IllegalArgumentException] { m.apply(arr.withColumnRenamed("xs", "str")) }
    assert(e.getMessage.contains("not supported"))
  }

  test("RegexRouter: whole-topic match with groups; non-matches pass through") {
    val df = Seq(("orders-v1", 0L, 0L), ("audit", 0L, 1L))
      .toDF("topic", "part", "off")
    val Right(Seq(r)) = parse("transforms" -> "r",
      "transforms.r.type" -> "RegexRouter",
      "transforms.r.regex" -> "(.*)-v1",
      "transforms.r.replacement" -> "$1")
    val topics = r.apply(df).select(col("off"), col("topic"))
      .as[(Long, String)].collect().toMap
    assert(topics === Map(0L -> "orders", 1L -> "audit"))
  }

  test("TimestampRouter renders ${topic} and ${timestamp} from RECORD time") {
    val df = Seq(("ev", 0L, 0L,
        java.sql.Timestamp.valueOf("2026-03-01 10:30:00")))
      .toDF("topic", "part", "off", "timestamp")
    val Right(Seq(r)) = parse("transforms" -> "t",
      "transforms.t.type" -> "TimestampRouter",
      "transforms.t.topic.format" -> "${topic}-${timestamp}",
      "transforms.t.timestamp.format" -> "yyyyMMdd")
    assert(r.apply(df).select(col("topic")).as[String].head() ===
      "ev-20260301")
  }

  test("time-rendering transforms pin UTC under a non-UTC session (Connect parity)") {
    // Connect's TimestampRouter/TimestampConverter hardcode UTC; a
    // session-zone render would route/convert the same record
    // differently on differently-configured clusters
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      // 02:00Z on the 16th is 18:00 PDT on the 15th — the render must
      // still say 16th
      val df = Seq(("ev", 0L, 0L,
          new java.sql.Timestamp(1786845600000L))) // 2026-08-16T02:00:00Z
        .toDF("topic", "part", "off", "timestamp")
      val Right(Seq(router)) = parse("transforms" -> "t",
        "transforms.t.type" -> "TimestampRouter",
        "transforms.t.timestamp.format" -> "yyyyMMdd")
      assert(router.apply(df).select(col("topic")).as[String].head() ===
        "ev-20260816")
      // Date target: UTC calendar date, not the session's
      val Right(Seq(conv)) = parse("transforms" -> "c",
        "transforms.c.type" -> "TimestampConverter",
        "transforms.c.field" -> "timestamp",
        "transforms.c.target.type" -> "Date")
      assert(conv.apply(df).select(col("timestamp").cast("string"))
        .as[String].head() === "2026-08-16")
      // string source parses as a UTC wall clock
      val sdf = Seq(("ev", 0L, 0L, "2026-08-16 02:00:00"))
        .toDF("topic", "part", "off", "ts_str")
      val Right(Seq(p)) = parse("transforms" -> "c",
        "transforms.c.type" -> "TimestampConverter",
        "transforms.c.field" -> "ts_str",
        "transforms.c.target.type" -> "unix",
        "transforms.c.format" -> "yyyy-MM-dd HH:mm:ss")
      assert(p.apply(sdf).select(col("ts_str")).as[Long].head() ===
        1786845600000L)
      // date mask zero is epoch DAY 0, not the session-shifted instant
      val mdf = Seq(("ev", 0L, 0L, java.sql.Date.valueOf("2024-05-05")))
        .toDF("topic", "part", "off", "d")
      val Right(Seq(m)) = parse("transforms" -> "m",
        "transforms.m.type" -> "MaskField",
        "transforms.m.fields" -> "d")
      assert(m.apply(mdf).select(col("d").cast("string")).as[String]
        .head() === "1970-01-01")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("wall→instant reads are exact inside the session zone's fall-back hour") {
    // 2026-11-01 09:30Z lands on the LA wall clock's REPEATED 01:30
    // (PST side). A bridge that round-trips through the session zone
    // resolves that ambiguous wall to the PDT offset and comes back
    // at 08:30Z — one hour off; the epoch-arithmetic bridge never
    // consults the session zone at all.
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val sdf = Seq(
          ("ev", 0L, 0L, "2026-11-01 09:30:00"),  // repeated-hour PST side
          ("ev", 0L, 1L, "2026-11-01 08:30:00"))  // repeated-hour PDT side
        .toDF("topic", "part", "off", "ts_str")
      val Right(Seq(p)) = parse("transforms" -> "c",
        "transforms.c.type" -> "TimestampConverter",
        "transforms.c.field" -> "ts_str",
        "transforms.c.target.type" -> "unix",
        "transforms.c.format" -> "yyyy-MM-dd HH:mm:ss")
      val got = p.apply(sdf).select(col("off"), col("ts_str"))
        .as[(Long, Long)].collect().toMap
      assert(got === Map(0L -> 1793525400000L, 1L -> 1793521800000L))
      // sub-second fraction survives the arithmetic (string target,
      // rendered back in UTC)
      val fdf = Seq(("ev", 0L, 0L, "2026-11-01 09:30:00.123"))
        .toDF("topic", "part", "off", "ts_str")
      val Right(Seq(f)) = parse("transforms" -> "f",
        "transforms.f.type" -> "TimestampConverter",
        "transforms.f.field" -> "ts_str",
        "transforms.f.target.type" -> "string",
        "transforms.f.format" -> "yyyy-MM-dd HH:mm:ss.SSS")
      assert(f.apply(fdf).select(col("ts_str")).as[String].head() ===
        "2026-11-01 09:30:00.123")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("RecordIsTombstone tests the value column alone on the Kafka envelope") {
    val df = Seq(
      ("t", 0L, 0L, new java.sql.Timestamp(0L), "k1", null: String),
      ("t", 0L, 1L, new java.sql.Timestamp(0L), "k2", "payload"))
      .toDF("topic", "part", "off", "ts", "key", "value")
    val pred = SmtPredicate.RecordIsTombstone("p")
    // a real tombstone carries non-null ts/key — the predicate must
    // still fire (Connect tests record.value() == null and nothing
    // else)
    val got = df.select(col("off"), pred.test(df).as("tomb"))
      .as[(Long, Boolean)].collect().toMap
    assert(got === Map(0L -> true, 1L -> false))
  }

  test("TimestampRouter: Connect defaults apply; null record time errors; bad pattern rejected") {
    // defaults: topic.format=${topic}-${timestamp}, timestamp.format=yyyyMMdd
    val df = Seq(("ev", 0L, 0L,
        java.sql.Timestamp.valueOf("2026-03-01 10:30:00")))
      .toDF("topic", "part", "off", "timestamp")
    val Right(Seq(r)) = parse("transforms" -> "t",
      "transforms.t.type" -> "TimestampRouter")
    assert(r.apply(df).select(col("topic")).as[String].head() ===
      "ev-20260301")

    // a null record time raises (Connect throws on a missing record
    // timestamp) instead of silently routing to a NULL topic
    val withNull = Seq(("ev", 0L, 0L,
        null.asInstanceOf[java.sql.Timestamp]))
      .toDF("topic", "part", "off", "timestamp")
    val e = intercept[Exception] {
      r.apply(withNull).select(col("topic")).as[String].head()
    }
    assert(e.getMessage.contains("null record time") ||
      Option(e.getCause).exists(_.getMessage.contains("null record time")))

    // week-year 'Y' is legal SimpleDateFormat but not a Spark pattern —
    // rejected at parse, not mid-stream
    val Left(errs) = parse("transforms" -> "t",
      "transforms.t.type" -> "TimestampRouter",
      "transforms.t.timestamp.format" -> "YYYYMMdd")
    assert(errs.exists(_.contains("not a valid Spark datetime pattern")))

    // the router's record-time field is reserved chain-wide: masking
    // it would misroute every record after the mask
    val Left(errs2) = parse("transforms" -> "m, t",
      "transforms.m.type" -> "MaskField",
      "transforms.m.fields" -> "timestamp",
      "transforms.t.type" -> "TimestampRouter")
    assert(errs2.exists(_.contains("read by the TimestampRouter")))
  }

  test("Cast: per-field spec casts; whole-value and unknown types rejected") {
    val df = Seq(("41", 1L, 2.9)).toDF("s", "n", "d")
    val Right(Seq(c)) = parse("transforms" -> "c",
      "transforms.c.type" -> "Cast",
      "transforms.c.spec" -> "s:int32, n:string, d:int64")
    val out = c.apply(df)
    assert(out.schema("s").dataType.simpleString === "int")
    assert(out.schema("n").dataType.simpleString === "string")
    val r = out.head()
    assert(r.getAs[Int]("s") === 41)
    assert(r.getAs[String]("n") === "1")
    assert(r.getAs[Long]("d") === 2L) // cast truncates, like Connect

    val Left(e1) = parse("transforms" -> "c",
      "transforms.c.type" -> "Cast", "transforms.c.spec" -> "int64")
    assert(e1.exists(_.contains("must be field:type")))
    val Left(e2) = parse("transforms" -> "c",
      "transforms.c.type" -> "Cast", "transforms.c.spec" -> "s:varchar")
    assert(e2.exists(_.contains("unknown type 'varchar'")))
    val Left(e3) = parse("transforms" -> "c",
      "transforms.c.type" -> "Cast", "transforms.c.spec" -> "off:string")
    assert(e3.exists(_.contains("stream envelope")))
  }

  test("ExtractField: struct expands to its subfields, primitive stays one column") {
    val df = Seq((0L, 1L, ("alice", 30), "noise"))
      .toDF("part", "off", "user", "extra")
      .withColumn("user", col("user").cast("struct<name:string,age:int>"))
    val Right(Seq(x)) = parse("transforms" -> "x",
      "transforms.x.type" -> "ExtractField",
      "transforms.x.field" -> "user")
    val out = x.apply(df)
    assert(out.columns.toSeq === Seq("part", "off", "name", "age"))
    assert(out.select(col("name")).as[String].head() === "alice")

    val Right(Seq(x2)) = parse("transforms" -> "x",
      "transforms.x.type" -> "ExtractField",
      "transforms.x.field" -> "extra")
    assert(x2.apply(df).columns.toSeq === Seq("part", "off", "extra"))
  }

  test("Flatten hoists nested structs with the configured delimiter") {
    val df = Seq((0L, (("a", 1), "z")))
      .toDF("off", "rec")
      .withColumn("rec", col("rec")
        .cast("struct<inner:struct<s:string,n:int>,tag:string>"))
    val Right(Seq(f)) = parse("transforms" -> "f",
      "transforms.f.type" -> "Flatten",
      "transforms.f.delimiter" -> "_")
    val out = f.apply(df)
    assert(out.columns.toSeq === Seq("off", "rec_inner_s", "rec_inner_n", "rec_tag"))
    assert(out.select(col("rec_inner_n")).as[Int].head() === 1)

    // default delimiter is Connect's '.'
    val Right(Seq(fDot)) = parse("transforms" -> "f",
      "transforms.f.type" -> "Flatten")
    assert(fDot.apply(df).columns.toSeq ===
      Seq("off", "rec.inner.s", "rec.inner.n", "rec.tag"))
  }

  test("TimestampConverter: string/unix/Date/Timestamp conversions by source type") {
    val ts = java.sql.Timestamp.valueOf("2026-03-01 10:30:00")
    val df = Seq((ts, "2026-03-01 10:30:00", ts.getTime))
      .toDF("t", "s", "ms")

    def conv(field: String, extra: (String, String)*) = {
      val Right(Seq(c)) = parse(Seq("transforms" -> "c",
        "transforms.c.type" -> "TimestampConverter",
        "transforms.c.field" -> field) ++ extra: _*)
      c.apply(df)
    }

    // timestamp → string via format
    assert(conv("t", "transforms.c.target.type" -> "string",
        "transforms.c.format" -> "yyyy-MM-dd")
      .select(col("t")).as[String].head() === "2026-03-01")
    // string → Timestamp via format
    assert(conv("s", "transforms.c.target.type" -> "Timestamp",
        "transforms.c.format" -> "yyyy-MM-dd HH:mm:ss")
      .select(col("s")).as[java.sql.Timestamp].head() === ts)
    // epoch millis → Timestamp; timestamp → unix millis round-trip
    assert(conv("ms", "transforms.c.target.type" -> "Timestamp")
      .select(col("ms")).as[java.sql.Timestamp].head() === ts)
    assert(conv("t", "transforms.c.target.type" -> "unix")
      .select(col("t")).as[Long].head() === ts.getTime)
    // seconds precision
    assert(conv("t", "transforms.c.target.type" -> "unix",
        "transforms.c.unix.precision" -> "seconds")
      .select(col("t")).as[Long].head() === ts.getTime / 1000)
    // timestamp → Date
    assert(conv("t", "transforms.c.target.type" -> "Date")
      .select(col("t")).as[java.sql.Date].head().toString === "2026-03-01")

    val Left(e1) = parse("transforms" -> "c",
      "transforms.c.type" -> "TimestampConverter",
      "transforms.c.field" -> "t",
      "transforms.c.target.type" -> "string")
    assert(e1.exists(_.contains("requires format")))
    val Left(e2) = parse("transforms" -> "c",
      "transforms.c.type" -> "TimestampConverter",
      "transforms.c.field" -> "t",
      "transforms.c.target.type" -> "Time")
    assert(e2.exists(_.contains("has no Spark type")))
  }

  test("predicates: TopicNameMatches gates a transform; negate flips it") {
    val df = Seq(("orders", 0L, 0L, "alice"), ("audit", 0L, 1L, "bob"))
      .toDF("topic", "part", "off", "pii")
    val Right(Seq(m)) = parse("transforms" -> "m",
      "transforms.m.type" -> "MaskField",
      "transforms.m.fields" -> "pii",
      "transforms.m.predicate" -> "isOrders",
      "predicates" -> "isOrders",
      "predicates.isOrders.type" -> "TopicNameMatches",
      "predicates.isOrders.pattern" -> "orders")
    val out = m.apply(df).select(col("topic"), col("pii"))
      .as[(String, String)].collect().toMap
    assert(out === Map("orders" -> "", "audit" -> "bob"))

    val Right(Seq(mNeg)) = parse("transforms" -> "m",
      "transforms.m.type" -> "MaskField",
      "transforms.m.fields" -> "pii",
      "transforms.m.predicate" -> "isOrders",
      "transforms.m.negate" -> "true",
      "predicates" -> "isOrders",
      "predicates.isOrders.type" -> "TopicNameMatches",
      "predicates.isOrders.pattern" -> "orders")
    val outNeg = mNeg.apply(df).select(col("topic"), col("pii"))
      .as[(String, String)].collect().toMap
    assert(outNeg === Map("orders" -> "alice", "audit" -> ""))
  }

  test("predicates: RecordIsTombstone sees all-null payloads; gated router only reroutes tombstones") {
    val df = Seq(("ev", 0L, 0L, Some("x")), ("ev", 0L, 1L, scala.None))
      .toDF("topic", "part", "off", "body")
    val Right(Seq(r)) = parse("transforms" -> "r",
      "transforms.r.type" -> "RegexRouter",
      "transforms.r.regex" -> "(.*)",
      "transforms.r.replacement" -> "$1.tombstones",
      "transforms.r.predicate" -> "tomb",
      "predicates" -> "tomb",
      "predicates.tomb.type" -> "RecordIsTombstone")
    val topics = r.apply(df).select(col("off"), col("topic"))
      .as[(Long, String)].collect().toMap
    assert(topics === Map(0L -> "ev", 1L -> "ev.tombstones"))
  }

  test("predicates: validation — unknown refs, headers plane, schema-reshapers refuse gating") {
    val Left(e1) = parse("transforms" -> "m",
      "transforms.m.type" -> "MaskField",
      "transforms.m.fields" -> "a",
      "transforms.m.predicate" -> "nope")
    assert(e1.exists(_.contains("'nope' is not declared in predicates")))

    val Left(e2) = parse("transforms" -> "m",
      "transforms.m.type" -> "MaskField",
      "transforms.m.fields" -> "a",
      "predicates" -> "h",
      "predicates.h.type" -> "HasHeaderKey")
    assert(e2.exists(_.contains("no headers plane")))

    val Left(e3) = parse("transforms" -> "f",
      "transforms.f.type" -> "Flatten",
      "transforms.f.predicate" -> "tomb",
      "predicates" -> "tomb",
      "predicates.tomb.type" -> "RecordIsTombstone")
    assert(e3.exists(_.contains("cannot be gated")))

    val Left(e4) = parse("transforms" -> "m",
      "transforms.m.type" -> "MaskField",
      "transforms.m.fields" -> "a",
      "transforms.m.negate" -> "true")
    assert(e4.exists(_.contains("negate set without a predicate")))

    val Left(e5) = parse("transforms" -> "m",
      "transforms.m.type" -> "MaskField",
      "transforms.m.fields" -> "a",
      "predicates" -> "t",
      "predicates.t.type" -> "TopicNameMatches",
      "predicates.t.pattern" -> "x",
      "predicates.t.bogus" -> "1")
    assert(e5.exists(_.contains("predicates.t.bogus is not a TopicNameMatches parameter")))
  }

  test("config surface: transforms validate as a family; router rejected on single-topic") {
    val e = intercept[IllegalArgumentException] {
      GraftConfig(Map("flush.size" -> "2",
        "transforms" -> "t", "transforms.t.type" -> "Nope"))
    }
    assert(e.getMessage.contains("unknown"))

    implicit val sqlCtx = spark.sqlContext
    val cfg = GraftConfig(Map("flush.size" -> "2",
      "transforms" -> "r",
      "transforms.r.type" -> "RegexRouter",
      "transforms.r.regex" -> "(.*)", "transforms.r.replacement" -> "$1"))
    val s = MemoryStream[(Long, Long, String)]
    val e2 = intercept[IllegalArgumentException] {
      StreamIngest.startLogged(s.toDF().toDF("part", "off", "payload"),
        "/tmp/x", "t", cfg, "/tmp/ck")
    }
    assert(e2.getMessage.contains("multi-topic"))
  }

  test("end to end: mask + regex-route through the multi-topic demux plane") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft-smt").toString
    val ckpt = Files.createTempDirectory("graft-smt-ckpt").toString
    val cfg = GraftConfig(Map("flush.size" -> "2",
      "transforms" -> "mask, route",
      "transforms.mask.type" -> "MaskField",
      "transforms.mask.fields" -> "pii",
      "transforms.mask.replacement" -> "[gone]",
      "transforms.route.type" -> "RegexRouter",
      "transforms.route.regex" -> "(.*)-v1",
      "transforms.route.replacement" -> "$1"))
    val root = cfg.topicsRoot(out)

    val s = MemoryStream[(String, Long, Long, String, String)]
    val q = StreamIngest.startLoggedMulti(
      s.toDF().toDF("topic", "part", "off", "pii", "body"), out, cfg, ckpt)
    s.addData(("orders-v1", 0L, 0L, "alice", "a"),
      ("orders-v1", 0L, 1L, "bob", "b"),
      ("audit", 0L, 0L, "carol", "c"))
    q.processAllAvailable()
    q.stop()

    // routed: orders-v1 → orders; audit untouched; pii masked in both
    val orders = CommitLog.read(spark, root, "orders")
    assert(orders.count() === 2)
    assert(orders.select(col("pii")).as[String].collect().toSet ===
      Set("[gone]"))
    assert(CommitLog.read(spark, root, "audit").count() === 1)
    assert(!new java.io.File(s"$root/orders-v1").exists())
  }
}
