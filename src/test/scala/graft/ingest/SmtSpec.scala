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
      "transforms.t.type" -> "Flatten")
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
    assert(r.isNullAt(r.fieldIndex("secret"))) // masked, type preserved
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
