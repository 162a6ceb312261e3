package graft.streaming

import java.sql.Timestamp

import graft.SparkSuite

class KafkaSourceSpec extends SparkSuite {
  import spark.implicits._

  test("normalize maps the Kafka envelope onto the engine stream shape") {
    // a frame with exactly the Kafka source's output columns
    val kafkaShaped = Seq(
      ("k1".getBytes, "v1".getBytes, "events", 3, 42L, new Timestamp(1700000000000L)))
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")
    val got = KafkaSource.normalize(kafkaShaped)
    assert(got.columns.toSeq === Seq("topic", "part", "off", "ts", "key", "value"))
    val row = got.as[(String, Long, Long, Timestamp, String, String)].head()
    assert(row === (("events", 3L, 42L, new Timestamp(1700000000000L), "k1", "v1")))
  }
}
