package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class RedactionSpec extends SparkSuite {
  import spark.implicits._

  private def redact(texts: String*): Seq[(String, Long, Long, Long)] =
    texts.toDF("text").select(
        Seq(TextFunctions.redactPii(col("text")).as("clean")) ++
          TextFunctions.piiCounts(col("text")): _*)
      .as[(String, Long, Long, Long)].collect().toSeq

  test("emails, ips, and phone numbers redact to typed placeholders") {
    val Seq((clean, emails, ips, phones)) = redact(
      "mail alice.smith+spam@example.co.uk or call 555-123-4567; " +
        "host 10.0.0.1 logs to bob@corp.io")
    assert(clean === "mail <EMAIL> or call <PHONE>; host <IP> logs to <EMAIL>")
    assert((emails, ips, phones) === (2L, 1L, 1L))
  }

  test("an email whose domain embeds an IPv4 shape redacts once, as the email") {
    val Seq((clean, emails, ips, phones)) = redact("mail bob@1.2.3.4.com now")
    assert(clean === "mail <EMAIL> now")
    assert((emails, ips, phones) === (1L, 0L, 0L))
  }

  test("an ip-literal mail host is not a (letter-TLD) email — the ip still redacts") {
    val Seq((clean, emails, ips, phones)) = redact("root@192.168.0.1 was here")
    assert(clean === "root@<IP> was here")
    assert((emails, ips, phones) === (0L, 1L, 0L))
  }

  test("clean text is untouched and counts are zero") {
    val texts = Seq("no pii here at all", "dots. and, punctuation! 123",
      "almost@ an @email but not", "1.2.3 not an ip, 12-34-56 not a phone")
    val got = redact(texts: _*)
    assert(got.map(_._1) === texts)
    assert(got.forall(r => r._2 == 0L && r._3 == 0L && r._4 == 0L))
  }

  test("dotted phone separators and bare ips both match") {
    val Seq((clean, emails, ips, phones)) = redact("call 555.123.4567 from 8.8.8.8")
    assert(clean === "call <PHONE> from <IP>")
    assert((emails, ips, phones) === (0L, 1L, 1L))
  }
}
