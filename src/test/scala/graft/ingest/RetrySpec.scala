package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** The `retry.backoff.ms` consumer: a transient failure is retried
  * within the attempt budget, a persistent one rethrows the LAST
  * failure after exhausting it (reference semantics:
  * `TopicPartitionWriter.java:313-335` parks and retries a retriable
  * write instead of failing the task). */
class RetrySpec extends AnyFunSuite {

  test("a transient failure succeeds on the retry") {
    var calls = 0
    val out = Retry.withBackoff(attempts = 2, backoffMs = 0) {
      calls += 1
      if (calls == 1) throw new RuntimeException("transient")
      "ok"
    }
    assert(out === "ok")
    assert(calls === 2)
  }

  test("a persistent failure rethrows after the attempt budget") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withBackoff(attempts = 3, backoffMs = 0) {
        calls += 1
        throw new RuntimeException(s"boom $calls")
      }
    }
    assert(calls === 3)
    assert(e.getMessage === "boom 3") // the LAST failure propagates
  }

  test("IllegalArgumentException is deterministic — never retried") {
    var calls = 0
    intercept[IllegalArgumentException] {
      Retry.withBackoff(attempts = 3, backoffMs = 0) {
        calls += 1; throw new IllegalArgumentException("bad config")
      }
    }
    assert(calls === 1)
  }

  test("attempts <= 1 means no retry") {
    var calls = 0
    intercept[RuntimeException] {
      Retry.withBackoff(attempts = 1, backoffMs = 0) {
        calls += 1; throw new RuntimeException("once")
      }
    }
    assert(calls === 1)
  }
}
