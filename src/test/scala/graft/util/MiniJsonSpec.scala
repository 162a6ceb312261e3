package graft.util

import org.scalatest.funsuite.AnyFunSuite
import graft.util.MiniJson._

/** MiniJson + Bench.parseLedger — the structural ledger parse that
  * replaced the entry-scoped regexes (VERDICT r16 task #6). The
  * load-bearing case: a hand-edited note containing `}` (or text that
  * quotes the "idle"/"prev_sec" field tokens) must corrupt nothing.
  */
class MiniJsonSpec extends AnyFunSuite {

  test("scalars, nesting, escapes") {
    assert(parse("42").num.contains(42.0))
    assert(parse("-1.5e3").num.contains(-1500.0))
    assert(parse("\"a\\n\\\"b\\u0041\"").str.contains("a\n\"bA"))
    assert(parse("true") == JBool(true))
    assert(parse("null") == JNull)
    val v = parse("""{"a": [1, {"b": "x"}], "c": {}}""")
    assert((v \ "a").arr.get.head.num.contains(1.0))
    assert(((v \ "a").arr.get(1) \ "b").str.contains("x"))
    assert((v \ "c").obj.contains(Vector.empty))
    assert((v \ "missing") == JNull)
  }

  test("malformed input throws with an offset, never degrades") {
    for (bad <- Seq("{", "[1,", "\"unterminated", "{\"a\" 1}",
                    "01x", "{}extra", "{\"a\":}", "\"bad\\q\""))
      assertThrows[IllegalArgumentException](parse(bad))
  }

  test("duplicate-field lookup takes the first (ledger keys are unique)") {
    assert((parse("""{"a":1,"a":2}""") \ "a").num.contains(1.0))
  }

  test("ledger entry with a brace-and-token-laden note parses intact") {
    // The regex parser this replaced dropped an entry's sigma/prev
    // when a note contained '}' — and its consistency check could be
    // fooled by a note quoting the "idle" token. Both at once here.
    val ledger = """{
      "q_heavy": {
       "sec": 4.02,
       "round": 16,
       "note": "adjudicated {see r16}; prior entry had no \"idle\": [] spread and a stray } brace",
       "idle": [4.1, 4.3, 4.2, 4.15, 4.25],
       "prev_sec": 5.47,
       "prev_round": 10
      },
      "q_plain": {
       "sec": 0.5,
       "round": 3
      }
     }"""
    val parsed = graft.Bench.parseLedger(ledger)
    assert(parsed.keySet == Set("q_heavy", "q_plain"))
    val h = parsed("q_heavy")
    assert(h.sec == 4.02)
    assert(h.prevSec.contains(5.47))
    // sample std-dev of [4.1, 4.3, 4.2, 4.15, 4.25]
    assert(math.abs(h.sigma - 0.0790569) < 1e-4)
    val p = parsed("q_plain")
    assert(p.sec == 0.5 && p.sigma == 0.0 && p.prevSec.isEmpty)
  }

  test("real BASELINE_QUERIES.json parses with every entry priced") {
    val f = new java.io.File("BASELINE_QUERIES.json")
    assume(f.isFile)
    val text = new String(java.nio.file.Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val parsed = graft.Bench.parseLedger(text)
    assert(parsed.size > 50)
    assert(parsed.contains("calibration_sec"))
    assert(parsed.values.forall(_.sec > 0))
  }

  test("malformed ledger throws instead of silently loosening the gate") {
    assertThrows[IllegalArgumentException](
      graft.Bench.parseLedger("""{"q": {"sec": 1.0}, """))
    assertThrows[IllegalArgumentException](
      graft.Bench.parseLedger("""{"q": {"round": 3}}"""))
    assertThrows[IllegalArgumentException](
      graft.Bench.parseLedger("""[1,2]"""))
  }
}
