package graft

import java.time.ZoneId

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{FileNaming, Rotation}

/** Property tests over the pure (driver-side) function core — the
  * invariants golden vectors can't cover exhaustively. */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  private val topics = Gen.nonEmptyListOf(
    Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('.', '_', '-'))).map(_.mkString)
  private val offsets = Gen.chooseNum(0L, 9999999999L)

  test("filename encode → regex decode roundtrips for any topic/partition/offsets") {
    check(Prop.forAll(topics, Gen.chooseNum(0, 10000), offsets, offsets) {
      (t, p, a, b) =>
        val (s, e) = (math.min(a, b), math.max(a, b))
        val name = FileNaming.encodeName(t, p, s, e, ".parquet")
        val re = FileNaming.CommittedFilenameRegex.r
        name match {
          case re(t2, p2, s2, e2, ext) =>
            t2 == t && p2.toInt == p && s2.toLong == s && e2.toLong == e &&
              ext == ".parquet"
          case _ => false
        }
    })
  }

  test("zero-padded names sort lexicographically in offset order") {
    check(Prop.forAll(Gen.listOfN(8, offsets)) { offs =>
      val names = offs.map(o => FileNaming.encodeName("t", 0, o, o, ".avro"))
      names.sorted.map(n =>
        FileNaming.CommittedFilenameRegex.r.findFirstMatchIn(n).get.group(4).toLong)
        .equals(offs.sorted)
    })
  }

  test("nextTimeAdjustedByDay is strictly future, within one period, on the day grid") {
    val utc = ZoneId.of("UTC")
    check(Prop.forAll(Gen.chooseNum(0L, 4102444800000L), Gen.chooseNum(1L, 86400000L)) {
      (now, period) =>
        val next = Rotation.nextTimeAdjustedByDay(now, period, utc)
        val midnight = java.time.Instant.ofEpochMilli(now).atZone(utc)
          .toLocalDate.atStartOfDay(utc).toInstant.toEpochMilli
        next > now && next - now <= period && (next - midnight) % period == 0
    })
  }

  test("driver-side hash60 is non-negative and stable") {
    check(Prop.forAll { (s: String) =>
      val h = graft.functions.TextFunctions.hash60(s)
      h >= 0L && h == graft.functions.TextFunctions.hash60(s)
    })
  }
}
