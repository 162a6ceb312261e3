package graft

import java.time.ZoneId

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.{BatchWriter, FileNaming, Rotation}

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
        // the fire is strictly future, within one period, and on the
        // day-anchored grid — or the day-re-anchor point itself (the
        // next midnight, where the grid resets)
        next > now && next - now <= period &&
          ((next - midnight) % period == 0 || next == midnight + 86400000L)
    })
  }

  test("nextTimeAdjustedByDay in a DST zone never fires past the day's TRUE end") {
    // a DST day is 23h or 25h — the re-anchor clamp must land on the
    // zone's actual next midnight, never midnight + 86400000
    val la = ZoneId.of("America/Los_Angeles")
    // a year around two US transitions (2015-03-08, 2015-11-01)
    check(Prop.forAll(
      Gen.chooseNum(1420099200000L, 1451635200000L),
      Gen.chooseNum(1L, 86400000L)) { (now, period) =>
      val next = Rotation.nextTimeAdjustedByDay(now, period, la)
      val day = java.time.Instant.ofEpochMilli(now).atZone(la).toLocalDate
      val midnight = day.atStartOfDay(la).toInstant.toEpochMilli
      val nextMidnight = day.plusDays(1).atStartOfDay(la).toInstant.toEpochMilli
      next > now && next <= nextMidnight && next - now <= period &&
        ((next - midnight) % period == 0 || next == nextMidnight)
    })
  }

  test("driver-side hash60 is non-negative and stable") {
    check(Prop.forAll { (s: String) =>
      val h = graft.functions.TextFunctions.hash60(s)
      h >= 0L && h == graft.functions.TextFunctions.hash60(s)
    })
  }

  test("compaction planning: healing + grouping preserve every surviving offset exactly once") {
    // Model a post-crash manifest: disjoint base files per partition,
    // plus some "compacted replacement" files that each subsume a run
    // of the base files (the crash left both generations visible).
    val gen = for {
      nParts <- Gen.chooseNum(1, 3)
      parts <- Gen.sequence[Seq[(Long, Seq[(Long, Long)], Seq[(Int, Int)])], (Long, Seq[(Long, Long)], Seq[(Int, Int)])](
        (0 until nParts).map { p =>
          for {
            n <- Gen.chooseNum(1, 12)
            sizes <- Gen.listOfN(n, Gen.chooseNum(1L, 5L))
            gaps <- Gen.listOfN(n, Gen.chooseNum(0L, 1L))
            nSub <- Gen.chooseNum(0, 2)
            rawSubs <- Gen.listOfN(nSub, for {
              i <- Gen.chooseNum(0, n - 1)
              j <- Gen.chooseNum(i, n - 1)
            } yield (i, j))
          } yield {
            // disjoint base ranges with occasional gaps (compacted
            // topics); compacted files span base files i..j exactly
            var off = 0L
            val ranges = sizes.zip(gaps).map { case (sz, g) =>
              val s = off + g; val e = s + sz - 1; off = e + 1; (s, e)
            }
            // real manifests never hold PARTIALLY overlapping committed
            // ranges (each is a union of whole predecessor ranges), so
            // keep only pairwise disjoint-or-nested compacted spans
            val subs = rawSubs.foldLeft(List.empty[(Int, Int)]) { (acc, c) =>
              val ok = acc.forall { a =>
                a._2 < c._1 || c._2 < a._1 ||
                  (a._1 <= c._1 && c._2 <= a._2) || (c._1 <= a._1 && a._2 <= c._2)
              }
              if (ok) c :: acc else acc
            }
            (p.toLong, ranges, subs)
          }
        })
      target <- Gen.chooseNum(1L, 12L)
    } yield (parts, target)

    check(Prop.forAllNoShrink(gen) { case (parts, target) =>
      val files = parts.flatMap { case (p, ranges, subs) =>
        val base = ranges.zipWithIndex.map { case ((s, e), i) =>
          BatchWriter.CompactFile(p, s, e, s"base-$p-$i")
        }
        val compacted = subs.zipWithIndex.map { case ((i, j), k) =>
          BatchWriter.CompactFile(p, ranges(i)._1, ranges(j)._2, s"comp-$p-$k")
        }
        base ++ compacted
      }
      val plan = BatchWriter.planCompaction(files, target)
      val survivors = files.diff(plan.subsumed)
      // 1. every file is either subsumed or in exactly one group
      val grouped = plan.groups.flatMap(g => g.files.map(g.partition -> _))
      val survivorKeys = survivors.map(f => f.partition -> f.name)
      val partition = grouped.sorted == survivorKeys.sorted
      // 2. survivor ranges are disjoint within a partition
      val disjoint = survivors.groupBy(_.partition).values.forall { fs =>
        fs.sortBy(_.start).sliding(2).forall {
          case Seq(a, b) => a.end < b.start
          case _ => true
        }
      }
      // 3. group ranges cover exactly their files' offsets (no
      //    regression past a wide file, no gap-induced loss)
      val bounds = plan.groups.forall { g =>
        val fs = survivors.filter(f => g.files.contains(f.name) && f.partition == g.partition)
        fs.nonEmpty && g.start == fs.map(_.start).min && g.end == fs.map(_.end).max
      }
      // 4. subsumed files really are contained in some survivor
      val healedOk = plan.subsumed.forall { f =>
        survivors.exists(s => s.partition == f.partition &&
          s.start <= f.start && f.end <= s.end)
      }
      partition && disjoint && bounds && healedOk
    })
  }
}
