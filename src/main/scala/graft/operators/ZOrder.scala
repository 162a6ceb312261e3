package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve utilities for multi-dimensional data
  * clustering — the file-layout lever behind min/max-stats scan
  * pruning when queries filter on MORE than the partition column.
  *
  * A sink partitioned only by time (the reference's TimeBased
  * partitioner family) prunes time predicates perfectly and everything
  * else not at all: a `user BETWEEN …` clause still reads every file
  * of the selected hours. Laying files out along a Z-curve over
  * (user, time) gives every file a tight bounding box in BOTH
  * dimensions, so per-file min/max statistics (parquet footers, or a
  * table-format manifest) prune 2-D boxes multiplicatively. This is
  * the standard practice in public lakehouse engines; here it is a
  * pure column expression, so it composes with the write plane as
  * just another partition path column.
  *
  * Everything is a static, codegen-friendly bit-arithmetic expression
  * — no UDF, no shuffle: assigning a file is a projection, and the
  * per-file statistics are one map-side-combined aggregate.
  */
object ZOrder {

  /** Bit-interleave two `bits`-bit non-negative coordinates into a
    * `2·bits`-bit Morton code: x occupies even bit positions, y odd.
    * Coordinates must already be folded into [0, 2^bits). */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    // same bit-budget guard as interleaveN: past 2·bits = 63 the JVM
    // wraps the shift distance (x << 65 ≡ x << 1) and high coordinate
    // bits silently fold onto low Morton positions; at exactly 64 the
    // top position is the sign bit and downstream arithmetic shifts
    // sign-extend
    require(bits > 0 && 2 * bits <= 63,
      s"2·$bits Morton bits exceed a Long's non-sign capacity (63)")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** K-ary generalization of [[interleave]]: bit i of coordinate c
    * lands at position `i·k + c` (for k = 2 this is exactly
    * [[interleave]]'s even/odd layout). Coordinates must already be in
    * [0, 2^bits). This is the interleave [[graft.ingest.ZOrder]] — the
    * commit-log clustering REWRITE — feeds with equi-depth bucket
    * ranks; here it stays a pure projection over however the caller
    * folded its coordinates. */
  def interleaveN(coords: Seq[Column], bits: Int): Column = {
    val k = coords.size
    // bit positions must fit a Long: JVM shifts wrap at 64 (x << 79
    // is x << 15), which would silently fold high coordinates onto
    // low positions — refuse at plan build
    require(k * bits <= 63,
      s"$k coordinates x $bits bits = ${k * bits} interleaved bits > 63")
    var z: Column = lit(0L)
    for (i <- 0 until bits; c <- 0 until k) {
      val bit = shiftright(coords(c), i).bitwiseAND(lit(1L))
      z = z.bitwiseOR(shiftleft(bit, i * k + c))
    }
    z
  }

  /** The file a record lands in under Z-layout: the top `fileBits`
    * bits of the Morton code — records sharing a Z-prefix are
    * co-located, which is Z-order clustering without a global sort
    * (each file is a Z-range, i.e. a bounding box). */
  def zFile(z: Column, bits: Int, fileBits: Int): Column =
    shiftright(z, 2 * bits - fileBits)

  /** DuckDB mirror of [[interleave]] over columns named `x`/`y`. */
  def interleaveSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
}
