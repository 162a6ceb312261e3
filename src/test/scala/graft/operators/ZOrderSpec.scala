package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the Morton-curve properties the layout relies on: the column
  * expression computes the textbook interleave (checked against a
  * driver-side bit loop), it is a bijection on the coordinate grid,
  * and every Z-prefix file is a BOUNDING BOX — the property that makes
  * min/max stats prune both dimensions. */
class ZOrderSpec extends SparkSuite {

  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("interleave matches the bit definition and is a bijection on the grid") {
    val bits = 5
    val grid = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val out = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.interleave(col("x"), col("y"), bits).as("z"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (x, y, z) => assert(z === mortonRef(x, y, bits)) }
    assert(out.map(_._3).distinct.length === 1024)
    assert(out.map(_._3).min === 0L && out.map(_._3).max === 1023L)
  }

  test("every z-prefix file is a bounding box in both coordinates") {
    val (bits, fileBits) = (6, 4)
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val z = ZOrder.interleave(col("x"), col("y"), bits)
    val boxes = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zFile(z, bits, fileBits).as("f"))
      .groupBy("f")
      .agg(min("x").as("lx"), max("x").as("hx"),
        min("y").as("ly"), max("y").as("hy"), count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(boxes.length === 1 << fileBits)
    boxes.foreach { case (f, lx, hx, ly, hy, n) =>
      // 4 prefix bits = 2 per coordinate → each file spans a
      // 16×16 box of the 64×64 grid and holds exactly its cells
      assert(hx - lx === 15L, s"file $f x-spread")
      assert(hy - ly === 15L, s"file $f y-spread")
      assert(n === 256L)
    }
  }
}
