package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-similarity primitives over `array<float>` embedding columns.
  * Pure Catalyst higher-order functions (`zip_with`/`aggregate`) — no
  * UDFs, so the hot loops are codegen'd and columnar-pruned.
  *
  * Scale path: brute-force cosine is O(Q×N×d) and only acceptable for a
  * small query set; the random-hyperplane LSH bucket key reduces the
  * search to one shuffle-join on a small integer key.
  */
object SimilarityFunctions {

  /** Σ a_i * b_i with elements widened to double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (caller may pre-join precomputed norms). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic ±1 hyperplane component for (plane j, dim i):
    * derived from the portable md5-based hash so plan-time constants
    * equal what any other engine would derive. */
  def planeComponent(plane: Int, dim: Int): Int =
    if ((TextFunctions.hash60(s"plane$plane:$dim") & 1L) == 1L) 1 else -1

  /** The ±1 hyperplane for plane j in `dims` dimensions. */
  def plane(j: Int, dims: Int): Seq[Int] = (1 to dims).map(planeComponent(j, _))

  /** Random-hyperplane LSH bucket id: bit j set iff dot(v, plane_j)>0. */
  def lshBucket(vec: Column, numPlanes: Int, dims: Int): Column =
    (0 until numPlanes).map { j =>
      val p = plane(j, dims)
      val planeLit = array(p.map(x => lit(x.toDouble)): _*)
      when(dot(vec, planeLit) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Fixed-point quantization of a float vector: element-wise
    * `floor(x * scale)` as long. Quantized vectors make every
    * downstream dot product / LSH bucket integer-exact, so results are
    * bit-identical across engines (and across summation orders — the
    * oracle path). Production similarity can use the float [[cosine]];
    * ranking via the quantized dot is within 1/scale of it. */
  def quantize(vec: Column, scale: Int = 1000): Column =
    transform(vec, x => floor(x.cast("double") * scale).cast("long"))

  /** Integer dot product of two quantized vectors — exact, overflow-safe
    * for |q| < 2^15 per element at dims <= 2^20. */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** [[lshBucket]] over a quantized vector (integer-exact sign tests). */
  def lshBucketQ(qvec: Column, numPlanes: Int, dims: Int): Column =
    (0 until numPlanes).map { j =>
      val planeLit = array(plane(j, dims).map(x => lit(x.toLong)): _*)
      when(intDot(qvec, planeLit) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
