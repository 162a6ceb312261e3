package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._

/** Deduplication primitives: exact, MinHash+LSH, SimHash, n-gram
  * Jaccard. Designed for the 100 TB regime:
  *  - exact dedup is a hash aggregate on a fingerprint (one shuffle of
  *    16-byte keys, not documents);
  *  - MinHash-LSH turns all-pairs similarity into an equi-join on band
  *    keys (shuffle joins scale linearly, candidate pairs only);
  *  - SimHash reduces a document to a 32-bit signature whose hamming
  *    neighborhoods are block keys;
  *  - n-gram Jaccard is evaluated only on blocked candidate pairs.
  */
object DedupFunctions {

  /** Large Mersenne prime — all permuted hashes live in [0, P). */
  val MinhashPrime: Long = 2147483647L

  /** Fixed affine-permutation constants: (a*h + b) mod P. 16 hashes →
    * 4 LSH bands of 4 rows (s ≈ 0.55 similarity threshold). */
  val MinhashA: Seq[Long] = Seq(2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53)
  val MinhashB: Seq[Long] = Seq(1, 4, 9, 16, 25, 36, 49, 64, 81, 100, 121, 144, 169, 196, 225, 256)
  def numMinhashes: Int = MinhashA.length

  /** Aggregate-form minhash signature over exploded (id, h) rows, where
    * `h` = hash60(shingle) % [[MinhashPrime]]. The scale-preferred path:
    * the expensive md5 is computed ONCE per shingle, partial (map-side)
    * `min` aggregation shrinks the shuffle to one row per document per
    * input partition, and the group-by key is the 8-byte doc id. */
  def minhashAggExprs(h: Column): Seq[Column] =
    MinhashA.zip(MinhashB).zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * h + lit(b)) % MinhashPrime).as(s"sig$i")
    }

  /** i-th minhash of a shingle array: min over shingles of the i-th
    * affine permutation of the 60-bit content hash. Stays columnar —
    * one `transform` + `array_min`, no explode. */
  def minhash(shingleArr: Column, i: Int): Column =
    minhashOfHashes(transform(shingleArr, s => hash60(s) % MinhashPrime), i)

  private def minhashOfHashes(hashes: Column, i: Int): Column = {
    val a = MinhashA(i); val b = MinhashB(i)
    array_min(transform(hashes, h => (lit(a) * h + lit(b)) % MinhashPrime))
  }

  /** Full signature as `numMinhashes` columns named sig0..sigN. The
    * md5 content hash is hoisted out of the permutation loop — one
    * hash per shingle, not one per (shingle × permutation); the
    * affine re-permutations are cheap integer arithmetic. (The
    * exploded [[minhashAggExprs]] path is still the scale-preferred
    * form — this is the columnar convenience API.) */
  def minhashSignature(shingleArr: Column): Seq[Column] = {
    val hashes = transform(shingleArr, s => hash60(s) % MinhashPrime)
    (0 until numMinhashes).map(i =>
      minhashOfHashes(hashes, i).as(s"sig$i"))
  }

  /** LSH band keys: bands of `rowsPerBand` signature slots concatenated
    * into a join key. Docs sharing any band key are candidate pairs. */
  def bandKeys(sigCols: Seq[Column], rowsPerBand: Int): Column = {
    val bands = sigCols.grouped(rowsPerBand).zipWithIndex.map { case (g, bi) =>
      concat_ws(":", (lit(bi) +: g).map(_.cast("string")): _*)
    }.toSeq
    array(bands: _*)
  }

  /** The 32-bit fold of a 60-bit content hash — the ONE definition of
    * simhash's per-token hash, shared by the column-form path and the
    * native hash60_md5 path (and mirrored as `% 4294967296` in every
    * oracle). */
  def hash32From(h60: Column): Column = h60 % lit(4294967296L)

  /** Per-token 32-bit hash used by simhash. */
  def hash32(c: Column): Column = hash32From(hash60(c))

  /** SimHash signature of a token array, fully columnar: for each bit j
    * count tokens whose 32-bit hash has bit j set (`aggregate` over the
    * array — no explode, no shuffle, stays in whole-stage codegen); bit
    * j of the signature is set iff a majority of tokens set it. Empty
    * token arrays hash to 0. */
  def simhash(toks: Column, bits: Int): Column = {
    val n = size(toks).cast("long")
    // hash ONCE per token (md5 is the expensive part), then run the
    // per-bit majorities over the integer hash array
    val hs = transform(toks, t => hash32(t))
    (0 until bits).map { j =>
      val ones = aggregate(hs, lit(0L),
        (acc, h) => acc + shiftright(h, j).bitwiseAND(lit(1L)))
      when(ones * 2 > n, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash over pre-exploded (id, token) rows — per-bit set-counts to
    * aggregate, then [[simhashFromBitSums]] folds them into the
    * signature. Kept for pipelines that already explode. */
  def bitSums(h: Column, bits: Int): Seq[Column] =
    (0 until bits).map(j => sum(shiftright(h, j).bitwiseAND(1)).as(s"bit$j"))

  def simhashFromBitSums(bitCols: Seq[Column], total: Column): Column =
    bitCols.zipWithIndex.map { case (b, j) =>
      when(b * 2 > total, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Fold per-bit majority sums into per-BAND signature values
    * (`bandBits` bits each, so each value is in [0, 2^bandBits)) —
    * the wide-signature form of [[simhashFromBitSums]]: band b holds
    * global bits [b*bandBits, (b+1)*bandBits), and a signature wider
    * than 63 bits never has to exist as a single (sign-problematic)
    * long on either engine. Hamming distance of two signatures is the
    * sum of per-band `bit_count(xor)`. */
  def simhashBandsFromBitSums(bitCols: Seq[Column], total: Column,
                              bandBits: Int): Seq[Column] =
    bitCols.grouped(bandBits).toSeq.map { grp =>
      grp.zipWithIndex.map { case (b, j) =>
        when(b * 2 > total, lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }

  /** Jaccard similarity of the distinct-token sets of two documents.
    * Inputs are deduplicated here so callers can pass raw token arrays;
    * two empty sets are defined as identical (1.0). */
  def jaccard(tokensA: Column, tokensB: Column): Column = {
    val a = array_distinct(tokensA)
    val b = array_distinct(tokensB)
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0.0, lit(1.0)).otherwise(inter / union)
  }

  /** Directed set containment |A∩B| / min(|A|, |B|) — the
    * near-superset signal Jaccard dilutes: a document embedded
    * verbatim in one 10× its size has Jaccard ≤ 0.1 but containment
    * 1.0 (the boilerplate / quoted-reply / template shape). Both
    * empty → 1.0, mirroring [[jaccard]]'s empty-set convention. */
  def containment(tokensA: Column, tokensB: Column): Column = {
    val a = array_distinct(tokensA)
    val b = array_distinct(tokensB)
    val inter = size(array_intersect(a, b)).cast("double")
    val m = least(size(a), size(b)).cast("double")
    when(m === 0.0, lit(1.0)).otherwise(inter / m)
  }

  /** Exact dedup: one row per distinct fingerprint with the surviving
    * (minimum) id and the duplicate count. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))
}
