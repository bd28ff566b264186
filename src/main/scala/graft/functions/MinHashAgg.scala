package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2-K): 64-permutation MinHash signature over a
  * group's shingle strings. Buffer is the running element-wise minimum —
  * commutative + associative, so partial aggregation (map-side combine)
  * is exact: at scale each signature costs one shuffle row per group.
  *
  * The base hash is FNV-1a 64 (public-domain, deterministic across JVMs —
  * unlike `xxhash64`, usable from pure Scala inside the Aggregator); the
  * K permutations are Broder-style affine transforms mod the Mersenne
  * prime 2^31-1: `h_i = (a_i * (base mod p) + b_i) mod p` with per-seed
  * odd-multiplier constants. Everything past `base` is plain bounded
  * integer arithmetic (|base mod p| < 2^31, a_i < p, so the product fits
  * a 64-bit long with no wrap), which is why the paired DuckDB oracle can
  * replay the ENTIRE aggregation — per-seed affine transform, per-group
  * min, md5 digest — in SQL over the dumped (doc_id, base) table; only
  * the string→base step stays engine-side (truncated `%` semantics match
  * between Java and DuckDB, so the signed intermediate needs no special
  * casing beyond the final `(+p) % p` normalization, mirrored in SQL).
  */
object MinHashAgg extends Aggregator[String, Array[Long], Array[Long]] {
  val K = 64

  /** Mersenne-31: the classic MinHash modulus (Broder 1997 used 32-bit
    * fingerprints); small enough that affine arithmetic never overflows
    * a signed 64-bit integer on either engine. */
  val P: Long = 2147483647L

  /** per-seed multiplier (Knuth multiplicative constant, never ≡ 0 mod P
    * for i+1 < P) — spelled as an arithmetic formula so the DuckDB oracle
    * derives the identical constant from the seed index. */
  def aOf(i: Int): Long = ((i + 1).toLong * 2654435761L) % P

  /** per-seed offset. */
  def bOf(i: Int): Long = ((i + 1).toLong * 40503L) % P

  private[graft] def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  override def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    val bm = fnv1a64(shingle) % P // truncated %, may be negative — as SQL
    var i = 0
    while (i < K) {
      val h = ((bm * aOf(i) + bOf(i)) % P + P) % P
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < K) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
