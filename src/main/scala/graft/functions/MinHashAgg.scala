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
  * K permutations are Broder-style transforms mod the Mersenne prime
  * 2^31-1 over TWO residues of the base:
  * `h_i = (a_i * (base mod p) + a2_i * (base mod p2) + b_i) mod p`.
  * The second residue — mod a DIFFERENT prime p2 = 2^31-19, NOT a wider
  * reduction of the same one (a `(base mod 2^61-1) mod p` chain preserves
  * every base difference that is a multiple of p unless the outer modulus
  * wraps, so it decorrelates nothing — caught by the regression property
  * below) — restores the decorrelation a single `base mod p` reduction
  * loses (r8 ADVICE: with one residue, two shingles colliding mod p
  * collide in EVERY slot, ~2^-31 per pair; here a full-signature
  * collision needs `Δbase ≡ 0 mod p·p2 ≈ 2^62`) — and because `a2_i`
  * scales QUADRATICALLY with the seed while `a_i`
  * scales linearly, `a_i·Δ1 + a2_i·Δ2 ≡ 0 (mod p)` is linear in (i+1),
  * so any two distinct (r1, r2) pairs can collide in AT MOST ONE of the
  * 64 slots. Everything past `base` is plain bounded integer arithmetic
  * (each product < 2^62, reduced mod p before summing, so nothing wraps
  * a signed 64-bit integer on either engine), which is why the paired
  * DuckDB oracle can replay the ENTIRE aggregation — per-seed transform,
  * per-group min, md5 digest — in SQL over the dumped (doc_id, base)
  * table; only the string→base step stays engine-side (truncated `%`
  * semantics match between Java and DuckDB, so the signed intermediates
  * need no special casing beyond the final `(+p) % p` normalization,
  * mirrored in SQL).
  */
object MinHashAgg extends Aggregator[String, Array[Long], Array[Long]] {
  val K = 64

  /** Mersenne-31: the classic MinHash modulus (Broder 1997 used 32-bit
    * fingerprints); small enough that affine arithmetic never overflows
    * a signed 64-bit integer on either engine. */
  val P: Long = 2147483647L

  /** 2^31-19, prime: modulus of the SECOND base residue. Distinct from
    * P and coprime to it, so both residues collide only when the base
    * difference is a multiple of P·P2 ≈ 2^62 — the joint-collision
    * bound. Small enough that a2·(base mod P2) stays below 2^62. */
  val P2: Long = 2147483629L

  /** per-seed multiplier of the first residue (Knuth multiplicative
    * constant, never ≡ 0 mod P for i+1 < P) — spelled as an arithmetic
    * formula so the DuckDB oracle derives the identical constant from
    * the seed index. */
  def aOf(i: Int): Long = ((i + 1).toLong * 2654435761L) % P

  /** per-seed multiplier of the second residue — quadratic in the seed
    * (see class doc), constant from xxhash32's prime_2. (i+1)² ≤ 4096 ·
    * 2246822519 < 2^44, exact on both engines. */
  def a2Of(i: Int): Long =
    ((i + 1).toLong * (i + 1).toLong * 2246822519L) % P

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
    val base = fnv1a64(shingle)
    val r1 = base % P  // truncated %, may be negative — as SQL
    val r2 = base % P2 // second independent residue, identical in SQL
    var i = 0
    while (i < K) {
      val h =
        (((r1 * aOf(i)) % P + (r2 * a2Of(i)) % P + bOf(i)) % P + P) % P
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
