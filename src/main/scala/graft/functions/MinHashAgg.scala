package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2-K): 64-permutation MinHash signature over a
  * group's shingle strings. Buffer is the running element-wise minimum —
  * commutative + associative, so partial aggregation (map-side combine)
  * is exact: at scale each signature costs one shuffle row per group.
  *
  * Permutations are simulated by seed-suffixed FNV-1a 64 (public-domain
  * hash), deterministic across JVMs — unlike `xxhash64`, usable from pure
  * Scala inside the Aggregator.
  */
object MinHashAgg extends Aggregator[String, Array[Long], Array[Long]] {
  val K = 64

  private def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — mixes the base hash with each seed without
    * re-hashing the string K times (one string pass per shingle, K cheap
    * integer mixes). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    val base = fnv1a64(shingle)
    var i = 0
    while (i < K) {
      val h = mix(base ^ (i.toLong * 0xff51afd7ed558ccdL))
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
