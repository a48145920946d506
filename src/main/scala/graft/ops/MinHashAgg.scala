package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** k-permutation MinHash as a typed, mergeable [[Aggregator]] over
  * (doc_id, token) pairs: the buffer is the running element-wise minimum of
  * k seeded 48-bit hashes — a true sketch (commutative, associative,
  * idempotent merge), so Spark plans it as partial (map-side) + final
  * aggregation and signatures for two shards union by `merge`.
  *
  * Hash function matches the SQL/Column lowering (`min(substr(md5(i:w),
  * 1, 12))`): the first 12 hex chars of md5 read as a 48-bit integer, so
  * [[DedupOps.minhashSignaturesTyped]] is verifiable against
  * [[DedupOps.minhashSignatures]] value-for-value.
  */
final class MinHashAgg(k: Int) extends Aggregator[(Long, String), Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(b: Array[Long], in: (Long, String)): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = MinHashAgg.hash48(i + 1, in._2)
      if (h < b(i)) b(i) = h
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAgg {
  /** First 48 bits of md5("seed:token") — identical to the SQL lowering's
    * `substr(md5(concat(seed, ':', w)), 1, 12)` read as hex. */
  def hash48(seed: Int, w: String): Long =
    hash48(MessageDigest.getInstance("MD5"),
      s"$seed:".getBytes("UTF-8"), w.getBytes("UTF-8"))

  /** Hot-path form: the caller supplies a reusable digest and
    * pre-encoded byte chunks — `MessageDigest.getInstance` is a provider
    * lookup + allocation per call, and the single-pass `minhash_sig`
    * expression evaluates this k times per distinct token per row. The
    * digest over (prefix ++ token) bytes is byte-identical to md5 of the
    * concatenated string. */
  def hash48(md: MessageDigest, seedPrefix: Array[Byte], w: Array[Byte]): Long = {
    md.reset()
    md.update(seedPrefix)
    md.update(w)
    val d = md.digest()
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }
}
