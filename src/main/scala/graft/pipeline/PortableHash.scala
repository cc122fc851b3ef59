package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash primitives reproducible in any engine with `md5` + string ops
  * (in particular the ANSI-SQL correctness oracle): every value
  * derives from md5 hex digits, so Spark and the oracle compute
  * identical signatures. Production paths default to xxhash64 (one
  * fused codegen'd hash, faster); the gate entries use these so the
  * oracle can attest the full operator output, not just row counts.
  */
object PortableHash {

  /** Modulus for the 2-universal family below (prime, < 2^30). */
  val P = 1000000007L

  /** Two ~28-bit lane seeds from ONE md5 of the input (hex digits
    * 1-7 and 8-14): the shared base for a family of 2-universal
    * hashes h_i(x) = (a + (i+1)·b) mod P. One md5 per row however
    * many hash functions are derived, and all arithmetic stays far
    * below 2^63 (safe under ANSI overflow checking).
    */
  def lanes(c: Column): (Column, Column) = {
    val h = md5(c.cast("binary"))
    (conv(substring(h, 1, 7), 16, 10).cast("long"),
      conv(substring(h, 8, 7), 16, 10).cast("long"))
  }

  /** i-th member of the 2-universal family over the two lane seeds. */
  def laneHash(a: Column, b: Column, i: Int): Column =
    (a + lit((i + 1).toLong) * b) % P

  /** 60-bit hash from the first 15 md5 hex digits (always >= 0). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Driver-side md5 hex of a UTF-8 string — for baking literal plans
    * (e.g. LSH plane signs) that an oracle re-derives with SQL md5().
    */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
