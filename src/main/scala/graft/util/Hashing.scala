package graft.util

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** Thin wrappers over Spark's public xxHash64 implementation so that
  * driver-side Scala code, custom expressions, and the builtin
  * `functions.xxhash64` column all agree bit-for-bit.
  */
object Hashing {
  final val DefaultSeed = 42L // seed used by Spark's xxhash64() function

  @inline def hashLong(v: Long, seed: Long): Long = XXH64.hashLong(v, seed)

  def hashBytes(bytes: Array[Byte], seed: Long): Long =
    XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, seed)

  /** Hash of the UTF-8 encoding of the string (matches
    * `xxhash64(stringCol)` when seed = 42). */
  def hashString(s: String, seed: Long = DefaultSeed): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  /** Fold a window of longs into one 64-bit key (order-sensitive). */
  def hashLongs(vs: Array[Long], from: Int, until: Int, seed: Long): Long = {
    var h = seed
    var i = from
    while (i < until) { h = XXH64.hashLong(vs(i), h); i += 1 }
    h
  }

  /** SplitMix64: deterministic stream of well-mixed longs for MinHash
    * permutation parameters (public-domain algorithm, Steele et al. 2014). */
  def splitMix64(state: Long): Long = {
    var z = state + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def md5(bytes: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)

  def md5Utf8(s: String): Array[Byte] =
    md5(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def hex(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }
}
