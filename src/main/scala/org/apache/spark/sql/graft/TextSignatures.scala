package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native signature expressions for the dedup operators.
  *
  * The higher-order-function formulations (`transform` + `array_min` /
  * per-bit `zip_with` votes) evaluate one interpreted lambda per
  * (token × permutation) — tens of millions of evals per partition at
  * sf0.1. These expressions run the same arithmetic as a tight JVM loop
  * over Spark's XXH64 primitive instead. They are per-row (not per-pair),
  * so CodegenFallback's one virtual call per row is irrelevant — the win
  * is eliminating the lambda interpreter from the inner loop.
  */

/** MinHash signature: `perms` min-hash values of a token array, permutation
  * `p` keyed by xxhash64 seed `p`. Returns array<long> of length `perms`. */
case class MinHashSignature(child: Expression, perms: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](perms)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes()
        var p = 0
        while (p < perms) {
          val h = XXH64.hashUnsafeBytes(base, off, len, p)
          if (h < out(p)) out(p) = h
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** 64-bit SimHash: per-bit majority vote of each token's hash, packed into
  * one long.
  *
  * The per-token bit source is the FIRST 8 BYTES OF MD5 (bit j = bit
  * `7 - j%8` of digest byte `j/8`, i.e. the hex string read MSB-first),
  * not xxhash64: md5 is the one 64-bit-capable hash this engine and ANSI
  * SQL engines share, which makes the whole SimHash algorithm mirrorable
  * as an exact SQL oracle (dd05). The trade is per-token hash cost (~5×
  * xxh64); SimHash hashes each distinct token once per document, so the
  * signature pass stays a fraction of the tokenize cost. Vote tie rule:
  * a bit is set iff its vote is STRICTLY positive (an even token count
  * can tie at 0). */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    val md = TextSignatures.md5Local.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < 64) {
          votes(j) += (if (((digest(j >> 3) >>> (7 - (j & 7))) & 1) == 1) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var packed = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) packed |= (1L << j)
      j += 1
    }
    packed
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Token set as SORTED DISTINCT xxhash64 values (seed 42): the compact
  * integer form of a token set. Downstream set arithmetic (Jaccard merge
  * walks, MinHash permutations) runs over 8-byte longs instead of UTF8
  * strings — one string hash per token here buys long-compare and
  * `hashLong` everywhere after. Collision risk ~ |vocab|²/2⁶⁴, negligible.
  */
case class TokenSetHashes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_set_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        hs(m) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        m += 1
      }
      i += 1
    }
    java.util.Arrays.sort(hs, 0, m)
    // dedup in place (sorted)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetHashes =
    copy(child = newChild)
}

/** MinHash signature over pre-hashed tokens: permutation `p` of token hash
  * `h` is `fmix64(h ^ Z(p))` with `Z(p) = splitmix64(p)` — a handful of
  * multiplies, vs re-walking the token's bytes once per permutation in
  * [[MinHashSignature]].
  *
  * NOT `XXH64.hashLong(h, p)`: small sequential seeds leave xxh64's
  * single-word path measurably correlated across p, which costs LSH recall
  * (64 of 28865 fixture pairs missed vs the expected ~2). The
  * splitmix-scrambled XOR constants restore independent permutations. */
case class MinHashFromHashes(child: Expression, perms: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_from_hashes"

  // splitmix64(p): well-scrambled, pairwise-independent permutation keys
  private lazy val permKeys: Array[Long] = Array.tabulate(perms) { p =>
    var z = p.toLong + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  @inline private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^ (x >>> 33)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val keys = permKeys
    val out = new Array[Long](perms)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var p = 0
      while (p < perms) {
        val hp = fmix64(h ^ keys(p))
        if (hp < out(p)) out(p) = hp
        p += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashes =
    copy(child = newChild)
}

/** Adjacent-token bigrams of a token array ("a b c" tokens → ["a b",
  * "b c"]): one JVM loop instead of an interpreted
  * `transform(sequence(...), i -> concat_ws(...))` lambda per element.
  * Empty/singleton inputs yield an empty array (no `sequence` reversal
  * hazard). */
case class Bigrams(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bigrams"

  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      val a = if (arr.isNullAt(i)) space.copy() else arr.getUTF8String(i)
      val b = if (arr.isNullAt(i + 1)) space.copy() else arr.getUTF8String(i + 1)
      out(i) = org.apache.spark.unsafe.types.UTF8String.concat(a, space, b)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Bigrams =
    copy(child = newChild)
}

object TextSignatures {
  /** MessageDigest is stateful and not thread-safe; one instance per
    * executor task thread, reset per token. */
  private[graft] val md5Local: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def minhashSignature(tokens: Column, perms: Int): Column =
    ExpressionUtils.column(MinHashSignature(ExpressionUtils.expression(tokens), perms))

  def simhash64(tokens: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(tokens)))

  def tokenSetHashes(tokens: Column): Column =
    ExpressionUtils.column(TokenSetHashes(ExpressionUtils.expression(tokens)))

  def minhashFromHashes(hashes: Column, perms: Int): Column =
    ExpressionUtils.column(MinHashFromHashes(ExpressionUtils.expression(hashes), perms))

  def bigrams(tokens: Column): Column =
    ExpressionUtils.column(Bigrams(ExpressionUtils.expression(tokens)))
}
