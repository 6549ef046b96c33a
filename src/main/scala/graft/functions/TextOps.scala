package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives (tokenization, fingerprints, MinHash/SimHash
  * signatures) as composable Columns — built on codegen'd string/array
  * functions and `xxhash64`, no UDFs.
  */
object TextOps {

  /** Whitespace tokens (the fixtures are single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct token set — the unit for word-level Jaccard / MinHash. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Exact Jaccard similarity of two pre-distinct arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** Content fingerprint: md5 of the normalized text. Deterministic and
    * identical in any engine — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(trim(lower(text)).cast("binary"))

  /** MinHash signature: `perms` min-hash values over the token set, each
    * permutation keyed by seed. One pass per permutation over the array —
    * all codegen'd, no shuffle until the band explode. */
  def minhashSignature(tokenSet: Column, perms: Int): Column =
    transform(sequence(lit(0), lit(perms - 1)), p =>
      array_min(transform(tokenSet, w => xxhash64(w, p))))

  /** LSH band keys for a MinHash signature: `bands` hashes, each over
    * `rowsPerBand` consecutive signature entries. Emitting (bandIdx,
    * bandHash) pairs lets candidates meet through an equi-join — the
    * O(n²) pair space never materializes. */
  def minhashBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), b).as("bucket")))

  /** 64-bit SimHash of the token set: per-bit vote of each token's
    * xxhash64 bits, packed into one long. Hamming distance between
    * SimHashes approximates token-set dissimilarity. */
  def simhash(tokenSet: Column): Column = {
    val votes = aggregate(
      tokenSet,
      array_repeat(lit(0), 64),
      (acc, w) => zip_with(
        acc,
        transform(sequence(lit(0), lit(63)),
          j => when(call_function("shiftright", xxhash64(w), j).bitwiseAND(lit(1L)) === 1L, lit(1))
            .otherwise(lit(-1))),
        (a, b) => a + b))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, j) => when(v > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Hamming distance between two packed 64-bit SimHashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
