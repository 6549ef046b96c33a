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

  /** Distinct token set — the unit for word-level Jaccard / MinHash.
    * Sorted canonical form: exact-dup grouping keys on it directly, and
    * the merge-walk Jaccard expression requires it. */
  def tokenSet(text: Column): Column = sort_array(array_distinct(tokens(text)))

  /** Exact Jaccard similarity of two sorted pre-distinct arrays — the
    * native merge-walk [[org.apache.spark.sql.graft.SortedArrayJaccard]]
    * (array_intersect allocates a hash set per pair). */
  def jaccard(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.SortedArrayJaccard(a, b)

  /** Content fingerprint: md5 of the normalized text. Deterministic and
    * identical in any engine — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(trim(lower(text)).cast("binary"))

  /** Canonical bag-of-tokens fingerprint: md5 of the sorted distinct token
    * set re-joined with single spaces — the normalization key shared by
    * dd11 (token-set dedup) and mm05 (whose synthesized image pattern IS
    * this hash's 64-bit prefix). One definition, or the two operators'
    * oracle-exactness silently diverges. */
  def canonFingerprint(text: Column): Column =
    md5(concat_ws(" ", tokenSet(text)).cast("binary"))

  /** MinHash signature: `perms` min-hash values over the token set, each
    * permutation keyed by seed — the native
    * [[org.apache.spark.sql.graft.MinHashSignature]] expression (one JVM
    * loop per row instead of perms×tokens interpreted lambdas). */
  def minhashSignature(tokenSet: Column, perms: Int): Column =
    org.apache.spark.sql.graft.TextSignatures.minhashSignature(tokenSet, perms)

  /** Token set as sorted distinct xxhash64 longs — the compact integer set
    * form; Jaccard and MinHash over it never touch string bytes again.
    * Input need not be pre-distinct. */
  def tokenSetHashes(tokens: Column): Column =
    org.apache.spark.sql.graft.TextSignatures.tokenSetHashes(tokens)

  /** MinHash signature over a pre-hashed token set (from
    * [[tokenSetHashes]]): permutation p of hash h is `xxh64_long(h, p)`. */
  def minhashFromHashes(hashes: Column, perms: Int): Column =
    org.apache.spark.sql.graft.TextSignatures.minhashFromHashes(hashes, perms)

  /** Exact Jaccard of two sorted distinct `array<long>` hashed token sets. */
  def jaccardLong(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.SortedLongArrayJaccard(a, b)

  /** LSH band keys for a MinHash signature: `bands` hashes, each over
    * `rowsPerBand` consecutive signature entries. Emitting (bandIdx,
    * bandHash) pairs lets candidates meet through an equi-join — the
    * O(n²) pair space never materializes. */
  def minhashBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), b).as("bucket")))

  /** 64-bit SimHash of the token set: per-bit vote of each token's
    * md5-prefix bits, packed into one long — the native
    * [[org.apache.spark.sql.graft.SimHash64]] expression (md5 rather than
    * xxhash64 so the whole algorithm mirrors into an exact SQL oracle).
    * Hamming distance between SimHashes approximates token-set
    * dissimilarity. */
  def simhash(tokenSet: Column): Column =
    org.apache.spark.sql.graft.TextSignatures.simhash64(tokenSet)

  /** Hamming distance between two packed 64-bit SimHashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
