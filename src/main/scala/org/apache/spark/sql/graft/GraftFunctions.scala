package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration for the engine's native kernels, injected via
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftFunctions` — the
  * idiomatic way a Spark library exposes custom `Expression`s to SQL users
  * without forking the session builder:
  *
  * {{{
  *   SELECT sorted_array_jaccard(sort_array(array_distinct(a)),
  *                               sort_array(array_distinct(b)))
  *   SELECT minhash_from_hashes(token_set_hashes(split(text, ' ')), 128)
  * }}}
  *
  * Scalar-parameter arguments (permutations, tables, bits) must be integer
  * literals — they size per-instance state at plan time.
  */
class GraftFunctions extends (SparkSessionExtensions => Unit) {

  import GraftFunctions._

  override def apply(ext: SparkSessionExtensions): Unit =
    registrations.foreach { case (name, _, builder) =>
      // 3-arg constructor: the 5-arg usage/examples form is deprecated and
      // the full 11-arg form demands doc-format invariants; usage strings
      // stay in `registrations` for README/help tooling
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftFunctions].getName, null, name),
        builder))
    }
}

object GraftFunctions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  /** (name, usage, builder) for every SQL-exposed kernel. */
  val registrations: Seq[(String, String, FunctionBuilder)] = Seq(
    ("sorted_array_jaccard",
      "_FUNC_(a, b) - exact Jaccard of two sorted distinct array<string>",
      args => { arity("sorted_array_jaccard", args, 2)
        SortedArrayJaccard(args(0), args(1)) }),
    ("sorted_long_array_jaccard",
      "_FUNC_(a, b) - exact Jaccard of two sorted distinct array<long>",
      args => { arity("sorted_long_array_jaccard", args, 2)
        SortedLongArrayJaccard(args(0), args(1)) }),
    ("token_set_hashes",
      "_FUNC_(tokens) - token set as sorted distinct xxhash64 longs",
      args => { arity("token_set_hashes", args, 1)
        TokenSetHashes(args(0)) }),
    ("minhash_signature",
      "_FUNC_(tokens, perms) - MinHash signature of a token array",
      args => { arity("minhash_signature", args, 2)
        MinHashSignature(args(0), intLit(args(1), "minhash_signature", "perms")) }),
    ("minhash_from_hashes",
      "_FUNC_(hashes, perms) - MinHash signature over pre-hashed tokens",
      args => { arity("minhash_from_hashes", args, 2)
        MinHashFromHashes(args(0), intLit(args(1), "minhash_from_hashes", "perms")) }),
    ("simhash64",
      "_FUNC_(tokens) - 64-bit SimHash of a token array",
      args => { arity("simhash64", args, 1)
        SimHash64(args(0)) }),
    ("bigrams",
      "_FUNC_(tokens) - adjacent-token bigrams of a token array",
      args => { arity("bigrams", args, 1)
        Bigrams(args(0)) }),
    ("array_dot_product",
      "_FUNC_(a, b) - dot product of two array<double>",
      args => { arity("array_dot_product", args, 2)
        ArrayDotProduct(args(0), args(1)) }),
    ("rp_lsh_keys",
      "_FUNC_(vec, tables, bits, seed, radius) - packed (table<<bits)|bucket " +
        "random-hyperplane LSH keys of an array<double>; radius 1 adds all " +
        "hamming-1 probe buckets",
      args => { arity("rp_lsh_keys", args, 5)
        new RandomHyperplaneLshProbes(args(0),
          intLit(args(1), "rp_lsh_keys", "tables"),
          intLit(args(2), "rp_lsh_keys", "bits"),
          intLit(args(3), "rp_lsh_keys", "seed").toLong,
          intLit(args(4), "rp_lsh_keys", "radius")) }),
    ("nearest_cells",
      "_FUNC_(vec, codebook, nprobe) - positions of the nprobe nearest " +
        "codebook cells by cosine (codebook must be a literal array<array<double>>)",
      args => { arity("nearest_cells", args, 3)
        new NearestCells(args(0), args(1),
          intLit(args(2), "nearest_cells", "nprobe")) }),
    ("mmr_select",
      "_FUNC_(cands, k, relWeight, divWeight) - greedy MMR selection over " +
        "array<struct<id:long, cos:double, v:array<double>>>: picks k by " +
        "relWeight*rel_u - divWeight*max_sim_u (cosines quantized once to " +
        "1e-6 integer units), ties toward the lower id",
      args => { arity("mmr_select", args, 4)
        new MmrSelect(args(0),
          intLit(args(1), "mmr_select", "k"),
          intLit(args(2), "mmr_select", "relWeight"),
          intLit(args(3), "mmr_select", "divWeight")) })
  )
}
