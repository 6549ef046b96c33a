package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives as composable Columns.
  *
  * Everything is built from Spark's codegen'd higher-order array functions
  * (`zip_with` / `aggregate` / `transform`) — no UDFs, so whole-stage
  * codegen stays intact around them. Floats are widened to double BEFORE
  * any arithmetic: double accumulation in array order is deterministic and
  * matches DuckDB's behavior bit-for-bit, which the similarity oracles
  * rely on.
  */
object VectorOps {

  /** Cast array<float> → array<double> (exact widening). Do this ONCE per
    * row before any pairwise join — casting inside a pair expression would
    * re-allocate per pair. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential-order dot product of two `array<double>` columns — the
    * native codegen'd [[ArrayDotProduct]] expression (a `zip_with` +
    * `aggregate` formulation evaluates its lambdas interpreted and was the
    * bottleneck of every O(pairs) similarity operator). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ArrayDotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two float-array embeddings (casts per pair —
    * prefer [[cosineD]] over pre-cast double arrays in pairwise joins). */
  def cosine(a: Column, b: Column): Column = cosineD(asDouble(a), asDouble(b))

  /** Cosine similarity of two pre-cast `array<double>` columns: three
    * native dot products, fully inside whole-stage codegen. */
  def cosineD(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Multi-table random-hyperplane LSH keys: `tables` independent hash
    * tables, each a `bitsPerTable`-bit sign pattern against deterministic
    * pseudo-random hyperplanes (xxhash64-derived in (plane, dim)). Returns
    * an array of (table, bucket) structs for `explode` + equi-join.
    *
    * At 100 TB this is the scale path for similarity search: vectors
    * hash-partition by (table, bucket), so candidate generation is an
    * equi-join instead of an O(n²) cross product. More tables → higher
    * recall, linearly more candidate volume: the standard LSH trade.
    */
  def rpLshTables(v: Column, tables: Int, bitsPerTable: Int, seed: Int = 42): Column = {
    require(tables * bitsPerTable <= 63, "total planes must fit a long")
    val vd = asDouble(v)
    // component (p, j) of plane p: xxhash64-derived uniform in [-1, 1]
    def planeComponent(p: Column, j: Column): Column =
      (pmod(xxhash64(lit(seed), p, j), lit(2000001L)) - lit(1000000L)) / lit(1000000.0)
    transform(sequence(lit(0), lit(tables - 1)), t => {
      val bits = transform(sequence(lit(0), lit(bitsPerTable - 1)), b => {
        val p = t * bitsPerTable + b
        val prods = zip_with(
          vd,
          sequence(lit(0), size(vd) - 1),
          (x, j) => x * planeComponent(p, j))
        val d = aggregate(prods, lit(0.0), (acc, x) => acc + x)
        when(d >= 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))
      })
      struct(t.as("table"),
        aggregate(bits, lit(0L), (acc, b) => acc.bitwiseOR(b)).as("bucket"))
    })
  }
}
