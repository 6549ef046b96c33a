package graft

import graft.functions.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the hashed-token-set kernels (TokenSetHashes,
  * MinHashFromHashes, SortedLongArrayJaccard) that dd04/dd07/tx05 rely on.
  */
class HashedSetExprSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("hashed-set-expr-spec")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val rng = new scala.util.Random(7)
  private def randomDoc(): String =
    Seq.fill(5 + rng.nextInt(40))("w" + rng.nextInt(60)).mkString(" ")

  test("tokenSetHashes is sorted, distinct, and counts the distinct tokens") {
    val sp = spark; import sp.implicits._
    val docs = Seq.fill(200)(randomDoc()).toDF("text")
    val rows = docs.select(
        TextOps.tokenSetHashes(TextOps.tokens(col("text"))).as("th"),
        size(TextOps.tokenSet(col("text"))).as("n_distinct"))
      .collect()
    rows.foreach { r =>
      val th = r.getSeq[Long](0)
      assert(th == th.sorted, "hashes must be ascending")
      assert(th.distinct.size == th.size, "hashes must be unique")
      assert(th.size == r.getInt(1), "one hash per distinct token")
    }
  }

  test("jaccardLong over hashed sets equals string-set jaccard") {
    val sp = spark; import sp.implicits._
    val docs = Seq.tabulate(80)(i => (i.toLong, randomDoc())).toDF("id", "text")
      .select(col("id"),
        TextOps.tokenSet(col("text")).as("ws"),
        TextOps.tokenSetHashes(TextOps.tokens(col("text"))).as("th"))
    val a = docs.select(col("id").as("a_id"), col("ws").as("a_ws"), col("th").as("a_th"))
    val b = docs.select(col("id").as("b_id"), col("ws").as("b_ws"), col("th").as("b_th"))
    val both = a.join(b, col("a_id") < col("b_id"))
      .select(
        TextOps.jaccard(col("a_ws"), col("b_ws")).as("js"),
        TextOps.jaccardLong(col("a_th"), col("b_th")).as("jh"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"string jac ${r.getDouble(0)} != hashed jac ${r.getDouble(1)}"))
  }

  test("minhashFromHashes matches a direct reimplementation and is permutation-sane") {
    val sp = spark; import sp.implicits._
    def splitmix(p: Long): Long = {
      var z = p + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def fmix(x0: Long): Long = {
      var x = x0
      x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
      x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
      x ^ (x >>> 33)
    }
    val perms = 16
    val rows = Seq.fill(50)(randomDoc()).toDF("text")
      .select(
        TextOps.tokenSetHashes(TextOps.tokens(col("text"))).as("th"),
        TextOps.minhashFromHashes(
          TextOps.tokenSetHashes(TextOps.tokens(col("text"))), perms).as("sig"))
      .collect()
    rows.foreach { r =>
      val th = r.getSeq[Long](0)
      val sig = r.getSeq[Long](1)
      assert(sig.size == perms)
      val expected = (0 until perms).map { p =>
        val z = splitmix(p.toLong)
        th.map(h => fmix(h ^ z)).min
      }
      assert(sig == expected, "signature must equal the direct computation")
    }
    // distinct permutations should not all collapse to the same ordering
    val firstTwo = rows.map(r => (r.getSeq[Long](1)(0), r.getSeq[Long](1)(1)))
    assert(firstTwo.map(_._1).distinct.size > 1)
  }

  test("rp-lsh probes: packed keys, base subset, and exactly hamming-1 flips") {
    import graft.functions.VectorOps
    val tables = 6
    val bits = 10
    val df = spark.range(50).selectExpr(
      "id", "transform(sequence(0, 15), j -> cast(sin(id * 31 + j) as double)) as v")
      .select(col("id"),
        VectorOps.rpLshTables(col("v"), tables, bits).as("base"),
        VectorOps.rpLshProbes(col("v"), tables, bits).as("probes"))
    df.collect().foreach { r =>
      val base = r.getSeq[Long](1)
      val probes = r.getSeq[Long](2)
      assert(base.length == tables)
      assert(probes.length == tables * (bits + 1))
      // base keys decode to (table, bucket) with table in range
      base.zipWithIndex.foreach { case (k, t) =>
        assert((k >> bits) == t, "table id must pack above the bucket bits")
        assert((k & ((1L << bits) - 1)) == (k ^ (t.toLong << bits)))
      }
      // probe set per table = the base bucket + every single-bit flip
      val byTable = probes.grouped(bits + 1).toSeq
      byTable.zipWithIndex.foreach { case (ps, t) =>
        val b = base(t) & ((1L << bits) - 1)
        val expected = (b +: (0 until bits).map(f => b ^ (1L << f)))
          .map(x => (t.toLong << bits) | x)
        assert(ps == expected,
          s"table $t probes must be base + hamming-1 flips in flip order")
      }
    }
  }

  test("nearest-cells argmax matches a brute-force cosine ranking") {
    import org.apache.spark.sql.graft.NearestCells
    val cells: Seq[Seq[Double]] = Seq(
      Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0),
      Seq(0.5, 0.5, 0.0))
    val df = spark.range(200).selectExpr(
      "id",
      "array(cast(cos(id) as double), cast(sin(id) as double), " +
        "cast(sin(id * 0.7) as double)) as v")
      .select(col("id"), col("v"),
        NearestCells(col("v"), typedlit(cells), 2).as("top2"))
    df.collect().foreach { r =>
      val v = r.getSeq[Double](1)
      def score(c: Seq[Double]): Double = {
        val dot = v.zip(c).map { case (a, b) => a * b }.sum
        dot / math.sqrt(c.map(x => x * x).sum)
      }
      // brute force: argsort by (score desc, index asc)
      val expected = cells.indices
        .sortBy(i => (-score(cells(i)), i)).take(2)
      assert(r.getSeq[Int](2) == expected, s"row ${r.getLong(0)}")
    }
  }

  test("nearest-cells is total on adversarial input (NaN vectors, zero cells)") {
    import org.apache.spark.sql.graft.NearestCells
    val cells: Seq[Seq[Double]] = Seq(Seq(0.0, 0.0), Seq(1.0, 0.0))
    // NaN components make every score comparison false; the selection must
    // still return nprobe valid positions (lowest untaken first), not crash
    val rows = spark.sql(
      "SELECT array(cast('NaN' as double), cast(1.0 as double)) AS v")
      .select(NearestCells(col("v"), typedlit(cells), 2).as("top"))
      .collect()
    assert(rows.head.getSeq[Int](0).sorted == Seq(0, 1))
  }

  test("jaccardLong edges: identical -> 1, disjoint -> 0, empty vs empty -> 1") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 1.0),
      (Seq(1L, 2L), Seq(3L, 4L), 0.0),
      (Seq.empty[Long], Seq.empty[Long], 1.0),
      (Seq(-5L, 10L), Seq(-5L, 99L), 1.0 / 3.0)
    ).toDF("a", "b", "expected")
    df.select(TextOps.jaccardLong(col("a"), col("b")).as("jac"), col("expected"))
      .collect()
      .foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }
}
