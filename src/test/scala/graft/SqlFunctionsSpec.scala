package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native kernels are reachable from plain SQL through
  * `spark.sql.extensions` (SparkSessionExtensions.injectFunction). */
class SqlFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("sql-functions-spec")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftFunctions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("jaccard + hashing kernels are callable from SQL") {
    val r = spark.sql(
      """SELECT sorted_array_jaccard(array('a', 'b', 'c'), array('b', 'c', 'd')) AS j,
        |       sorted_long_array_jaccard(array(1L, 2L), array(2L, 3L)) AS jl,
        |       size(token_set_hashes(array('x', 'y', 'x'))) AS n,
        |       size(minhash_signature(array('x', 'y'), 8)) AS p,
        |       size(minhash_from_hashes(token_set_hashes(array('x', 'y')), 8)) AS ph,
        |       simhash64(array('x', 'y')) AS sh,
        |       array_dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp
        |""".stripMargin).head()
    assert(r.getDouble(0) == 0.5)
    assert(r.getDouble(1) == 1.0 / 3.0)
    assert(r.getInt(2) == 2)
    assert(r.getInt(3) == 8)
    assert(r.getInt(4) == 8)
    assert(r.getDouble(6) == 11.0)
  }

  test("lsh + ivf kernels are callable from SQL") {
    val r = spark.sql(
      """SELECT size(rp_lsh_keys(array(1.0D, -2.0D, 0.5D), 4, 3, 42, 0)) AS base,
        |       size(rp_lsh_keys(array(1.0D, -2.0D, 0.5D), 4, 3, 42, 1)) AS probes,
        |       nearest_cells(array(1.0D, 0.0D),
        |                     array(array(0.0D, 1.0D), array(1.0D, 0.0D)), 1) AS cells
        |""".stripMargin).head()
    assert(r.getInt(0) == 4)
    assert(r.getInt(1) == 4 * (3 + 1))
    assert(r.getSeq[Int](2) == Seq(1), "cosine argmax must pick the aligned cell")
  }

  test("mmr_select is callable from SQL and picks diversity over redundancy") {
    // three candidates: two near-identical high-rel vectors and one
    // orthogonal mid-rel vector — MMR must pick one of the twins, then
    // prefer the orthogonal candidate over the second twin
    val r = spark.sql(
      """SELECT mmr_select(array(
        |         named_struct('id', 1L, 'cos', 0.95D, 'v', array(1.0D, 0.0D)),
        |         named_struct('id', 2L, 'cos', 0.94D, 'v', array(1.0D, 0.01D)),
        |         named_struct('id', 3L, 'cos', 0.60D, 'v', array(0.0D, 1.0D))),
        |       2, 7, 3) AS sel
        |""".stripMargin).head().getSeq[org.apache.spark.sql.Row](0)
    assert(r.map(_.getLong(0)) == Seq(1L, 3L),
      "rank 1 = top relevance, rank 2 = the diverse candidate")
    assert(r.map(_.getInt(1)) == Seq(1, 2))
    assert(r.head.getLong(2) == 950000L, "rel_u in 1e-6 units")
    assert(r.head.getLong(3) == 7L * 950000L, "first pick scores 7*rel_u")
  }

  test("SQL results agree with the Column API") {
    import org.apache.spark.sql.functions._
    val sp = spark; import sp.implicits._
    val viaSql = spark.sql(
      "SELECT minhash_from_hashes(token_set_hashes(split('a b c d', ' ')), 16) AS s")
      .head().getSeq[Long](0)
    val viaApi = Seq("a b c d").toDF("t")
      .select(graft.functions.TextOps.minhashFromHashes(
        graft.functions.TextOps.tokenSetHashes(split(col("t"), " ")), 16).as("s"))
      .head().getSeq[Long](0)
    assert(viaSql == viaApi)
  }

  test("non-literal scalar parameter fails loudly") {
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array('x'), 1 + 7)").head()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getCause != null && e.getCause.getMessage.contains("integer literal"))
  }
}
