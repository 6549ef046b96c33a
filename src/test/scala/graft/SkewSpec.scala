package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Skew handling (SCALE.md): salting decomposes a hot join key so the
  * shuffle spreads across the cluster; AQE skew-join splits at runtime.
  * Correctness of the salted rewrite is what's asserted — identical result
  * to the naive join. */
class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    org.apache.spark.shuffle.cloud.CloudShuffleEnv.reset()
    spark = SparkSession.builder()
      .master("local[4]").appName("skew-spec")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("salted join of a skewed fact against a dim equals the naive join") {
    val ss = spark
    import ss.implicits._
    val salts = 8
    // 100k rows, 90% on one hot key
    val fact = ss.range(100000)
      .select(when(col("id") % 10 < 9, 1L).otherwise(col("id") % 1000).as("k"),
        col("id").as("v"))
    val dim = ss.range(1000).select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))

    val naive = fact.join(dim, "k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .as[(Long, Long)].head()

    // salting: explode the dim `salts` ways, salt the fact randomly-but-
    // deterministically, join on (k, salt) — the hot key's rows now land
    // on `salts` reducers instead of one
    val saltedFact = fact.withColumn("salt", pmod(xxhash64(col("v")), lit(salts)))
    val saltedDim = dim.withColumn("salt",
      explode(sequence(lit(0), lit(salts - 1)))).withColumn("salt", col("salt").cast("long"))
    val salted = saltedFact.join(saltedDim, Seq("k", "salt"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      .as[(Long, Long)].head()

    assert(salted == naive)
  }
}
