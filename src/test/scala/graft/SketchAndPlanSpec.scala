package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Approximate-sketch error bounds + plan-quality regression checks (the
  * ".explain and iterate" discipline, codified so it can't rot). */
class SketchAndPlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    org.apache.spark.shuffle.cloud.CloudShuffleEnv.reset()
    spark = SparkSession.builder()
      .master("local[4]").appName("sketch-plan-spec")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("approx_count_distinct stays within 5% of exact per group") {
    val approx = SparkEntry.queries("q37_approx_sketches")(spark, sf)
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val exact = Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    exact.foreach { case (flag, (p, o)) =>
      val (ap, ao) = approx(flag)
      assert(math.abs(ap - p).toDouble / p < 0.05, s"$flag parts: $ap vs $p")
      assert(math.abs(ao - o).toDouble / o < 0.05, s"$flag orders: $ao vs $o")
    }
  }

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01: filter + projection are pushed into the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), "column pruning should drop unused columns")
    assert(p.contains("HashAggregate"), p)
  }

  test("q03: dimension joins broadcast, top-k is TakeOrdered") {
    val p = plan("q03_top_orders")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), s"small-dim joins must broadcast:\n$p")
  }

  test("q05: all dimension sides of the star join broadcast") {
    val p = plan("q05_regional_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("PushedFilters"), p)
  }

  test("q16: global sort + limit becomes TakeOrderedAndProject") {
    val p = plan("q16_global_sort")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"),
      s"limit should avoid a full range-partitioned sort:\n$p")
  }

  test("q31: whole-stage codegen covers the aggregate (final AQE plan)") {
    val df = SparkEntry.queries("q31_embedding_stats")(spark, sf)
    df.collect() // AQE finalizes (and codegens) only on execution
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert(p.contains("*(1)") && p.contains("*(2)"),
      s"expected both aggregate stages inside whole-stage codegen:\n$p")
  }
}
