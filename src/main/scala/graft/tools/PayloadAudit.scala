package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Dev audit: list every batch query whose physical plan contains a
  * shuffle exchange carrying a document-body / token-array / embedding
  * column — the columns that should be reduced to hashes or scalars
  * map-side before any exchange (the pp01/pp05 discipline). Reads the
  * pre-execution plan only (no query runs); streaming entries that
  * cannot plan without a sink are skipped. Usage:
  * runMain graft.tools.PayloadAudit <sfDir>
  */
object PayloadAudit {
  private val textish = Set("text", "ctext", "body", "payload")

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case other => other +: other.children.flatMap(flatten)
  }

  /** Array and binary columns are payload wherever they appear; strings
    * only when named like a document body (scalar hash/flag strings are
    * fine). */
  private def isWide(a: org.apache.spark.sql.catalyst.expressions.Attribute): Boolean =
    a.dataType match {
      case _: org.apache.spark.sql.types.ArrayType => true
      case org.apache.spark.sql.types.BinaryType => true
      case org.apache.spark.sql.types.StringType => textish.contains(a.name)
      case _ => false
    }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
        val hits = flatten(plan).collect {
          case e: ShuffleExchangeExec =>
            e.output.filter(isWide).map(a => s"${a.name}:${a.dataType.simpleString}")
        }.filter(_.nonEmpty)
        if (hits.nonEmpty)
          println(s"WIDE $name: ${hits.map(_.mkString("[", ",", "]")).mkString(" ")}")
      } catch {
        case _: Throwable => () // streaming-only entries cannot plan here
      }
    }
    println("audit done")
    spark.stop()
  }
}
