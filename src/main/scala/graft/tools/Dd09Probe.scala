package graft.tools

import graft.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: per-round timing of dd09's rep-graph label propagation,
  * comparing the shipped two-hop loop against hop+pointer-jump.
  * Usage: runMain graft.tools.Dd09Probe [sfDir] [algo: twohop|jump]
  */
object Dd09Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val algo = args.lift(1).getOrElse("twohop")
    val s = GraftSession.get()
    val t00 = System.nanoTime()
    val (groups, repPairs) = graft.operators.Dedup.prefixRepPairs(s, d)
    val copart = args.lift(2).contains("cp")
    val nPart = s.sparkContext.defaultParallelism
    val edges0 = repPairs.select(explode(array(
        struct(col("ra").as("u"), col("rb").as("v")),
        struct(col("rb").as("u"), col("ra").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val edges = (if (copart) edges0.repartition(nPart, col("u")) else edges0)
      .localCheckpoint()
    println(f"[dd09] edges=${edges.count()} build=${(System.nanoTime() - t00) / 1e9}%.1fs")
    val labels0 = groups.select(col("rep_id"), col("rep_id").as("comp_id"))
    var labels = (if (copart) labels0.repartition(nPart, col("rep_id")) else labels0)
      .localCheckpoint()
    def hopMin(l: DataFrame): DataFrame = {
      val nbrMin = edges
        .join(l.withColumnRenamed("rep_id", "u"), "u")
        .groupBy(col("v").as("rep_id"))
        .agg(min(col("comp_id")).as("nbr_min"))
      l.withColumnRenamed("comp_id", "cur")
        .join(nbrMin, Seq("rep_id"), "left")
        .select(col("rep_id"),
          least(col("cur"), coalesce(col("nbr_min"), col("cur"))).as("comp_id"))
    }
    def jump(l: DataFrame): DataFrame = {
      l.join(l.select(col("rep_id").as("comp_id"), col("comp_id").as("j")),
          Seq("comp_id"), "left")
        .select(col("rep_id"),
          least(col("comp_id"), coalesce(col("j"), col("comp_id"))).as("comp_id"))
    }
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val t0 = System.nanoTime()
      val stepped = algo match {
        case "jump" => jump(hopMin(labels))
        case "h4"   => hopMin(hopMin(hopMin(hopMin(labels))))
        case "h3j"  => jump(hopMin(hopMin(hopMin(labels))))
        case _      => hopMin(hopMin(labels))
      }
      val next = stepped
        .join(labels.withColumnRenamed("comp_id", "prev"), "rep_id")
        .localCheckpoint()
      changed = next.filter(col("comp_id") =!= col("prev")).count()
      labels = next.select(col("rep_id"), col("comp_id"))
      rounds += 1
      println(f"[dd09] round=$rounds changed=$changed ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    println(f"[dd09] total=${(System.nanoTime() - t00) / 1e9}%.1fs algo=$algo")
    s.stop()
  }
}
