package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only: per-round timing of dd09's label propagation. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = GraftSession.get()
    val t00 = System.nanoTime()
    val pairs = graft.SparkEntry.queries("dd07_prefix_join")(s, d)
      .select(col("a_id"), col("b_id"))
    val edges = pairs.select(col("a_id").as("u"), col("b_id").as("v"))
      .unionAll(pairs.select(col("b_id").as("u"), col("a_id").as("v")))
      .localCheckpoint()
    println(f"[cc] edges=${edges.count()} build=${(System.nanoTime()-t00)/1e9}%.1fs")
    var labels = graft.Tables.load(s, d, "documents")
      .select(col("doc_id"), col("doc_id").as("comp_id")).localCheckpoint()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < 50) {
      val t0 = System.nanoTime()
      val nbrMin = edges.join(labels.withColumnRenamed("doc_id", "u"), "u")
        .groupBy(col("v").as("doc_id")).agg(min(col("comp_id")).as("nbr_min"))
      val hop = labels.withColumnRenamed("comp_id", "prev")
        .join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("prev"), coalesce(col("nbr_min"), col("prev"))).as("comp_id"),
          col("prev"))
      // pointer jump: adopt the label of one's label (halves diameter)
      val next = hop.join(
          hop.select(col("doc_id").as("comp_id"), col("comp_id").as("jump")),
          Seq("comp_id"), "left")
        .select(col("doc_id"),
          least(col("comp_id"), coalesce(col("jump"), col("comp_id"))).as("comp_id"),
          col("prev"))
        .localCheckpoint()
      changed = next.filter(col("comp_id") =!= col("prev")).count()
      labels = next.select(col("doc_id"), col("comp_id"))
      round += 1
      println(f"[cc] round=$round changed=$changed ${(System.nanoTime()-t0)/1e9}%.1fs")
    }
    s.stop()
  }
}
