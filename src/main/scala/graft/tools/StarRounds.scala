package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dev-only (r15): round counts of the star-contraction loop on the
  * graphs the bench actually runs it over — dd15's rep graph and the
  * DBSCAN core graphs — to size the action-economy of the certificate
  * cadence. Usage: runMain graft.tools.StarRounds [sfDir] */
object StarRounds {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.get()
    // dd15's rep graph
    val (groups, repPairs) = Dedup.prefixRepPairs(s, d)
    val reps = groups.select(col("rep_id"))
    val (_, r1) = Dedup.starComponentsWithRounds(reps, repPairs)
    println(s"[rounds] dd15 rep graph: $r1")
    // cl03's core graph shape: exact eps pairs on the capped slice
    import graft.functions.VectorOps
    val e = graft.Tables.load(s, d, "embeddings")
      .filter(col("vec_id") < 1000)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
    val a = e.select(col("vec_id").as("a_id"), col("v").as("a_v"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("b_v"))
    val pairs = a.join(b, col("a_id") < col("b_id"))
      .filter(VectorOps.cosineD(col("a_v"), col("b_v")) >= 0.35)
      .select(col("a_id").as("ra"), col("b_id").as("rb"))
      .localCheckpoint()
    val nodes = pairs.select(col("ra").as("rep_id"))
      .unionAll(pairs.select(col("rb").as("rep_id"))).distinct()
    val (_, r2) = Dedup.starComponentsWithRounds(nodes, pairs)
    println(s"[rounds] cl03 eps graph: $r2")
    s.stop()
  }
}
