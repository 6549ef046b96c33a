package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** Dev-only: recall / candidate-volume sweep for cl04's LSH-blocked
  * DBSCAN eps-graph (eps = cos 0.35 — far below dd13's cos-0.8 regime,
  * where per-hyperplane sign agreement is only p = 1 − arccos(0.35)/π ≈
  * 0.614 vs 0.5 random). Ground truth is cl03's exact eps-graph. Also
  * prints the edge cos distribution: recall at the boundary decides
  * whether a blocked graph can be EXACT on the fixtures (the dd13
  * recall-1 justification that would let cl03's oracle gate cl04
  * verbatim) or must ship with a measured sub-1 bound.
  */
object Cl04Tune {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = GraftSession.get()
    val e = Tables.load(s, d, "embeddings")
      .filter(col("vec_id") < 1000)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .cache()
    val n = e.count()
    val a = e.select(col("vec_id").as("a_id"), col("v").as("a_v"))
    val b = e.select(col("vec_id").as("b_id"), col("v").as("b_v"))
    val truth = a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        VectorOps.cosineD(col("a_v"), col("b_v")).as("cos"))
      .filter(col("cos") >= 0.35)
      .cache()
    val nTruth = truth.count()
    println(s"[cl04] n=$n allPairs=${n * (n - 1) / 2} epsEdges=$nTruth")
    truth.select(floor(col("cos") * 20).as("bin"))
      .groupBy("bin").count().orderBy("bin").collect()
      .foreach(r => println(f"[cl04] cos[${r.getLong(0) / 20.0}%.2f,)" +
        f" edges=${r.getLong(1)}"))

    for ((tables, bits) <- Seq((8, 6), (16, 8), (24, 8), (48, 10),
        (96, 12), (64, 10))) {
      val cand = graft.operators.Dedup.lshCandidatePairs(e, tables, bits)
        .distinct().cache()
      val nCand = cand.count()
      val hits = cand.join(truth, Seq("a_id", "b_id"), "inner").cache()
      val nHit = hits.count()
      val minMissCos = truth.join(cand, Seq("a_id", "b_id"), "left_anti")
        .agg(max(col("cos")).as("worstMissedCos")).collect().head
      println(f"[cl04] tables=$tables bits=$bits cand=$nCand " +
        f"(${nCand.toDouble / (n * (n - 1) / 2)}%.4f of pairs) " +
        f"recall=$nHit/$nTruth (${nHit.toDouble / math.max(nTruth, 1)}%.4f) " +
        s"worstMissedCos=${minMissCos.get(0)}")
      cand.unpersist(); hits.unpersist()
    }
    s.stop()
  }
}
