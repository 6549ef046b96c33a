package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

/** Dev-only: recall / candidate-volume sweep over random-hyperplane LSH
  * shapes for dd08, against the exact all-pairs cos ≥ 0.4 ground truth
  * (brute force — fine at tuning scale). Candidate fraction is reported
  * against n·(n-1)/2 so configs are comparable across scale factors.
  *
  * Context for the sweep (measured on the fixtures): true pairs hug the
  * 0.4 threshold (at sf0.1, 906 of 920 pairs lie in cos [0.4, 0.5)), where
  * the per-hyperplane sign-match probability is only p ≈ 0.63 vs 0.5 for
  * random pairs — so candidate volume at fixed recall shrinks by just
  * (0.5/0.63)^bit ≈ 0.79 per added bit. Multi-probe (radius 1) buys
  * ~(1 + b(1-p)/p)× per-table recall for (b+1)·2^-b random collisions,
  * strictly better than adding tables.
  */
object VecLshTune {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = GraftSession.get()
    val e = Tables.load(s, d, "embeddings")
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v")).cache()
    val n = e.count()
    val truth = e.select(col("vec_id").as("a_id"), col("v").as("a_v"))
      .join(e.select(col("vec_id").as("b_id"), col("v").as("b_v")),
        col("a_id") < col("b_id"))
      .filter(VectorOps.cosineD(col("a_v"), col("b_v")) >= 0.4)
      .select(col("a_id"), col("b_id")).cache()
    val nTruth = truth.count()
    val nPairs = n * (n - 1) / 2
    println(s"[veclsh] n=$n truePairs=$nTruth allPairs=$nPairs")

    for ((tables, bits, radius) <- Seq(
      (128, 15, 1), (160, 15, 1), (128, 14, 1), (192, 16, 1))) {
      val index = e.select(col("vec_id").as("b_id"),
        explode(VectorOps.rpLshTables(col("v"), tables, bits)).as("tbk"))
      val probe =
        if (radius == 0) index.select(col("b_id").as("a_id"), col("tbk"))
        else e.select(col("vec_id").as("a_id"),
          explode(VectorOps.rpLshProbes(col("v"), tables, bits)).as("tbk"))
      val cand = probe.join(index, Seq("tbk"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"))
        .distinct().cache()
      val nCand = cand.count()
      val nHit = cand.join(truth, Seq("a_id", "b_id"), "left_semi").count()
      println(f"[veclsh] tables=$tables bits=$bits radius=$radius " +
        f"cand=$nCand (${nCand.toDouble / nPairs}%.4f of pairs) " +
        f"recall=$nHit/$nTruth (${nHit.toDouble / math.max(nTruth, 1)}%.3f)")
      cand.unpersist()
    }
    s.stop()
  }
}
