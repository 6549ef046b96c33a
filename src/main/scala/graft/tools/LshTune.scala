package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.TextOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: recall/candidate-count sweep over LSH band shapes vs the exact
  * all-pairs ground truth, at a given sf. Informs the (bands, rowsPerBand)
  * choice in Dedup.dd04 — precision drives the candidate-join cost, recall
  * must stay at 1.0 on the fixture corpus (dd04's output is checked against
  * the exact pair set).
  */
object LshTune {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = GraftSession.get()
    val w = Tables.load(s, d, "documents")
      .select(col("doc_id"), tokenSet(col("text")).as("ws"))
    val groups = w.groupBy(col("ws"))
      .agg(min(col("doc_id")).as("rep_id")).cache()
    groups.count()

    // exact rep-level ground truth (all-pairs; fine at tuning scale)
    val reps = groups.select(col("rep_id"), col("ws")).cache()
    val truth = reps.select(col("rep_id").as("ra"), col("ws").as("a_ws"))
      .join(reps.select(col("rep_id").as("rb"), col("ws").as("b_ws")),
        col("ra") < col("rb"))
      .select(col("ra"), col("rb"), jaccard(col("a_ws"), col("b_ws")).as("jac"))
      .filter(col("jac") >= 0.9)
      .select(col("ra"), col("rb")).cache()
    val nTruth = truth.count()
    println(s"[lsh] reps=${reps.count()} truePairs=$nTruth")

    for ((perms, bands) <- Seq((64, 16), (64, 8), (128, 16), (96, 12))) {
      val rows = perms / bands
      val banded = reps
        .withColumn("sig", minhashSignature(col("ws"), perms))
        .select(col("rep_id"),
          explode(minhashBands(col("sig"), bands, rows)).as("bk"))
        .select(col("rep_id"),
          col("bk.band").as("band"), col("bk.bucket").as("bucket"))
      val cand = banded.select(col("band"), col("bucket"), col("rep_id").as("ra"))
        .join(banded.select(col("band"), col("bucket"), col("rep_id").as("rb")),
          Seq("band", "bucket"))
        .filter(col("ra") < col("rb"))
        .select(col("ra"), col("rb"))
        .distinct().cache()
      val nCand = cand.count()
      val nHit = cand.join(truth, Seq("ra", "rb"), "left_semi").count()
      println(s"[lsh] perms=$perms bands=$bands rows=$rows " +
        s"candidates=$nCand recall=$nHit/$nTruth " +
        f"precision=${nHit.toDouble / math.max(nCand, 1)}%.4f")
      cand.unpersist()
    }
    s.stop()
  }
}
