package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.TextOps._
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the dd04 pipeline at a given sf. */
object Dd04Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.get()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dd04] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val perms = 160; val bands = 20; val rows = perms / bands
    val w = Tables.load(s, d, "documents")
      .select(col("doc_id"), tokenSetHashes(tokens(col("text"))).as("ws"))
    time("tokenSets count")(w.count())
    val groups = w.groupBy(col("ws"))
      .agg(min(col("doc_id")).as("rep_id"), collect_list(col("doc_id")).as("members"))
      .cache()
    time("groups count")(groups.count())
    val reps = groups.select(col("rep_id"), col("ws"))
      .withColumn("sig", minhashFromHashes(col("ws"), perms))
    time("signatures count")(reps.count())
    val banded = reps.select(col("rep_id"), col("ws"),
        explode(minhashBands(col("sig"), bands, rows)).as("bk"))
      .select(col("rep_id"), col("ws"),
        col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val repPairs = banded
      .select(col("band"), col("bucket"), col("rep_id").as("ra"), col("ws").as("a_ws"))
      .join(banded.select(col("band"), col("bucket"),
        col("rep_id").as("rb"), col("ws").as("b_ws")), Seq("band", "bucket"))
      .filter(col("ra") < col("rb"))
      .select(col("ra"), col("rb"), jaccardLong(col("a_ws"), col("b_ws")).as("jac"))
      .filter(col("jac") >= 0.9)
      .distinct().cache()
    time("verified count")(println("  n_verified=" + repPairs.count()))
    val membership = groups.select(col("rep_id"), explode(col("members")).as("doc_id"))
    val withinGroup = membership.select(col("rep_id"), col("doc_id").as("a_id"))
      .join(membership.select(col("rep_id"), col("doc_id").as("b_id")), "rep_id")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(1.0).as("jac"))
    val crossGroup = repPairs
      .join(membership.select(col("rep_id").as("ra"), col("doc_id").as("x")), "ra")
      .join(membership.select(col("rep_id").as("rb"), col("doc_id").as("y")), "rb")
      .select(least(col("x"), col("y")).as("a_id"),
        greatest(col("x"), col("y")).as("b_id"), col("jac"))
    time("expansion count")(println("  n_out=" + withinGroup.unionAll(crossGroup).count()))
    s.stop()
  }
}
