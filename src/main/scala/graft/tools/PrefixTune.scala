package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.TextOps._
import org.apache.spark.sql.functions._

/** Dev-only: candidate-pair count of dd07's prefix blocking under hash
  * order vs ascending-global-frequency order (the AllPairs refinement). */
object PrefixTune {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = GraftSession.get()
    val w = Tables.load(s, d, "documents")
      .select(col("doc_id"), tokenSetHashes(tokens(col("text"))).as("th"))
    val reps = w.groupBy(col("th")).agg(min(col("doc_id")).as("rep_id"))
      .select(col("rep_id"), col("th"), size(col("th")).as("n")).cache()
    reps.count()
    val plen = (col("n") - ceil(col("n") * lit(9.0) / lit(10.0)) + lit(1)).cast("int")
    def count(pref: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val c = pref.select(col("ptok"), col("rep_id").as("ra"), col("n").as("na"))
        .join(pref.select(col("ptok"), col("rep_id").as("rb"), col("n").as("nb")), Seq("ptok"))
        .filter(col("ra") < col("rb") &&
          col("na") * lit(9) <= col("nb") * lit(10) &&
          col("nb") * lit(9) <= col("na") * lit(10))
        .select(col("ra"), col("rb")).distinct().count()
      println(s"[prefix] $tag candidates=$c")
    }
    count(reps.withColumn("plen", plen)
      .select(col("rep_id"), col("n"), explode(slice(col("th"), lit(1), col("plen"))).as("ptok")),
      "hash-order")
    val tokDf = reps.select(explode(col("th")).as("tok"))
      .groupBy(col("tok")).agg(org.apache.spark.sql.functions.count(lit(1)).as("df"))
    count(reps.select(col("rep_id"), col("n"), explode(col("th")).as("tok"))
      .join(broadcast(tokDf), "tok")
      .groupBy(col("rep_id"), col("n"))
      .agg(transform(array_sort(collect_list(struct(col("df"), col("tok")))),
        st => st.getField("tok")).as("otoks"))
      .withColumn("plen", plen)
      .select(col("rep_id"), col("n"), explode(slice(col("otoks"), lit(1), col("plen"))).as("ptok")),
      "freq-order")
    s.stop()
  }
}
