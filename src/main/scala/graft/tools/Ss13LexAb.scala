package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Similarity, StreamingQueries}
import org.apache.spark.sql.functions._

/** Dev-only: the r13 serving-lane A/B — the streaming hybrid drain with
  * the lexical lane as (a) the retired r12 corpus-rescan shape
  * (re-tokenize + re-aggregate postings/df per micro-batch) vs (b) the
  * shipped postings-index probe, at the fixture tier and the derived
  * ×10 streaming tier. Median-of-3 per cell (the served lane's one-time
  * index build rides the first rep). Quantifies VERDICT r12 item 1's
  * payoff where it lives — per-drain cost at growing corpus size.
  */
object Ss13LexAb {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dirs = Seq("/root/testdata/sf0.01", "/tmp/graft-sf1-stream")
      .filter(d => new java.io.File(d).exists)
    for (d <- dirs; (label, served) <- Seq(
        "corpus-rescan" -> false, "index-served" -> true)) {
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val qsrc = Tables.load(s, d, "embeddings")
          .filter(col("vec_id") < 10).select(col("vec_id"), col("embedding"))
        StreamingQueries.drainForeachBatch(s, Seq(
            qsrc.filter(col("vec_id") < 4),
            qsrc.filter(col("vec_id") >= 4)))(b =>
            Similarity.hybridRrf(s, d, b.select(col("vec_id").as("q_id")),
              servedLex = served))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ss13ab] $d $label med=${walls.sorted.apply(1)}%.2f s " +
        f"(all: ${walls.map(w => f"$w%.2f").mkString(", ")})")
    }
    s.stop()
  }
}
