package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Similarity, StreamingQueries}
import org.apache.spark.sql.functions._

/** Dev-only (VERDICT r13 item 5): serve latency vs REQUEST-BATCH SIZE for
  * the double-index streaming serve (ss15). The corpus-decade axis of the
  * "request-proportional" claim is proven (ScaleProbe's flat ss14/ss15
  * rows); this probe pins the other axis — one drain of a single
  * micro-batch of 1 / 10 / 100 query vectors through the shipped
  * [[Similarity.hybridServeIndexed]] path, median-of-3 per cell, at two
  * corpus tiers (a batch-size curve that moved with corpus size would
  * falsify the claim from the other side). A warmup drain per tier runs
  * first so the one-time index builds and partition discovery bill to no
  * cell (the Bench median-of-3 convention, stated in the artifact).
  */
object Ss15BatchProbe {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val jsonRows = Seq.newBuilder[String]
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      def drain(nq: Int): Unit = {
        val qsrc = Tables.load(s, d, "embeddings")
          .filter(col("vec_id") < nq)
          .select(col("vec_id"), col("embedding"))
        StreamingQueries.drainForeachBatch(s, Seq(qsrc))(
            Similarity.hybridServeIndexed(s, d, _))
          .write.format("noop").mode("overwrite").save()
      }
      drain(1) // warmup: index builds + discovery, billed to no cell
      for (nq <- Seq(1, 10, 100)) {
        val walls = (1 to 3).map { _ =>
          System.gc()
          val t0 = System.nanoTime()
          drain(nq)
          (System.nanoTime() - t0) / 1e9
        }
        val med = walls.sorted.apply(1)
        println(f"[ss15batch] $d nq=$nq med=$med%.2f s " +
          f"(all: ${walls.map(w => f"$w%.2f").mkString(", ")})")
        jsonRows += f"""{"sf_dir":"$d","batch_queries":$nq,""" +
          f""""wall_med_s":$med%.3f,"wall_min_s":${walls.min}%.3f,""" +
          f""""wall_max_s":${walls.max}%.3f}"""
      }
    }
    val json = s"""{"metric":"ss15_serve_batch","method":"median3-warm",""" +
      s""""note":"one micro-batch drain of N query vectors through the """ +
      s"""shipped double-index serve (hybridServeIndexed); warmup drain """ +
      s"""per tier absorbs index builds","rows":[${
        jsonRows.result().mkString(",")}]}"""
    val out = java.nio.file.Paths.get("target/ss15_batch.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    s.stop()
  }
}
