package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev probe: where does a warm ss08 serve spend its time?
  * Phases: memoized index dir (0 after build), probe-key derivation
  * (collect), pruned read + verify + top-k (count). */
object ServeProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.get()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[serve] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    (1 to 3).foreach { i =>
      println(s"--- pass $i")
      val dir = t("lshIndexDir")(graft.operators.Similarity.lshIndexDir(spark, d))
      t("index listing")(spark.read.parquet(dir).queryExecution.logical)
      t("full serve count")(
        graft.SparkEntry.queries("ss08_ann_index_serve")(spark, d).count())
    }
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(
      graft.operators.Similarity.lshIndexDir(spark, d)))
      .filter(p => p.getFileName.toString.startsWith("part-")).count()
    println(s"[serve] index part files: $files")
    spark.stop()
  }
}
