package graft.tools
import graft.{GraftSession, SparkEntry}

/** Dev-only: run dd04 twice end-to-end (cold + cached) at a given sf.
  * RELOC=false disables MapStatus relocation — the knob that isolated the
  * reduce-locality starvation deadlock (see SCALE.md §1 Locality). */
object Dd04Once {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.builder()
      .config("spark.shuffle.cloud.relocateMapStatus",
        sys.env.getOrElse("RELOC", "true"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("dd04_minhash_lsh_pairs")(s, d).count()
      println(f"[dd04once] run$i n=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    s.stop()
  }
}
