package graft.tools
import graft.GraftSession
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val s = GraftSession.get("8")
    val exact = graft.SparkEntry.queries("dd06_embedding_neardup")(s, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sem = graft.SparkEntry.queries("dd10_semantic_dedup")(s, d)
      .collect().filter(r => r.getLong(0) < 500 && r.getLong(1) < 500)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[recall] exact=${exact.size} sem=${sem.size} " +
      s"inter=${sem.intersect(exact).size} fp=${sem.diff(exact).size} " +
      s"recall=${sem.intersect(exact).size.toDouble / exact.size}")
    val ivf = graft.SparkEntry.queries("ss04_ann_ivf_topk")(s, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val topk = graft.SparkEntry.queries("ss01_cosine_topk")(s, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[recall] ivf recall@5=${ivf.intersect(topk).size.toDouble / topk.size}")
    s.stop()
  }
}
