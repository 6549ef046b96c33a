package graft.tools
import graft.SparkEntry
object KeyCheck {
  def main(args: Array[String]): Unit = {
    val mods = Seq(
      "Relational" -> graft.operators.Relational.queries.keySet,
      "Dedup" -> graft.operators.Dedup.queries.keySet,
      "Similarity" -> graft.operators.Similarity.queries.keySet,
      "TextAnalysis" -> graft.operators.TextAnalysis.queries.keySet,
      "Multimodal" -> graft.operators.Multimodal.queries.keySet,
      "StreamingQueries" -> graft.operators.StreamingQueries.queries.keySet)
    val sum = mods.map(_._2.size).sum
    val merged = SparkEntry.queries.keySet.size
    println(s"[keycheck] per-module sum=$sum merged=$merged " +
      (if (sum == merged) "OK" else "COLLISION!"))
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    println(s"[keycheck] oracles without queries: $orphans")
  }
}
