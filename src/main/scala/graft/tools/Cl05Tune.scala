package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import graft.functions.VectorOps
import graft.operators.{Clustering, Dedup}
import org.apache.spark.sql.functions._

/** Dev-only: (tables, bits) sweep for cl05's kNN-graph DBSCAN — for each
  * blocking shape, the candidate volume, eps-edge recall vs the exact
  * graph, and (the metric that matters for a bounded-degree tier) the
  * ROLE and CO-CLUSTER agreement of the full cl05 decomposition against
  * cl03's exact tier. cl04's shipped 48×10 rides as the reference row.
  * The gated entry's constants come from this sweep at sf0.01 (the gate
  * fixture); the uncapped probe lane sizes bits by corpus count instead.
  */
object Cl05Tune {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = GraftSession.get()
    val e = Tables.load(s, d, "embeddings")
      .filter(col("vec_id") < 1000)
      .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
      .cache()
    val n = e.count()
    val truth = e.select(col("vec_id").as("a_id"), col("v").as("a_v"))
      .join(e.select(col("vec_id").as("b_id"), col("v").as("b_v")),
        col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        VectorOps.cosineD(col("a_v"), col("b_v")).as("cos"))
      .filter(col("cos") >= Clustering.DbscanEps)
      .cache()
    val nTruth = truth.count()
    println(s"[cl05] n=$n allPairs=${n * (n - 1) / 2} epsEdges=$nTruth")

    // cl03's exact decomposition = ground truth for agreement
    val gt = SparkEntry.queries("cl03_dbscan")(s, d).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).sortBy(_._1)
    def coPairs(rows: Array[(Long, String, Option[Long])]): Set[(Long, Long)] = {
      val byCl = rows.collect { case (id, _, Some(c)) => (c, id) }
        .groupBy(_._1).values.map(_.map(_._2).sorted)
      byCl.flatMap(m => for (i <- m.indices; j <- (i + 1) until m.length)
        yield (m(i), m(j))).toSet
    }
    val gtPairs = coPairs(gt)
    val gtRoles = gt.map(t => t._1 -> t._2).toMap

    for ((tables, bits) <- Seq((16, 5), (16, 6), (24, 6), (16, 7), (24, 7),
        (32, 8), (48, 10))) {
      val cand = Dedup.lshCandidatePairs(e, tables, bits).distinct().cache()
      val nCand = cand.count()
      val nHit = truth.join(cand, Seq("a_id", "b_id"), "left_semi").count()
      for (k <- Seq(8, 10)) {
        val out = Clustering.dbscanKnn(s, e, tables, bits, k).collect()
          .map(r => (r.getLong(0), r.getString(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)))).sortBy(_._1)
        val outPairs = coPairs(out)
        val outRoles = out.map(t => t._1 -> t._2).toMap
        val roleAgree = gtRoles.count { case (id, role) => outRoles(id) == role }
        val pRec = if (gtPairs.isEmpty) 1.0
          else gtPairs.intersect(outPairs).size.toDouble / gtPairs.size
        val pPrec = if (outPairs.isEmpty) 1.0
          else gtPairs.intersect(outPairs).size.toDouble / outPairs.size
        println(f"[cl05] tables=$tables bits=$bits k=$k " +
          f"cand=$nCand (${nCand.toDouble / (n * (n - 1) / 2)}%.4f of pairs) " +
          f"edgeRecall=$nHit/$nTruth (${nHit.toDouble / math.max(nTruth, 1)}%.3f) " +
          f"roleAgree=$roleAgree/${gt.length} " +
          f"coPairRec=$pRec%.3f coPairPrec=$pPrec%.3f " +
          f"(pairs gt=${gtPairs.size} got=${outPairs.size})")
      }
      cand.unpersist()
    }
    s.stop()
  }
}
