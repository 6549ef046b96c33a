package graft.operators

/** Build-once/serve-many parquet artifacts (the ss08 LSH index, dd12
  * cluster table, dd14 band index): one memoized temp directory per
  * cache key, built on first use, deleted at JVM exit. The artifact
  * outlives individual queries by design (that is the point of an
  * index) but must not outlive the JVM — verify/bench runs would
  * otherwise accumulate copies in /tmp forever. One definition of the
  * cache/tempdir/shutdown-hook lifecycle, shared by all three sites.
  */
private[operators] object Materialized {
  def dir(cache: java.util.concurrent.ConcurrentHashMap[String, String],
      prefix: String, key: String)(build: String => Unit): String =
    cache.computeIfAbsent(key, _ => {
      val d = java.nio.file.Files.createTempDirectory(prefix).toString
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))))
      build(d)
      d
    })

  /** Stable cache key for session-scoped entries (ADVICE r13): the former
    * `System.identityHashCode(session)` keys can be REUSED after a session
    * is GC'd (or collide outright), handing a fresh session another
    * session's dead checkpointed RDDs / unusable DataFrames. The engine's
    * `sessionUUID` is unique for the JVM's lifetime. (Entries still live
    * until JVM exit — the serving-process model these caches encode; the
    * UUID key just guarantees a NEW session never inherits a dead one's.) */
  private[operators] def sessionKey(s: org.apache.spark.sql.SparkSession): String =
    org.apache.spark.sql.graft.SessionUid.of(s)
}
