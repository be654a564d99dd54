package graft

/** Per-process scratch-path hygiene shared by the operators that
  * materialize layouts (partitioned/bucketed tables, ANN indexes):
  * one recursive-delete-on-exit implementation instead of a copy per
  * call site. */
object Scratch {
  /** Register `path` for recursive deletion when the JVM exits. */
  def deleteOnExit(path: String): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }))

  /** Recursive delete now (for invalidating a partial build). */
  def deleteNow(path: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p))
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
  }
}
