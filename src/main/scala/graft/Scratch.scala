package graft

/** Per-process scratch-path hygiene shared by the operators that
  * materialize layouts (partitioned/bucketed tables, ANN indexes):
  * one recursive-delete-on-exit implementation instead of a copy per
  * call site. */
object Scratch {
  /** Base dir for SMALL, hot, ephemeral scratch (streaming checkpoints,
    * commit logs): tmpfs when the host has one — checkpoint commits are
    * many tiny fsync-ed files whose latency is pure microbatch overhead
    * on a disk-backed /tmp — falling back to java.io.tmpdir. Only for
    * metadata-sized state; bulk scratch (table layouts, indexes) stays
    * on java.io.tmpdir. */
  lazy val fastScratchBase: String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val enabled = sys.env.getOrElse("SPARK_GRAFT_FAST_SCRATCH", "1") != "0"
    if (enabled && java.nio.file.Files.isDirectory(shm)
        && java.nio.file.Files.isWritable(shm))
      "/dev/shm"
    else System.getProperty("java.io.tmpdir")
  }

  /** Root override for PERSISTED derived artifacts (ANN/gram indexes,
    * k-means assignments, dup-cluster labels, split assignments).
    * Unset (the default): artifacts are per-process scratch —
    * pid-suffixed under java.io.tmpdir and deleted on exit, so
    * concurrent JVMs never probe each other's half-built index. Set
    * `SPARK_GRAFT_ARTIFACT_ROOT` (env; `spark.graft.artifactRoot`
    * sys-prop for in-JVM tests) to a durable shared path — e.g. an
    * HDFS-mounted or job-scoped cluster dir — and the pid drops out
    * (cross-run reuse is the point), nothing is exit-deleted, and the
    * `_SUCCESS` transaction discipline still gates completeness: a
    * build that died mid-write has no marker and is rebuilt, never
    * probed. Concurrent FIRST builds of the same (root, corpus) must
    * be serialized externally, the same caveat as any non-atomic
    * `mode(overwrite)` to a shared path; once `_SUCCESS` exists every
    * reader/rebuilder short-circuits. */
  def artifactRootOverride: Option[String] =
    sys.props.get("spark.graft.artifactRoot")
      .orElse(sys.env.get("SPARK_GRAFT_ARTIFACT_ROOT"))

  /** Full-width corpus key: 16 hex chars of md5(dir). `String.hashCode`
    * was both collision-prone (32 bits over arbitrarily many corpus
    * dirs sharing one durable root) and sign-broken
    * (`math.abs(Int.MinValue)` is negative); a truncated crypto hash
    * is uniform, non-negative by construction, and stable across JVMs. */
  private def dirKey(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString

  /** Path of the persisted artifact `kind` derived from corpus `dir`.
    * `variant` is the PARAMETER FINGERPRINT: every call site whose
    * artifact depends on tunable constants (shingle k, Jaccard
    * threshold, K/iters/dims, bucket counts, output schema rev) must
    * interpolate those constants into `variant` — under a durable
    * `SPARK_GRAFT_ARTIFACT_ROOT` the path is the cache key, and a
    * constant bumped in code with an unchanged path would silently
    * serve the stale build. Interpolating the constants themselves
    * (`s"_k${K}i$Iters"`), not hand-typed copies, keeps the
    * fingerprint honest by construction. */
  def artifactPath(kind: String, dir: String, variant: String = ""): String =
    artifactRootOverride match {
      case Some(root) =>
        s"$root/graft_${kind}_${dirKey(dir)}$variant"
      case None =>
        s"${System.getProperty("java.io.tmpdir")}/graft_${kind}_" +
          s"${ProcessHandle.current().pid()}_${dirKey(dir)}$variant"
    }

  /** The artifact transaction marker: complete iff Spark's `_SUCCESS`
    * landed (bare dir existence would accept a torn build). Resolved
    * through Hadoop's FileSystem so a durable artifact root on a
    * distributed store (HDFS/S3A) probes the real path — java.nio
    * would silently answer `false` for any non-local URI and force a
    * rebuild on every run. Local paths route to LocalFileSystem, same
    * answer as before. */
  def artifactComplete(path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/_SUCCESS")
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    p.getFileSystem(conf).exists(p)
  }

  /** Pre-build hygiene for [[artifactPath]] paths: invalidate any
    * partial content now; register exit cleanup ONLY in the default
    * ephemeral mode (durable artifacts outlive the process by design).
    * Durable-root paths may live on a distributed store, so their
    * invalidation goes through Hadoop's FileSystem ([[deleteNow]] is
    * java.nio and local-only); the subsequent `mode(overwrite)` write
    * would clear the dir anyway — this just guarantees no torn content
    * is visible between probe and write. */
  def prepareArtifact(paths: String*): Unit = paths.foreach { p =>
    if (artifactRootOverride.isEmpty) { deleteNow(p); deleteOnExit(p) }
    else {
      val hp = new org.apache.hadoop.fs.Path(p)
      val conf = org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sparkContext.hadoopConfiguration)
        .getOrElse(new org.apache.hadoop.conf.Configuration())
      try hp.getFileSystem(conf).delete(hp, true)
      catch { case _: java.io.IOException => () }
    }
  }

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Register `path` for recursive deletion when the JVM exits.
    * Idempotent per path: `def`-shaped scratch-path helpers call this
    * on every invocation (bench reps, spec re-entry), and each JVM
    * shutdown hook is a Thread — without the guard, repeated calls
    * would stack one hook thread per call for the process lifetime. */
  def deleteOnExit(path: String): Unit =
    if (registered.add(path))
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteNow(path)))

  /** Publish a directory to a FIXED cross-process path (the oracle-read
    * exports: q36 normalized, q37 model, q69 versions, q88/q90
    * interchange — their paths are baked into static oracle SQL, so
    * they cannot be pid-suffixed) with the smallest possible
    * unavailability window. A plain mode(overwrite) deletes the old
    * content and then spends the whole Spark write unreadable — seconds
    * during which a concurrent JVM or the driver's DuckDB pass reads a
    * torn dir. Here the caller writes to a pid-suffixed staging dir and
    * the swap is rename-aside + rename-in: two single metadata moves,
    * never a multi-file delete between them. A crash mid-write OR
    * mid-swap leaves a complete export in place (the previous one until
    * the instant the new one lands); the old copy is deleted only after
    * the new target is live. The final move retries once on
    * FileAlreadyExistsException so two concurrent publishers interleave
    * to "one of the two complete exports" rather than an exception. */
  def publishStaged(target: String)(write: String => Unit): Unit = {
    import java.nio.file.{Files, FileAlreadyExistsException, Paths, StandardCopyOption}
    val pid = ProcessHandle.current().pid()
    val stage = s"$target.stage.$pid"
    val retired = s"$target.old.$pid"
    deleteNow(stage); deleteNow(retired)
    try {
      write(stage)
      // single-move the live export aside (no unreadable window), then
      // single-move the stage in; delete the retired copy last
      if (Files.exists(Paths.get(target)))
        try Files.move(Paths.get(target), Paths.get(retired),
          StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.NoSuchFileException => () } // concurrent publisher took it
      try Files.move(Paths.get(stage), Paths.get(target),
        StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: FileAlreadyExistsException =>
          // a concurrent publisher won the race and its export is
          // complete — ours is redundant; leave theirs live
          ()
      }
    } finally { deleteNow(stage); deleteNow(retired) }
  }

  /** Recursive delete now (for invalidating a partial build). Tolerates
    * files vanishing mid-walk: shutdown hooks run concurrently with
    * Spark's own ShutdownHookManager cleanup, so a sibling hook (or
    * Spark itself) may delete entries under `path` while we traverse. */
  def deleteNow(path: String): Unit = {
    import java.nio.file._
    import java.nio.file.attribute.BasicFileAttributes
    val p = Paths.get(path)
    if (Files.exists(p))
      try Files.walkFileTree(p, new SimpleFileVisitor[Path] {
        override def visitFile(f: Path, a: BasicFileAttributes): FileVisitResult = {
          Files.deleteIfExists(f); FileVisitResult.CONTINUE
        }
        override def visitFileFailed(f: Path, e: java.io.IOException): FileVisitResult =
          FileVisitResult.CONTINUE // vanished mid-walk
        override def postVisitDirectory(d: Path, e: java.io.IOException): FileVisitResult = {
          try Files.deleteIfExists(d)
          catch { case _: DirectoryNotEmptyException => () } // concurrent writer
          FileVisitResult.CONTINUE
        }
      })
      catch { case _: java.io.IOException => () }
  }
}
