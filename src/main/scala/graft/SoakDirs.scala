package graft

import java.nio.file.{Files, Path, Paths}

/** Shared durable-soak directory discipline — ONE copy of the freshness
  * and reclaim logic ChainSoak and BrokerScaleSoak had drifted apart
  * (review finding).
  *
  * Freshness: every run nests its broker WAL dirs under one pid+nanos
  * segment, so the documented back-to-back A/B workflow can never hand a
  * broker a PREVIOUS run's multi-GB WAL to replay (seq counters resuming
  * past the run's message count, retained state and subscriptions riding
  * into the measurement, or an OOM in the replay's readAllBytes).
  *
  * Reclaim: best-effort recursive delete — a 20M-msg durable run leaves
  * ~1.3 GB of WAL per broker. Callers run it in a `finally`, so FAILED
  * runs reclaim their bytes too (the old straight-line cleanup leaked
  * the dir on any mid-soak throw, and repeated failed A/B iterations
  * would fill the disk).
  */
object SoakDirs {
  /** `<root>/run-<pid>-<nanos>` — fresh and collision-free per run. */
  def freshRunRoot(root: String): Path =
    Paths.get(root,
      s"run-${ProcessHandle.current().pid()}-${System.nanoTime()}")

  /** Best-effort recursive delete; swallows I/O failures (the uniquely
    * named dir is just left behind — never measurement-corrupting,
    * because freshness comes from the name, not from emptiness). */
  def deleteRecursively(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    try {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(f => Files.deleteIfExists(f))
      finally walk.close()
    } catch { case scala.util.control.NonFatal(_) => }
  }
}
