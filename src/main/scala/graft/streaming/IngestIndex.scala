package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** The exactly-once per-batch partition machinery shared by the at-ingest
  * dedup operators ([[NeardupIngest]] for text, [[EmbedIngest]] for
  * embeddings): every batch writes its accepted index rows under
  * `batch=<batchId>` partition directories with overwrite semantics, the
  * corpus read for batch N filters to partition ids strictly below N, and
  * offline compaction folds settled partitions into `compact=<id>` dirs
  * that participate in the same read path.
  *
  * See [[compact]] for the crash-safety analysis; the replay argument
  * lives on the operators' `processBatch` (a re-delivered batch runs
  * against exactly the pre-batch corpus and overwrites its own partial
  * output).
  */
private[streaming] object IngestIndex {

  /** (id, isCompact, path) partitions under `dir`: per-batch `batch=<id>`
    * dirs plus `compact=<id>` dirs (covering every id ≤ their own). Other
    * names are ignored. */
  def partEntries(
      spark: SparkSession, dir: String): Seq[(Long, Boolean, String)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else
      fs.listStatus(p).toSeq
        .map(_.getPath.getName)
        .collect {
          case n if n.startsWith("batch=") =>
            (n.stripPrefix("batch=").toLong, false, s"$dir/$n")
          case n if n.startsWith("compact=") =>
            (n.stripPrefix("compact=").toLong, true, s"$dir/$n")
        }
        .sortBy(_._1)
  }

  /** Partition paths with id strictly below `below` — the replay-safety
    * filter: a re-delivered batch must not see its own earlier half-write
    * as corpus. A `compact=` dir only holds ids ≤ its own, all settled
    * before any live batch (compact never folds the newest batch
    * partition), so the same filter applies. */
  def batchPaths(
      spark: SparkSession, dir: String, below: Long): Seq[String] =
    partEntries(spark, dir).filter(_._1 < below).map(_._3)

  /** Offline index compaction over `tables` of (dir, read schema): merges
    * the settled partitions of each table into one `compact=<id>`
    * directory and removes the constituents. Run while the ingest query
    * is STOPPED (it is the maintenance dual of the per-batch layout:
    * exactly-once needs a partition per batch at write time, but the
    * per-trigger directory listing and small-file count grow with batch
    * count — compaction resets both to a couple).
    *
    * The NEWEST `batch=` partition is never folded: its files can be on
    * disk while the streaming checkpoint has not recorded the batch, and
    * a re-delivered batch N reads strictly below N — folding it into
    * `compact=N` would hide the pre-batch corpus from its own replay and
    * admit every duplicate in the batch. Everything older is settled by
    * construction (the checkpoint commits batch N-1 before batch N
    * starts), so `compact=<id>` participates in the read path at an id
    * strictly below any future or replayed batch.
    *
    * Crash-safety, in order: (1) a merge that dies before Spark's job
    * commit leaves a target with no visible data files and no _SUCCESS —
    * the next run purges it and re-merges, constituents intact; (2) a
    * crash between the committed merge and the constituent deletes
    * leaves rows duplicated between `compact=<id>` and undeleted
    * constituents — the operators' verdicts tolerate that (candidate
    * pairs are distinct()-ed, the verify aggregate is a min), and the
    * next compaction recognizes batch dirs at-or-below a committed
    * compact id — and stale OLDER compact dirs strictly below it, which
    * the newer compact folded in before the crash — as ALREADY MERGED,
    * deleting them without re-reading (a plain re-union would duplicate
    * their rows in the index permanently, and re-merging a stale compact
    * would also collide with the committed target's directory name). At 100 TB the same pass would also re-cluster the
    * band table into the bucketed-by-band-key layout whose
    * zero-corpus-exchange join ScalePatternsSpec proves on the batch
    * index; here the single output file stands in (file count is the
    * thing compaction bounds, not a layout claim). */
  def compact(spark: SparkSession, tables: Seq[(String, String)]): Unit =
    tables.foreach { case (dir, schema) =>
      val fs = new Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // Purge merge attempts that never committed (no _SUCCESS): they
      // read as empty, but the already-merged rule below must not
      // mistake them for coverage.
      partEntries(spark, dir).foreach { case (_, isCompact, p) =>
        if (isCompact && !fs.exists(new Path(p, "_SUCCESS")))
          fs.delete(new Path(p), true)
      }
      val entries = partEntries(spark, dir)
      if (entries.size > 1) {
        val newestBatch =
          entries.collect { case (id, false, _) => id }.maxOption
        val work = entries.filterNot { case (id, isCompact, _) =>
          !isCompact && newestBatch.contains(id)
        }
        val maxCompact = work.collect { case (id, true, _) => id }
          .maxOption.getOrElse(Long.MinValue)
        // Covered = already folded into `compact=<maxCompact>`: batches at
        // or below it, and OLDER compact dirs strictly below it. The
        // latter matters after a crash between a committed merge and its
        // constituent deletes: compact ids strictly increase and every
        // merge takes all surviving lower dirs as input, so a stale
        // compact=<i < maxCompact> is a SUBSET of the newer compact —
        // re-merging it would both duplicate its rows and collide with
        // the committed target's name (ErrorIfExists throw).
        val (covered, sources) = work.partition {
          case (id, isCompact, _) =>
            id <= maxCompact && !(isCompact && id == maxCompact)
        }
        if (sources.size > 1) {
          // Target id = max source id, which is always a batch id
          // strictly above maxCompact here (batch ids at or below it are
          // in `covered`), so the name cannot collide with a committed
          // compact dir.
          val target = s"$dir/compact=${sources.map(_._1).max}"
          spark.read.schema(schema).parquet(sources.map(_._3): _*)
            .coalesce(1)
            .write.mode(SaveMode.ErrorIfExists).parquet(target)
          sources.foreach { case (_, _, p) => fs.delete(new Path(p), true) }
        }
        covered.foreach { case (_, _, p) => fs.delete(new Path(p), true) }
      }
    }
}
