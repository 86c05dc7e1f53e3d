package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Checkpoint cadence for iterative DataFrame loops (connected
  * components, PageRank): each round's frame is eagerly checkpointed so
  * the plan stays one join deep instead of unrolling every iteration,
  * and — the part a bare `checkpoint()`/`localCheckpoint()` call does
  * not give you — the PREVIOUS round's checkpoint artifacts are freed
  * as soon as the new round is materialized, so a long run holds at
  * most two rounds of state instead of one per round.
  *
  * With `checkpointDir` set the checkpoint is RELIABLE (`checkpoint()`
  * against that path — typically HDFS/object storage on a cluster — and
  * survives executor loss, the right mode for a long 100-TB run); each
  * round deletes the previous round's `rdd-*` files once the new one is
  * on storage. Unset, it falls back to `localCheckpoint()`
  * (executor-held blocks — cheaper, but a lost executor aborts the
  * computation; fine for short jobs and tests), and each round
  * UNPERSISTS the previous round's blocks eagerly instead of waiting
  * for the driver's ContextCleaner to GC them. That eagerness matters
  * under sustained load: superseded label/rank frames otherwise linger
  * in executor memory for the rest of the job (and, on a shared
  * driver, across subsequent queries) — the round-13 adjudication's
  * prime suspect for mid-sweep graph-query inflation.
  *
  * Eager-unpersist safety: `checkpoint`/`localCheckpoint` default to
  * eager, so the new round's blocks/files are fully materialized before
  * the superseded round's are touched — later reads hit storage, never
  * the truncated lineage. A lost localCheckpoint block is unrecoverable
  * with or without the unpersist (lineage is already cut), so the fault
  * model is unchanged.
  *
  * Round attribution diffs SparkContext-global state (the checkpoint
  * root's children; the persistent-RDD registry) before/after each
  * call — `Dataset.rdd.getCheckpointFile` is useless here (the Dataset
  * wraps the checkpointed internal RDD in a fresh deserializing RDD, so
  * it always returns None). The diff is exact as long as no OTHER loop
  * checkpoints or persists concurrently in the same SparkContext
  * (single-job usage, as in `Dedup.dupComponents` / `GraphRank`); a
  * concurrent registration would merely be adopted into this loop's
  * rotation, never double-freed.
  */
object LineageCheckpoint {
  /** Opt-in plan evidence for ITERATIVE loops (r22): a loop's final
    * frame explains as one `Scan ExistingRDD` of the last checkpoint,
    * so `PlanDump` can never show the PER-ROUND join/exchange shape an
    * optimization changes. With `-Dgraft.ckpt.plans=<dir>` every frame
    * passed to any rotation is explained (formatted) to
    * (env `GRAFT_CKPT_PLANS` works too — sbt forks the run JVM) to
    * `<dir>/ckpt_NNN.txt` before materialization — measurement tooling
    * only, inert without the property (bench/verify never set it).
    */
  private val planSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private def dumpPlan(df: DataFrame): Unit =
    sys.props.get("graft.ckpt.plans")
      .orElse(sys.env.get("GRAFT_CKPT_PLANS")).foreach { dir =>
      try {
        val n = planSeq.incrementAndGet()
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, f"ckpt_$n%03d.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
      } catch { case _: Exception => () } // evidence is best-effort
    }

  /** Unpersisting a locally-checkpointed RDD makes Spark WARN that its
    * truncated lineage "cannot be recomputed after unpersisting" — true
    * in general, but here BY DESIGN: every unpersisted copy is a
    * superseded round that is never read again, and the rotation emits
    * the warning once per iteration per loop (hundreds of lines across
    * a full sweep, drowning real warnings). Demote exactly that
    * logger — the checkpointed internal RDD is always a
    * MapPartitionsRDD — once, on first local-mode rotation.
    */
  private lazy val demoteUnpersistWarning: Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // logging backend absent: keep the noise
}

final class LineageCheckpoint(spark: SparkSession,
    checkpointDir: Option[String]) {
  // Respect a caller-configured checkpoint dir; only set it when the
  // context has none (setCheckpointDir is application-global state).
  checkpointDir.foreach { d =>
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(d)
  }
  private var prevFiles: Set[String] = Set.empty
  private var prevRddIds: Set[Int] = Set.empty

  private def listCheckpointed(): Set[String] =
    spark.sparkContext.getCheckpointDir.toSet[String].flatMap { d =>
      val path = new org.apache.hadoop.fs.Path(d)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.listStatus(path).map(_.getPath.toString).toSet
      else Set.empty[String]
    }

  /** Eagerly checkpoints `df` and frees the artifacts of the frame
    * checkpointed by the PREVIOUS call. The frame from the FINAL call
    * is never freed — it is the loop's result.
    */
  def apply(df: DataFrame): DataFrame = {
    LineageCheckpoint.dumpPlan(df)
    if (checkpointDir.isDefined) {
      val before = listCheckpointed()
      val out = df.checkpoint() // eager: on storage before we delete the old one
      val created = listCheckpointed() -- before
      // Not an assert: -Xelide-below builds would silently skip the
      // invariant, and deleting prevFiles on a false success would
      // drop the ONLY materialized copy of the loop state.
      if (created.isEmpty) throw new IllegalStateException(
        "reliable checkpoint produced no files under the checkpoint dir")
      prevFiles.foreach { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        path.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(path, true)
      }
      prevFiles = created
      out
    } else {
      LineageCheckpoint.demoteUnpersistWarning
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val out = df.localCheckpoint() // eager: blocks live before the old ones go
      val created = spark.sparkContext.getPersistentRDDs.keySet -- before
      prevRddIds.foreach { id =>
        spark.sparkContext.getPersistentRDDs.get(id)
          .foreach(_.unpersist(blocking = false))
      }
      prevRddIds = created.toSet
      out
    }
  }

  /** Frees the artifacts of the LAST frame this rotation checkpointed —
    * for rotations holding INTERMEDIATE loop state (e.g. the HITS
    * half-step raw sums) whose final frame is not part of the loop's
    * result. Must not be called on the rotation that produced the
    * returned frame: its blocks/files are what the caller reads.
    */
  def release(): Unit = {
    prevFiles.foreach { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(path, true)
    }
    prevFiles = Set.empty
    prevRddIds.foreach { id =>
      spark.sparkContext.getPersistentRDDs.get(id)
        .foreach(_.unpersist(blocking = false))
    }
    prevRddIds = Set.empty
  }
}
