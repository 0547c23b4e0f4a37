package graft

import org.apache.spark.sql.DataFrame

/** Lineage cuts for iterative operators ([[graft.ops.Graph.pageRank]],
  * [[graft.llm.Dedup.connectedComponents]]), conf-gated between the
  * two checkpoint families Spark offers:
  *
  *  - `localCheckpoint` (default): blocks live in executor
  *    block-manager storage — no filesystem round trip, the right
  *    choice for single-node / interactive runs. But the blocks are
  *    UNRECOVERABLE: lose one executor mid-iteration on a real
  *    cluster and the whole multi-round job dies with no recompute
  *    path (the lineage was truncated — that was the point).
  *  - reliable `checkpoint` (`graft.checkpoint.reliable=true`): each
  *    cut writes to the checkpoint directory
  *    (`graft.checkpoint.dir`, default a per-application staging
  *    path — on a cluster point it at durable shared storage, e.g.
  *    an HDFS/S3A path). Costs one extra computation of the frame
  *    per cut (Spark re-runs the RDD to write checkpoint files) plus
  *    the write, buys executor-loss recovery: exactly the trade a
  *    5-round job over 100 TB wants.
  *
  * Results are bit-identical in both modes — checkpointing changes
  * WHERE blocks live, never values or partitioning (pinned in
  * CheckpointSpec on both operators).
  */
object Checkpoints {

  val ReliableKey = "graft.checkpoint.reliable"
  val DirKey = "graft.checkpoint.dir"

  private def reliable(df: DataFrame): Boolean =
    df.sparkSession.conf.get(ReliableKey, "false").toBoolean

  /** Truncate `df`'s lineage: reliable `checkpoint(eager)` when
    * [[ReliableKey]] is set on the frame's session, else
    * `localCheckpoint(eager)`. Lazy cuts (`eager = false`) still keep
    * the plan tree one-round deep; materialization happens at the
    * caller's next action in either mode. */
  /** Operators that iterate in a cloned `newSession()` (private
    * SQLConf for shuffle-parallelism sizing) must carry the caller's
    * checkpoint choice into the clone — `newSession` starts from
    * context defaults, not the parent's runtime conf. */
  def propagate(from: org.apache.spark.sql.SparkSession,
      to: org.apache.spark.sql.SparkSession): Unit = {
    to.conf.set(ReliableKey, from.conf.get(ReliableKey, "false"))
    from.conf.getOption(DirKey).foreach(to.conf.set(DirKey, _))
    // the staging-base override must ride along too: the local-mode
    // checkpoint fallback (and any staged store touched from inside
    // the clone) resolves Staging.dir against the CLONE's conf
    from.conf.getOption("spark.graft.staging.dir")
      .foreach(to.conf.set("spark.graft.staging.dir", _))
  }

  /** Cloned-session scope for BOUNDED-SLICE pin queries (the
    * `*_exact` DuckDB pins): their working set is a constant by
    * construction (a literal `id < N` slice plus a fixed plant set —
    * it never grows with the corpus), yet under the session default
    * every one of their ~dozens of AQE stage-jobs schedules
    * `spark.sql.shuffle.partitions` (= cpu count on the harness)
    * tasks over a few thousand rows — pure task-dispatch overhead
    * that GROWS with core count (the round-17 scaling block measured
    * q_dedup_banded_exact 3× SLOWER at 32 cores than at 8). The same
    * device the iterative operators use ([[graft.llm.Dedup
    * .connectedComponents]], [[graft.ops.Graph]]): a cloned session
    * (same SparkContext, private SQLConf) with parallelism sized to
    * the DATA — a bounded slice is one/few partitions at any corpus
    * scale, which is exactly what AQE would coalesce to by size —
    * and the result rebound to the caller's session on the way out
    * (row order preserved: createDataFrame over the computed RDD
    * keeps partition order, so a sorted pin output stays sorted). */
  object BoundedPin {
    def apply(origin: org.apache.spark.sql.SparkSession, partitions: Int = 4)(
        body: org.apache.spark.sql.SparkSession => DataFrame): DataFrame = {
      val clone = origin.newSession()
      Checkpoints.propagate(origin, clone)
      clone.conf.set("spark.sql.shuffle.partitions", partitions.toString)
      val out = body(clone)
      origin.createDataFrame(out.rdd, out.schema)
    }

    /** Ferry a (small, origin-planned) frame into the pin session with
      * its lineage cut: the slice derivation runs ONCE at the caller's
      * full scan parallelism; everything downstream plans in the
      * clone. The ferried RDD is coalesced to the pin parallelism —
      * a bounded slice left at scan partitioning would otherwise leak
      * core-count-scaled task counts into every downstream stage (a
      * ferried frame also loses size statistics, so an inequality
      * self-join over it plans as a CartesianProduct whose task count
      * is the PRODUCT of the input partition counts). */
    def ferry(clone: org.apache.spark.sql.SparkSession, df: DataFrame): DataFrame = {
      val par = clone.conf.get("spark.sql.shuffle.partitions").toInt
      Checkpoints.cut(clone.createDataFrame(df.rdd.coalesce(par), df.schema))
    }
  }

  def cut(df: DataFrame, eager: Boolean = true): DataFrame =
    if (reliable(df)) {
      val s = df.sparkSession
      val sc = s.sparkContext
      if (sc.getCheckpointDir.isEmpty) s.conf.getOption(DirKey) match {
        case Some(dir) => sc.setCheckpointDir(dir)
        case None if sc.isLocal =>
          // single-node: a tmpdir staging path is as durable as the
          // node itself, so it is an acceptable default
          sc.setCheckpointDir(Staging.dir(s, "checkpoints"))
        case None =>
          // on a cluster, a driver-local java.io.tmpdir fallback would
          // WRITE checkpoints nowhere durable — executors cannot read
          // the driver's /tmp, and the whole point of reliable mode is
          // surviving executor loss. Refuse loudly instead of
          // checkpointing into a path that silently voids the
          // guarantee. (For long-lived apps, pair with
          // spark.cleaner.referenceTracking.cleanCheckpoints=true so
          // out-of-scope checkpoint files are collected.)
          throw new IllegalStateException(
            s"$ReliableKey=true on a non-local master requires $DirKey " +
              "to point at durable shared storage (HDFS/S3A)")
      }
      df.checkpoint(eager)
    } else df.localCheckpoint(eager)
}
