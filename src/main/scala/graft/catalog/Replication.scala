package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C64 — incremental CDC replication: keep a replica table converged
  * with a source table by replaying ONLY the source's changelog window
  * since the last sync (cost tracks churn, never source size — the
  * same O(changes) argument as the C36 MVs, applied to whole-table
  * mirroring; reference surface analogue: a downstream catalog
  * consuming another's CDC feed).
  *
  * Apply strategy per window (the streaming-CDC "MOR upsert" shape —
  * how Paimon/Hudi-style sinks absorb change streams):
  *
  *   1. one MOR equality-delete commit masking EVERY changed key
  *      (updated AND deleted) — O(keys), no data-file rewrite;
  *   2. one append commit with the window's final row images;
  *   3. the `graft.repl.last-seq` watermark commit LAST.
  *
  * MOR sequence ordering (C30) makes this replay-safe: the delete at
  * seq d masks only files with dataSeq ≤ d, so step 2's append is
  * never masked by step 1 — and if a crash loses the watermark, the
  * replayed window's NEW delete commit also masks the half-applied
  * attempt's append, then step 2 restores the images once. Replay
  * converges: at-least-once apply, exactly-once effect, no key ever
  * duplicated. Identical duplicate source rows replicate faithfully
  * (`_copies` expansion) because the eq-delete masks all copies and
  * the append restores the net count.
  *
  * The replica accumulates one tiny delete file per busy window —
  * run [[TableOps.compactDeletes]] (O(keys)) or, rarely,
  * [[TableOps.applyDeletes]] (rewrite) as maintenance, exactly as any
  * MOR table. At 100 TB the replica never rewrites data files on the
  * sync path; that is the point.
  */
object Replication {

  /** One incremental sync; returns the replica metadata after the
    * watermark commit. Keys must identify rows in the source (they
    * drive the equality-delete masking). Creates the replica with the
    * source's schema on first call. */
  def replicate(
      spark: SparkSession,
      ops: TableOps,
      srcDir: Path,
      dstDir: Path,
      keyCols: Seq[String]): TableMetadata = {
    require(keyCols.nonEmpty, "replication needs at least one key column")
    val (_, srcMeta) = ops.load(srcDir).getOrElse(
      throw new IllegalArgumentException(s"source table does not exist at $srcDir"))
    val headSeq = srcMeta.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)

    if (!ops.exists(dstDir)) {
      ops.create(dstDir, TableMetadata.create(
        dstDir.toString, srcMeta.currentSchema,
        PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty),
        Map("graft.repl.last-seq" -> "0",
            "graft.repl.source" -> srcDir.toString,
            "graft.repl.keys" -> keyCols.mkString(","))))
    }
    val (_, dstMeta0) = ops.load(dstDir).get
    val lastSeq = dstMeta0.properties.get("graft.repl.last-seq").map(_.toLong).getOrElse(0L)
    if (headSeq <= lastSeq) return dstMeta0

    val net = ops.netChanges(spark, srcDir, lastSeq, headSeq)
    val dataCols = net.columns.filterNot(c => c == "_change_type" || c == "_copies")
    require(keyCols.forall(dataCols.contains),
      s"key columns $keyCols must exist in source schema ${dataCols.toSeq}")
    val changedKeys = net.select(keyCols.map(col): _*).distinct()
    val inserts = net.filter(col("_change_type") === "insert")
      .withColumn("_i", explode(expr("sequence(1, _copies)")))
      .select(dataCols.map(col): _*)

    if (!changedKeys.isEmpty) ops.mergeOnReadDelete(spark, dstDir, changedKeys)
    if (!inserts.isEmpty) ops.write(dstDir, inserts, "append")

    val (_, dstMeta) = ops.load(dstDir).get
    ops.commit(dstDir,
      Seq(Requirement.AssertRefSnapshotId("main",
        dstMeta.currentSnapshot.map(_.snapshotId))),
      Seq(MetadataUpdate.SetProperties(
        Map("graft.repl.last-seq" -> headSeq.toString))))
  }

  /** Continuous replication: follow the source's committed-only
    * changelog stream and run one incremental sync per micro-batch
    * (same trigger pattern as [[Materialized.continuous]]). */
  def continuous(
      spark: SparkSession,
      ops: TableOps,
      srcChangesTable: String,
      srcDir: Path,
      dstDir: Path,
      keyCols: Seq[String],
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.table(srcChangesTable)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (_: DataFrame, _: Long) =>
        replicate(spark, ops, srcDir, dstDir, keyCols)
        ()
      }
      .start()
}
