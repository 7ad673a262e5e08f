package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate tables (materialized-view lite),
  * driven by the row-level CDC feed: the destination holds
  * `keyCols..., value_sum, n_vals, n_rows` = `SELECT keys, SUM(value),
  * COUNT(value), COUNT(*) FROM src GROUP BY keys` (`n_vals` counts
  * NON-NULL values — it is what NULL-correct `AVG` divides by, and
  * `n_vals = 0` is how the rewrite knows `SUM` of an all-NULL group
  * must be NULL, not 0), and [[refreshSumCount]] advances
  * it by reading ONLY the source commits since the last refresh
  * ([[TableOps.changes]]) — cost tracks churn, never source size.
  * Inserts contribute positively, deletes negatively (sum/count are
  * subtractable aggregates; updates arrive as delete+insert pairs and
  * net exactly). At 100 TB this is the difference between an O(table)
  * nightly rebuild and an O(today's changes) refresh.
  *
  * The refresh is crash-consistent: the new aggregate snapshot and the
  * `graft.mv.last-seq` watermark land in ONE metadata commit, guarded
  * on the destination's current snapshot — a torn refresh can lose the
  * attempt, never double-apply it. Single refresher assumed (the guard
  * turns concurrent refreshes into clean failures). Null aggregation
  * keys are not supported (full-outer merge joins by equality).
  */
object Materialized {

  /** Create-if-absent + incremental refresh; returns the destination
    * metadata after the refresh. */
  def refreshSumCount(
      spark: SparkSession,
      ops: TableOps,
      srcDir: Path,
      dstDir: Path,
      keyCols: Seq[String],
      valueCol: String): TableMetadata = {
    require(keyCols.nonEmpty, "need at least one aggregation key")
    val (_, srcMeta) = ops.load(srcDir).getOrElse(
      throw new IllegalArgumentException(s"source table does not exist at $srcDir"))
    val headSeq = srcMeta.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)

    if (!ops.exists(dstDir)) {
      val srcSchema = SchemaBridge.toSpark(srcMeta.currentSchema)
      val dstSchema = org.apache.spark.sql.types.StructType(
        keyCols.map(k => srcSchema.fields.find(_.name == k).getOrElse(
          throw new IllegalArgumentException(s"key column $k not in source schema"))) ++ Seq(
          org.apache.spark.sql.types.StructField("value_sum",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("n_vals",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_rows",
            org.apache.spark.sql.types.LongType)))
      ops.create(dstDir, TableMetadata.create(
        dstDir.toString, SchemaBridge.fromSpark(dstSchema),
        PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty),
        Map("graft.mv.last-seq" -> "0",
            "graft.mv.source" -> srcDir.toString,
            "graft.mv.keys" -> keyCols.mkString(","),
            "graft.mv.value" -> valueCol,
            "graft.mv.agg" -> "sumcount")))
    }
    val (_, dstMeta) = ops.load(dstDir).get
    val lastSeq = dstMeta.properties.get("graft.mv.last-seq").map(_.toLong).getOrElse(0L)
    if (headSeq <= lastSeq) return dstMeta // nothing new
    // MVs created before n_vals existed keep their 2-column shape —
    // the rewrite then only answers SUM/AVG for non-nullable sources
    val hasNVals = SchemaBridge.toSpark(dstMeta.currentSchema)
      .fieldNames.contains("n_vals")

    val delta = ops.changes(spark, srcDir, lastSeq, headSeq)
      .withColumn("_sign", when(col("_change_type") === "insert", 1L).otherwise(-1L))
      .groupBy(keyCols.map(col): _*)
      .agg(
        sum(col(valueCol).cast("double") * col("_sign")).as("sum_delta"),
        sum(when(col(valueCol).isNotNull, col("_sign")).otherwise(0L)).as("vals_delta"),
        sum(col("_sign")).as("cnt_delta"))

    val current = ops.read(spark, dstDir)
    val nValsCols = if (hasNVals) Seq(
      (coalesce(col("n_vals"), lit(0L)) +
        coalesce(col("vals_delta"), lit(0L))).as("n_vals")) else Seq.empty
    val merged = current.join(delta, keyCols, "full_outer")
      .select(
        keyCols.map(col) ++ Seq(
          (coalesce(col("value_sum"), lit(0.0)) +
            coalesce(col("sum_delta"), lit(0.0))).as("value_sum")) ++ nValsCols ++ Seq(
          (coalesce(col("n_rows"), lit(0L)) +
            coalesce(col("cnt_delta"), lit(0L))).as("n_rows")): _*)
      .filter(col("n_rows") > 0) // fully-deleted groups disappear

    val writeDir = new Path(ops.dataDir(dstDir), s"w-${java.util.UUID.randomUUID()}")
    merged.write.parquet(writeDir.toString)
    val files = listParquet(ops, writeDir)
    // snapshot + watermark in one guarded commit: lose-able, never
    // double-applicable
    ops.commit(dstDir,
      Seq(Requirement.AssertRefSnapshotId("main",
        dstMeta.currentSnapshot.map(_.snapshotId))),
      ops.buildSnapshotUpdates(dstDir, dstMeta, files, "overwrite") :+
        MetadataUpdate.SetProperties(Map("graft.mv.last-seq" -> headSeq.toString)))
  }

  /** Incrementally-maintained MIN/MAX aggregate — the non-subtractable
    * case: inserts only ever TIGHTEN a group's extremes
    * (least/greatest fold), but a delete can invalidate them, so
    * groups whose deleted values touch the stored min or max are
    * recomputed from the source restricted to JUST those keys
    * (recompute-on-retract — Flink's retraction strategy for
    * non-retractable aggregates). Cost: O(churn) for the delta fold +
    * O(rows of invalidated groups) for the repair scan; a delete of a
    * non-extreme value costs nothing. Same guarded single-commit
    * crash consistency as [[refreshSumCount]]. */
  def refreshMinMax(
      spark: SparkSession,
      ops: TableOps,
      srcDir: Path,
      dstDir: Path,
      keyCols: Seq[String],
      valueCol: String): TableMetadata = {
    require(keyCols.nonEmpty, "need at least one aggregation key")
    val (_, srcMeta) = ops.load(srcDir).getOrElse(
      throw new IllegalArgumentException(s"source table does not exist at $srcDir"))
    val headSeq = srcMeta.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)

    if (!ops.exists(dstDir)) {
      val srcSchema = SchemaBridge.toSpark(srcMeta.currentSchema)
      val dstSchema = org.apache.spark.sql.types.StructType(
        keyCols.map(k => srcSchema.fields.find(_.name == k).getOrElse(
          throw new IllegalArgumentException(s"key column $k not in source schema"))) ++ Seq(
          org.apache.spark.sql.types.StructField("value_min",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("value_max",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("n_rows",
            org.apache.spark.sql.types.LongType)))
      ops.create(dstDir, TableMetadata.create(
        dstDir.toString, SchemaBridge.fromSpark(dstSchema),
        PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty),
        Map("graft.mv.last-seq" -> "0",
            "graft.mv.source" -> srcDir.toString,
            "graft.mv.keys" -> keyCols.mkString(","),
            "graft.mv.value" -> valueCol,
            "graft.mv.agg" -> "minmax")))
    }
    val (_, dstMeta) = ops.load(dstDir).get
    val lastSeq = dstMeta.properties.get("graft.mv.last-seq").map(_.toLong).getOrElse(0L)
    if (headSeq <= lastSeq) return dstMeta

    val v = col(valueCol).cast("double")
    val delta = ops.changes(spark, srcDir, lastSeq, headSeq)
      .withColumn("_sign", when(col("_change_type") === "insert", 1L).otherwise(-1L))
      .groupBy(keyCols.map(col): _*)
      .agg(
        min(when(col("_sign") === 1L, v)).as("ins_min"),
        max(when(col("_sign") === 1L, v)).as("ins_max"),
        min(when(col("_sign") === -1L, v)).as("del_min"),
        max(when(col("_sign") === -1L, v)).as("del_max"),
        sum(col("_sign")).as("cnt_delta"))

    val current = ops.read(spark, dstDir)
    val joined = current.join(delta, keyCols, "full_outer")
      .withColumn("new_n",
        coalesce(col("n_rows"), lit(0L)) + coalesce(col("cnt_delta"), lit(0L)))
      // a group needs repair iff a deleted value touches a stored
      // extreme (deleting strictly-interior values can't move them);
      // a group BORN inside this window that also saw deletes has no
      // trusted extremes at all — repair it unconditionally
      .withColumn("needs_repair",
        col("new_n") > 0 &&
          (col("del_min").isNotNull || col("del_max").isNotNull) &&
          (col("n_rows").isNull ||
            col("del_min") <= col("value_min") || col("del_max") >= col("value_max")))
    val repairKeys = joined.filter(col("needs_repair")).select(keyCols.map(col): _*)
    // repair at the PINNED head — reading the source at `now` would
    // fold in commits beyond headSeq while the watermark records
    // headSeq, double-applying them on the next refresh
    val repaired = ops.readAtSeq(spark, srcDir, headSeq)
      .join(repairKeys, keyCols, "left_semi")
      .groupBy(keyCols.map(col): _*)
      .agg(min(v).as("value_min"), max(v).as("value_max"), count(lit(1)).as("n_rows"))
    val folded = joined.filter(col("new_n") > 0 && !coalesce(col("needs_repair"), lit(false)))
      .select(
        keyCols.map(col) ++ Seq(
          least(col("value_min"), col("ins_min")).as("value_min"),
          greatest(col("value_max"), col("ins_max")).as("value_max"),
          col("new_n").as("n_rows")): _*)
    val merged = folded.unionByName(repaired)

    val writeDir = new Path(ops.dataDir(dstDir), s"w-${java.util.UUID.randomUUID()}")
    merged.write.parquet(writeDir.toString)
    val files = listParquet(ops, writeDir)
    ops.commit(dstDir,
      Seq(Requirement.AssertRefSnapshotId("main",
        dstMeta.currentSnapshot.map(_.snapshotId))),
      ops.buildSnapshotUpdates(dstDir, dstMeta, files, "overwrite") :+
        MetadataUpdate.SetProperties(Map("graft.mv.last-seq" -> headSeq.toString)))
  }

  /** C48 — incrementally-maintained JOIN aggregate across TWO source
    * tables: the destination holds `key, n_pairs` =
    * `SELECT k, COUNT(*) FROM A JOIN B ON A.keyA = B.keyB GROUP BY k`,
    * advanced from both CDC feeds with the bilinear delta rule
    *
    *   Δ(A ⋈ B) = ΔA ⋈ B_new  +  A_old ⋈ ΔB
    *
    * (B at its NEW watermark, A at its OLD one — each cross pair is
    * counted exactly once; signs multiply through, so deletes retract
    * and updates net). Cost tracks churn × matched partners, never
    * |A| × |B| — the difference between an O(join) nightly rebuild
    * and an O(today's changes) refresh at 100 TB. A_old is a
    * sequence-number time-travel read ([[TableOps.readAtSeq]]), so no
    * extra state is stored beyond the two watermark properties, which
    * land atomically with the aggregate snapshot (same crash
    * consistency as [[refreshSumCount]]). */
  def refreshJoinCount(
      spark: SparkSession,
      ops: TableOps,
      srcADir: Path,
      srcBDir: Path,
      dstDir: Path,
      keyA: String,
      keyB: String): TableMetadata = {
    val (_, aMeta) = ops.load(srcADir).getOrElse(
      throw new IllegalArgumentException(s"source A does not exist at $srcADir"))
    val (_, bMeta) = ops.load(srcBDir).getOrElse(
      throw new IllegalArgumentException(s"source B does not exist at $srcBDir"))
    val headA = aMeta.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)
    val headB = bMeta.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)

    if (!ops.exists(dstDir)) {
      val aSchema = SchemaBridge.toSpark(aMeta.currentSchema)
      val keyField = aSchema.fields.find(_.name == keyA).getOrElse(
        throw new IllegalArgumentException(s"key column $keyA not in source A schema"))
      val dstSchema = org.apache.spark.sql.types.StructType(Seq(
        keyField.copy(name = "key"),
        org.apache.spark.sql.types.StructField("n_pairs",
          org.apache.spark.sql.types.LongType)))
      ops.create(dstDir, TableMetadata.create(
        dstDir.toString, SchemaBridge.fromSpark(dstSchema),
        PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty),
        Map("graft.mv.last-seq-a" -> "0", "graft.mv.last-seq-b" -> "0",
            "graft.mv.source-a" -> srcADir.toString,
            "graft.mv.source-b" -> srcBDir.toString,
            "graft.mv.key-a" -> keyA, "graft.mv.key-b" -> keyB)))
    }
    val (_, dstMeta) = ops.load(dstDir).get
    val lastA = dstMeta.properties.get("graft.mv.last-seq-a").map(_.toLong).getOrElse(0L)
    val lastB = dstMeta.properties.get("graft.mv.last-seq-b").map(_.toLong).getOrElse(0L)
    if (headA <= lastA && headB <= lastB) return dstMeta // nothing new

    def signed(df: DataFrame): DataFrame =
      df.withColumn("_sign", when(col("_change_type") === "insert", 1L).otherwise(-1L))
    val dA = signed(ops.changes(spark, srcADir, lastA, headA))
      .select(col(keyA).as("key"), col("_sign").as("sa"))
    val dB = signed(ops.changes(spark, srcBDir, lastB, headB))
      .select(col(keyB).as("kb"), col("_sign").as("sb"))
    // B pinned at the recorded watermark headB — a commit to B that
    // races in between the watermark pin and this read would otherwise
    // be counted here AND again by the next refresh's ΔB term
    val bNew = ops.readAtSeq(spark, srcBDir, headB).select(col(keyB).as("kb"))
    val aOld = ops.readAtSeq(spark, srcADir, lastA).select(col(keyA).as("key"))

    val term1 = dA.join(bNew, col("key") === col("kb")).select(col("key"), col("sa").as("w"))
    val term2 = aOld.join(dB, col("key") === col("kb")).select(col("key"), col("sb").as("w"))
    val delta = term1.unionAll(term2)
      .groupBy("key").agg(sum(col("w")).as("cnt_delta"))

    val current = ops.read(spark, dstDir)
    val merged = current.join(delta, Seq("key"), "full_outer")
      .select(col("key"),
        (coalesce(col("n_pairs"), lit(0L)) + coalesce(col("cnt_delta"), lit(0L))).as("n_pairs"))
      .filter(col("n_pairs") > 0)

    val writeDir = new Path(ops.dataDir(dstDir), s"w-${java.util.UUID.randomUUID()}")
    merged.write.parquet(writeDir.toString)
    val files = listParquet(ops, writeDir)
    ops.commit(dstDir,
      Seq(Requirement.AssertRefSnapshotId("main",
        dstMeta.currentSnapshot.map(_.snapshotId))),
      ops.buildSnapshotUpdates(dstDir, dstMeta, files, "overwrite") :+
        MetadataUpdate.SetProperties(Map(
          "graft.mv.last-seq-a" -> headA.toString,
          "graft.mv.last-seq-b" -> headB.toString)))
  }

  /** Continuous maintenance: the source's `$changes` stream is the
    * TRIGGER (its rows are not consumed — [[refreshSumCount]] computes
    * exact deltas from its own committed watermark, so a restart or a
    * duplicate trigger can never double-apply). Each source commit —
    * append, rewrite, or MOR delete — wakes one refresh. */
  def refreshContinuously(
      spark: SparkSession,
      ops: TableOps,
      srcChangesTable: String, // e.g. "graft.ns.`t$changes`"
      srcDir: Path,
      dstDir: Path,
      keyCols: Seq[String],
      valueCol: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.table(srcChangesTable)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (_: DataFrame, _: Long) =>
        refreshSumCount(spark, ops, srcDir, dstDir, keyCols, valueCol)
        ()
      }
      .start()

  /** C62 — incrementally-maintained APPROX COUNT DISTINCT via
    * mergeable HLL sketches (Apache DataSketches, the `hll_sketch_agg`
    * / `hll_union` / `hll_sketch_estimate` built-ins): the destination
    * holds `keys..., sketch BINARY, approx_distinct, n_rows`, and a
    * refresh folds ONLY the new commits' sketch into the stored one —
    * sketch union is register-wise max, so it is associative,
    * commutative and idempotent per item, which makes the incremental
    * union EXACTLY equal (same registers, same estimate) to a from-
    * scratch rebuild over the union of inputs. That identity is what
    * makes sketches the 100 TB answer for distinct counts: per-group
    * state is O(KB) regardless of cardinality, partials merge without
    * re-reading history, and the MV refresh stays O(churn).
    *
    * Deletes can't be retracted from an HLL (registers only grow), so
    * any group touched by a delete is recomputed from the source at
    * the PINNED head seq — the same recompute-on-retract strategy as
    * [[refreshMinMax]], and the same O(invalidated groups) repair
    * cost. Same guarded single-commit crash consistency throughout. */
  def refreshApproxDistinct(
      spark: SparkSession,
      ops: TableOps,
      srcDir: Path,
      dstDir: Path,
      keyCols: Seq[String],
      valueCol: String): TableMetadata = {
    require(keyCols.nonEmpty, "need at least one aggregation key")
    val (_, srcMeta) = ops.load(srcDir).getOrElse(
      throw new IllegalArgumentException(s"source table does not exist at $srcDir"))
    val headSeq = srcMeta.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)

    if (!ops.exists(dstDir)) {
      val srcSchema = SchemaBridge.toSpark(srcMeta.currentSchema)
      val dstSchema = org.apache.spark.sql.types.StructType(
        keyCols.map(k => srcSchema.fields.find(_.name == k).getOrElse(
          throw new IllegalArgumentException(s"key column $k not in source schema"))) ++ Seq(
          org.apache.spark.sql.types.StructField("sketch",
            org.apache.spark.sql.types.BinaryType),
          org.apache.spark.sql.types.StructField("approx_distinct",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_rows",
            org.apache.spark.sql.types.LongType)))
      ops.create(dstDir, TableMetadata.create(
        dstDir.toString, SchemaBridge.fromSpark(dstSchema),
        PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty),
        Map("graft.mv.last-seq" -> "0",
            "graft.mv.source" -> srcDir.toString,
            "graft.mv.keys" -> keyCols.mkString(","),
            "graft.mv.value" -> valueCol,
            "graft.mv.agg" -> "hll")))
    }
    val (_, dstMeta) = ops.load(dstDir).get
    val lastSeq = dstMeta.properties.get("graft.mv.last-seq").map(_.toLong).getOrElse(0L)
    if (headSeq <= lastSeq) return dstMeta

    val delta = ops.changes(spark, srcDir, lastSeq, headSeq)
      .withColumn("_sign", when(col("_change_type") === "insert", 1L).otherwise(-1L))
      .groupBy(keyCols.map(col): _*)
      .agg(
        expr(s"hll_sketch_agg(CASE WHEN _sign = 1 THEN $valueCol END)").as("ins_sketch"),
        sum(when(col("_sign") === -1L, 1L).otherwise(0L)).as("n_deletes"),
        sum(col("_sign")).as("cnt_delta"))

    val current = ops.read(spark, dstDir)
    val joined = current.join(delta, keyCols, "full_outer")
      .withColumn("new_n",
        coalesce(col("n_rows"), lit(0L)) + coalesce(col("cnt_delta"), lit(0L)))
      .withColumn("needs_repair",
        col("new_n") > 0 && coalesce(col("n_deletes"), lit(0L)) > 0)
    val repairKeys = joined.filter(col("needs_repair")).select(keyCols.map(col): _*)
    val repaired = ops.readAtSeq(spark, srcDir, headSeq)
      .join(repairKeys, keyCols, "left_semi")
      .groupBy(keyCols.map(col): _*)
      .agg(expr(s"hll_sketch_agg($valueCol)").as("sketch"),
           count(lit(1)).as("n_rows"))
    val folded = joined.filter(col("new_n") > 0 && !coalesce(col("needs_repair"), lit(false)))
      .select(
        keyCols.map(col) ++ Seq(
          when(col("sketch").isNull, col("ins_sketch"))
            .when(col("ins_sketch").isNull, col("sketch"))
            .otherwise(expr("hll_union(sketch, ins_sketch)")).as("sketch"),
          col("new_n").as("n_rows")): _*)
    val merged = folded.unionByName(repaired)
      .withColumn("approx_distinct", expr("hll_sketch_estimate(sketch)"))
      .select(keyCols.map(col) ++ Seq(col("sketch"), col("approx_distinct"), col("n_rows")): _*)

    val writeDir = new Path(ops.dataDir(dstDir), s"w-${java.util.UUID.randomUUID()}")
    merged.write.parquet(writeDir.toString)
    val files = listParquet(ops, writeDir)
    ops.commit(dstDir,
      Seq(Requirement.AssertRefSnapshotId("main",
        dstMeta.currentSnapshot.map(_.snapshotId))),
      ops.buildSnapshotUpdates(dstDir, dstMeta, files, "overwrite") :+
        MetadataUpdate.SetProperties(Map("graft.mv.last-seq" -> headSeq.toString)))
  }

  /** C88 — register `mvDir` on its SOURCE table as a rewrite target:
    * eligible aggregate queries over the source are transparently
    * redirected to the MV by [[RewriteToMaterializedView]] whenever the
    * MV is exactly at the source's head sequence. Explicit opt-in —
    * only stamped tables ever pay the planner's metadata probe. */
  def enableRewrite(ops: TableOps, srcDir: Path, mvDir: Path): TableMetadata = {
    // read-modify-write of the comma-separated list, so the commit is
    // guarded on the snapshot the list was read from and the whole
    // check-and-append re-runs on a lost race — two concurrent
    // registrations can't overwrite each other
    var attempts = 0
    while (true) {
      val (_, srcMeta) = ops.load(srcDir).getOrElse(
        throw new IllegalArgumentException(s"source table does not exist at $srcDir"))
      val existing = srcMeta.properties.get(RewriteToMaterializedView.RewriteProp)
        .toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      if (existing.contains(mvDir.toString)) return srcMeta
      try {
        // pin the PROPERTY, not the ref: property-only commits never
        // move main, so a ref assertion would not serialize them
        return ops.commit(srcDir,
          Seq(Requirement.AssertProperty(RewriteToMaterializedView.RewriteProp,
            srcMeta.properties.get(RewriteToMaterializedView.RewriteProp))),
          Seq(MetadataUpdate.SetProperties(Map(
            RewriteToMaterializedView.RewriteProp ->
              (existing :+ mvDir.toString).mkString(",")))))
      } catch {
        case e: CommitFailedException if attempts < 20 &&
            (e.getMessage.contains("concurrent commit") ||
             e.getMessage.contains("assert-property")) =>
          attempts += 1 // lost race: re-read, re-check, retry
          Thread.sleep(15L * attempts)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def listParquet(ops: TableOps, dir: Path): Seq[String] = {
    val fs = dir.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return Seq.empty
    val it = fs.listFiles(dir, true)
    val buf = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next().getPath
      if (f.getName.endsWith(".parquet")) buf += f.toString
    }
    buf.result()
  }
}
