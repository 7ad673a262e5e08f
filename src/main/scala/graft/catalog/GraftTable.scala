package graft.catalog

import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 table over graft metadata (reference surface: a table the
  * denali catalog serves, with snapshot commit + time travel).
  *
  * Read path: the snapshot's data-file list (from its manifest) is
  * handed to Spark's own parquet `FileTable` implementation, so scans
  * get the stock pushdown / pruning / vectorized reader — the catalog
  * adds snapshot resolution, not a bespoke reader. Time travel via
  * scan options `snapshot-id`, `ref`, or `as-of-timestamp` (ms), or
  * SQL `VERSION AS OF` / `TIMESTAMP AS OF` (pinned at loadTable).
  *
  * Write path: each write lands in a private `data/w-<uuid>/` dir via
  * the stock parquet writer; on commit the file list becomes a new
  * snapshot through the CAS metadata commit ([[TableOps.commitFiles]]).
  * INSERT INTO → append snapshot; INSERT OVERWRITE (truncate) → an
  * overwrite snapshot that REFERENCES only the new files — old files
  * stay on disk for older snapshots, so time travel survives.
  */
final class GraftTable(
    tableName: String,
    dir: Path,
    meta: TableMetadata,
    ops: TableOps,
    pinnedFiles: Option[Seq[DataFileEntry]] = None,
    /** C87 staging hook: when set, batch writes deliver their written
      * file list HERE instead of committing — the StagedTable publishes
      * everything in commitStagedChanges (atomic CTAS/RTAS). */
    stagedSink: Option[Seq[String] => Unit] = None)
    extends Table with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  private def spark: SparkSession = SparkSession.active

  // read-only views for the planner rules (C88 MV rewrite)
  private[graft] def graftDir: Path = dir
  private[graft] def graftMeta: TableMetadata = meta
  private[graft] def graftOps: TableOps = ops
  private[graft] def graftPinned: Boolean = pinnedFiles.isDefined

  override def name(): String = tableName

  /** `_file` / `_pos` — the data file a row lives in and its absolute
    * row ordinal within that file (auditing, maintenance, positional
    * deletes). Spark's own `_metadata` struct does not resolve through
    * DSv2 catalog tables, so the columns are synthesized here (see
    * [[FileTagging]] / [[MorFilter.PerFileFactory]]). */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = "_file"
      override def dataType: org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.StringType
      override def isNullable: Boolean = false
      override def comment(): String = "path of the data file holding the row"
    },
    new MetadataColumn {
      override def name(): String = "_pos"
      override def dataType: org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.LongType
      override def isNullable: Boolean = false
      override def comment(): String = "row ordinal within the data file"
    },
    new MetadataColumn { // C70 — row lineage
      override def name(): String = "_row_id"
      override def dataType: org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.LongType
      override def isNullable: Boolean = true
      override def comment(): String =
        "stable table-unique row id (lineage-enabled tables; null otherwise)"
    })

  override lazy val schema: StructType = SchemaBridge.toSpark(meta.currentSchema)

  override def partitioning(): Array[Transform] =
    meta.specs.find(_.specId == meta.defaultSpecId).toArray
      .flatMap(_.fields.map(f => Expressions.identity(f.name)))

  override def properties(): util.Map[String, String] = {
    val out = new util.HashMap[String, String]()
    meta.properties.foreach { case (k, v) => out.put(k, v) }
    out.put("format", s"graft/$fmtName")
    out.put("table-uuid", meta.tableUuid)
    meta.currentSnapshotId.foreach(id => out.put("current-snapshot-id", id.toString))
    out
  }

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
        TableCapability.OVERWRITE_BY_FILTER, TableCapability.OVERWRITE_DYNAMIC,
        TableCapability.MICRO_BATCH_READ)
      .asJava

  /** C79 — CHECK constraints, reported as ENFORCED + VALID: ADD
    * CONSTRAINT validated the existing rows, and Spark's write
    * planning injects the predicate validation into every INSERT so
    * violating rows fail the write, never land in a file. */
  override def constraints(): Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    meta.properties.toSeq.sortBy(_._1).collect {
      case (k, sql) if k.startsWith("graft.constraint.check.") =>
        org.apache.spark.sql.connector.catalog.constraints.Constraint
          .check(k.stripPrefix("graft.constraint.check."))
          .predicateSql(sql)
          .enforced(true)
          .validationStatus(
            org.apache.spark.sql.connector.catalog.constraints.Constraint.ValidationStatus.VALID)
          .build(): org.apache.spark.sql.connector.catalog.constraints.Constraint
    }.toArray

  /** Data-file format of this table: `graft.format` property, parquet
    * by default, `orc` supported (C58). Delete files are ALWAYS
    * parquet — they are graft-internal state, not user data. */
  private def fmtName: String =
    meta.properties.getOrElse("graft.format", "parquet")

  private def dataDelegate(paths: Seq[String])
      : org.apache.spark.sql.execution.datasources.v2.FileTable =
    dataDelegate(paths, schema)

  /** Format-dispatched DSv2 file-table delegate: ParquetTable or
    * OrcTable — both FileTables with identical scan/write builder
    * surfaces, so every downstream path (pushdown, pruning, MOR
    * per-file readers, write builders) is format-agnostic. */
  private def dataDelegate(paths: Seq[String], tableSchema: StructType)
      : org.apache.spark.sql.execution.datasources.v2.FileTable =
    if (fmtName == "orc")
      org.apache.spark.sql.execution.datasources.v2.orc.OrcTable(
        tableName, spark,
        new CaseInsensitiveStringMap(new util.HashMap[String, String]()),
        paths, Some(tableSchema),
        classOf[org.apache.spark.sql.execution.datasources.orc.OrcFileFormat])
    else parquetDelegate(paths, tableSchema)

  private def dataScanBuilder(
      paths: Seq[String], tableSchema: StructType, options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.execution.datasources.v2.FileScanBuilder =
    // ParquetScanBuilder and OrcScanBuilder both extend FileScanBuilder;
    // FileTable's declared return type is just the narrow interface
    dataDelegate(paths, tableSchema).newScanBuilder(options)
      .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.FileScanBuilder]

  private def parquetDelegate(paths: Seq[String], tableSchema: StructType): ParquetTable =
    new ParquetTable(
      tableName,
      spark,
      new CaseInsensitiveStringMap(new util.HashMap[String, String]()),
      paths,
      Some(tableSchema),
      classOf[ParquetFileFormat])

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val entries = pinnedFiles match {
      case Some(pinned) => pinned
      case None =>
        ops.resolveEntries(
          dir, meta,
          snapshotId = Option(options.get("snapshot-id")).map(_.toLong),
          ref = Option(options.get("ref")),
          asOfTimestampMs = Option(options.get("as-of-timestamp")).map(_.toLong))
    }
    new GraftScanBuilder(entries, options)
  }

  /** Scan planning with manifest-stat file skipping: Spark pushes the
    * catalyst predicates here; files whose min/max PROVE no row can
    * match are dropped before the parquet delegate is built, so they
    * are never listed, opened or scheduled. The full predicate set is
    * then forwarded to the parquet builder (row-group pushdown) and
    * its residual answer is returned to Spark — skipping is a strict
    * optimization, never a correctness dependency. */
  private final class GraftScanBuilder(
      entries: Seq[DataFileEntry], options: CaseInsensitiveStringMap)
      extends ScanBuilder
      with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
      with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
      with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
      with org.apache.spark.sql.connector.read.SupportsPushDownLimit {

    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.execution.datasources.GraftBridge

    private val dataEntries = entries.filter(_.isData)
    private val eqDeletes = entries.filter(_.isEqDelete)
    private val posDeletes = entries.filter(_.isPosDelete)
    private val dvDeletes = entries.filter(_.isDvDelete)

    private var delegate: org.apache.spark.sql.execution.datasources.v2.FileScanBuilder =
      dataScanBuilder(dataEntries.map(_.path), schema, options)
    // Stashed for the micro-batch stream, which re-applies the same
    // pushdown state to each per-snapshot delta scan.
    private var predicateState: Seq[Expression] = Seq.empty
    private var requiredState: Option[StructType] = None
    private var keptEntries: Seq[DataFileEntry] = dataEntries

    override def pushFilters(predicates: Seq[Expression]): Seq[Expression] = {
      predicateState = predicates
      val translated = predicates.flatMap(GraftBridge.translateFilter)
      // C65 hidden partitioning: equality/IN predicates on a
      // bucket-transformed source column derive predicates on the
      // materialized __pt_ bucket column, whose per-file stats came
      // from the parquet footers like any column's. Files written
      // without the hidden column (e.g. SQL INSERT) have no __pt_
      // stats and are conservatively kept.
      val specFields = meta.specs.find(_.specId == meta.defaultSpecId)
        .map(_.fields).getOrElse(Seq.empty)
      // derived bucket predicates only against current-hash __pt_
      // stats — an unmarked (old-hash) table must not be pruned by
      // values a different hash produced (Transforms.BucketHashProp)
      val derived =
        if (Transforms.hashCurrent(meta))
          translated.flatMap(f => Transforms.derive(specFields, schema, f))
        else Seq.empty
      val ptSchema = Transforms.ptSchema(specFields, schema)
      val kept = dataEntries.filter(e =>
        (translated ++ derived).forall(f => Stats.mayContain(e, ptSchema, f)))
      keptEntries = kept
      delegate = dataScanBuilder(kept.map(_.path), schema, options)
      delegate.pushFilters(predicates)
    }
    override def pushedFilters(): Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
      delegate.pushedFilters
    /** Requested metadata columns, in requiredSchema order. */
    private var metaCols: Seq[String] = Seq.empty

    override def pruneColumns(requiredSchema: StructType): Unit = {
      if (aggResult.isDefined) {
        // complete aggregate pushdown: the "required schema" is the
        // aggregation's OUTPUT (MIN(v), count(*), ...) — nothing to
        // forward to the parquet delegate, the answer is already known
        requiredState = Some(requiredSchema)
        return
      }
      metaCols = requiredSchema.fieldNames.toSeq
        .filter(n => n == "_file" || n == "_pos" || n == "_row_id")
      val dataSchema =
        StructType(requiredSchema.fields.filterNot(f => metaCols.contains(f.name)))
      requiredState = Some(dataSchema)
      delegate.pruneColumns(dataSchema)
    }

    /** C83 — LIMIT pushdown to the FILE LIST: with no filters and no
      * pending deletes, every manifest row is a result row, so `LIMIT
      * n` needs only the first files whose cumulative row count
      * reaches n — a `SELECT * FROM t LIMIT 10` on a million-file
      * table plans ONE file instead of a full scan. Partial-push
      * contract: Spark keeps the limit operator, so returning
      * whole-file granularity (≥ n rows) is always correct. */
    override def pushLimit(limit: Int): Boolean = {
      if (predicateState.nonEmpty) return false
      if (eqDeletes.nonEmpty || posDeletes.nonEmpty || dvDeletes.nonEmpty) return false
      if (keptEntries.exists(_.rows.isEmpty)) return false
      var acc = 0L
      val kept = keptEntries.takeWhile { e =>
        val before = acc; acc += e.rows.get; before < limit
      }
      if (kept.size == keptEntries.size) return false // nothing saved
      keptEntries = kept
      delegate = dataScanBuilder(kept.map(_.path), schema, options)
      requiredState.foreach(delegate.pruneColumns)
      true
    }

    /** C82 — aggregate pushdown to MANIFEST STATS: `COUNT(*)`,
      * `COUNT(col)`, `MIN(col)`, `MAX(col)` with no filters, no
      * grouping and no pending deletes are answered from per-file
      * row counts and min/max/null-counts alone — the scan plans as a
      * driver-side LocalScan and reads ZERO data files. At 100 TB
      * this turns the most common sanity queries from cluster jobs
      * into metadata lookups. Strictly conservative: any entry
      * missing the needed stat (all-null files, pre-evolution files,
      * stat-less types, possibly-truncated long strings) refuses the
      * pushdown and the normal scan runs. */
    private var aggResult: Option[(Array[Any], StructType)] = None

    override def supportCompletePushDown(
        agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
      computeAgg(agg).isDefined

    override def pushAggregation(
        agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
      computeAgg(agg) match {
        case Some(values) =>
          aggResult = Some((values, aggOutputSchema(agg)))
          true
        case None => false
      }

    /** The scan's contract under complete pushdown: readSchema IS the
      * aggregation's output row shape (positional). */
    private def aggOutputSchema(
        agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): StructType = {
      import org.apache.spark.sql.connector.expressions.NamedReference
      import org.apache.spark.sql.connector.expressions.aggregate._
      import org.apache.spark.sql.types._
      StructType(agg.aggregateExpressions().toIndexedSeq.map {
        case _: CountStar =>
          org.apache.spark.sql.types.StructField("count(*)", LongType, nullable = false)
        case c: Count =>
          org.apache.spark.sql.types.StructField(c.toString, LongType, nullable = false)
        case m: Min =>
          val n = m.column().asInstanceOf[NamedReference].fieldNames.head
          org.apache.spark.sql.types.StructField(m.toString, schema(n).dataType, nullable = true)
        case m: Max =>
          val n = m.column().asInstanceOf[NamedReference].fieldNames.head
          org.apache.spark.sql.types.StructField(m.toString, schema(n).dataType, nullable = true)
        case other => throw new IllegalStateException(s"unpushable aggregate $other")
      })
    }

    private def computeAgg(
        agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
        : Option[Array[Any]] = {
      import org.apache.spark.sql.connector.expressions.NamedReference
      import org.apache.spark.sql.connector.expressions.aggregate._
      import org.apache.spark.sql.types._
      if (agg.groupByExpressions().nonEmpty || predicateState.nonEmpty) return None
      if (eqDeletes.nonEmpty || posDeletes.nonEmpty || dvDeletes.nonEmpty) return None
      val entries = dataEntries.map(e => SchemaEvolution.statsToCurrent(meta, e))
      if (entries.exists(_.rows.isEmpty)) return None
      def colName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
        e match {
          case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames.head)
          case _ => None
        }
      // parquet-mr may truncate long binary stats (bound-preserving,
      // value-destroying) — refuse strings long enough to be suspect
      def statVal(s: String, dt: DataType): Option[Any] = dt match {
        case IntegerType => scala.util.Try(s.toInt).toOption
        case LongType => scala.util.Try(s.toLong).toOption
        case DoubleType => scala.util.Try(s.toDouble).toOption
        case FloatType => scala.util.Try(s.toFloat).toOption
        case StringType if s.length <= 48 =>
          Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        case DateType => scala.util.Try(s.toInt).toOption
        case TimestampType | TimestampNTZType => scala.util.Try(s.toLong).toOption
        case _ => None
      }
      def cmp(a: Any, b: Any, dt: DataType): Int = dt match {
        case IntegerType | DateType => Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
        case LongType | TimestampType | TimestampNTZType =>
          java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
        case DoubleType => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
        case FloatType => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
        case StringType => a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
          .compareTo(b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
        case _ => 0
      }
      def extremum(n: String, wantMin: Boolean): Option[Any] = {
        val dt = schema.fields.find(_.name == n).map(_.dataType).getOrElse(return None)
        val per = entries.flatMap { e =>
          e.stats.get(n) match {
            case Some(cs) if cs.min.isDefined && cs.max.isDefined =>
              val s = (if (wantMin) cs.min else cs.max).get
              Some(statVal(s, dt).getOrElse(return None))
            // a provably all-null file contributes nothing to MIN/MAX
            case Some(cs) if cs.nulls.isDefined && e.rows == cs.nulls => None
            case _ => return None
          }
        }
        // no contributing file (empty table / every row null) ⇒ NULL
        if (per.isEmpty) Some(null) else
          Some(per.reduce((a, b) => if (cmp(a, b, dt) < 0 == wantMin) a else b))
      }
      val out = agg.aggregateExpressions().map {
        case _: CountStar =>
          entries.map(_.rows.get).sum: Any
        case c: Count if !c.isDistinct =>
          val n = colName(c.column()).getOrElse(return None)
          val per = entries.map { e =>
            val cs = e.stats.get(n).getOrElse(return None)
            val nulls = cs.nulls.getOrElse(return None)
            e.rows.get - nulls
          }
          per.sum: Any
        case m: Min =>
          extremum(colName(m.column()).getOrElse(return None), wantMin = true)
            .getOrElse(return None)
        case m: Max =>
          extremum(colName(m.column()).getOrElse(return None), wantMin = false)
            .getOrElse(return None)
        case _ => return None
      }
      Some(out)
    }

    /** Merge-on-read / metadata-column scan: partitions are re-planned
      * one-per-file, the parquet delegate reads the requested columns
      * PLUS any missing delete-key columns, and a per-file reader
      * assigns row ordinals, drops dead rows (positional + seq-aware
      * equality deletes) and appends the requested metadata columns.
      * Delete sets are read PER TASK on the executors (planned here as
      * parquet sub-scans, decoded+cached JVM-wide by MorFilter) — the
      * driver never materializes keys or coordinates, so a
      * multi-million-key delete commit cannot OOM it or bloat task
      * serialization.
      *
      * When ordinals matter (pos-deletes present or `_pos` requested)
      * the delegate gets NO pushdown — parquet row-group skipping
      * would shift ordinals; Spark re-applies every data filter above
      * the scan, so this costs I/O, never correctness. Manifest-stat
      * file skipping stays on either way (whole-file skips don't
      * disturb other files' ordinals). */
    private def buildMorOrMeta(): org.apache.spark.sql.connector.read.Scan = {
      if (keptEntries.exists(e => SchemaEvolution.renames(meta, e).nonEmpty))
        throw new UnsupportedOperationException(
          "reading renamed-column history with merge-on-read deletes or " +
          "metadata columns is not supported — run TableOps.applyDeletes / " +
          "compact to rewrite files under the current schema first")
      def norm(p: String): String = new Path(p).toUri.getPath
      val required = requiredState.getOrElse(schema)
      val needOrdinals = posDeletes.nonEmpty || dvDeletes.nonEmpty ||
        metaCols.contains("_pos") || metaCols.contains("_row_id")
      val allKeyCols = eqDeletes.flatMap(_.equalityColumns).distinct
      val missing = allKeyCols.filterNot(required.fieldNames.contains)
      // C70: when _row_id is requested, the delegate also projects the
      // hidden physical `__row_id` column — present in files rewritten
      // by lineage-preserving maintenance, null-filled everywhere else
      // (the reader then falls back to firstRowId + ordinal).
      val wantRowId = metaCols.contains("_row_id")
      val rowIdField = org.apache.spark.sql.types.StructField(
        RowLineage.PhysCol, org.apache.spark.sql.types.LongType, nullable = true)
      val extended = StructType(
        required.fields ++ missing.map(c => schema.fields.find(_.name == c).getOrElse(
          throw new IllegalStateException(s"delete key column $c missing from table schema")))
        ++ (if (wantRowId) Seq(rowIdField) else Seq.empty))
      val delegateSchema = if (wantRowId) schema.add(rowIdField) else schema
      val b = dataScanBuilder(keptEntries.map(_.path), delegateSchema, options)
      if (!needOrdinals && predicateState.nonEmpty) b.pushFilters(predicateState)
      b.pruneColumns(extended)
      val inner = b.build()
      // Delete state stays OFF the driver: only the planned parquet
      // sub-scan over each delete-file group (paths + offsets) ships
      // to executors, which decode and cache the sets themselves
      // (MorFilter.deadKeys / deadPositions).
      def deleteHandle(paths: Seq[String], ds: StructType): MorFilter.DeleteScanHandle = {
        val db = parquetDelegate(paths, ds).newScanBuilder(
          new CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
        db.pruneColumns(ds)
        val batch = db.build().toBatch
        MorFilter.DeleteScanHandle(
          java.util.UUID.randomUUID().toString,
          batch.planInputPartitions().toIndexedSeq, batch.createReaderFactory(), ds)
      }
      val keySets = eqDeletes.groupBy(e => (e.equalityColumns, e.deleteSeq)).toSeq
        .map { case ((cols, dseq), es) =>
          val ks = StructType(cols.map(c => schema.fields.find(_.name == c).get))
          (MorFilter.KeySet(
            cols.map(extended.fieldIndex).toArray,
            cols.map(c => extended(extended.fieldIndex(c)).dataType).toArray,
            deleteHandle(es.map(_.path), ks), dseq), es, cols)
        }
      val (specPosDeletes, graftPosDeletes) = posDeletes.partition(_.isSpecPosDelete)
      val posHandle: Option[MorFilter.DeleteScanHandle] =
        if (graftPosDeletes.isEmpty) None
        else {
          val posSchema = StructType(Seq(
            org.apache.spark.sql.types.StructField("_file", org.apache.spark.sql.types.StringType, nullable = false),
            org.apache.spark.sql.types.StructField(
              "_pos", org.apache.spark.sql.types.LongType, nullable = false)))
          Some(deleteHandle(graftPosDeletes.map(_.path), posSchema))
        }
      // spec-Iceberg positional deletes (externally-committed
      // snapshots) carry the spec's column names — plan their scan
      // with the spec schema; the decode is identical
      val posSpecHandle: Option[MorFilter.DeleteScanHandle] =
        if (specPosDeletes.isEmpty) None
        else {
          val specSchema = StructType(Seq(
            org.apache.spark.sql.types.StructField("file_path", org.apache.spark.sql.types.StringType, nullable = false),
            org.apache.spark.sql.types.StructField(
              "pos", org.apache.spark.sql.types.LongType, nullable = false)))
          Some(deleteHandle(specPosDeletes.map(_.path), specSchema))
        }
      val dvHandle: Option[MorFilter.DeleteScanHandle] =
        if (dvDeletes.isEmpty) None
        else Some(deleteHandle(dvDeletes.map(_.path), DeletionVectors.schema))
      val confByPath = keptEntries.map { e =>
        val p = norm(e.path)
        // a key set applies only when newer (sequence rule) AND at
        // least one of its delete files' key ranges could intersect
        // this data file's (manifest stats both sides) — clean files
        // pay zero per-row probes for deletes that can't touch them
        val applicable = keySets.collect {
          case (ks, es, cols) if ks.deleteSeq > e.dataSeq &&
              es.exists(del => cols.forall(c =>
                Stats.rangesMayOverlap(del, e, schema, c))) => ks
        }
        p -> MorFilter.FileConf(
          applicable, posHandle, dir.toString, dvHandle, e.firstRowId, posSpecHandle)
      }.toMap
      val metaFields = metaCols.map {
        case "_file" => org.apache.spark.sql.types.StructField(
          "_file", org.apache.spark.sql.types.StringType, nullable = false)
        case "_pos" => org.apache.spark.sql.types.StructField(
          "_pos", org.apache.spark.sql.types.LongType, nullable = false)
        case "_row_id" => org.apache.spark.sql.types.StructField(
          "_row_id", org.apache.spark.sql.types.LongType, nullable = true)
      }
      val (req, mc) = (required, metaCols)

      // Delete-aware SPJ: with deletes pending (equality AND/OR
      // positional) but no metadata columns requested, the scan can
      // STILL report key-grouped partitioning — each key's files merge
      // into one partition whose reader CHAINS one per-file MOR reader
      // per member file, so every file keeps its own applicable-delete
      // keysets (the sequence rule) and its own absolute ordinal
      // counter (the positional coordinate system). Pending deletes
      // then no longer cost a co-partitioned join its shuffle-free
      // plan. (Positional ordinals stay exact because `needOrdinals`
      // already disabled parquet pushdown above — whole-file manifest
      // skips don't disturb other files' ordinals.)
      if (mc.isEmpty)
        KeyGrouping.keysFor(meta, schema, keptEntries) match {
          case Some((specCols, keyByPath)) =>
            val parts = inner.toBatch.planInputPartitions()
            val files = parts.flatMap {
              case fp: org.apache.spark.sql.execution.datasources.FilePartition => fp.files
              case _ => Array.empty[org.apache.spark.sql.execution.datasources.PartitionedFile]
            }
            val groups = files.groupBy(f =>
              keyByPath(new Path(f.urlEncodedPath).toUri.getPath)._1)
            val grouped = groups.toSeq.sortBy(_._1.mkString(" ")).zipWithIndex
              .map { case ((_, fs), i) =>
                val row = keyByPath(new Path(fs.head.urlEncodedPath).toUri.getPath)._2
                KeyGrouping.KeyedFilePartition(
                  org.apache.spark.sql.execution.datasources.FilePartition(i, fs), row)
                  : org.apache.spark.sql.connector.read.InputPartition
              }.toArray
            return new org.apache.spark.sql.connector.read.Scan
                with org.apache.spark.sql.connector.read.SupportsReportPartitioning {
              import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
              override def readSchema(): StructType = req
              override def description(): String =
                s"${inner.description()} morEq=${eqDeletes.size} morPos=${posDeletes.size} morDv=${dvDeletes.size} keyGrouped=${specCols.map(_.name)}"
              override def outputPartitioning(): Partitioning =
                new KeyGroupedPartitioning(
                  specCols.map(KeyGrouping.partitionExpr).toArray,
                  grouped.length)
              override def toBatch: org.apache.spark.sql.connector.read.Batch =
                new org.apache.spark.sql.connector.read.Batch {
                  override def planInputPartitions() = grouped
                  override def createReaderFactory() =
                    KeyGrouping.UnwrappingReaderFactory(
                      MorFilter.ChainedPerFileFactory(
                        MorFilter.PerFileFactory(inner.toBatch.createReaderFactory(),
                          confByPath, req.size, extended, Seq.empty)))
                }
            }
          case None => ()
        }

      new org.apache.spark.sql.connector.read.Scan {
        override def readSchema(): StructType = StructType(req.fields ++ metaFields)
        override def description(): String =
          s"${inner.description()} morEq=${eqDeletes.size} morPos=${posDeletes.size} morDv=${dvDeletes.size} meta=$mc"
        override def toBatch: org.apache.spark.sql.connector.read.Batch =
          new org.apache.spark.sql.connector.read.Batch {
            override def planInputPartitions() =
              FileTagging.perFilePartitions(inner.toBatch.planInputPartitions())
            override def createReaderFactory() =
              MorFilter.PerFileFactory(inner.toBatch.createReaderFactory(),
                confByPath, req.size, extended, mc)
          }
      }
    }

    override def build(): org.apache.spark.sql.connector.read.Scan = {
      aggResult match {
        case Some((values, out)) =>
          // C82: the aggregation was answered from manifest stats —
          // plan as a LocalScan (zero files listed, opened, scheduled)
          return new org.apache.spark.sql.connector.read.LocalScan {
            override def readSchema(): StructType = out
            override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] =
              Array(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values))
            override def description(): String =
              s"GraftManifestAggScan${out.fieldNames.mkString("[", ", ", "]")}"
          }
        case None => ()
      }
      if (eqDeletes.nonEmpty || posDeletes.nonEmpty || dvDeletes.nonEmpty ||
          metaCols.nonEmpty)
        return buildMorOrMeta()
      // Field-id schema evolution: files written before a RENAME read
      // via their physical names in current column order (positional
      // alignment — no projection, columnar stays on), one delegate
      // per distinct rename signature.
      val renameGroups = keptEntries.groupBy(e => SchemaEvolution.renames(meta, e))
      if (renameGroups.keys.exists(_.nonEmpty))
        return new MultiSchemaScan(renameGroups.toSeq, options, predicateState, requiredState)
      val batchScan = delegate.build()
      KeyGrouping.keysFor(meta, schema, keptEntries) match {
        case Some((specCols, keyByPath)) =>
          new KeyGroupedScan(batchScan, specCols, keyByPath, options, predicateState,
            requiredState, keptEntries)
        case None =>
          /** C63 — runtime file pruning: beyond the static manifest
            * skipping in pushFilters, the scan accepts RUNTIME
            * predicates (Spark's dynamic-pruning subqueries inject
            * them when this table is the probe side of a selective
            * join — the DSv2 analogue of dynamic partition pruning)
            * and re-plans its parquet delegate over only the files
            * whose manifest min/max may contain the join keys. On a
            * partitioned or sort-ordered (C34) / z-ordered (C42)
            * table this turns "scan the fact table, filter after the
            * join" into "read only the files the dim filter touches"
            * — at 100 TB the difference between a full scan and a few
            * hundred files. Declared on every stats-bearing column so
            * clustering on ANY join key benefits, not just partition
            * columns; unknown predicate shapes are ignored
            * (conservative: no pruning, never wrong). The key-grouped
            * (SPJ) branch above deliberately does NOT runtime-prune:
            * dropping files there would have to preserve the reported
            * KeyGroupedPartitioning co-grouping contract. */
          new org.apache.spark.sql.connector.read.Scan
              with org.apache.spark.sql.connector.read.SupportsReportStatistics
              with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
            import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
            import org.apache.spark.sql.connector.expressions.filter.Predicate

            @volatile private var runtimeKept: Seq[DataFileEntry] = keptEntries

            // Only columns in the PRUNED output may be declared:
            // Spark's PartitionPruning resolves these refs against the
            // scan's output attributes and throws on anything pruned
            // away (a join key is necessarily in the output anyway).
            override def filterAttributes(): Array[NamedReference] = {
              val out = readSchema().fieldNames.toSet
              schema.fieldNames
                .filter(out.contains)
                .filter(n => keptEntries.exists(_.stats.contains(n)))
                .map(n => Expressions.column(n)
                  : NamedReference)
            }

            override def filter(predicates: Array[Predicate]): Unit = {
              val specFields = meta.specs.find(_.specId == meta.defaultSpecId)
                .map(_.fields).getOrElse(Seq.empty)
              val ptSchema = Transforms.ptSchema(specFields, schema)
              predicates.foreach(p => toSourceFilter(p).foreach { f =>
                // runtime join keys also prune through bucket
                // transforms (C65) — a DPP IN-set on the source
                // column derives the bucket IN-set (current-hash
                // tables only, same guard as the static path)
                val fs =
                  if (Transforms.hashCurrent(meta))
                    f +: Transforms.derive(specFields, schema, f)
                  else Seq(f)
                runtimeKept = runtimeKept.filter(e =>
                  fs.forall(Stats.mayContain(e, ptSchema, _)))
              })
            }

            private def toSourceFilter(p: Predicate)
                : Option[org.apache.spark.sql.sources.Filter] = p.name() match {
              case "IN" => p.children().toSeq match {
                case Seq(ref: NamedReference, rest @ _*)
                    if ref.fieldNames().length == 1 &&
                       rest.forall(_.isInstanceOf[Literal[_]]) =>
                  Some(org.apache.spark.sql.sources.In(ref.fieldNames()(0),
                    rest.map(l => fromInternal(l.asInstanceOf[Literal[_]])).toArray))
                case _ => None
              }
              case "=" => p.children().toSeq match {
                case Seq(ref: NamedReference, l: Literal[_])
                    if ref.fieldNames().length == 1 =>
                  Some(org.apache.spark.sql.sources.EqualTo(
                    ref.fieldNames()(0), fromInternal(l)))
                case _ => None
              }
              case _ => None
            }
            private def fromInternal(l: Literal[_]): Any = l.value() match {
              case s: org.apache.spark.unsafe.types.UTF8String => s.toString
              case v => v
            }

            override def readSchema(): StructType = batchScan.readSchema()
            override def description(): String = batchScan.description()
            override def toBatch: org.apache.spark.sql.connector.read.Batch =
              if (runtimeKept.size == keptEntries.size) batchScan.toBatch
              else {
                val b = dataScanBuilder(runtimeKept.map(_.path), schema, options)
                if (predicateState.nonEmpty) b.pushFilters(predicateState)
                requiredState.foreach(b.pruneColumns)
                b.build().toBatch
              }
            override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
              GraftTable.manifestStatistics(runtimeKept, schema, meta.properties)
            // Scan observability (the REST surface's metrics-report
            // endpoint, Spark-native): manifest-pruning counters land
            // in the SQL UI as driver metrics for every query; after a
            // runtime filter fires, `skipped` includes its prunes.
            override def supportedCustomMetrics()
                : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
              GraftTable.scanMetrics
            override def reportDriverMetrics()
                : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
              GraftTable.driverMetrics(
                kept = runtimeKept.size, skipped = dataEntries.size - runtimeKept.size)
            override def toMicroBatchStream(checkpointLocation: String)
                : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
              require(pinnedFiles.isEmpty, "cannot stream a time-travel-pinned table")
              new GraftMicroBatchStream(options, predicateState, requiredState)
            }
          }
      }
    }
  }

    /** Field-id evolution scan: one parquet delegate per rename
      * signature, each reading its files through their PHYSICAL
      * column names in the CURRENT column order — rows and columnar
      * batches align positionally with the current schema, so no
      * projection and no vectorization loss. Pushed predicates are
      * attribute-renamed per group; manifest skipping already ran on
      * current-named stats (resolveEntries re-keys them). */
    private final class MultiSchemaScan(
        groups: Seq[(Map[String, String], Seq[DataFileEntry])],
        options: CaseInsensitiveStringMap,
        predicateState: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
        requiredState: Option[StructType])
        extends org.apache.spark.sql.connector.read.Scan
        with org.apache.spark.sql.connector.read.SupportsReportStatistics {
      import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory}
      import org.apache.spark.sql.catalyst.expressions.AttributeReference

      private val required = requiredState.getOrElse(schema)

      private val scans = groups.map { case (rn, es) =>
        val b = dataScanBuilder(es.map(_.path), SchemaEvolution.physStructType(schema, rn), options)
        val renamed = predicateState.map(_.transform {
          case a: AttributeReference if rn.contains(a.name) => a.withName(rn(a.name))
        })
        if (renamed.nonEmpty) b.pushFilters(renamed)
        b.pruneColumns(SchemaEvolution.physStructType(required, rn))
        b.build()
      }

      override def readSchema(): StructType = required
      override def description(): String =
        s"graft parquet multi-schema (${groups.size} rename groups)"
      override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
        GraftTable.manifestStatistics(groups.flatMap(_._2), schema, meta.properties)
      override def toMicroBatchStream(checkpointLocation: String)
          : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
        require(pinnedFiles.isEmpty, "cannot stream a time-travel-pinned table")
        // deltaBatch does its own per-snapshot rename grouping
        new GraftMicroBatchStream(options, predicateState, requiredState)
      }
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          scans.zipWithIndex.flatMap { case (s, g) =>
            s.toBatch.planInputPartitions()
              .map(p => GraftTable.GroupTaggedPartition(p, g): InputPartition)
          }.toArray
        override def createReaderFactory(): PartitionReaderFactory =
          GraftTable.DispatchingFactory(scans.map(_.toBatch.createReaderFactory()))
      }
    }

  /** Storage-partitioned-join scan: reports `KeyGroupedPartitioning`
    * over the identity partition-spec columns and plans ONE input
    * partition per distinct key, so two co-partitioned catalog tables
    * join with NO shuffle on either side (Spark's SPJ machinery,
    * `spark.sql.sources.v2.bucketing.enabled`). Self-activating: only
    * built when every data file's manifest stats pin each spec column
    * to a single value (min == max) — the layout per-key writes and
    * per-value clustered writes produce; any straddling file falls
    * back to the plain scan and a normal shuffle plan. At 100 TB this
    * turns the repeated fact-fact join on a co-clustered key into a
    * local zip of matching partitions. */
  private final class KeyGroupedScan(
      batchScan: org.apache.spark.sql.connector.read.Scan,
      specCols: Seq[PartitionField],
      keyByPath: Map[String, (Seq[Any], org.apache.spark.sql.catalyst.InternalRow)],
      options: CaseInsensitiveStringMap,
      predicateState: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      requiredState: Option[StructType],
      statEntries: Seq[DataFileEntry] = Seq.empty)
      extends org.apache.spark.sql.connector.read.Scan
      with org.apache.spark.sql.connector.read.SupportsReportPartitioning
      with org.apache.spark.sql.connector.read.SupportsReportStatistics {
    import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory}
    import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
    import org.apache.spark.sql.execution.datasources.FilePartition

    override def readSchema(): StructType = batchScan.readSchema()
    override def description(): String =
      s"${batchScan.description()} keyGrouped=${specCols.map(_.name)}"
    override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
      GraftTable.manifestStatistics(statEntries, schema, meta.properties)

    private lazy val grouped: Array[InputPartition] = {
      val inner = batchScan.toBatch.planInputPartitions()
      val files = inner.flatMap {
        case fp: FilePartition => fp.files
        case other => throw new IllegalStateException(s"unexpected partition: $other")
      }
      files.groupBy(f => keyByPath(new Path(f.urlEncodedPath).toUri.getPath)._1)
        .toSeq.sortBy(_._1.mkString("\u0000"))
        .zipWithIndex.map { case ((k, fs), i) =>
          val row = keyByPath(new Path(fs.head.urlEncodedPath).toUri.getPath)._2
          KeyGrouping.KeyedFilePartition(FilePartition(i, fs), row): InputPartition
        }.toArray
    }

    override def outputPartitioning(): Partitioning =
      new KeyGroupedPartitioning(
        specCols.map(KeyGrouping.partitionExpr).toArray,
        grouped.length)

    override def toBatch: Batch = new Batch {
      override def planInputPartitions(): Array[InputPartition] = grouped
      override def createReaderFactory(): PartitionReaderFactory =
        KeyGrouping.UnwrappingReaderFactory(batchScan.toBatch.createReaderFactory())
    }

    override def toMicroBatchStream(checkpointLocation: String)
        : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
      require(pinnedFiles.isEmpty, "cannot stream a time-travel-pinned table")
      new GraftMicroBatchStream(options, predicateState, requiredState)
    }
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val writeDir = new Path(ops.dataDir(dir), s"w-${java.util.UUID.randomUUID()}")
    // C72: SQL inserts into bucket-partitioned tables materialize the
    // hidden `__pt_` column exactly like TableOps.write — the delegate
    // writes an augmented schema and a per-task extender appends the
    // murmur3 bucket value to every row, so SQL-inserted files carry
    // the same footer stats the scan-side pruning reads. The required
    // ordering sorts by the catalog-resolved `bucket()` function
    // (GraftFunctions), which computes the identical value.
    val specFieldsAll = meta.specs.find(_.specId == meta.defaultSpecId).toSeq
      .flatMap(_.fields).filter(f => info.schema().fieldNames.contains(f.name))
    val bucketFields = Transforms.materialized(specFieldsAll)
    // nullable: bucket(null) = null (Iceberg spec)
    val ptStructFields = bucketFields.map(f => org.apache.spark.sql.types.StructField(
      Transforms.ptColName(f), org.apache.spark.sql.types.IntegerType, nullable = true))
    val writeInfo: LogicalWriteInfo =
      if (bucketFields.isEmpty) info
      else new LogicalWriteInfo {
        override def queryId(): String = info.queryId()
        override def options(): CaseInsensitiveStringMap = info.options()
        override def schema(): StructType =
          StructType(info.schema().fields ++ ptStructFields)
        override def rowIdSchema(): java.util.Optional[StructType] = info.rowIdSchema()
        override def metadataSchema(): java.util.Optional[StructType] = info.metadataSchema()
      }
    val delegateTable =
      if (bucketFields.isEmpty) dataDelegate(Seq(writeDir.toString))
      else dataDelegate(Seq(writeDir.toString), StructType(schema.fields ++ ptStructFields))
    val bucketDescs: Seq[(Int, org.apache.spark.sql.types.DataType, Int)] =
      bucketFields.map { f =>
        val idx = info.schema().fieldIndex(f.name)
        (idx, info.schema()(idx).dataType, Transforms.parse(f.transform).arg)
      }
    val delegate = delegateTable.newWriteBuilder(writeInfo)
    // C69: filter overwrite (INSERT OVERWRITE ... PARTITION / static
    // mode / writeTo().overwrite(cond)) and dynamic partition
    // overwrite both land through here; the commit-time classification
    // (keep verbatim / drop whole / rewrite straddlers) lives in
    // TableOps.overwriteByFilter / overwriteDynamic.
    new WriteBuilder with SupportsTruncate
        with org.apache.spark.sql.connector.write.SupportsOverwrite
        with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
      private var operation = "append"
      private var overwriteFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty
      override def truncate(): WriteBuilder = { operation = "overwrite"; this }
      override def overwrite(
          filters: Array[org.apache.spark.sql.sources.Filter]): WriteBuilder = {
        if (filters.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue]))
          operation = "overwrite"
        else { operation = "overwrite-by-filter"; overwriteFilters = filters }
        this
      }
      override def overwriteDynamicPartitions(): WriteBuilder = {
        operation = "dynamic-overwrite"; this
      }
      override def build(): Write = {
        val inner = delegate.build()
        def committing: BatchWrite = {
          val base = inner.toBatch
          val extended =
            if (bucketDescs.isEmpty) base
            else new PtExtendingBatchWrite(base, bucketDescs)
          new CommittingBatchWrite(extended, writeDir, operation, overwriteFilters)
        }
        // Identity fields sort as themselves; order-preserving
        // transforms (truncate/temporal) sort by their SOURCE column
        // (equivalent clustering — contiguous raw ranges ARE
        // contiguous transform cells); bucket fields sort by the
        // catalog-resolved bucket() function (C72), clustering rows of
        // one bucket into contiguous file ranges for tight `__pt_`
        // stats.
        val specSorts = specFieldsAll.map(f =>
          Transforms.parse(f.transform) match {
            case Transforms.Parsed("bucket", n) => Left((f.name, n))
            case _ => Right(f.name)
          })
        // default sort order appended after the spec columns (same
        // policy as TableOps.write): clusters files AND orders rows
        val orderCols = meta.sortOrders.find(_.orderId == meta.defaultSortOrderId)
          .toSeq.flatMap(_.fields)
          .flatMap(f => meta.currentSchema.fields.find(_.id == f.sourceId)
            .map(nf => (nf.name, f.direction == "desc")))
          .filterNot { case (n, _) => specSorts.contains(Right(n)) }
        if (specSorts.isEmpty && orderCols.isEmpty)
          new Write {
            override def toBatch: BatchWrite = committing
          }
        else
          // Partitioned table: require Spark to cluster + sort incoming
          // rows on the spec columns, so each written file covers a
          // tight value range and manifest min/max skipping bites.
          new Write with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
            import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
            import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder => V2SortOrder}
            private def sortOrders: Array[V2SortOrder] = {
              val spec = specSorts.map {
                case Left((c, n)) => Expressions.sort(
                  Expressions.bucket(n, c), SortDirection.ASCENDING)
                case Right(c) => Expressions.sort(
                  Expressions.identity(c), SortDirection.ASCENDING)
              }
              val order = orderCols.map { case (c, desc) => Expressions.sort(
                Expressions.identity(c),
                if (desc) SortDirection.DESCENDING else SortDirection.ASCENDING) }
              (spec ++ order).toArray
            }
            // ordered (RANGE) distribution, not hash-clustered: each
            // output file then covers a contiguous value range, which
            // is what makes min/max skipping effective.
            override def requiredDistribution(): Distribution =
              Distributions.ordered(sortOrders)
            override def requiredOrdering(): Array[V2SortOrder] = sortOrders
            // 0 = let AQE size the write (≈ one file per advisory
            // partition); the table property pins an explicit count.
            override def requiredNumPartitions(): Int =
              meta.properties.get("graft.write.target-file-count")
                .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(0)
            override def toBatch: BatchWrite = committing
          }
      }
    }
  }

  /** TRUNCATE TABLE — an overwrite snapshot with zero files; all
    * prior snapshots stay time-travelable. */
  override def truncateTable(): Boolean = {
    ops.commitFiles(dir, Seq.empty, "overwrite")
    true
  }

  /** SQL UPDATE / MERGE INTO — group-based copy-on-write at FILE
    * granularity. Spark's rewrite plans read the table through the
    * operation's scan, compute the post-operation rows, and replace
    * what the scan surfaced.
    *
    * Spark's `GroupBasedRowLevelOperationScanPlanning` pushes the
    * command condition into this scan builder for GROUP pruning only:
    * the condition always stays in the rewrite plan (post-scan filters
    * are merely logged), so the contract is "return every row of each
    * group you keep", not "filter rows". We therefore use the pushed
    * predicates solely against manifest min/max stats to split the
    * snapshot into affected files (scanned + rewritten) and provably
    * unmatched files (never read — kept verbatim, stats intact, by the
    * commit). Rows are NEVER filtered here: the parquet delegate gets
    * no predicates, which is what keeps unmatched rows of affected
    * files alive through the rewrite.
    *
    * The scan's keep-set feeds the write commit through the operation
    * instance (scan planning always precedes write execution). The
    * commit re-asserts the snapshot it planned against
    * ([[TableOps.overwriteWith]]'s parent guard), so a concurrent
    * commit fails this operation instead of resurrecting stale kept
    * files. */
  /** Row-level operation mode for a command — the Iceberg-parity table
    * properties `write.delete.mode` / `write.update.mode` /
    * `write.merge.mode` (graft.-prefixed aliases accepted):
    * `copy-on-write` (default) rewrites affected files whole;
    * `merge-on-read` masks matched rows with deletion vectors and
    * appends the new images — O(changed rows) instead of O(affected
    * bytes), the difference between minutes and hours for a low-
    * selectivity UPDATE on a 100-TB table. Row-lineage tables always
    * use copy-on-write (row ids must carry over, a rewrite concern —
    * same stance as [[TableOps.morUpdate]]). */
  private def rowLevelMode(
      cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command): String = {
    import org.apache.spark.sql.connector.write.RowLevelOperation.Command
    val key = cmd match {
      case Command.DELETE => "write.delete.mode"
      case Command.UPDATE => "write.update.mode"
      case _              => "write.merge.mode"
    }
    if (ops.lineageEnabled(meta)) "copy-on-write"
    else meta.properties.getOrElse(s"graft.$key",
      meta.properties.getOrElse(key, "copy-on-write"))
  }

  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    import org.apache.spark.sql.connector.write.{LogicalWriteInfo => LWI, RowLevelOperation => RLO}
    if (rowLevelMode(info.command()) == "merge-on-read")
      return () => new MorDeltaOperation(info)
    () => new RLO {
      // Snapshot pinned once per operation: scan and commit agree on
      // the file set even if the table moves underneath (the commit's
      // parent guard then rejects the race).
      private lazy val entries: Seq[DataFileEntry] = {
        val m = reload()
        ops.requireNoPendingDeletes(dir, m, s"${info.command()} (copy-on-write rewrite)")
        ops.resolveEntries(dir, m)
      }
      // The single source of truth threaded scan → commit: paths of the
      // files being rewritten (normalized). Narrowed twice: statically
      // by manifest stats (pushFilters), then at runtime by the
      // matching-rows _file subquery (SupportsRuntimeV2Filtering).
      @volatile private var affectedPaths: Set[String] = null
      private def norm(p: String): String = new Path(p).toUri.getPath
      private def untouched: Seq[DataFileEntry] =
        if (affectedPaths == null) Seq.empty
        else entries.filterNot(e => affectedPaths.contains(norm(e.path)))

      override def command(): RLO.Command = info.command()
      override def description(): String = s"graft cow ${info.command()}"

      /** Ask Spark to carry `_file` through the rewrite plan — it is
        * what the runtime group-filtering subquery projects from the
        * matching rows. */
      override def requiredMetadataAttributes()
          : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
        Array(Expressions.column("_file"))

      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        new ScanBuilder
            with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
            with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
          import org.apache.spark.sql.catalyst.expressions.Expression
          import org.apache.spark.sql.execution.datasources.GraftBridge

          private var required: StructType = schema
          private var fileCol = false
          private var affected: Seq[DataFileEntry] = entries

          override def pushFilters(predicates: Seq[Expression]): Seq[Expression] = {
            val translated = predicates.flatMap(GraftBridge.translateFilter)
            affected =
              entries.filter(e => translated.forall(f => Stats.mayContain(e, schema, f)))
            predicates // everything stays Spark-side; pushdown was advisory
          }
          override def pushedFilters(): Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
            Array.empty
          override def pruneColumns(requiredSchema: StructType): Unit = {
            fileCol = requiredSchema.fieldNames.contains("_file")
            required = StructType(requiredSchema.fields.filterNot(_.name == "_file"))
          }
          override def build(): org.apache.spark.sql.connector.read.Scan = {
            affectedPaths = affected.map(e => norm(e.path)).toSet
            new RloScan(required, fileCol, options)
          }
        }

      /** The rewrite scan: re-plans its parquet delegate from the
        * CURRENT affected set on every batch planning, so the runtime
        * group filter (applied via [[filter]]) shrinks both the read
        * and — through [[untouched]] — the commit's rewrite set. */
      final class RloScan(required: StructType, fileCol: Boolean,
          options: CaseInsensitiveStringMap)
          extends org.apache.spark.sql.connector.read.Scan
          with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
        import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
        import org.apache.spark.sql.connector.expressions.filter.Predicate
        import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory}

        override def readSchema(): StructType =
          if (fileCol)
            required.add(org.apache.spark.sql.types.StructField(
              "_file", org.apache.spark.sql.types.StringType, nullable = false))
          else required
        override def description(): String =
          s"graft rlo scan ${info.command()} fileCol=$fileCol"

        override def filterAttributes(): Array[NamedReference] =
          Array(Expressions.column("_file"))

        /** Runtime group filter: `_file IN (<matching rows' files>)`.
          * Files outside the IN-set provably hold no matching row, so
          * they drop out of the rewrite AND into the kept set. Unknown
          * predicate shapes are ignored (conservative: no pruning). */
        override def filter(predicates: Array[Predicate]): Unit = {
          val inSets = predicates.toSeq.collect {
            case p: Predicate if p.name() == "IN" =>
              p.children().toSeq match {
                case Seq(ref: NamedReference, rest @ _*)
                    if ref.fieldNames().toSeq == Seq("_file") &&
                       rest.forall(_.isInstanceOf[Literal[_]]) =>
                  Some(rest.map(l => norm(
                    l.asInstanceOf[Literal[_]].value().toString)).toSet)
                case _ => None
              }
          }.flatten
          inSets.foreach { keep => affectedPaths = affectedPaths.intersect(keep) }
        }

        private def affectedEntries: Seq[DataFileEntry] =
          entries.filter(e => affectedPaths.contains(norm(e.path)))

        override def toBatch: Batch = new Batch {
          private def delegateBatch: Batch = {
            val b = dataScanBuilder(affectedEntries.map(_.path), schema, options)
            b.pruneColumns(required)
            b.build().toBatch
          }
          override def planInputPartitions(): Array[InputPartition] = {
            val parts = delegateBatch.planInputPartitions()
            if (fileCol) FileTagging.perFilePartitions(parts) else parts
          }
          override def createReaderFactory(): PartitionReaderFactory = {
            val inner = delegateBatch.createReaderFactory()
            if (fileCol) FileTagging.TaggingReaderFactory(inner) else inner
          }
        }
      }

      override def newWriteBuilder(winfo: LWI): WriteBuilder = {
        val writeDir = new Path(ops.dataDir(dir), s"w-${java.util.UUID.randomUUID()}")
        val delegate = dataDelegate(Seq(writeDir.toString)).newWriteBuilder(winfo)
        new WriteBuilder {
          override def build(): Write = {
            val inner = delegate.build()
            new Write {
              override def toBatch: BatchWrite = {
                // The rewrite plan PREPENDS metadata columns (e.g.
                // __row_operation) that the connector must consume;
                // project them away before the parquet writer.
                val base = new RowLevelCommitWrite(inner.toBatch, writeDir, () => untouched)
                new ProjectingBatchWrite(base, winfo.schema())
              }
            }
          }
        }
      }
    }
  }

  /** SQL merge-on-read row-level operation (`SupportsDelta`): Spark's
    * UPDATE/MERGE/DELETE rewrite plans stream per-row deltas instead
    * of whole replacement groups — matched rows die via deletion
    * vectors keyed by the `(_file, _pos)` row identity (the C61 form)
    * and new row images append as ordinary data files, BOTH in one
    * commit. ZERO data-file rewriting: the group-based copy-on-write
    * path above rewrites every affected file, which at 100 TB turns a
    * 0.1%-selectivity UPDATE into a rewrite of 100% of the bytes it
    * touches. Engaged by `write.update.mode` / `write.merge.mode` /
    * `write.delete.mode` = `merge-on-read` ([[rowLevelMode]]).
    *
    * Updates are represented as delete+insert
    * (`representUpdateAsDeleteAndInsert`): the DV masks the old row,
    * the image appends — exactly the row-level pairs CDC emits for
    * `mor-update` commits, so `$changes` works unchanged. The scan is
    * the table's REGULAR read path over a snapshot pinned at operation
    * creation (existing deletes apply, so dead rows can't re-match);
    * the commit re-validates that no concurrent rewrite replaced a
    * referenced file (coordinates would dangle) and retries through
    * concurrent appends.
    *
    * Reference surface: the denali catalog stores delete-file pointers
    * and leaves delete semantics to engines (logic/table.go); this is
    * the Spark-engine half, reusing the stock rewrite planner. */
  private final class MorDeltaOperation(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      extends org.apache.spark.sql.connector.write.SupportsDelta {
    import org.apache.spark.sql.connector.expressions.NamedReference
    import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriterFactory, LogicalWriteInfo => LWI, RowLevelOperation => RLO}

    // snapshot pinned once per operation: scan and commit agree on the
    // file set; the commit's validate rejects a racing rewrite
    private lazy val pinnedMeta: TableMetadata = reload()
    private lazy val pinnedEntries: Seq[DataFileEntry] = ops.resolveEntries(dir, pinnedMeta)

    override def command(): RLO.Command = info.command()
    override def description(): String = s"graft mor ${info.command()}"
    override def rowId(): Array[NamedReference] =
      Array(Expressions.column("_file"), Expressions.column("_pos"))
    override def representUpdateAsDeleteAndInsert(): Boolean = true
    override def requiredMetadataAttributes(): Array[NamedReference] = Array.empty

    /** The regular snapshot scan — full pushdown/pruning, existing
      * deletes applied, `_file`/`_pos` served as metadata columns. */
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      new GraftScanBuilder(pinnedEntries, options)

    override def newWriteBuilder(winfo: LWI): DeltaWriteBuilder = new DeltaWriteBuilder {
      override def build(): DeltaWrite = {
        // same file-layout discipline as the ordinary write path: the
        // appended row images range-cluster on the spec transforms +
        // default sort order, so post-update files keep tight min/max
        // stats (delete rows carry null table columns and sort
        // together — their output is bitmaps, not files)
        val specFieldsAll = pinnedMeta.specs
          .find(_.specId == pinnedMeta.defaultSpecId).toSeq.flatMap(_.fields)
          .filter(f => schema.fieldNames.contains(f.name))
        val specSorts = specFieldsAll.map(f =>
          Transforms.parse(f.transform) match {
            case Transforms.Parsed("bucket", n) => Left((f.name, n))
            case _                              => Right(f.name)
          })
        val orderCols = pinnedMeta.sortOrders
          .find(_.orderId == pinnedMeta.defaultSortOrderId)
          .toSeq.flatMap(_.fields)
          .flatMap(f => pinnedMeta.currentSchema.fields.find(_.id == f.sourceId)
            .map(nf => (nf.name, f.direction == "desc")))
          .filterNot { case (n, _) => specSorts.contains(Right(n)) }
        if (specSorts.isEmpty && orderCols.isEmpty)
          new DeltaWrite {
            override def toBatch: DeltaBatchWrite = new MorDeltaBatchWrite(winfo)
          }
        else
          new DeltaWrite
              with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
            import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
            import org.apache.spark.sql.connector.expressions.{SortDirection, SortOrder => V2SortOrder}
            private def sortOrders: Array[V2SortOrder] = {
              val spec = specSorts.map {
                case Left((c, n)) => Expressions.sort(
                  Expressions.bucket(n, c), SortDirection.ASCENDING)
                case Right(c) => Expressions.sort(
                  Expressions.identity(c), SortDirection.ASCENDING)
              }
              val order = orderCols.map { case (c, desc) => Expressions.sort(
                Expressions.identity(c),
                if (desc) SortDirection.DESCENDING else SortDirection.ASCENDING) }
              (spec ++ order).toArray
            }
            override def requiredDistribution(): Distribution =
              Distributions.ordered(sortOrders)
            override def requiredOrdering(): Array[V2SortOrder] = sortOrders
            override def toBatch: DeltaBatchWrite = new MorDeltaBatchWrite(winfo)
          }
      }
    }

    private final class MorDeltaBatchWrite(winfo: LWI) extends DeltaBatchWrite {
      private val writeDir = new Path(ops.dataDir(dir), s"w-${java.util.UUID.randomUUID()}")
      // C72 parity: bucket-partitioned tables materialize the hidden
      // __pt_ column on the appended row images too, so post-update
      // files carry the same pruning stats as any other write
      private val bucketFields = Transforms.materialized(
        pinnedMeta.specs.find(_.specId == pinnedMeta.defaultSpecId)
          .toSeq.flatMap(_.fields)
          .filter(f => schema.fieldNames.contains(f.name)))
      private val ptStructFields = bucketFields.map(f =>
        org.apache.spark.sql.types.StructField(
          Transforms.ptColName(f), org.apache.spark.sql.types.IntegerType, nullable = true))
      private val bucketDescs: Seq[(Int, org.apache.spark.sql.types.DataType, Int)] =
        bucketFields.map { f =>
          val idx = schema.fieldIndex(f.name)
          (idx, schema(idx).dataType, Transforms.parse(f.transform).arg)
        }
      // delegate over the TABLE schema, not winfo's: a delete-only
      // plan carries no row-image columns, inserts always carry full
      // rows in table-column order
      private lazy val delegateWrite: BatchWrite = {
        val lwi = new LWI {
          override def queryId(): String = winfo.queryId()
          override def schema(): StructType =
            StructType(GraftTable.this.schema.fields ++ ptStructFields)
          override def options(): CaseInsensitiveStringMap = winfo.options()
          override def rowIdSchema(): java.util.Optional[StructType] =
            java.util.Optional.empty()
          override def metadataSchema(): java.util.Optional[StructType] =
            java.util.Optional.empty()
        }
        dataDelegate(Seq(writeDir.toString),
          StructType(schema.fields ++ ptStructFields))
          .newWriteBuilder(lwi).build().toBatch
      }

      override def createBatchWriterFactory(pinfo: PhysicalWriteInfo): DeltaWriterFactory = {
        val inner0 = delegateWrite.createBatchWriterFactory(pinfo)
        val inner =
          if (bucketDescs.isEmpty) inner0
          else GraftTable.PtExtendingWriterFactory(inner0, bucketDescs)
        MorDelta.Factory(inner, dir.toUri.getPath + "/")
      }

      // the inner file write runs the hadoop commit protocol (its
      // useCommitCoordinator is false); claiming the partition with the
      // V2 coordinator too would make the inner task commit get denied
      override def useCommitCoordinator(): Boolean = delegateWrite.useCommitCoordinator()

      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val msgs = messages.toSeq.collect { case m: MorDelta.TaskCommit => m }
        delegateWrite.commit(msgs.flatMap(m => Option(m.inner)).toArray)
        // merge task bitmaps per file (OR: re-deletes collapse)
        val merged = scala.collection.mutable.HashMap
          .empty[String, org.roaringbitmap.longlong.Roaring64NavigableMap]
        msgs.foreach(_.dvs.foreach { case (f, bytes) =>
          val bm = DeletionVectors.deserialize(bytes)
          merged.get(f) match {
            case Some(acc) => acc.or(bm)
            case None      => merged.update(f, bm)
          }
        })
        val fs = writeDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val files =
          if (!fs.exists(writeDir)) Seq.empty[String]
          else {
            val it = fs.listFiles(writeDir, true)
            val buf = Seq.newBuilder[String]
            while (it.hasNext) {
              val f = it.next().getPath
              if (f.getName.endsWith(".parquet") || f.getName.endsWith(".orc"))
                buf += f.toString
            }
            buf.result()
          }
        if (merged.isEmpty && files.isEmpty) return // no-op command, no-op commit
        val opName = info.command() match {
          case RLO.Command.DELETE => "dv-delete"
          case _                  => "mor-update" // UPDATE and MERGE: CDC delete+insert pairs
        }
        ops.commitMorDelta(spark, dir, merged.toSeq, files, opName,
          pinnedEntries.filter(_.isData).map(_.path).toSet,
          pinnedMeta.lastSequenceNumber)
      }

      override def abort(messages: Array[WriterCommitMessage]): Unit =
        delegateWrite.abort(messages.toSeq.collect {
          case m: MorDelta.TaskCommit if m.inner != null => m.inner
        }.toArray)
    }
  }

  /** Commit for row-level rewrites: written files + the scan's
    * provably-unmatched keep-set become the new snapshot (keep-set
    * evaluated at commit time, after scan planning fixed it). */
  private final class RowLevelCommitWrite(
      inner: BatchWrite, writeDir: Path, keep: () => Seq[DataFileEntry]) extends BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      inner.createBatchWriterFactory(info)
    override def useCommitCoordinator(): Boolean = inner.useCommitCoordinator()
    override def onDataWriterCommit(message: WriterCommitMessage): Unit =
      inner.onDataWriterCommit(message)
    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      inner.commit(messages)
      val fs = writeDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val files =
        if (!fs.exists(writeDir)) Seq.empty[String]
        else {
          val it = fs.listFiles(writeDir, true)
          val buf = Seq.newBuilder[String]
          while (it.hasNext) {
            val f = it.next().getPath
            if (f.getName.endsWith(".parquet") || f.getName.endsWith(".orc")) buf += f.toString
          }
          buf.result()
        }
      ops.overwriteWith(dir, keep(), files, operation = "overwrite")
    }
    override def abort(messages: Array[WriterCommitMessage]): Unit = inner.abort(messages)
  }

  private def reload(): TableMetadata =
    ops.load(dir).map(_._2).getOrElse(meta)

  /** DELETE FROM — copy-on-write at file granularity: files whose
    * stats prove they hold no matching row are KEPT untouched (with
    * their stats); only possibly-affected files are re-read, filtered
    * to the survivors, and rewritten. The commit is an overwrite
    * snapshot, so the pre-delete state stays time-travelable. */
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    // merge-on-read delete mode opts out of the metadata/COW shortcut so
    // Spark keeps the row-level plan and the delta (DV) path handles it
    rowLevelMode(org.apache.spark.sql.connector.write.RowLevelOperation.Command.DELETE) !=
      "merge-on-read" &&
    filters.forall(FilterColumns.convertible)

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val (_, cur) = ops.load(dir).getOrElse(
      throw new IllegalStateException(s"table vanished at $dir"))
    ops.requireNoPendingDeletes(dir, cur, "DELETE FROM (copy-on-write)")
    val entries = ops.resolveEntries(dir, cur)
    val (affected, untouched) =
      entries.partition(e => filters.forall(f => Stats.mayContain(e, schema, f)))
    if (affected.isEmpty) return // provably nothing to delete
    val cond = filters.flatMap(FilterColumns.toColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    val writeDir = new Path(ops.dataDir(dir), s"w-${java.util.UUID.randomUUID()}")
    val survivors = spark.read.schema(schema).format(fmtName).load(affected.map(_.path): _*)
      .filter(!cond)
    survivors.write.format(fmtName).save(writeDir.toString)
    val newFiles = {
      val fs = writeDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(writeDir, true)
      val buf = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet") || f.getName.endsWith(".orc")) buf += f.toString
      }
      buf.result()
    }
    ops.overwriteWith(dir, untouched, newFiles, operation = "delete")
  }

  /** DSv2 micro-batch source over COMMITTED snapshot deltas — the
    * strictly-committed incremental read the file-stream helper can't
    * give (files exist marginally before their snapshot commit).
    *
    * Offsets are snapshot sequence numbers (monotonic per table, so a
    * checkpointed offset survives restarts and snapshot-id reassignment
    * never matters). Each micro-batch serves the files ADDED by the
    * append snapshots in `(start, end]` on the main lineage; rewrite
    * snapshots (overwrite / delete / upsert / compaction) are skipped —
    * an append-only changelog, same stance as Iceberg's
    * `streaming-skip-overwrite-snapshots`. Reading delegates to the
    * stock parquet batch over the delta file list with the stream's
    * original pushdown state re-applied, plus manifest-stat skipping.
    */
  private final class GraftMicroBatchStream(
      options: CaseInsensitiveStringMap,
      predicates: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      required: Option[StructType])
      extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
      with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
    import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory}
    import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxFiles}
    import org.apache.spark.sql.execution.datasources.GraftBridge

    private case class SeqOffset(seq: Long) extends Offset {
      override def json(): String = seq.toString
    }

    private def currentMeta: TableMetadata = ops.load(dir).map(_._2).getOrElse(meta)

    // —— Trigger.AvailableNow: the end of the backlog is pinned at
    // query start; admission control still paces the catch-up into
    // bounded batches, but no snapshot committed after preparation is
    // consumed — the query drains to the pin and stops.
    private var availableNowCap: Option[Long] = None
    override def prepareForTriggerAvailableNow(): Unit =
      availableNowCap = Some(
        currentMeta.currentSnapshot.map(_.sequenceNumber).getOrElse(0L))
    private def capSeq(seq: Long): Long =
      availableNowCap.map(math.min(_, seq)).getOrElse(seq)

    /** Main-lineage snapshots ascending by sequence, walked via parent
      * ids from the current head (stops where history was expired). */
    private def lineage(m: TableMetadata): Seq[Snapshot] = {
      val byId = m.snapshots.map(s => s.snapshotId -> s).toMap
      Iterator.iterate(m.currentSnapshot)(_.flatMap(_.parentSnapshotId).flatMap(byId.get))
        .takeWhile(_.isDefined).flatten.toSeq.reverse
    }

    override def initialOffset(): Offset =
      if (options.getOrDefault("stream-from", "earliest") == "latest")
        SeqOffset(currentMeta.currentSnapshot.map(_.sequenceNumber).getOrElse(0L))
      else SeqOffset(0L)

    override def latestOffset(): Offset =
      SeqOffset(capSeq(currentMeta.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)))

    // —— admission control: cap each micro-batch's file budget so a
    // backlogged stream (or stream-from=earliest over a long history)
    // catches up in bounded batches instead of one giant one. Snapshot
    // granularity: the cap is checked between snapshots, so one batch
    // is always at least one snapshot.
    override def getDefaultReadLimit: ReadLimit =
      Option(options.get("max-files-per-trigger"))
        .map(n => ReadLimit.maxFiles(n.toInt)).getOrElse(ReadLimit.allAvailable())

    override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
      val startSeq = start.asInstanceOf[SeqOffset].seq
      val m = currentMeta
      val headSeq = capSeq(m.currentSnapshot.map(_.sequenceNumber).getOrElse(0L))
      limit match {
        case mf: ReadMaxFiles =>
          var budget = mf.maxFiles()
          var endSeq = startSeq
          val pending = lineage(m)
            .filter(s => s.sequenceNumber > startSeq && s.sequenceNumber <= headSeq &&
              s.operation == "append")
          val it = pending.iterator
          var full = false
          while (it.hasNext && !full) {
            val s = it.next()
            val n = addedEntries(m, s).size
            // snapshots are consumed strictly in order; the first one is
            // always taken so the stream can never stall on a snapshot
            // larger than the budget
            if (endSeq == startSeq || n <= budget) { endSeq = s.sequenceNumber; budget -= n }
            else full = true
          }
          // rewrite-only tails still advance the offset past skipped snapshots
          if (pending.isEmpty) SeqOffset(headSeq) else SeqOffset(endSeq)
        case _ => SeqOffset(headSeq)
      }
    }

    override def reportLatestOffset(): Offset = latestOffset()

    override def deserializeOffset(json: String): Offset = SeqOffset(json.toLong)
    override def commit(end: Offset): Unit = ()
    override def stop(): Unit = ()

    /** Files added by an append snapshot = its manifest minus its
      * parent's (manifest diff, O(files) driver work on the two lists;
      * expired-parent fallback surfaces the full list best-effort). */
    private def addedEntries(m: TableMetadata, snap: Snapshot): Seq[DataFileEntry] = {
      val cur = ops.snapshotEntries(dir, snap).filter(_.isData)
      snap.parentSnapshotId.flatMap(m.snapshotById) match {
        case Some(parent) =>
          val prev = scala.util.Try(ops.snapshotEntries(dir, parent).map(_.path).toSet)
            .getOrElse(Set.empty[String])
          cur.filterNot(e => prev.contains(e.path))
        case None => cur
      }
    }

    private def deltaBatch(startSeq: Long, endSeq: Long): Batch = {
      val m = currentMeta
      val entries = lineage(m)
        .filter(s => s.sequenceNumber > startSeq && s.sequenceNumber <= endSeq)
        .filter(_.operation == "append")
        .flatMap(addedEntries(m, _))
        .map(SchemaEvolution.statsToCurrent(m, _))
      val translated = predicates.flatMap(GraftBridge.translateFilter)
      val kept = entries.filter(e => translated.forall(f => Stats.mayContain(e, schema, f)))
      // Field-id evolution for replayed history: a delta's files were
      // written under their snapshots' schemas — read them through the
      // physical names in current column order (same contract as the
      // batch MultiSchemaScan; per-signature grouping because a wide
      // endSeq range can straddle a rename).
      val groups = kept.groupBy(e => SchemaEvolution.renames(m, e)).toSeq
      val scans = groups.map { case (rn, es) =>
        val b = dataScanBuilder(es.map(_.path), SchemaEvolution.physStructType(schema, rn), options)
        val renamed = predicates.map(_.transform {
          case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
              if rn.contains(a.name) => a.withName(rn(a.name))
        })
        if (renamed.nonEmpty) b.pushFilters(renamed)
        b.pruneColumns(SchemaEvolution.physStructType(required.getOrElse(schema), rn))
        b.build()
      }
      // The stream-level reader factory is created ONCE for the whole
      // query while groups are per-batch, so each partition CARRIES its
      // group's factory instead of an index into per-batch state.
      new Batch {
        override def planInputPartitions(): Array[InputPartition] =
          scans.flatMap { s =>
            val f = s.toBatch.createReaderFactory()
            s.toBatch.planInputPartitions()
              .map(p => GraftTable.CarryingPartition(p, f): InputPartition)
          }.toArray
        override def createReaderFactory(): PartitionReaderFactory =
          GraftTable.CarryingFactory()
      }
    }

    override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
      deltaBatch(start.asInstanceOf[SeqOffset].seq, end.asInstanceOf[SeqOffset].seq)
        .planInputPartitions()

    /** The parquet reader factory's config depends only on schemas and
      * pushdown state, never on the planned file list, so one factory
      * (built over an empty list) serves every micro-batch's
      * partitions. */
    override def createReaderFactory(): PartitionReaderFactory =
      deltaBatch(0L, -1L).createReaderFactory()
  }

  /** Wraps a BatchWrite so every incoming row is projected down to the
    * write schema by dropping LEADING metadata fields (Spark's
    * row-level rewrite plans prepend them). */
  private final class ProjectingBatchWrite(inner: BatchWrite, writeSchema: StructType)
      extends BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new GraftTable.ProjectingWriterFactory(
        inner.createBatchWriterFactory(info), writeSchema)
    override def useCommitCoordinator(): Boolean = inner.useCommitCoordinator()
    override def onDataWriterCommit(message: WriterCommitMessage): Unit =
      inner.onDataWriterCommit(message)
    override def commit(messages: Array[WriterCommitMessage]): Unit = inner.commit(messages)
    override def abort(messages: Array[WriterCommitMessage]): Unit = inner.abort(messages)
  }

  /** Wraps the parquet BatchWrite: after the files are durably in the
    * private write dir, lists them and runs the snapshot commit. */
  /** C72 — appends the materialized `__pt_` bucket columns to every
    * incoming row before the file writer sees it (executor-side,
    * per-task): `descs` = (source ordinal, source type, n) per bucket
    * field, values = the Iceberg-spec bucket hash
    * ([[graft.functions.IcebergBucket]]) — identical to
    * [[Transforms.clusterExpr]] and [[GraftFunctions.BucketBound]]. */
  private final class PtExtendingBatchWrite(
      inner: BatchWrite,
      descs: Seq[(Int, org.apache.spark.sql.types.DataType, Int)]) extends BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      GraftTable.PtExtendingWriterFactory(inner.createBatchWriterFactory(info), descs)
    override def useCommitCoordinator(): Boolean = inner.useCommitCoordinator()
    override def onDataWriterCommit(message: WriterCommitMessage): Unit =
      inner.onDataWriterCommit(message)
    override def commit(messages: Array[WriterCommitMessage]): Unit = inner.commit(messages)
    override def abort(messages: Array[WriterCommitMessage]): Unit = inner.abort(messages)
  }

  private final class CommittingBatchWrite(
      inner: BatchWrite, writeDir: Path, operation: String,
      overwriteFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
      extends BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      inner.createBatchWriterFactory(info)
    override def useCommitCoordinator(): Boolean = inner.useCommitCoordinator()
    override def onDataWriterCommit(message: WriterCommitMessage): Unit =
      inner.onDataWriterCommit(message)
    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      inner.commit(messages)
      stagedSink match {
        case Some(sink) => sink(filesIn(writeDir)) // C87: publish deferred to commitStagedChanges
        case None => operation match {
          case "overwrite-by-filter" =>
            ops.overwriteByFilter(spark, dir, filesIn(writeDir), overwriteFilters.toSeq)
          case "dynamic-overwrite" =>
            ops.overwriteDynamic(spark, dir, filesIn(writeDir))
          case op => ops.commitFiles(dir, filesIn(writeDir), op)
        }
      }
    }
    override def abort(messages: Array[WriterCommitMessage]): Unit = inner.abort(messages)

    private def filesIn(p: Path): Seq[String] = {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) return Seq.empty
      val it = fs.listFiles(p, true)
      val buf = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet") || f.getName.endsWith(".orc")) buf += f.toString
      }
      buf.result()
    }
  }
}

object GraftTable {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
  import org.apache.spark.sql.connector.write.DataWriter

  /** Executor-side `__pt_` appender (C72); serializable, stateless up
    * to the per-writer scratch row. */
  private[catalog] final case class PtExtendingWriterFactory(
      inner: org.apache.spark.sql.connector.write.DataWriterFactory,
      descs: Seq[(Int, org.apache.spark.sql.types.DataType, Int)])
      extends org.apache.spark.sql.connector.write.DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
      val delegate = inner.createWriter(partitionId, taskId)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      val extra = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(descs.length)
      val ds = descs.toArray
      new DataWriter[InternalRow] {
        override def write(row: InternalRow): Unit = {
          var i = 0
          while (i < ds.length) {
            val (idx, dt, n) = ds(i)
            if (row.isNullAt(idx)) extra.update(i, null) // bucket(null) = null (spec)
            else {
              import org.apache.spark.sql.types._
              val h = dt match {
                case ByteType => graft.functions.IcebergBucket.hashLong(row.getByte(idx).toLong)
                case ShortType => graft.functions.IcebergBucket.hashLong(row.getShort(idx).toLong)
                case IntegerType | DateType =>
                  graft.functions.IcebergBucket.hashLong(row.getInt(idx).toLong)
                case LongType | TimestampType | TimestampNTZType =>
                  graft.functions.IcebergBucket.hashLong(row.getLong(idx))
                case StringType =>
                  graft.functions.IcebergBucket.hashBytes(row.getUTF8String(idx).getBytes)
                case BinaryType => graft.functions.IcebergBucket.hashBytes(row.getBinary(idx))
                case d: DecimalType => graft.functions.IcebergBucket.hashDecimal(
                  row.getDecimal(idx, d.precision, d.scale).toJavaBigDecimal.unscaledValue())
                case other => throw new IllegalStateException(s"unsupported bucket type: $other")
              }
              extra.update(i, graft.functions.IcebergBucket.bucket(h, n))
            }
            i += 1
          }
          delegate.write(joined(row, extra))
        }
        override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage =
          delegate.commit()
        override def abort(): Unit = delegate.abort()
        override def close(): Unit = delegate.close()
      }
    }
  }

  private[catalog] val scanMetrics
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] = Array(
    new GraftFilesKeptMetric, new GraftFilesSkippedMetric)

  private[catalog] def driverMetrics(kept: Int, skipped: Int)
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] = Array(
    new org.apache.spark.sql.connector.metric.CustomTaskMetric {
      override def name(): String = "graftFilesKept"
      override def value(): Long = kept.toLong
    },
    new org.apache.spark.sql.connector.metric.CustomTaskMetric {
      override def name(): String = "graftFilesSkipped"
      override def value(): Long = skipped.toLong
    })

  /** A partition of one rename-signature group of a multi-schema scan
    * (field-id evolution), tagged with the group whose reader factory
    * must open it. */
  private[catalog] final case class GroupTaggedPartition(
      inner: org.apache.spark.sql.connector.read.InputPartition, group: Int)
      extends org.apache.spark.sql.connector.read.InputPartition {
    override def preferredLocations(): Array[String] = inner.preferredLocations()
  }

  /** Routes each tagged partition to its group's delegate factory —
    * columnar capability is answered per group, so vectorized reads
    * survive schema evolution. */
  private[catalog] final case class DispatchingFactory(
      factories: Seq[org.apache.spark.sql.connector.read.PartitionReaderFactory])
      extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
    private def un(p: org.apache.spark.sql.connector.read.InputPartition) =
      p.asInstanceOf[GroupTaggedPartition]
    override def createReader(p: org.apache.spark.sql.connector.read.InputPartition)
        : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
      factories(un(p).group).createReader(un(p).inner)
    override def createColumnarReader(p: org.apache.spark.sql.connector.read.InputPartition)
        : org.apache.spark.sql.connector.read.PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
      factories(un(p).group).createColumnarReader(un(p).inner)
    override def supportColumnarReads(p: org.apache.spark.sql.connector.read.InputPartition)
        : Boolean =
      factories(un(p).group).supportColumnarReads(un(p).inner)
  }

  /** A partition carrying its own reader factory — for streaming delta
    * batches, whose per-batch rename grouping cannot be addressed by a
    * query-lifetime factory. */
  private[catalog] final case class CarryingPartition(
      inner: org.apache.spark.sql.connector.read.InputPartition,
      factory: org.apache.spark.sql.connector.read.PartitionReaderFactory)
      extends org.apache.spark.sql.connector.read.InputPartition {
    override def preferredLocations(): Array[String] = inner.preferredLocations()
  }

  private[catalog] final case class CarryingFactory()
      extends org.apache.spark.sql.connector.read.PartitionReaderFactory {
    private def un(p: org.apache.spark.sql.connector.read.InputPartition) =
      p.asInstanceOf[CarryingPartition]
    override def createReader(p: org.apache.spark.sql.connector.read.InputPartition)
        : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
      un(p).factory.createReader(un(p).inner)
    override def createColumnarReader(p: org.apache.spark.sql.connector.read.InputPartition)
        : org.apache.spark.sql.connector.read.PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
      un(p).factory.createColumnarReader(un(p).inner)
    override def supportColumnarReads(p: org.apache.spark.sql.connector.read.InputPartition)
        : Boolean =
      un(p).factory.supportColumnarReads(un(p).inner)
  }

  /** Planner statistics from manifest footers (rows + on-disk bytes of
    * the files a scan will actually read, AFTER stat-based pruning) —
    * `SupportsReportStatistics`. Precise post-pushdown sizes are what
    * let Spark pick broadcast joins it would otherwise miss from
    * whole-table heuristics; at 100 TB a mis-sized dimension scan is
    * the difference between a broadcast and a full shuffle. Partial
    * manifests (any file missing a count) report unknown rather than
    * an underestimate. */
  private[catalog] def manifestStatistics(
      entries: Seq[DataFileEntry],
      schema: StructType = StructType(Seq.empty),
      properties: Map[String, String] = Map.empty)
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        if (entries.forall(_.bytes.isDefined))
          java.util.OptionalLong.of(entries.flatMap(_.bytes).sum)
        else java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        if (entries.forall(_.rows.isDefined))
          java.util.OptionalLong.of(entries.flatMap(_.rows).sum)
        else java.util.OptionalLong.empty()
      /** C73 — CBO column statistics: NDV from the last ANALYZE
        * (table properties), min/max/null-count folded from the
        * manifest entry stats of exactly the planned (post-pruning)
        * file set. Only types whose stat strings convert losslessly
        * to Catalyst values report min/max. */
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
        import org.apache.spark.sql.connector.expressions.Expressions
        import org.apache.spark.sql.connector.read.colstats.ColumnStatistics
        val out = new java.util.HashMap[
          org.apache.spark.sql.connector.expressions.NamedReference, ColumnStatistics]()
        schema.fields.foreach { f =>
          val ndv = properties.get(s"graft.stats.ndv.${f.name}")
            .flatMap(s => scala.util.Try(s.toLong).toOption)
          val cs = entries.map(_.stats.get(f.name))
          val nulls =
            if (entries.nonEmpty && cs.forall(_.exists(_.nulls.isDefined)))
              Some(cs.flatten.flatMap(_.nulls).sum)
            else None
          def fold(pick: Seq[String] => Option[String], side: ColumnStats => Option[String])
              : Option[Any] =
            if (entries.isEmpty || !cs.forall(_.exists(side(_).isDefined))) None
            else pick(cs.flatten.flatMap(side(_))).flatMap(statValue(f.dataType, _))
          val minV = fold(vs => minByType(f.dataType, vs), _.min)
          val maxV = fold(vs => maxByType(f.dataType, vs), _.max)
          if (ndv.isDefined || nulls.isDefined || minV.isDefined || maxV.isDefined)
            out.put(Expressions.column(f.name), new ColumnStatistics {
              override def distinctCount(): java.util.OptionalLong =
                ndv.map(java.util.OptionalLong.of).getOrElse(java.util.OptionalLong.empty())
              override def nullCount(): java.util.OptionalLong =
                nulls.map(java.util.OptionalLong.of).getOrElse(java.util.OptionalLong.empty())
              override def min(): java.util.Optional[Object] =
                minV.map(v => java.util.Optional.of(v.asInstanceOf[Object]))
                  .getOrElse(java.util.Optional.empty())
              override def max(): java.util.Optional[Object] =
                maxV.map(v => java.util.Optional.of(v.asInstanceOf[Object]))
                  .getOrElse(java.util.Optional.empty())
            })
        }
        out
      }
    }

  /** Stat string → Catalyst value for CBO min/max (numerics and the
    * epoch-encoded temporals only — lossless conversions). */
  private def statValue(dt: org.apache.spark.sql.types.DataType, s: String): Option[Any] = {
    import org.apache.spark.sql.types._
    scala.util.Try[Any] {
      dt match {
        case ByteType | ShortType | IntegerType => s.toDouble.toInt
        case LongType => s.toDouble.toLong
        case FloatType => s.toFloat
        case DoubleType => s.toDouble
        case DateType => s.toDouble.toInt // days
        case TimestampType | TimestampNTZType => s.toDouble.toLong // micros
        case _ => throw new IllegalArgumentException(dt.toString)
      }
    }.toOption
  }
  private def minByType(dt: org.apache.spark.sql.types.DataType, vs: Seq[String])
      : Option[String] =
    vs.flatMap(v => statValue(dt, v).map(x => (v, x))) match {
      case Seq() => None
      case ps => Some(ps.minBy { case (_, x) => numKey(x) }._1)
    }
  private def maxByType(dt: org.apache.spark.sql.types.DataType, vs: Seq[String])
      : Option[String] =
    vs.flatMap(v => statValue(dt, v).map(x => (v, x))) match {
      case Seq() => None
      case ps => Some(ps.maxBy { case (_, x) => numKey(x) }._1)
    }
  private def numKey(x: Any): Double = x match {
    case n: java.lang.Number => n.doubleValue()
    case other => throw new IllegalArgumentException(other.toString)
  }

  /** Executor-side: drops `incoming.numFields - schema.size` LEADING
    * fields via a codegen'd unsafe projection (built lazily once the
    * first row reveals the incoming arity). */
  private final class ProjectingWriterFactory(
      inner: DataWriterFactory, schema: StructType) extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
      val delegate = inner.createWriter(partitionId, taskId)
      new DataWriter[InternalRow] {
        private var proj: UnsafeProjection = _
        override def write(row: InternalRow): Unit = {
          if (proj == null) {
            val offset = row.numFields - schema.size
            require(offset >= 0, s"row has fewer fields than write schema")
            proj = UnsafeProjection.create(schema.fields.toIndexedSeq.zipWithIndex.map {
              case (f, i) => BoundReference(i + offset, f.dataType, f.nullable)
            })
          }
          delegate.write(proj(row))
        }
        override def commit(): WriterCommitMessage = delegate.commit()
        override def abort(): Unit = delegate.abort()
        override def close(): Unit = delegate.close()
      }
    }
  }
}

/** Manifest-pruning scan metrics — the Spark-native face of the
  * reference's metrics-report endpoint (denali routes/tables.go
  * reportMetrics, a server-side no-op sink): here the numbers are real
  * and surface in the Spark SQL UI per query. Top-level zero-arg
  * classes because Spark re-instantiates CustomMetric reflectively on
  * the UI path. */
final class GraftFilesKeptMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "graftFilesKept"
  override def description(): String = "data files read after manifest pruning"
}

final class GraftFilesSkippedMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "graftFilesSkipped"
  override def description(): String = "data files skipped by manifest stats"
}
