package graft.catalog

import java.util
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis._
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Spark-native re-expression of the reference catalog's full surface
  * (denali routes/router.go): namespaces, tables, commit protocol and
  * views, as a DSv2 `TableCatalog with SupportsNamespaces with
  * ViewCatalog` backed by a Hadoop-FileSystem warehouse instead of a
  * REST server + SQL database.
  *
  * Register and use:
  * {{{
  *   spark.sql.catalog.graft = graft.catalog.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /path/or/s3a://bucket/wh
  *   spark.sql("CREATE NAMESPACE graft.ns")
  *   spark.sql("CREATE TABLE graft.ns.t (id BIGINT, v DOUBLE)")
  *   spark.sql("INSERT INTO graft.ns.t SELECT ...")
  *   spark.read.option("snapshot-id", id).table("graft.ns.t") // time travel
  * }}}
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces with ViewCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog
    with StagingTableCatalog {

  /** C75 — declare column-default support so `CREATE TABLE (... x INT
    * DEFAULT 7)` / `ALTER TABLE ADD COLUMN ... DEFAULT` / `ALTER
    * COLUMN ... SET DEFAULT` pass analysis and reach us as column
    * metadata / TableChanges. */
  override def capabilities(): util.Set[TableCatalogCapability] =
    util.EnumSet.of(
      TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE,
      // C79 — CHECK constraints (ANSI constraint syntax on DSv2)
      TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  /** C72 — transform functions (`bucket`) for write distributions and
    * key-grouped scans. */
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    GraftFunctions.load(ident)
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    GraftFunctions.list(namespace)
  override def functionExists(ident: Identifier): Boolean =
    scala.util.Try(GraftFunctions.load(ident)).isSuccess

  /** C71 — `CALL graft.system.<proc>(...)` maintenance procedures. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    Procedures.load(this, ident)
  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    Procedures.list(namespace)

  private var catalogName: String = _
  private var warehouse: Path = _
  private[graft] var store: FsStore = _
  private[graft] var ops: TableOps = _

  private def spark: SparkSession = SparkSession.active

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val wh = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name requires the 'warehouse' option"))
    // `jdbc-url` mounts the version ledger on a transactional JDBC
    // store (Derby embedded ships with Spark); default is FS-CAS.
    store = Option(options.get("jdbc-url")) match {
      case Some(url) => new JdbcStore(spark.sparkContext.hadoopConfiguration, url)
      case None => new FsStore(spark.sparkContext.hadoopConfiguration)
    }
    ops = new TableOps(store)
    warehouse = new Path(wh)
    store.mkdirs(warehouse)
  }

  override def name(): String = catalogName

  // ---------- paths ----------

  private val NsMarker = ".graft-ns.json"
  private val ViewsDir = ".graft-views"

  private[catalog] def nsPath(ns: Seq[String]): Path =
    ns.foldLeft(warehouse)((p, part) => new Path(p, part))

  private[catalog] def tablePath(ident: Identifier): Path =
    new Path(nsPath(ident.namespace.toSeq), ident.name)

  private def viewPath(ident: Identifier): Path =
    new Path(new Path(nsPath(ident.namespace.toSeq), ViewsDir), ident.name)

  private def nsExists(ns: Seq[String]): Boolean =
    ns.isEmpty || store.exists(new Path(nsPath(ns), NsMarker))

  private def requireNs(ns: Seq[String]): Unit =
    if (!nsExists(ns)) throw new NoSuchNamespaceException(ns.toArray)

  // ---------- SupportsNamespaces (reference: logic/ns.go) ----------

  override def listNamespaces(): Array[Array[String]] = listNamespaces(Array.empty)

  override def listNamespaces(parent: Array[String]): Array[Array[String]] = {
    requireNs(parent.toSeq)
    store.list(nsPath(parent.toSeq))
      .filter(p => store.exists(new Path(p, NsMarker)))
      .map(p => parent :+ p.getName)
      .sortBy(_.mkString("."))
      .toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    nsExists(namespace.toSeq)

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    requireNs(namespace.toSeq)
    if (namespace.isEmpty) return new util.HashMap[String, String]()
    val marker = new Path(nsPath(namespace.toSeq), NsMarker)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(store.readString(marker))
    val out = new util.HashMap[String, String]()
    node.properties().asScala.foreach(e => out.put(e.getKey, e.getValue.asText()))
    out
  }

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit = {
    if (nsExists(namespace.toSeq)) throw new NamespaceAlreadyExistsException(namespace)
    // Parents must exist (the reference checks the parent prefix chain).
    if (namespace.length > 1) requireNs(namespace.toSeq.dropRight(1))
    writeNsProps(namespace.toSeq, metadata.asScala.toMap)
  }

  private def writeNsProps(ns: Seq[String], props: Map[String, String]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    props.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    store.mkdirs(nsPath(ns))
    store.writeString(new Path(nsPath(ns), NsMarker), node.toPrettyString)
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit = {
    requireNs(namespace.toSeq)
    val props = loadNamespaceMetadata(namespace).asScala.toMap
    val updated = changes.foldLeft(props) {
      case (acc, set: NamespaceChange.SetProperty) => acc + (set.property -> set.value)
      case (acc, rm: NamespaceChange.RemoveProperty) => acc - rm.property
      case (acc, _) => acc
    }
    writeNsProps(namespace.toSeq, updated)
  }

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!nsExists(namespace.toSeq)) return false
    val p = nsPath(namespace.toSeq)
    if (!cascade) {
      val nonEmpty = listTables(namespace).nonEmpty ||
        listNamespaces(namespace).nonEmpty || listViews(namespace: _*).nonEmpty
      if (nonEmpty) throw new NonEmptyNamespaceException(namespace)
    }
    store.delete(p)
  }

  // ---------- TableCatalog (reference: logic/table.go, routes/tables.go) ----------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireNs(namespace.toSeq)
    store.list(nsPath(namespace.toSeq))
      .filter(p => store.exists(new Path(new Path(p, "metadata"), "version-hint.text")) ||
        store.list(new Path(p, "metadata")).exists(q => store.versionOf(q).isDefined))
      .map(p => Identifier.of(namespace, p.getName))
      .sortBy(_.name)
      .toArray
  }

  override def tableExists(ident: Identifier): Boolean = ops.exists(tablePath(ident))

  override def loadTable(ident: Identifier): Table = {
    // `<table>$changes` — the file-granular CDC view (ChangelogTable).
    if (ident.name.endsWith("$changes")) {
      val base = Identifier.of(ident.namespace, ident.name.stripSuffix("$changes"))
      val dir = tablePath(base)
      val (_, meta) = ops.load(dir).getOrElse(throw new NoSuchTableException(ident))
      return new ChangelogTable(fullName(base), dir, meta, ops)
    }
    // `<table>$snapshots|$history|$refs|$files|$partitions` — the
    // metadata inspection views (manifest-backed, no data-file reads).
    MetaTables.suffixes.find(ident.name.endsWith) match {
      case Some(suffix) =>
        val base = Identifier.of(ident.namespace, ident.name.stripSuffix(suffix))
        val dir = tablePath(base)
        val (_, meta) = ops.load(dir).getOrElse(throw new NoSuchTableException(ident))
        return MetaTables.forSuffix(suffix, s"${fullName(base)}$suffix", dir, meta, ops)
      case None => ()
    }
    val dir = tablePath(ident)
    val (_, meta) = ops.load(dir).getOrElse(throw new NoSuchTableException(ident))
    new GraftTable(fullName(ident), dir, meta, ops)
  }

  private def fullName(ident: Identifier): String =
    (catalogName +: ident.namespace.toSeq :+ ident.name).mkString(".")

  /** Time travel reads with the SNAPSHOT's schema (Iceberg
    * semantics): after a C87 REPLACE installed a wholesale-new current
    * schema, `VERSION AS OF` a pre-replace snapshot must resolve the
    * OLD field ids, not read the old files through the new schema. */
  private def pinSchema(meta: TableMetadata, snap: Option[Snapshot]): TableMetadata =
    snap.filter(s => meta.schemas.exists(_.schemaId == s.schemaId))
      .map(s => meta.copy(currentSchemaId = s.schemaId)).getOrElse(meta)

  /** SQL `VERSION AS OF <snapshot-id>` — pins the snapshot's file list
    * and schema. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val dir = tablePath(ident)
    val (_, meta) = ops.load(dir).getOrElse(throw new NoSuchTableException(ident))
    // Pin from the SAME snapshot the entries were resolved from
    // (resolveSnapshot is the shared rule) — picking it independently
    // risks serving one snapshot's files through another's schema.
    val snap = ops.resolveSnapshot(meta, snapshotId = Some(version.toLong))
    val entries = ops.resolveEntries(dir, meta, snapshotId = Some(version.toLong))
    new GraftTable(fullName(ident), dir, pinSchema(meta, snap), ops, Some(entries))
  }

  /** SQL `TIMESTAMP AS OF` — Spark hands micros since epoch. The
    * pinning snapshot comes from the snapshotLog (main lineage), not
    * the raw snapshot set: after a REPLACE followed by rollback, the
    * max-timestamp snapshot can be a WAP-branch or rolled-back head
    * whose schema differs from the lineage snapshot actually served. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val dir = tablePath(ident)
    val (_, meta) = ops.load(dir).getOrElse(throw new NoSuchTableException(ident))
    val tsMs = timestampMicros / 1000
    val snap = ops.resolveSnapshot(meta, asOfTimestampMs = Some(tsMs))
    val entries = ops.resolveEntries(dir, meta, asOfTimestampMs = Some(tsMs))
    new GraftTable(fullName(ident), dir, pinSchema(meta, snap), ops, Some(entries))
  }

  /** Parse a v2 Transform onto the Iceberg transform vocabulary and
    * validate it against `schema` — shared by CREATE TABLE and the
    * C87 staged CTAS/RTAS path. Returns (sourceColumn, transform). */
  private[catalog] def specPair(t: Transform, schema: StructType): (String, String) = {
    val srcName = t.references.head.fieldNames.mkString(".")
    val intArg: Option[Int] = t.arguments.collectFirst {
      case l: org.apache.spark.sql.connector.expressions.Literal[_]
          if l.value().isInstanceOf[Number] => l.value().asInstanceOf[Number].intValue()
    }
    val transform = t.name match {
      case "identity" => "identity"
      case "bucket" => s"bucket[${intArg.getOrElse(
        throw new IllegalArgumentException("bucket transform needs a bucket count"))}]"
      case "truncate" => s"truncate[${intArg.getOrElse(
        throw new IllegalArgumentException("truncate transform needs a width"))}]"
      case "years" | "year" => "year"
      case "months" | "month" => "month"
      case "days" | "day" => "day"
      case "hours" | "hour" => "hour"
      case other => throw new UnsupportedOperationException(
        s"partition transform $other not supported")
    }
    val sparkType = schema.fields.find(_.name == srcName).getOrElse(
      throw new IllegalArgumentException(s"partition column $srcName not in schema")).dataType
    if (!Transforms.supports(transform, sparkType))
      throw new IllegalArgumentException(
        s"transform $transform not applicable to $srcName: $sparkType")
    (srcName, transform)
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    requireNs(ident.namespace.toSeq)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident.toString)
    val dir = tablePath(ident)
    val tableSchema = SchemaBridge.fromSpark(schema)
    // C65 hidden partitioning: identity plus the Iceberg transform
    // vocabulary — bucket[N], truncate[W], year/month/day/hour
    // (Spark parses `PARTITIONED BY (days(ts), bucket(8, id))` into
    // these v2 Transforms). Source-type compatibility is checked HERE
    // so a bad spec fails at CREATE, not at first write.
    val specFields = partitions.toSeq.zipWithIndex.map { case (t, i) =>
      val (srcName, transform) = specPair(t, schema)
      val src = tableSchema.fields.find(_.name == srcName).getOrElse(
        throw new IllegalArgumentException(s"partition column $srcName not in schema"))
      PartitionField(src.id, 1000 + i, srcName, transform)
    }
    val props = properties.asScala.toMap -
      TableCatalog.PROP_LOCATION - TableCatalog.PROP_PROVIDER - TableCatalog.PROP_OWNER
    val meta = TableMetadata.create(
      dir.toString, tableSchema, PartitionSpec(0, specFields),
      SortOrder(0, Seq.empty), props)
    ops.create(dir, meta)
    new GraftTable(fullName(ident), dir, meta, ops)
  }

  /** C87 — StagingTableCatalog: atomic CTAS / RTAS. Spark routes
    * `CREATE TABLE AS SELECT`, `REPLACE TABLE AS SELECT` and
    * `writeTo(...).createOrReplace()` through these when the catalog
    * stages writes; the returned table runs the NORMAL graft write
    * path (spec clustering, `__pt_` stats) against an in-memory
    * candidate metadata, and publishes everything only in
    * commitStagedChanges — REPLACE as ONE CAS commit that keeps the
    * table's history time-travelable (no drop+create window). */
  override def stageCreate(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    requireNs(ident.namespace.toSeq)
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident.toString)
    new StagedGraftTable(this, ident, schema, partitions, properties,
      allowCreate = true, allowReplace = false)
  }

  override def stageReplace(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    requireNs(ident.namespace.toSeq)
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new StagedGraftTable(this, ident, schema, partitions, properties,
      allowCreate = false, allowReplace = true)
  }

  override def stageCreateOrReplace(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): StagedTable = {
    requireNs(ident.namespace.toSeq)
    new StagedGraftTable(this, ident, schema, partitions, properties,
      allowCreate = true, allowReplace = true)
  }

  /** ALTER TABLE → commit updates; the TableChange vocabulary maps onto
    * the reference's update actions (set/remove-properties, add-schema
    * + set-current-schema for column changes). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val dir = tablePath(ident)
    val (_, meta) = ops.load(dir).getOrElse(throw new NoSuchTableException(ident))

    var setProps = Map.empty[String, String]
    var rmProps = Seq.empty[String]
    var fields = meta.currentSchema.fields
    var nextId = meta.lastColumnId
    var schemaChanged = false

    changes.foreach {
      case set: TableChange.SetProperty => setProps += set.property -> set.value
      case rm: TableChange.RemoveProperty => rmProps :+= rm.property
      case add: TableChange.AddColumn =>
        nextId += 1
        // C75: DEFAULT on ADD COLUMN — the SQL text becomes BOTH the
        // frozen initial-default (fills rows in files that predate the
        // column, applied by the readers via EXISTS_DEFAULT metadata)
        // and the current write-default (INSERTs that omit the column).
        val dv = Option(add.defaultValue()).map(_.getSql)
        fields = fields :+ NestedField(
          nextId, add.fieldNames.mkString("."), add.dataType.sql, !add.isNullable,
          initialDefault = dv, writeDefault = dv)
        schemaChanged = true
      case upd: TableChange.UpdateColumnDefaultValue =>
        // C75: SET DEFAULT changes only the write-default; the
        // initial-default stays frozen (Iceberg v3 semantics) so
        // existing files keep reading the value that was promised
        // when the column was added.
        val nd = Option(upd.newCurrentDefault()).map(_.getSql).filter(_.nonEmpty)
        fields = fields.map(f =>
          if (f.name == upd.fieldNames.mkString(".")) f.copy(writeDefault = nd) else f)
        schemaChanged = true
      case del: TableChange.DeleteColumn =>
        fields = fields.filterNot(_.name == del.fieldNames.mkString("."))
        schemaChanged = true
      case ren: TableChange.RenameColumn =>
        fields = fields.map(f =>
          if (f.name == ren.fieldNames.mkString(".")) f.copy(name = ren.newName) else f)
        schemaChanged = true
      case upd: TableChange.UpdateColumnType =>
        fields = fields.map(f =>
          if (f.name == upd.fieldNames.mkString(".")) f.copy(dataType = upd.newDataType.sql) else f)
        schemaChanged = true
      case ac: TableChange.AddConstraint =>
        // C79: CHECK constraints. ADD CONSTRAINT validates EXISTING
        // rows first (one distributed anti-predicate scan — the Delta/
        // ANSI semantic: a constraint you could never have satisfied
        // is rejected, not silently recorded), then persists the
        // predicate SQL as a table property; the commit protocol is
        // untouched (constraints ride set-properties, the reference's
        // own extension point for engine metadata).
        ac.constraint() match {
          case ck: org.apache.spark.sql.connector.catalog.constraints.Check =>
            val spark = SparkSession.active
            val violations = ops.read(spark, dir)
              .filter(s"NOT (${ck.predicateSql()})").limit(1).count()
            if (violations > 0)
              throw new IllegalArgumentException(
                s"cannot add CHECK constraint ${ck.name}: existing rows violate (${ck.predicateSql()})")
            setProps += s"graft.constraint.check.${ck.name}" -> ck.predicateSql()
          case other =>
            throw new UnsupportedOperationException(
              s"only CHECK constraints are supported, got: ${other.toDDL}")
        }
      case dc: TableChange.DropConstraint =>
        val key = s"graft.constraint.check.${dc.name}"
        if (!meta.properties.contains(key) && !dc.ifExists)
          throw new IllegalArgumentException(s"no such constraint: ${dc.name}")
        if (meta.properties.contains(key)) rmProps :+= key
      case other =>
        throw new UnsupportedOperationException(s"table change $other not supported")
    }

    var updates = Seq.empty[MetadataUpdate]
    if (setProps.nonEmpty) updates :+= MetadataUpdate.SetProperties(setProps)
    if (rmProps.nonEmpty) updates :+= MetadataUpdate.RemoveProperties(rmProps)
    if (schemaChanged) {
      val newSchema = TableSchema(meta.schemas.map(_.schemaId).max + 1, fields)
      updates ++= Seq(
        MetadataUpdate.AddSchema(newSchema),
        MetadataUpdate.SetCurrentSchema(newSchema.schemaId))
    }
    val updated = ops.commit(dir,
      Seq(Requirement.AssertTableUuid(meta.tableUuid)), updates)
    new GraftTable(fullName(ident), dir, updated, ops)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tablePath(ident)
    if (!ops.exists(dir)) false else store.delete(dir)
  }

  override def purgeTable(ident: Identifier): Boolean = dropTable(ident)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = tablePath(oldIdent)
    if (!ops.exists(from)) throw new NoSuchTableException(oldIdent)
    requireNs(newIdent.namespace.toSeq)
    val to = tablePath(newIdent)
    if (ops.exists(to)) throw new TableAlreadyExistsException(newIdent.toString)
    if (!store.renameTree(from, to))
      throw new IllegalStateException(s"rename $from -> $to failed")
  }

  // ---------- ViewCatalog (reference: logic/view.go) ----------

  override def listViews(namespace: String*): Array[Identifier] = {
    requireNs(namespace.toSeq)
    store.list(new Path(nsPath(namespace.toSeq), ViewsDir))
      .filter(p => store.currentVersion(p).isDefined)
      .map(p => Identifier.of(namespace.toArray, p.getName))
      .sortBy(_.name)
      .toArray
  }

  override def viewExists(ident: Identifier): Boolean =
    store.currentVersion(viewPath(ident)).isDefined

  override def loadView(ident: Identifier): View = {
    val (_, vm) = store.currentVersion(viewPath(ident))
      .map { case (v, json) => (v, MetadataJson.viewFromJson(json)) }
      .getOrElse(throw new NoSuchViewException(ident))
    new GraftView(ident, vm)
  }

  override def createView(info: ViewInfo): View = {
    requireNs(info.ident.namespace.toSeq)
    if (viewExists(info.ident)) throw new ViewAlreadyExistsException(info.ident)
    val dir = viewPath(info.ident)
    val vm = ViewMetadata(
      viewUuid = java.util.UUID.randomUUID().toString,
      formatVersion = 1,
      location = dir.toString,
      currentVersionId = 0,
      versions = Seq(ViewVersion(
        versionId = 0,
        timestampMs = System.currentTimeMillis(),
        sql = info.sql,
        defaultCatalog = info.currentCatalog,
        defaultNamespace = info.currentNamespace.toSeq,
        schemaId = 0)),
      schemas = Seq(SchemaBridge.fromSpark(info.schema)),
      properties = info.properties.asScala.toMap)
    if (!store.publish(dir, 0, MetadataJson.viewToJson(vm), gzip = true))
      throw new ViewAlreadyExistsException(info.ident)
    new GraftView(info.ident, vm)
  }

  /** REPLACE VIEW — a new view version + set-current-view-version, the
    * reference's add-view-version/set-current-view-version pair. */
  override def replaceView(info: ViewInfo, orCreate: Boolean): View = {
    val dir = viewPath(info.ident)
    store.currentVersion(dir) match {
      case None =>
        if (!orCreate) throw new NoSuchViewException(info.ident)
        createView(info)
      case Some((v, json)) =>
        val vm = MetadataJson.viewFromJson(json)
        val nextVer = ViewVersion(
          versionId = vm.versions.map(_.versionId).max + 1,
          timestampMs = System.currentTimeMillis(),
          sql = info.sql,
          defaultCatalog = info.currentCatalog,
          defaultNamespace = info.currentNamespace.toSeq,
          schemaId = vm.schemas.map(_.schemaId).max + 1)
        val updated = vm
          .addVersion(nextVer)
          .setCurrentVersion(nextVer.versionId)
          .copy(
            schemas = vm.schemas :+ SchemaBridge.fromSpark(info.schema)
              .copy(schemaId = nextVer.schemaId),
            properties = info.properties.asScala.toMap)
        if (!store.publish(dir, v + 1, MetadataJson.viewToJson(updated), gzip = true))
          throw new CommitFailedException(s"concurrent replace of view ${info.ident}")
        new GraftView(info.ident, updated)
    }
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val dir = viewPath(ident)
    val (v, json) = store.currentVersion(dir)
      .getOrElse(throw new NoSuchViewException(ident))
    val vm = MetadataJson.viewFromJson(json)
    val props = changes.foldLeft(vm.properties) {
      case (acc, set: ViewChange.SetProperty) => acc + (set.property -> set.value)
      case (acc, rm: ViewChange.RemoveProperty) => acc - rm.property
      case (acc, _) => acc
    }
    val updated = vm.copy(properties = props)
    if (!store.publish(dir, v + 1, MetadataJson.viewToJson(updated), gzip = true))
      throw new CommitFailedException(s"concurrent alter of view $ident")
    new GraftView(ident, updated)
  }

  override def dropView(ident: Identifier): Boolean = {
    val dir = viewPath(ident)
    if (store.currentVersion(dir).isEmpty) false else store.delete(dir)
  }

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = viewPath(oldIdent)
    if (store.currentVersion(from).isEmpty) throw new NoSuchViewException(oldIdent)
    requireNs(newIdent.namespace.toSeq)
    val to = viewPath(newIdent)
    if (store.currentVersion(to).isDefined) throw new ViewAlreadyExistsException(newIdent)
    store.mkdirs(to.getParent)
    if (!store.renameTree(from, to))
      throw new IllegalStateException(s"rename view $from -> $to failed")
  }
}

/** DSv2 view wrapper: Spark substitutes `query()` into the plan. */
/** C87 — the staged table behind [[GraftCatalog.stageCreate]] /
  * stageReplace / stageCreateOrReplace. The data write runs through
  * the regular [[GraftTable]] write machinery over a CANDIDATE
  * metadata that exists only in memory; the staged sink captures the
  * written files instead of committing, and commitStagedChanges
  * publishes:
  *   - REPLACE (table exists): [[TableOps.replaceTableData]] — one
  *     CAS commit; readers see old-or-new, never a dropped state, and
  *     prior snapshots stay time-travelable.
  *   - CREATE: v0 metadata CAS, then the first append. A crash
  *     between the two leaves an empty table — the same exposure as
  *     Spark's own non-staging CTAS, with no data-loss window.
  * abortStagedChanges removes the already-written orphan files. */
private[catalog] final class StagedGraftTable(
    cat: GraftCatalog,
    ident: Identifier,
    sparkSchema: StructType,
    partitions: Array[Transform],
    properties: util.Map[String, String],
    allowCreate: Boolean,
    allowReplace: Boolean) extends StagedTable
    with org.apache.spark.sql.connector.catalog.SupportsWrite {

  private val dir = cat.tablePath(ident)
  private val pairs = partitions.toSeq.map(t => cat.specPair(t, sparkSchema))
  private val props = properties.asScala.toMap -
    TableCatalog.PROP_LOCATION - TableCatalog.PROP_PROVIDER - TableCatalog.PROP_OWNER
  private val tableSchema = SchemaBridge.fromSpark(sparkSchema)
  private val candidate = TableMetadata.create(
    dir.toString, tableSchema,
    PartitionSpec(0, pairs.zipWithIndex.map { case ((n, tr), i) =>
      PartitionField(tableSchema.fields.find(_.name == n).get.id, 1000 + i, n, tr) }),
    SortOrder(0, Seq.empty), props)
  @volatile private var staged: Seq[String] = Seq.empty
  private val inner = new GraftTable(ident.toString, dir, candidate, cat.ops,
    stagedSink = Some(files => staged = files))

  override def name(): String = inner.name()
  override def schema(): StructType = sparkSchema
  override def partitioning(): Array[Transform] = inner.partitioning()
  override def properties(): util.Map[String, String] = inner.properties()
  override def capabilities(): util.Set[TableCapability] = inner.capabilities()
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    inner.newWriteBuilder(info)

  override def commitStagedChanges(): Unit = {
    if (cat.ops.load(dir).isDefined) {
      if (!allowReplace) throw new TableAlreadyExistsException(ident.toString)
      cat.ops.replaceTableData(dir, sparkSchema, pairs, props, staged)
    } else {
      if (!allowCreate) throw new NoSuchTableException(ident)
      cat.ops.create(dir, candidate)
      if (staged.nonEmpty) cat.ops.commitFiles(dir, staged, "append")
    }
  }

  override def abortStagedChanges(): Unit =
    staged.foreach { f =>
      try cat.ops.store.delete(new Path(f)) catch { case _: Exception => () }
    }
}

final class GraftView(ident: Identifier, vm: ViewMetadata) extends View {
  private val cur = vm.currentVersion
  override def name(): String = ident.toString
  override def query(): String = cur.sql
  override def currentCatalog(): String = cur.defaultCatalog
  override def currentNamespace(): Array[String] = cur.defaultNamespace.toArray
  override def schema(): StructType =
    SchemaBridge.toSpark(vm.schemas.find(_.schemaId == cur.schemaId).getOrElse(vm.schemas.head))
  override def queryColumnNames(): Array[String] = schema().fieldNames
  override def columnAliases(): Array[String] = Array.empty
  override def columnComments(): Array[String] = Array.empty
  override def properties(): util.Map[String, String] = vm.properties.asJava
}
