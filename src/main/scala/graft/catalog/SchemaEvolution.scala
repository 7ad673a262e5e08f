package graft.catalog

import org.apache.spark.sql.types.StructType

/** Field-id-based schema evolution (Iceberg's rename/drop semantics):
  * a data file is always read through the names it was WRITTEN with,
  * resolved per file from the schema of its committing snapshot —
  * entries carry their commit sequence (C30), snapshots carry their
  * schema id, so no manifest change is needed.
  *
  * The trick that keeps scans cheap: requesting a file's PHYSICAL
  * names in the CURRENT column order returns rows (and columnar
  * batches) positionally aligned with the current schema — renaming is
  * purely a planning-time substitution, never a row projection.
  * Columns added after a file was written keep their current name and
  * null-fill (C29); columns dropped from the current schema simply
  * stop being requested.
  */
object SchemaEvolution {

  /** The schema a data file was written under: the committing
    * snapshot's schema, found by sequence number. None (legacy entry,
    * expired snapshot) falls back to by-name reading. */
  def writeSchema(meta: TableMetadata, e: DataFileEntry): Option[TableSchema] =
    e.seq.flatMap(s => meta.snapshots.find(_.sequenceNumber == s))
      .flatMap(sn => meta.schemas.find(_.schemaId == sn.schemaId))

  /** current name → physical (write-time) name, for fields whose name
    * changed between the file's write schema and the current one.
    * Empty ⇒ the file reads correctly by name.
    *
    * Resolution is strictly by FIELD ID: a current field whose id is
    * absent from the write schema but whose NAME is physically present
    * in the file (the name was freed by a RENAME or DROP and later
    * reused by ADD COLUMN) is mapped to a synthetic absent name so the
    * reader null-fills it — reading by name there would resurrect the
    * old column's data under the new column. */
  def renames(meta: TableMetadata, e: DataFileEntry): Map[String, String] =
    writeSchema(meta, e) match {
      case None => Map.empty
      case Some(ws) =>
        val physNames = ws.fields.map(_.name).toSet
        meta.currentSchema.fields.flatMap { f =>
          ws.fields.find(_.id == f.id) match {
            case Some(w) if w.name != f.name => Some(f.name -> w.name)
            case Some(_) => None
            case None if physNames.contains(f.name) =>
              Some(f.name -> s"__graft_absent_${f.id}")
            case None => None // fresh name: by-name read null-fills
          }
        }.toMap
    }

  /** Entry with stats re-keyed to CURRENT column names, so manifest
    * pruning, SPJ key derivation and the $files bounds maps are
    * rename-correct without each consumer knowing about evolution.
    * Stats of dropped columns disappear. */
  def statsToCurrent(meta: TableMetadata, e: DataFileEntry): DataFileEntry = {
    if (!e.isData || e.stats.isEmpty) return e
    val rn = renames(meta, e)
    if (rn.isEmpty) e
    else e.copy(stats = meta.currentSchema.fields.flatMap { f =>
      e.stats.get(rn.getOrElse(f.name, f.name)).map(f.name -> _)
    }.toMap)
  }

  /** A read schema re-labelled with physical names (order and types
    * untouched — the positional-alignment contract). */
  def physStructType(read: StructType, rn: Map[String, String]): StructType =
    if (rn.isEmpty) read
    else StructType(read.fields.map(f => f.copy(name = rn.getOrElse(f.name, f.name))))
}
