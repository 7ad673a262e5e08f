package graft.catalog

/** C70 — row lineage (the Iceberg v3 `first-row-id` direction): every
  * row of a lineage-enabled table carries a stable table-unique
  * `_row_id`, assigned at commit time as a per-file id BLOCK (the
  * manifest stores one `first-row-id` per data file; row N of the
  * file is `firstRowId + N`) — O(new files) commit metadata, zero
  * per-row write cost, executor-side id computation only.
  *
  * Rewrites (compaction) permute rows across files, so block ids
  * cannot survive them arithmetically; lineage-preserving maintenance
  * instead MATERIALIZES the id into a hidden physical `__row_id`
  * column of the rewritten files ([[TableOps.compactLineage]]). The
  * read path prefers the materialized column and falls back to
  * base + ordinal, so both representations coexist file-by-file.
  *
  * Engine-integration boundary (same as Iceberg v3's): Spark's
  * row-level-operation rewrite plans thread only table-schema
  * columns, so copy-on-write UPDATE/MERGE re-mints ids for rewritten
  * rows unless the table was materialized first. Reference surface:
  * denali logic/table.go metadata model (no row lineage — this
  * exceeds the reference, toward Iceberg v3).
  */
object RowLineage {
  /** Hidden physical column carrying materialized row ids. */
  val PhysCol = "__row_id"
  val EnabledProp = "graft.row-lineage.enabled"
  val NextIdProp = "graft.row-lineage.next-row-id"
}
