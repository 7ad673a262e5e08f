package graft.catalog

import org.apache.hadoop.fs.Path

/** Multi-table transactions over the FS-CAS commit protocol — the
  * cross-table atomic commit the Iceberg REST spec exposes as
  * `/v1/transactions/commit`. The reference serves single-table
  * commits only (denali logic/tx.go runs one table per DB
  * transaction); this extends the same optimistic protocol across
  * tables.
  *
  * Per attempt:
  *  1. read every table's current (version, metadata), in canonical
  *     path order;
  *  2. check every requirement against those states — any failure
  *     aborts the transaction with NOTHING published;
  *  3. compute every table's next metadata (updates are pure
  *     transforms; snapshot-building updates may write manifest
  *     files, which are inert until referenced);
  *  4. CAS-publish each table's next version in order; a lost CAS at
  *     table k rolls BACK tables 0..k-1 by CAS-publishing their
  *     pre-transaction logical state as a fresh version (a revert
  *     commit — history is preserved, not rewritten), then the whole
  *     transaction retries against fresh state.
  *
  * Guarantees: all-or-nothing COMPLETION — on return every table
  * carries its update, on abort every table is back at its
  * pre-transaction logical state. Isolation is read-committed per
  * table: a reader can observe table A's new state before table B's
  * (each single-table read stays snapshot-consistent). The rollback
  * itself is a CAS: if a third writer lands a commit on top of a
  * transient state inside the (publish, rollback) window, rolling
  * back would destroy that writer's work, so the transaction STOPS
  * and reports the torn set instead ([[TornTransactionException]]) —
  * the same exposure a REST multi-table commit has when its backing
  * store can't span tables in one transaction; swapping a
  * transactional store (the reference's SQLite/Postgres) under the
  * [[FsStore]] interface closes it. */
final class Transactions(store: FsStore) {
  import Transactions.{TableTx, TornTransactionException}

  private val ops = new TableOps(store)

  def commitAll(txs: Seq[TableTx], maxRetries: Int = 20): Map[String, TableMetadata] = {
    require(txs.nonEmpty, "empty transaction")
    val byDir = txs.groupBy(_.tableDir.toString)
    require(byDir.forall(_._2.size == 1), "one TableTx per table")
    val ordered = txs.sortBy(_.tableDir.toString)
    var attempt = 0
    while (true) {
      try return commitAllOnce(ordered)
      catch {
        case e: CommitFailedException if attempt < maxRetries &&
            e.getMessage.contains("transaction CAS conflict") =>
          attempt += 1
          Thread.sleep(15L * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def commitAllOnce(ordered: Seq[TableTx]): Map[String, TableMetadata] = {
    // 1+2: read and check everything before touching anything
    val states = ordered.map { tx =>
      val cur = ops.load(tx.tableDir)
      tx.requirements.foreach { r =>
        r.check(cur.map(_._2)).foreach(msg => throw new CommitFailedException(msg))
      }
      val (v, meta) = cur.getOrElse(
        throw new CommitFailedException(s"table does not exist at ${tx.tableDir}"))
      (tx, v, meta)
    }
    // 3: compute next states
    val prepared = states.map { case (tx, v, meta) =>
      val updated = tx.mkUpdates(meta).foldLeft(meta)((m, u) => u.apply(m))
      val (withLog, _) = ops.appendMetadataLog(tx.tableDir, v, meta, updated)
      (tx, v, meta, withLog)
    }
    // 4: publish in order; roll back published prefix on a lost CAS
    val published = scala.collection.mutable.ArrayBuffer[(TableTx, Int, TableMetadata)]()
    prepared.foreach { case (tx, v, meta, next) =>
      if (ops.publishVersion(tx.tableDir, v, next)) published += ((tx, v, meta))
      else {
        val torn = published.filterNot { case (ptx, pv, pmeta) =>
          // revert commit: prior logical state republished as v+2
          val (restored, _) = ops.appendMetadataLog(ptx.tableDir, pv + 1, pmeta, pmeta)
          ops.publishVersion(ptx.tableDir, pv + 1, restored)
        }
        if (torn.nonEmpty)
          throw new TornTransactionException(
            s"transaction aborted on ${tx.tableDir} but rollback lost a race on: " +
            torn.map(_._1.tableDir).mkString(", ") +
            " — a concurrent commit built on the transient state; reconcile manually")
        throw new CommitFailedException(
          s"transaction CAS conflict on ${tx.tableDir}; rolled back")
      }
    }
    prepared.map { case (tx, _, _, next) => tx.tableDir.toString -> next }.toMap
  }

  /** Atomic multi-table snapshot append: each table gets one append
    * snapshot over its file list, all-or-nothing — e.g. a fact table
    * and its aggregate/audit side table advance together. */
  def appendAll(tables: Seq[(Path, Seq[String])], maxRetries: Int = 20)
      : Map[String, TableMetadata] =
    commitAll(
      tables.map { case (dir, files) =>
        TableTx(dir, Seq.empty, meta => ops.buildSnapshotUpdates(dir, meta, files, "append"))
      },
      maxRetries)
}

object Transactions {
  /** One table's part of a transaction. `requirements` are checked
    * against the read state; `mkUpdates` builds the updates FROM that
    * state (re-evaluated on every retry, so snapshot commits recompute
    * parent/sequence against fresh state). The version CAS subsumes a
    * parent-snapshot guard — any concurrent commit bumps the version
    * and fails the attempt. */
  final case class TableTx(
      tableDir: Path,
      requirements: Seq[Requirement] = Seq.empty,
      mkUpdates: TableMetadata => Seq[MetadataUpdate] = _ => Seq.empty)

  final class TornTransactionException(msg: String) extends RuntimeException(msg)
}
