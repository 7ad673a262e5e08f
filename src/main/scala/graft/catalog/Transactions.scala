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
  * store can't span tables in one transaction. [[JdbcStore]] IS the
  * transactional store (the reference's SQLite/Postgres role): when
  * mounted, every table publishes in ONE database transaction via
  * [[FsStore.publishAllAtomic]] and the window disappears entirely —
  * no ordering, no rollback, no journal. */
final class Transactions(store: FsStore, journalDir: Option[Path] = None) {
  import Transactions.{JournalEntry, TableTx, TornTransactionException}

  private val ops = new TableOps(store)
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

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
    // 3b: a transactional store ([[JdbcStore]]) spans every table in
    // ONE database transaction — genuinely atomic, so the ordered
    // publish, rollback, journal and torn-state machinery below is
    // unnecessary: either every version lands or none does.
    store.publishAllAtomic(prepared.map { case (tx, v, _, next) =>
      (ops.metadataDir(tx.tableDir), v + 1, MetadataJson.toJson(next))
    }) match {
      case Some(true) =>
        return prepared.map { case (tx, _, _, next) => tx.tableDir.toString -> next }.toMap
      case Some(false) =>
        throw new CommitFailedException(
          "transaction CAS conflict (atomic store): nothing published; retrying")
      case None => // FS store: ordered CAS + rollback/journal below
    }
    // 3c: write-ahead journal (when configured) — the durable intent
    // record that makes a crash or torn abort RECOVERABLE instead of
    // manual: [[recover]] reads it and completes or reports.
    val journal = journalDir.map { jd =>
      writeJournal(prepared.map { case (tx, v, _, next) =>
        JournalEntry(tx.tableDir.toString, v, MetadataJson.toJson(next))
      }, jd)
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
            journal.map(j => s" — journal retained at $j for Transactions.recover")
              .getOrElse(" — a concurrent commit built on the transient state; " +
                "reconcile manually"))
        journal.foreach(store.delete(_)) // clean rollback: intent void
        throw new CommitFailedException(
          s"transaction CAS conflict on ${tx.tableDir}; rolled back")
      }
    }
    journal.foreach(store.delete(_)) // success: intent fulfilled
    prepared.map { case (tx, _, _, next) => tx.tableDir.toString -> next }.toMap
  }

  // ---------- write-ahead journal + crash recovery ----------

  private[graft] def writeJournal(entries: Seq[JournalEntry], jd: Path): Path = {
    val o = mapper.createObjectNode()
    val a = o.putArray("tables")
    entries.foreach { e =>
      val eo = a.addObject()
      eo.put("dir", e.dir); eo.put("prev-version", e.prevVersion)
      eo.put("next-metadata", e.nextJson)
    }
    store.mkdirs(jd)
    val p = new Path(jd, s"txj-${java.util.UUID.randomUUID()}.json")
    store.writeString(p, o.toPrettyString)
    p
  }

  /** Crash/torn-state recovery from a retained journal: classify each
    * table against the recorded intent —
    *  - `pending`:   head still at the pre-transaction version;
    *  - `published`: head is OUR intended next state;
    *  - `foreign`:   a third-party commit owns the next version.
    * If any of our publishes are durable and no foreign commit blocks
    * the rest, the transaction COMPLETES FORWARD (publish the pending
    * tables' recorded next states) — later writers may already have
    * built on the published part, so forward is the only safe
    * direction. If nothing was published, the transaction never
    * happened: the journal is dropped. A durable publish alongside a
    * foreign commit is genuinely torn and reported. Returns the
    * outcome: "complete" | "completed-forward" | "aborted". */
  def recover(journalPath: Path): String = {
    val n = mapper.readTree(store.readString(journalPath))
    import scala.jdk.CollectionConverters._
    val entries = n.get("tables").elements().asScala.toSeq.map { e =>
      JournalEntry(e.get("dir").asText(), e.get("prev-version").asInt(),
        e.get("next-metadata").asText())
    }
    sealed trait St
    case object Pending extends St
    case object Published extends St
    case object Foreign extends St
    val classified = entries.map { e =>
      val md = ops.metadataDir(new Path(e.dir))
      val (v, content) = store.currentVersion(md).getOrElse(
        throw new IllegalStateException(s"journaled table vanished: ${e.dir}"))
      val st =
        if (v == e.prevVersion) Pending
        else if (v == e.prevVersion + 1 &&
          MetadataJson.fromJson(content) == MetadataJson.fromJson(e.nextJson)) Published
        else Foreign
      (e, st)
    }
    val anyPublished = classified.exists(_._2 == Published)
    val foreign = classified.filter(_._2 == Foreign)
    if (classified.forall(_._2 == Published)) {
      store.delete(journalPath); return "complete"
    }
    if (!anyPublished) { // nothing durable: transaction never happened
      store.delete(journalPath); return "aborted"
    }
    if (foreign.nonEmpty)
      throw new TornTransactionException(
        "recovery blocked: transaction partially durable but a concurrent " +
        s"commit owns the next version on: ${foreign.map(_._1.dir).mkString(", ")}")
    classified.filter(_._2 == Pending).foreach { case (e, _) =>
      if (!store.publish(ops.metadataDir(new Path(e.dir)), e.prevVersion + 1, e.nextJson))
        throw new TornTransactionException(
          s"recovery lost a publish race on ${e.dir} — re-run recover")
    }
    store.delete(journalPath)
    "completed-forward"
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

  /** One table's recorded intent in the write-ahead journal. */
  private[graft] final case class JournalEntry(
      dir: String, prevVersion: Int, nextJson: String)

  final class TornTransactionException(msg: String) extends RuntimeException(msg)
}
