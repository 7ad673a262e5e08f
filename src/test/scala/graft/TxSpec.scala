package graft

import org.apache.hadoop.fs.Path

import graft.catalog._

/** Multi-table transactions: all-or-nothing commits across tables over
  * the FS-CAS protocol (beyond the single-table reference surface; the
  * Iceberg REST spec's /v1/transactions/commit shape). */
class TxSpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]
  private def tx = new Transactions(cat.store)

  private def stage(dir: Path, df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val stageDir = new Path(dir, s"data/stage-${java.util.UUID.randomUUID()}")
    df.write.parquet(stageDir.toString)
    cat.store.listFilesRec(stageDir)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
  }

  test("appendAll advances every table atomically") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tx")
    spark.sql("CREATE TABLE graft.tx.fact (id BIGINT)")
    spark.sql("CREATE TABLE graft.tx.audit (id BIGINT)")
    val factDir = new Path(s"$warehouse/tx/fact")
    val auditDir = new Path(s"$warehouse/tx/audit")
    import spark.implicits._

    tx.appendAll(Seq(
      factDir -> stage(factDir, Seq(1L, 2L, 3L).toDF("id")),
      auditDir -> stage(auditDir, Seq(100L).toDF("id"))))

    assert(spark.sql("SELECT sum(id) FROM graft.tx.fact").collect().head.getLong(0) == 6)
    assert(spark.sql("SELECT sum(id) FROM graft.tx.audit").collect().head.getLong(0) == 100)
    // each table got exactly one snapshot from the transaction
    assert(cat.ops.load(factDir).get._2.snapshots.size == 1)
    assert(cat.ops.load(auditDir).get._2.snapshots.size == 1)
  }

  test("a failed requirement on any table publishes nothing anywhere") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tx")
    spark.sql("CREATE TABLE graft.tx.a (id BIGINT)")
    spark.sql("CREATE TABLE graft.tx.b (id BIGINT)")
    val aDir = new Path(s"$warehouse/tx/a")
    val bDir = new Path(s"$warehouse/tx/b")
    val aVersion = cat.ops.load(aDir).get._1

    intercept[CommitFailedException] {
      tx.commitAll(Seq(
        Transactions.TableTx(aDir, Seq.empty,
          _ => Seq(MetadataUpdate.SetProperties(Map("k" -> "v")))),
        Transactions.TableTx(bDir, Seq(Requirement.AssertTableUuid("not-the-uuid")),
          _ => Seq(MetadataUpdate.SetProperties(Map("k" -> "v"))))))
    }
    // table a untouched even though its own part was valid
    assert(cat.ops.load(aDir).get._1 == aVersion)
    assert(!cat.ops.load(aDir).get._2.properties.contains("k"))
  }

  test("CAS conflict mid-transaction rolls back the published prefix and retries") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tx")
    spark.sql("CREATE TABLE graft.tx.p (id BIGINT)")
    spark.sql("CREATE TABLE graft.tx.q (id BIGINT)")
    // canonical order is path order: .../tx/p before .../tx/q
    val pDir = new Path(s"$warehouse/tx/p")
    val qDir = new Path(s"$warehouse/tx/q")

    // q's update-builder side-effects a conflicting external commit on
    // its FIRST evaluation: p publishes, q's CAS then loses, p must
    // roll back; the retry (no side effect) must land cleanly.
    var sabotaged = false
    val result = tx.commitAll(Seq(
      Transactions.TableTx(pDir, Seq.empty,
        _ => Seq(MetadataUpdate.SetProperties(Map("tx" -> "yes")))),
      Transactions.TableTx(qDir, Seq.empty, { _ =>
        if (!sabotaged) {
          sabotaged = true
          cat.ops.commit(qDir, Seq.empty,
            Seq(MetadataUpdate.SetProperties(Map("external" -> "raced"))))
        }
        Seq(MetadataUpdate.SetProperties(Map("tx" -> "yes")))
      })))

    assert(sabotaged)
    val pMeta = cat.ops.load(pDir).get._2
    val qMeta = cat.ops.load(qDir).get._2
    // both tables carry the transaction exactly once
    assert(pMeta.properties.get("tx").contains("yes"))
    assert(qMeta.properties.get("tx").contains("yes"))
    // the external commit that caused the conflict survived the retry
    assert(qMeta.properties.get("external").contains("raced"))
    // p's history shows publish → revert → re-publish (CAS versions)
    assert(cat.ops.load(pDir).get._1 >= 3)
    assert(result.contains(pDir.toString) && result.contains(qDir.toString))
  }

  test("concurrent multi-table transactions all land (canonical order, no livelock)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tx")
    spark.sql("CREATE TABLE graft.tx.c1 (id BIGINT)")
    spark.sql("CREATE TABLE graft.tx.c2 (id BIGINT)")
    val d1 = new Path(s"$warehouse/tx/c1")
    val d2 = new Path(s"$warehouse/tx/c2")
    import spark.implicits._

    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val txs = (1 to 4).map { i =>
      val f1 = stage(d1, Seq(i.toLong).toDF("id"))
      val f2 = stage(d2, Seq(i.toLong * 10).toDF("id"))
      Future { tx.appendAll(Seq(d1 -> f1, d2 -> f2)) }
    }
    Await.result(Future.sequence(txs), 120.seconds)
    pool.shutdown()

    assert(spark.sql("SELECT sum(id) FROM graft.tx.c1").collect().head.getLong(0) == 10)
    assert(spark.sql("SELECT sum(id) FROM graft.tx.c2").collect().head.getLong(0) == 100)
    assert(cat.ops.load(d1).get._2.snapshots.size == 4)
    assert(cat.ops.load(d2).get._2.snapshots.size == 4)
  }

  test("journaled transactions: journal cleaned on success, recovery completes a crash forward") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tx")
    spark.sql("CREATE TABLE graft.tx.j1 (id BIGINT)")
    spark.sql("CREATE TABLE graft.tx.j2 (id BIGINT)")
    val d1 = new Path(s"$warehouse/tx/j1")
    val d2 = new Path(s"$warehouse/tx/j2")
    val jd = new Path(s"$warehouse/.tx-journal")
    val jtx = new Transactions(cat.store, journalDir = Some(jd))
    import spark.implicits._

    // success path leaves no journal behind
    jtx.appendAll(Seq(
      d1 -> stage(d1, Seq(1L).toDF("id")),
      d2 -> stage(d2, Seq(2L).toDF("id"))))
    assert(cat.store.list(jd).isEmpty, "journal must be deleted after success")

    // simulate a coordinator crash HALFWAY: journal written, table j1's
    // next version published, j2 still at its pre-transaction version
    val (v1, m1) = cat.ops.load(d1).get
    val (v2, m2) = cat.ops.load(d2).get
    val next1 = m1.copy(properties = m1.properties + ("tx-step" -> "2"))
    val next2 = m2.copy(properties = m2.properties + ("tx-step" -> "2"))
    val journal = jtx.writeJournal(Seq(
      Transactions.JournalEntry(d1.toString, v1, MetadataJson.toJson(next1)),
      Transactions.JournalEntry(d2.toString, v2, MetadataJson.toJson(next2))), jd)
    assert(cat.store.publish(
      cat.ops.metadataDir(d1), v1 + 1, MetadataJson.toJson(next1)))
    // crash here. Recovery must complete FORWARD: j1's publish is
    // durable (later writers may have built on it), so j2 gets its
    // recorded next state instead of j1 being torn back.
    assert(jtx.recover(journal) == "completed-forward")
    assert(cat.ops.load(d1).get._2.properties.get("tx-step").contains("2"))
    assert(cat.ops.load(d2).get._2.properties.get("tx-step").contains("2"))
    assert(!cat.store.exists(journal), "journal consumed by recovery")

    // idempotence shape: a journal whose intents all landed reports
    // complete and is dropped
    val journal2 = jtx.writeJournal(Seq(
      Transactions.JournalEntry(d1.toString, v1, MetadataJson.toJson(next1)),
      Transactions.JournalEntry(d2.toString, v2, MetadataJson.toJson(next2))), jd)
    assert(jtx.recover(journal2) == "complete")
  }

  test("recovery reports genuinely torn state; pure-crash journals abort clean") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.tx")
    spark.sql("CREATE TABLE graft.tx.t1 (id BIGINT)")
    spark.sql("CREATE TABLE graft.tx.t2 (id BIGINT)")
    val d1 = new Path(s"$warehouse/tx/t1")
    val d2 = new Path(s"$warehouse/tx/t2")
    val jd = new Path(s"$warehouse/.tx-journal")
    val jtx = new Transactions(cat.store, journalDir = Some(jd))

    // crash BEFORE any publish: journal exists, nothing durable → abort
    val (v1, m1) = cat.ops.load(d1).get
    val (v2, m2) = cat.ops.load(d2).get
    val next1 = m1.copy(properties = m1.properties + ("tx" -> "x"))
    val next2 = m2.copy(properties = m2.properties + ("tx" -> "x"))
    val j0 = jtx.writeJournal(Seq(
      Transactions.JournalEntry(d1.toString, v1, MetadataJson.toJson(next1)),
      Transactions.JournalEntry(d2.toString, v2, MetadataJson.toJson(next2))), jd)
    assert(jtx.recover(j0) == "aborted")
    assert(cat.ops.load(d1).get._1 == v1 && cat.ops.load(d2).get._1 == v2)

    // our publish durable on t1 + a FOREIGN commit on t2 → torn, reported
    val j1 = jtx.writeJournal(Seq(
      Transactions.JournalEntry(d1.toString, v1, MetadataJson.toJson(next1)),
      Transactions.JournalEntry(d2.toString, v2, MetadataJson.toJson(next2))), jd)
    assert(cat.store.publish(cat.ops.metadataDir(d1), v1 + 1, MetadataJson.toJson(next1)))
    val foreign = m2.copy(properties = m2.properties + ("who" -> "else"))
    assert(cat.store.publish(cat.ops.metadataDir(d2), v2 + 1, MetadataJson.toJson(foreign)))
    val e = intercept[Transactions.TornTransactionException] { jtx.recover(j1) }
    assert(e.getMessage.contains(d2.toString))
    assert(cat.store.exists(j1), "journal retained for manual reconciliation")
  }
}
