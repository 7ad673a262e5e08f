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
}
