package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.Path
import scala.jdk.CollectionConverters._

import graft.rest.RestCatalogServer

/** REST shim over TableOps: replays the reference's own flow
  * (routes/config.go, ns.go, tables.go, views.go) over HTTP against a
  * warehouse that the Spark-side graft catalog mounts simultaneously —
  * REST-created tables are queryable by Spark, Spark-written snapshots
  * are visible over REST. */
class RestSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()
  private var server: RestCatalogServer = _
  private var base: String = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = new RestCatalogServer(
      new Path(warehouse.toString), spark.sparkContext.hadoopConfiguration)
    base = s"http://127.0.0.1:${server.start()}"
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop()
    super.afterAll()
  }

  private def req(method: String, path: String, body: Option[String] = None): HttpRequest = {
    val b = HttpRequest.newBuilder(URI.create(s"$base$path"))
    body match {
      case Some(s) => b.method(method, HttpRequest.BodyPublishers.ofString(s))
      case None => b.method(method, HttpRequest.BodyPublishers.noBody())
    }
    b.build()
  }

  private def send(method: String, path: String, body: Option[String] = None): (Int, JsonNode) = {
    val res: HttpResponse[String] =
      client.send(req(method, path, body), HttpResponse.BodyHandlers.ofString())
    val node = if (res.body() == null || res.body().isEmpty) mapper.createObjectNode()
               else mapper.readTree(res.body())
    (res.statusCode(), node)
  }

  test("config, status and namespace CRUD follow the reference shapes") {
    assert(send("GET", "/status")._1 == 204)

    val (cc, conf) = send("GET", "/v1/config")
    assert(cc == 200)
    assert(conf.get("defaults").get("warehouse").asText() == warehouse.toString)
    assert(conf.has("overrides"))
    // wrong warehouse → InvalidConfigError (routes/config.go)
    val (wc, werr) = send("GET", "/v1/config?warehouse=/nope")
    assert(wc == 400 && werr.get("error").get("type").asText() == "InvalidConfigError")

    // create + list + load + head
    val (c1, ns1) = send("POST", "/v1/namespaces",
      Some("""{"namespace": ["restns"], "properties": {"owner": "it"}}"""))
    assert(c1 == 200 && ns1.get("namespace").get(0).asText() == "restns")
    assert(send("POST", "/v1/namespaces",
      Some("""{"namespace": ["restns"]}"""))._1 == 409) // duplicate
    val (_, listed) = send("GET", "/v1/namespaces")
    assert(listed.get("namespaces").elements().asScala.toSeq
      .exists(_.get(0).asText() == "restns"))
    val (lc, loaded) = send("GET", "/v1/namespaces/restns")
    assert(lc == 200 && loaded.get("properties").get("owner").asText() == "it")
    assert(send("HEAD", "/v1/namespaces/restns")._1 == 204)
    assert(send("HEAD", "/v1/namespaces/ghost")._1 == 404)

    // update properties: updated/removed/missing report (routes/ns.go)
    val (pc, rep) = send("POST", "/v1/namespaces/restns/properties",
      Some("""{"removals": ["owner", "absent"], "updates": {"tier": "gold"}}"""))
    assert(pc == 200)
    assert(rep.get("updated").get(0).asText() == "tier")
    assert(rep.get("removed").get(0).asText() == "owner")
    assert(rep.get("missing").get(0).asText() == "absent")
    // repeated key → 422 (reference RepeatedKeyError)
    assert(send("POST", "/v1/namespaces/restns/properties",
      Some("""{"removals": ["tier"], "updates": {"tier": "x"}}"""))._1 == 422)

    // drop refuses while non-empty, succeeds after
    val (_, _) = send("POST", "/v1/namespaces",
      Some("""{"namespace": ["dropme"]}"""))
    assert(send("DELETE", "/v1/namespaces/dropme")._1 == 204)
    assert(send("HEAD", "/v1/namespaces/dropme")._1 == 404)
  }

  test("table create → load → commit flow with requirements, then Spark interop") {
    send("POST", "/v1/namespaces", Some("""{"namespace": ["restt"]}"""))

    // create (routes/tables.go CreateTableReq — iceberg type names)
    val createBody =
      """{"name": "orders",
          "schema": {"type": "struct", "fields": [
            {"id": 1, "name": "id", "required": true, "type": "long"},
            {"id": 2, "name": "status", "required": false, "type": "string"},
            {"id": 3, "name": "total", "required": false, "type": "double"}]},
          "properties": {"owner": "rest"}}"""
    val (cc, created) = send("POST", "/v1/namespaces/restt/tables", Some(createBody))
    assert(cc == 200, created.toString)
    assert(created.get("metadata-location").asText().endsWith("v0.metadata.json"))
    val meta0 = created.get("metadata")
    assert(meta0.get("format-version").asInt() == 2)
    assert(meta0.get("last-sequence-number").asLong() == 0L)
    val uuid = meta0.get("table-uuid").asText()
    // custom locations refused, like the reference
    assert(send("POST", "/v1/namespaces/restt/tables",
      Some("""{"name": "x", "location": "/tmp/elsewhere",
              "schema": {"fields": []}}"""))._1 == 400)

    // list + head + load
    val (_, ids) = send("GET", "/v1/namespaces/restt/tables")
    assert(ids.get("identifiers").get(0).get("name").asText() == "orders")
    assert(send("HEAD", "/v1/namespaces/restt/tables/orders")._1 == 204)
    assert(send("GET", "/v1/namespaces/restt/tables/orders")._1 == 200)

    // commit: set-properties guarded by assert-table-uuid (logic/reqs.go)
    val commitOk =
      s"""{"requirements": [{"type": "assert-table-uuid", "uuid": "$uuid"}],
           "updates": [{"action": "set-properties", "updates": {"fmt": "parquet"}}]}"""
    val (uc, updated) = send("POST", "/v1/namespaces/restt/tables/orders", Some(commitOk))
    assert(uc == 200, updated.toString)
    assert(updated.get("metadata").get("properties").get("fmt").asText() == "parquet")
    assert(updated.get("metadata-location").asText().endsWith("v1.metadata.json"))

    // failed requirement → 409 CommitFailedException
    val commitBad =
      """{"requirements": [{"type": "assert-table-uuid", "uuid": "wrong-uuid"}],
          "updates": [{"action": "set-properties", "updates": {"x": "y"}}]}"""
    val (bc, berr) = send("POST", "/v1/namespaces/restt/tables/orders", Some(commitBad))
    assert(bc == 409 && berr.get("error").get("type").asText() == "CommitFailedException")

    // Spark interop: the REST-created table IS a graft catalog table
    spark.sql("INSERT INTO graft.restt.orders VALUES (1, 'O', 10.5), (2, 'F', 20.0)")
    assert(spark.sql("SELECT sum(total) FROM graft.restt.orders")
      .collect().head.getDouble(0) == 30.5)
    // ... and the Spark write is visible over REST as a snapshot
    val (_, afterWrite) = send("GET", "/v1/namespaces/restt/tables/orders")
    val snaps = afterWrite.get("metadata").get("snapshots")
    assert(snaps.size() == 1 && snaps.get(0).get("sequence-number").asLong() == 1L)

    // rename (both the spec's source/destination and Go's Source/Target)
    assert(send("POST", "/v1/tables/rename",
      Some("""{"source": {"namespace": ["restt"], "name": "orders"},
              "destination": {"namespace": ["restt"], "name": "orders2"}}"""))._1 == 204)
    assert(send("HEAD", "/v1/namespaces/restt/tables/orders")._1 == 404)
    assert(spark.sql("SELECT count(*) FROM graft.restt.orders2")
      .collect().head.getLong(0) == 2)

    // metrics endpoint accepts and discards (routes/tables.go reportMetrics)
    assert(send("POST", "/v1/namespaces/restt/tables/orders2/metrics",
      Some("""{"report-type": "scan-report"}"""))._1 == 204)

    // drop
    assert(send("DELETE", "/v1/namespaces/restt/tables/orders2")._1 == 204)
    assert(send("HEAD", "/v1/namespaces/restt/tables/orders2")._1 == 404)
  }

  test("register adopts an existing table's metadata file") {
    send("POST", "/v1/namespaces", Some("""{"namespace": ["restreg"]}"""))
    // build a table via REST + Spark, then register its metadata as a new name
    send("POST", "/v1/namespaces/restreg/tables", Some(
      """{"name": "src", "schema": {"fields": [
          {"id": 1, "name": "id", "required": false, "type": "long"}]}}"""))
    spark.sql("INSERT INTO graft.restreg.src VALUES (7), (8)")
    val (_, loaded) = send("GET", "/v1/namespaces/restreg/tables/src")
    val loc = loaded.get("metadata-location").asText()
    val (rc, reg) = send("POST", "/v1/namespaces/restreg/register",
      Some(s"""{"name": "adopted", "metadata-location": "$loc"}"""))
    assert(rc == 200, reg.toString)
    assert(send("GET", "/v1/namespaces/restreg/tables/adopted")._1 == 200)
    // missing metadata file → 404 MetadataFileNotFound
    assert(send("POST", "/v1/namespaces/restreg/register",
      Some("""{"name": "nope", "metadata-location": "/no/such/file.json"}"""))._1 == 404)
    // ADVICE r14: a found-but-non-JSON metadata file is a client error
    // (400 InvalidRequest), never a 500 through the generic handler
    val junk = new Path(s"$warehouse/restreg/junk-not-json.metadata.json")
    val store = new graft.catalog.FsStore(spark.sparkContext.hadoopConfiguration)
    store.writeString(junk, "this is not { json")
    val (jc, jerr) = send("POST", "/v1/namespaces/restreg/register",
      Some(s"""{"name": "junked", "metadata-location": "$junk"}"""))
    assert(jc == 400, s"$jc ${jerr.toString}")
    assert(jerr.get("error").get("type").asText() == "InvalidRequest")
  }

  test("register imports a spec-Iceberg metadata file, replaying its delete lineage") {
    import graft.catalog._
    val ops = new TableOps(new FsStore(spark.sparkContext.hadoopConfiguration))
    send("POST", "/v1/namespaces", Some("""{"namespace": ["resticb"]}"""))
    // a graft table with churn INCLUDING a pending MOR delete, exported
    // as spec Iceberg v2 — the shape an external Iceberg writer hands us
    spark.sql("CREATE TABLE graft.resticb.src (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.resticb.src VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    val srcDir = new Path(s"$warehouse/resticb/src")
    import spark.implicits._
    ops.mergeOnReadDelete(spark, srcDir, Seq(2L).toDF("id"))
    val metaFile = IcebergExport.export(ops, srcDir, Some(spark))
    val (rc, reg) = send("POST", "/v1/namespaces/resticb/register",
      Some(s"""{"name": "adopted", "metadata-location": "$metaFile"}"""))
    assert(rc == 200, reg.toString)
    // the import converted the spec delete manifest: row 2 stays dead
    val rows = spark.sql("SELECT id FROM graft.resticb.adopted ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1L, 3L), rows.toString)
    // a graft-dialect metadata file still adopts verbatim (no import)
    val (_, loaded) = send("GET", "/v1/namespaces/resticb/tables/src")
    val graftLoc = loaded.get("metadata-location").asText()
    assert(send("POST", "/v1/namespaces/resticb/register",
      Some(s"""{"name": "adopted2", "metadata-location": "$graftLoc"}"""))._1 == 200)
  }

  test("an externally-committed Avro manifest-list snapshot is scannable in place") {
    import graft.catalog._
    val ops = new TableOps(new FsStore(spark.sparkContext.hadoopConfiguration))
    send("POST", "/v1/namespaces", Some("""{"namespace": ["restavro"]}"""))
    send("POST", "/v1/namespaces/restavro/tables", Some(
      """{"name": "ext", "schema": {"fields": [
          {"id": 1, "name": "id", "required": false, "type": "long"},
          {"id": 2, "name": "v", "required": false, "type": "double"}]}}"""))
    spark.sql("INSERT INTO graft.restavro.ext VALUES (1, 1.0), (2, 2.0)")
    spark.sql("INSERT INTO graft.restavro.ext VALUES (3, 3.0)")
    val dir = new Path(s"$warehouse/restavro/ext")
    val headBefore = ops.load(dir).get._2.currentSnapshot.get
    // stand-in external client: IcebergExport's Avro writers produce a
    // spec manifest list covering the table's live files
    val metaFile = IcebergExport.export(ops, dir, Some(spark))
    val exported = mapper.readTree(ops.store.readString(metaFile))
    val manifestList = exported.get("snapshots").elements().asScala.toSeq
      .maxBy(_.get("sequence-number").asLong()).get("manifest-list").asText()
    assert(manifestList.endsWith(".avro"), manifestList)
    // the external commit: add-snapshot (manifest-list!) + roll main
    val (rc, resp) = send("POST", "/v1/namespaces/restavro/tables/ext", Some(
      s"""{"requirements": [
            {"type": "assert-ref-snapshot-id", "ref": "main",
             "snapshot-id": ${headBefore.snapshotId}}],
          "updates": [
            {"action": "add-snapshot", "snapshot": {
              "snapshot-id": 990011, "parent-snapshot-id": ${headBefore.snapshotId},
              "sequence-number": ${headBefore.sequenceNumber + 1},
              "timestamp-ms": ${System.currentTimeMillis()},
              "manifest-list": "$manifestList",
              "summary": {"operation": "append"}, "schema-id": 0}},
            {"action": "set-snapshot-ref", "ref-name": "main",
             "snapshot-id": 990011, "type": "branch"}]}"""))
    assert(rc == 200, resp.toString)
    assert(ops.load(dir).get._2.currentSnapshotId.contains(990011L))
    // the head snapshot now resolves through the Avro manifest list —
    // scans, counts and aggregates read it in place, no import
    val got = spark.sql("SELECT id, v FROM graft.restavro.ext ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)), got.toString)
    // time travel to the graft-written parent still reads JSON manifests
    val tt = spark.sql(
      s"SELECT count(*) FROM graft.restavro.ext VERSION AS OF ${headBefore.snapshotId}")
      .collect().head.getLong(0)
    assert(tt == 3L)
    // a graft append CHAINS off the external snapshot — the Avro list
    // becomes a verbatim segment, only the new files get a JSON segment
    spark.sql("INSERT INTO graft.restavro.ext VALUES (4, 4.0)")
    val after = spark.sql("SELECT id FROM graft.restavro.ext ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(after == Seq(1L, 2L, 3L, 4L), after.toString)
    // $manifests introspection over the mixed chain works too
    assert(spark.sql("SELECT * FROM graft.restavro.`ext$files`").count() >= 3)
  }

  test("external Avro snapshot with DELETE manifests scans in place (eq + positional)") {
    import graft.catalog._
    val ops = new TableOps(new FsStore(spark.sparkContext.hadoopConfiguration))
    send("POST", "/v1/namespaces", Some("""{"namespace": ["restdel"]}"""))
    // source lineage: two appends, a DV delete (exports as spec v2
    // POSITIONAL delete parquet) and a MOR delete (exports as spec v2
    // EQUALITY delete parquet with equality_ids)
    spark.sql("CREATE TABLE graft.restdel.src (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.restdel.src VALUES (1,1.0),(2,2.0),(3,3.0)")
    spark.sql("INSERT INTO graft.restdel.src VALUES (4,4.0),(5,5.0),(6,6.0)")
    val srcDir = new Path(s"$warehouse/restdel/src")
    ops.deletionVectorDelete(spark, srcDir,
      org.apache.spark.sql.functions.col("id").isin(2L, 5L))
    import spark.implicits._
    ops.mergeOnReadDelete(spark, srcDir, Seq(6L).toDF("id"))
    val expect = spark.sql("SELECT id FROM graft.restdel.src ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(expect == Seq(1L, 3L, 4L))
    val metaFile = IcebergExport.export(ops, srcDir, Some(spark))
    val manifestList = mapper.readTree(ops.store.readString(metaFile))
      .get("snapshots").elements().asScala.toSeq
      .maxBy(_.get("sequence-number").asLong()).get("manifest-list").asText()

    // twin via REST (same field ids), one external delete-bearing commit
    send("POST", "/v1/namespaces/restdel/tables", Some(
      """{"name": "ext", "schema": {"fields": [
          {"id": 1, "name": "id", "required": false, "type": "long"},
          {"id": 2, "name": "v", "required": false, "type": "double"}]}}"""))
    val (rc, resp) = send("POST", "/v1/namespaces/restdel/tables/ext", Some(
      s"""{"requirements": [], "updates": [
            {"action": "add-snapshot", "snapshot": {
              "snapshot-id": 880022, "sequence-number": 5,
              "timestamp-ms": ${System.currentTimeMillis()},
              "manifest-list": "$manifestList",
              "summary": {"operation": "append"}, "schema-id": 0}},
            {"action": "set-snapshot-ref", "ref-name": "main",
             "snapshot-id": 880022, "type": "branch"}]}"""))
    assert(rc == 200, resp.toString)
    // both delete dialects apply at scan time — visible rows match the
    // source exactly (2,5 dead positionally; 6 dead by equality, with
    // the sequence rule carried from the export)
    val got = spark.sql("SELECT id FROM graft.restdel.ext ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == expect, s"$got vs $expect")
    assert(spark.sql("SELECT sum(v) FROM graft.restdel.ext").collect().head.getDouble(0) ==
      1.0 + 3.0 + 4.0)
  }

  test("loadTable serves SPEC-Iceberg metadata under graft.rest.serve-spec " +
    "(re-exported on staleness, independently Avro-walked)") {
    import graft.catalog._
    val ops = new TableOps(new FsStore(spark.sparkContext.hadoopConfiguration))
    send("POST", "/v1/namespaces", Some("""{"namespace": ["restspec"]}"""))
    send("POST", "/v1/namespaces/restspec/tables", Some(
      """{"name": "served", "schema": {"fields": [
          {"id": 1, "name": "id", "required": false, "type": "long"},
          {"id": 2, "name": "v", "required": false, "type": "double"}]}}"""))
    spark.sql("INSERT INTO graft.restspec.served VALUES (1, 1.5), (2, 2.5)")
    // default load: graft dialect (JSON `manifest` snapshots)
    val (_, plain) = send("GET", "/v1/namespaces/restspec/tables/served")
    assert(!plain.get("metadata-location").asText().contains("/iceberg/"))
    // opt in via a REST commit, like any other table property
    assert(send("POST", "/v1/namespaces/restspec/tables/served", Some(
      """{"requirements": [], "updates": [
           {"action": "set-properties",
            "updates": {"graft.rest.serve-spec": "true"}}]}"""))._1 == 200)

    def specLoad(): (String, com.fasterxml.jackson.databind.JsonNode) = {
      val (lc, loaded) = send("GET", "/v1/namespaces/restspec/tables/served")
      assert(lc == 200)
      (loaded.get("metadata-location").asText(), loaded.get("metadata"))
    }
    // the response is now the C57 exporter's spec metadata: location
    // under iceberg/metadata/, snapshots carrying manifest-list Avro
    val (loc1, md1) = specLoad()
    assert(loc1.contains("/iceberg/metadata/"), loc1)
    val snaps1 = md1.get("snapshots").elements().asScala.toSeq
    assert(snaps1.nonEmpty && snaps1.forall(_.has("manifest-list")))

    // the independent generic-Avro reader walks exactly what the
    // response serves: manifest-list → manifests → live data files,
    // and those parquet files reproduce the table's rows
    def liveFiles(md: com.fasterxml.jackson.databind.JsonNode): Seq[String] = {
      val cur = md.get("current-snapshot-id").asLong()
      val ml = md.get("snapshots").elements().asScala.toSeq
        .find(_.get("snapshot-id").asLong() == cur).get
        .get("manifest-list").asText()
      val (mfs, _, _) = IcebergExport.readAvro(ops, new Path(ml))
      mfs.flatMap { mf =>
        val (entries, _, _) =
          IcebergExport.readAvro(ops, new Path(mf.get("manifest_path").toString))
        entries.filter(_.get("status").asInstanceOf[Number].intValue() != 2)
          .map(_.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
            .get("file_path").toString)
      }
    }
    val files1 = liveFiles(md1)
    assert(files1.nonEmpty)
    assert(spark.read.parquet(files1: _*).agg(
      org.apache.spark.sql.functions.sum("id")).collect().head.getLong(0) == 3L)

    // the table moves → a reload re-exports and serves the NEW version
    spark.sql("INSERT INTO graft.restspec.served VALUES (10, 10.0)")
    val (loc2, md2) = specLoad()
    assert(loc2 != loc1, "stale export must be refreshed on load")
    assert(spark.read.parquet(liveFiles(md2): _*).agg(
      org.apache.spark.sql.functions.sum("id")).collect().head.getLong(0) == 13L)
  }

  test("ADVICE r14: external eq-delete name resolution follows schema evolution; " +
    "EXISTING entries with null sequence are refused") {
    import graft.catalog._
    val ops = new TableOps(new FsStore(spark.sparkContext.hadoopConfiguration))
    send("POST", "/v1/namespaces", Some("""{"namespace": ["restadv"]}"""))
    spark.sql("CREATE TABLE graft.restadv.src (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.restadv.src VALUES (1,1.0),(2,2.0),(3,3.0)")
    val srcDir = new Path(s"$warehouse/restadv/src")
    import spark.implicits._
    ops.mergeOnReadDelete(spark, srcDir, Seq(3L).toDF("id"))
    val metaFile = IcebergExport.export(ops, srcDir, Some(spark))
    val manifestList = mapper.readTree(ops.store.readString(metaFile))
      .get("snapshots").elements().asScala.toSeq
      .maxBy(_.get("sequence-number").asLong()).get("manifest-list").asText()
    send("POST", "/v1/namespaces/restadv/tables", Some(
      """{"name": "ext", "schema": {"fields": [
          {"id": 1, "name": "id", "required": false, "type": "long"},
          {"id": 2, "name": "v", "required": false, "type": "double"}]}}"""))
    val (rc, resp) = send("POST", "/v1/namespaces/restadv/tables/ext", Some(
      s"""{"requirements": [], "updates": [
            {"action": "add-snapshot", "snapshot": {
              "snapshot-id": 990011, "sequence-number": 5,
              "timestamp-ms": ${System.currentTimeMillis()},
              "manifest-list": "$manifestList",
              "summary": {"operation": "append"}, "schema-id": 0}},
            {"action": "set-snapshot-ref", "ref-name": "main",
             "snapshot-id": 990011, "type": "branch"}]}"""))
    assert(rc == 200, resp.toString)
    val extDir = new Path(s"$warehouse/restadv/ext")
    def eqCols(o: TableOps): Seq[Seq[String]] =
      o.segmentEntries(extDir, manifestList)
        .filter(_.equalityColumns.nonEmpty).map(_.equalityColumns)
    assert(eqCols(ops) == Seq(Seq("id")))
    // a rename moves the field id to a new name: the cached Avro-leaf
    // resolution must follow (the cache keys on the current schema id),
    // not keep serving names resolved through the pre-rename schema
    spark.sql("ALTER TABLE graft.restadv.ext RENAME COLUMN id TO id2")
    assert(eqCols(ops) == Seq(Seq("id2")),
      "equality ids must re-resolve through the CURRENT schema after a rename")

    // spec inheritance applies only to ADDED entries: rewrite one data
    // manifest's entry as EXISTING (status 0) with a null sequence —
    // a fresh process must refuse it loudly, not stamp the manifest seq
    val (mfRecs, _, _) = IcebergExport.readAvro(ops, new Path(manifestList))
    val dataMf = mfRecs.find(r =>
      r.get("content").asInstanceOf[Number].intValue() == 0).get
    val mPath = new Path(dataMf.get("manifest_path").toString)
    val (eRecs, eMeta, eSchema) = IcebergExport.readAvro(ops, mPath)
    eRecs.head.put("status", 0)
    eRecs.head.put("sequence_number", null)
    val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](eSchema))
    eMeta.foreach { case (k, vv) => w.setMeta(k, vv) }
    val bos = new java.io.ByteArrayOutputStream()
    w.create(eSchema, bos); eRecs.foreach(w.append); w.close()
    val out = ops.store.fs(mPath).create(mPath, true)
    try out.write(bos.toByteArray) finally out.close()
    val fresh = new TableOps(new FsStore(spark.sparkContext.hadoopConfiguration))
    val err = intercept[IllegalArgumentException] {
      fresh.segmentEntries(extDir, manifestList)
    }
    assert(err.getMessage.contains("EXISTING"), err.getMessage)
  }

  test("view create → load → replace → rename → drop over REST") {
    send("POST", "/v1/namespaces", Some("""{"namespace": ["restv"]}"""))
    val createView =
      """{"name": "v1",
          "schema": {"fields": [{"id": 1, "name": "n", "required": false, "type": "long"}]},
          "version": {"version-id": 0, "schema-id": 0,
            "default-catalog": "graft", "default-namespace": ["restv"],
            "representations": [{"type": "sql", "sql": "SELECT 1 AS n", "dialect": "spark"}]},
          "properties": {"comment": "c"}}"""
    val (vc, created) = send("POST", "/v1/namespaces/restv/views", Some(createView))
    assert(vc == 200, created.toString)
    assert(created.get("metadata").get("current-version-id").asInt() == 0)

    assert(send("HEAD", "/v1/namespaces/restv/views/v1")._1 == 204)
    val (_, listed) = send("GET", "/v1/namespaces/restv/views")
    assert(listed.get("identifiers").get(0).get("name").asText() == "v1")

    // replace = add-view-version + set-current-view-version
    val replace =
      """{"schema": {"fields": [{"id": 1, "name": "n", "required": false, "type": "long"}]},
          "version": {"default-catalog": "graft", "default-namespace": ["restv"],
            "representations": [{"type": "sql", "sql": "SELECT 2 AS n", "dialect": "spark"}]}}"""
    val (rc, replaced) = send("POST", "/v1/namespaces/restv/views/v1", Some(replace))
    assert(rc == 200, replaced.toString)
    assert(replaced.get("metadata").get("current-version-id").asInt() == 1)
    assert(replaced.get("metadata").get("versions").size() == 2)

    assert(send("POST", "/v1/views/rename",
      Some("""{"source": {"namespace": ["restv"], "name": "v1"},
              "destination": {"namespace": ["restv"], "name": "v2"}}"""))._1 == 204)
    assert(send("HEAD", "/v1/namespaces/restv/views/v1")._1 == 404)
    assert(send("DELETE", "/v1/namespaces/restv/views/v2")._1 == 204)
  }

  test("list endpoints paginate: pageToken/pageSize with next-page-token") {
    send("POST", "/v1/namespaces", Some("""{"namespace": ["pg"]}"""))
    for (t <- Seq("a1", "a2", "a3", "a4", "a5"))
      assert(send("POST", "/v1/namespaces/pg/tables", Some(
        s"""{"name": "$t", "schema": {"schema-id": 0, "fields": [
             {"id": 1, "name": "id", "type": "long", "required": true}]}}"""))._1 == 200)

    def names(n: JsonNode): Seq[String] =
      n.get("identifiers").elements().asScala.toSeq.map(_.get("name").asText())
    // page 1
    val (c1, p1) = send("GET", "/v1/namespaces/pg/tables?pageSize=2")
    assert(c1 == 200 && names(p1) == Seq("a1", "a2"), p1.toString)
    assert(p1.get("next-page-token").asText() == "a2")
    // page 2 resumes AFTER the token
    val (_, p2) = send("GET", "/v1/namespaces/pg/tables?pageSize=2&pageToken=a2")
    assert(names(p2) == Seq("a3", "a4"))
    assert(p2.get("next-page-token").asText() == "a4")
    // final page: remainder, no token
    val (_, p3) = send("GET", "/v1/namespaces/pg/tables?pageSize=2&pageToken=a4")
    assert(names(p3) == Seq("a5") && !p3.has("next-page-token"))
    // no pageSize = the old unbounded contract, no token
    val (_, all) = send("GET", "/v1/namespaces/pg/tables")
    assert(names(all) == Seq("a1", "a2", "a3", "a4", "a5") && !all.has("next-page-token"))
    // namespaces paginate with the same protocol
    val (_, ns1) = send("GET", "/v1/namespaces?pageSize=1")
    assert(ns1.get("namespaces").size() == 1 && ns1.has("next-page-token"))
    // bad pageSize rejected
    assert(send("GET", "/v1/namespaces/pg/tables?pageSize=0")._1 == 400)
    assert(send("GET", "/v1/namespaces/pg/tables?pageSize=x")._1 == 400)
  }

  test("/v1/transactions/commit: multi-table all-or-nothing (reference 501s this)") {
    send("POST", "/v1/namespaces", Some("""{"namespace": ["txns"]}"""))
    for (t <- Seq("tx1", "tx2"))
      assert(send("POST", "/v1/namespaces/txns/tables", Some(
        s"""{"name": "$t", "schema": {"schema-id": 0, "fields": [
             {"id": 1, "name": "id", "type": "long", "required": true}]}}"""))._1 == 200)

    // one request commits both tables; requirements checked per table
    val ok = """{"table-changes": [
      {"identifier": {"namespace": ["txns"], "name": "tx1"},
       "requirements": [{"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": null}],
       "updates": [{"action": "set-properties", "updates": {"stage": "a"}}]},
      {"identifier": {"namespace": ["txns"], "name": "tx2"},
       "updates": [{"action": "set-properties", "updates": {"stage": "a"}}]}]}"""
    val (okC, okB) = send("POST", "/v1/transactions/commit", Some(ok))
    assert(okC == 204, okB.toString)
    for (t <- Seq("tx1", "tx2"))
      assert(send("GET", s"/v1/namespaces/txns/tables/$t")._2
        .get("metadata").get("properties").get("stage").asText() == "a")

    // a failed requirement on the SECOND table publishes NOTHING
    val bad = """{"table-changes": [
      {"identifier": {"namespace": ["txns"], "name": "tx1"},
       "updates": [{"action": "set-properties", "updates": {"stage": "b"}}]},
      {"identifier": {"namespace": ["txns"], "name": "tx2"},
       "requirements": [{"type": "assert-ref-snapshot-id", "ref": "main", "snapshot-id": 12345}],
       "updates": [{"action": "set-properties", "updates": {"stage": "b"}}]}]}"""
    val (bc, berr) = send("POST", "/v1/transactions/commit", Some(bad))
    assert(bc == 409, berr.toString)
    for (t <- Seq("tx1", "tx2"))
      assert(send("GET", s"/v1/namespaces/txns/tables/$t")._2
        .get("metadata").get("properties").get("stage").asText() == "a",
        s"$t must keep its pre-transaction state")

    // request-shape errors (the reference's validation style)
    assert(send("POST", "/v1/transactions/commit",
      Some("""{"table-changes": []}"""))._1 == 400)
    assert(send("POST", "/v1/transactions/commit",
      Some("""{"table-changes": [{"identifier":
        {"namespace": ["txns"], "name": "ghost"}, "updates": []}]}"""))._1 == 404)
  }

  test("transaction CAS failure mid-publish rolls back the published prefix") {
    import graft.catalog.FsStore
    val failMode = new java.util.concurrent.atomic.AtomicBoolean(false)
    // the SECOND table's publish always loses while failMode holds, so
    // every attempt publishes txf1, fails txf2, and must revert txf1
    val hooked = new FsStore(spark.sparkContext.hadoopConfiguration) {
      override def publish(d: Path, next: Int, content: String): Boolean =
        if (failMode.get() && d.toString.contains("txf2")) false
        else super.publish(d, next, content)
    }
    val srv2 = new RestCatalogServer(
      new Path(warehouse.toString), spark.sparkContext.hadoopConfiguration,
      0, Some(hooked))
    val base2 = s"http://127.0.0.1:${srv2.start()}"
    def send2(method: String, path: String, body: Option[String] = None): (Int, JsonNode) = {
      val b = HttpRequest.newBuilder(URI.create(s"$base2$path"))
      body match {
        case Some(s) => b.method(method, HttpRequest.BodyPublishers.ofString(s))
        case None => b.method(method, HttpRequest.BodyPublishers.noBody())
      }
      val res = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      val node = if (res.body() == null || res.body().isEmpty) mapper.createObjectNode()
                 else mapper.readTree(res.body())
      (res.statusCode(), node)
    }
    try {
      send2("POST", "/v1/namespaces", Some("""{"namespace": ["txf"]}"""))
      for (t <- Seq("txf1", "txf2"))
        assert(send2("POST", "/v1/namespaces/txf/tables", Some(
          s"""{"name": "$t", "schema": {"schema-id": 0, "fields": [
               {"id": 1, "name": "id", "type": "long", "required": true}]}}"""))._1 == 200)
      failMode.set(true)
      val tx = """{"table-changes": [
        {"identifier": {"namespace": ["txf"], "name": "txf1"},
         "updates": [{"action": "set-properties", "updates": {"stage": "x"}}]},
        {"identifier": {"namespace": ["txf"], "name": "txf2"},
         "updates": [{"action": "set-properties", "updates": {"stage": "x"}}]}]}"""
      val (c, err) = send2("POST", "/v1/transactions/commit", Some(tx))
      assert(c == 409, err.toString)
      failMode.set(false)
      // the first table published on every attempt and was reverted on
      // every attempt: its logical state must be pre-transaction
      for (t <- Seq("txf1", "txf2")) {
        val props = send2("GET", s"/v1/namespaces/txf/tables/$t")._2
          .get("metadata").get("properties")
        assert(!props.has("stage"), s"$t must carry no transaction residue: $props")
      }
    } finally srv2.stop()
  }

  test("RestCatalogMain boots the real entrypoint: --temp, docs routes, status") {
    import graft.rest.RestCatalogMain
    val booted = RestCatalogMain.run(
      Array("start", "--temp", "--host", "127.0.0.1"), block = false)
    assert(booted.isRight, booted.left.getOrElse(""))
    val (srv, port) = booted.toOption.get
    try {
      def get(path: String): HttpResponse[String] =
        client.send(
          HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
      assert(get("/status").statusCode() == 204)
      val yaml = get("/openapi-file.yaml")
      assert(yaml.statusCode() == 200)
      assert(yaml.body().contains("openapi: 3.0.3"))
      assert(yaml.body().contains("/v1/transactions/commit"))
      val docs = get("/docs")
      assert(docs.statusCode() == 200)
      assert(docs.headers().firstValue("Content-Type").orElse("").startsWith("text/html"))
      assert(docs.body().contains("openapi-file.yaml"))
      // temp mode boots a usable catalog, not just a listener
      val mk = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/v1/namespaces"))
          .POST(HttpRequest.BodyPublishers.ofString("""{"namespace": ["boot"]}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      assert(mk.statusCode() == 200)
      assert(get("/v1/namespaces/boot").statusCode() == 200)
    } finally srv.stop()
  }

  test("--token gates every API route behind a bearer secret; docs stay open") {
    import graft.rest.RestCatalogMain
    val booted = RestCatalogMain.run(
      Array("start", "--temp", "--host", "127.0.0.1", "--token", "s3cret"),
      block = false)
    assert(booted.isRight, booted.left.getOrElse(""))
    val (srv, port) = booted.toOption.get
    try {
      def get(path: String, auth: Option[String]): HttpResponse[String] = {
        val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET()
        auth.foreach(t => b.header("Authorization", s"Bearer $t"))
        client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      }
      // no token / wrong token → 401 with the error envelope
      val no = get("/v1/namespaces", None)
      assert(no.statusCode() == 401, no.body())
      assert(no.body().contains("NotAuthorizedError"))
      assert(get("/v1/namespaces", Some("wrong")).statusCode() == 401)
      assert(get("/status", None).statusCode() == 401)
      // right token → normal behavior
      assert(get("/v1/namespaces", Some("s3cret")).statusCode() == 200)
      assert(get("/status", Some("s3cret")).statusCode() == 204)
      // docs routes serve without auth (discovery surface)
      assert(get("/openapi-file.yaml", None).statusCode() == 200)
      assert(get("/docs", None).statusCode() == 200)
    } finally srv.stop()

    // token resolves from config file too, flags win
    val dir = java.nio.file.Files.createTempDirectory("graft-tok-")
    val cfgPath = dir.resolve("config.toml")
    java.nio.file.Files.writeString(cfgPath,
      "[api]\ntoken = \"from-file\"\n[warehouse]\npath = \"/x\"\n")
    val fromFile = RestCatalogMain.parseArgs(
      List("--config", cfgPath.toString, "start")).toOption.get
    assert(fromFile.token.contains("from-file"))
    val flagged = RestCatalogMain.parseArgs(
      List("--config", cfgPath.toString, "start", "--token", "flag-wins")).toOption.get
    assert(flagged.token.contains("flag-wins"))
  }

  test("RestCatalogMain config precedence: flags > env > config file") {
    import graft.rest.RestCatalogMain
    // bad args are rejected, help/usage short-circuits
    assert(RestCatalogMain.parseArgs(List("start", "--port", "nope")).isLeft)
    assert(RestCatalogMain.parseArgs(List("start", "--bogus")).isLeft)
    assert(RestCatalogMain.parseArgs(List("--help")).isLeft)
    assert(RestCatalogMain.parseArgs(Nil).isLeft) // no `start` command

    val dir = java.nio.file.Files.createTempDirectory("graft-cfg-")
    val cfgPath = dir.resolve("config.toml")
    java.nio.file.Files.writeString(cfgPath,
      """# template.config.toml shape
        |[api]
        |port = 4242
        |[warehouse]
        |path = "/from/file"
        |[database]
        |url = "jdbc:derby:memory:cfg;create=true"
        |dialect = "derby"
        |""".stripMargin)
    // file alone
    val fromFile = RestCatalogMain.parseArgs(
      List("--config", cfgPath.toString, "start")).toOption.get
    assert(fromFile.port == 4242)
    assert(fromFile.warehouse.contains("/from/file"))
    assert(fromFile.jdbcUrl.exists(_.startsWith("jdbc:derby")))
    // flags override the file
    val flagged = RestCatalogMain.parseArgs(
      List("-c", cfgPath.toString, "start", "-p", "0",
        "--warehouse", "/from/flag")).toOption.get
    assert(flagged.port == 0 && flagged.warehouse.contains("/from/flag"))
    assert(flagged.jdbcUrl.exists(_.startsWith("jdbc:derby"))) // untouched by flags
    // unparseable config line is a loud error
    val badPath = dir.resolve("bad.toml")
    java.nio.file.Files.writeString(badPath, "not a toml line\n")
    assert(RestCatalogMain.parseArgs(
      List("--config", badPath.toString, "start")).isLeft)

    // quoted values may contain '#' (paths, JDBC URL fragments); inline
    // comments are stripped only OUTSIDE quotes
    val hashPath = dir.resolve("hash.toml")
    java.nio.file.Files.writeString(hashPath,
      """[warehouse]
        |path = "/wh#1"   # inline comment after a quoted value
        |[database]
        |url = "jdbc:derby:memory:cfg;create=true#frag"
        |[api]
        |port = 4243 # comment outside quotes still strips
        |""".stripMargin)
    val hashed = RestCatalogMain.parseArgs(
      List("--config", hashPath.toString, "start")).toOption.get
    assert(hashed.warehouse.contains("/wh#1"), s"got ${hashed.warehouse}")
    assert(hashed.jdbcUrl.contains("jdbc:derby:memory:cfg;create=true#frag"))
    assert(hashed.port == 4243)
    // unterminated quote is a loud error, not silent truncation
    val untermPath = dir.resolve("unterm.toml")
    java.nio.file.Files.writeString(untermPath, "[warehouse]\npath = \"/oops\n")
    assert(RestCatalogMain.parseArgs(
      List("--config", untermPath.toString, "start")).isLeft)

    // the standalone binary binds loopback unless explicitly overridden
    assert(RestCatalogMain.parseArgs(List("start", "--temp")).toOption
      .get.host == "127.0.0.1")
  }
}
