package graft.rest

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import scala.jdk.CollectionConverters._

import graft.catalog._

/** Thin Iceberg-REST-protocol shim over [[TableOps]] — the reference's
  * HTTP surface (denali routes/router.go: config, namespaces, tables
  * CRUD, optimistic commit, views) served from the same FS-backed
  * warehouse the Spark-side [[GraftCatalog]] mounts, so anything that
  * speaks the protocol manages the SAME tables Spark queries.
  *
  * Request/response shapes follow routes/config.go, routes/ns.go,
  * routes/tables.go and routes/views.go: `{"error": {code, type,
  * message}}` envelopes, 204-on-empty, `%1F`-separated namespace path
  * segments (common/funcs.go NamespaceIDFromPath), requirement JSON
  * keyed by `type` (logic/reqs.go) and update JSON keyed by `action`
  * (logic/updates.go tableUpdateMap). Divergence, documented: the
  * `metadata` payload is graft's metadata JSON (Iceberg vocabulary,
  * Spark DDL type names) rather than iceberg-go's — the storage layer
  * under this shim is graft's, not a foreign engine's.
  *
  * Runs on the JDK's built-in HttpServer: no Spark session, no extra
  * dependency; state lives entirely in the warehouse (the reference
  * keeps a DB; graft's CAS-versioned metadata files fill that role, so
  * the shim itself is stateless and any number of them can front one
  * warehouse).
  */
final class RestCatalogServer(
    warehouse: Path,
    conf: Configuration,
    port: Int = 0,
    store0: Option[FsStore] = None,
    host: String = "127.0.0.1",
    accessLog: Boolean = false,
    /** Optional shared-secret bearer token: when set, every request
      * (except the docs routes) must carry `Authorization: Bearer
      * <token>` or gets 401. Exceeds the reference (which ships no
      * auth) — it makes a non-loopback bind defensible. */
    token: Option[String] = None) {

  private val store = store0.getOrElse(new FsStore(conf))
  private val ops = new TableOps(store)
  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress(host, port), 0)

  private val NsMarker = ".graft-ns.json" // same layout as GraftCatalog
  private val ViewsDir = ".graft-views"

  final case class RestError(code: Int, errType: String, message: String)
      extends RuntimeException(message)

  def start(): Int = {
    server.createContext("/", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null) // current thread of the default dispatcher
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)

  // ---------- routing ----------

  private def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod
    val path = ex.getRequestURI.getPath
    // Docs routes (reference routes/config.go:44-75) serve non-JSON
    // payloads, so they bypass the JSON envelope below.
    if (method == "GET" && path == "/openapi-file.yaml")
      return respondRaw(ex, 200, "text/plain", RestCatalogServer.OpenApiYaml)
    if (method == "GET" && path == "/docs")
      return respondRaw(ex, 200, "text/html", RestCatalogServer.DocsHtml)
    // bearer-token gate: constant-time compare, applied before any
    // routing state is touched
    token.foreach { t =>
      val presented = Option(ex.getRequestHeaders.getFirst("Authorization"))
        .filter(_.startsWith("Bearer ")).map(_.stripPrefix("Bearer "))
      val ok = presented.exists(p => java.security.MessageDigest.isEqual(
        p.getBytes("UTF-8"), t.getBytes("UTF-8")))
      if (!ok) {
        val o = mapper.createObjectNode()
        val eo = o.putObject("error")
        eo.put("code", 401); eo.put("type", "NotAuthorizedError")
        eo.put("message", "missing or invalid bearer token")
        return respond(ex, 401, Some(o.toString))
      }
    }
    val segs = path.split("/").filter(_.nonEmpty).toSeq
      .map(s => java.net.URLDecoder.decode(s, "UTF-8"))
    val out: Either[RestError, Option[JsonNode]] =
      try Right(route(method, segs, ex))
      catch {
        case e: RestError => Left(e)
        case e: CommitFailedException =>
          Left(RestError(409, "CommitFailedException", e.getMessage))
        case e: IllegalArgumentException =>
          Left(RestError(400, "BadRequestError", e.getMessage))
        case e: Exception =>
          Left(RestError(500, "InternalError", String.valueOf(e.getMessage)))
      }
    out match {
      case Right(None) => respond(ex, 204, None)
      case Right(Some(node)) => respond(ex, 200, Some(node.toString))
      case Left(err) =>
        val o = mapper.createObjectNode()
        val eo = o.putObject("error")
        eo.put("code", err.code); eo.put("type", err.errType)
        eo.put("message", err.message)
        respond(ex, err.code, Some(o.toString))
    }
  }

  private def respond(ex: HttpExchange, code: Int, body: Option[String]): Unit = {
    ex.getResponseHeaders.set("Content-Type", "application/json")
    body match {
      case None =>
        ex.sendResponseHeaders(code, -1)
      case Some(s) =>
        val bytes = s.getBytes(StandardCharsets.UTF_8)
        // HEAD must not carry a body even when the handler built one
        if (ex.getRequestMethod == "HEAD") ex.sendResponseHeaders(code, -1)
        else {
          ex.sendResponseHeaders(code, bytes.length.toLong)
          ex.getResponseBody.write(bytes)
        }
    }
    logAccess(ex, code)
    ex.close()
  }

  private def respondRaw(
      ex: HttpExchange, code: Int, contentType: String, body: String): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    logAccess(ex, code)
    ex.close()
  }

  /** One CLF-style line per request to stdout when enabled — the
    * reference wraps its mux in a logging handler (main.go:47). */
  private def logAccess(ex: HttpExchange, code: Int): Unit = if (accessLog) {
    val ts = java.time.ZonedDateTime.now().format(
      java.time.format.DateTimeFormatter.ofPattern("dd/MMM/yyyy:HH:mm:ss Z"))
    println(s"${ex.getRemoteAddress.getAddress.getHostAddress} - - [$ts] " +
      s""""${ex.getRequestMethod} ${ex.getRequestURI}" $code""")
  }

  /** `%1F`-separated multipart namespace (reference common/funcs.go). */
  private def nsFromSeg(seg: String): Seq[String] = seg.split('\u001F').toSeq

  private def route(method: String, segs: Seq[String], ex: HttpExchange): Option[JsonNode] = {
    val q = Option(ex.getRequestURI.getQuery).getOrElse("")
    def query(k: String): Option[String] =
      q.split("&").filter(_.nonEmpty).map(_.split("=", 2))
        .collectFirst { case Array(`k`, v) => java.net.URLDecoder.decode(v, "UTF-8") }
    def body: JsonNode = mapper.readTree(ex.getRequestBody)

    (method, segs) match {
      case ("GET", Seq("status")) => None
      case ("GET", Seq("v1", "config")) =>
        query("warehouse").filter(_ != warehouse.toString).foreach { _ =>
          throw RestError(400, "InvalidConfigError",
            "The requested warehouse does not match the server warehouse")
        }
        val o = mapper.createObjectNode()
        o.putObject("defaults").put("warehouse", warehouse.toString)
        o.putObject("overrides")
        Some(o)

      case ("GET", Seq("v1", "namespaces")) =>
        listNamespaces(query("parent").map(nsFromSeg).getOrElse(Seq.empty),
          query("pageToken"), query("pageSize"))
      case ("POST", Seq("v1", "namespaces")) => createNamespace(body)
      case ("HEAD", Seq("v1", "namespaces", ns)) =>
        if (nsExists(nsFromSeg(ns))) None else throw notFoundNs(ns)
      case ("GET", Seq("v1", "namespaces", ns)) => loadNamespace(nsFromSeg(ns))
      case ("DELETE", Seq("v1", "namespaces", ns)) => dropNamespace(nsFromSeg(ns))
      case ("POST", Seq("v1", "namespaces", ns, "properties")) =>
        updateNsProperties(nsFromSeg(ns), body)

      case ("GET", Seq("v1", "namespaces", ns, "tables")) =>
        listTables(nsFromSeg(ns), query("pageToken"), query("pageSize"))
      case ("POST", Seq("v1", "namespaces", ns, "tables")) => createTable(nsFromSeg(ns), body)
      case ("POST", Seq("v1", "namespaces", ns, "register")) => registerTable(nsFromSeg(ns), body)
      case ("GET", Seq("v1", "namespaces", ns, "tables", t)) => loadTable(nsFromSeg(ns), t)
      case ("POST", Seq("v1", "namespaces", ns, "tables", t)) => commitTable(nsFromSeg(ns), t, body)
      case ("DELETE", Seq("v1", "namespaces", ns, "tables", t)) => dropTable(nsFromSeg(ns), t)
      case ("HEAD", Seq("v1", "namespaces", ns, "tables", t)) =>
        if (ops.exists(tablePath(nsFromSeg(ns), t))) None
        else throw RestError(404, "NoSuchTableError", s"Table `$t` not found")
      case ("POST", Seq("v1", "tables", "rename")) => renameTable(body)
      case ("POST", Seq("v1", "namespaces", _, "tables", _, "metrics")) => None // accepted
      case ("POST", Seq("v1", "transactions", "commit")) => commitTransaction(body)

      case ("GET", Seq("v1", "namespaces", ns, "views")) =>
        listViews(nsFromSeg(ns), query("pageToken"), query("pageSize"))
      case ("POST", Seq("v1", "namespaces", ns, "views")) => createView(nsFromSeg(ns), body)
      case ("GET", Seq("v1", "namespaces", ns, "views", v)) => loadView(nsFromSeg(ns), v)
      case ("POST", Seq("v1", "namespaces", ns, "views", v)) => replaceView(nsFromSeg(ns), v, body)
      case ("DELETE", Seq("v1", "namespaces", ns, "views", v)) => dropView(nsFromSeg(ns), v)
      case ("HEAD", Seq("v1", "namespaces", ns, "views", v)) =>
        if (store.currentVersion(viewPath(nsFromSeg(ns), v)).isDefined) None
        else throw RestError(404, "NoSuchViewError", s"View `$v` not found")
      case ("POST", Seq("v1", "views", "rename")) => renameView(body)

      case _ => throw RestError(404, "NotFoundError", s"$method /${segs.mkString("/")}")
    }
  }

  // ---------- namespaces (routes/ns.go) ----------

  private def nsPath(ns: Seq[String]): Path =
    ns.foldLeft(warehouse)((p, part) => new Path(p, part))
  private def tablePath(ns: Seq[String], t: String): Path = new Path(nsPath(ns), t)
  private def viewPath(ns: Seq[String], v: String): Path =
    new Path(new Path(nsPath(ns), ViewsDir), v)
  private def nsExists(ns: Seq[String]): Boolean =
    ns.isEmpty || store.exists(new Path(nsPath(ns), NsMarker))
  private def notFoundNs(ns: String) =
    RestError(404, "NoSuchNamespaceError", s"Namespace `$ns` not found")
  private def requireNs(ns: Seq[String]): Unit =
    if (!nsExists(ns)) throw notFoundNs(ns.mkString("."))

  private def nsArray(o: ObjectNode, field: String, ns: Seq[String]): Unit = {
    val a = o.putArray(field); ns.foreach(a.add)
  }

  /** List pagination (the spec's `pageToken`/`pageSize`): names are
    * served sorted, a page starts AFTER the opaque token (the last
    * name of the previous page), `next-page-token` is present while
    * more remain. The reference DECLARES pageToken
    * (routes/common.go:22) but never honors it — graft implements it,
    * so a 100k-table namespace lists in bounded responses instead of
    * one unbounded JSON array. */
  private def paginate(
      names: Seq[String],
      token: Option[String],
      size: Option[String]): (Seq[String], Option[String]) = {
    val after = token match {
      case Some(t) => names.dropWhile(_ <= t)
      case None => names
    }
    size.map(_.toInt) match {
      case Some(n) if n <= 0 =>
        throw RestError(400, "BadRequestError", s"pageSize must be positive, got $n")
      case Some(n) if after.size > n => (after.take(n), Some(after(n - 1)))
      case _ => (after, None)
    }
  }

  private def listNamespaces(
      parent: Seq[String],
      pageToken: Option[String] = None,
      pageSize: Option[String] = None): Option[JsonNode] = {
    requireNs(parent)
    val o = mapper.createObjectNode()
    val all = store.list(nsPath(parent))
      .filter(p => store.exists(new Path(p, NsMarker)))
      .map(_.getName).sorted
    val (page, next) = paginate(all, pageToken, pageSize)
    val a = o.putArray("namespaces")
    page.foreach { child =>
      val e = a.addArray(); (parent :+ child).foreach(e.add)
    }
    next.foreach(o.put("next-page-token", _))
    Some(o)
  }

  private def readStringMap(n: JsonNode): Map[String, String] =
    Option(n).map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty)

  private def writeNsProps(ns: Seq[String], props: Map[String, String]): Unit = {
    val node = mapper.createObjectNode()
    props.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    store.mkdirs(nsPath(ns))
    store.writeString(new Path(nsPath(ns), NsMarker), node.toPrettyString)
  }

  private def createNamespace(body: JsonNode): Option[JsonNode] = {
    val ns = Option(body.get("namespace")).map(_.elements().asScala.map(_.asText()).toSeq)
      .getOrElse(throw new IllegalArgumentException("createNamespace: missing `namespace`"))
    if (nsExists(ns))
      throw RestError(409, "NamespaceAlreadyExistsError", s"Namespace already exists")
    if (ns.length > 1) requireNs(ns.dropRight(1))
    writeNsProps(ns, readStringMap(body.get("properties")))
    val o = mapper.createObjectNode()
    nsArray(o, "namespace", ns)
    val po = o.putObject("properties")
    readStringMap(body.get("properties")).toSeq.sortBy(_._1).foreach { case (k, v) => po.put(k, v) }
    Some(o)
  }

  private def loadNamespace(ns: Seq[String]): Option[JsonNode] = {
    requireNs(ns)
    val props =
      if (ns.isEmpty) Map.empty[String, String]
      else readStringMap(mapper.readTree(store.readString(new Path(nsPath(ns), NsMarker))))
    val o = mapper.createObjectNode()
    nsArray(o, "namespace", ns)
    val po = o.putObject("properties")
    props.toSeq.sortBy(_._1).foreach { case (k, v) => po.put(k, v) }
    Some(o)
  }

  private def dropNamespace(ns: Seq[String]): Option[JsonNode] = {
    requireNs(ns)
    val children = store.list(nsPath(ns)).filterNot(_.getName == NsMarker)
    if (children.nonEmpty)
      throw RestError(409, "NamespaceNotEmptyError", s"Namespace is not empty")
    store.delete(nsPath(ns))
    None
  }

  private def updateNsProperties(ns: Seq[String], body: JsonNode): Option[JsonNode] = {
    requireNs(ns)
    val removals = Option(body.get("removals"))
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty)
    val updates = readStringMap(body.get("updates"))
    removals.find(updates.contains).foreach { k =>
      throw RestError(422, "UnprocessableInputError",
        s"Namespace properties cannot be updated since the key `$k` is repeated in the request")
    }
    val props = readStringMap(mapper.readTree(store.readString(new Path(nsPath(ns), NsMarker))))
    val missing = removals.filterNot(props.contains)
    writeNsProps(ns, props -- removals ++ updates)
    val o = mapper.createObjectNode()
    val up = o.putArray("updated"); updates.keys.toSeq.sorted.foreach(up.add)
    val rm = o.putArray("removed"); removals.filter(props.contains).foreach(rm.add)
    val ms = o.putArray("missing"); missing.foreach(ms.add)
    Some(o)
  }

  // ---------- tables (routes/tables.go) ----------

  /** Iceberg primitive type name → Spark DDL (the subset both sides
    * express; iceberg-go vocabulary per the Iceberg spec). */
  private def icebergTypeToSpark(t: String): String = t match {
    case "boolean" => "boolean"
    case "int" | "integer" => "int"
    case "long" => "bigint"
    case "float" => "float"
    case "double" => "double"
    case "date" => "date"
    case "string" | "uuid" => "string"
    case "binary" => "binary"
    case "timestamp" | "timestamptz" => "timestamp"
    case d if d.startsWith("decimal") => d
    case other => throw new IllegalArgumentException(s"unsupported type `$other`")
  }

  private def parseSchema(n: JsonNode, schemaId: Int): TableSchema =
    TableSchema(
      Option(n.get("schema-id")).map(_.asInt()).getOrElse(schemaId),
      Option(n.get("fields")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty).map { f =>
        NestedField(
          f.get("id").asInt(), f.get("name").asText(),
          icebergTypeToSpark(f.get("type").asText()),
          Option(f.get("required")).exists(_.asBoolean()))
      })

  private def tableResponse(dir: Path): Option[JsonNode] = {
    val (v, meta) = ops.load(dir).getOrElse(
      throw RestError(404, "NoSuchTableError", s"Table not found at $dir"))
    val o = mapper.createObjectNode()
    o.put("metadata-location", store.versionPath(ops.metadataDir(dir), v).toString)
    o.set[JsonNode]("metadata", mapper.readTree(MetadataJson.toJson(meta)))
    o.putObject("config")
    Some(o)
  }

  private def listTables(
      ns: Seq[String],
      pageToken: Option[String] = None,
      pageSize: Option[String] = None): Option[JsonNode] = {
    requireNs(ns)
    val o = mapper.createObjectNode()
    val all = store.list(nsPath(ns))
      .filter(p => ops.exists(p))
      .map(_.getName).sorted
    val (page, next) = paginate(all, pageToken, pageSize)
    val a = o.putArray("identifiers")
    page.foreach { t =>
      val e = a.addObject(); nsArray(e, "namespace", ns); e.put("name", t)
    }
    next.foreach(o.put("next-page-token", _))
    Some(o)
  }

  private def createTable(ns: Seq[String], body: JsonNode): Option[JsonNode] = {
    requireNs(ns)
    if (Option(body.get("location")).exists(!_.isNull))
      throw RestError(400, "InvalidRequest",
        "Creating tables at custom locations are not supported")
    if (Option(body.get("stage-create")).exists(_.asBoolean()))
      throw RestError(400, "InvalidRequest", "Staged table creation is not supported yet")
    val name = body.get("name").asText()
    val dir = tablePath(ns, name)
    if (ops.exists(dir))
      throw RestError(409, "TableAlreadyExistsError", s"Table `$name` already exists")
    val schema = parseSchema(body.get("schema"), 0)
    val spec = PartitionSpec(0,
      Option(body.get("partition-spec")).flatMap(s => Option(s.get("fields")))
        .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
        .map(f => PartitionField(
          f.get("source-id").asInt(), f.get("field-id").asInt(),
          f.get("name").asText(), f.get("transform").asText())))
    val order = SortOrder(0,
      Option(body.get("sort-order")).flatMap(s => Option(s.get("fields")))
        .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
        .map(f => SortField(
          f.get("source-id").asInt(), f.get("transform").asText(),
          f.get("direction").asText(), f.get("null-order").asText())))
    ops.create(dir, TableMetadata.create(
      dir.toString, schema, spec, order, readStringMap(body.get("properties"))))
    tableResponse(dir)
  }

  /** Register sniffs the metadata DIALECT: graft metadata.json adopts
    * verbatim (snapshots keep their JSON manifests); a spec-Iceberg
    * file — snapshots carrying `manifest-list`, or nested (object)
    * schema types graft's flat parser can't express — routes through
    * [[IcebergImport.importTable]], which replays the full snapshot
    * lineage including delete-manifest conversion (delete conversion
    * is Spark-distributed, so it uses the JVM's active session when
    * one exists; a data-only lineage needs none). This is the flow
    * the reference's own pyiceberg acceptance tests drive
    * (tests/pyiceberg/conftest.py). */
  private def registerTable(ns: Seq[String], body: JsonNode): Option[JsonNode] = {
    requireNs(ns)
    val name = body.get("name").asText()
    val loc = body.get("metadata-location").asText()
    val dir = tablePath(ns, name)
    if (ops.exists(dir))
      throw RestError(409, "TableAlreadyExistsError", s"Table `$name` already exists")
    val raw =
      try store.readString(new Path(loc))
      catch {
        case _: Exception => throw RestError(404, "MetadataFileNotFound",
          s"Metadata file not found at location `$loc`")
      }
    val node =
      try mapper.readTree(raw)
      catch {
        case _: Exception => throw RestError(400, "InvalidRequest",
          s"Unparseable metadata file at location `$loc`")
      }
    val specIceberg =
      Option(node.get("snapshots")).exists(_.elements().asScala.exists(s =>
        s.has("manifest-list") && !s.has("manifest"))) ||
      Option(node.get("schemas")).exists(_.elements().asScala.exists(sc =>
        Option(sc.get("fields")).exists(_.elements().asScala.exists(f =>
          f.get("type").isObject))))
    if (specIceberg) {
      try IcebergImport.importTable(ops, new Path(loc), dir,
        org.apache.spark.sql.SparkSession.getActiveSession
          .orElse(org.apache.spark.sql.SparkSession.getDefaultSession))
      catch {
        case e: UnsupportedOperationException =>
          throw RestError(400, "InvalidRequest",
            s"Cannot import spec-Iceberg metadata at `$loc`: ${e.getMessage}")
      }
    } else {
      val meta =
        try MetadataJson.fromJson(raw)
        catch {
          case _: Exception => throw RestError(400, "InvalidRequest",
            s"Unparseable metadata file at location `$loc`")
        }
      ops.create(dir, meta.copy(location = dir.toString))
    }
    tableResponse(dir)
  }

  /** Load serves graft-dialect metadata by default. With the table
    * property `graft.rest.serve-spec=true`, the response instead
    * carries SPEC-Iceberg metadata (the C57 exporter's
    * `iceberg/metadata/v<N>.metadata.json` + Avro manifest chain),
    * re-exported on demand when the table has moved since the last
    * export — so a spec-only client (pyiceberg's RestCatalog, the
    * reference's own acceptance suite) can SCAN a graft-written table
    * straight off the loadTable response, not just commit into it.
    * The export is metadata-only (zero data copy) and named by the
    * graft metadata version, which doubles as the freshness check.
    * Pending merge-on-read deletes need a SparkSession to materialize
    * as spec delete files; when none is attached the response falls
    * back to the graft dialect rather than serving a
    * rows-resurrecting export. */
  private def loadTable(ns: Seq[String], t: String): Option[JsonNode] = {
    val dir = tablePath(ns, t)
    val (v, meta) = ops.load(dir).getOrElse(
      throw RestError(404, "NoSuchTableError", s"Table not found at $dir"))
    if (meta.properties.get("graft.rest.serve-spec").contains("true"))
      specTableResponse(dir, v).orElse(tableResponse(dir))
    else tableResponse(dir)
  }

  private def specTableResponse(dir: Path, v: Int): Option[JsonNode] =
    try {
      val specFile = new Path(
        new Path(new Path(dir, "iceberg"), "metadata"), s"v$v.metadata.json")
      val f =
        if (store.exists(specFile)) specFile
        else IcebergImport.synchronized { // one exporter per shim at a time
          if (store.exists(specFile)) specFile
          else graft.catalog.IcebergExport.export(ops, dir,
            org.apache.spark.sql.SparkSession.getActiveSession
              .orElse(org.apache.spark.sql.SparkSession.getDefaultSession))
        }
      val o = mapper.createObjectNode()
      o.put("metadata-location", f.toString)
      o.set[JsonNode]("metadata", mapper.readTree(store.readString(f)))
      o.putObject("config")
      Some(o)
    } catch {
      // e.g. pending MOR deletes with no SparkSession attached — the
      // graft-dialect response stays available and correct
      case _: Exception => None
    }

  /** Commit: parse requirements (logic/reqs.go `type`) and updates
    * (logic/updates.go `action`), run them through the SAME
    * [[TableOps.commit]] CAS path Spark-side writes use. */
  private def commitTable(ns: Seq[String], t: String, body: JsonNode): Option[JsonNode] = {
    val dir = tablePath(ns, t)
    if (!ops.exists(dir))
      throw RestError(404, "NoSuchTableError", s"Table `$t` not found")
    val reqs = Option(body.get("requirements"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty).map(parseRequirement)
    val updates = Option(body.get("updates"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty).map(parseUpdate)
    ops.commit(dir, reqs, updates)
    tableResponse(dir)
  }

  /** Cross-table atomic commit — the endpoint the reference REGISTERS
    * but answers 501 Not Implemented (routes/tables.go:470; "transactions
    * not supported" in logic). graft implements it: every
    * table-change's requirements are checked against a consistent
    * read, then all updates publish all-or-nothing through
    * [[Transactions]] — ordered CAS with prefix rollback on the plain
    * FS store, ONE database transaction when the warehouse store is a
    * [[JdbcStore]]. Success is 204 (CommitTransactionRequest has no
    * response body in the spec); a lost race after retries is 409. */
  private def commitTransaction(body: JsonNode): Option[JsonNode] = {
    val changes = Option(body.get("table-changes"))
      .map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
    if (changes.isEmpty)
      throw RestError(400, "BadRequestError", "table-changes must be non-empty")
    val txs = changes.map { c =>
      val id = Option(c.get("identifier")).filterNot(_.isNull).getOrElse(
        throw RestError(400, "BadRequestError",
          "each table-change needs an identifier {namespace, name}"))
      val ns = Option(id.get("namespace"))
        .map(_.elements().asScala.toSeq.map(_.asText())).getOrElse(Seq.empty)
      requireNs(ns)
      val name = id.get("name").asText()
      val dir = tablePath(ns, name)
      if (!ops.exists(dir))
        throw RestError(404, "NoSuchTableError", s"Table `$name` not found")
      val reqs = Option(c.get("requirements"))
        .map(_.elements().asScala.toSeq).getOrElse(Seq.empty).map(parseRequirement)
      val updates = Option(c.get("updates"))
        .map(_.elements().asScala.toSeq).getOrElse(Seq.empty).map(parseUpdate)
      Transactions.TableTx(dir, reqs, _ => updates)
    }
    new Transactions(store).commitAll(txs)
    None // 204: all tables committed
  }

  private def parseRequirement(n: JsonNode): Requirement = {
    import Requirement._
    n.get("type").asText() match {
      case "assert-create" => AssertCreate
      case "assert-table-uuid" => AssertTableUuid(n.get("uuid").asText())
      case "assert-ref-snapshot-id" =>
        AssertRefSnapshotId(n.get("ref").asText(),
          Option(n.get("snapshot-id")).filterNot(_.isNull).map(_.asLong()))
      case "assert-last-assigned-field-id" =>
        AssertLastAssignedFieldId(n.get("last-assigned-field-id").asInt())
      case "assert-current-schema-id" =>
        AssertCurrentSchemaId(n.get("current-schema-id").asInt())
      case "assert-last-assigned-partition-id" =>
        AssertLastAssignedPartitionId(n.get("last-assigned-partition-id").asInt())
      case "assert-default-spec-id" =>
        AssertDefaultSpecId(n.get("default-spec-id").asInt())
      case "assert-default-sort-order-id" =>
        AssertDefaultSortOrderId(n.get("default-sort-order-id").asInt())
      case other => throw RestError(400, "BadRequestError",
        s"Invalid requirement type `$other`")
    }
  }

  private def parseUpdate(n: JsonNode): MetadataUpdate = {
    import MetadataUpdate._
    n.get("action").asText() match {
      case "assign-uuid" => AssignUuid(n.get("uuid").asText())
      case "upgrade-format-version" =>
        UpgradeFormatVersion(n.get("format-version").asInt())
      case "add-schema" => AddSchema(parseSchema(n.get("schema"), -1))
      case "set-current-schema" => SetCurrentSchema(n.get("schema-id").asInt())
      case "add-spec" =>
        val s = n.get("spec")
        AddSpec(PartitionSpec(s.get("spec-id").asInt(),
          Option(s.get("fields")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
            .map(f => PartitionField(
              f.get("source-id").asInt(), f.get("field-id").asInt(),
              f.get("name").asText(), f.get("transform").asText()))))
      case "set-default-spec" => SetDefaultSpec(n.get("spec-id").asInt())
      case "add-sort-order" =>
        val s = n.get("sort-order")
        AddSortOrder(SortOrder(s.get("order-id").asInt(),
          Option(s.get("fields")).map(_.elements().asScala.toSeq).getOrElse(Seq.empty)
            .map(f => SortField(
              f.get("source-id").asInt(), f.get("transform").asText(),
              f.get("direction").asText(), f.get("null-order").asText()))))
      case "set-default-sort-order" => SetDefaultSortOrder(n.get("sort-order-id").asInt())
      case "add-snapshot" =>
        val s = n.get("snapshot")
        val summary = readStringMap(s.get("summary"))
        AddSnapshot(Snapshot(
          s.get("snapshot-id").asLong(),
          Option(s.get("parent-snapshot-id")).filterNot(_.isNull).map(_.asLong()),
          s.get("sequence-number").asLong(),
          s.get("timestamp-ms").asLong(),
          summary.getOrElse("operation", "append"),
          // graft snapshots point at a JSON manifest; accept either key
          Option(s.get("manifest")).orElse(Option(s.get("manifest-list")))
            .map(_.asText()).getOrElse(""),
          summary - "operation",
          Option(s.get("schema-id")).map(_.asInt()).getOrElse(0)))
      case "set-snapshot-ref" =>
        SetSnapshotRef(n.get("ref-name").asText(), n.get("snapshot-id").asLong(),
          Option(n.get("type")).map(_.asText()).getOrElse("branch"))
      case "remove-snapshots" =>
        RemoveSnapshots(n.get("snapshot-ids").elements().asScala.map(_.asLong()).toSeq)
      case "remove-snapshot-ref" => RemoveSnapshotRef(n.get("ref-name").asText())
      case "set-location" => SetLocation(n.get("location").asText())
      case "set-properties" => SetProperties(readStringMap(n.get("updates")))
      case "remove-properties" =>
        RemoveProperties(n.get("removals").elements().asScala.map(_.asText()).toSeq)
      case "set-statistics" =>
        SetStatistics(n.get("snapshot-id").asLong(), n.get("statistics").asText())
      case "remove-statistics" => RemoveStatistics(n.get("snapshot-id").asLong())
      case other => throw RestError(400, "BadRequestError", s"Invalid update action `$other`")
    }
  }

  private def dropTable(ns: Seq[String], t: String): Option[JsonNode] = {
    val dir = tablePath(ns, t)
    if (!ops.exists(dir))
      throw RestError(404, "NoSuchTableError", s"Table `$t` not found")
    store.delete(dir) // FS-backed: drop and purge coincide
    None
  }

  /** Accepts `source`/`destination` (Iceberg REST) or `Source`/`Target`
    * (the reference's untagged Go struct) — Go decodes either, so both
    * appear in the wild. */
  private def renameTable(body: JsonNode): Option[JsonNode] = {
    def ident(keys: String*): (Seq[String], String) = {
      val n = keys.flatMap(k => Option(body.get(k))).headOption.getOrElse(
        throw new IllegalArgumentException(s"rename: missing ${keys.head}"))
      (n.get("namespace").elements().asScala.map(_.asText()).toSeq, n.get("name").asText())
    }
    val (sNs, sName) = ident("source", "Source")
    val (dNs, dName) = ident("destination", "Target", "target")
    val from = tablePath(sNs, sName)
    if (!ops.exists(from))
      throw RestError(404, "NoSuchTableError", s"Table `$sName` not found")
    requireNs(dNs)
    val to = tablePath(dNs, dName)
    if (ops.exists(to))
      throw RestError(409, "TableAlreadyExistsError", s"Table `$dName` already exists")
    if (!store.fs(from).rename(from, to))
      throw RestError(500, "InternalError", s"rename $from -> $to failed")
    None
  }

  // ---------- views (routes/views.go) ----------

  private def viewResponse(dir: Path): Option[JsonNode] = {
    val (v, json) = store.currentVersion(dir).getOrElse(
      throw RestError(404, "NoSuchViewError", s"View not found at $dir"))
    val o = mapper.createObjectNode()
    o.put("metadata-location", store.existingVersionPath(dir, v).toString)
    o.set[JsonNode]("metadata", mapper.readTree(json))
    Some(o)
  }

  private def listViews(
      ns: Seq[String],
      pageToken: Option[String] = None,
      pageSize: Option[String] = None): Option[JsonNode] = {
    requireNs(ns)
    val o = mapper.createObjectNode()
    val all = store.list(new Path(nsPath(ns), ViewsDir))
      .filter(p => store.currentVersion(p).isDefined)
      .map(_.getName).sorted
    val (page, next) = paginate(all, pageToken, pageSize)
    val a = o.putArray("identifiers")
    page.foreach { v =>
      val e = a.addObject(); nsArray(e, "namespace", ns); e.put("name", v)
    }
    next.foreach(o.put("next-page-token", _))
    Some(o)
  }

  private def parseViewVersion(n: JsonNode, versionId: Int): ViewVersion =
    ViewVersion(
      versionId = Option(n.get("version-id")).map(_.asInt()).getOrElse(versionId),
      timestampMs = Option(n.get("timestamp-ms")).map(_.asLong())
        .getOrElse(System.currentTimeMillis()),
      sql = Option(n.get("representations")).map(_.elements().asScala.toSeq)
        .getOrElse(Seq.empty)
        .find(r => Option(r.get("type")).forall(_.asText() == "sql"))
        .map(_.get("sql").asText())
        .getOrElse(throw new IllegalArgumentException("view version needs a sql representation")),
      defaultCatalog = Option(n.get("default-catalog")).map(_.asText()).getOrElse(""),
      defaultNamespace = Option(n.get("default-namespace"))
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Seq.empty),
      schemaId = Option(n.get("schema-id")).map(_.asInt()).getOrElse(0))

  private def createView(ns: Seq[String], body: JsonNode): Option[JsonNode] = {
    requireNs(ns)
    val name = body.get("name").asText()
    val dir = viewPath(ns, name)
    if (store.currentVersion(dir).isDefined)
      throw RestError(409, "ViewAlreadyExistsError", s"View `$name` already exists")
    val vm = ViewMetadata(
      viewUuid = java.util.UUID.randomUUID().toString,
      formatVersion = 1,
      location = dir.toString,
      currentVersionId = 0,
      versions = Seq(parseViewVersion(body.get("version"), 0).copy(versionId = 0)),
      schemas = Seq(parseSchema(body.get("schema"), 0)),
      properties = readStringMap(body.get("properties")))
    if (!store.publish(dir, 0, MetadataJson.viewToJson(vm), gzip = true))
      throw RestError(409, "ViewAlreadyExistsError", s"View `$name` already exists")
    viewResponse(dir)
  }

  private def loadView(ns: Seq[String], v: String): Option[JsonNode] =
    viewResponse(viewPath(ns, v))

  private def replaceView(ns: Seq[String], name: String, body: JsonNode): Option[JsonNode] = {
    val dir = viewPath(ns, name)
    val (v, json) = store.currentVersion(dir).getOrElse(
      throw RestError(404, "NoSuchViewError", s"View `$name` not found"))
    val vm = MetadataJson.viewFromJson(json)
    val nextVer = parseViewVersion(body.get("version"), vm.versions.map(_.versionId).max + 1)
      .copy(schemaId = vm.schemas.map(_.schemaId).max + 1)
    val updated = vm
      .addVersion(nextVer)
      .setCurrentVersion(nextVer.versionId)
      .copy(
        schemas = vm.schemas :+ parseSchema(body.get("schema"), nextVer.schemaId)
          .copy(schemaId = nextVer.schemaId),
        properties = readStringMap(body.get("properties")))
    if (!store.publish(dir, v + 1, MetadataJson.viewToJson(updated), gzip = true))
      throw new CommitFailedException(s"concurrent replace of view `$name`")
    viewResponse(dir)
  }

  private def dropView(ns: Seq[String], v: String): Option[JsonNode] = {
    val dir = viewPath(ns, v)
    if (store.currentVersion(dir).isEmpty)
      throw RestError(404, "NoSuchViewError", s"View `$v` not found")
    store.delete(dir)
    None
  }

  private def renameView(body: JsonNode): Option[JsonNode] = {
    def ident(keys: String*): (Seq[String], String) = {
      val n = keys.flatMap(k => Option(body.get(k))).headOption.getOrElse(
        throw new IllegalArgumentException(s"rename: missing ${keys.head}"))
      (n.get("namespace").elements().asScala.map(_.asText()).toSeq, n.get("name").asText())
    }
    val (sNs, sName) = ident("source", "Source")
    val (dNs, dName) = ident("destination", "Target", "target")
    val from = viewPath(sNs, sName)
    if (store.currentVersion(from).isEmpty)
      throw RestError(404, "NoSuchViewError", s"View `$sName` not found")
    requireNs(dNs)
    val to = viewPath(dNs, dName)
    if (store.currentVersion(to).isDefined)
      throw RestError(409, "ViewAlreadyExistsError", s"View `$dName` already exists")
    store.mkdirs(to.getParent)
    if (!store.fs(from).rename(from, to))
      throw RestError(500, "InternalError", s"rename view $from -> $to failed")
    None
  }
}

/** Embedded docs payloads for the two documentation routes the
  * reference serves (routes/config.go:44-75: `GET /openapi-file.yaml`
  * from a go:embed'd spec, `GET /docs` as a small HTML shell that
  * renders it). The YAML here describes the surface THIS server
  * implements — including `/v1/transactions/commit`, which the
  * reference 501s — rather than re-shipping a foreign spec file. */
object RestCatalogServer {

  private[rest] val OpenApiYaml: String =
    """openapi: 3.0.3
      |info:
      |  title: Graft REST Catalog
      |  description: >-
      |    Iceberg-REST-protocol catalog over a graft warehouse. State lives
      |    in CAS-versioned metadata files (or a JDBC ledger); the server is
      |    stateless and any number of replicas can front one warehouse.
      |  version: "1.0"
      |paths:
      |  /status:
      |    get:
      |      summary: Liveness probe
      |      responses: {"204": {description: Server is up}}
      |  /openapi-file.yaml:
      |    get:
      |      summary: This document
      |      responses: {"200": {description: OpenAPI YAML}}
      |  /docs:
      |    get:
      |      summary: Human-readable API reference
      |      responses: {"200": {description: HTML shell}}
      |  /v1/config:
      |    get:
      |      summary: Catalog configuration (defaults/overrides)
      |      parameters:
      |        - {name: warehouse, in: query, required: false, schema: {type: string}}
      |      responses:
      |        "200": {description: "{defaults: {warehouse}, overrides: {}}"}
      |        "400": {description: Requested warehouse does not match server}
      |  /v1/namespaces:
      |    get:
      |      summary: List namespaces (optionally under `parent`; paged)
      |      parameters:
      |        - {name: parent, in: query, required: false, schema: {type: string}}
      |        - {name: pageToken, in: query, required: false, schema: {type: string}}
      |        - {name: pageSize, in: query, required: false, schema: {type: integer}}
      |      responses: {"200": {description: namespaces list}}
      |    post:
      |      summary: Create a namespace with properties
      |      responses: {"200": {description: created}, "409": {description: exists}}
      |  /v1/namespaces/{ns}:
      |    get:
      |      summary: Load a namespace and its properties
      |      responses: {"200": {description: namespace}, "404": {description: not found}}
      |    head:
      |      summary: Namespace existence check
      |      responses: {"204": {description: exists}, "404": {description: not found}}
      |    delete:
      |      summary: Drop an empty namespace
      |      responses: {"204": {description: dropped}, "404": {description: not found}}
      |  /v1/namespaces/{ns}/properties:
      |    post:
      |      summary: Set/remove namespace properties
      |      responses: {"200": {description: updated/removed/missing keys}}
      |  /v1/namespaces/{ns}/tables:
      |    get:
      |      summary: List table identifiers (paged)
      |      responses: {"200": {description: identifiers}}
      |    post:
      |      summary: Create a table (schema, partition spec, sort order, props)
      |      responses: {"200": {description: metadata}, "409": {description: exists}}
      |  /v1/namespaces/{ns}/register:
      |    post:
      |      summary: Register an existing table by metadata location (no copy)
      |      responses: {"200": {description: metadata}}
      |  /v1/namespaces/{ns}/tables/{table}:
      |    get:
      |      summary: Load table metadata
      |      responses: {"200": {description: metadata}, "404": {description: not found}}
      |    head:
      |      summary: Table existence check
      |      responses: {"204": {description: exists}, "404": {description: not found}}
      |    post:
      |      summary: Commit table updates under requirements (optimistic)
      |      responses: {"200": {description: new metadata}, "409": {description: requirement failed}}
      |    delete:
      |      summary: Drop a table (optional `purgeRequested`)
      |      responses: {"204": {description: dropped}, "404": {description: not found}}
      |  /v1/namespaces/{ns}/tables/{table}/metrics:
      |    post:
      |      summary: Accept scan metrics reports
      |      responses: {"204": {description: accepted}}
      |  /v1/tables/rename:
      |    post:
      |      summary: Rename/move a table between namespaces
      |      responses: {"204": {description: renamed}}
      |  /v1/transactions/commit:
      |    post:
      |      summary: Atomic multi-table commit
      |      responses: {"204": {description: committed}, "409": {description: conflict}}
      |  /v1/namespaces/{ns}/views:
      |    get:
      |      summary: List view identifiers (paged)
      |      responses: {"200": {description: identifiers}}
      |    post:
      |      summary: Create a view
      |      responses: {"200": {description: view metadata}}
      |  /v1/namespaces/{ns}/views/{view}:
      |    get:
      |      summary: Load view metadata (version history)
      |      responses: {"200": {description: view metadata}, "404": {description: not found}}
      |    head:
      |      summary: View existence check
      |      responses: {"204": {description: exists}, "404": {description: not found}}
      |    post:
      |      summary: Replace a view (appends a version)
      |      responses: {"200": {description: new view metadata}}
      |    delete:
      |      summary: Drop a view
      |      responses: {"204": {description: dropped}, "404": {description: not found}}
      |  /v1/views/rename:
      |    post:
      |      summary: Rename/move a view between namespaces
      |      responses: {"204": {description: renamed}}
      |""".stripMargin

  /** Self-contained shell (no CDN fetch — this server may run
    * air-gapped): renders the endpoint list from the YAML inline. */
  private[rest] val DocsHtml: String =
    """<!doctype html>
      |<html>
      |  <head>
      |    <title>Graft Catalog — API Reference</title>
      |    <meta charset="utf-8" />
      |    <meta name="viewport" content="width=device-width, initial-scale=1" />
      |    <style>
      |      body { font-family: system-ui, sans-serif; margin: 2rem auto; max-width: 52rem; }
      |      pre { background: #f6f6f6; padding: 1rem; overflow-x: auto; }
      |      code { background: #f0f0f0; padding: 0 .2rem; }
      |    </style>
      |  </head>
      |  <body>
      |    <h1>Graft REST Catalog</h1>
      |    <p>The full machine-readable surface is at
      |       <a href="/openapi-file.yaml"><code>/openapi-file.yaml</code></a>;
      |       liveness at <code>GET /status</code>; Spark connects via
      |       <code>spark.sql.catalog.&lt;name&gt;.type=rest</code> with
      |       <code>uri=http://host:port</code>.</p>
      |    <pre id="spec">loading…</pre>
      |    <script>
      |      fetch('/openapi-file.yaml').then(r => r.text())
      |        .then(t => { document.getElementById('spec').textContent = t; });
      |    </script>
      |  </body>
      |</html>
      |""".stripMargin
}
