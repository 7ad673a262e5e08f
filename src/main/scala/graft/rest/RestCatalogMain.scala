package graft.rest

import java.nio.file.{Files, Path => JPath, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.catalog.{FsStore, JdbcStore}

/** Standalone launcher for the catalog server — the runnable binary
  * the reference ships (main.go:34 `RunServer`: listener with
  * random-port support, logging handler, startup banner; main.go:60+
  * CLI: a `start` command with `--port/-p`, `--temp/-t` and a global
  * `--config/-c` pointing at a TOML file, template.config.toml:
  * `[api] port`, `[warehouse] path`, `[database] url/dialect`).
  *
  * {{{
  *   # from config file (./config.toml or $GRAFT_CONFIG)
  *   java -cp <graft+spark jars> graft.rest.RestCatalogMain start
  *   # explicit
  *   ... RestCatalogMain start --warehouse /data/wh --port 8181
  *   # throwaway: temp warehouse + in-memory-style embedded ledger
  *   ... RestCatalogMain start --temp
  * }}}
  *
  * `--jdbc-url` (or `[database] url` in the config) switches the
  * version ledger to [[JdbcStore]]; otherwise state is CAS-versioned
  * metadata files under the warehouse ([[FsStore]]). Port 0 (the
  * default) picks a random free port, like the reference.
  */
object RestCatalogMain {

  final case class ServerConfig(
      warehouse: Option[String] = None,
      port: Int = 0,
      // loopback by default: the server is unauthenticated (including
      // DROP with purge) — exposing it on all interfaces is an explicit
      // `--host 0.0.0.0` / config opt-in, never the default
      host: String = "127.0.0.1",
      jdbcUrl: Option[String] = None,
      temp: Boolean = false,
      // optional shared-secret bearer token (exceeds reference parity:
      // the reference ships no auth) — makes --host 0.0.0.0 defensible
      token: Option[String] = None)

  def main(args: Array[String]): Unit = {
    run(args, block = true) match {
      case Left(msg) => System.err.println(msg); sys.exit(2)
      case Right(_) => ()
    }
  }

  /** Parse args, boot the server; `block=false` returns it running
    * (used by RestSpec to drive the real entrypoint end-to-end). */
  def run(args: Array[String], block: Boolean): Either[String, (RestCatalogServer, Int)] = {
    parseArgs(args.toList).flatMap { cfg0 =>
      val cfg =
        if (cfg0.temp) {
          val dir = Files.createTempDirectory("graft-wh-")
          cfg0.copy(
            warehouse = Some(dir.toString),
            jdbcUrl = cfg0.jdbcUrl.orElse(
              Some(s"jdbc:derby:memory:graft-${java.util.UUID.randomUUID()};create=true")))
        } else cfg0
      cfg.warehouse match {
        case None =>
          Left("no warehouse configured: pass --warehouse, set [warehouse] path " +
            "in the config file, or use --temp\n\n" + usage)
        case Some(wh) =>
          val conf = new Configuration()
          val store = cfg.jdbcUrl match {
            case Some(url) => new JdbcStore(conf, url)
            case None => new FsStore(conf)
          }
          val server = new RestCatalogServer(
            new Path(wh), conf, cfg.port, Some(store), cfg.host,
            accessLog = true, token = cfg.token)
          val port = server.start()
          println(s"Started the Graft Catalog Server at `${cfg.host}:$port` " +
            s"(warehouse `$wh`${cfg.jdbcUrl.map(u => s", ledger `$u`").getOrElse("")})")
          // the bind address is a security decision — state it and the
          // override explicitly (the pre-r11 default was 0.0.0.0;
          // containerized deployments that published the port must now
          // pass --host 0.0.0.0, ideally with --token)
          println(
            if (cfg.host == "127.0.0.1" || cfg.host == "localhost")
              "Listening on LOOPBACK only (default since the server is " +
              "unauthenticated); to expose it pass --host 0.0.0.0 " +
              "and consider --token <secret>"
            else if (cfg.token.isDefined)
              s"Listening on `${cfg.host}` with bearer-token auth"
            else
              s"WARNING: listening on `${cfg.host}` WITHOUT authentication — " +
              "anyone who can reach this port can read and DROP tables; " +
              "consider --token <secret>")
          if (block) Thread.currentThread().join()
          Right((server, port))
      }
    }
  }

  private val usage: String =
    """graft-catalog — a REST catalog server over a graft warehouse
      |
      |Usage: RestCatalogMain [global flags] start [command flags]
      |
      |Available Commands:
      |   start      Start the REST API server
      |
      |Command Flags (start):
      |   -p, --port uint        Port to run the REST server on (default: from
      |                          config file, or randomly chosen if unset) [$GRAFT_API_PORT]
      |   -t, --temp             Run in temporary mode (in-memory ledger, temp
      |                          local warehouse)
      |       --warehouse path   Warehouse directory (overrides config file)
      |       --jdbc-url string  JDBC URL for the version ledger (overrides config)
      |       --host string      Bind address (default: 127.0.0.1; bind 0.0.0.0
      |                          only on purpose)
      |       --token string     Require `Authorization: Bearer <token>` on every
      |                          API request (docs routes stay open)
      |                          [$GRAFT_API_TOKEN, or [api] token in the config]
      |
      |Global Flags:
      |   -c, --config path      Path to the configuration file [$GRAFT_CONFIG]
      |   -h, --help             Show help information
      |""".stripMargin

  private[graft] def parseArgs(args: List[String]): Either[String, ServerConfig] = {
    if (args.exists(a => a == "--help" || a == "-h")) return Left(usage)
    var configPath: Option[String] = sys.env.get("GRAFT_CONFIG")
    var sawStart = false
    var cfgOverrides = ServerConfig()
    var portSet = false; var whSet = false; var jdbcSet = false; var hostSet = false
    var tokenSet = false

    @annotation.tailrec
    def loop(rest: List[String]): Either[String, Unit] = rest match {
      case Nil => Right(())
      case ("--config" | "-c") :: v :: t => configPath = Some(v); loop(t)
      case "start" :: t => sawStart = true; loop(t)
      case ("--port" | "-p") :: v :: t =>
        v.toIntOption match {
          case Some(p) if p >= 0 && p <= 65535 =>
            cfgOverrides = cfgOverrides.copy(port = p); portSet = true; loop(t)
          case _ => Left(s"invalid port: $v")
        }
      case ("--temp" | "-t") :: t =>
        cfgOverrides = cfgOverrides.copy(temp = true); loop(t)
      case "--warehouse" :: v :: t =>
        cfgOverrides = cfgOverrides.copy(warehouse = Some(v)); whSet = true; loop(t)
      case "--jdbc-url" :: v :: t =>
        cfgOverrides = cfgOverrides.copy(jdbcUrl = Some(v)); jdbcSet = true; loop(t)
      case "--host" :: v :: t =>
        cfgOverrides = cfgOverrides.copy(host = v); hostSet = true; loop(t)
      case "--token" :: v :: t =>
        cfgOverrides = cfgOverrides.copy(token = Some(v)); tokenSet = true; loop(t)
      case other :: _ => Left(s"unknown argument: $other\n\n$usage")
    }

    loop(args).flatMap { _ =>
      if (!sawStart) Left(usage)
      else {
        // Flags > env > config file, like the reference's cli.v2 ordering.
        val fromFile = configPath
          .orElse(Some("config.toml").filter(p => Files.exists(Paths.get(p))))
          .map(p => loadConfigToml(Paths.get(p)))
          .getOrElse(Right(ServerConfig()))
        fromFile.map { fc =>
          val envPort = sys.env.get("GRAFT_API_PORT").flatMap(_.toIntOption)
          ServerConfig(
            warehouse = if (whSet) cfgOverrides.warehouse else fc.warehouse,
            port =
              if (portSet) cfgOverrides.port
              else envPort.getOrElse(fc.port),
            host = if (hostSet) cfgOverrides.host else fc.host,
            jdbcUrl = if (jdbcSet) cfgOverrides.jdbcUrl else fc.jdbcUrl,
            temp = cfgOverrides.temp,
            token =
              if (tokenSet) cfgOverrides.token
              else sys.env.get("GRAFT_API_TOKEN").orElse(fc.token))
        }
      }
    }
  }

  /** Minimal TOML subset matching template.config.toml: `[section]`
    * headers, `key = "value"` / `key = 123` pairs, `#` comments. */
  private[graft] def loadConfigToml(path: JPath): Either[String, ServerConfig] = {
    if (!Files.exists(path)) return Left(s"config file not found: $path")
    var section = ""
    var cfg = ServerConfig()
    val SectionRe = """\[\s*([A-Za-z0-9_.-]+)\s*\]""".r
    val PairRe = """([A-Za-z0-9_.-]+)\s*=\s*(.+)""".r
    // Inline comments are stripped only OUTSIDE quoted strings: a
    // quoted value may legitimately contain '#' (paths, JDBC URL
    // fragments), so a leading quote wins and the value ends at the
    // closing quote, whatever follows.
    def unquote(v0: String): Either[String, String] = {
      val t = v0.trim
      if (t.startsWith("\"")) {
        val close = t.indexOf('"', 1)
        if (close < 0) Left(s"config: unterminated string `$v0`")
        else Right(t.substring(1, close))
      } else Right(t.split("#", 2).head.trim)
    }
    for (raw <- scala.jdk.CollectionConverters.ListHasAsScala(
        Files.readAllLines(path)).asScala) {
      raw.trim match {
        case "" => ()
        case l if l.startsWith("#") => ()
        case SectionRe(s) => section = s
        case PairRe(k, v0) =>
          val v = unquote(v0) match {
            case Left(err) => return Left(err)
            case Right(s)  => s
          }
          (section, k) match {
            case ("api", "port") if v.nonEmpty =>
              v.toIntOption match {
                case Some(p) => cfg = cfg.copy(port = p)
                case None => return Left(s"config: invalid [api] port `$v`")
              }
            case ("api", "host") if v.nonEmpty => cfg = cfg.copy(host = v)
            case ("api", "token") if v.nonEmpty => cfg = cfg.copy(token = Some(v))
            case ("warehouse", "path") if v.nonEmpty => cfg = cfg.copy(warehouse = Some(v))
            case ("database", "url") if v.nonEmpty => cfg = cfg.copy(jdbcUrl = Some(v))
            case ("database", "dialect") => () // JDBC URL carries the dialect
            case _ => () // unknown keys ignored, like decoding into a fixed struct
          }
        case other => return Left(s"config: unparseable line `$other`")
      }
    }
    Right(cfg)
  }
}
