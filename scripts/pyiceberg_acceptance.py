#!/usr/bin/env python3
"""Foreign-engine acceptance flow for the graft REST catalog shim.

Mirrors the reference's own pyiceberg acceptance suite
(tests/pyiceberg/conftest.py:8-22 stands up the server as a
subprocess; test_table.py:33-49 drives create/append/scan/drop) against
`graft.rest.RestCatalogMain` — the day-one proof for an environment
that HAS pyiceberg installed. This container has no pyiceberg and zero
egress, so the script SKIPS gracefully (exit 0 with a SKIP line) when
the client libraries are absent; everything else is ready to run.

What it proves when it runs:
  1. create_table over REST: schema round-trips (ids, names, types,
     required flags), properties stick        [reference test_create_empty_table]
  2. append via pyiceberg's own writer: the spec-Avro add-snapshot
     commit lands through the shim's data plane (C56)
  3. scan().to_arrow() straight off loadTable: with
     graft.rest.serve-spec=true the response metadata is the C57
     exporter's spec metadata.json, which a spec-only client consumes
     directly                                  [reference test_append_table]
  4. drop_table

Usage:
    python3 scripts/pyiceberg_acceptance.py          # auto classpath
    GRAFT_CLASSES=target/scala-2.13/classes \
    SPARK_JARS=/opt/spark/jars python3 scripts/pyiceberg_acceptance.py
"""
import glob
import os
import re
import shutil
import subprocess
import sys
import tempfile
import time
import urllib.request

def skip(msg: str) -> None:
    print(f"SKIP: {msg}")
    sys.exit(0)

try:
    import pyarrow as pa  # noqa: F401
    from pyiceberg.catalog.rest import RestCatalog
except ImportError as e:
    skip(f"pyiceberg/pyarrow not installed in this environment ({e}); "
         "run this script where they are available")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLASSES = os.environ.get("GRAFT_CLASSES",
                         os.path.join(REPO, "target", "scala-2.13", "classes"))
SPARK_JARS = os.environ.get("SPARK_JARS", "/opt/spark/jars")

if not os.path.isdir(CLASSES):
    skip(f"compiled classes not found at {CLASSES} — run `sbt compile` first")
if not glob.glob(os.path.join(SPARK_JARS, "*.jar")):
    skip(f"no Spark jars found under {SPARK_JARS}")

warehouse = tempfile.mkdtemp(prefix="graft-pyiceberg-")
classpath = CLASSES + ":" + os.path.join(SPARK_JARS, "*")
proc = subprocess.Popen(
    ["java", "-cp", classpath, "graft.rest.RestCatalogMain",
     "start", "--warehouse", warehouse, "--port", "0"],
    stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

try:
    # parse the startup banner for the bound port (port 0 = random free,
    # like the reference)
    port = None
    deadline = time.time() + 60
    assert proc.stdout is not None
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        m = re.search(r"Started the Graft Catalog Server at `[^:]*:(\d+)`", line)
        if m:
            port = int(m.group(1))
            break
    if port is None:
        raise RuntimeError("server did not start (no banner within 60s)")
    base = f"http://127.0.0.1:{port}"
    # /status is the reference's liveness probe
    assert urllib.request.urlopen(f"{base}/status").status == 204

    catalog = RestCatalog("rest_catalog", uri=base)
    catalog.create_namespace("default")

    # -- 1. create: schema parity (reference test_create_empty_table) --
    schema = pa.schema([("id", pa.int32(), False), ("name", pa.string(), True)])
    table = catalog.create_table(
        "default.test_create_table", schema=schema,
        properties={"creator": "iceberg"})
    ts = table.schema()
    assert ts.columns[0].name == "id", ts
    assert ts.columns[1].name == "name", ts
    assert table.properties.get("creator") == "iceberg", table.properties
    catalog.drop_table("default.test_create_table")
    print("ok: create_table schema/properties round-trip")

    # -- 2+3. append then scan (reference test_append_table) --
    schema = pa.schema([("id", pa.int32()), ("name", pa.string())])
    table = catalog.create_table("default.test_append_table", schema=schema)
    # serve-spec: loadTable responses carry spec-Iceberg metadata, so
    # pyiceberg's scanner consumes them directly (C57 export on demand)
    with table.transaction() as tx:
        tx.set_properties({"graft.rest.serve-spec": "true"})
    df = pa.table([
        pa.array([1, 2, 3, 4]),
        pa.array(["Alice", "Bob", "Charlie", "David"]),
    ], schema=schema)
    table.append(df)
    print("ok: append committed through the shim (spec-Avro add-snapshot)")

    table = catalog.load_table("default.test_append_table")
    read_df = table.scan().to_arrow()
    got = sorted(zip(read_df["id"].to_pylist(), read_df["name"].to_pylist()))
    want = sorted(zip(df["id"].to_pylist(), df["name"].to_pylist()))
    assert got == want, f"scan mismatch: {got} vs {want}"
    print("ok: scan().to_arrow() equals the appended frame")

    # -- 4. drop --
    catalog.drop_table("default.test_append_table")
    assert not catalog.table_exists("default.test_append_table")
    print("ok: drop_table")
    print("PASS: pyiceberg acceptance flow (create/append/scan/drop)")
finally:
    proc.kill()
    shutil.rmtree(warehouse, ignore_errors=True)
