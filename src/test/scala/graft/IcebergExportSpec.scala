package graft

import org.apache.hadoop.fs.Path
import scala.jdk.CollectionConverters._

import graft.catalog._

/** Validates the Iceberg-v2 export against the spec's file formats,
  * reading everything back through independent libraries (Jackson for
  * metadata.json, the Avro reader for manifests): required field ids,
  * Iceberg type names, manifest-list → manifest → data-file chain,
  * record counts, and time-travel across exported snapshots. An
  * external-engine read (pyiceberg / DuckDB-iceberg, which the
  * reference's own tests use) needs network-installed components this
  * environment doesn't ship, so the spec checks the bytes those
  * readers would parse. */
class IcebergExportSpec extends SparkSpec {

  private def cat: GraftCatalog =
    spark.sessionState.catalogManager.catalog("graft").asInstanceOf[GraftCatalog]

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  test("export emits spec-compliant metadata.json, manifest lists and manifests") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ice")
    spark.sql("""CREATE TABLE graft.ice.t
      (id BIGINT, name STRING, price DOUBLE, tags ARRAY<FLOAT>)""")
    spark.sql("""INSERT INTO graft.ice.t VALUES
      (1, 'a', 1.5, array(CAST(0.1 AS FLOAT))), (2, 'b', 2.5, array())""")
    spark.sql("INSERT INTO graft.ice.t VALUES (3, 'c', 3.5, array())")
    val dir = new Path(s"$warehouse/ice/t")

    val metaFile = IcebergExport.export(cat.ops, dir)
    assert(metaFile.toString.endsWith(".metadata.json"))

    // ---- metadata.json: Iceberg dialect ----
    val n = mapper.readTree(cat.ops.store.readString(metaFile))
    assert(n.get("format-version").asInt() == 2)
    assert(n.get("last-sequence-number").asLong() == 2L)
    val fields = n.get("schemas").get(0).get("fields").elements().asScala.toSeq
    val types = fields.map(f => f.get("name").asText() -> f.get("type")).toMap
    assert(types("id").asText() == "long", "bigint must export as iceberg long")
    assert(types("name").asText() == "string")
    assert(types("price").asText() == "double")
    assert(types("tags").get("type").asText() == "list" &&
      types("tags").get("element").asText() == "float" &&
      types("tags").get("element-id").asInt() > 4,
      s"array<float> must export as a list with a fresh element-id: ${types("tags")}")

    val snaps = n.get("snapshots").elements().asScala.toSeq
    assert(snaps.size == 2)
    assert(snaps.forall(_.has("manifest-list")))
    assert(n.get("refs").get("main").get("snapshot-id").asLong() ==
      n.get("current-snapshot-id").asLong())
    // version-hint.text for Hadoop-catalog-style discovery
    assert(cat.ops.store.exists(new Path(metaFile.getParent, "version-hint.text")))

    // ---- manifest list: 500-series field ids, counts ----
    val current = snaps.find(
      _.get("snapshot-id").asLong() == n.get("current-snapshot-id").asLong()).get
    val (mlRecs, mlMeta, mlSchema) =
      IcebergExport.readAvro(cat.ops, new Path(current.get("manifest-list").asText()))
    assert(mlSchema.getName == "manifest_file")
    def fieldId(s: org.apache.avro.Schema, name: String): Int =
      s.getField(name).getObjectProp("field-id").asInstanceOf[Number].intValue()
    assert(fieldId(mlSchema, "manifest_path") == 500)
    assert(fieldId(mlSchema, "manifest_length") == 501)
    assert(fieldId(mlSchema, "added_snapshot_id") == 503)
    assert(fieldId(mlSchema, "sequence_number") == 515)
    assert(mlMeta("format-version") == "2")
    assert(mlMeta("snapshot-id") == current.get("snapshot-id").asLong().toString)
    assert(mlRecs.size == 1)
    val ml = mlRecs.head
    assert(ml.get("sequence_number").asInstanceOf[Long] == 2L)
    assert(ml.get("content").asInstanceOf[Int] == 0)

    // the recorded manifest length matches the actual file
    val manifestPath = new Path(ml.get("manifest_path").toString)
    assert(cat.ops.store.fs(manifestPath).getFileStatus(manifestPath).getLen ==
      ml.get("manifest_length").asInstanceOf[Long])

    // ---- manifest: entry fields, data-file chain, record counts ----
    val (mRecs, mMeta, mSchema) = IcebergExport.readAvro(cat.ops, manifestPath)
    assert(mSchema.getName == "manifest_entry")
    assert(fieldId(mSchema, "status") == 0)
    val dfSchema = mSchema.getField("data_file").schema()
    assert(fieldId(dfSchema, "file_path") == 100)
    assert(fieldId(dfSchema, "record_count") == 103)
    assert(fieldId(dfSchema, "content") == 134)
    assert(mMeta("format-version") == "2" && mMeta("content") == "data")
    assert(mapper.readTree(mMeta("schema")).get("type").asText() == "struct")

    // every listed file exists; row counts sum to the table count
    val files = mRecs.map(_.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord])
    files.foreach { df =>
      val p = new Path(df.get("file_path").toString)
      assert(cat.ops.store.exists(p), s"manifest references missing file $p")
      assert(df.get("file_format").toString == "PARQUET")
    }
    val totalRows = files.map(_.get("record_count").asInstanceOf[Long]).sum
    assert(totalRows == 3L)
    assert(ml.get("added_rows_count").asInstanceOf[Long] == 3L)

    // ---- time travel: the FIRST snapshot's manifest has only batch 1 ----
    val first = snaps.minBy(_.get("sequence-number").asLong())
    val (fl, _, _) = IcebergExport.readAvro(cat.ops, new Path(first.get("manifest-list").asText()))
    val (fm, _, _) = IcebergExport.readAvro(cat.ops, new Path(fl.head.get("manifest_path").toString))
    val firstRows = fm.map(_.get("data_file")
      .asInstanceOf[org.apache.avro.generic.GenericRecord]
      .get("record_count").asInstanceOf[Long]).sum
    assert(firstRows == 2L, "snapshot 1 must list only its own 2 rows")

    // ---- a fresh Spark session can read the export's file list directly ----
    val paths = files.map(_.get("file_path").toString)
    val back = spark.read.parquet(paths: _*)
    assert(back.count() == 3)
    assert(back.columns.toSeq == Seq("id", "name", "price", "tags"))
  }

  test("round-trip: export to Iceberg v2, import back, lineage and rows survive") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ice")
    spark.sql("CREATE TABLE graft.ice.rt (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.ice.rt VALUES (1, 1.5), (2, 2.5)")
    spark.sql("INSERT INTO graft.ice.rt VALUES (3, 3.5)")
    val dir = new Path(s"$warehouse/ice/rt")

    val metaFile = IcebergExport.export(cat.ops, dir)
    val target = new Path(s"$warehouse/ice/rt_imported")
    val imported = IcebergImport.importTable(cat.ops, metaFile, target)

    // rows identical, zero data copy (files referenced in place)
    val got = cat.ops.read(spark, target).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)))
    assert(imported.properties.contains("graft.imported-from"))

    // lineage replayed: two snapshots, append step preserved
    assert(imported.snapshots.size == 2)
    val firstSnap = imported.snapshots.minBy(_.sequenceNumber)
    assert(cat.ops.read(spark, target, snapshotId = Some(firstSnap.snapshotId))
      .count() == 2, "time travel to the first imported snapshot")
    assert(imported.snapshots.maxBy(_.sequenceNumber).operation == "append")

    // schema types round-tripped through iceberg names (long -> bigint)
    assert(imported.currentSchema.fields.find(_.name == "id").get.dataType == "bigint")
  }

  test("C75 round-trip: column defaults export as v3 JSON literals and survive import") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ice")
    spark.sql("CREATE TABLE graft.ice.defs (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO graft.ice.defs VALUES (1, 1.5), (2, 2.5)")
    // add defaulted columns AFTER the first file exists
    spark.sql("ALTER TABLE graft.ice.defs ADD COLUMN flag INT DEFAULT 7")
    spark.sql("ALTER TABLE graft.ice.defs ADD COLUMN tag STRING DEFAULT 'none'")
    spark.sql("INSERT INTO graft.ice.defs VALUES (3, 3.5, 30, 'x')")
    val dir = new Path(s"$warehouse/ice/defs")

    val metaFile = IcebergExport.export(cat.ops, dir, Some(spark))
    // the exported metadata carries the v3 keys as JSON literals
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(metaFile.toString)), "UTF-8")
    val compact = json.replaceAll("\\s", "")
    assert(compact.contains("\"initial-default\":7"), json.take(2000))
    assert(compact.contains("\"initial-default\":\"none\""), json.take(2000))

    val target = new Path(s"$warehouse/ice/defs_imported")
    val imported = IcebergImport.importTable(cat.ops, metaFile, target)
    val flag = imported.currentSchema.fields.find(_.name == "flag").get
    assert(flag.initialDefault.contains("7") && flag.writeDefault.contains("7"), flag)
    val tag = imported.currentSchema.fields.find(_.name == "tag").get
    assert(tag.initialDefault.contains("'none'"), tag)

    // pre-column files in the IMPORTED table fill the default at read
    val got = cat.ops.read(spark, target).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getString(3))).toSeq
    assert(got == Seq((1L, 7, "none"), (2L, 7, "none"), (3L, 30, "x")), got.toString)
  }

  test("export refuses pending merge-on-read deletes; re-export after new commits") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ice")
    spark.sql("CREATE TABLE graft.ice.m (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.ice.m VALUES (1,'a'), (2,'b')")
    val dir = new Path(s"$warehouse/ice/m")
    import spark.implicits._
    cat.ops.mergeOnReadDelete(spark, dir, Seq(1L).toDF("id"))
    // without a SparkSession delete materialization is impossible —
    // refuse rather than silently resurrect dead rows
    val e = intercept[UnsupportedOperationException] { IcebergExport.export(cat.ops, dir) }
    assert(e.getMessage.contains("applyDeletes"))

    cat.ops.applyDeletes(spark, dir)
    val f1 = IcebergExport.export(cat.ops, dir)
    assert(cat.ops.store.exists(f1))
    // a later commit re-exports at a higher metadata version
    spark.sql("INSERT INTO graft.ice.m VALUES (3,'c')")
    val f2 = IcebergExport.export(cat.ops, dir)
    assert(f2 != f1 && cat.ops.store.exists(f2))
    val n2 = mapper.readTree(cat.ops.store.readString(f2))
    val snapsAfter = n2.get("snapshots").elements().asScala.toSeq
    assert(snapsAfter.nonEmpty && n2.get("last-sequence-number").asLong() >= 3L)
  }

  test("delete-bearing export: spec v2 delete files + content=1 manifests") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ice")
    spark.sql("CREATE TABLE graft.ice.d (id BIGINT, v STRING)")
    spark.sql("""INSERT INTO graft.ice.d VALUES
      (1,'a'), (2,'b'), (3,'c'), (4,'d')""")
    spark.sql("INSERT INTO graft.ice.d VALUES (5,'e'), (6,'f')")
    val dir = new Path(s"$warehouse/ice/d")
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    cat.ops.mergeOnReadDelete(spark, dir, Seq(2L).toDF("id"))   // equality
    cat.ops.positionalDelete(spark, dir, col("id") === 4L)      // coordinates
    cat.ops.deletionVectorDelete(spark, dir, col("id") === 5L)  // bitmap
    val expectLive = Seq(1L, 3L, 6L)
    assert(spark.sql("SELECT id FROM graft.ice.d ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == expectLive)

    val metaFile = IcebergExport.export(cat.ops, dir, Some(spark))
    val n = mapper.readTree(cat.ops.store.readString(metaFile))
    val current = n.get("snapshots").elements().asScala.toSeq.find(
      _.get("snapshot-id").asLong() == n.get("current-snapshot-id").asLong()).get

    // ---- manifest list: one data + one delete manifest record ----
    val (mlRecs, _, _) =
      IcebergExport.readAvro(cat.ops, new Path(current.get("manifest-list").asText()))
    val byContent = mlRecs.groupBy(_.get("content").asInstanceOf[Int])
    assert(byContent.keySet == Set(0, 1), s"want data+delete manifests: $byContent")
    val delMl = byContent(1).head
    assert(delMl.get("min_sequence_number").asInstanceOf[Long] >= 3L,
      "delete manifest floor = oldest delete commit sequence")

    // ---- delete manifest: content kinds, equality_ids, spec files ----
    val (dRecs, dMeta, dSchema) = IcebergExport.readAvro(
      cat.ops, new Path(delMl.get("manifest_path").toString))
    assert(dMeta("content") == "deletes")
    def fieldId(s: org.apache.avro.Schema, name: String): Int =
      s.getField(name).getObjectProp("field-id").asInstanceOf[Number].intValue()
    assert(fieldId(dSchema.getField("data_file").schema(), "equality_ids") == 135)
    val dFiles = dRecs.map(_.get("data_file")
      .asInstanceOf[org.apache.avro.generic.GenericRecord])
    // eq delete -> content=2 with equality_ids = [id of `id`]; the two
    // positional flavors (coordinates + bitmap) -> content=1
    val eqs = dFiles.filter(_.get("content").asInstanceOf[Int] == 2)
    val poss = dFiles.filter(_.get("content").asInstanceOf[Int] == 1)
    assert(eqs.size == 1 && poss.size == 2, s"delete files: $dFiles")
    assert(eqs.head.get("equality_ids").asInstanceOf[java.util.List[_]]
      .asScala.map(_.asInstanceOf[Number].intValue()).toSeq == Seq(1))
    assert(eqs.head.get("record_count").asInstanceOf[Long] == 1L)

    // spec positional-delete files: file_path/pos columns, absolute
    // existing data paths, in-range ordinals
    val dataPaths = {
      val dataMl = byContent(0).head
      val (mRecs, _, _) = IcebergExport.readAvro(
        cat.ops, new Path(dataMl.get("manifest_path").toString))
      mRecs.map(_.get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericRecord])
        .map(df => df.get("file_path").toString ->
          df.get("record_count").asInstanceOf[Long]).toMap
    }
    // equality deletes stay unbounded (global application is the
    // Java-reader rule for unpartitioned eq deletes)
    assert(eqs.head.get("lower_bounds") == null && eqs.head.get("upper_bounds") == null)
    poss.foreach { pf =>
      val specFile = pf.get("file_path").toString
      assert(cat.ops.store.exists(new Path(specFile)))
      val pairs = spark.read.parquet(specFile)
      assert(pairs.columns.toSeq == Seq("file_path", "pos"))
      // ADVICE r11: every position-delete entry is path-bounded to its
      // single referenced data file (lower == upper == that path) so
      // iceberg-java DeleteFileIndex applies it by path, not partition
      def bound(name: String): String = {
        val kvs = pf.get(name).asInstanceOf[java.util.List[_]].asScala
        assert(kvs.size == 1)
        val kv = kvs.head.asInstanceOf[org.apache.avro.generic.GenericRecord]
        assert(kv.get("key").asInstanceOf[Int] == 2147483546)
        val bb = kv.get("value").asInstanceOf[java.nio.ByteBuffer]
        new String(bb.array(), bb.position(), bb.remaining(), "UTF-8")
      }
      val refs = pairs.select("file_path").distinct()
        .collect().map(_.getString(0)).toSeq
      assert(refs.size == 1, s"split delete file references one data file: $refs")
      assert(bound("lower_bounds") == refs.head && bound("upper_bounds") == refs.head)
      pairs.collect().foreach { r =>
        val (f, p) = (r.getString(0), r.getLong(1))
        assert(dataPaths.contains(f), s"pos delete names unknown data file $f")
        assert(p >= 0 && p < dataPaths(f), s"ordinal $p out of range for $f")
      }
      assert(pairs.count() == pf.get("record_count").asInstanceOf[Long])
    }

    // an external engine's resolution (read data files, subtract eq
    // keys and positional coordinates) yields graft's visible rowset
    import org.apache.spark.sql.functions.{input_file_name, regexp_replace}
    val raw = spark.read.parquet(dataPaths.keys.toSeq: _*)
      .withColumn("_f", regexp_replace(input_file_name(), "^file:/+", "/"))
    val eqKeys = spark.read.parquet(eqs.head.get("file_path").toString)
    val posPairs = poss.map(pf =>
        spark.read.parquet(pf.get("file_path").toString))
      .reduce(_ unionAll _)
      .groupBy("file_path").count()
    // per-file dead counts match; surviving ids match via anti joins
    val lively = raw.join(eqKeys, Seq("id"), "left_anti")
    assert(lively.count() == 5L, "equality delete kills exactly one row")
    val deadTotal = posPairs.agg(org.apache.spark.sql.functions.sum("count"))
      .collect().head.getLong(0)
    assert(deadTotal == 2L, "two positional ordinals dead (pos + dv)")
  }

  test("a DV spanning many data files exports as one path-bounded delete file per data file") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ice")
    spark.sql("CREATE TABLE graft.ice.dsplit (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.ice.dsplit VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("INSERT INTO graft.ice.dsplit VALUES (4,'d'), (5,'e')")
    spark.sql("INSERT INTO graft.ice.dsplit VALUES (6,'f'), (7,'g')")
    val dir = new Path(s"$warehouse/ice/dsplit")
    import org.apache.spark.sql.functions.col
    // one DV commit whose bitmap set touches all three data files
    cat.ops.deletionVectorDelete(spark, dir, col("id") % 2 === 1)
    assert(spark.sql("SELECT count(*) FROM graft.ice.dsplit")
      .collect().head.getLong(0) == 3L)

    val metaFile = IcebergExport.export(cat.ops, dir, Some(spark))
    val n = mapper.readTree(cat.ops.store.readString(metaFile))
    val current = n.get("snapshots").elements().asScala.toSeq.find(
      _.get("snapshot-id").asLong() == n.get("current-snapshot-id").asLong()).get
    val (mlRecs, _, _) =
      IcebergExport.readAvro(cat.ops, new Path(current.get("manifest-list").asText()))
    val delMl = mlRecs.filter(_.get("content").asInstanceOf[Int] == 1).head
    val (dRecs, _, _) = IcebergExport.readAvro(
      cat.ops, new Path(delMl.get("manifest_path").toString))
    val poss = dRecs.map(_.get("data_file")
      .asInstanceOf[org.apache.avro.generic.GenericRecord])
      .filter(_.get("content").asInstanceOf[Int] == 1)
    // the single graft DV file split into one spec file per distinct
    // referenced data file (how many data files hold odd ids depends
    // on insert parallelism — derive it from the exported rows)
    def boundOf(pf: org.apache.avro.generic.GenericRecord, name: String): String = {
      val kv = pf.get(name).asInstanceOf[java.util.List[_]].asScala.head
        .asInstanceOf[org.apache.avro.generic.GenericRecord]
      val bb = kv.get("value").asInstanceOf[java.nio.ByteBuffer]
      new String(bb.array(), bb.position(), bb.remaining(), "UTF-8")
    }
    val referenced = poss.flatMap(pf =>
      spark.read.parquet(pf.get("file_path").toString)
        .select("file_path").distinct().collect().map(_.getString(0))).toSet
    assert(poss.size == referenced.size && poss.size >= 2,
      s"one spec delete file per referenced data file: ${poss.size} vs $referenced")
    val bounds = poss.map(pf => boundOf(pf, "lower_bounds")).toSet
    assert(bounds == referenced, s"bounds must equal the referenced data files: $bounds")
    poss.foreach { pf =>
      assert(boundOf(pf, "lower_bounds") == boundOf(pf, "upper_bounds"))
      val rows = spark.read.parquet(pf.get("file_path").toString)
      val inFile = rows.select("file_path").distinct().collect().map(_.getString(0)).toSeq
      assert(inFile == Seq(boundOf(pf, "lower_bounds")),
        "file content matches its manifest bound")
      assert(rows.count() == pf.get("record_count").asInstanceOf[Long])
    }
    // resolution check: subtracting each bounded file's ordinals from
    // its OWN data file (unreferenced data files untouched) leaves
    // exactly the even ids
    val deadByFile = poss.map(pf => boundOf(pf, "lower_bounds") ->
      spark.read.parquet(pf.get("file_path").toString)
        .collect().map(_.getLong(1)).toSet).toMap
    val allData = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
      .filter(_.isData).map(_.path)
    val survivors = allData.flatMap { dataPath =>
      val dead = deadByFile.getOrElse(dataPath, Set.empty[Long])
      spark.read.parquet(dataPath).collect().zipWithIndex
        .filterNot { case (_, i) => dead.contains(i.toLong) }
        .map(_._1.getLong(0))
    }
    assert(survivors.sorted.toSeq == Seq(2L, 4L, 6L))
  }

  test("pending DVs also export as Iceberg v3 Puffin delete-vector-v1 blobs") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ice")
    spark.sql("CREATE TABLE graft.ice.dvp (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.ice.dvp VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("INSERT INTO graft.ice.dvp VALUES (4,'d'), (5,'e')")
    val dir = new Path(s"$warehouse/ice/dvp")
    import org.apache.spark.sql.functions.col
    // two DV commits so the export must OR-merge per data file
    cat.ops.deletionVectorDelete(spark, dir, col("id") === 1L)
    cat.ops.deletionVectorDelete(spark, dir, col("id").isin(3L, 4L))
    IcebergExport.export(cat.ops, dir, Some(spark))

    val snapId = cat.ops.load(dir).get._2.currentSnapshotId.get
    val pf = new Path(s"$warehouse/ice/dvp/iceberg/metadata/dvs-$snapId.puffin")
    assert(cat.ops.store.exists(pf), s"v3 DV puffin missing: $pf")
    val fs = cat.ops.store.fs(pf)
    val len = fs.getFileStatus(pf).getLen.toInt
    val bytes = { val in = fs.open(pf)
      try { val b = new Array[Byte](len); in.readFully(0, b); b } finally in.close() }

    // container layout: header magic .. blobs .. Magic payload LEsize flags Magic
    def str(off: Int, n: Int) = new String(bytes.slice(off, off + n), "UTF-8")
    assert(str(0, 4) == "PFA1" && str(len - 4, 4) == "PFA1")
    val psize = java.nio.ByteBuffer.wrap(bytes, len - 12, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    assert(bytes.slice(len - 8, len - 4).toSeq == Seq[Byte](0, 0, 0, 0), "uncompressed flags")
    val payload = mapper.readTree(str(len - 12 - psize, psize))
    val blobs = payload.get("blobs").elements().asScala.toSeq
    assert(blobs.nonEmpty && blobs.forall(_.get("type").asText() == "delete-vector-v1"))

    val dataFiles = cat.ops.resolveEntries(dir, cat.ops.load(dir).get._2)
      .filter(_.isData).map(_.path).toSet
    var totalCard = 0L
    blobs.foreach { b =>
      val off = b.get("offset").asInt()
      val blen = b.get("length").asInt()
      // blob layout: 4B BE length of (magic+vector), magic D1 D3 39 64,
      // portable-64 roaring vector, 4B BE CRC-32 over magic+vector
      val bb = java.nio.ByteBuffer.wrap(bytes, off, blen)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      val combined = bb.getInt
      assert(combined == blen - 8, s"length prefix: $combined vs ${blen - 8}")
      assert((bytes(off + 4) & 0xff) == 0xD1 && (bytes(off + 5) & 0xff) == 0xD3 &&
             bytes(off + 6) == 0x39 && bytes(off + 7) == 0x64, "DV blob magic")
      val vec = bytes.slice(off + 8, off + blen - 4)
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, off + 4, 4 + vec.length)
      val stored = java.nio.ByteBuffer.wrap(bytes, off + blen - 4, 4)
        .order(java.nio.ByteOrder.BIG_ENDIAN).getInt
      assert(stored == crc.getValue.toInt, "CRC-32 over magic+vector")
      val bm = graft.catalog.DeletionVectors.deserialize(vec)
      val props = b.get("properties")
      assert(bm.getLongCardinality == props.get("cardinality").asText().toLong)
      assert(dataFiles.contains(props.get("referenced-data-file").asText()),
        s"blob must reference a live data file: ${props.get("referenced-data-file")}")
      totalCard += bm.getLongCardinality
    }
    // both DV commits merged: 3 dead ordinals across the data files,
    // at most one blob (vector) per referenced data file
    assert(totalCard == 3L, s"merged cardinality: $totalCard")
    val refs = blobs.map(_.get("properties").get("referenced-data-file").asText())
    assert(refs.distinct.size == refs.size, "one DV blob per data file (v3 rule)")
  }

  test("export writes a Puffin statistics file registered in metadata.json") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ice")
    spark.sql("CREATE TABLE graft.ice.pf (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.ice.pf VALUES (1,'a'), (2,'b'), (7,'c')")
    val dir = new Path(s"$warehouse/ice/pf")
    val metaFile = IcebergExport.export(cat.ops, dir)
    val n = mapper.readTree(cat.ops.store.readString(metaFile))

    // statistics entry per the spec's table-metadata field
    val st = n.get("statistics").get(0)
    assert(st.get("snapshot-id").asLong() == n.get("current-snapshot-id").asLong())
    val pfPath = new Path(st.get("statistics-path").asText())
    assert(cat.ops.store.exists(pfPath))

    // raw bytes follow the Puffin layout: header magic, blob, footer =
    // Magic + payload + LE size + flags + Magic
    val in = cat.ops.store.fs(pfPath).open(pfPath)
    val bytes = try {
      val buf = new Array[Byte](st.get("file-size-in-bytes").asInt())
      in.readFully(0, buf); buf
    } finally in.close()
    assert(bytes.length == st.get("file-size-in-bytes").asLong())
    def magic(off: Int) = new String(bytes.slice(off, off + 4), "UTF-8")
    assert(magic(0) == "PFA1", "header magic")
    assert(magic(bytes.length - 4) == "PFA1", "footer terminal magic")
    val payloadSize = java.nio.ByteBuffer.wrap(bytes, bytes.length - 12, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val footerSize = 4 + payloadSize + 4 + 4 + 4
    assert(st.get("file-footer-size-in-bytes").asInt() == footerSize)
    assert(magic(bytes.length - footerSize) == "PFA1", "footer leading magic")
    val payload = new String(
      bytes.slice(bytes.length - 12 - payloadSize, bytes.length - 12), "UTF-8")
    val fm = mapper.readTree(payload)
    val blobMeta = fm.get("blobs").get(0)
    assert(blobMeta.get("type").asText() == "graft-column-stats-v1")

    // the blob slice decodes to the manifest's column rollup
    val off = blobMeta.get("offset").asInt()
    val len = blobMeta.get("length").asInt()
    val blob = mapper.readTree(new String(bytes.slice(off, off + len), "UTF-8"))
    assert(blob.get("id").get("min").asText() == "1")
    assert(blob.get("id").get("max").asText() == "7")
    assert(blob.get("id").get("null-count").asLong() == 0L)
    // blob-metadata in metadata.json matches the footer's copy
    assert(st.get("blob-metadata").get(0) == blobMeta)
  }

  test("round-trip with pending deletes: import replays delete snapshots, rows intact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ice")
    spark.sql("CREATE TABLE graft.ice.rd (id BIGINT, v STRING)")
    spark.sql("INSERT INTO graft.ice.rd VALUES (1,'a'), (2,'b'), (3,'c')")
    spark.sql("INSERT INTO graft.ice.rd VALUES (4,'d'), (5,'e')")
    val dir = new Path(s"$warehouse/ice/rd")
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    cat.ops.mergeOnReadDelete(spark, dir, Seq(1L).toDF("id"))
    cat.ops.deletionVectorDelete(spark, dir, col("id") === 4L)
    // delete-then-reinsert: the reinserted key must stay visible
    // through the round-trip (sequence ordering preserved on replay)
    spark.sql("INSERT INTO graft.ice.rd VALUES (1,'back')")
    val want = spark.sql("SELECT id, v FROM graft.ice.rd ORDER BY id, v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(want == Seq((1L, "back"), (2L, "b"), (3L, "c"), (5L, "e")))

    val metaFile = IcebergExport.export(cat.ops, dir, Some(spark))
    val target = new Path(s"$warehouse/ice/rd_imported")
    // spark-less import of a delete-bearing export must refuse
    val e = intercept[UnsupportedOperationException] {
      IcebergImport.importTable(cat.ops, metaFile, new Path(s"$warehouse/ice/rd_x"))
    }
    assert(e.getMessage.contains("SparkSession"))

    val imported = IcebergImport.importTable(cat.ops, metaFile, target, Some(spark))
    val got = cat.ops.read(spark, target).orderBy("id", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == want, "imported MOR state resolves to the source rowset")

    // the replayed lineage carries graft delete snapshots (CDC works)
    assert(imported.snapshots.exists(s =>
      s.operation == "eq-delete" || s.operation == "pos-delete"))
    val feed = cat.ops.changes(spark, target, 0L, Long.MaxValue).collect()
    assert(feed.count(_.getString(2) == "delete") == 2,
      s"imported CDC must emit the eq + pos deletes: ${feed.toSeq}")

    // time travel to the pre-delete snapshot shows all five rows
    val firstTwo = imported.snapshots.sortBy(_.sequenceNumber).take(2)
    assert(cat.ops.read(spark, target,
      snapshotId = Some(firstTwo.last.snapshotId)).count() == 5L)
  }

  test("C57+C65: pending DV keeps spec-1 data manifests; delete manifest is global spec-0") {
    import org.apache.spark.sql.functions.{col, expr}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ice")
    spark.sql("""CREATE TABLE graft.ice.ptdv (id BIGINT, ts TIMESTAMP, v DOUBLE)
                 PARTITIONED BY (bucket(8, id), days(ts))""")
    val dir = new Path(s"$warehouse/ice/ptdv")
    val df = spark.range(1, 17).toDF("id")
      .withColumn("ts", expr("timestamp'2024-03-10 00:00:00' + make_interval(0,0,0,CAST(id % 3 AS INT),0,0,0)"))
      .withColumn("v", col("id").cast("double") * 1.5)
    cat.ops.write(dir, df, "append", numFiles = Some(16))
    cat.ops.deletionVectorDelete(spark, dir, col("id") === 7L || col("id") === 12L)

    val metaFile = IcebergExport.export(cat.ops, dir, Some(spark))
    val n = mapper.readTree(cat.ops.store.readString(metaFile))
    assert(n.get("default-spec-id").asInt() == 1,
      "a pending delete must no longer force the export to spec-0")

    val current = n.get("snapshots").elements().asScala.toSeq
      .find(_.get("snapshot-id").asLong() == n.get("current-snapshot-id").asLong()).get
    val (mlRecs, _, _) =
      IcebergExport.readAvro(cat.ops, new Path(current.get("manifest-list").asText()))
    val dataMl = mlRecs.filter(_.get("content").asInstanceOf[Int] == 0)
    val delMl = mlRecs.filter(_.get("content").asInstanceOf[Int] == 1)
    assert(dataMl.exists(_.get("partition_spec_id").asInstanceOf[Int] == 1),
      "spec-1 data manifests must survive a pending delete")
    // the Iceberg spec applies an UNPARTITIONED-spec delete file to
    // data files of every partition, so spec-0 delete manifests
    // compose with spec-1 data manifests
    assert(delMl.nonEmpty &&
      delMl.forall(_.get("partition_spec_id").asInstanceOf[Int] == 0),
      "delete manifests export under the unpartitioned (global) spec")
    delMl.foreach { ml =>
      val (recs, dMeta, _) =
        IcebergExport.readAvro(cat.ops, new Path(ml.get("manifest_path").toString))
      assert(dMeta("content") == "deletes" && dMeta("partition-spec-id") == "0")
      assert(recs.nonEmpty)
      recs.foreach { r =>
        val dfr = r.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
        assert(dfr.get("content") == 1, "DV materializes as a position-delete file")
      }
    }

    // round-trip: the import keeps the spec AND resolves the deletes
    val target = new Path(s"$warehouse/ice/ptdv_imported")
    val imported = IcebergImport.importTable(cat.ops, metaFile, target, Some(spark))
    val gotSpec = imported.specs.find(_.specId == imported.defaultSpecId).get.fields
    assert(gotSpec.map(_.transform) == Seq("bucket[8]", "day"))
    val got = cat.ops.read(spark, target).select("id").collect().map(_.getLong(0)).toSet
    assert(got == ((1L to 16L).toSet -- Set(7L, 12L)),
      "dead rows stay dead across the round-trip")
  }

  test("C65 round-trip: bucket(8,id) + days(ts) export the real spec, values = spec hash") {
    import org.apache.spark.sql.functions.{col, expr}
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.ice")
    spark.sql("""CREATE TABLE graft.ice.pt (id BIGINT, ts TIMESTAMP, v DOUBLE)
                 PARTITIONED BY (bucket(8, id), days(ts))""")
    val dir = new Path(s"$warehouse/ice/pt")
    // 16 rows over 3 days; one file per row ⇒ every file single-valued
    val df = spark.range(1, 17).toDF("id")
      .withColumn("ts", expr("timestamp'2024-03-10 00:00:00' + make_interval(0,0,0,CAST(id % 3 AS INT),0,0,0)"))
      .withColumn("v", col("id").cast("double") * 1.5)
    cat.ops.write(dir, df, "append", numFiles = Some(16))
    cat.ops.analyze(spark, dir) // NDV properties + Puffin carry-through below

    val metaFile = IcebergExport.export(cat.ops, dir)
    val n = mapper.readTree(cat.ops.store.readString(metaFile))

    // ---- metadata.json declares the REAL spec as the default ----
    assert(n.get("default-spec-id").asInt() == 1)
    val specs = n.get("partition-specs").elements().asScala.toSeq
      .map(s => s.get("spec-id").asInt() -> s).toMap
    assert(specs(0).get("fields").size() == 0, "spec 0 stays unpartitioned")
    val sf = specs(1).get("fields").elements().asScala.toSeq
    assert(sf.map(_.get("transform").asText()) == Seq("bucket[8]", "day"))
    assert(sf.map(_.get("name").asText()) == Seq("id", "ts"))
    assert(sf.forall(_.get("field-id").asInt() >= 1000))
    assert(n.get("last-partition-id").asInt() >= sf.map(_.get("field-id").asInt()).max)

    // ---- manifests: spec-1 entries carry real tuples; union covers all ----
    val current = n.get("snapshots").elements().asScala.toSeq
      .find(_.get("snapshot-id").asLong() == n.get("current-snapshot-id").asLong()).get
    val (mlRecs, _, _) =
      IcebergExport.readAvro(cat.ops, new Path(current.get("manifest-list").asText()))
    val bySpec = mlRecs.groupBy(_.get("partition_spec_id").asInstanceOf[Int])
    assert(bySpec.contains(1), "at least one spec-1 manifest must exist")
    var seen = Set.empty[String]
    var checkedTuples = 0
    bySpec.toSeq.flatMap(_._2).foreach { ml =>
      val specId = ml.get("partition_spec_id").asInstanceOf[Int]
      val (recs, mMeta, mSchema) =
        IcebergExport.readAvro(cat.ops, new Path(ml.get("manifest_path").toString))
      assert(mMeta("partition-spec-id") == specId.toString)
      if (specId == 1)
        assert(mapper.readTree(mMeta("partition-spec")).size() == 2)
      recs.foreach { r =>
        val dfr = r.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
        val path = dfr.get("file_path").toString
        assert(!seen.contains(path), s"file exported twice: $path")
        seen += path
        if (specId == 1) {
          val part = dfr.get("partition").asInstanceOf[org.apache.avro.generic.GenericRecord]
          // ground truth from the data file itself
          val rows = spark.read.parquet(path)
            .select(col("id"), expr("CAST(floor(unix_micros(ts) / 86400000000) AS INT)").as("d"))
            .collect()
          // Single-valued per TRANSFORM TUPLE, not per raw source column:
          // the writer clusters by partition tuple, so distinct ids that
          // bucket+day to the same tuple legitimately share a file
          // (e.g. ids 1/10 both hash to bucket 4 and share day 2024-03-11).
          val tuples = rows.map { r =>
            (graft.functions.IcebergBucket.bucket(
              graft.functions.IcebergBucket.hashLong(r.getLong(0)), 8), r.getInt(1))
          }.distinct
          assert(tuples.length == 1,
            s"spec-1 file must be single-valued per transform tuple: $path -> ${tuples.toSeq}")
          val (expectBucket, expectDay) = tuples.head
          assert(part.get("id") == expectBucket,
            s"bucket tuple must equal the Iceberg-spec hash: ${part.get("id")} vs $expectBucket")
          assert(part.get("ts") == expectDay,
            s"day tuple must be the epoch-day ordinal: ${part.get("ts")} vs $expectDay")
          // avro schema carries the spec field-ids + date logical type
          val pSchema = mSchema.getField("data_file").schema().getField("partition").schema()
          assert(pSchema.getField("id").getObjectProp("field-id")
            .asInstanceOf[Number].intValue() >= 1000)
          checkedTuples += 1
        }
      }
    }
    assert(checkedTuples > 0)
    val allLive = cat.ops.snapshotEntries(dir,
      cat.ops.load(dir).get._2.currentSnapshot.get).filter(_.isData).map(_.path).toSet
    assert(seen == allLive, "spec-1 + spec-0 manifests must cover every live file exactly once")

    // ---- import back: spec intact, stats registered, NDV carried ----
    val target = new Path(s"$warehouse/ice/pt_imported")
    val imported = IcebergImport.importTable(cat.ops, metaFile, target)
    val gotSpec = imported.specs.find(_.specId == imported.defaultSpecId).get.fields
    assert(gotSpec.map(_.transform) == Seq("bucket[8]", "day"), "spec survives the round-trip")
    assert(gotSpec.map(_.name) == Seq("id", "ts"))
    assert(imported.statistics.nonEmpty, "Puffin statistics file re-registered on import")
    assert(cat.ops.store.exists(new Path(imported.statistics.head.statistics)))
    assert(imported.properties.keys.exists(_.startsWith("graft.stats.ndv.")),
      "ANALYZE NDV properties carry through without re-analyze")
    // data still correct, and bucket pruning works on the re-import
    // (graft-written files carry __pt_ stats in their footers)
    assert(cat.ops.read(spark, target).count() == 16)
    val one = cat.ops.read(spark, target).filter(col("id") === 7L).collect()
    assert(one.length == 1 && one.head.getLong(0) == 7L)
  }
}
