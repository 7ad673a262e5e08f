package graft

/** Storage-partitioned joins: co-partitioned catalog tables report
  * KeyGroupedPartitioning (derived from manifest stats) and join with
  * no shuffle on either side. */
class SpjSpec extends SparkSpec {

  /** Hash-partitioning exchanges in the FINAL (post-AQE) plan — the
    * executed plan is rendered after collect(), so query stages show
    * their materialized exchanges; the ORDER BY's range exchange is
    * deliberately not counted. */
  private def hashShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    "Exchange (hash|single)".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
  }

  test("co-partitioned tables join and aggregate with zero shuffles") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spj")
    spark.sql("CREATE TABLE graft.spj.a (id BIGINT, day BIGINT, x DOUBLE) PARTITIONED BY (day)")
    spark.sql("CREATE TABLE graft.spj.b (id BIGINT, day BIGINT, y DOUBLE) PARTITIONED BY (day)")
    // one insert per day value → every data file is single-valued on
    // `day`, which is what activates key-grouped reporting
    (0 to 3).foreach { d =>
      spark.sql(s"INSERT INTO graft.spj.a SELECT id, $d, id * 1.0 FROM range(0, 50)")
      spark.sql(s"INSERT INTO graft.spj.b SELECT id, $d, id * 2.0 FROM range(0, 40)")
    }

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        """SELECT a.day, count(*) AS n
          FROM graft.spj.a a JOIN graft.spj.b b ON a.day = b.day
          GROUP BY a.day ORDER BY a.day""")
      assert(joined.collect().map(_.getLong(1)).toSeq == Seq.fill(4)(2000L))
      // join AND aggregation ride the reported partitioning
      assert(hashShuffles(joined) == 0,
        s"expected no join/agg shuffle:\n${joined.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("writeValuePartitioned: one bulk write activates zero-shuffle joins") {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog]
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spj")
    spark.sql("CREATE TABLE graft.spj.va (id BIGINT, day BIGINT) PARTITIONED BY (day)")
    spark.sql("CREATE TABLE graft.spj.vb (id BIGINT, day BIGINT) PARTITIONED BY (day)")
    val df = spark.range(0, 200).selectExpr("id", "id % 4 AS day")
    cat.ops.writeValuePartitioned(new org.apache.hadoop.fs.Path(s"$warehouse/spj/va"), df)
    cat.ops.writeValuePartitioned(new org.apache.hadoop.fs.Path(s"$warehouse/spj/vb"), df)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        """SELECT a.day, count(*) AS n
          FROM graft.spj.va a JOIN graft.spj.vb b ON a.day = b.day
          GROUP BY a.day ORDER BY a.day""")
      assert(joined.collect().map(_.getLong(1)).toSeq == Seq.fill(4)(2500L))
      assert(hashShuffles(joined) == 0,
        s"bulk value-partitioned write should key-group:\n${joined.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("string partition keys key-group too") {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog]
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spj")
    spark.sql("CREATE TABLE graft.spj.sa (id BIGINT, lang STRING) PARTITIONED BY (lang)")
    spark.sql("CREATE TABLE graft.spj.sb (id BIGINT, lang STRING) PARTITIONED BY (lang)")
    val df = spark.range(0, 120).selectExpr("id", "CASE id % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END AS lang")
    cat.ops.writeValuePartitioned(new org.apache.hadoop.fs.Path(s"$warehouse/spj/sa"), df)
    cat.ops.writeValuePartitioned(new org.apache.hadoop.fs.Path(s"$warehouse/spj/sb"), df)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        """SELECT a.lang, count(*) AS n
          FROM graft.spj.sa a JOIN graft.spj.sb b ON a.lang = b.lang
          GROUP BY a.lang ORDER BY a.lang""")
      assert(joined.collect().map(_.getLong(1)).toSeq == Seq.fill(3)(1600L))
      assert(hashShuffles(joined) == 0,
        s"string keys should key-group:\n${joined.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("pending equality deletes keep the zero-shuffle plan (delete-aware SPJ)") {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog]
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spj")
    spark.sql("CREATE TABLE graft.spj.da (id BIGINT, day BIGINT) PARTITIONED BY (day)")
    spark.sql("CREATE TABLE graft.spj.db (id BIGINT, day BIGINT) PARTITIONED BY (day)")
    val df = spark.range(0, 200).selectExpr("id", "id % 4 AS day")
    val aDir = new org.apache.hadoop.fs.Path(s"$warehouse/spj/da")
    cat.ops.writeValuePartitioned(aDir, df)
    cat.ops.writeValuePartitioned(new org.apache.hadoop.fs.Path(s"$warehouse/spj/db"), df)
    // MOR-delete 10 ids from table a — the scan must apply the delete
    // AND still report key-grouped partitioning
    import spark.implicits._
    cat.ops.mergeOnReadDelete(spark, aDir, (0L until 10L).toDF("id"))

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        """SELECT a.day, count(*) AS n
          FROM graft.spj.da a JOIN graft.spj.db b ON a.day = b.day
          GROUP BY a.day ORDER BY a.day""")
      // days 0..3 each lose 2-3 of their 50 a-side rows (ids 0..9)
      val expected = (0L until 4L).map(d =>
        (50 - (0L until 10L).count(_ % 4 == d)) * 50L)
      assert(joined.collect().map(_.getLong(1)).toSeq == expected)
      assert(hashShuffles(joined) == 0,
        s"pending deletes must not cost the SPJ plan:\n${joined.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("pending positional deletes keep the zero-shuffle plan too") {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog]
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spj")
    spark.sql("CREATE TABLE graft.spj.pa (id BIGINT, day BIGINT) PARTITIONED BY (day)")
    spark.sql("CREATE TABLE graft.spj.pb (id BIGINT, day BIGINT) PARTITIONED BY (day)")
    val df = spark.range(0, 200).selectExpr("id", "id % 4 AS day")
    val aDir = new org.apache.hadoop.fs.Path(s"$warehouse/spj/pa")
    cat.ops.writeValuePartitioned(aDir, df)
    cat.ops.writeValuePartitioned(new org.apache.hadoop.fs.Path(s"$warehouse/spj/pb"), df)
    // positional delete of 10 ids — coordinates are per-(file, ordinal),
    // so the key-grouped reader must keep exact per-file ordinals while
    // merging each day's files into one partition
    cat.ops.positionalDelete(spark, aDir, org.apache.spark.sql.functions.col("id") < 10)

    // and ALSO an equality delete on top: both flavors together
    import spark.implicits._
    cat.ops.mergeOnReadDelete(spark, aDir, Seq(20L, 21L).toDF("id"))

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        """SELECT a.day, count(*) AS n
          FROM graft.spj.pa a JOIN graft.spj.pb b ON a.day = b.day
          GROUP BY a.day ORDER BY a.day""")
      val dead = (0L until 10L) ++ Seq(20L, 21L)
      val expected = (0L until 4L).map(d => (50 - dead.count(_ % 4 == d)) * 50L)
      assert(joined.collect().map(_.getLong(1)).toSeq == expected)
      assert(hashShuffles(joined) == 0,
        s"pending pos-deletes must not cost the SPJ plan:\n${joined.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("straddling files fall back to a plain shuffle plan, same result") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spj")
    spark.sql("CREATE TABLE graft.spj.c (id BIGINT, day BIGINT) PARTITIONED BY (day)" +
      " TBLPROPERTIES ('graft.write.target-file-count'='1')")
    // a single insert covering all days in one file → min != max → no
    // key-grouped reporting, plan falls back to shuffles
    spark.sql("INSERT INTO graft.spj.c SELECT id, id % 3 FROM range(0, 90)")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        """SELECT c1.day, count(*) AS n
          FROM graft.spj.c c1 JOIN graft.spj.c c2 ON c1.day = c2.day
          GROUP BY c1.day ORDER BY c1.day""")
      assert(joined.collect().map(_.getLong(1)).toSeq == Seq.fill(3)(900L))
      assert(hashShuffles(joined) > 0, "straddling files must fall back to shuffling")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("C74: co-bucketed tables join with zero shuffles through the bucket transform") {
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog]
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.spj")
    spark.sql("CREATE TABLE graft.spj.bka (k BIGINT, x DOUBLE) PARTITIONED BY (bucket(4, k))")
    spark.sql("CREATE TABLE graft.spj.bkb (k BIGINT, y DOUBLE) PARTITIONED BY (bucket(4, k))")
    val a = spark.range(0, 400).selectExpr("id % 100 AS k", "id * 1.0 AS x")
    val b = spark.range(0, 300).selectExpr("id % 100 AS k", "id * 2.0 AS y")
    cat.ops.writeValuePartitioned(new org.apache.hadoop.fs.Path(s"$warehouse/spj/bka"), a)
    cat.ops.writeValuePartitioned(new org.apache.hadoop.fs.Path(s"$warehouse/spj/bkb"), b)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.sql(
        """SELECT a.k, count(*) AS n
          FROM graft.spj.bka a JOIN graft.spj.bkb b ON a.k = b.k
          GROUP BY a.k ORDER BY a.k""")
      // oracle: per-key counts of the two modulo ranges
      val expected = (0L until 100L).map(k => (k, 4L * 3L)).toMap
      assert(joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == expected)
      // the join aligns on bucket(4, k) across both sides — no
      // exchange for join OR aggregation
      assert(hashShuffles(joined) == 0,
        s"expected bucket-transform SPJ, got:\n${joined.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
