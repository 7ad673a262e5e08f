package graft

import org.apache.spark.sql.functions._

/** Native CosineSimilarity expression: interpreted vs codegen paths,
  * SQL registration, type checking, and equivalence with the
  * higher-order-function formulation. Plus the Iceberg-spec bucket
  * hash pinned to the spec's own Appendix-B test vectors. */
class FunctionsSpec extends SparkSpec {

  import spark.implicits._

  private def hof(a: String, b: String) = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)
       / (sqrt(aggregate($a, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
          * sqrt(aggregate($b, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))""")

  test("native cosine == HOF cosine bitwise on real embeddings") {
    val e = Tables.embeddings(spark, sfDir).limit(200)
    val pairs = e.select($"vec_id".as("ia"), $"embedding".as("ea"))
      .crossJoin(e.select($"vec_id".as("ib"), $"embedding".as("eb")))
      .filter($"ia" < $"ib").limit(5000)
    val diff = pairs
      .select(graft.pipeline.Vectors.cosine("ea", "eb").as("native"), hof("ea", "eb").as("h"))
      .filter($"native" =!= $"h")
      .count()
    assert(diff == 0, "native and HOF must agree bitwise")
  }

  test("graft_cosine is callable from SQL via extensions") {
    Tables.embeddings(spark, sfDir).limit(10).createOrReplaceTempView("emb10")
    val v = spark.sql(
      "SELECT graft_cosine(a.embedding, b.embedding) AS c FROM emb10 a JOIN emb10 b ON a.vec_id < b.vec_id")
      .collect().map(_.getDouble(0))
    assert(v.nonEmpty && v.forall(c => c >= -1.0001 && c <= 1.0001))
    // self-similarity is exactly 1
    val self = spark.sql("SELECT graft_cosine(embedding, embedding) AS c FROM emb10")
      .collect().map(_.getDouble(0))
    assert(self.forall(math.abs(_) - 1.0 < 1e-12))
  }

  test("codegen and interpreted paths agree") {
    val e = Tables.embeddings(spark, sfDir).limit(100)
      .select($"embedding".as("ea"), reverse($"embedding").as("eb"))
    val withCodegen = e.select(graft.pipeline.Vectors.cosine("ea", "eb")).collect().map(_.getDouble(0))
    val old = spark.conf.getOption("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = e.select(graft.pipeline.Vectors.cosine("ea", "eb")).collect().map(_.getDouble(0))
      assert(withCodegen.toSeq == interpreted.toSeq)
    } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
  }

  test("type check rejects non-float arrays") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array(1L, 2L), array(1L, 2L))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array") ||
      err.getMessage.contains("graft_cosine"))
  }

  test("production hash mode: xxhash64 dedup signatures, same near-dup behavior") {
    import graft.functions.TextHashes
    // Signatures come from single-row local evals so executor threads
    // can't observe a torn mode (the mode is JVM-global by design:
    // one mode per dedup run).
    def sims(): (Long, Long, Array[Long], Array[Long]) = {
      // long docs + one-word edit → shingle Jaccard ≈ 0.97, so ≥1 of
      // the 8 LSH bands collides with near-certainty in any hash family
      val base = (1 to 40).map(i => s"token$i").mkString(" ")
      val df = Seq(
        (s"$base alpha ending tokens here now", 1),
        (s"$base betaa ending tokens here now", 2)
      ).toDF("text", "id")
        .selectExpr(
          "graft_simhash(split(text, ' ')) AS sh",
          "graft_minhash(transform(sequence(1, greatest(length(text)-4, 1)), " +
            "i -> substr(text, i, 5))) AS mh")
        .collect()
      (df(0).getLong(0), df(1).getLong(0),
        df(0).getSeq[Long](1).toArray, df(1).getSeq[Long](1).toArray)
    }
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    def bandMatches(a: Array[Long], b: Array[Long]): Int =
      a.grouped(8).zip(b.grouped(8)).count { case (x, y) => x.sameElements(y) }

    assert(!TextHashes.productionMode)
    val (shA1, shB1, mhA1, mhB1) = sims()
    try {
      TextHashes.setProductionMode(true)
      val (shA2, shB2, mhA2, mhB2) = sims()
      // different hash family → different signatures ...
      assert(shA2 != shA1 || !mhA2.sameElements(mhA1))
      // ... same near-dup behavior: one-word-edit docs stay
      // hamming-close / band-colliding in BOTH modes
      assert(hamming(shA1, shB1) <= 15 && hamming(shA2, shB2) <= 15)
      assert(bandMatches(mhA1, mhB1) >= 1 && bandMatches(mhA2, mhB2) >= 1)
      // deterministic within the mode
      val (shA2b, _, mhA2b, _) = sims()
      assert(shA2b == shA2 && mhA2b.sameElements(mhA2))
    } finally TextHashes.setProductionMode(false)
    // oracle mode restored bit-for-bit (memo caches flushed on switch)
    val (shA3, _, mhA3, _) = sims()
    assert(shA3 == shA1 && mhA3.sameElements(mhA1))
  }

  test("IcebergBucket matches the Iceberg spec's Appendix-B hash test vectors") {
    import graft.functions.IcebergBucket._
    import java.nio.charset.StandardCharsets.UTF_8
    // int and long hash identically (ints hash AS longs)
    assert(hashLong(34L) == 2017239379)
    // string: UTF-8 bytes
    assert(hashBytes("iceberg".getBytes(UTF_8)) == 1210000089)
    // decimal 14.20: unscaled 1420, minimal two's-complement BE bytes
    assert(hashDecimal(java.math.BigInteger.valueOf(1420)) == -500754589)
    // date 2017-11-16 = 17486 days from epoch
    assert(hashLong(17486L) == -653330422)
    // time 22:31:08 = 81068000000 micros
    assert(hashLong(81068000000L) == -662762989)
    // timestamp 2017-11-16T22:31:08 = 1510871468000000 micros
    assert(hashLong(1510871468000000L) == -2047944441)
    // fixed/binary 0x00010203
    assert(hashBytes(Array[Byte](0, 1, 2, 3)) == -188683207)
    // uuid f79c3e09-677c-4bbd-a479-3f349cb785e7 (16 BE bytes)
    assert(hashUuid(java.util.UUID.fromString(
      "f79c3e09-677c-4bbd-a479-3f349cb785e7")) == 1488055340)
    // bucket projection: (hash & MaxInt) % N, always in [0, N)
    assert(bucket(hashLong(34L), 16) == 2017239379 % 16)
    assert(bucket(-500754589, 8) == ((-500754589 & Int.MaxValue) % 8))
    assert((0 until 1000).forall(i => (0 until 8).contains(bucket(hashLong(i.toLong), 8))))
  }

  test("bucket value agrees across expression eval, codegen, V2 function, and driver literal") {
    import org.apache.spark.sql.types._
    import graft.functions.{IcebergBucket, IcebergBucketExpr}
    import graft.catalog.Transforms
    val n = 8
    // distributed column path (whole-stage codegen)
    val viaCol = Tables.orders(spark, sfDir).limit(64)
      .select($"o_orderkey",
        org.apache.spark.sql.execution.datasources.GraftBridge.column(
          IcebergBucketExpr(
            org.apache.spark.sql.execution.datasources.GraftBridge.expression($"o_orderkey"),
            n)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    viaCol.foreach { case (k, b) =>
      // driver literal path (scan-pruning derive)
      assert(Transforms.bucketOf(k, n).contains(b), s"bucketOf($k) != column $b")
      // V2 FunctionCatalog path (SQL bucket())
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](n, k))
      val f = new graft.catalog.GraftFunctions.BucketBound(LongType)
      assert(f.produceResult(row) == b)
      // raw spec formula
      assert(IcebergBucket.bucket(IcebergBucket.hashLong(k), n) == b)
    }
    // strings: external String and UTF8String agree
    assert(Transforms.bucketOf("iceberg", 32) ==
      Some(IcebergBucket.bucket(1210000089, 32)))
    // null never buckets
    assert(Transforms.bucketOf(null, 8).isEmpty)
    val nullRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](8, null))
    assert(new graft.catalog.GraftFunctions.BucketBound(LongType).produceResult(nullRow) == null)
  }
}
