package graft

import org.apache.spark.sql.functions._

/** Native CosineSimilarity expression: interpreted vs codegen paths,
  * SQL registration, type checking, and equivalence with the
  * higher-order-function formulation. */
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
}
