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
}
