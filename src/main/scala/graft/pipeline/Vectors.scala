package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Embedding-vector operators (SURVEY.md §2.3 L5-L7): cosine
  * similarity, near-dup pairs, brute-force and LSH-bucketed ANN.
  *
  * All vector math is native higher-order functions (`zip_with` /
  * `aggregate`) in double precision — codegen-friendly, no UDFs.
  * Scale path: the brute-force variant broadcasts the (small) query
  * set and scans candidates once; the LSH variant turns all-pairs
  * into an equi-join on (table, bucket-code) so candidate generation
  * is a shuffle, not a cross join.
  */
object Vectors {

  /** Cosine similarity of two float-array columns: the native
    * codegen'd [[graft.functions.CosineSimilarity]] expression —
    * double precision, left-to-right accumulation, bit-identical to
    * the `aggregate(zip_with(...))` formulation it replaced (and to
    * DuckDB's list_cosine_similarity element order). Built directly
    * as an Expression, so it works with or without GraftExtensions
    * registered. */
  def cosine(a: String, b: String): Column = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    org.apache.spark.sql.execution.datasources.GraftBridge.column(
      graft.functions.CosineSimilarity(UnresolvedAttribute(a), UnresolvedAttribute(b)))
  }

  /** L5 — embedding-cosine near-dup: top-100 most similar vector
    * pairs. Oracle-matched via DuckDB list_cosine_similarity. The
    * pair space is bounded by blocking on label (the coarse cluster
    * id) — at 100 TB replace the label with an LSH/IVF bucket (L7). */
  /** L16 — per-label embedding centroids (the IVF coarse-quantizer
    * building block, exposed as a first-class operator): element-wise
    * mean via posexplode → one shuffle on (label, dim). Decimal-cast
    * sums keep the result bit-identical cross-engine; the double cast
    * before decimal matches the oracle's float→double→decimal path. */
  def embedCentroids(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos").cast("long").as("dim_idx"))
      // tie-free 1e-9 quantization: floor(x·1e9) has no rounding
      // boundary (unlike a decimal cast, whose half-up tie at the 9th
      // decimal CAN fire — float32 values are dyadic rationals whose
      // decimal expansions land exactly on ...5; bit at sf0.1), the
      // long sum is exact/order-free, and the two closing divisions
      // are correctly-rounded doubles — identical in both engines.
      .agg((sum(floor(col("col").cast("double") * 1e9).cast("long"))
        .cast("double") / 1e9 / count(lit(1))).as("centroid"))
      .orderBy("label", "dim_idx")

  val embedCentroidsSql: String =
    """SELECT label, i - 1 AS dim_idx,
              CAST(SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000000) AS BIGINT))
                   AS DOUBLE) / 1000000000 / COUNT(*) AS centroid
       FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
       GROUP BY label, i ORDER BY label, dim_idx"""

  /** L19 — per-vector int8 (scalar min/max) quantization, the memory
    * lever that makes billion-vector ANN fit a cluster: 4 bytes/dim →
    * 1. Emitted as per-vector range + code checksum (the full code
    * array is an internal column; scalars keep the oracle compare
    * exact). All arithmetic is IEEE double in element order, so Spark
    * and DuckDB agree bitwise; codes are exact integers after
    * half-away rounding in both engines. Narrow transform, no
    * shuffle. */
  def embedQuantize(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .withColumn("q_min", array_min(col("embedding")).cast("double"))
      .withColumn("q_max", array_max(col("embedding")).cast("double"))
      .withColumn("code_sum", expr(
        """CAST(aggregate(embedding, 0L, (acc, x) ->
           acc + coalesce(CAST(round((CAST(x AS DOUBLE) - q_min)
                 / nullif(q_max - q_min, 0.0D) * 255D) AS BIGINT), 0L)) AS BIGINT)"""))
      .select("vec_id", "q_min", "q_max", "code_sum")
      .orderBy("vec_id")

  val embedQuantizeSql: String =
    """SELECT vec_id,
       CAST(list_min(embedding) AS DOUBLE) AS q_min,
       CAST(list_max(embedding) AS DOUBLE) AS q_max,
       CAST(list_sum(list_transform(embedding,
         x -> COALESCE(CAST(round((CAST(x AS DOUBLE) - CAST(list_min(embedding) AS DOUBLE))
              / NULLIF(CAST(list_max(embedding) AS DOUBLE)
                       - CAST(list_min(embedding) AS DOUBLE), 0) * 255)
              AS BIGINT), 0))) AS BIGINT) AS code_sum
       FROM embeddings ORDER BY vec_id"""

  def dedupEmbedCosine(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    e.select(col("vec_id").as("vec_a"), col("embedding").as("ea"), col("label").as("la"))
      .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"), col("label").as("lb")),
        col("la") === col("lb") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), round(cosine("ea", "eb"), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_a"), col("vec_b"))
      .limit(100)
  }

  val dedupEmbedCosineSql: String =
    """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
       FROM embeddings a JOIN embeddings b
         ON a.label = b.label AND a.vec_id < b.vec_id
       ORDER BY cos_sim DESC, vec_a, vec_b LIMIT 100"""

  /** L6 — brute-force cosine top-k: exact top-5 neighbors for each
    * query vector (vec_id < 10). Query side broadcast; candidate set
    * scanned once; per-query ranking via window. */
  def annBruteforceTopk(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val q = broadcast(e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    q.join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine("qv", "nv"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("sim"), 4).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  val annBruteforceTopkSql: String =
    """SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id,
              ROUND(sim, 4) AS cos_sim
       FROM (SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])) AS sim,
                    ROW_NUMBER() OVER (PARTITION BY q.vec_id
                        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])) DESC, n.vec_id) AS rank
             FROM embeddings q JOIN embeddings n ON q.vec_id != n.vec_id
             WHERE q.vec_id < 10) t
       WHERE rank <= 5 ORDER BY query_id, rank"""

  /** L7b — IVF-bucketed ANN (the second scale path besides LSH):
    * 16 deterministic centroids (lowest vec_ids — at scale, a k-means
    * pass), every vector assigned to its nearest centroid via a
    * broadcast argmax, queries probe their `nProbe` nearest cells,
    * exact cosine re-rank inside the probed cells only. Candidate
    * generation is a broadcast join + shuffle on cluster id — never a
    * corpus cross join. Oracle-matched (every step is cosine ranking,
    * which DuckDB's list_cosine_similarity replays bitwise); recall
    * additionally asserted in PipelineSpec. */
  def annIvfTopk(s: SparkSession, d: String, nProbe: Int = 3): DataFrame = {
    val e = embeddings(s, d)
    val centroids = broadcast(e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv")))

    // rank cells per vector once; vectors keep rank 1, queries keep nProbe
    val byVec = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cent_id"))
    val ranked = e.join(centroids)
      .withColumn("csim", cosine("embedding", "cv"))
      .withColumn("crank", row_number().over(byVec))
    // cache() the union of the two surviving rank slices, NARROW (ids
    // + rank only, no embeddings): assignment and probe rows both
    // derive from `ranked`, and uncached each consumer re-runs the
    // full corpus×centroid cosine pass + window.
    val cells = ranked
      .filter(col("crank") === 1 || (col("vec_id") < 10 && col("crank") <= nProbe))
      .select("vec_id", "cent_id", "crank")
      .cache()
    val assign = cells.filter(col("crank") === 1)
      .select(col("vec_id").as("neighbor_id"), col("cent_id"))
    val probes = cells.filter(col("vec_id") < 10 && col("crank") <= nProbe)
      .select(col("vec_id").as("query_id"), col("cent_id"))

    val cand = probes.join(assign, "cent_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
      .join(e.select(col("vec_id").as("query_id"), col("embedding").as("qv")), "query_id")
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")), "neighbor_id")

    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    cand.withColumn("sim", cosine("qv", "nv"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("sim"), 4).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  val annIvfTopkSql: String =
    """WITH cent AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id < 16),
       ranked AS (SELECT e.vec_id, c.cent_id,
                         ROW_NUMBER() OVER (PARTITION BY e.vec_id
                           ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                           CAST(c.cv AS DOUBLE[])) DESC,
                                    c.cent_id) AS crank
                  FROM embeddings e CROSS JOIN cent c),
       assign AS (SELECT vec_id AS neighbor_id, cent_id FROM ranked WHERE crank = 1),
       probes AS (SELECT vec_id AS query_id, cent_id FROM ranked
                  WHERE vec_id < 10 AND crank <= 3),
       cand AS (SELECT DISTINCT query_id, neighbor_id
                FROM probes JOIN assign USING (cent_id)
                WHERE query_id != neighbor_id),
       rer AS (SELECT c.query_id, c.neighbor_id,
                      list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                             CAST(n.embedding AS DOUBLE[])) AS sim,
                      ROW_NUMBER() OVER (PARTITION BY c.query_id
                        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                        CAST(n.embedding AS DOUBLE[])) DESC,
                                 c.neighbor_id) AS rank
               FROM cand c JOIN embeddings q ON c.query_id = q.vec_id
                           JOIN embeddings n ON c.neighbor_id = n.vec_id)
       SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, ROUND(sim, 4) AS cos_sim
       FROM rer WHERE rank <= 5 ORDER BY query_id, rank"""

  /** Deterministic pseudo-random hyperplane bucket code for (table,
    * plane, dim) — the cross-engine md5-prefix weights of
    * graft.functions.HyperplaneCode, so the oracle replays bucket
    * codes bit-for-bit. Native codegen'd expression. */
  private def planeCode(vecCol: String, table: Int, planes: Int): Column = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    org.apache.spark.sql.execution.datasources.GraftBridge.column(
      graft.functions.HyperplaneCode(UnresolvedAttribute(vecCol), table, planes))
  }

  /** L7 — LSH-bucketed ANN (scale path): 8 hash tables × 4 random
    * hyperplanes; candidates = vectors sharing any (table, code)
    * bucket; exact cosine re-rank inside candidates. Oracle-matched
    * (md5-derived weights + ordered list_reduce dot replay the codes);
    * PipelineSpec additionally measures recall@5 against
    * [[annBruteforceTopk]]. */
  def annLshTopk(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val tables = 8
    // ONE scan computes all 8 table codes per vector in a single
    // projection, then posexplode fans them out to (tbl, code) rows —
    // identical buckets to a per-table scan at 1/8 the scan work.
    val codes = e
      .select(col("vec_id"), col("embedding"),
        posexplode(array((0 until tables).map(t => planeCode("embedding", t, 4)): _*)))
      .select(col("vec_id"), col("embedding"), col("pos").as("tbl"), col("col").as("code"))
    val q = codes.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("tbl"), col("code"))
    // Dedup candidates on the (query, neighbor) ID pair ONLY, then
    // re-attach the embeddings — a distinct over the raw arrays would
    // shuffle every vector once per shared bucket.
    val cand = q.select("query_id", "tbl", "code")
      .join(codes.select(col("vec_id").as("neighbor_id"), col("tbl"), col("code")),
        Seq("tbl", "code"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()
      .join(e.select(col("vec_id").as("query_id"), col("embedding").as("qv")), "query_id")
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")), "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    cand.withColumn("sim", cosine("qv", "nv"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("sim"), 4).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  /** Cosine over a float-array vs double-array pair (embedding vs
    * refined centroid) — the HOF formulation, double precision,
    * left-to-right accumulation: bit-identical to DuckDB's
    * list_cosine_similarity on the same operands, which keeps the
    * k-means re-assignment ranking oracle-replayable. */
  private def cosMixed(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * y),
                  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
        / (sqrt(aggregate($a, CAST(0.0 AS DOUBLE),
                  (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
           * sqrt(aggregate($b, CAST(0.0 AS DOUBLE), (acc, y) -> acc + y * y)))""")

  /** L26 — semantic dedup: k-means clustering (deterministic seeds +
    * one Lloyd refinement) replaces L5's GIVEN label blocking with
    * LEARNED clusters, then near-dup candidates are ranked inside each
    * cluster only — the corpus-level shape when no labels exist.
    *
    * Steps, each oracle-replayable bit-for-bit:
    *  1. seeds = the k lowest vec_ids (the IVF coarse-quantizer
    *     convention, L7b);
    *  2. assign every vector to its nearest seed by cosine (broadcast
    *     argmax, no shuffle on the corpus side);
    *  3. Lloyd step: element-wise centroid means per cluster
    *     (posexplode → one shuffle on (cluster, dim); decimal-cast
    *     sums keep the refined centroids bit-identical cross-engine);
    *  4. re-assign to the nearest REFINED centroid (broadcast argmax);
    *  5. intra-cluster pair ranking: self-join on the learned cluster
    *     id, top-100 pairs by cosine.
    *
    * 100 TB shape: centroids are k×dim (broadcast side); both argmax
    * passes are broadcast joins; the only corpus shuffles are the
    * centroid aggregation and the within-cluster pair join — never an
    * all-pairs cross join. k grows with corpus size; more Lloyd
    * rounds = repeat steps 3-4 (each O(corpus) with the same plan). */
  def dedupSemantic(s: SparkSession, d: String, k: Int = 16): DataFrame =
    semanticPairs(embeddings(s, d), k)

  /** The L26 core over any `(vec_id, embedding)` frame — the spec
    * drives it with planted near-duplicates to prove recovery. */
  def semanticPairs(e: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val seeds = broadcast(e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv")))
    val assign1 = e.join(seeds)
      .withColumn("csim", cosine("embedding", "cv"))
      .withColumn("crank", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cent_id"))))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cluster0"))
    val centroids = assign1
      .select(col("cluster0"), posexplode(col("embedding")))
      .groupBy(col("cluster0"), col("pos"))
      .agg((sum(col("col").cast("double").cast(DecimalType(18, 9)))
        .cast("double") / count(lit(1))).as("cval"))
      .groupBy("cluster0")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cval")))),
        x => x.getField("cval")).as("cv2"))
    // cache(): both sides of the intra-cluster pair join read the
    // final assignment — uncached, the re-assignment pass (corpus ×
    // refined-centroid cosines + window) runs twice.
    val assign2 = e.join(broadcast(centroids.select(col("cluster0").as("cent2"), col("cv2"))))
      .withColumn("csim2", cosMixed("embedding", "cv2"))
      .withColumn("crank2", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("csim2").desc, col("cent2"))))
      .filter(col("crank2") === 1)
      .select(col("vec_id"), col("embedding"), col("cent2").as("cluster"))
      .cache()
    val a = assign2.select(col("cluster"), col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = assign2.select(col("cluster"), col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.join(b, Seq("cluster")).filter(col("vec_a") < col("vec_b"))
      .select(col("cluster"), col("vec_a"), col("vec_b"),
        round(cosine("ea", "eb"), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_a"), col("vec_b"))
      .limit(100)
  }

  val dedupSemanticSql: String =
    """WITH seeds AS (SELECT vec_id AS cent_id, embedding AS cv
                      FROM embeddings WHERE vec_id < 16),
       a1 AS (SELECT vec_id, embedding, cent_id AS cluster0 FROM (
               SELECT e.vec_id, e.embedding, s.cent_id,
                      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                        CAST(s.cv AS DOUBLE[])) DESC,
                                 s.cent_id) AS rk
               FROM embeddings e CROSS JOIN seeds s) t WHERE rk = 1),
       cent AS (SELECT cluster0, list(cval ORDER BY i) AS cv2 FROM (
                 SELECT cluster0, i,
                        CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,9)))
                             AS DOUBLE) / COUNT(*) AS cval
                 FROM a1, UNNEST(generate_series(1, len(embedding))) AS t(i)
                 GROUP BY cluster0, i) m GROUP BY cluster0),
       a2 AS (SELECT vec_id, embedding, cent2 AS cluster FROM (
               SELECT e.vec_id, e.embedding, c.cluster0 AS cent2,
                      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                        c.cv2) DESC,
                                 c.cluster0) AS rk
               FROM embeddings e CROSS JOIN cent c) t WHERE rk = 1)
       SELECT a.cluster, a.vec_id AS vec_a, b.vec_id AS vec_b,
              ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
       FROM a2 a JOIN a2 b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       ORDER BY cos_sim DESC, vec_a, vec_b LIMIT 100"""

  val annLshTopkSql: String =
    """WITH wl AS (SELECT t, p,
                          list_transform(range(0, 64), i ->
                            (CAST(('0x' || substr(md5(t || '_' || p || '_' || i), 1, 8)) AS BIGINT)
                             % 1000) / 1000.0 - 0.5) AS w
                   FROM UNNEST(range(0, 8)) AS tt(t), UNNEST(range(0, 4)) AS pp(p)),
       dots AS (SELECT e.vec_id, wl.t AS tbl, wl.p,
                       list_reduce(
                         list_transform(range(1, len(e.embedding) + 1),
                           i -> CAST(e.embedding[i] AS DOUBLE) * wl.w[i]),
                         (a, b) -> a + b) AS dot
                FROM embeddings e CROSS JOIN wl),
       codes AS (SELECT vec_id, tbl,
                        SUM(CASE WHEN dot > 0 THEN (1 << p) ELSE 0 END) AS code
                 FROM dots GROUP BY vec_id, tbl),
       cand AS (SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
                FROM codes q JOIN codes n ON q.tbl = n.tbl AND q.code = n.code
                WHERE q.vec_id < 10 AND q.vec_id != n.vec_id),
       rer AS (SELECT c.query_id, c.neighbor_id,
                      list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                             CAST(n.embedding AS DOUBLE[])) AS sim,
                      ROW_NUMBER() OVER (PARTITION BY c.query_id
                        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                        CAST(n.embedding AS DOUBLE[])) DESC,
                                 c.neighbor_id) AS rank
               FROM cand c JOIN embeddings q ON c.query_id = q.vec_id
                           JOIN embeddings n ON c.neighbor_id = n.vec_id)
       SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, ROUND(sim, 4) AS cos_sim
       FROM rer WHERE rank <= 5 ORDER BY query_id, rank"""

  /** L35 — random-projection embedding compression (Johnson-
    * Lindenstrauss): 64-dim float vectors projected to 8 dims with a
    * deterministic ±1 sign matrix derived from md5("<dim>_<proj>") —
    * the memory lever BELOW int8 quantization (L19): 8 doubles per
    * vector instead of 64 floats, with pairwise distances preserved
    * in expectation, which is all a coarse ANN pre-filter needs.
    *
    * Scale: pure map — each projection is one codegen'd
    * zip_with+aggregate fold over the row's own array; no shuffle at
    * all until the output sort. Sums fold in DECIMAL so both engines
    * agree bitwise regardless of accumulation rounding. The sign
    * matrix is never materialized — it's recomputed from md5 inside
    * the expression, so there's nothing to broadcast or keep in sync
    * at 1000 executors. */
  def embedRandproj(s: SparkSession, d: String): DataFrame = {
    val projCols = (0 until 8).map { j =>
      expr(
        s"""CAST(aggregate(
             zip_with(embedding, sequence(0, size(embedding) - 1),
               (x, i) -> CASE WHEN substr(md5(concat(CAST(i AS STRING), '_', '$j')), 1, 1) < '8'
                         THEN CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9))
                         ELSE -CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9)) END),
             CAST(0 AS DECIMAL(28,9)),
             (acc, v) -> CAST(acc + v AS DECIMAL(28,9))) AS DOUBLE)""").as(s"p$j")
    }
    embeddings(s, d).filter(col("vec_id") < 200)
      .select(col("vec_id") +: projCols: _*)
      .orderBy("vec_id")
  }

  val embedRandprojSql: String = {
    val cols = (0 until 8).map { j =>
      s"""CAST(list_sum(list_transform(embedding, (x, i) ->
            CASE WHEN substr(md5(CAST(i - 1 AS VARCHAR) || '_' || '$j'), 1, 1) < '8'
                 THEN CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9))
                 ELSE -CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9)) END)) AS DOUBLE) AS p$j"""
    }.mkString(",\n            ")
    s"""SELECT vec_id,
            $cols
       FROM embeddings WHERE vec_id < 200 ORDER BY vec_id"""
  }

  /** L36 — contrastive hard-negative mining: for each query vector,
    * the top-3 most cosine-similar vectors carrying a DIFFERENT
    * label — the pairs an embedding model trains against (similar in
    * representation space, semantically distinct). Exactly L6's
    * broadcast-scan shape plus the cross-label predicate; at corpus
    * scale the candidate side routes through the L7/L7b bucketed
    * paths first so the scan is bucket-local, with the label filter
    * unchanged as the join residual. */
  def mineHardneg(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    val q = broadcast(e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("label").as("ql")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neg_id"))
    q.join(e.select(col("vec_id").as("neg_id"), col("embedding").as("nv"),
        col("label").as("neg_label")),
        col("ql") =!= col("neg_label"))
      .withColumn("sim", cosine("qv", "nv"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("rank"), col("neg_id"),
        col("neg_label").cast("long").as("neg_label"), round(col("sim"), 4).as("cos_sim"))
      .orderBy("query_id", "rank")
  }

  val mineHardnegSql: String =
    """SELECT query_id, CAST(rank AS BIGINT) AS rank, neg_id,
              CAST(neg_label AS BIGINT) AS neg_label, ROUND(sim, 4) AS cos_sim
       FROM (SELECT q.vec_id AS query_id, n.vec_id AS neg_id, n.label AS neg_label,
                    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])) AS sim,
                    ROW_NUMBER() OVER (PARTITION BY q.vec_id
                        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[])) DESC, n.vec_id) AS rank
             FROM embeddings q JOIN embeddings n ON q.label != n.label
             WHERE q.vec_id < 20) t
       WHERE rank <= 3 ORDER BY query_id, rank"""

  /** L39 — embedding outlier detection: squared-euclidean distance of
    * every vector to its OWN label centroid, z-scored within the
    * label — the mislabeled/corrupt-vector sweep a curation pass runs
    * before training. Three shuffles total, all on small keys:
    * centroid build (label,dim), distance join on label (centroids
    * are labels×dims — broadcast), label moments. Every aggregate
    * folds per-term DECIMAL casts so sums are order-independent and
    * cross-engine exact; z is computed in double from those exact
    * moments. At corpus scale nothing here is corpus² — the heavy
    * side is one map over the vectors. */
  def embedOutliers(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = embeddings(s, d)
    // per-label centroid as an ARRAY in dim order (exact decimal mean)
    val cent = e.select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("col").cast("double").cast(DecimalType(18, 9)))
        .cast("double") / count(lit(1))).as("c"))
      .groupBy("label")
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), x -> x.c)").as("centroid"))
    // cache() the NARROW distance table (ids + dist2, embeddings
    // dropped): the label moments and the final z-score join both
    // read it — uncached, the decimal distance fold over every vector
    // runs twice.
    val dist = e.join(broadcast(cent), "label")
      .withColumn("dist2", expr(
        """CAST(aggregate(zip_with(embedding, centroid,
             (x, c) -> CAST((CAST(x AS DOUBLE) - c) * (CAST(x AS DOUBLE) - c) AS DECIMAL(28,12))),
           CAST(0 AS DECIMAL(38,12)), (acc, t) -> CAST(acc + t AS DECIMAL(38,12))) AS DOUBLE)"""))
      .select("vec_id", "label", "dist2")
      .cache()
    val moments = dist.groupBy(col("label").as("ml"))
      .agg(count(lit(1)).as("n"),
        sum(col("dist2").cast(DecimalType(30, 12))).cast("double").as("s1"),
        sum((col("dist2") * col("dist2")).cast(DecimalType(38, 10))).cast("double").as("s2"))
    dist.join(broadcast(moments), col("label") === col("ml"))
      .withColumn("mu", col("s1") / col("n"))
      .withColumn("sigma", sqrt(col("s2") / col("n") - col("mu") * col("mu")))
      .withColumn("z", (col("dist2") - col("mu")) / col("sigma"))
      .filter(col("z") > 1.5)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        round(col("dist2"), 4).as("dist2"), round(col("z"), 3).as("z"))
      .orderBy(col("z").desc, col("vec_id"))
  }

  val embedOutliersSql: String =
    """WITH cent AS (
         SELECT label, i AS dim,
                CAST(SUM(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
                  / COUNT(*) AS c
         FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
         GROUP BY label, i),
       dist AS (
         SELECT e.vec_id, e.label,
                CAST(SUM(CAST((CAST(e.embedding[cent.dim] AS DOUBLE) - cent.c)
                       * (CAST(e.embedding[cent.dim] AS DOUBLE) - cent.c)
                     AS DECIMAL(28,12))) AS DOUBLE) AS dist2
         FROM embeddings e JOIN cent ON e.label = cent.label
         GROUP BY e.vec_id, e.label),
       mom AS (
         SELECT label, COUNT(*) AS n,
                CAST(SUM(CAST(dist2 AS DECIMAL(30,12))) AS DOUBLE) AS s1,
                CAST(SUM(CAST(dist2 * dist2 AS DECIMAL(38,10))) AS DOUBLE) AS s2
         FROM dist GROUP BY label)
       SELECT d.vec_id, CAST(d.label AS BIGINT) AS label,
              ROUND(d.dist2, 4) AS dist2,
              ROUND((d.dist2 - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)), 3) AS z
       FROM dist d JOIN mom m ON d.label = m.label
       WHERE (d.dist2 - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)) > 1.5
       ORDER BY z DESC, vec_id"""
}
