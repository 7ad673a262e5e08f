package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Text-corpus operators for training-data curation (SURVEY.md §2.3):
  * dedup family + text analysis, all declarative DataFrame plans.
  *
  * Scale design: nothing here is O(n²) on the corpus. Near-dup
  * detection goes shingle→(minhash band | shared-shingle) equi-join,
  * i.e. a shuffle on short keys, with pair verification only inside
  * buckets — the standard way to make near-dup work at 100 TB.
  */
object TextPipeline {

  /** Words of a single-space-separated document. */
  private val ws: Column = split(col("text"), " ")

  private def graftExpr(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.execution.datasources.GraftBridge.column(e)
  private def colExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.execution.datasources.GraftBridge.expression(c)

  private def withWords(df: DataFrame): DataFrame = df.withColumn("ws", ws)

  /** Word 3-gram shingles, distinct per doc: (doc_id, s).
    * The `.distinct()` looks removable (per-doc dedup is a within-row
    * property — `array_distinct` before the explode computes the same
    * rows with zero exchanges), and r15 measured that variant: it was
    * bench-NEUTRAL to slightly worse. Two reasons the exchange earns
    * its keep: distinct's partial aggregate already dedups map-side,
    * so the shuffle moves no duplicate rows; and the exchange is what
    * gives the downstream caches balanced partitions when the scan
    * side has few splits (every consumer — df count, anti join, pair
    * self-join — reads the cached shingles several times, so balance
    * there dominates one avoided exchange). Kept deliberately. */
  def shingles(docs: DataFrame): DataFrame =
    withWords(docs)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, greatest(size(ws) - 2, 0)), i -> concat_ws(' ', slice(ws, i, 3)))")).as("s"))
      .distinct()

  /** Document-frequency ceiling for gram pair joins (L4, L32): a gram
    * present in more than this many documents is dropped BEFORE any
    * pair join. Per-gram pair fanout is df², so without a ceiling one
    * stopword-class gram ("of the and") in 90% of a 100-TB corpus
    * makes the shuffle quadratic in corpus size; with it, fanout per
    * gram is bounded at CEILING² regardless of scale — the standard
    * prefix/df-filtering move from the set-similarity-join literature
    * (Bayardo et al. WWW'07). Stopword grams carry no near-dup signal,
    * so the audit loses nothing it cares about. Both the Spark plans
    * and the DuckDB oracles apply the identical ceiling. */
  val GramDfCeiling = 64

  /** Keep only grams whose document frequency is within
    * [[GramDfCeiling]]. Input must be distinct (doc_id, s) rows; it is
    * cached because both the df count and the anti join scan it — the
    * groupBy (map-side combined) + anti-join shape stays skew-safe at
    * scale, unlike a per-gram window that would funnel a hot gram's
    * rows through one task. */
  private def dfCapped(sh: DataFrame): DataFrame = {
    val cached = sh.cache()
    val hot = cached.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") > GramDfCeiling)
    cached.join(hot, Seq("s"), "left_anti")
  }

  /** L1 — exact dedup accounting by content hash (md5). */
  def dedupExact(s: SparkSession, d: String): DataFrame =
    documents(s, d).groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           countDistinct(md5(col("text"))).as("n_distinct"))
      .orderBy("source")

  val dedupExactSql: String =
    """SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT md5(text)) AS n_distinct
       FROM documents GROUP BY source ORDER BY source"""

  /** L4 — n-gram Jaccard similarity: top-50 most similar doc pairs.
    * Shared-shingle equi-join (shuffle on shingle) — never a cross
    * join — over the [[GramDfCeiling]]-capped gram universe, so a hot
    * gram's df² fanout is bounded regardless of corpus size. Jaccard
    * is computed consistently over the capped universe (both the
    * shared counts and the per-doc sizes), mirrored exactly in the
    * DuckDB oracle. */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    val sh = dfCapped(shingles(documents(s, d))).cache()
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("x")
      .join(sh.as("y"), col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sz.select(col("doc_id"), col("n").as("na")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(sz.select(col("doc_id"), col("n").as("nb")), col("doc_b") === col("doc_id")).drop("doc_id")
      .select(col("doc_a"), col("doc_b"), col("shared"),
        (col("shared").cast("double") / (col("na") + col("nb") - col("shared"))).as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(50)
  }

  val ngramJaccardSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       sh0 AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s
               FROM w, UNNEST(range(1, GREATEST(len(ws) - 1, 1))) AS t(i)),
       sh AS (SELECT * FROM sh0 WHERE s NOT IN
                (SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) > 64)),
       sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       p AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS shared
             FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
             GROUP BY 1, 2)
       SELECT doc_a, doc_b, shared,
              CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
       FROM p JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
       ORDER BY jaccard DESC, doc_a, doc_b LIMIT 50"""

  /** L2 — MinHash + LSH near-dup: 64 hash permutations, 8 bands × 8
    * rows; candidate pairs from band-bucket equi-join, verified with
    * exact Jaccard computed from the per-doc shingle sets (set
    * intersect on the FEW candidate pairs — never a corpus-wide
    * shared-shingle pair aggregation). Every hash is the cross-engine
    * md5 prefix and buckets are the literal band value strings, so the
    * DuckDB oracle reproduces the candidate set exactly — this is
    * hash-matched at the driver, not rows-only. MinHashSpec
    * additionally asserts candidate recall against [[ngramJaccard]]. */
  /** LSH band table of a (doc_id, sh: shingle set) frame: 8 bands × 8
    * minhash rows per doc, bucket = the literal band value string.
    * Shared by L2 (symmetric self-join) and L48 (asymmetric
    * incoming-vs-corpus probe). Public because the production L48
    * deployment persists THIS frame as a catalog table (partitioned by
    * band) and probes it incrementally — PipelineSpec proves that
    * round-trip. */
  def bandsOf(docsets: DataFrame): DataFrame =
    docsets
      .withColumn("sig", graftExpr(graft.functions.MinHashSig(colExpr(col("sh")))))
      .select(col("doc_id"),
        posexplode(expr("transform(sequence(0, 7), b -> concat_ws('|', slice(sig, b * 8 + 1, 8)))")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    val docsets = shingles(documents(s, d))
      .groupBy("doc_id").agg(collect_set(col("s")).as("sh"))
      .cache()
    // Native MinHashSig expression: one base hash per shingle + 64
    // affine permutations mod 2^31-1 in a single fused codegen loop
    // (see graft.functions.MinHashSig for the md5-derived recipe).
    // cache(): both sides of the band-bucket self-join read the band
    // table — uncached, every doc's 64-permutation signature is
    // computed twice (docsets is cached, but the sig projection above
    // it is not shared across join branches).
    val bands = bandsOf(docsets).cache()
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(docsets.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(docsets.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .withColumn("shared", size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .select(col("doc_a"), col("doc_b"),
        round(col("shared").cast("double") / (size(col("sha")) + size(col("shb")) - col("shared")), 4).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
  }

  /** The L2 candidate-pair pipeline as shared CTEs (ends with
    * `lsh_pairs(doc_a, doc_b, jaccard)`), reused verbatim by the L46
    * threshold-curve oracle so both gates verify the SAME pair set. */
  private val minhashPairsCtes: String =
    """w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s
              FROM w, UNNEST(range(1, GREATEST(len(ws) - 1, 1))) AS t(i)),
       base AS (SELECT doc_id, s,
                       CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) % 2147483647 AS b
                FROM sh),
       perm AS (SELECT j,
                       (CAST(('0x' || substr(md5('a' || j), 1, 8)) AS BIGINT) % 2147483646) + 1 AS a,
                       CAST(('0x' || substr(md5('b' || j), 1, 8)) AS BIGINT) % 2147483647 AS bb
                FROM UNNEST(range(0, 64)) AS t(j)),
       sig AS (SELECT doc_id, j, MIN((b * a + bb) % 2147483647) AS m
               FROM base, perm GROUP BY doc_id, j),
       bands AS (SELECT doc_id, j // 8 AS band,
                        string_agg(CAST(m AS VARCHAR), '|' ORDER BY j) AS bucket
                 FROM sig GROUP BY doc_id, j // 8),
       cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                FROM bands x JOIN bands y
                  ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id),
       sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       shared AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS shared
                  FROM cand c
                  JOIN sh xa ON xa.doc_id = c.doc_a
                  JOIN sh xb ON xb.doc_id = c.doc_b AND xa.s = xb.s
                  GROUP BY c.doc_a, c.doc_b),
       lsh_pairs AS (
         SELECT s.doc_a, s.doc_b,
                round(CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared), 4) AS jaccard
         FROM shared s JOIN sz sa ON s.doc_a = sa.doc_id JOIN sz sb ON s.doc_b = sb.doc_id
         WHERE round(CAST(s.shared AS DOUBLE) / (sa.n + sb.n - s.shared), 4) >= 0.2)"""

  val minhashLshSql: String =
    s"""WITH $minhashPairsCtes
       SELECT doc_a, doc_b, jaccard FROM lsh_pairs
       ORDER BY jaccard DESC, doc_a, doc_b"""

  /** L3 — SimHash near-dup: 60-bit signature from unigram md5-prefix
    * hashes (cross-engine — see TextHashes), pigeonhole banding on
    * 4×15-bit chunks, pairs within Hamming ≤ 12. Oracle-matched: the
    * DuckDB mirror recomputes signatures bit-for-bit from md5. */
  def simhash(s: SparkSession, d: String): DataFrame = {
    // Signature packed into ONE long (bit b of votes → bit b of sig):
    // the banding join then shuffles 16 bytes per row instead of a
    // 64-element array, and hamming = bit_count(xor) is a single
    // codegen'd instruction instead of a 64-wide zip_with aggregate.
    // Chunk keys are a bijection of the bit-slices, so buckets —
    // and therefore the emitted pairs — are identical.
    // cache(): both sides of the banding self-join read this frame —
    // uncached, Spark re-scans documents and recomputes every SimHash
    // signature once per side (subplans are never shared across join
    // branches). One signature pass instead of two.
    val sigs = withWords(documents(s, d))
      .withColumn("sig",
        graftExpr(graft.functions.SimHash64(colExpr(array_distinct(col("ws"))))))
      .select(col("doc_id"), col("sig"),
        posexplode(expr("transform(sequence(0, 3), c -> shiftright(sig, c * 15) & 32767)")))
      .withColumnRenamed("pos", "chunk_idx").withColumnRenamed("col", "chunk")
      .cache()
    // Hamming cut INSIDE the join condition: non-near pairs die at the
    // probe side of the bucket join instead of being shuffled into the
    // distinct (hamming is a pure function of the pair, so filtering
    // before vs after distinct is equivalent).
    val pairs = sigs.as("x")
      .join(sigs.as("y"),
        col("x.chunk_idx") === col("y.chunk_idx") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id") &&
          expr("bit_count(x.sig ^ y.sig) <= 12"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("CAST(bit_count(x.sig ^ y.sig) AS BIGINT)").as("hamming"))
      .distinct()
    pairs.orderBy(col("hamming"), col("doc_a"), col("doc_b"))
  }

  val simhashSql: String =
    """WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents),
       wd AS (SELECT doc_id, unnest(ws) AS word FROM w),
       h AS (SELECT doc_id, CAST(('0x' || substr(md5(word), 1, 15)) AS BIGINT) AS hw FROM wd),
       bits AS (SELECT doc_id, b,
                       SUM(CASE WHEN (hw >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
                FROM h, UNNEST(range(0, 60)) AS t(b) GROUP BY doc_id, b),
       sig AS (SELECT doc_id,
                      SUM(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS sig
               FROM bits GROUP BY doc_id),
       chunks AS (SELECT doc_id, sig, c, (sig >> (c * 15)) & 32767 AS chunk
                  FROM sig, UNNEST(range(0, 4)) AS t(c)),
       pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
                        bit_count(xor(x.sig, y.sig)) AS hamming
                 FROM chunks x JOIN chunks y
                   ON x.c = y.c AND x.chunk = y.chunk AND x.doc_id < y.doc_id
                 WHERE bit_count(xor(x.sig, y.sig)) <= 12)
       SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
       FROM pairs ORDER BY hamming, doc_a, doc_b"""

  /** L14 — duplicate-cluster resolution: connected components over the
    * near-dup pair graph (jaccard ≥ 0.5 edges from [[ngramJaccard]]),
    * labelling every document with the minimum doc_id of its cluster —
    * the step that turns pairwise near-dups into dedup groups a keeper
    * policy can act on (keep min id, drop the rest).
    *
    * Iterative min-label propagation: each round is one shuffle join
    * (neighbour labels) + one aggregate; rounds needed = graph
    * diameter, and each round's frame is localCheckpoint'ed so lineage
    * stays flat. Near-dup graphs are overwhelmingly tiny cliques and
    * chains, so this converges in a handful of rounds; for adversarial
    * long-chain graphs at 100 TB, swap the propagation body for the
    * alternating large-star/small-star rounds (same join shape,
    * O(log n) rounds guaranteed). */
  def dedupComponents(s: SparkSession, d: String): DataFrame = {
    val pairs = ngramJaccard(s, d).filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    // One scale stance for the whole component family (r14 verdict):
    // cluster resolution rides [[starComponents]] — O(log² n) rounds
    // on any graph shape plus the measured-small union-find endgame —
    // instead of paying diameter-many propagation rounds of fixed
    // per-round cost. Labels are the identical (node, component-min)
    // map; the original propagation loop survives as the audit twin
    // below ([[propagationComponents]]) and the PipelineSpec duality
    // test pins the two equal on this very pair set.
    starComponents(pairs)._1.orderBy("doc_id")
  }

  /** L14's original diameter-bound min-label propagation — kept as the
    * AUDIT TWIN for the star/endgame path (the L51 duality spec runs
    * both over the same edge set and asserts identical labels). Takes
    * the (doc_a, doc_b) pair frame; returns (doc_id, component). */
  private[graft] def propagationComponents(pairs: DataFrame): DataFrame = {
    // Near-dup edge sets at gate scale fit one partition — no reason
    // to drag 32-task rounds through the scheduler. An unbounded edge
    // set would keep its natural partitioning (and use the star path).
    val edges = pairs.union(pairs.select(col(pairs.columns(1)), col(pairs.columns(0))))
      .toDF("src", "dst").repartition(1).cache()
    // Seed with round 1's result directly — component0 = min(self,
    // neighbors) — one aggregate instead of the first join round;
    // cliques (the dominant near-dup shape) converge immediately.
    var labels = edges.groupBy(col("src").as("id")).agg(min(col("dst")).as("nbr"))
      .select(col("id"), least(col("id"), col("nbr")).as("component"))
      .localCheckpoint(true)
    // Labels are monotonically non-increasing under min-propagation,
    // so an unchanged label SUM proves the fixpoint — one cheap
    // aggregate per round instead of a change-detection join.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("component").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .collect().head.getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < 25) {
      val prop = edges.join(labels, edges("src") === labels("id"))
        .select(col("dst").as("id"), col("component"))
      val next = labels.union(prop)
        .groupBy("id").agg(min(col("component")).as("component"))
        .localCheckpoint(true)
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      iter += 1
    }
    edges.unpersist()
    labels.select(col("id").as("doc_id"), col("component")).orderBy("doc_id")
  }

  /** The L14 component CTEs (through `reach`), shared by the
    * components / canonical-dedup / split-assignment oracles. */
  private val componentCtes: String =
    """w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       sh0 AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s
               FROM w, UNNEST(range(1, GREATEST(len(ws) - 1, 1))) AS t(i)),
       sh AS (SELECT * FROM sh0 WHERE s NOT IN
                (SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) > 64)),
       sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       p AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS shared
             FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
             GROUP BY 1, 2),
       top AS (SELECT doc_a, doc_b,
                      CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
               FROM p JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
               ORDER BY jaccard DESC, doc_a, doc_b LIMIT 50),
       pairs AS (SELECT doc_a, doc_b FROM top WHERE jaccard >= 0.5),
       edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                 UNION ALL SELECT doc_b, doc_a FROM pairs),
       nodes AS (SELECT DISTINCT src AS id FROM edges),
       reach(id, lbl) AS (
         SELECT id, id FROM nodes
         UNION
         SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.id = e.src
       )"""

  val dedupComponentsSql: String =
    s"""WITH RECURSIVE $componentCtes
       SELECT id AS doc_id, MIN(lbl) AS component FROM reach GROUP BY id ORDER BY doc_id"""

  /** Alternating large-star/small-star connected components — the
    * scale path for UNBOUNDED near-dup graphs (cf. the two-round-shape
    * description in Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14). Unlike plain min-label propagation (L14),
    * whose round count equals the graph diameter (unbounded on
    * adversarial chains), this converges in O(log² n) rounds on ANY
    * graph, and each round is two shuffle-sized steps: a groupBy-min
    * over edge endpoints and an equi-join of that min back onto the
    * edge list. No collect_set of neighborhoods — a 100M-degree hub
    * node never materializes its adjacency list in one task; its rows
    * flow through ordinary hash aggregation and join fanout.
    *
    * Input: (src, dst) pair rows in any order/duplication. Output:
    * (doc_id, component) for every node incident to an edge, where
    * component = the minimum node id of its connected component, plus
    * the round count actually used (spec-pinned to stay logarithmic).
    */
  def starComponents(
      pairs: DataFrame,
      /** Edge-count bound below which the remaining graph is solved on
        * the driver with union-find instead of more star rounds. Every
        * round already collects the exact frontier edge count for
        * convergence detection, so the gate costs nothing and is
        * scale-honest: a 100-TB edge set runs distributed star rounds
        * (each shrinking the frontier) until the MEASURED remainder
        * fits comfortably in driver memory (collected as packed
        * primitive longs: 1M edges = 16 MB, plus a ≤16 MB sorted node
        * array and a 4 B/node parent vector — no boxed rows),
        * then finishes in microseconds — the same "local endgame once
        * the frontier collapses" shape distributed CC implementations
        * use, avoiding O(log n) tail rounds of pure fixed cost (each
        * round is ~8 near-empty stages at that point). Tests pass 0 to
        * force the distributed path end-to-end. */
      endgameEdges: Long = 1000000L): (DataFrame, Int) = {
    val a = pairs.columns(0)
    val b = pairs.columns(1)
    // canonical undirected edges, lo < hi
    var edges = pairs
      .select(least(col(a), col(b)).as("lo"), greatest(col(a), col(b)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .localCheckpoint(true)
    // Fixpoint detection: (row count, order-independent hash sum) —
    // one cheap scalar aggregate per round, no change-detection join.
    def sig(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
          coalesce(sum(xxhash64(col("lo"), col("hi"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))),
            lit(java.math.BigDecimal.ZERO)))
        .collect().head
      (r.getLong(0), r.getDecimal(1))
    }
    var prev = sig(edges)
    var rounds = 0
    var converged = prev._1 == 0L
    val longIds = edges.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.LongType)
    while (!converged && rounds < 60) {
      if (longIds && prev._1 <= endgameEdges) {
        // Driver union-find over the measured-small frontier. Roots
        // are kept at the component MINIMUM (merge always hangs the
        // larger root under the smaller), so the labels are exactly
        // the star fixpoint's (node, component-min) pairs.
        // Collected as PACKED primitive longs (one Array[Long] per
        // partition — 16 B/edge, so the 1M-edge default is ~16 MB on
        // the driver plus a sorted node array and an Int parent
        // vector; no boxed Rows/HashMap — r15 advice) and solved over
        // node INDICES in the sorted-id array, where "hang the larger
        // root under the smaller" is index order.
        val packed: Array[Array[Long]] = edges.rdd.mapPartitions { it =>
          val b = new scala.collection.mutable.ArrayBuilder.ofLong
          it.foreach { r => b += r.getLong(0); b += r.getLong(1) }
          Iterator.single(b.result())
        }.collect()
        val all = new Array[Long](packed.map(_.length).sum)
        var off = 0
        packed.foreach { a => System.arraycopy(a, 0, all, off, a.length); off += a.length }
        val nodes = all.clone()
        java.util.Arrays.sort(nodes)
        var nNodes = 0
        var i = 0
        while (i < nodes.length) { // in-place dedup of the sorted ids
          if (nNodes == 0 || nodes(nNodes - 1) != nodes(i)) {
            nodes(nNodes) = nodes(i); nNodes += 1
          }
          i += 1
        }
        def idx(x: Long): Int = {
          var lo = 0; var hi = nNodes - 1
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (nodes(mid) < x) lo = mid + 1 else hi = mid
          }
          lo
        }
        val parent = Array.tabulate(nNodes)(identity)
        def find(x0: Int): Int = {
          var r = x0
          while (parent(r) != r) r = parent(r)
          var c = x0
          while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
          r
        }
        i = 0
        while (i < all.length) {
          val rx = find(idx(all(i)))
          val ry = find(idx(all(i + 1)))
          if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
          i += 2
        }
        val ss = pairs.sparkSession
        import ss.implicits._
        val out = (0 until nNodes).map(n => (nodes(n), nodes(find(n))))
        return (out.toDF("doc_id", "component"), rounds)
      }
      // large-star: for each node u (over the SYMMETRIC closure) with
      // m(u) = min(Γ(u) ∪ {u}), hang every LARGER neighbour off m(u).
      val sym = edges.select(col("lo").as("u"), col("hi").as("v"))
        .union(edges.select(col("hi").as("u"), col("lo").as("v")))
      val mins = sym.groupBy("u")
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val large = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("m").as("lo"), col("v").as("hi"))  // m ≤ u < v
        .distinct()
      // small-star: key each edge on its LARGER endpoint u; with
      // m(u) = min of its smaller neighbours, hang those neighbours
      // (and u itself) off m(u).
      val dir = large.select(col("hi").as("u"), col("lo").as("v"))
      val mins2 = dir.groupBy("u").agg(min(col("v")).as("m"))
      val small = dir.join(mins2, "u")
        .filter(col("v") =!= col("m"))
        .select(col("m").as("lo"), col("v").as("hi")) // m = min(Γ≤) < v
        .union(mins2.select(col("m").as("lo"), col("u").as("hi")))
        .distinct()
        .localCheckpoint(true)
      val s2 = sig(small)
      converged = s2._1 == prev._1 && s2._2.compareTo(prev._2) == 0
      prev = s2
      edges = small
      rounds += 1
    }
    // 60 rounds covers log²(n) for any physically possible n — hitting
    // the cap means a bug, and unconverged labels must never leak out.
    if (!converged) throw new IllegalStateException(
      s"star components did not converge after $rounds rounds")
    // At the fixpoint every edge is (component-min, member).
    val labels = edges.select(col("hi").as("doc_id"), col("lo").as("component"))
      .union(edges.select(col("lo").as("doc_id"), col("lo").as("component")))
      .distinct()
    (labels, rounds)
  }

  /** L47 — duplicate clusters over the FULL MinHash-LSH near-dup edge
    * set (every jaccard ≥ 0.5 pair from [[minhashLsh]], NOT a top-k
    * selection), resolved with [[starComponents]]. This is the shape
    * that holds at 100 TB: the edge set is whatever LSH banding
    * produced — unbounded, possibly containing giant skewed clusters
    * of boilerplate — and the round count stays logarithmic where
    * L14's diameter-bound propagation could loop thousands of times. */
  def dedupComponentsStar(s: SparkSession, d: String): DataFrame = {
    val pairs = minhashLsh(s, d).filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    starComponents(pairs)._1.orderBy("doc_id")
  }

  val dedupComponentsStarSql: String =
    s"""WITH RECURSIVE $minhashPairsCtes,
       pairs AS (SELECT doc_a, doc_b FROM lsh_pairs WHERE jaccard >= 0.5),
       e2 AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
       nodes AS (SELECT DISTINCT src AS id FROM e2),
       reach(id, lbl) AS (
         SELECT id, id FROM nodes
         UNION
         SELECT e.dst, r.lbl FROM reach r JOIN e2 e ON r.id = e.src
       )
       SELECT id AS doc_id, MIN(lbl) AS component FROM reach GROUP BY id ORDER BY doc_id"""

  /** L48 — ingest-time near-dup admission: decide, for each document
    * of an INCOMING batch (here: doc_id % 3 == 0), whether it may
    * enter the corpus, by LSH-probing it against (a) the live corpus
    * and (b) earlier docs of its own batch. This is the admission
    * variant of near-dedup: unlike the global L2/L47 pass it never
    * pairs corpus docs with each other — the join is ASYMMETRIC
    * (incoming bands probe corpus bands), so at 100 TB the cost is
    * O(batch) lookups into a bucketed band table (which a production
    * deployment keeps AS a catalog table partitioned by band), not a
    * corpus self-join. Within-batch the rule is deterministic
    * admission order: a doc is blocked by any SMALLER incoming
    * doc_id it collides with, kept-or-not — non-recursive, so both
    * engines compute it with one join. Verification (exact jaccard
    * ≥ 0.5) runs only on bucket-collision candidates. */
  def dedupIngestNeardup(s: SparkSession, d: String): DataFrame = {
    val docsets = shingles(documents(s, d))
      .groupBy("doc_id").agg(collect_set(col("s")).as("sh"))
      .cache()
    val bands = bandsOf(docsets).cache()
    val inBands = bands.filter(col("doc_id") % 3 === 0)
    val corpusBands = bands.filter(col("doc_id") % 3 =!= 0)
    val vsCorpus = inBands.as("x").join(corpusBands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("nbr"))
    val vsBatch = inBands.as("x").join(inBands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("y.doc_id") < col("x.doc_id"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("nbr"))
    val cand = vsCorpus.union(vsBatch).distinct()
    val verified = cand
      .join(docsets.select(col("doc_id"), col("sh")), "doc_id")
      .join(docsets.select(col("doc_id").as("nbr"), col("sh").as("shn")), "nbr")
      .withColumn("shared", size(array_intersect(col("sh"), col("shn"))).cast("long"))
      .withColumn("jaccard",
        round(col("shared").cast("double") / (size(col("sh")) + size(col("shn")) - col("shared")), 4))
      .filter(col("jaccard") >= 0.5)
    val dup = verified.groupBy("doc_id").agg(min(col("nbr")).as("dup_of"))
    documents(s, d).filter(col("doc_id") % 3 === 0).select("doc_id")
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"),
        when(col("dup_of").isNull, 1L).otherwise(0L).as("keep"))
      .orderBy("doc_id")
  }

  val dedupIngestNeardupSql: String =
    s"""WITH $minhashPairsCtes,
       p2 AS (SELECT doc_a, doc_b FROM lsh_pairs WHERE jaccard >= 0.5),
       sym AS (SELECT doc_a AS id, doc_b AS nbr FROM p2
               UNION ALL SELECT doc_b, doc_a FROM p2),
       incoming AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
       blockers AS (SELECT s.id AS doc_id, s.nbr
                    FROM sym s JOIN incoming i ON s.id = i.doc_id
                    WHERE s.nbr % 3 <> 0 OR s.nbr < s.id),
       dup AS (SELECT doc_id, MIN(nbr) AS dup_of FROM blockers GROUP BY doc_id)
       SELECT i.doc_id, d.dup_of,
              CAST(CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
       FROM incoming i LEFT JOIN dup d USING (doc_id)
       ORDER BY i.doc_id"""

  /** L8 — language ID by stopword-hit voting with a fixed priority
    * tie-break; oracle-matched since both sides run the identical
    * heuristic. */
  private val stops = Map(
    "en" -> Seq("the", "a", "of", "and", "in", "to", "is"),
    "es" -> Seq("el", "la", "los", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  private def hitsExpr(lang: String): String = {
    val list = stops(lang).map(w => s"'$w'").mkString(", ")
    s"CAST(size(filter(ws, w -> w IN ($list))) AS BIGINT)"
  }

  private val predCase: String =
    """CASE WHEN h_en >= h_es AND h_en >= h_de AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
            WHEN h_es >= h_de AND h_es >= h_fr AND h_es >= h_zh THEN 'es'
            WHEN h_de >= h_fr AND h_de >= h_zh THEN 'de'
            WHEN h_fr >= h_zh THEN 'fr' ELSE 'zh' END"""

  def textLangid(s: SparkSession, d: String): DataFrame =
    withWords(documents(s, d))
      .withColumn("h_en", expr(hitsExpr("en"))).withColumn("h_es", expr(hitsExpr("es")))
      .withColumn("h_de", expr(hitsExpr("de"))).withColumn("h_fr", expr(hitsExpr("fr")))
      .withColumn("h_zh", expr(hitsExpr("zh")))
      .withColumn("pred_lang", expr(predCase))
      .select("doc_id", "pred_lang", "h_en", "h_es", "h_de", "h_fr", "h_zh")
      .orderBy("doc_id")

  val textLangidSql: String = {
    def h(lang: String) = {
      val list = stops(lang).map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(ws, w -> w IN ($list))) AS BIGINT) AS h_${lang}"
    }
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       h AS (SELECT doc_id, ${h("en")}, ${h("es")}, ${h("de")}, ${h("fr")}, ${h("zh")} FROM w)
       SELECT doc_id, $predCase AS pred_lang, h_en, h_es, h_de, h_fr, h_zh
       FROM h ORDER BY doc_id"""
  }

  /** L9 — quality scoring: word count, avg word length, stopword
    * ratio, punctuation ratio → composite score. Pure per-row codegen
    * expressions. */
  def textQuality(s: SparkSession, d: String): DataFrame =
    withWords(documents(s, d))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("n_alpha", length(regexp_replace(col("text"), " ", "")).cast("long"))
      .withColumn("h_stop", expr(hitsExpr("en")))
      .withColumn("n_punct", expr("CAST(size(regexp_extract_all(text, '[.,!?]', 0)) AS BIGINT)"))
      .select(col("doc_id"), col("n_words"),
        (col("n_alpha").cast("double") / col("n_words")).as("avg_word_len"),
        round(col("h_stop").cast("double") / col("n_words"), 6).as("stop_ratio"),
        round(lit(0.4) * log(col("n_words").cast("double")) +
              lit(0.4) * (col("h_stop").cast("double") / col("n_words")) -
              lit(0.2) * (col("n_punct").cast("double") / col("n_words")), 4).as("quality_score"))
      .orderBy("doc_id")

  val textQualitySql: String = {
    val list = stops("en").map(w => s"'$w'").mkString(", ")
    s"""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
       f AS (SELECT doc_id,
                    CAST(len(ws) AS BIGINT) AS n_words,
                    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_alpha,
                    CAST(len(list_filter(ws, w -> w IN ($list))) AS BIGINT) AS h_stop,
                    CAST(len(regexp_extract_all(text, '[.,!?]')) AS BIGINT) AS n_punct
             FROM w)
       SELECT doc_id, n_words,
              CAST(n_alpha AS DOUBLE) / n_words AS avg_word_len,
              ROUND(CAST(h_stop AS DOUBLE) / n_words, 6) AS stop_ratio,
              ROUND(0.4 * ln(CAST(n_words AS DOUBLE)) +
                    0.4 * (CAST(h_stop AS DOUBLE) / n_words) -
                    0.2 * (CAST(n_punct AS DOUBLE) / n_words), 4) AS quality_score
       FROM f ORDER BY doc_id"""
  }

  /** L10 — token counting: whitespace tokens + BPE-ish regex tokens,
    * aggregated per source. */
  def textTokens(s: SparkSession, d: String): DataFrame =
    withWords(documents(s, d))
      .withColumn("ws_tok", size(col("ws")).cast("long"))
      .withColumn("bpe_tok",
        expr("CAST(size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS BIGINT)"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("ws_tok")).as("ws_tokens"),
           sum(col("bpe_tok")).as("bpe_tokens"))
      .withColumn("avg_ws_tokens", col("ws_tokens").cast("double") / col("n_docs"))
      .orderBy("source")

  val textTokensSql: String =
    """WITH t AS (SELECT source,
                         CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tok,
                         CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tok
                  FROM documents)
       SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(ws_tok) AS BIGINT) AS ws_tokens,
              CAST(SUM(bpe_tok) AS BIGINT) AS bpe_tokens,
              CAST(SUM(ws_tok) AS DOUBLE) / COUNT(*) AS avg_ws_tokens
       FROM t GROUP BY source ORDER BY source"""

  /** Composite curation pipeline — the end-to-end use-case the §2.3
    * operators exist for: keep English documents above a quality bar,
    * drop exact duplicates (first doc_id per content hash wins), and
    * report the per-source survival funnel. One pass over the corpus:
    * filter is per-row codegen, dedup is one hash-shuffle. */
  def curate(s: SparkSession, d: String): DataFrame = {
    val scored = withWords(documents(s, d))
      .withColumn("h_en", expr(hitsExpr("en"))).withColumn("h_es", expr(hitsExpr("es")))
      .withColumn("h_de", expr(hitsExpr("de"))).withColumn("h_fr", expr(hitsExpr("fr")))
      .withColumn("h_zh", expr(hitsExpr("zh")))
      .withColumn("pred_lang", expr(predCase))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .filter(col("pred_lang") === "en" && col("n_words") >= 5)
    val deduped = scored
      .withColumn("content_hash", md5(col("text")))
      .withColumn("rn", expr(
        "row_number() OVER (PARTITION BY content_hash ORDER BY doc_id)"))
      .filter(col("rn") === 1)
    deduped.groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
           sum(col("n_words")).as("kept_words"))
      .orderBy("source")
  }

  val curateSql: String = {
    def h(lang: String) = {
      val list = stops(lang).map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(ws, w -> w IN ($list))) AS BIGINT) AS h_${lang}"
    }
    s"""WITH w AS (SELECT doc_id, text, source, string_split(text, ' ') AS ws FROM documents),
       f AS (SELECT doc_id, text, source,
                    CAST(len(ws) AS BIGINT) AS n_words,
                    ${h("en")}, ${h("es")}, ${h("de")}, ${h("fr")}, ${h("zh")}
             FROM w),
       sc AS (SELECT *, $predCase AS pred_lang FROM f),
       kept AS (SELECT * FROM sc WHERE pred_lang = 'en' AND n_words >= 5),
       dd AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
              FROM kept)
       SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_words) AS BIGINT) AS kept_words
       FROM dd WHERE rn = 1 GROUP BY source ORDER BY source"""
  }

  /** L15 — stratified sampling: per-stratum rates with the same
    * deterministic multiplicative hash as R24, so a re-run (or the
    * oracle) draws the identical sample — no RNG, no seed plumbing.
    * At 100 TB this is a pure map-side filter. */
  def sampleStratified(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("rate", expr(
        """CASE WHEN source IN ('src0', 'src1', 'src2') THEN 100
                WHEN source IN ('src3', 'src4') THEN 500
                ELSE 50 END"""))
      .filter((col("doc_id") * lit(2654435761L)) % 1000 < col("rate"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("source")

  val sampleStratifiedSql: String =
    """SELECT source, COUNT(*) AS n_sampled
       FROM documents
       WHERE (doc_id * 2654435761) % 1000 <
             (CASE WHEN source IN ('src0', 'src1', 'src2') THEN 100
                   WHEN source IN ('src3', 'src4') THEN 500
                   ELSE 50 END)
       GROUP BY source ORDER BY source"""

  /** L49 — quality-weighted deterministic sampling: keep probability
    * proportional to L9's quality score (floored at 5%, capped at 1),
    * drawn with the R24 multiplicative hash so re-runs and the oracle
    * select the IDENTICAL sample (no RNG, no seed plumbing), and each
    * kept doc carries the Horvitz-Thompson inverse-probability weight
    * (1/p) so downstream token/quality statistics stay unbiased after
    * the downsample. The probability cut compares integers on both
    * sides (hash mod 1e6 vs floor(p·1e6)) — no float-boundary
    * divergence between engines. Map-only plus ONE broadcast scalar
    * (the corpus max score; the crossJoin is a 1-row broadcast, not a
    * cartesian) at any corpus size. */
  def sampleQualityWeighted(s: SparkSession, d: String): DataFrame = {
    // cache(): the max-quality probe and the keep-filter pass both
    // read the scored table — uncached, the full quality scoring
    // (scan + stopword-hit expressions) runs twice.
    val q = textQuality(s, d).select(col("doc_id"), col("quality_score")).cache()
    val mx = q.agg(max(col("quality_score")).as("max_q"))
    q.crossJoin(broadcast(mx))
      .withColumn("p_keep",
        least(lit(1.0), greatest(lit(0.05), col("quality_score") / col("max_q"))))
      .filter((col("doc_id") * lit(2654435761L)) % 1000000 <
        floor(col("p_keep") * lit(1000000.0)).cast("long"))
      .select(col("doc_id"), col("quality_score"),
        round(col("p_keep"), 6).as("p_keep"),
        round(lit(1.0) / col("p_keep"), 6).as("weight"))
      .orderBy("doc_id")
  }

  val sampleQualityWeightedSql: String = {
    val list = stops("en").map(w => s"'$w'").mkString(", ")
    s"""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
       f AS (SELECT doc_id,
                    CAST(len(ws) AS BIGINT) AS n_words,
                    CAST(len(list_filter(ws, w -> w IN ($list))) AS BIGINT) AS h_stop,
                    CAST(len(regexp_extract_all(text, '[.,!?]')) AS BIGINT) AS n_punct
             FROM w),
       q AS (SELECT doc_id,
                    ROUND(0.4 * ln(CAST(n_words AS DOUBLE)) +
                          0.4 * (CAST(h_stop AS DOUBLE) / n_words) -
                          0.2 * (CAST(n_punct AS DOUBLE) / n_words), 4) AS quality_score
             FROM f),
       m AS (SELECT MAX(quality_score) AS max_q FROM q),
       sel AS (SELECT doc_id, quality_score,
                      LEAST(CAST(1 AS DOUBLE),
                            GREATEST(CAST(0.05 AS DOUBLE), quality_score / max_q)) AS p
               FROM q, m)
       SELECT doc_id, quality_score, ROUND(p, 6) AS p_keep,
              ROUND(CAST(1 AS DOUBLE) / p, 6) AS weight
       FROM sel
       WHERE (doc_id * 2654435761) % 1000000 < CAST(floor(p * 1000000) AS BIGINT)
       ORDER BY doc_id"""
  }

  /** L11 — document fingerprint: rolling polynomial hash over word
    * hashes, mod a 30-bit prime (keeps every product within long
    * range). Word hash = cross-engine md5 prefix, so the DuckDB
    * list_reduce mirror hash-matches. */
  def textFingerprint(s: SparkSession, d: String): DataFrame =
    withWords(documents(s, d))
      .withColumn("fp", expr(
        """aggregate(ws, 7L, (h, w) ->
           (h * 31 + CAST(conv(substr(md5(w), 1, 8), 16, 10) AS BIGINT) % 65536) % 1073741789)"""))
      .select("doc_id", "fp")
      .orderBy("doc_id")

  val textFingerprintSql: String =
    """SELECT doc_id,
              list_reduce(
                list_prepend(CAST(7 AS BIGINT),
                  list_transform(string_split(text, ' '),
                    w -> CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 65536)),
                (h, x) -> (h * 31 + x) % 1073741789) AS fp
       FROM documents ORDER BY doc_id"""

  /** L17 — repetition scoring (Gopher-style repetition filters,
    * word-level): `rep_frac` = fraction of words that are repeats of
    * an earlier word (1 − distinct/total), `top_frac` = most frequent
    * word's share. High values flag boilerplate / degenerate docs.
    *
    * Scale: explode + two-level hash agg keyed (doc_id, word) then
    * doc_id — partial aggregation makes the shuffle carry one row per
    * distinct (doc, word), not one per token. Fractions are IEEE
    * double divisions of exact integer counts, so Spark and the
    * oracle agree bitwise. */
  def textRepetition(s: SparkSession, d: String): DataFrame =
    withWords(documents(s, d))
      .select(col("doc_id"), explode(col("ws")).as("word"))
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(
        sum("cnt").as("n_words"),
        (lit(1.0) - count(lit(1)).cast("double") / sum("cnt").cast("double")).as("rep_frac"),
        (max("cnt").cast("double") / sum("cnt").cast("double")).as("top_frac"))
      .orderBy(col("rep_frac").desc, col("doc_id"))
      .limit(100)

  val textRepetitionSql: String =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       c AS (SELECT doc_id, word, COUNT(*) AS cnt FROM w GROUP BY doc_id, word)
       SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words,
              1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS rep_frac,
              CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE) AS top_frac
       FROM c GROUP BY doc_id ORDER BY rep_frac DESC, doc_id LIMIT 100"""

  /** L18 — benchmark decontamination: corpus docs sharing a word
    * n-gram with the eval split (here the deterministic holdout
    * `doc_id % 97 = 0`) are flagged with their shared-gram count —
    * the standard exact-substring contamination check run before
    * training. n=3 at test scale (tiny synthetic vocabulary); at real
    * scale the same plan runs with 8–13-grams, where false sharing
    * vanishes and the gram join gets MORE selective, not less.
    *
    * Scale: grams explode into an equi-join on the gram string — a
    * shuffle keyed on short strings. The eval side is distinct-reduced
    * first and is tiny relative to the corpus (it's a benchmark
    * suite), so AQE broadcasts it; the corpus side never
    * self-joins. */
  def decontaminate(s: SparkSession, d: String): DataFrame = {
    // cache(): the eval-split side and the corpus side both derive
    // from this explode — uncached, documents is scanned and
    // re-exploded twice.
    val grams = withWords(documents(s, d))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', slice(ws, i + 1, 3)))"))
        .as("gram"))
      .cache()
    val evalGrams = grams.filter(col("doc_id") % 97 === 0).select("gram").distinct()
    grams.filter(col("doc_id") % 97 =!= 0).distinct()
      .join(evalGrams, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("n_shared").desc, col("doc_id"))
      .limit(200)
  }

  /** L20 — TF-IDF term importance per source (log-free variant:
    * `tf * N / df` — same ranking as the log form for fixed N, and
    * bitwise cross-engine since it's one multiply + divide of exact
    * integers; libm `ln` implementations are NOT bit-stable across
    * engines). Top-5 terms per source via a window rank.
    *
    * Scale: two hash aggs (term frequency by (source, word), doc
    * frequency by word) + a broadcast of the tiny df/N sides + a
    * per-source window over a handful of rows. The explode dominates
    * and is map-side only. */
  def textTfidf(s: SparkSession, d: String): DataFrame = {
    // cache(): the term-frequency and document-frequency aggregates
    // both read the exploded word table — uncached it is scanned and
    // exploded twice.
    val w = documents(s, d)
      .select(col("doc_id"), col("source"), explode(ws).as("word"))
      .cache()
    val tf = w.groupBy("source", "word").agg(count(lit(1)).as("tf"))
    val df = w.select("doc_id", "word").distinct()
      .groupBy("word").agg(count(lit(1)).as("df"))
    val nDocs = documents(s, d).agg(count(lit(1)).as("n_docs"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("score").desc, col("word"))
    tf.join(broadcast(df), "word").join(broadcast(nDocs))
      .withColumn("score", col("tf").cast("double") * col("n_docs") / col("df"))
      .withColumn("rn", row_number().over(win))
      .filter(col("rn") <= 5)
      .select(col("source"), col("word"), col("tf"), col("score"))
      .orderBy(col("source"), col("score").desc, col("word"))
  }

  val textTfidfSql: String =
    """WITH w AS (SELECT doc_id, source, unnest(string_split(text,' ')) AS word FROM documents),
       d AS (SELECT DISTINCT doc_id, word FROM w),
       tf AS (SELECT source, word, COUNT(*) AS tf FROM w GROUP BY source, word),
       df AS (SELECT word, COUNT(*) AS df FROM d GROUP BY word),
       n AS (SELECT COUNT(*) AS n_docs FROM documents),
       scored AS (SELECT source, word, tf, CAST(tf AS DOUBLE) * n_docs / df AS score
                  FROM tf JOIN df USING (word), n)
       SELECT source, word, tf, score FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY score DESC, word) AS rn
         FROM scored) t
       WHERE rn <= 5 ORDER BY source, score DESC, word"""

  /** L21 — PII scrubbing: regex redaction of emails and phone-shaped
    * tokens before training. The test corpus is synthetic and clean,
    * so deterministic PII is injected per doc first (same expression
    * on the oracle side), then scrubbed; the query reports per-source
    * redaction counts plus a masked sample. Pure per-row codegen —
    * at 100 TB this is a map-only pass with zero shuffle beyond the
    * final tiny agg. */
  def piiScrub(s: SparkSession, d: String): DataFrame = {
    val withPii = documents(s, d).withColumn("text2",
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com or 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "[0-9]{3}-[0-9]{4}"
    withPii
      .withColumn("n_emails", expr(s"CAST(size(regexp_extract_all(text2, '$emailRe', 0)) AS BIGINT)"))
      .withColumn("n_phones", expr(s"CAST(size(regexp_extract_all(text2, '$phoneRe', 0)) AS BIGINT)"))
      .withColumn("clean", regexp_replace(regexp_replace(col("text2"), emailRe, "<EMAIL>"), phoneRe, "<PHONE>"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_emails")).as("emails_redacted"),
           sum(col("n_phones")).as("phones_redacted"),
           max(substring(col("clean"), -33, 33)).as("sample_tail"))
      .orderBy("source")
  }

  val piiScrubSql: String =
    """WITH p AS (SELECT source,
                         text || ' contact user' || doc_id || '@example.com or 555-' ||
                           lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text2
                  FROM documents),
       r AS (SELECT source,
                    CAST(len(regexp_extract_all(text2, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
                    CAST(len(regexp_extract_all(text2, '[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
                    regexp_replace(regexp_replace(text2, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                                   '[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
             FROM p)
       SELECT source, COUNT(*) AS n_docs,
              CAST(SUM(n_emails) AS BIGINT) AS emails_redacted,
              CAST(SUM(n_phones) AS BIGINT) AS phones_redacted,
              MAX(CASE WHEN length(clean) >= 33 THEN substring(clean, length(clean) - 32, 33)
                       ELSE clean END) AS sample_tail
       FROM r GROUP BY source ORDER BY source"""

  /** L22 — boilerplate detection: word 5-grams appearing in many
    * distinct documents are template/boilerplate text (cookie banners,
    * license headers); they feed a removal pass. Explode → two-level
    * agg, same scale shape as L17: the shuffle carries one row per
    * distinct (gram, doc) and then per gram. */
  def boilerplate(s: SparkSession, d: String): DataFrame =
    withWords(documents(s, d))
      .filter(size(col("ws")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws) - 5), i -> concat_ws(' ', slice(ws, i + 1, 5)))"))
        .as("gram"))
      .groupBy("gram")
      // countDistinct dedups (gram, doc) internally via its two-phase
      // agg — a pre-distinct() would be a second full shuffle for free
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 3)
      .orderBy(col("n_docs").desc, col("gram"))
      .limit(50)

  val boilerplateSql: String =
    """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
                      WHERE len(string_split(text, ' ')) >= 5),
       grams AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS gram
                 FROM words, UNNEST(generate_series(1, len(w) - 4)) AS t(i))
       SELECT gram, COUNT(DISTINCT doc_id) AS n_docs
       FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 3
       ORDER BY n_docs DESC, gram LIMIT 50"""

  /** L27 — token-budget shard packing: assign documents to training
    * shards of ≤5000 whitespace tokens each, per source, in doc_id
    * order — the deterministic greedy packing a dataloader shards on.
    * The cumulative sum is a per-source window (one shuffle on
    * source); at 100 TB the partition key becomes (source, day) or a
    * hash bucket so no single window partition grows unbounded. */
  def shardPack(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy("doc_id")
    withWords(documents(s, d))
      .withColumn("tok", size(col("ws")).cast("long"))
      .withColumn("cum_before", coalesce(sum(col("tok")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // integer division on BOTH sides: Spark `/` is double division
      // and DuckDB CAST(double AS BIGINT) ROUNDS where Spark's cast
      // truncates — at corpus sizes where cum/5000 crosses x.5 the
      // engines would disagree on the shard id (bit at sf0.1)
      .withColumn("shard", expr("cum_before div 5000"))
      .groupBy("source", "shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("shard_tokens"))
      .orderBy("source", "shard")
  }

  val shardPackSql: String =
    """WITH t AS (SELECT source, doc_id,
                         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
                  FROM documents),
       c AS (SELECT source, doc_id, tok,
                    COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
             FROM t)
       SELECT source, CAST(cum_before // 5000 AS BIGINT) AS shard,
              COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS shard_tokens
       FROM c GROUP BY source, shard ORDER BY source, shard"""

  /** L28 — incremental dedup: a new batch (source src0) admitted
    * against the already-ingested corpus by content-hash anti join —
    * the shape every continuously-crawled corpus runs on ingest.
    * Hash anti join shuffles 16-byte digests, never text; with the
    * corpus hashes in a catalog table this is one MOR-style lookup. */
  def dedupIncremental(s: SparkSession, d: String): DataFrame = {
    // cache(): corpus side and batch side both read the hashed table
    // — uncached, the scan + per-doc md5 run twice.
    val hashed = documents(s, d).withColumn("h", md5(col("text"))).cache()
    val corpus = hashed.filter(col("source") =!= "src0").select("h").distinct()
    val batch = hashed.filter(col("source") === "src0")
    val fresh = batch.join(corpus, Seq("h"), "left_anti")
      .groupBy("lang").agg(count(lit(1)).as("n_new"))
    batch.groupBy("lang").agg(count(lit(1)).as("n_batch"))
      .join(fresh, Seq("lang"), "left")
      .select(col("lang"), col("n_batch"), coalesce(col("n_new"), lit(0L)).as("n_new"),
        (col("n_batch") - coalesce(col("n_new"), lit(0L))).as("n_dup"))
      .orderBy("lang")
  }

  val dedupIncrementalSql: String =
    """WITH h AS (SELECT lang, source, md5(text) AS h FROM documents),
       corpus AS (SELECT DISTINCT h FROM h WHERE source <> 'src0'),
       batch AS (SELECT lang, h FROM h WHERE source = 'src0'),
       fresh AS (SELECT lang, COUNT(*) AS n_new FROM batch
                 WHERE h NOT IN (SELECT h FROM corpus) GROUP BY lang),
       tot AS (SELECT lang, COUNT(*) AS n_batch FROM batch GROUP BY lang)
       SELECT t.lang, t.n_batch, COALESCE(f.n_new, 0) AS n_new,
              t.n_batch - COALESCE(f.n_new, 0) AS n_dup
       FROM tot t LEFT JOIN fresh f ON t.lang = f.lang ORDER BY t.lang"""

  /** L25 — corpus dashboard: the one-stop per-source health report a
    * curation run starts and ends with — volume, token mass, language
    * mix, exact-dup rate, and mean quality, each a column computed by
    * the same definitions as the standalone operators. One pass +
    * one dedup shuffle; every column is exact-arithmetic so the
    * DuckDB oracle hash-matches. */
  def corpusStats(s: SparkSession, d: String): DataFrame = {
    val scored = withWords(documents(s, d))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("h_en", expr(hitsExpr("en"))).withColumn("h_es", expr(hitsExpr("es")))
      .withColumn("h_de", expr(hitsExpr("de"))).withColumn("h_fr", expr(hitsExpr("fr")))
      .withColumn("h_zh", expr(hitsExpr("zh")))
      .withColumn("pred_lang", expr(predCase))
      .withColumn("h", md5(col("text")))
    scored.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("total_tokens"),
        countDistinct(col("h")).as("n_unique"),
        round(lit(1.0) - countDistinct(col("h")).cast("double") / count(lit(1)), 6)
          .as("dup_rate"),
        round(count(when(col("pred_lang") === "en", 1)).cast("double") / count(lit(1)), 6)
          .as("english_share"),
        round(graft.Exact.davg(col("n_words").cast("double")), 6).as("mean_tokens"))
      .orderBy("source")
  }

  val corpusStatsSql: String = {
    def h(lang: String) = {
      val list = stops(lang).map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(ws, w -> w IN ($list))) AS BIGINT) AS h_${lang}"
    }
    s"""WITH w AS (SELECT doc_id, text, source, string_split(text, ' ') AS ws FROM documents),
       f AS (SELECT source, text, CAST(len(ws) AS BIGINT) AS n_words,
                    ${h("en")}, ${h("es")}, ${h("de")}, ${h("fr")}, ${h("zh")}
             FROM w),
       sc AS (SELECT source, n_words, md5(text) AS h, $predCase AS pred_lang FROM f)
       SELECT source,
              COUNT(*) AS n_docs,
              CAST(SUM(n_words) AS BIGINT) AS total_tokens,
              COUNT(DISTINCT h) AS n_unique,
              round(1.0 - CAST(COUNT(DISTINCT h) AS DOUBLE) / COUNT(*), 6) AS dup_rate,
              round(CAST(COUNT(*) FILTER (WHERE pred_lang = 'en') AS DOUBLE) / COUNT(*), 6)
                AS english_share,
              round(${graft.Exact.sqlAvg("CAST(n_words AS DOUBLE)")}, 6) AS mean_tokens
       FROM sc GROUP BY source ORDER BY source"""
  }

  val decontaminateSql: String =
    """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       grams AS (
         SELECT doc_id, array_to_string(w[i:i+2], ' ') AS gram
         FROM words, (SELECT unnest(generate_series(1, len(w) - 2)) AS i)
       ),
       eval_grams AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
       corpus AS (SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 97 <> 0)
       SELECT c.doc_id, COUNT(*) AS n_shared
       FROM corpus c JOIN eval_grams e USING (gram)
       GROUP BY c.doc_id ORDER BY n_shared DESC, c.doc_id LIMIT 200"""

  /** L27 — token-budget document chunking: split every document into
    * 40-word training chunks with a 10-word overlap (stride 30), the
    * standard context-window prep step before tokenization. Chunk
    * count is pure integer arithmetic (`1 + (n-11) div 30` for
    * n > 40), chunk text is content-addressed by md5 so the output
    * stays narrow however long the documents get.
    *
    * Scale: map-only — sequence + posexplode inside codegen, no
    * shuffle at all until the final order-by (which a real pipeline
    * wouldn't have); 100 TB in, 100 TB of chunks out, embarrassingly
    * parallel. */
  def chunkDocs(s: SparkSession, d: String): DataFrame =
    withWords(documents(s, d))
      .withColumn("n", size(col("ws")))
      .withColumn("k",
        when(col("n") <= 40, lit(1)).otherwise(expr("1 + (n - 11) div 30").cast("int")))
      .select(col("doc_id"), col("ws"), col("n"),
        posexplode(expr("sequence(0, k - 1)")))
      .withColumn("start_word", (col("pos") * 30 + 1).cast("long"))
      .withColumn("chunk_words", least(lit(40), col("n") - col("pos") * 30).cast("long"))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("start_word"), col("chunk_words"),
        md5(expr("concat_ws(' ', slice(ws, pos * 30 + 1, least(40, n - pos * 30)))")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")

  val chunkDocsSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws,
                         len(string_split(text, ' ')) AS n
                  FROM documents),
       k AS (SELECT doc_id, ws, n,
                    CASE WHEN n <= 40 THEN 1 ELSE 1 + (n - 11) // 30 END AS k
             FROM w),
       c AS (SELECT doc_id, ws, n, unnest(range(k)) AS pos FROM k)
       SELECT doc_id, CAST(pos AS BIGINT) AS chunk_idx,
              CAST(pos * 30 + 1 AS BIGINT) AS start_word,
              CAST(LEAST(40, n - pos * 30) AS BIGINT) AS chunk_words,
              md5(array_to_string(ws[pos * 30 + 1 : pos * 30 + LEAST(40, n - pos * 30)], ' ')) AS chunk_hash
       FROM c ORDER BY doc_id, chunk_idx"""

  /** L28 — unigram corpus-frequency scoring: the log-free variant of
    * unigram-LM quality filtering (CCNet-style) — a document whose
    * tokens are all corpus-rare is likelier gibberish. Per doc: mean
    * corpus frequency of its token occurrences plus the count of rare
    * tokens (corpus freq ≤ 2). All integer sums, so the mean is one
    * exact long→double division (libm `ln` is not bit-stable across
    * engines — same reasoning as L20's log-free TF-IDF).
    *
    * Scale: one word-count agg, then a frequency equi-join back onto
    * the exploded corpus (shuffle on the word key at real vocab
    * sizes; broadcast-eligible here and AQE decides), then a per-doc
    * agg. Nothing all-pairs, nothing driver-side. */
  def unigramFreq(s: SparkSession, d: String): DataFrame = {
    val w = documents(s, d).select(col("doc_id"), explode(ws).as("word"))
    val freq = w.groupBy("word").agg(count(lit(1)).as("cnt"))
    w.join(freq, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
           (sum(col("cnt")).cast("double") / count(lit(1))).as("mean_tok_freq"),
           count(when(col("cnt") <= 2, 1)).as("n_rare"))
      .filter(col("doc_id") < 300)
      .orderBy("doc_id")
  }

  val unigramFreqSql: String =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       freq AS (SELECT word, COUNT(*) AS cnt FROM w GROUP BY word)
       SELECT doc_id, COUNT(*) AS n_words,
              CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS mean_tok_freq,
              COUNT(*) FILTER (WHERE cnt <= 2) AS n_rare
       FROM w JOIN freq USING (word)
       WHERE doc_id < 300
       GROUP BY doc_id ORDER BY doc_id"""

  /** L29 — source mixing: given a uniform target mix and a global
    * token budget of half the corpus, compute each source's sampling
    * rate and expected contribution — the knob that turns a raw crawl
    * into a weighted training mix. Integer budget arithmetic
    * (`total div 2`, `budget div n_sources`) so both engines agree
    * bitwise; the rate is one exact long→double division.
    *
    * Scale: one per-source agg (map-side combine) + a broadcast of
    * the single-row total — the decision table stays tiny no matter
    * the corpus size; the actual sampling pass would then be L15's
    * deterministic per-stratum hash filter using these rates. */
  def mixSources(s: SparkSession, d: String): DataFrame = {
    // r16: the grand totals are a WINDOW over the per-source aggregate
    // — one corpus pass, no cache, no self-join (the r15 cache+join
    // shape cost more than it saved at bench scale, and the r14 shape
    // re-scanned the corpus for the totals). The empty-partition
    // window funnels only |sources| aggregated rows through one task —
    // bounded at any corpus size (sources are few by construction).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val perSrc = withWords(documents(s, d))
      .groupBy("source").agg(sum(size(col("ws")).cast("long")).as("tokens"))
    perSrc
      .withColumn("total", sum(col("tokens")).over(w))
      .withColumn("n_sources", count(lit(1)).over(w))
      .withColumn("target_tokens", expr("(total div 2) div n_sources"))
      .withColumn("sample_rate",
        round(least(lit(1.0), col("target_tokens").cast("double") / col("tokens")), 6))
      .withColumn("expected_tokens", least(col("tokens"), col("target_tokens")))
      .select("source", "tokens", "target_tokens", "sample_rate", "expected_tokens")
      .orderBy("source")
  }

  val mixSourcesSql: String =
    """WITH s AS (SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
                  FROM documents GROUP BY source),
       t AS (SELECT CAST(SUM(tokens) AS BIGINT) AS total, COUNT(*) AS n_sources FROM s)
       SELECT source, tokens,
              CAST((total // 2) // n_sources AS BIGINT) AS target_tokens,
              round(LEAST(1.0, CAST((total // 2) // n_sources AS DOUBLE) / tokens), 6) AS sample_rate,
              CAST(LEAST(tokens, (total // 2) // n_sources) AS BIGINT) AS expected_tokens
       FROM s, t ORDER BY source"""

  /** L30 — Bloom-filter decontamination: the join-free variant of L18.
    * The eval set's 3-grams are folded into a 4096-bit Bloom filter
    * (k=3 md5-derived hash positions — cross-engine replayable), and
    * every corpus gram is tested by membership, not by join. Reports
    * per-doc Bloom hits next to L18's exact join count, so the false-
    * positive overshoot is visible in the output (hits ≥ exact always).
    *
    * Scale: THIS is why the Bloom variant exists — L18 shuffles the
    * full corpus gram set to meet the eval grams; here the filter is
    * 64 longs broadcast to every executor and the membership test is
    * a map-only array probe. At 100 TB of corpus the decontamination
    * pass becomes shuffle-free (the per-doc agg shuffles only doc_ids
    * that hit).
    *
    * Two-job by design: unlike the other operators in this file, plan
    * CONSTRUCTION runs a Spark job (the `bloom.collect()` below) —
    * the filter must be materialized before it can be embedded as a
    * literal in the probe plan, exactly as DuckDB's `bloom` CTE is
    * materialized before its probe joins. Harness accounting is
    * consistent: Bench times the full function call (build + probe),
    * and the DuckDB oracle likewise pays the build inside the one
    * statement. Callers embedding this in a lazy pipeline should
    * construct it at execution time, not plan-assembly time. */
  def decontaminateBloom(s: SparkSession, d: String): DataFrame = {
    // The three bloom positions are substrings of the SAME digest —
    // precompute md5 ONCE per gram row into the cache (the old
    // per-position expression re-ran md5 3× on the build side and 3×
    // per probe; slicing a pure precomputed column is value-identical,
    // and the DuckDB oracle keeps its own formulation).
    def pos(j: Int) = s"CAST(conv(substr(gmd5, ${j * 8 + 1}, 8), 16, 10) AS BIGINT) % 4096"
    // cache(): four consumers (bloom bits, bloom probe, exact-check
    // eval side, exact-check corpus side) all derive from this explode
    // — uncached, documents is scanned and re-exploded four times.
    val grams = withWords(documents(s, d))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ws) - 3), i -> concat_ws(' ', slice(ws, i + 1, 3)))"))
        .as("gram"))
      .withColumn("gmd5", md5(col("gram")))
      .cache()
    val bits = grams.filter(col("doc_id") % 97 === 0)
      .select(explode(array(expr(pos(0)), expr(pos(1)), expr(pos(2)))).as("bit"))
      .distinct()
    // Bloom bitmap packed 63 bits/word (DuckDB's `<<` raises on a
    // 1<<63 overflow, so bit 62 is the highest either engine sets):
    // 66 longs cover 4096 bits. Built distributed, collected (528 B).
    val bloom = bits
      .groupBy(expr("bit div 63").cast("int").as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit % 63 AS INT)))").as("m"))
    val bloomArr = Array.fill[Long](66)(0L)
    bloom.collect().foreach(r => bloomArr(r.getInt(0)) = r.getLong(1))
    val bloomLit = array(bloomArr.toIndexedSeq.map(lit): _*)
    val probe = grams.filter(col("doc_id") % 97 =!= 0).distinct()
      .withColumn("bloom", bloomLit)
      .withColumn("hit",
        expr(s"((element_at(bloom, CAST((${pos(0)}) div 63 AS INT) + 1) >> CAST((${pos(0)}) % 63 AS INT)) & 1) = 1 AND " +
             s"((element_at(bloom, CAST((${pos(1)}) div 63 AS INT) + 1) >> CAST((${pos(1)}) % 63 AS INT)) & 1) = 1 AND " +
             s"((element_at(bloom, CAST((${pos(2)}) div 63 AS INT) + 1) >> CAST((${pos(2)}) % 63 AS INT)) & 1) = 1"))
    val evalGrams = grams.filter(col("doc_id") % 97 === 0).select("gram").distinct()
    val exact = grams.filter(col("doc_id") % 97 =!= 0).distinct()
      .join(evalGrams, "gram").groupBy("doc_id")
      .agg(count(lit(1)).as("n_exact"))
    probe.filter(col("hit")).groupBy("doc_id")
      .agg(count(lit(1)).as("n_bloom_hits"))
      .join(exact, Seq("doc_id"), "left")
      .withColumn("n_exact", coalesce(col("n_exact"), lit(0L)))
      .orderBy(col("n_bloom_hits").desc, col("doc_id"))
      .limit(200)
  }

  val decontaminateBloomSql: String = {
    def pos(j: Int) = s"CAST(('0x' || substr(md5(gram), ${j * 8 + 1}, 8)) AS BIGINT) % 4096"
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       grams AS (
         SELECT doc_id, array_to_string(w[i:i+2], ' ') AS gram
         FROM words, (SELECT unnest(generate_series(1, len(w) - 2)) AS i)
         WHERE len(w) >= 3
       ),
       bits AS (SELECT DISTINCT b
                FROM (SELECT unnest([${pos(0)}, ${pos(1)}, ${pos(2)}]) AS b
                      FROM grams WHERE doc_id % 97 = 0)),
       bloom AS (SELECT b // 63 AS w, bit_or(CAST(1 AS BIGINT) << CAST(b % 63 AS INT)) AS m
                 FROM bits GROUP BY b // 63),
       corpus AS (SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 97 <> 0),
       probe AS (SELECT doc_id FROM corpus c
                 JOIN bloom b0 ON b0.w = (${pos(0)}) // 63
                 JOIN bloom b1 ON b1.w = (${pos(1)}) // 63
                 JOIN bloom b2 ON b2.w = (${pos(2)}) // 63
                 WHERE ((b0.m >> CAST((${pos(0)}) % 63 AS INT)) & 1) = 1
                   AND ((b1.m >> CAST((${pos(1)}) % 63 AS INT)) & 1) = 1
                   AND ((b2.m >> CAST((${pos(2)}) % 63 AS INT)) & 1) = 1),
       hits AS (SELECT doc_id, COUNT(*) AS n_bloom_hits FROM probe GROUP BY doc_id),
       eval_grams AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
       exact AS (SELECT c.doc_id, COUNT(*) AS n_exact
                 FROM corpus c JOIN eval_grams e USING (gram) GROUP BY c.doc_id)
       SELECT h.doc_id, h.n_bloom_hits, CAST(COALESCE(x.n_exact, 0) AS BIGINT) AS n_exact
       FROM hits h LEFT JOIN exact x ON h.doc_id = x.doc_id
       ORDER BY n_bloom_hits DESC, h.doc_id LIMIT 200"""
  }

  /** L31 — paragraph-level (sub-document) dedup: exact dedup at the
    * granularity real crawls actually repeat at (navigation blocks,
    * license headers, syndicated intros survive document-level dedup
    * untouched — the RefinedWeb/FineWeb motivation for line/paragraph
    * dedup). "Paragraphs" are disjoint 25-word windows (deterministic
    * and tokenizer-free), content-addressed by md5; a paragraph is
    * duplicated if it appears in ≥2 distinct docs.
    *
    * Scale: map-only paragraph explode (sequence+posexplode in
    * codegen), ONE shuffle on the paragraph hash with a map-side
    * partial agg, broadcast-size result re-joined per doc. Never
    * doc×doc; the hash-key shuffle is the same cardinality as the
    * corpus token count ÷ 25. */
  def paragraphDedup(s: SparkSession, d: String): DataFrame = {
    // cache(): three consumers (duplicate-hash agg, the semi-join
    // probe, the per-doc paragraph counts) all read this explode —
    // uncached, the scan + window explode + md5 run three times.
    val paras = withWords(documents(s, d))
      .withColumn("k", (size(col("ws")) / 25).cast("int"))
      .filter(col("k") >= 1)
      .select(col("doc_id"),
        posexplode(expr("transform(sequence(0, k - 1), i -> concat_ws(' ', slice(ws, i * 25 + 1, 25)))")))
      .select(col("doc_id"), md5(col("col")).as("ph"))
      .cache()
    val dupHashes = paras.groupBy("ph")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select("ph")
    paras.join(dupHashes, Seq("ph"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_paras"))
      .join(paras.groupBy("doc_id").agg(count(lit(1)).as("n_paras")), Seq("doc_id"), "right")
      .withColumn("n_dup_paras", coalesce(col("n_dup_paras"), lit(0L)))
      .select("doc_id", "n_paras", "n_dup_paras")
      .orderBy(col("n_dup_paras").desc, col("doc_id")).limit(100)
  }

  val paragraphDedupSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       k AS (SELECT doc_id, ws, len(ws) // 25 AS k FROM w WHERE len(ws) // 25 >= 1),
       e AS (SELECT doc_id, ws, unnest(range(k)) AS i FROM k),
       p AS (SELECT doc_id, md5(array_to_string(ws[i * 25 + 1 : i * 25 + 25], ' ')) AS ph
             FROM e),
       dup AS (SELECT ph FROM p GROUP BY ph HAVING COUNT(DISTINCT doc_id) >= 2),
       per AS (SELECT doc_id, COUNT(*) AS n_paras FROM p GROUP BY doc_id),
       d AS (SELECT doc_id, COUNT(*) AS n_dup_paras FROM p WHERE ph IN (SELECT ph FROM dup)
             GROUP BY doc_id)
       SELECT per.doc_id, per.n_paras, COALESCE(d.n_dup_paras, 0) AS n_dup_paras
       FROM per LEFT JOIN d ON per.doc_id = d.doc_id
       ORDER BY n_dup_paras DESC, per.doc_id LIMIT 100"""

  /** L32 — train/eval split leakage audit: assign every doc to a
    * deterministic hash split (90% train / 10% eval on an md5-derived
    * digit — reproducible across engines and re-runs, the property a
    * training pipeline needs from its splitter), then surface
    * train↔eval pairs sharing ≥5 distinct word 3-grams — near-dup
    * leakage that would contaminate the held-out loss.
    *
    * Scale: the pair search is the L4 shingle equi-join restricted
    * across the split boundary (shuffle on the shingle key, never
    * doc×doc), over the [[GramDfCeiling]]-capped gram universe so a
    * stopword-class gram cannot make the per-gram match set
    * 0.9·N × 0.1·N. At 100 TB the same audit runs on L2's MinHash
    * bands instead of raw shingles; the split assignment itself is
    * map-only either way. */
  def splitLeakage(s: SparkSession, d: String): DataFrame = {
    // is_train is a pure function of doc_id, and every gram row
    // already carries doc_id — deriving it inline removes a second
    // documents scan plus the doc_id join on BOTH sides of the
    // train×eval gram join that the old shape paid (same rows: every
    // sh doc_id exists in documents by construction).
    val isTrain =
      expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)") % 10 < 9
    val sh = dfCapped(shingles(documents(s, d))).withColumn("is_train", isTrain)
    val train = sh.filter(col("is_train")).select(col("doc_id").as("train_doc"), col("s"))
    val eval_ = sh.filter(!col("is_train")).select(col("doc_id").as("eval_doc"), col("s"))
    train.join(eval_, "s")
      .groupBy("train_doc", "eval_doc")
      .agg(count(lit(1)).as("shared_grams"))
      .filter(col("shared_grams") >= 5)
      .orderBy(col("shared_grams").desc, col("train_doc"), col("eval_doc"))
      .limit(100)
  }

  val splitLeakageSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       sh0 AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS s
               FROM w, (SELECT unnest(generate_series(1, len(ws) - 2)) AS i)
               WHERE len(ws) >= 3),
       sh AS (SELECT * FROM sh0 WHERE s NOT IN
                (SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) > 64)),
       sp AS (SELECT doc_id,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 9 AS is_train
              FROM documents),
       j AS (SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc, COUNT(*) AS shared_grams
             FROM (SELECT sh.doc_id, s FROM sh JOIN sp ON sh.doc_id = sp.doc_id WHERE is_train) t
             JOIN (SELECT sh.doc_id, s FROM sh JOIN sp ON sh.doc_id = sp.doc_id WHERE NOT is_train) e
               ON t.s = e.s
             GROUP BY t.doc_id, e.doc_id)
       SELECT train_doc, eval_doc, shared_grams FROM j WHERE shared_grams >= 5
       ORDER BY shared_grams DESC, train_doc, eval_doc LIMIT 100"""

  /** L33 — sequence-length bucketing: assign every doc's token count
    * to a power-of-two context bucket (case ladder — no libm log2, so
    * both engines agree bitwise) and report per-bucket volume plus
    * the padding waste a naive pad-to-bucket batcher would pay. The
    * padding column is the number L23's packing exists to reclaim.
    *
    * Scale: map-only classify + one tiny agg (map-side combine onto
    * ≤8 groups). */
  def lengthBuckets(s: SparkSession, d: String): DataFrame = {
    val caseLadder =
      """CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32 WHEN n <= 64 THEN 64
              WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
              WHEN n <= 1024 THEN 1024 ELSE n END"""
    withWords(documents(s, d))
      .select(size(col("ws")).cast("long").as("n"))
      .withColumn("bucket", expr(caseLadder).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n")).as("total_tokens"),
           sum(col("bucket") - col("n")).cast("long").as("padding_tokens"))
      .orderBy("bucket")
  }

  val lengthBucketsSql: String =
    """WITH n AS (SELECT len(string_split(text, ' ')) AS n FROM documents),
       b AS (SELECT n, CASE WHEN n <= 16 THEN 16 WHEN n <= 32 THEN 32 WHEN n <= 64 THEN 64
                            WHEN n <= 128 THEN 128 WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
                            WHEN n <= 1024 THEN 1024 ELSE n END AS bucket
             FROM n)
       SELECT CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS n_docs,
              CAST(SUM(n) AS BIGINT) AS total_tokens,
              CAST(SUM(bucket - n) AS BIGINT) AS padding_tokens
       FROM b GROUP BY bucket ORDER BY bucket"""

  /** L34 — winnowing fingerprint dedup (the MOSS scheme, Schleimer et
    * al. SIGMOD'03): per doc, hash every 4-word shingle (cross-engine
    * md5-prefix 60-bit), slide a window of 5 consecutive shingle
    * hashes and keep each window's MINIMUM as a fingerprint. The
    * guarantee position-sampling (L11) lacks: any shared run of ≥ 8
    * words yields at least one IDENTICAL fingerprint in both docs, so
    * matches cannot be missed by phase alignment, while only ~2/w of
    * hashes are retained. Pairs then surface via a fingerprint
    * equi-join with a shared-count cut.
    *
    * Scale: shingle hash + window-min are map-side per doc (one
    * in-partition window sort per doc, no corpus shuffle); the only
    * corpus-wide exchange is the fingerprint equi-join — shuffle keyed
    * on the fingerprint value, never doc×doc, same cardinality shape
    * as L2's band buckets. */
  /** Winnowing fingerprint set of a (doc_id, text) frame — the L34
    * selection stage alone, reusable so the guarantee is property-
    * testable on planted inputs: k=4-word shingles, w=5 hash windows,
    * window-min retained. */
  def winnowFingerprints(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-4, 0)
    docs.withColumn("ws", split(col("text"), " "))
      .withColumn("n", size(col("ws")))
      .filter(col("n") >= 4)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, n - 3), i -> concat_ws(' ', slice(ws, i, 4)))")))
      .select(col("doc_id"), col("pos"),
        expr("CAST(conv(substr(md5(col), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .withColumn("fp", min(col("h")).over(w))
      .filter(col("pos") >= 4)
      .select("doc_id", "fp").distinct()
  }

  def winnowDedup(s: SparkSession, d: String): DataFrame = {
    // cache(): the fingerprint self-join otherwise re-runs the whole
    // selection stage (scan → 4-gram explode → per-doc window-min)
    // once per join side.
    val fps = winnowFingerprints(documents(s, d).select("doc_id", "text")).cache()
    fps.select(col("doc_id").as("doc_a"), col("fp"))
      .join(fps.select(col("doc_id").as("doc_b"), col("fp")), "fp")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 5)
      .orderBy(col("n_shared").desc, col("doc_a"), col("doc_b"))
      .limit(100)
  }

  val winnowDedupSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
                  WHERE len(string_split(text, ' ')) >= 4),
       g AS (SELECT doc_id, i - 1 AS pos, array_to_string(ws[i:i+3], ' ') AS gram
             FROM w, UNNEST(range(1, len(ws) - 2)) t(i)),
       h AS (SELECT doc_id, pos,
                    CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT) AS h
             FROM g),
       m AS (SELECT doc_id, pos,
                    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS fp
             FROM h),
       fps AS (SELECT DISTINCT doc_id, fp FROM m WHERE pos >= 4),
       pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
                 FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
       SELECT doc_a, doc_b, n_shared FROM pairs WHERE n_shared >= 5
       ORDER BY n_shared DESC, doc_a, doc_b LIMIT 100"""

  /** L37 — token-distribution (Zipf) audit: per source, the top-10
    * token frequency table with rank, rank·freq product and running
    * cumulative mass — the corpus-health dashboard a curation run
    * checks before training (a healthy natural-language source has
    * rank·freq roughly flat; a constant product collapsing to a few
    * tokens flags boilerplate or templating). All counts stay in
    * integer space — no libm log — so both engines agree bitwise.
    *
    * Scale: explode → two-phase (source, token) count with map-side
    * combine, then a per-source top-10 window over the (small)
    * aggregated table. The corpus-sized shuffle is the token count
    * agg; the window runs on groups already ≤ distinct-token
    * cardinality. */
  def zipfAudit(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = withWords(documents(s, d))
      .select(col("source"), explode(col("ws")).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy("source").orderBy(col("freq").desc, col("token"))
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .withColumn("rank_freq", (col("rank") * col("freq")).cast("long"))
      .withColumn("cum_freq", sum(col("freq"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .select("source", "rank", "token", "freq", "rank_freq", "cum_freq")
      .orderBy("source", "rank")
  }

  val zipfAuditSql: String =
    """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
       c AS (SELECT source, token, COUNT(*) AS freq FROM t GROUP BY 1, 2),
       r AS (SELECT source, token, freq,
                    ROW_NUMBER() OVER (PARTITION BY source ORDER BY freq DESC, token) AS rank,
                    SUM(freq) OVER (PARTITION BY source ORDER BY freq DESC, token
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_freq
             FROM c)
       SELECT source, CAST(rank AS BIGINT) AS rank, token, freq,
              CAST(rank * freq AS BIGINT) AS rank_freq,
              CAST(cum_freq AS BIGINT) AS cum_freq
       FROM r WHERE rank <= 10 ORDER BY source, rank"""

  /** L38 — cross-source contamination matrix: for every source pair,
    * the number of distinct word 3-grams both contain, normalized by
    * each side's gram vocabulary — the corpus-level complement of the
    * doc-level dedups: syndication or scraping overlap BETWEEN
    * sources shows up here even when no single doc pair crosses a
    * near-dup threshold (and a high ratio says one source is largely
    * contained in another — drop or down-weight it in L29's mix).
    *
    * Scale: distinct (source, gram) is one explode + one hash
    * aggregation; the pair join shuffles on the gram key and only
    * source-pair counters come out — never doc×doc, never gram lists
    * to the driver. Cardinality = shared-gram occurrences ×
    * source-pair fanout (sources are few by construction). */
  def sourceOverlap(s: SparkSession, d: String): DataFrame = {
    // r16 one-shuffle form (guide §2.4): ONE gram-keyed aggregation
    // replaces the old distinct + self-join + vocab re-aggregation —
    // collect_set(source) per gram dedups (source, gram) map-side
    // inside the same exchange the distinct used to pay, and every
    // downstream fact (per-source vocab size, per-pair shared count)
    // is a counter over the per-gram source sets: singleton markers
    // count each source's vocabulary, a<b pairs count shared grams.
    // Plan: 3 corpus-wide exchanges + a gram self-join -> 1 exchange;
    // per-gram fanout is |sources|²/2, the same bound the join had
    // (sources are few by construction). The final counters frame is
    // |sources|² rows — cached because vocab and pairs both read it,
    // and recomputing it means the whole corpus pass.
    val perGram = withWords(documents(s, d))
      .select(col("source"),
        explode(expr("transform(sequence(1, greatest(size(ws) - 2, 0)), i -> concat_ws(' ', slice(ws, i, 3)))")).as("g"))
      .groupBy("g").agg(array_sort(collect_set(col("source"))).as("srcs"))
    val counters = perGram
      .select(explode(concat(
        expr("transform(srcs, a -> struct(a AS src_a, CAST(NULL AS STRING) AS src_b))"),
        expr("flatten(transform(srcs, a -> transform(filter(srcs, b -> b > a), b -> struct(a AS src_a, b AS src_b))))")
      )).as("e"))
      .groupBy(col("e.src_a").as("src_a"), col("e.src_b").as("src_b"))
      .agg(count(lit(1)).as("n"))
      .cache()
    val vocab = counters.filter(col("src_b").isNull)
      .select(col("src_a").as("source"), col("n").as("n_grams"))
    counters.filter(col("src_b").isNotNull)
      .select(col("src_a"), col("src_b"), col("n").as("shared_grams"))
      .join(broadcast(vocab.select(col("source").as("src_a"), col("n_grams").as("grams_a"))), "src_a")
      .join(broadcast(vocab.select(col("source").as("src_b"), col("n_grams").as("grams_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("shared_grams"), col("grams_a"), col("grams_b"),
        round(col("shared_grams") / least(col("grams_a"), col("grams_b")), 4).as("containment"))
      .orderBy(col("shared_grams").desc, col("src_a"), col("src_b"))
  }

  val sourceOverlapSql: String =
    """WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
       g AS (SELECT DISTINCT source, array_to_string(ws[i:i+2], ' ') AS g
             FROM w, UNNEST(range(1, greatest(len(ws) - 1, 1))) t(i)),
       vocab AS (SELECT source, COUNT(*) AS n_grams FROM g GROUP BY source),
       p AS (SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared_grams
             FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
             GROUP BY 1, 2)
       SELECT src_a, src_b, shared_grams, va.n_grams AS grams_a, vb.n_grams AS grams_b,
              ROUND(shared_grams / least(va.n_grams, vb.n_grams), 4) AS containment
       FROM p JOIN vocab va ON p.src_a = va.source
              JOIN vocab vb ON p.src_b = vb.source
       ORDER BY shared_grams DESC, src_a, src_b"""

  /** L41 — BPE merge-candidate mining: corpus-wide counts of adjacent
    * character pairs inside words — the statistic the first byte-pair
    * -encoding merge is chosen from (and re-run per round, the whole
    * tokenizer-training inner loop; here surfaced as the top-25
    * table). One explode to O(corpus chars) pair rows, map-side
    * combine into the pair counter; integer-exact, no driver state. */
  def bpePairs(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("n").desc, col("pair"))
    withWords(documents(s, d))
      .select(explode(col("ws")).as("w"))
      // slice-to-(len-1) guards 0/1-char words: Spark's sequence(1,0)
      // would DESCEND, not empty out like the oracle's range(1,1)
      .select(explode(expr(
        """slice(transform(sequence(1, greatest(char_length(w) - 1, 1)), i -> substr(w, i, 2)),
                 1, greatest(char_length(w) - 1, 0))""")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 25)
      .select(col("rank"), col("pair"), col("n"))
      .orderBy("rank")
  }

  val bpePairsSql: String =
    """WITH words AS (
         SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       pairs AS (
         SELECT unnest(list_transform(range(1, greatest(len(w), 1)),
                  i -> substr(w, CAST(i AS INTEGER), 2))) AS pair
         FROM words),
       c AS (SELECT pair, COUNT(*) AS n FROM pairs GROUP BY pair),
       r AS (SELECT pair, n,
                    ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rank
             FROM c)
       SELECT rank, pair, n FROM r WHERE rank <= 25 ORDER BY rank"""

  /** L40 — filter-funnel audit: the curation cascade's per-stage
    * retention table (rows in → rows out → retention) for a chain of
    * cumulative quality gates. This is the report that tells you
    * WHICH filter ate the corpus — the first thing to look at when a
    * 100 TB run comes back 40% smaller than planned. One scan: all
    * four gates are integer-only row-local predicates (no float
    * drift), folded into one aggregate row, then unpivoted to stage
    * rows with `stack` — the output is 4 rows regardless of corpus
    * size. */
  def filterFunnel(s: SparkSession, d: String): DataFrame = {
    val gated = withWords(documents(s, d))
      .withColumn("p1", col("n_chars") >= 100)
      .withColumn("p2", col("p1") && size(col("ws")) >= 20)
      // mean word length ≤ 8 chars, in exact integer form
      .withColumn("p3", col("p2") && col("n_chars") <= size(col("ws")) * 8)
      // vocabulary diversity: ≥ half the words distinct
      .withColumn("p4", col("p3") && size(array_distinct(col("ws"))) * 2 >= size(col("ws")))
    gated.agg(
        count(lit(1)).as("n0"),
        sum(col("p1").cast("long")).as("n1"),
        sum(col("p2").cast("long")).as("n2"),
        sum(col("p3").cast("long")).as("n3"),
        sum(col("p4").cast("long")).as("n4"))
      .selectExpr(
        """stack(4,
             1L, 'min_chars',     n0, n1,
             2L, 'min_words',     n1, n2,
             3L, 'word_length',   n2, n3,
             4L, 'vocab_diversity', n3, n4)
           AS (stage, gate, rows_in, rows_out)""")
      .withColumn("retention", round(col("rows_out") / col("rows_in"), 4))
      .orderBy("stage")
  }

  val filterFunnelSql: String =
    """WITH f AS (SELECT n_chars, string_split(text, ' ') AS ws FROM documents),
       g AS (SELECT n_chars >= 100 AS p1,
                    n_chars >= 100 AND len(ws) >= 20 AS p2,
                    n_chars >= 100 AND len(ws) >= 20 AND n_chars <= len(ws) * 8 AS p3,
                    n_chars >= 100 AND len(ws) >= 20 AND n_chars <= len(ws) * 8
                      AND len(list_distinct(ws)) * 2 >= len(ws) AS p4
             FROM f),
       a AS (SELECT COUNT(*) AS n0,
                    COUNT(*) FILTER (p1) AS n1, COUNT(*) FILTER (p2) AS n2,
                    COUNT(*) FILTER (p3) AS n3, COUNT(*) FILTER (p4) AS n4
             FROM g)
       SELECT stage, gate, rows_in, rows_out,
              ROUND(rows_out / rows_in, 4) AS retention
       FROM (
         SELECT CAST(1 AS BIGINT) AS stage, 'min_chars' AS gate, n0 AS rows_in, n1 AS rows_out FROM a
         UNION ALL SELECT 2, 'min_words', n1, n2 FROM a
         UNION ALL SELECT 3, 'word_length', n2, n3 FROM a
         UNION ALL SELECT 4, 'vocab_diversity', n3, n4 FROM a)
       ORDER BY stage"""

  /** L42 — quantized character-bigram LM scoring (the CCNet/KenLM
    * perplexity-filter shape, self-trained): ONE pass counts every
    * word-internal character pair, conditional probabilities
    * P(c₂|c₁) = cnt/prefix-total become an integer MILLIBIT cost table
    * (round(-1000·ln p) — quantized once per DISTINCT bigram, so the
    * only cross-engine float op runs over the ~1k-row model, never the
    * corpus), and each document's cost is an integer sum + one exact
    * division. High avg cost = character sequences the corpus finds
    * improbable = gibberish candidates.
    *
    * Scale: pair explode is O(corpus chars) map-side; the model is a
    * two-level count agg (map-side combine); scoring is a broadcast
    * join of the tiny cost table onto the exploded pairs — at 100 TB
    * the model still fits in KBs (alphabet², not vocabulary). */
  def bigramLm(s: SparkSession, d: String): DataFrame = {
    val pairExpr =
      """slice(transform(sequence(1, greatest(char_length(w) - 1, 1)), i -> substr(w, i, 2)),
               1, greatest(char_length(w) - 1, 0))"""
    val docPairs = withWords(documents(s, d))
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .select(col("doc_id"), explode(expr(pairExpr)).as("pair"))
    val pairCnt = docPairs.groupBy("pair").agg(count(lit(1)).as("cnt"))
    val prefixCnt = pairCnt.groupBy(substring(col("pair"), 1, 1).as("pfx"))
      .agg(sum("cnt").as("ct"))
    val costs = pairCnt
      .join(prefixCnt, substring(col("pair"), 1, 1) === col("pfx"))
      .select(col("pair"),
        round(lit(-1000.0) * log(col("cnt").cast("double") / col("ct"))).cast("long").as("mb"))
    // Score only the reported docs: doc_id < 300 commutes with the
    // per-doc aggregate, so filtering BEFORE the scoring join prunes
    // the probe side to the output set (and reaches the parquet scan
    // as a pushed doc_id predicate) instead of scoring the whole
    // corpus and discarding it. The MODEL above still sees every doc.
    docPairs.filter(col("doc_id") < 300).join(broadcast(costs), "pair")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"), sum("mb").as("total_mb"))
      .withColumn("avg_mb", round(col("total_mb").cast("double") / col("n_pairs"), 4))
      .select("doc_id", "n_pairs", "total_mb", "avg_mb")
      .orderBy("doc_id")
  }

  val bigramLmSql: String =
    """WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       dp AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(w), 1)),
                i -> substr(w, CAST(i AS INTEGER), 2))) AS pair FROM words),
       pc AS (SELECT pair, COUNT(*) AS cnt FROM dp GROUP BY pair),
       px AS (SELECT substr(pair, 1, 1) AS pfx, SUM(cnt) AS ct FROM pc GROUP BY pfx),
       cost AS (SELECT pair,
                       CAST(round(-1000.0 * ln(CAST(cnt AS DOUBLE) / ct)) AS BIGINT) AS mb
                FROM pc JOIN px ON substr(pair, 1, 1) = pfx),
       sc AS (SELECT doc_id, COUNT(*) AS n_pairs, SUM(mb) AS total_mb
              FROM dp JOIN cost USING (pair) GROUP BY doc_id)
       SELECT doc_id, n_pairs, CAST(total_mb AS BIGINT) AS total_mb,
              ROUND(CAST(total_mb AS DOUBLE) / n_pairs, 4) AS avg_mb
       FROM sc WHERE doc_id < 300 ORDER BY doc_id"""

  /** L44 — temperature-based source mixing (α = 0.5): sampling
    * weights ∝ tokens^α instead of L29's uniform target — the
    * standard up-weighting of small high-quality sources (α < 1
    * flattens the source distribution, α = 1 is proportional). Float
    * discipline: sqrt is IEEE-correctly-rounded (bit-identical in
    * both engines), each weight is then frozen as DECIMAL(28,10) so
    * the cross-source SUM is order-independent, and the share is one
    * exact-decimal→double division. Same shapes as L29: per-source
    * agg + a broadcast one-row total. */
  def mixTemperature(s: SparkSession, d: String): DataFrame = {
    // r16: same one-pass window-totals shape as mixSources (no cache,
    // no self-join; the window sees only |sources| aggregated rows).
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val perSrc = withWords(documents(s, d))
      .groupBy("source").agg(sum(size(col("ws")).cast("long")).as("tokens"))
      .withColumn("w", sqrt(col("tokens").cast("double"))
        .cast(org.apache.spark.sql.types.DecimalType(28, 10)))
    perSrc
      .withColumn("tw", sum(col("w")).over(win))
      .withColumn("total", sum(col("tokens")).over(win))
      .withColumn("share", col("w").cast("double") / col("tw").cast("double"))
      .withColumn("target_tokens",
        floor(expr("(total div 2)").cast("double") * col("share")).cast("long"))
      .select(col("source"), col("tokens"),
        round(col("share"), 6).as("mix_weight"),
        col("target_tokens"),
        round(least(lit(1.0),
          col("target_tokens").cast("double") / col("tokens")), 6).as("sample_rate"))
      .orderBy("source")
  }

  val mixTemperatureSql: String =
    """WITH s AS (SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
                  FROM documents GROUP BY source),
       w AS (SELECT source, tokens,
                    CAST(sqrt(CAST(tokens AS DOUBLE)) AS DECIMAL(28,10)) AS w
             FROM s),
       t AS (SELECT SUM(w) AS tw, CAST(SUM(tokens) AS BIGINT) AS total FROM w)
       SELECT source, tokens,
              ROUND(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE), 6) AS mix_weight,
              CAST(FLOOR(CAST(total // 2 AS DOUBLE) *
                   (CAST(w AS DOUBLE) / CAST(tw AS DOUBLE))) AS BIGINT) AS target_tokens,
              ROUND(LEAST(1.0,
                CAST(FLOOR(CAST(total // 2 AS DOUBLE) *
                     (CAST(w AS DOUBLE) / CAST(tw AS DOUBLE))) AS DOUBLE) / tokens), 6)
                AS sample_rate
       FROM w, t ORDER BY source"""

  /** L43 — quality-aware canonical dedup: near-dup clusters (L14's
    * connected components) resolved to ONE survivor each by arg-max
    * quality (L9's score, ties to the smallest doc_id) — the keeper
    * policy that makes dedup actually DROP something without throwing
    * away the best copy. One window over the clustered docs; cluster
    * frames are tiny (near-dup groups), so the window never skews. */
  def canonicalDedup(s: SparkSession, d: String): DataFrame = {
    val comp = dedupComponents(s, d)
    val q = textQuality(s, d).select(col("doc_id"), col("quality_score"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
      .orderBy(col("quality_score").desc, col("doc_id"))
    comp.join(q, "doc_id")
      .withColumn("rk", row_number().over(w))
      .withColumn("n_docs",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("component")))
      .filter(col("rk") === 1)
      .select(col("component"), col("n_docs"), col("doc_id").as("keep_doc"),
        col("quality_score").as("keep_quality"),
        (col("n_docs") - 1).as("n_dropped"))
      .orderBy("component")
  }

  val canonicalDedupSql: String = {
    val list = stops("en").map(w => s"'$w'").mkString(", ")
    s"""WITH RECURSIVE $componentCtes,
       comp AS (SELECT id AS doc_id, MIN(lbl) AS component FROM reach GROUP BY id),
       qf AS (SELECT doc_id, string_split(text, ' ') AS ws, text FROM documents),
       q AS (SELECT doc_id,
                    ROUND(0.4 * ln(CAST(len(ws) AS DOUBLE)) +
                          0.4 * (CAST(len(list_filter(ws, w -> w IN ($list))) AS DOUBLE) / len(ws)) -
                          0.2 * (CAST(len(regexp_extract_all(text, '[.,!?]')) AS DOUBLE) / len(ws)), 4)
                      AS quality_score
             FROM qf),
       j AS (SELECT component, comp.doc_id, quality_score
             FROM comp JOIN q ON comp.doc_id = q.doc_id),
       r AS (SELECT component, doc_id, quality_score,
                    ROW_NUMBER() OVER (PARTITION BY component
                                       ORDER BY quality_score DESC, doc_id) AS rk,
                    COUNT(*) OVER (PARTITION BY component) AS n_docs
             FROM j)
       SELECT component, n_docs, doc_id AS keep_doc, quality_score AS keep_quality,
              n_docs - 1 AS n_dropped
       FROM r WHERE rk = 1 ORDER BY component"""
  }

  /** L45 — CDC-incremental corpus dedup: the L24 ingest gate driven by
    * the catalog changelog (C24/C61) instead of a full-corpus
    * re-anti-join. The corpus hash ledger is a catalog table; each
    * commit window's churn — row-level insert/delete events from
    * [[graft.catalog.TableOps.changes]] — updates the dedup stats, so
    * a continuously-replicated corpus dedups ONLY the window's rows:
    * O(churn) per sync instead of O(corpus), the difference between a
    * streaming ingest gate and a nightly full-table rescan at 100 TB.
    *
    * Deterministic simulation over the documents table: three append
    * commits (docs split by doc_id % 3) with a deletion-vector DELETE
    * of the live German docs interleaved after the second. Every
    * window's numbers come ONLY from the changelog feed; the DuckDB
    * oracle recomputes the identical timeline relationally from raw
    * documents, so the hash match proves the CDC view equals ground
    * truth across interleaved appends and deletes. Output per commit:
    * rows inserted / deleted in the window, distinct NEW content
    * hashes vs the pre-window live set, and the live row count after.
    *
    * Scale shape (the whole point of the operator): the hash ledger is
    * ITSELF a catalog table, updated with O(churn) commits — window
    * inserts APPEND, window deletes land as merge-on-read equality
    * deletes (C25: O(keys) write, zero data-file rewrite) — and the
    * post-window live count is a pure metadata read (manifest data-row
    * counts minus eq-delete key counts; exact because a dedup ledger
    * has unique keys and the CDC feed only ever deletes live keys).
    * Per window the only corpus-proportional work is the READ-ONLY
    * new-hash membership probe: the ledger STREAMS through a semi
    * join against the broadcast window-hash set (one column-pruned
    * scan, zero ledger-sized shuffle/broadcast — the L24 ingest-gate
    * check with the join direction chosen for the 100 TB side);
    * nothing corpus-sized is ever rewritten, shuffled wide, or
    * counted with a scan. At 100 TB with daily syncs, a window costs
    * the day's churn plus one streamed ledger probe — not a daily
    * full-corpus materialization.
    */
  private val cdcCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  def dedupCdc(s: SparkSession, d: String): DataFrame = dedupCdcWithDirs(s, d)._1

  /** [[dedupCdc]] plus the corpus/ledger table directories, so tests
    * can audit the ledger's commit timeline (append-only data files,
    * eq-delete-only removals — the O(churn) proof). */
  private[graft] def dedupCdcWithDirs(
      s: SparkSession, d: String): (DataFrame, String, String) = {
    import graft.catalog._
    import org.apache.hadoop.fs.{Path => HPath}
    val ops = new TableOps(new FsStore(s.sparkContext.hadoopConfiguration))
    val wh = cdcCache.computeIfAbsent(d, { _ =>
      val whPath = java.nio.file.Files.createTempDirectory("graft-cdc-")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(whPath.toFile)
      }))
      val tdir = new HPath(whPath.toString, "corpus_cdc")
      val src = documents(s, d).select(col("doc_id"), col("lang"), md5(col("text")).as("h"))
      ops.create(tdir, TableMetadata.create(
        tdir.toString, SchemaBridge.fromSpark(src.schema),
        PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty), Map.empty))
      ops.write(tdir, src.filter(col("doc_id") % 3 === 0), "append")
      ops.write(tdir, src.filter(col("doc_id") % 3 === 1), "append")
      ops.deletionVectorDelete(s, tdir, col("lang") === "de")
      ops.write(tdir, src.filter(col("doc_id") % 3 === 2), "append")
      whPath.toString
    })
    val dir = new HPath(wh, "corpus_cdc")
    // the walk is memoized per sf-dir, like the corpus table above: a
    // production ledger is a long-lived table advancing with the
    // replication watermark — it never replays history, so repeated
    // calls here shouldn't either. First call pays the real
    // O(windows × churn) cost; the memo keeps (result rows, dirs) and
    // the ledger table stays on disk for auditing.
    val (rows, ledgerDirStr) = cdcWalkCache.computeIfAbsent(d, { _ =>
      val ledgerRoot = java.nio.file.Files.createTempDirectory("graft-cdc-ledger-")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(ledgerRoot.toFile)
      }))
      val ledgerDir = new HPath(ledgerRoot.toString, "ledger")
      (cdcWalkRows(s, ops, dir, ledgerDir), ledgerDir.toString)
    })
    import s.implicits._
    val df = rows.toDF("seq", "n_ins", "n_del", "n_new", "live_docs").orderBy("seq")
    (df, dir.toString, ledgerDirStr)
  }

  /** The pre-window membership probe: already-live hashes among the
    * window's distinct hashes `insH`. The LEDGER streams through a
    * semi join against the BROADCAST window set — plan shape pinned in
    * PipelineSpec (BroadcastHashJoin LeftSemi, no ledger-side
    * sort-merge): the 100 TB side is never shuffled or broadcast. */
  private[graft] def ledgerProbe(
      s: SparkSession,
      ops: graft.catalog.TableOps,
      ledgerDir: org.apache.hadoop.fs.Path,
      insH: DataFrame): DataFrame =
    ops.read(s, ledgerDir).select("h")
      .join(broadcast(insH), Seq("h"), "left_semi")
      .distinct()

  /** Memo of the completed walk per sf-dir: (result rows, ledger table
    * dir). See [[dedupCdcWithDirs]]. */
  private val cdcWalkCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Seq[(Long, Long, Long, Long, Long)], String)]()

  /** Row-count gate for the CDC walk's driver-side direct commits: a
    * window at or below this many churn rows (~5 MB of (doc_id, h))
    * is collected and written as one parquet file by the driver —
    * Spark's per-write job setup costs more than moving the bytes.
    * Above it, the distributed write path runs with full parallelism.
    * Tests can force either path by sizing their windows. */
  private[graft] val CdcLocalCommitRows = 100000L

  /** Drop the memoized walk for `d` so the next [[dedupCdc]] call pays
    * the full cold ledger walk again. Bench uses this before every
    * measured run: the memo is the right PRODUCTION behavior (a ledger
    * advances with the watermark, it never replays history) but a memo
    * read is not the documented walk cost, so the benchmark clears it
    * to measure the walk itself. */
  private[graft] def clearCdcWalkMemo(d: String): Unit = { cdcWalkCache.remove(d); () }

  /** The ledger walk proper: replays `corpusDir`'s commit windows into
    * a catalog-table hash ledger at `ledgerDir` (created here), one
    * O(churn) commit pair per window, live counts from metadata only. */
  private[graft] def cdcLedgerWalk(
      s: SparkSession,
      ops: graft.catalog.TableOps,
      corpusDir: org.apache.hadoop.fs.Path,
      ledgerDir: org.apache.hadoop.fs.Path): DataFrame = {
    import s.implicits._
    cdcWalkRows(s, ops, corpusDir, ledgerDir)
      .toDF("seq", "n_ins", "n_del", "n_new", "live_docs").orderBy("seq")
  }

  private def cdcWalkRows(
      s: SparkSession,
      ops: graft.catalog.TableOps,
      corpusDir: org.apache.hadoop.fs.Path,
      ledgerDir: org.apache.hadoop.fs.Path): Seq[(Long, Long, Long, Long, Long)] = {
    import graft.catalog._
    // Dev-only phase marks (GRAFT_CDC_MARKS=1): per-phase wall times on
    // stderr so the walk's driver-side fixed costs stay attributable
    // without a profiler. Never set by the driver; zero cost when off.
    val marksOn = sys.env.get("GRAFT_CDC_MARKS").contains("1")
    var markT0 = System.nanoTime()
    def mark(phase: String): Unit = if (marksOn) {
      val t = System.nanoTime()
      System.err.println(f"[cdc] $phase%-28s ${(t - markT0) / 1e9}%7.3f s")
      markT0 = t
    }
    val ledgerSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("h",
        org.apache.spark.sql.types.StringType, nullable = true)))
    // C77 distribution-mode `none` on the ledger: its inputs are
    // slices of the already-materialized churn feed, so the default
    // `range` mode's pre-write sampling pass + shuffle buy nothing for
    // an unpartitioned, unsorted hash ledger — each commit binds its
    // file count with a shuffle-free coalesce instead.
    ops.create(ledgerDir, TableMetadata.create(
      ledgerDir.toString, SchemaBridge.fromSpark(ledgerSchema),
      PartitionSpec(0, Seq.empty), SortOrder(0, Seq.empty),
      Map("graft.write.distribution-mode" -> "none")))
    val seqs = ops.load(corpusDir).get._2.snapshots.map(_.sequenceNumber).sorted
    val out = Seq.newBuilder[(Long, Long, Long, Long, Long)]
    // ONE changelog scan covers every window — changes() tags each row
    // with its `_commit_seq`, and the per-snapshot slices of one
    // (0, last] call are row-identical to the per-window calls — and
    // ONE eager materialization serves every downstream consumer. The
    // r14 walk re-planned the changelog per window: 4 changes() plans
    // (each a load + manifest resolve + readEntries union) and 4
    // checkpoint jobs where one of each suffices. At 100 TB this is
    // the same O(total churn) bytes either way; the win is 3 fewer
    // full plan+materialize rounds of fixed cost.
    mark("create+load")
    val feed = ops.changes(s, corpusDir, 0L, seqs.max)
      .select("doc_id", "h", "_change_type", "_commit_seq")
      .localCheckpoint(true)
    mark("changes+checkpoint")
    // Every window's insert/delete row count AND distinct-insert-hash
    // count in ONE aggregate job over the cached feed (the r14 walk
    // spent 2 actions per window on these).
    val winStats = feed.groupBy("_commit_seq", "_change_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("h")).as("nh"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    mark("winStats")
    // Ledger emptiness is a walk-local fact (we are the only writer);
    // tracking it avoids a metadata load per window.
    var ledgerHasRows = false
    seqs.foreach { sq =>
      val ins = feed.filter(col("_commit_seq") === sq &&
        col("_change_type") === "insert").select("doc_id", "h")
      val del = feed.filter(col("_commit_seq") === sq &&
        col("_change_type") === "delete").select("doc_id", "h")
      val nIns = winStats.get((sq, "insert")).map(_._1).getOrElse(0L)
      val nDel = winStats.get((sq, "delete")).map(_._1).getOrElse(0L)
      val distinctInsH = winStats.get((sq, "insert")).map(_._2).getOrElse(0L)
      // the one read-only corpus-proportional step: exact new-hash
      // detection needs membership against the pre-window live set.
      // Join DIRECTION matters at 100 TB: the ledger STREAMS through a
      // semi join against the BROADCAST window hashes — one pruned
      // scan, no ledger-sized shuffle or broadcast (the naive
      // ins-anti-join-ledger shape would shuffle the corpus per
      // window). n_new = distinct window hashes − already-live ones.
      val nNew =
        if (nIns == 0) 0L
        else if (!ledgerHasRows) distinctInsH // first window: all new
        else {
          val insH = ins.select("h").distinct() // cheap over the cached feed
          distinctInsH - ledgerProbe(s, ops, ledgerDir, insH).count()
        }
      mark(s"w$sq probe")
      // O(churn) ledger commits: eq-delete FIRST (it masks only
      // strictly-older sequence numbers — C30 — so a same-window
      // delete+reinsert of one key resolves to the new row), append
      // second; prior ledger data files are never rewritten. File
      // counts scale with the window (~500k rows per part), so a
      // small sync never litters the manifest with per-core shards
      // while a 1B-row day still writes with full parallelism.
      def churnFiles(n: Long): Int = (n / 500000L + 1L).toInt
      // Size-gated direct commits (r16, guide §1.2/§6): the window's
      // row counts are ALREADY measured (winStats), so a churn-sized
      // commit (≤ CdcLocalCommitRows ≈ a few MB of (doc_id, h) rows)
      // skips Spark's per-write execution setup — the slice is
      // collected from the checkpointed feed and written as one
      // parquet file by the driver, committed through the identical
      // manifest/CAS path (measured ~1.3 s/commit → ~0.3 s on the
      // r16 box). A big sync window exceeds the gate and takes the
      // distributed writer with full parallelism, exactly as before.
      if (nDel > 0) {
        if (nDel <= CdcLocalCommitRows)
          ops.mergeOnReadDeleteLocal(ledgerDir,
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("doc_id",
                org.apache.spark.sql.types.LongType))),
            del.select("doc_id").collect().toSeq)
        else ops.mergeOnReadDelete(s, ledgerDir, del.select("doc_id"),
          numFiles = Some(churnFiles(nDel)))
      }
      mark(s"w$sq delete")
      if (nIns > 0) {
        if (nIns <= CdcLocalCommitRows) {
          val rows = ins.collect().toSeq
          mark(s"w$sq ins-collect")
          ops.writeLocalSmall(ledgerDir, ledgerSchema, rows, "append")
        } else ops.write(ledgerDir, ins, "append", numFiles = Some(churnFiles(nIns)))
        ledgerHasRows = true
      }
      mark(s"w$sq append")
      // live count from manifests alone — data rows minus eq-delete
      // key rows (rows stamped on every entry by the write/delete
      // paths); exact under the ledger invariant: doc_id unique among
      // live rows, deletes only of currently-live keys
      val entries = ops.load(ledgerDir).map { case (_, m) =>
        ops.resolveEntries(ledgerDir, m) }.getOrElse(Seq.empty)
      def metaRows(es: Seq[DataFileEntry]): Long =
        es.map(_.rows.getOrElse(throw new IllegalStateException(
          "ledger entry missing row count — metadata live count needs stats"))).sum
      val live = metaRows(entries.filter(_.isData)) -
        metaRows(entries.filter(_.isEqDelete))
      mark(s"w$sq liveCount")
      out += ((sq, nIns, nDel, nNew, live))
    }
    out.result()
  }

  val dedupCdcSql: String =
    """WITH h AS (SELECT doc_id, lang, md5(text) AS h, doc_id % 3 AS b FROM documents),
       b0 AS (SELECT * FROM h WHERE b = 0),
       b1 AS (SELECT * FROM h WHERE b = 1),
       b2 AS (SELECT * FROM h WHERE b = 2),
       live2 AS (SELECT * FROM b0 UNION ALL SELECT * FROM b1),
       del3 AS (SELECT * FROM live2 WHERE lang = 'de'),
       live3 AS (SELECT * FROM live2 WHERE lang <> 'de'),
       live4 AS (SELECT * FROM live3 UNION ALL SELECT * FROM b2)
       SELECT CAST(1 AS BIGINT) AS seq,
              (SELECT COUNT(*) FROM b0) AS n_ins, CAST(0 AS BIGINT) AS n_del,
              (SELECT COUNT(DISTINCT h) FROM b0) AS n_new,
              (SELECT COUNT(*) FROM b0) AS live_docs
       UNION ALL
       SELECT 2, (SELECT COUNT(*) FROM b1), 0,
              (SELECT COUNT(DISTINCT h) FROM b1 WHERE h NOT IN (SELECT h FROM b0)),
              (SELECT COUNT(*) FROM live2)
       UNION ALL
       SELECT 3, 0, (SELECT COUNT(*) FROM del3), 0,
              (SELECT COUNT(*) FROM live3)
       UNION ALL
       SELECT 4, (SELECT COUNT(*) FROM b2), 0,
              (SELECT COUNT(DISTINCT h) FROM b2 WHERE h NOT IN (SELECT h FROM live3)),
              (SELECT COUNT(*) FROM live4)
       ORDER BY seq"""

  /** L46 — near-dup threshold calibration: the dedup-volume-vs-cutoff
    * curve a curation run reads BEFORE choosing its jaccard threshold
    * — how many candidate pairs and how many distinct documents a
    * dedup pass at cutoff t would touch, for t = 20%..90%. Computed
    * over the L2 MinHash-LSH candidate set with exact per-pair
    * jaccard, so the curve costs one banding pass, never all-pairs;
    * the candidates and scores are the md5-derived cross-engine
    * recipe, hence the DuckDB oracle verifies the identical curve.
    *
    * Scale: the grid is 8 literal rows broadcast against the (small)
    * candidate-pair set — a nested-loop over 8×|candidates|, no
    * corpus-sized shuffle beyond what L2 already does. */
  def dedupThresholdCurve(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pairs = minhashLsh(s, d).cache()
    val grid = Seq(20, 30, 40, 50, 60, 70, 80, 90).toDF("threshold_pct")
    def atLeast = col("jaccard") >= col("threshold_pct") / lit(100.0)
    val nPairs = grid.join(pairs, atLeast, "left")
      .groupBy("threshold_pct").agg(count(col("doc_a")).as("n_pairs"))
    val docs = pairs.select(col("doc_a").as("doc"), col("jaccard"))
      .unionAll(pairs.select(col("doc_b").as("doc"), col("jaccard")))
    val nDocs = grid.join(docs, atLeast, "left")
      .groupBy("threshold_pct").agg(countDistinct(col("doc")).as("n_docs"))
    nPairs.join(nDocs, "threshold_pct").orderBy("threshold_pct")
  }

  val dedupThresholdCurveSql: String =
    s"""WITH $minhashPairsCtes,
       grid AS (SELECT UNNEST([20, 30, 40, 50, 60, 70, 80, 90]) AS threshold_pct),
       u AS (SELECT doc_a AS doc, jaccard FROM lsh_pairs
             UNION ALL SELECT doc_b, jaccard FROM lsh_pairs)
       SELECT g.threshold_pct,
              (SELECT COUNT(*) FROM lsh_pairs p
               WHERE p.jaccard >= g.threshold_pct / 100.0) AS n_pairs,
              (SELECT COUNT(DISTINCT doc) FROM u
               WHERE u.jaccard >= g.threshold_pct / 100.0) AS n_docs
       FROM grid g ORDER BY g.threshold_pct"""

  /** L53 — exact shared-span detection (the exact-substring dedup
    * primitive of Lee et al. 2021, "Deduplicating Training Data Makes
    * Language Models Better", word-level): every 8-word window hashes;
    * cross-doc windows with equal hashes join; runs of consecutive
    * matches along a (doc_a, doc_b) DIAGONAL (a_idx − b_idx constant)
    * merge into MAXIMAL shared spans via gaps-and-islands — reported
    * with both start offsets and the span length in words. Unlike
    * L2/L4's set-similarity this finds verbatim COPIED PASSAGES
    * between otherwise-different documents (license boilerplate,
    * quoted articles), the thing suffix-array dedup pipelines cut.
    *
    * Scale: the window-hash equi-join is the only shuffle, and the
    * same df-ceiling as L4 bounds hot-window fanout (a boilerplate
    * window shared by the whole corpus must not join corpus²); island
    * merging is one window function over each pair's matches. No
    * suffix array needed — fixed-length windows trade the generality
    * of arbitrary-length matches for a plan that is pure
    * join+window-agg at any corpus size (spans ≥ 8 words are exact;
    * shorter overlaps are invisible by design). */
  def sharedSpans(s: SparkSession, d: String): DataFrame = {
    val W = 8
    // cache(): three consumers read this frame (the hot-window count
    // and BOTH sides of the window-hash self-join) — uncached, the
    // scan + 8-word-window explode + md5 run three times over.
    val wins = withWords(documents(s, d))
      .filter(size(col("ws")) >= W)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(ws) - ${W - 1}), " +
          s"i -> substr(md5(concat_ws(' ', slice(ws, i, $W))), 1, 16))")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("idx"), col("col").as("h"))
      .cache()
    // df ceiling: corpus-hot windows (boilerplate) out of the join
    val hot = wins.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") > GramDfCeiling).select("h")
    val kept = wins.join(broadcast(hot), Seq("h"), "left_anti")
    val pairs = kept.select(col("doc_id").as("doc_a"), col("idx").as("a_idx"), col("h"))
      .join(kept.select(col("doc_id").as("doc_b"), col("idx").as("b_idx"), col("h")), Seq("h"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("diag", col("a_idx") - col("b_idx"))
    val wSpec = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_a", "doc_b", "diag").orderBy("a_idx")
    pairs
      .withColumn("island", col("a_idx") - row_number().over(wSpec))
      .groupBy("doc_a", "doc_b", "diag", "island")
      .agg(min("a_idx").as("a_start"), min("b_idx").as("b_start"),
        (count(lit(1)) + lit(W - 1)).as("span_words"))
      .select("doc_a", "doc_b", "a_start", "b_start", "span_words")
      .orderBy(col("span_words").desc, col("doc_a"), col("doc_b"),
        col("a_start"), col("b_start"))
      .limit(50)
  }

  val sharedSpansSql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       win AS (SELECT doc_id, CAST(i AS BIGINT) AS idx,
                      substr(md5(array_to_string(ws[i:i+7], ' ')), 1, 16) AS h
               FROM w, UNNEST(range(1, len(ws) - 6)) AS t(i)
               WHERE len(ws) >= 8),
       hot AS (SELECT h FROM win GROUP BY h HAVING COUNT(*) > $GramDfCeiling),
       k AS (SELECT * FROM win WHERE h NOT IN (SELECT h FROM hot)),
       p AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                    x.idx AS a_idx, y.idx AS b_idx, x.idx - y.idx AS diag
             FROM k x JOIN k y ON x.h = y.h AND x.doc_id < y.doc_id),
       isl AS (SELECT doc_a, doc_b, a_idx, b_idx, diag,
                      a_idx - ROW_NUMBER() OVER (
                        PARTITION BY doc_a, doc_b, diag ORDER BY a_idx) AS island
               FROM p),
       sp AS (SELECT doc_a, doc_b, MIN(a_idx) AS a_start, MIN(b_idx) AS b_start,
                     COUNT(*) + 7 AS span_words
              FROM isl GROUP BY doc_a, doc_b, diag, island)
       SELECT doc_a, doc_b, CAST(a_start AS BIGINT) AS a_start,
              CAST(b_start AS BIGINT) AS b_start,
              CAST(span_words AS BIGINT) AS span_words
       FROM sp ORDER BY span_words DESC, doc_a, doc_b, a_start, b_start LIMIT 50"""

  /** L52 — mixed-language segmentation audit: language-ID (the L8
    * stopword heuristic) over fixed 20-word WINDOWS of each document,
    * then per-doc disagreement stats — docs whose windows vote for
    * different languages are code-switching / concatenation artifacts
    * that a doc-level language filter silently mislabels (the standard
    * curation failure this audit exists to catch). Majority language
    * by window votes (ties break alphabetically — cross-engine
    * deterministic), `minority_frac` = fraction of windows that
    * disagree with it; short tail windows (< 5 words) are dropped as
    * noise.
    *
    * Scale: map-only window explode (O(corpus words)) + one two-level
    * hash agg keyed (doc, lang) then doc — the same shuffle class as
    * L17; nothing joins, nothing is corpus-quadratic. */
  def langSegments(s: SparkSession, d: String): DataFrame = {
    val wins = withWords(documents(s, d))
      .select(col("doc_id"), explode(expr(
        "filter(transform(sequence(1, size(ws), 20), st -> slice(ws, st, 20)), " +
          "a -> size(a) >= 5)")).as("ws"))
    val voted = wins
      .withColumn("h_en", expr(hitsExpr("en"))).withColumn("h_es", expr(hitsExpr("es")))
      .withColumn("h_de", expr(hitsExpr("de"))).withColumn("h_fr", expr(hitsExpr("fr")))
      .withColumn("h_zh", expr(hitsExpr("zh")))
      .withColumn("win_lang", expr(predCase))
      .groupBy("doc_id", "win_lang").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("cnt").desc, col("win_lang"))
    voted
      .withColumn("rk", row_number().over(w))
      .withColumn("n_windows",
        sum("cnt").over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .withColumn("n_langs",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .filter(col("rk") === 1 && col("n_windows") >= 2)
      .select(col("doc_id"), col("n_windows"), col("n_langs"),
        col("win_lang").as("major_lang"),
        round(lit(1.0) - col("cnt").cast("double") / col("n_windows").cast("double"), 6)
          .as("minority_frac"))
      .orderBy(col("minority_frac").desc, col("doc_id"))
      .limit(200)
  }

  val langSegmentsSql: String = {
    def h(lang: String) = {
      val list = stops(lang).map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(ws, w -> w IN ($list))) AS BIGINT) AS h_$lang"
    }
    s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS wall FROM documents),
       win0 AS (SELECT doc_id, wall[st : st + 19] AS ws
                FROM d, UNNEST(range(1, len(wall) + 1, 20)) AS t(st)),
       win AS (SELECT * FROM win0 WHERE len(ws) >= 5),
       hits AS (SELECT doc_id, ${h("en")}, ${h("es")}, ${h("de")}, ${h("fr")}, ${h("zh")}
                FROM win),
       votes AS (SELECT doc_id, $predCase AS win_lang FROM hits),
       cnts AS (SELECT doc_id, win_lang, COUNT(*) AS cnt FROM votes GROUP BY 1, 2),
       ranked AS (SELECT doc_id, win_lang, cnt,
                         ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY cnt DESC, win_lang) AS rk,
                         SUM(cnt) OVER (PARTITION BY doc_id) AS n_windows,
                         COUNT(*) OVER (PARTITION BY doc_id) AS n_langs
                  FROM cnts)
       SELECT doc_id, CAST(n_windows AS BIGINT) AS n_windows,
              CAST(n_langs AS BIGINT) AS n_langs, win_lang AS major_lang,
              ROUND(1.0 - CAST(cnt AS DOUBLE) / n_windows, 6) AS minority_frac
       FROM ranked WHERE rk = 1 AND n_windows >= 2
       ORDER BY minority_frac DESC, doc_id LIMIT 200"""
  }

  /** L51 — leakage-safe split assignment: train/valid/test membership
    * is drawn from a deterministic hash of the NEAR-DUP CLUSTER id,
    * not the document id, so every member of a duplicate cluster lands
    * in the same split — the assignment-time fix for the contamination
    * L32 audits after the fact (a near-copy of a test doc in train is
    * leakage even when exact dedup passed). Unclustered docs are their
    * own singleton cluster; the 80/10/10 cut uses the R24/L49
    * multiplicative hash so re-runs, engines and incremental ingests
    * agree on every assignment.
    *
    * Scale: clusters come from the L14/L47 component machinery (the
    * bucketed LSH path — never all-pairs); the assignment itself is a
    * map-only hash over (doc, cluster), no extra shuffle. A new ingest
    * batch only needs ITS docs' cluster ids to get split-stable
    * assignments — nothing global recomputes. The DEFAULT cluster
    * source is the L47 star path (alternating large-star/small-star,
    * O(log² n) rounds on ANY graph shape — the guarantee that matters
    * when a boilerplate mega-cluster shows up at corpus scale); the
    * L14 diameter-bound propagation remains as the audit twin. Both
    * resolve the SAME edge set to the SAME canonical min-id labels,
    * so the assignment — and the driver's oracle hash — is identical
    * (PipelineSpec pins that equality). */
  def splitAssign(s: SparkSession, d: String): DataFrame =
    splitAssignFrom(s, d, starPath = true)

  /** [[splitAssign]] with the cluster source chosen explicitly —
    * star-path (L47) or propagation (L14) — for the equality audit. */
  private[graft] def splitAssignFrom(
      s: SparkSession, d: String, starPath: Boolean): DataFrame = {
    val pairs = ngramJaccard(s, d).filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
    val comp =
      if (starPath) starComponents(pairs)._1
      else propagationComponents(pairs)
    documents(s, d).select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      .withColumn("bucket", pmod(col("cluster") * lit(2654435761L), lit(100L)))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test"))
      .select(col("doc_id"), col("cluster"), col("split"))
      .orderBy("doc_id")
  }

  val splitAssignSql: String =
    s"""WITH RECURSIVE $componentCtes,
       comp AS (SELECT id AS doc_id, MIN(lbl) AS component FROM reach GROUP BY id),
       asg AS (SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS cluster
               FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
       SELECT doc_id, cluster,
              CASE WHEN (cluster * 2654435761) % 100 < 80 THEN 'train'
                   WHEN (cluster * 2654435761) % 100 < 90 THEN 'valid'
                   ELSE 'test' END AS split
       FROM asg ORDER BY doc_id"""

  /** L50 — DSIR-style importance resampling (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every raw-pool document by how target-like its HASHED N-GRAM
    * feature distribution is — `log p_target(doc) − p_raw(doc)` under
    * two bucketed unigram bag-of-words models — and keep the top-k.
    * Target here = the English split; pool = everything else. The
    * per-bucket log-ratio (add-1 smoothed) is quantized ONCE per
    * distinct bucket into integer millibits (the L42 discipline: the
    * only cross-engine float op runs over the ≤1024-row model, never
    * the corpus), so each document's score is an exact integer sum +
    * one division. Deterministic top-k is the temperature-0 variant
    * of the paper's Gumbel resampling.
    *
    * Scale: the feature space is FIXED (1024 buckets) regardless of
    * corpus size — the model is one map-side-combined groupBy that
    * yields KBs, then scoring is a broadcast join onto the exploded
    * words. No vocabulary blow-up, no corpus-sized shuffle: the same
    * plan at 100 TB moves only O(words) map-side and O(docs) in the
    * final agg; the top-k is a TakeOrdered. */
  def dsirSelect(s: SparkSession, d: String): DataFrame = {
    val B = 1024
    // cache(): the bucket model and the pool-scoring side both read
    // this exploded/bucketed word table — uncached, the scan + explode
    // + per-word md5 run twice.
    val words = withWords(documents(s, d))
      .select(col("doc_id"), col("lang"), explode(col("ws")).as("w"))
      .withColumn("b", expr(s"CAST(conv(substr(md5(w), 1, 8), 16, 10) AS BIGINT) % $B"))
      .cache()
    val counts = words.groupBy("b").agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t_cnt"),
      sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("r_cnt"))
    val tot = counts.agg(sum("t_cnt").as("t_tot"), sum("r_cnt").as("r_tot"))
    // integer products stay exact in doubles (< 2^53 comfortably at
    // any SF here); one division + one ln per DISTINCT bucket
    val mb = counts.join(broadcast(tot))
      .select(col("b"), round(lit(1000.0) * log(
        ((col("t_cnt") + 1).cast("double") * (col("r_tot") + B).cast("double")) /
          ((col("r_cnt") + 1).cast("double") * (col("t_tot") + B).cast("double"))))
        .cast("long").as("mb"))
    words.filter(col("lang") =!= "en")
      .join(broadcast(mb), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("mb").as("total_mb"))
      .withColumn("dsir_mb", round(col("total_mb").cast("double") / col("n_words"), 4))
      .orderBy(col("dsir_mb").desc, col("doc_id"))
      .limit(100)
      .select("doc_id", "n_words", "total_mb", "dsir_mb")
  }

  val dsirSelectSql: String =
    """WITH w AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
       wb AS (SELECT doc_id, lang,
                     CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % 1024 AS b FROM w),
       c AS (SELECT b,
                    SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_cnt,
                    SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS r_cnt
             FROM wb GROUP BY b),
       tot AS (SELECT SUM(t_cnt) AS t_tot, SUM(r_cnt) AS r_tot FROM c),
       mb AS (SELECT b, CAST(round(1000.0 * ln(
                 (CAST(t_cnt + 1 AS DOUBLE) * (r_tot + 1024)) /
                 (CAST(r_cnt + 1 AS DOUBLE) * (t_tot + 1024)))) AS BIGINT) AS mb
              FROM c, tot),
       sc AS (SELECT doc_id, COUNT(*) AS n_words, SUM(mb) AS total_mb
              FROM wb JOIN mb USING (b) WHERE lang <> 'en' GROUP BY doc_id)
       SELECT doc_id, n_words, CAST(total_mb AS BIGINT) AS total_mb,
              ROUND(CAST(total_mb AS DOUBLE) / n_words, 4) AS dsir_mb
       FROM sc ORDER BY dsir_mb DESC, doc_id LIMIT 100"""
}
