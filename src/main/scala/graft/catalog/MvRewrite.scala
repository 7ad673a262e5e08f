package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** C88 — transparent materialized-view rewrite: aggregate queries over
  * a catalog table are rewritten by the optimizer to SCAN the table's
  * incrementally-maintained aggregate ([[Materialized.refreshSumCount]]
  * destination) when — and only when — that MV is exactly as fresh as
  * the snapshot the query would read. The user keeps writing
  * `SELECT keys, SUM(v), COUNT(*) FROM src GROUP BY keys`; when the MV
  * covers it, the scan touches `O(groups)` rows instead of the corpus.
  * At 100 TB this turns the hottest dashboard aggregates into
  * metadata-sized reads while staying EXACT: staleness falls back to
  * the full aggregation, never to approximate answers.
  *
  * Eligibility (all checked per candidate MV, cheap metadata reads):
  *  - the source relation is an unpinned graft table (time travel
  *    never rewrites — the MV tracks main's head, not history);
  *  - the MV's `graft.mv.source` points back at this table and its
  *    `graft.mv.last-seq` EQUALS the source snapshot's sequence
  *    number (the plan's own pinned metadata, so a concurrent commit
  *    can't tear the check);
  *  - grouping keys are a SUBSET of the MV's key columns (equal set:
  *    the MV rows project straight through; proper subset — the
  *    drill-up / roll-up shape, `GROUP BY k1` over a (k1,k2) MV, or a
  *    global aggregate with no GROUP BY at all — the MV's O(groups)
  *    rows RE-AGGREGATE, still never touching the corpus) and every
  *    aggregate is `SUM(value)` (double), `COUNT(*)`/`COUNT(1)`, or
  *    `AVG(value)` — the three the sum/count MV answers exactly
  *    (`AVG = value_sum / n_vals`, NULL-correct: `n_vals` counts
  *    non-null values, and `n_vals = 0` turns SUM into NULL; roll-up
  *    re-derives them as `SUM(value_sum) / SUM(n_vals)` etc., which
  *    sum/count/min/max all tolerate — HLL sketches do not, so the
  *    hll MV never re-aggregates). DISTINCT/FILTER forms never match.
  *
  * Registration is an explicit property on the SOURCE table
  * (`graft.mv.rewrite`, comma-separated MV paths —
  * [[Materialized.enableRewrite]]), so only opted-in tables ever pay
  * the metadata probe. Disable per session with
  * `SET spark.graft.mv.rewrite.enabled=false`.
  *
  * Injected by [[GraftExtensions]] (operator-optimization batch,
  * pre-pushdown: matches the raw [[DataSourceV2Relation]]); sessions
  * without the extension can register via
  * `spark.experimental.extraOptimizations`, where the relation has
  * already become a [[DataSourceV2ScanRelation]] — both shapes match,
  * and the replacement is built in the corresponding phase's form.
  */
class RewriteToMaterializedView(spark: SparkSession) extends Rule[LogicalPlan] {

  import RewriteToMaterializedView._

  private def enabled: Boolean =
    spark.conf.get("spark.graft.mv.rewrite.enabled", "true") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case agg: Aggregate =>
        rewrite(agg).orElse(rewriteJoin(agg)).getOrElse(agg)
    }
  }

  /** The source relation under optional column-pruning Projects and
    * key-only Filters (a predicate over grouping-key columns commutes
    * with the aggregation, so it can re-apply ON the MV — any other
    * filter disqualifies the rewrite). Returns the table, the
    * collected key-filter conditions, and whether the plan is already
    * in post-pushdown (ScanRelation) form. */
  private def sourceRelation(plan: LogicalPlan): Option[(GraftTable, Seq[Expression], Boolean)] =
    plan match {
      case r: DataSourceV2Relation if !timeTravelRead(r.options) => r.table match {
        case t: GraftTable => Some((t, Seq.empty, false))
        case _ => None
      }
      case sr: DataSourceV2ScanRelation if !timeTravelRead(sr.relation.options) =>
        sr.relation.table match {
          case t: GraftTable => Some((t, Seq.empty, true))
          case _ => None
        }
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        sourceRelation(child)
      case Filter(cond, child) if cond.deterministic =>
        sourceRelation(child).map { case (t, conds, post) => (t, cond +: conds, post) }
      case _ => None
    }

  /** Options-based time travel / branch reads
    * (`spark.read.option("snapshot-id"|"ref"|"as-of-timestamp", …)`)
    * never touch `graftPinned`, so they must be screened here: the MV
    * tracks main's head — answering a historical or WAP-branch read
    * from it would be silently wrong. */
  private def timeTravelRead(
      opts: org.apache.spark.sql.util.CaseInsensitiveStringMap): Boolean =
    opts != null && (opts.containsKey("snapshot-id") || opts.containsKey("ref") ||
      opts.containsKey("as-of-timestamp"))

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (src, filters, postPushdown) = sourceRelation(agg.child) match {
      case Some(x) => x
      case None => return None
    }
    if (src.graftPinned) return None // time travel reads history, the MV tracks head
    val registered = src.graftMeta.properties.get(RewriteProp)
      .toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    if (registered.isEmpty) return None

    // grouping must be exactly attribute references (no expressions)
    val groupAttrs = agg.groupingExpressions.map {
      case a: AttributeReference => a
      case _ => return None
    }
    val srcHeadSeq = src.graftMeta.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)

    registered.view.flatMap { mvPath =>
      tryMv(agg, groupAttrs, filters, src, srcHeadSeq, new Path(mvPath), postPushdown)
    }.headOption
  }

  private def tryMv(
      agg: Aggregate,
      groupAttrs: Seq[AttributeReference],
      filters: Seq[Expression],
      src: GraftTable,
      srcHeadSeq: Long,
      mvDir: Path,
      postPushdown: Boolean): Option[LogicalPlan] = {
    val mvMeta = probeMeta(src.graftOps, mvDir) match {
      case Some(m) => m
      case None => return None
    }
    // the MV must describe THIS table and be exactly at its head
    if (!mvMeta.properties.get("graft.mv.source").contains(src.graftDir.toString))
      return None
    if (!mvMeta.properties.get("graft.mv.last-seq").map(_.toLong).contains(srcHeadSeq))
      return None
    val keys = mvMeta.properties.getOrElse("graft.mv.keys", "").split(",").toSeq
    val valueCol = mvMeta.properties.getOrElse("graft.mv.value", "")
    val groupSet = groupAttrs.map(_.name).toSet
    if (!groupSet.subsetOf(keys.toSet)) return None
    // equal key set: MV rows ARE the answer (plain projection); proper
    // subset (drill-up, or a global aggregate): the MV's O(groups)
    // rows re-aggregate — sound for sum/count/min/max, never for
    // sketches (HLL union of subgroups is not a column re-aggregation)
    val exact = groupSet == keys.toSet
    if (!exact && mvMeta.properties.getOrElse("graft.mv.agg", "sumcount") == "hll")
      return None
    // filters commute with the aggregation ONLY when they reference
    // key columns alone (they then drop whole groups); anything else
    // disqualifies the MV
    if (filters.exists(_.references.exists(a => !keys.contains(a.name)))) return None

    val mvTable = new GraftTable(s"mv:${mvDir.getName}", mvDir, mvMeta, src.graftOps)
    val mvChild: LogicalPlan =
      if (!postPushdown) DataSourceV2Relation.create(mvTable, None, None)
      else {
        // pushdown already ran in this phase — deliver the relation in
        // its final (scan) form so physical planning accepts it
        val rel = DataSourceV2Relation.create(mvTable, None, None)
        val scan = mvTable.newScanBuilder(
          new org.apache.spark.sql.util.CaseInsensitiveStringMap(
            java.util.Collections.emptyMap())).build()
        DataSourceV2ScanRelation(rel, scan, rel.output)
      }
    val byName = mvChild.output.map(a => a.name -> a).toMap
    val nRows = byName.get("n_rows").getOrElse(return None)
    // NULL-correct SUM/AVG need the MV's non-null value count
    // (`n_vals`): AVG(v) divides by COUNT(v), not COUNT(*), and
    // SUM(v) of an all-NULL group is NULL, not 0. MVs predating
    // n_vals can still answer when the source schema PROVES the value
    // column never holds NULL.
    val nVals = byName.get("n_vals")
    // what the MV maintains: sum/count (default) or min/max
    val aggKind = mvMeta.properties.getOrElse("graft.mv.agg", "sumcount")
    def valueNullable(c: Expression): Boolean = c match {
      case a: AttributeReference => a.nullable
      case _ => true
    }

    // roll-up building blocks: Complete-mode aggregate calls over the
    // MV's columns (only used when `exact` is false)
    def aggE(f: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction)
        : Expression =
      AggregateExpression(f,
        org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
        isDistinct = false)
    def sumLong(e: Expression): Expression = // SUM over Long, 0 when groupless
      Coalesce(Seq(aggE(Sum(e)), Literal(0L, LongType)))

    // every output column must be answerable from the MV; keep the
    // original names AND exprIds so parents are untouched
    val projected = agg.aggregateExpressions.map {
      case a: AttributeReference if byName.contains(a.name) =>
        Alias(byName(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, _) if byName.contains(a.name) =>
        Alias(byName(a.name), al.name)(exprId = al.exprId)
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        def matchesValue(c: Expression): Boolean = c match {
          case a: AttributeReference => a.name == valueCol && ae.dataType == DoubleType
          case _ => false
        }
        (aggKind, ae.aggregateFunction) match {
          case ("sumcount", Sum(c, _)) if matchesValue(c) =>
            val vs = byName.getOrElse("value_sum", return None)
            val total: Expression = if (exact) vs else aggE(Sum(vs))
            val expr: Expression = nVals match {
              case Some(nv) => // all-NULL group: stored sum is 0.0, true SUM is NULL
                val vals: Expression = if (exact) nv else sumLong(nv)
                If(EqualTo(vals, Literal(0L, LongType)),
                  Literal.create(null, DoubleType), total)
              case None if !valueNullable(c) => total
              case None => return None
            }
            Alias(expr, al.name)(exprId = al.exprId)
          case ("sumcount", Average(c, _)) if matchesValue(c) =>
            val vs = byName.getOrElse("value_sum", return None)
            val total: Expression = if (exact) vs else aggE(Sum(vs))
            val denom: Expression = nVals match {
              case Some(nv) => if (exact) nv else sumLong(nv) // COUNT(v): NULLs excluded
              case None if !valueNullable(c) => if (exact) nRows else sumLong(nRows)
              case None => return None
            }
            // explicit all-NULL guard: ANSI mode makes x/0 THROW, and
            // AVG of an all-NULL group must be NULL anyway
            val avgExpr = If(EqualTo(denom, Literal(0L, LongType)),
              Literal.create(null, DoubleType),
              Divide(total, Cast(denom, DoubleType)))
            Alias(avgExpr, al.name)(exprId = al.exprId)
          case ("minmax", Min(c)) if matchesValue(c) =>
            val lo = byName.getOrElse("value_min", return None)
            Alias(if (exact) lo else aggE(Min(lo)), al.name)(exprId = al.exprId)
          case ("minmax", Max(c)) if matchesValue(c) =>
            val hi = byName.getOrElse("value_max", return None)
            Alias(if (exact) hi else aggE(Max(hi)), al.name)(exprId = al.exprId)
          case (_, Count(Seq(Literal(1, _)))) =>
            // COUNT(*) is non-nullable; pin that through a coalesce
            val cnt: Expression =
              if (exact) Coalesce(Seq(nRows, Literal(0L, LongType)))
              else sumLong(nRows)
            Alias(cnt, al.name)(exprId = al.exprId)
          case _ => return None
        }
      case _ => return None
    }
    // re-apply key-only filters ON the MV (rebased onto its attrs)
    val filtered =
      if (filters.isEmpty) mvChild
      else Filter(filters.reduce(And).transform {
        case a: AttributeReference => byName(a.name)
      }, mvChild)
    if (exact) Some(Project(projected, filtered))
    else Some(Aggregate(groupAttrs.map(a => byName(a.name)), projected, filtered))
  }

  // ------------------------------------------------------------------
  // C47 × C88 — JOIN-MV rewrite: `SELECT k, COUNT(*) FROM A JOIN B ON
  // A.ka = B.kb GROUP BY k` (k = either side's join key) answered from
  // the incrementally-maintained join MV
  // ([[Materialized.refreshJoinCount]] destination: `key, n_pairs`)
  // when BOTH dual watermarks sit exactly at their sources' heads. At
  // 100 TB this turns the hottest join+aggregate dashboard shape into
  // an O(groups) scan — the join itself is never executed. Same
  // fallback discipline as the single-table rule: staleness on either
  // source, time travel on either side, a non-inner join, extra join
  // conditions, filters below the join, or any aggregate beyond
  // COUNT(*) → no rewrite.
  // ------------------------------------------------------------------

  /** A join side stripped to its relation: attribute-only Projects are
    * transparent, and Filters are collected as conjuncts for the
    * caller to vet — by the time this rule sees the plan the optimizer
    * has usually pushed the query's key filter below the join and
    * inferred `isnotnull` / dynamic-pruning predicates there. */
  private def bareRelation(
      plan: LogicalPlan): Option[(GraftTable, Seq[Expression], Boolean)] =
    plan match {
      case r: DataSourceV2Relation if !timeTravelRead(r.options) => r.table match {
        case t: GraftTable if !t.graftPinned => Some((t, Seq.empty, false))
        case _ => None
      }
      case sr: DataSourceV2ScanRelation if !timeTravelRead(sr.relation.options) =>
        sr.relation.table match {
          case t: GraftTable if !t.graftPinned => Some((t, Seq.empty, true))
          case _ => None
        }
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        bareRelation(child)
      case Filter(cond, child) if cond.deterministic =>
        bareRelation(child).map { case (t, cs, p) => (t, conjuncts(cond) ++ cs, p) }
      case _ => None
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** The inner equi-join under optional Projects / key-only Filters
    * above it. Returns (join, above-join filter conditions). */
  private def joinChild(plan: LogicalPlan): Option[(Join, Seq[Expression])] =
    plan match {
      case j: Join => Some((j, Seq.empty))
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        joinChild(child)
      case Filter(cond, child) if cond.deterministic =>
        joinChild(child).map { case (j, conds) => (j, cond +: conds) }
      case _ => None
    }

  private def rewriteJoin(agg: Aggregate): Option[LogicalPlan] = {
    val (join, filters) = joinChild(agg.child) match {
      case Some(x) => x
      case None => return None
    }
    if (join.joinType != Inner) return None
    val (ka, kb) = join.condition match {
      case Some(EqualTo(a: AttributeReference, b: AttributeReference)) =>
        if (join.left.outputSet.contains(a) && join.right.outputSet.contains(b)) (a, b)
        else if (join.left.outputSet.contains(b) && join.right.outputSet.contains(a)) (b, a)
        else return None
      case _ => return None
    }
    val (tblA, filtersA, postA) = bareRelation(join.left) match {
      case Some(x) => x
      case None => return None
    }
    val (tblB, filtersB, _) = bareRelation(join.right) match {
      case Some(x) => x
      case None => return None
    }
    // grouping: empty (global count) or exactly one of the join keys —
    // under an inner equi-join both sides' keys carry identical values
    // (NULL keys never join), so either attribute names the same groups
    val groupAttr: Option[AttributeReference] = agg.groupingExpressions match {
      case Seq() => None
      case Seq(a: AttributeReference)
          if a.exprId == ka.exprId || a.exprId == kb.exprId => Some(a)
      case _ => return None
    }
    // all collected filters (above the join or pushed below it) must be
    // key-only: they then drop whole key groups and re-apply on the
    // MV's key column. Dynamic-pruning conjuncts are DERIVED
    // prune-only predicates (the join itself already enforces the
    // partner-exists semantics they encode), so they are dropped, not
    // rebased.
    val keyIds = Set(ka.exprId, kb.exprId)
    val allFilters = (filters.flatMap(conjuncts) ++ filtersA ++ filtersB)
      .filterNot(_.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.DynamicPruning]))
    if (allFilters.exists(_.references.exists(r => !keyIds.contains(r.exprId))))
      return None

    val registered = tblA.graftMeta.properties.get(RewriteProp)
      .toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    if (registered.isEmpty) return None
    val headA = tblA.graftMeta.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)
    val headB = tblB.graftMeta.currentSnapshot.map(_.sequenceNumber).getOrElse(0L)

    registered.view.flatMap { mvPath =>
      tryJoinMv(agg, groupAttr, allFilters, tblA, tblB, ka, kb, headA, headB,
        new Path(mvPath), postA)
    }.headOption
  }

  private def tryJoinMv(
      agg: Aggregate,
      groupAttr: Option[AttributeReference],
      filters: Seq[Expression],
      tblA: GraftTable,
      tblB: GraftTable,
      ka: AttributeReference,
      kb: AttributeReference,
      headA: Long,
      headB: Long,
      mvDir: Path,
      postPushdown: Boolean): Option[LogicalPlan] = {
    val mvMeta = probeMeta(tblA.graftOps, mvDir) match {
      case Some(m) => m
      case None => return None
    }
    val props = mvMeta.properties
    // the MV must describe exactly THIS join, and both dual watermarks
    // must sit at their sources' heads (a lag on either side means the
    // MV is missing — or still counting — churn from that source)
    if (!props.get("graft.mv.source-a").contains(tblA.graftDir.toString)) return None
    if (!props.get("graft.mv.source-b").contains(tblB.graftDir.toString)) return None
    if (!props.get("graft.mv.key-a").contains(ka.name)) return None
    if (!props.get("graft.mv.key-b").contains(kb.name)) return None
    if (!props.get("graft.mv.last-seq-a").map(_.toLong).contains(headA)) return None
    if (!props.get("graft.mv.last-seq-b").map(_.toLong).contains(headB)) return None

    val mvTable = new GraftTable(s"mv:${mvDir.getName}", mvDir, mvMeta, tblA.graftOps)
    val mvChild: LogicalPlan =
      if (!postPushdown) DataSourceV2Relation.create(mvTable, None, None)
      else {
        val rel = DataSourceV2Relation.create(mvTable, None, None)
        val scan = mvTable.newScanBuilder(
          new org.apache.spark.sql.util.CaseInsensitiveStringMap(
            java.util.Collections.emptyMap())).build()
        DataSourceV2ScanRelation(rel, scan, rel.output)
      }
    val byName = mvChild.output.map(a => a.name -> a).toMap
    val mvKey = byName.getOrElse("key", return None)
    val nPairs = byName.getOrElse("n_pairs", return None)
    val exact = groupAttr.isDefined

    def aggE(f: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction)
        : Expression =
      AggregateExpression(f,
        org.apache.spark.sql.catalyst.expressions.aggregate.Complete,
        isDistinct = false)

    val projected = agg.aggregateExpressions.map {
      case a: AttributeReference if groupAttr.exists(_.exprId == a.exprId) =>
        Alias(mvKey, a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, _)
          if groupAttr.exists(_.exprId == a.exprId) =>
        Alias(mvKey, al.name)(exprId = al.exprId)
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(1, _))) =>
            val cnt: Expression =
              if (exact) Coalesce(Seq(nPairs, Literal(0L, LongType)))
              else Coalesce(Seq(aggE(Sum(nPairs)), Literal(0L, LongType)))
            Alias(cnt, al.name)(exprId = al.exprId)
          case _ => return None
        }
      case _ => return None
    }
    // key-only filters re-apply on the MV's key column (either side's
    // key attribute rebases onto it — they are equal-valued)
    val filtered =
      if (filters.isEmpty) mvChild
      else Filter(filters.reduce(And).transform {
        case a: AttributeReference if a.exprId == ka.exprId || a.exprId == kb.exprId =>
          mvKey
      }, mvChild)
    if (exact) Some(Project(projected, filtered))
    else Some(Aggregate(Seq.empty, projected, filtered))
  }
}

object RewriteToMaterializedView {
  /** Source-table property: comma-separated MV table paths eligible to
    * answer aggregates over this table. */
  val RewriteProp = "graft.mv.rewrite"

  /** (mv path → (hint stamp, metadata)) probe cache: with N registered
    * MVs every Aggregate compilation would otherwise pay N full
    * metadata loads (several FS round-trips + a JSON parse each). The
    * version-hint file is rewritten on every commit, so its
    * (content, mtime) pair is a cheap change stamp — a cache hit costs
    * one small read + one stat. A stale stamp can only UNDER-fire (the
    * freshness gate compares the cached `graft.mv.last-seq` against
    * the plan's pinned head sequence, and last-seq only moves forward
    * with the source), never answer from the wrong snapshot. */
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, TableMetadata)]()

  private[catalog] def probeMeta(ops: TableOps, mvDir: Path): Option[TableMetadata] = {
    val hintPath = new Path(ops.metadataDir(mvDir), "version-hint.text")
    val stamp =
      try {
        val st = ops.store.fs(hintPath).getFileStatus(hintPath)
        Some(ops.store.readString(hintPath).trim + "@" + st.getModificationTime)
      } catch { case _: Exception => None }
    stamp match {
      case Some(s) =>
        val key = mvDir.toString
        Option(metaCache.get(key)).filter(_._1 == s).map(c => Option(c._2)).getOrElse {
          val loaded = ops.load(mvDir).map(_._2)
          loaded.foreach(m => metaCache.put(key, (s, m)))
          loaded
        }
      case None => ops.load(mvDir).map(_._2) // no hint: load uncached
    }
  }
}
