package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Relational
import graft.pipeline.{TextPipeline, Vectors}

/** Driver contract — see SURVEY.md §2 for the operator inventory each
  * entry covers. Every `queries` key that is ANSI-SQL-expressible has
  * a DuckDB oracle in [[oracleSql]] with identical column aliases and
  * deterministic ordering; the rest are rows-only + ScalaTest'd.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 relational surface
    "q1_pricing_summary"   -> (Relational.q1PricingSummary _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q5_local_supplier"    -> (Relational.q5LocalSupplier _),
    "q6_filter_agg"        -> (Relational.q6FilterAgg _),
    "q14_promo_share"      -> (Relational.q14PromoShare _),
    "q17_small_qty"        -> (Relational.q17SmallQty _),
    "q18_large_volume"     -> (Relational.q18LargeVolume _),
    "q_anti_customers"     -> (Relational.qAntiCustomers _),
    "q_cust_order_counts"  -> (Relational.qCustOrderCounts _),
    "q_distinct_parts"     -> (Relational.qDistinctParts _),
    "q_setops"             -> (Relational.qSetops _),
    "q_setops_all"         -> (Relational.qSetopsAll _),
    "q_window_rank"        -> (Relational.qWindowRank _),
    "q_window_running"     -> (Relational.qWindowRunning _),
    "q_window_lag"         -> (Relational.qWindowLag _),
    "q_window_range"       -> (Relational.qWindowRange _),
    "q_rollup_sales"       -> (Relational.qRollupSales _),
    "q_cube_sales"         -> (Relational.qCubeSales _),
    "q_full_outer"         -> (Relational.qFullOuter _),
    "q_string_agg"         -> (Relational.qStringAgg _),
    "q_percentiles"        -> (Relational.qPercentiles _),
    "q_pivot_status"       -> (Relational.qPivotStatus _),
    "q_scalar_funcs"       -> (Relational.qScalarFuncs _),
    "q_sessionize"         -> (Relational.qSessionize _),
    "q_asof_join"          -> (Relational.qAsofJoin _),
    "q_approx_distinct"    -> (Relational.qApproxDistinct _),
    "q_hash_sample"        -> (Relational.qHashSample _),
    "q_salted_topusers"    -> (Relational.qSaltedTopusers _),
    "q2_best_supplier"     -> (Relational.q2BestSupplier _),
    "q4_order_priority"    -> (Relational.q4OrderPriority _),
    "q7_volume_shipping"   -> (Relational.q7VolumeShipping _),
    "q8_market_share"      -> (Relational.q8MarketShare _),
    "q9_product_profit"    -> (Relational.q9ProductProfit _),
    "q10_returned_items"   -> (Relational.q10ReturnedItems _),
    "q13_cust_distribution" -> (Relational.q13CustDistribution _),
    "q15_top_supplier"     -> (Relational.q15TopSupplier _),
    "q16_parts_supplier"   -> (Relational.q16PartsSupplier _),
    "q19_disjunctive"      -> (Relational.q19Disjunctive _),
    "q22_wealthy_inactive" -> (Relational.q22WealthyInactive _),
    // §2.3 LLM-training-data pipeline
    "dedup_exact"          -> (TextPipeline.dedupExact _),
    "dedup_ngram_jaccard"  -> (TextPipeline.ngramJaccard _),
    "dedup_minhash_lsh"    -> (TextPipeline.minhashLsh _),
    "dedup_simhash"        -> (TextPipeline.simhash _),
    "dedup_components"     -> (TextPipeline.dedupComponents _),
    "dedup_embed_cosine"   -> (Vectors.dedupEmbedCosine _),
    "ann_bruteforce_topk"  -> (Vectors.annBruteforceTopk _),
    "ann_lsh_topk"         -> (Vectors.annLshTopk _),
    "ann_ivf_topk"         -> ((s, d) => Vectors.annIvfTopk(s, d)),
    "text_langid"          -> (TextPipeline.textLangid _),
    "text_quality"         -> (TextPipeline.textQuality _),
    "text_tokens"          -> (TextPipeline.textTokens _),
    "text_fingerprint"     -> (TextPipeline.textFingerprint _),
    "pipeline_curate"      -> (TextPipeline.curate _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary"   -> Relational.q1Sql,
    "q3_shipping_priority" -> Relational.q3Sql,
    "q5_local_supplier"    -> Relational.q5Sql,
    "q6_filter_agg"        -> Relational.q6Sql,
    "q14_promo_share"      -> Relational.q14Sql,
    "q17_small_qty"        -> Relational.q17Sql,
    "q18_large_volume"     -> Relational.q18Sql,
    "q_anti_customers"     -> Relational.qAntiSql,
    "q_cust_order_counts"  -> Relational.qCustOrderCountsSql,
    "q_distinct_parts"     -> Relational.qDistinctPartsSql,
    "q_setops"             -> Relational.qSetopsSql,
    "q_setops_all"         -> Relational.qSetopsAllSql,
    "q_window_rank"        -> Relational.qWindowRankSql,
    "q_window_running"     -> Relational.qWindowRunningSql,
    "q_window_lag"         -> Relational.qWindowLagSql,
    "q_window_range"       -> Relational.qWindowRangeSql,
    "q_rollup_sales"       -> Relational.qRollupSalesSql,
    "q_cube_sales"         -> Relational.qCubeSalesSql,
    "q_full_outer"         -> Relational.qFullOuterSql,
    "q_string_agg"         -> Relational.qStringAggSql,
    "q_percentiles"        -> Relational.qPercentilesSql,
    "q_pivot_status"       -> Relational.qPivotStatusSql,
    "q_scalar_funcs"       -> Relational.qScalarFuncsSql,
    "q_sessionize"         -> Relational.qSessionizeSql,
    "q_asof_join"          -> Relational.qAsofJoinSql,
    "q_hash_sample"        -> Relational.qHashSampleSql,
    "q_salted_topusers"    -> Relational.qSaltedTopusersSql,
    "q2_best_supplier"     -> Relational.q2Sql,
    "q4_order_priority"    -> Relational.q4Sql,
    "q7_volume_shipping"   -> Relational.q7Sql,
    "q8_market_share"      -> Relational.q8Sql,
    "q9_product_profit"    -> Relational.q9Sql,
    "q10_returned_items"   -> Relational.q10Sql,
    "q13_cust_distribution" -> Relational.q13Sql,
    "q15_top_supplier"     -> Relational.q15Sql,
    "q16_parts_supplier"   -> Relational.q16Sql,
    "q19_disjunctive"      -> Relational.q19Sql,
    "q22_wealthy_inactive" -> Relational.q22Sql,
    "dedup_exact"          -> TextPipeline.dedupExactSql,
    "dedup_ngram_jaccard"  -> TextPipeline.ngramJaccardSql,
    "dedup_components"     -> TextPipeline.dedupComponentsSql,
    "dedup_embed_cosine"   -> Vectors.dedupEmbedCosineSql,
    "ann_bruteforce_topk"  -> Vectors.annBruteforceTopkSql,
    "text_langid"          -> TextPipeline.textLangidSql,
    "text_quality"         -> TextPipeline.textQualitySql,
    "text_tokens"          -> TextPipeline.textTokensSql,
    "pipeline_curate"      -> TextPipeline.curateSql,
  )
}
