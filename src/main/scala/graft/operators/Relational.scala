package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational query core (SURVEY.md §2.1, q01-q20).
  *
  * All operators are declarative DataFrame plans: filters/projections reach
  * the parquet scan, dimension joins are explicitly broadcast, aggregates
  * get map-side partial aggregation from Catalyst for free. Doubles that
  * cross the DuckDB-oracle boundary are rounded on both sides so the
  * hash-compare is immune to summation-order FP noise.
  */
object Relational {

  /** q01: scan + filter + project; predicate and column pruning reach the scan. */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") && col("l_discount") > 0.05)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        // price*(1-disc) has exactly 4 true decimals; rounding AT 4 is a
        // representation fix-up both engines agree on, while rounding at 2
        // would sit exactly on .xx5 ties where their modes differ.
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
      )

  /** q02: grouped hash aggregate (TPC-H Q1 pricing summary). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("n_rows"),
      )

  /** q03: top-N by aggregate with a broadcast dimension join. */
  def topRevenueParts(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_partkey", "p_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("p_partkey"))
      .limit(10)

  /** q04: multi-way fact join (TPC-H Q3 shipping priority). */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame =
    Tables
      .customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
      .join(Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      .groupBy(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)

  /** q05: star join — all four dimensions broadcast (TPC-H Q5 shape). */
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val asiaNations = broadcast(
      Tables
        .nation(spark, dir)
        .join(broadcast(Tables.region(spark, dir)).filter(col("r_name") === "ASIA"),
              col("n_regionkey") === col("r_regionkey"))
    )
    Tables
      .lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(spark, dir)),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(asiaNations, col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
  }

  /** q06: left outer join with null-safe aggregation. */
  def customerOrderGaps(spark: SparkSession, dir: String): DataFrame =
    Tables
      .customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum("o_totalprice"), lit(0.0)), 2).as("total_spend"),
      )

  /** q07: semi join (EXISTS) — orders having a returned line. */
  def waitingOrders(spark: SparkSession, dir: String): DataFrame = {
    val returned = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    Tables
      .orders(spark, dir)
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_orderpriority")
  }

  /** q08: anti join (NOT EXISTS) — customers with no finalized ('F') order. */
  def idleCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables
      .customer(spark, dir)
      .join(
        Tables.orders(spark, dir).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"),
        "left_anti")
      .select("c_custkey", "c_name")

  /** q09: per-group scalar subquery (TPC-H Q17 shape). The per-part average
    * is exact (integer sums are order-independent), so the threshold compare
    * is bit-identical to the oracle's correlated subquery.
    */
  def smallQuantityRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val perPart = li.groupBy(col("l_partkey").as("ap_partkey")).agg(avg("l_quantity").as("avg_qty"))
    li.join(perPart, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
  }

  /** q10: window row_number per group (top-3 balances per segment). */
  def rankInSegment(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables
      .customer(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"), col("rn"))
  }

  /** q11: lag/lead delta per key. */
  def orderValueDelta(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        round(col("o_totalprice") - lag("o_totalprice", 1).over(w), 2).as("delta"),
      )
  }

  /** q12: running/cumulative aggregate in its SCALE form (r5 — the r4
    * verdict's last declared single-partition step, retired): a
    * range-partitioned prefix sum instead of one unpartitioned Window.
    *
    *  1. daily totals (one combine over the scan);
    *  2. bucket = month prefix of the date — a deterministic RANGE key,
    *     so within-bucket state is bounded (≤31 days) and bucket count
    *     grows with the calendar, not the data volume;
    *  3. per-bucket totals + EXCLUSIVE bucket offsets via a triangular
    *     self-join over the tiny month table (no Window node at all for
    *     the offsets — a window here would reintroduce a
    *     SinglePartition exchange, the thing being removed);
    *  4. within-bucket running sum under a PARTITIONED window + broadcast
    *     offset add.
    *
    * Correctness subtlety that makes the decomposition hash-safe: the
    * money sums run in DECIMAL(18,2) — exact, therefore ASSOCIATIVE, so
    * regrouping the additions (bucket partials + offsets vs one
    * sequential fold) cannot drift an ulp the way double sums would;
    * the final cast to double is of bit-identical decimals on both
    * engines. PlanSpec asserts no SinglePartition exchange survives.
    */
  def runningRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .withColumn("bucket", substring(col("odate"), 1, 7))
    val bucketTotals = daily.groupBy("bucket").agg(sum("rev").as("btot"))
    val offsets = bucketTotals
      .as("a")
      .join(broadcast(bucketTotals.as("b")), col("b.bucket") < col("a.bucket"), "left")
      .groupBy(col("a.bucket").as("bucket"))
      .agg(sum(col("b.btot")).as("offset"))
    val w = Window.partitionBy("bucket").orderBy("odate")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("within", sum("rev").over(w))
      .join(broadcast(offsets), Seq("bucket"))
      .select(
        col("odate"),
        round((coalesce(col("offset"), lit(0)) + col("within")).cast("double"), 2).as("cum_rev"))
  }

  /** q13: DISTINCT aggregation per key. */
  def distinctPartsPerOrder(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(countDistinct("l_partkey").as("n_parts"), count(lit(1)).as("n_lines"))

  /** q14: set operations — (A UNION B) EXCEPT C on customer keys. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(spark, dir).filter(col("c_acctbal") > 5000).select(col("c_custkey").as("k"))
    val b = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000).select(col("o_custkey").as("k"))
    val c = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
    a.union(b).distinct().except(c)
  }

  /** q41: MULTISET set operations — `intersectAll`/`exceptAll` keep
    * duplicate multiplicity (min / difference of per-value counts), the
    * ALL variants q14's distinct-set forms don't exercise. Same
    * shuffle-on-value plan class as q14; multiplicity is tracked by a
    * count aggregate under the hood, not by materializing duplicates.
    */
  def multisetOps(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val r  = li.filter(col("l_returnflag") === "R").select(col("l_partkey").as("pk"))
    val a  = li.filter(col("l_returnflag") === "A").select(col("l_partkey").as("pk"))
    val n  = li.filter(col("l_returnflag") === "N").select(col("l_partkey").as("pk"))
    r.intersectAll(a).exceptAll(n)
  }

  /** q53: explicit GROUPING SETS — the general form ROLLUP (q16) and CUBE
    * (q31) are sugar for: exactly the requested grouping combinations,
    * one Expand over the scan, with `grouping_id` disambiguating which
    * set a row belongs to (NULL flag keys from NULL data would otherwise
    * collide). Exercised through the SQL surface, the only place Spark
    * exposes arbitrary sets.
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("graft_q53_orders")
    spark.sql(
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(grouping_id() AS BIGINT) AS gid,
        |  round(sum(o_totalprice), 2) AS total, count(*) AS n
        |FROM graft_q53_orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |""".stripMargin)
  }

  /** q15: conditional aggregation (pivot-by-CASE). */
  def statusPivot(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
        count(when(col("o_orderstatus") === "P", 1)).as("n_p"),
        round(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0)), 2).as("rev_f"),
      )

  /** q16: ROLLUP grouping sets. */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))

  /** q17: expression evaluation + string functions. */
  def nameBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables
      .part(spark, dir)
      .select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("prefix"),
        when(col("p_size") < 10, "S").when(col("p_size") < 30, "M").otherwise("L").as("size_bucket"),
        length(col("p_name")).cast("long").as("name_len"),
      )

  /** q18: HAVING — post-aggregation filter. */
  def bigSegments(spark: SparkSession, dir: String): DataFrame =
    Tables
      .customer(spark, dir)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(avg("c_acctbal"), 2).as("avg_bal"))
      .filter(col("n") > 20)

  /** q19: approximate sketches — HLL++ count-distinct and a quantile sketch.
    * Sketch internals differ engine-to-engine, so this is checked rows-only.
    */
  def approxSketches(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy("event_type")
      .agg(
        approx_count_distinct("user_id").as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("p50_sketch"),
      )

  /** q20: exact interpolated quantiles (same linear-interpolation definition
    * as DuckDB's quantile_cont, so this one IS oracle-checked).
    */
  def valueQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
      )

  /** q31: CUBE grouping sets. */
  def cubeRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(round(sum("l_extendedprice"), 2).as("rev"), count(lit(1)).as("n"))

  /** q32: ntile + percent_rank window functions (rank fractions are exact
    * rationals, identical across engines).
    */
  def ntilePercentRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables
      .customer(spark, dir)
      .select(
        col("c_custkey"),
        col("c_mktsegment"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
      )
  }

  /** q33: RANGE-frame window — trailing-30-day revenue per customer. The
    * frame is keyed on integer day numbers so both engines bound it
    * identically.
    */
  def trailingRevenue(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
    val w = Window.partitionBy("o_custkey").orderBy(day).rangeBetween(-30, Window.currentRow)
    Tables
      .orders(spark, dir)
      .select(col("o_orderkey"), round(sum("o_totalprice").over(w), 2).as("rev_30d"))
  }

  /** q34: ordered string aggregation (listagg) — sorted so the
    * nondeterministic collect order can't leak into the result.
    */
  def statusListAgg(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .groupBy("o_custkey")
      .agg(array_join(array_sort(collect_list("o_orderstatus")), ",").as("statuses"))

  /** q36: typed custom aggregate — revenue-weighted average discount per
    * return flag via the `graft_wavg` Aggregator (see
    * [[graft.functions.WeightedAvg]]).
    */
  def weightedAvgDiscount(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(round(expr("graft_wavg(l_discount, l_extendedprice)"), 6).as("wavg_disc"))

  /** q37: correlation / covariance aggregates. */
  def priceQuantityCorr(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qty_price"),
        round(covar_samp("l_quantity", "l_extendedprice"), 2).as("cov_qty_price"),
      )

  /** q35: join against a derived aggregate with a cross-table predicate —
    * customers whose lifetime spend exceeds 10x their account balance.
    */
  def bigSpenders(spark: SparkSession, dir: String): DataFrame = {
    val totals = Tables
      .orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum("o_totalprice").as("total"))
    Tables
      .customer(spark, dir)
      .join(totals, col("o_custkey") === col("c_custkey"))
      .filter(col("total") > col("c_acctbal") * 10)
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"), round(col("total"), 2).as("total"))
  }

  /** q54: part-pair co-occurrence (market-basket) — pairs of parts bought
    * together in at least `minSupport` orders. Pairs are generated
    * WITHIN each order's collected part set (`collect_set` map-side
    * combines; `sort_array` makes the set order deterministic and gives
    * `part_a < part_b` for free), so candidate pairs per order are
    * bounded by C(lines, 2) (TPC-H orders carry <= 7 lines) and the
    * whole operator is TWO keyed exchanges: the per-order set build and
    * the pair count. (The r1-r4 self-join form spent a third exchange
    * on DISTINCT before joining; the set form dedups inside the first
    * aggregate.) The nested-transform pair expansion is a scan-side
    * projection of each tiny array — order-quadratic only in the
    * bounded per-order line count, like the join it replaces.
    */
  def partCooccurrence(spark: SparkSession, dir: String, minSupport: Long = 2L): DataFrame = {
    // r16 shape: one explicit order-key exchange feeds BOTH the
    // in-basket dedupe (groupBy(l_orderkey, l_partkey) — clustered-by-
    // subset, no second exchange) and the within-key pair self-join
    // (both sides carry the same partitioning — shuffle-free, the
    // exchange subtree is reused). The previous collect_set form built
    // every basket's set in the scan task's map-side ObjectHashAggregate
    // — interpreted per-row object work on the serial side of the first
    // exchange; here the scan side only projects, and the dedupe + the
    // (still basket-bounded) pair expansion run post-exchange with full
    // codegen. Same pair multiset: a<b ordering via the join condition.
    val op = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .repartition(col("l_orderkey"))
      .groupBy("l_orderkey", "l_partkey")
      .agg(lit(1))
      .select(col("l_orderkey"), col("l_partkey"))
    op.as("a")
      .join(op.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= minSupport)
  }

  /** q138: ASSOCIATION RULES (support / confidence / lift — the classic
    * market-basket operator on top of q54's co-occurrence counts): for
    * every part pair passing min-support, BOTH directed rules a→b with
    * confidence = n_ab/n_a and lift = n_ab·N/(n_a·n_b), all in exact
    * integer ppm via the DECIMAL(38) DIV discipline. Lift > 1e6 means
    * the pair co-occurs more than independence predicts — the signal a
    * recommender or substitution analysis reads.
    *
    * Shape: q54's bounded in-basket pair generation (within-ORDER-key
    * self-join of the deduped basket table — blowup bounded per order,
    * never an item-keyed fact join), item supports from one distinct
    * fold, the 1-row basket total broadcast. Pair table is
    * support-filtered BEFORE the rule expansion.
    */
  def associationRules(spark: SparkSession, dir: String, minSupport: Long = 3L): DataFrame = {
    val pairs = partCooccurrence(spark, dir, minSupport)
    val itemN = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_partkey").as("item")).agg(count(lit(1)).as("n_item"))
    val total = Tables.lineitem(spark, dir)
      .agg(countDistinct("l_orderkey").as("n_baskets"))
    val directed = pairs
      .select(col("part_a").as("antecedent"), col("part_b").as("consequent"), col("n_orders"))
      .unionByName(pairs
        .select(col("part_b").as("antecedent"), col("part_a").as("consequent"), col("n_orders")))
    directed
      .join(itemN.withColumnRenamed("item", "antecedent").withColumnRenamed("n_item", "n_ante"),
        Seq("antecedent"))
      .join(itemN.withColumnRenamed("item", "consequent").withColumnRenamed("n_item", "n_cons"),
        Seq("consequent"))
      .crossJoin(broadcast(total))
      .select(col("antecedent"), col("consequent"), col("n_orders").as("n_both"),
        expr("CAST(CAST(n_orders AS DECIMAL(38,0)) * 1000000 DIV n_ante AS BIGINT)")
          .as("confidence_ppm"),
        expr("""CAST(CAST(n_orders AS DECIMAL(38,0)) * n_baskets * 1000000
               |  DIV (CAST(n_ante AS DECIMAL(38,0)) * n_cons) AS BIGINT)""".stripMargin)
          .as("lift_ppm"))
  }

  /** q140: BFS / k-hop shortest DISTANCE over the part co-occurrence
    * graph — the shortest-path classic completing the graph tier (q80
    * PageRank, q84 triangles, d06 connected components). Source = the
    * smallest part key in the edge set (deterministic); 3 unrolled
    * frontier rounds exactly like q80's fixed-point discipline: each
    * round is ONE keyed join (frontier ⋈ edges) + a min-fold, merged
    * into the reached set with min-distance wins. Unrolling (vs a loop)
    * keeps the plan static and oracle-replayable; at 100 TB each round
    * is a co-partitioned join on the edge key and the frontier only
    * carries NEWLY reached nodes' expansions.
    */
  def bfsDistance(spark: SparkSession, dir: String, hops: Int = 3): DataFrame = {
    // support 1: BFS wants the CONNECTIVITY graph (all co-purchases),
    // not q54's frequent-pair slice — at support 2 the frontier dead-ends
    val pairs = partCooccurrence(spark, dir, minSupport = 1L)
    // materialize the derived graph ONCE (q80's pattern, r16): without
    // the lazy cut the q54 self-join sits in every hop's lineage — the
    // 3-hop plan inlined the co-occurrence subtree 30 times (30 lineitem
    // FileScans / 60 collect_set aggregates, measured via ExplainOne)
    val edges = pairs.select(col("part_a").as("src"), col("part_b").as("dst"))
      .unionByName(pairs.select(col("part_b").as("src"), col("part_a").as("dst")))
      .localCheckpoint(false)
    val seed = broadcast(edges.agg(min("src").as("part")).withColumn("dist", lit(0L)))
    var reached = seed.select(col("part"), col("dist"))
    for (k <- 1 to hops) {
      val next = reached.filter(col("dist") === (k - 1))
        .join(edges, col("part") === col("src"))
        .select(col("dst").as("part"), lit(k.toLong).as("dist"))
        .distinct()
      // cut per hop: `reached` is referenced twice per round (frontier
      // filter + union), so the uncut loop doubles the prefix plan 2^k;
      // the final round stays uncut so the returned plan is inspectable
      reached = reached.unionByName(next)
        .groupBy("part").agg(min("dist").as("dist"))
      if (k < hops) reached = reached.localCheckpoint(false)
    }
    reached
  }

  /** q55: unpivot (wide -> long melt) — per-priority order metrics turned
    * into (priority, metric, metric_value) rows via the native `unpivot`
    * operator (a zero-shuffle generate over the aggregate, not a UNION of
    * re-scans: the base aggregate is computed once).
    */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables
      .orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(
        round(sum("o_totalprice"), 2).as("sum_price"),
        round(avg("o_totalprice"), 2).as("avg_price"),
        count(lit(1)).cast("double").as("n_orders"),
      )
      .unpivot(
        Array(col("o_orderpriority")),
        Array(col("sum_price"), col("avg_price"), col("n_orders")),
        "metric",
        "metric_value",
      )

  /** q56: deterministic mode + discrete median per group. Spark's `mode()`
    * (and DuckDB's) break frequency ties by arrival order — nondeterminism
    * an engine contract can't carry — so mode is computed as count +
    * rank with an explicit (count DESC, value ASC) tiebreak, and the
    * discrete median as the smallest value whose cume_dist reaches 0.5
    * (percentile_disc semantics). Both are one narrow shuffle on the group
    * key; the mode count is map-side combined before the rank.
    */
  def modeMedian(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val wMode  = Window.partitionBy("event_type").orderBy(col("n").desc, col("user_id"))
    val mode = events
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(wMode))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("user_id").as("mode_user"), col("n").as("mode_n"))
    val wMed = Window.partitionBy("event_type").orderBy("value")
    val median = events
      .select(col("event_type"), col("value"), cume_dist().over(wMed).as("cd"))
      .filter(col("cd") >= 0.5)
      .groupBy("event_type")
      .agg(round(min("value"), 4).as("median_value"))
    mode.join(median, Seq("event_type"))
  }

  /** q57: window navigation — first/last/nth_value over the full partition
    * frame plus share-of-total (ratio_to_report), per customer order
    * history. One shuffle on the partition key serves all four windows
    * (same partitioning + ordering, so Catalyst plans a single Window
    * node over one sort).
    */
  def windowNavigation(spark: SparkSession, dir: String): DataFrame = {
    val w = Window
      .partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wSum = Window.partitionBy("o_custkey")
    Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        round(first("o_totalprice").over(w), 2).as("first_price"),
        round(last("o_totalprice").over(w), 2).as("last_price"),
        round(nth_value(col("o_totalprice"), 2).over(w), 2).as("second_price"),
        round(col("o_totalprice") / sum("o_totalprice").over(wSum), 6).as("share_of_customer"),
      )
  }

  /** q61: per-group z-score outliers — customers whose account balance
    * sits more than `z` sample-stddevs from their market segment's mean.
    * Two passes, neither a window over the corpus: a tiny per-segment
    * moment aggregate (map-side combined, 5 rows) broadcast back over the
    * scan — the 100 TB anomaly-flagging shape (segment stats are KBs at
    * any corpus size).
    */
  def zscoreOutliers(spark: SparkSession, dir: String, z: Double = 2.0): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val stats = cust
      .groupBy("c_mktsegment")
      .agg(avg("c_acctbal").as("mu"), stddev_samp("c_acctbal").as("sigma"))
    cust
      .join(broadcast(stats), Seq("c_mktsegment"))
      .withColumn("zscore", (col("c_acctbal") - col("mu")) / col("sigma"))
      .filter(abs(col("zscore")) > z)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        round(col("zscore"), 4).as("zscore"))
  }

  /** q68: approximate heavy hitters per return flag via the mergeable
    * Misra–Gries summary ([[graft.functions.HeavyHitters]]). Unlike the
    * exact q47/q54 frequency queries, per-group state is O(k) however
    * many distinct part keys stream through — the summary the engine
    * keeps when the distinct-item space itself is too large to aggregate
    * exactly (e.g. per-minute heavy hitters over URL spaces). Rows-only
    * driver entry: MG counts depend on the partition merge order; the
    * spec asserts the order-independent bounds instead.
    */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(expr("graft_mg8(l_partkey)").as("hh"))
      .select(col("l_returnflag"), posexplode(col("hh")).as(Seq("i", "e")))
      .select(col("l_returnflag"), col("e.item").as("l_partkey"),
        col("e.approx_count").as("approx_count"), (col("i") + 1).cast("long").as("rank"))

  /** q69: equi-width value histogram with shares — the distribution
    * profile a query planner or data-quality monitor reads. Bin edges
    * derive from the global min/max (one broadcast row computed
    * in-query, so the histogram is well-defined at any scale without a
    * prior pass); binning is then a scan-side projection and the
    * histogram itself one map-side-combined aggregate over `nBins` keys.
    */
  def priceHistogram(spark: SparkSession, dir: String, nBins: Int = 10): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val mm  = ord.agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
    val binned = ord
      .crossJoin(broadcast(mm))
      .withColumn("bin",
        least(lit(nBins - 1L), floor((col("o_totalprice") - col("lo")) / ((col("hi") - col("lo")) / nBins.toDouble))))
    val g = binned.groupBy("bin").agg(count(lit(1)).as("n"))
    g.crossJoin(broadcast(g.agg(sum("n").as("tot"))))
      .select(col("bin"), col("n"), round(col("n").cast("double") / col("tot"), 4).as("share"))
  }

  /** q66: per-group top-k via the bounded [[graft.functions.TopK]]
    * aggregate — top-3 customers by account balance per market segment.
    * Unlike the q10/q30 window formulation (which sorts every raw row of
    * every group under the rank), this shuffles only k-sized partial
    * buffers: state per group is O(k) and the aggregate map-side
    * combines, so per-group top-k over billions of rows moves
    * groups×k data, not the corpus. The plan has NO Window node
    * (asserted in PlanSpec).
    */
  def topPerSegment(spark: SparkSession, dir: String): DataFrame =
    Tables
      .customer(spark, dir)
      .groupBy("c_mktsegment")
      .agg(expr("graft_top3(c_acctbal, c_custkey)").as("top"))
      .select(col("c_mktsegment"), posexplode(col("top")).as(Seq("i", "e")))
      .select(
        col("c_mktsegment"),
        col("e.key").as("c_custkey"),
        col("e.score").as("c_acctbal"),
        (col("i") + 1).cast("long").as("rn"),
      )

  /** q62: skew-salted join — the survival pattern for a sort-merge join
    * whose fact key is skewed: the dim side is replicated `salts` ways
    * and each fact row routes to one replica by a deterministic hash, so
    * a hot key's rows spread over `salts` tasks instead of one straggler
    * executor. The salt changes the PARTITIONING, never the RESULT: the
    * oracle is the plain unsalted join. AQE's skew-join split handles
    * mid-size skew on its own; explicit salting is the tool once a
    * single key outgrows what one task can sort. (`merge` hint pins the
    * SMJ path — broadcasting the dim would bypass the skew entirely,
    * which is the right fix when the dim fits, and beside the point
    * here.)
    */
  def saltedRevenueByBrand(spark: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    val fact = Tables
      .lineitem(spark, dir)
      // EXACT money sums in LONG micro-units (1e-4), not decimal: at
      // sf1 a brand's ~230k-row double sum reaches 1e10 where
      // summation-order drift crosses round(·, 2) boundaries between
      // engines (the q12 rule, caught by the r10 sf1 gate). The per-row
      // double product is bit-identical in both engines (same IEEE
      // ops) and its true value lies on the 1e-4 grid, so
      // nearest-integer at ×1e4 is tie-free (row values ≤ 1e5 keep the
      // scaled error ~1e-6 ≪ 0.5) and equals the oracle's
      // DECIMAL(18,4) cast — while the long sum stays whole-stage
      // codegen'd where r11's decimal(28,4) aggregation paid BigDecimal
      // arithmetic per row (~1.5× q62 wall-clock, the one >1.25×
      // regression in the r12 interleaved A/B). Range: micro-units sum
      // to ~1e14 per brand at sf1, 2^63 headroom past sf10000.
      .select(col("l_partkey"),
        expr("cast(round(l_extendedprice * (1 - l_discount) * 10000) as long)").as("rev_u"),
        pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(salts)).as("salt"))
    val dim = Tables
      .part(spark, dir)
      .select(col("p_partkey"), col("p_brand"))
      .withColumn("salt", explode(array((0 until salts).map(lit(_)): _*)))
    fact
      .join(dim.hint("merge"),
        fact("l_partkey") === dim("p_partkey") && fact("salt") === dim("salt"))
      .groupBy("p_brand")
      .agg(sum("rev_u").as("rev_u"), count(lit(1)).as("n_items"))
      // HALF_UP at 2 decimals in INTEGER space ((x+50) div 100 on the
      // all-positive micro-unit sums — DuckDB's decimal round is
      // half-away, identical for positive money), then one exact double
      // division; the double output keeps the driver's representation
      // hash aligned with the oracle's DOUBLE cast.
      .select(col("p_brand"),
        (expr("(rev_u + 50) div 100") / 100.0).as("revenue"),
        col("n_items"))
  }

  /** q71: correlated EXISTS with a NON-EQUI outer-referencing predicate —
    * the SQL-core surface q07's simple EXISTS doesn't cover: the inner
    * predicate compares inner columns against TWO outer columns
    * (ship lag vs the order's own date; line price vs a fraction of the
    * order's own total). Written as SQL on purpose: Catalyst's
    * RewritePredicateSubquery must DECORRELATE it into one left-semi
    * hash join on the equi part (l_orderkey = o_orderkey) carrying the
    * non-equi terms as the join's extra condition — per-outer-row
    * subquery re-execution or a BroadcastNestedLoopJoin here would be
    * O(orders × lineitem) and is asserted absent in PlanSpec. Timestamps
    * cross engines as epoch-µs integers (house rule).
    */
  def correlatedExists(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.Catalog.registerAll(spark, dir)
    spark.sql(
      """SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS totalprice
        |FROM orders o
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND unix_micros(CAST(l.l_shipdate AS TIMESTAMP))
        |        > unix_micros(CAST(o.o_orderdate AS TIMESTAMP)) + 8640000000000
        |    AND l.l_extendedprice > o.o_totalprice * 0.3)""".stripMargin)
  }

  /** q73: NOT IN over a NULLABLE subquery column — the third subquery
    * surface (q71 EXISTS, q72 LATERAL): three-valued NOT IN is the
    * famous SQL footgun (one NULL in the set empties the result) and
    * plans as a NULL-AWARE anti join. The subquery column is nullable
    * by type but never actually null here, so the result is the
    * sensible "customers with no F order" — while Spark must still
    * plan the null-aware path (it decides on the TYPE). The single-
    * column null-aware anti join broadcasts and hashes
    * (optimizeNullAwareAntiJoin); the actual-null semantics (empty
    * result) are pinned in a spec, not the driver query.
    */
  def notInSubquery(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.Catalog.registerAll(spark, dir)
    spark.sql(
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT CASE WHEN o_totalprice < 0 THEN NULL ELSE o_custkey END
        |  FROM orders WHERE o_orderstatus = 'F')""".stripMargin)
  }

  /** q72: LATERAL correlated aggregate — for every customer, the inner
    * table computes an aggregate over THAT customer's orders (equi
    * correlation) under a constant inner filter that must still reach
    * the orders scan as pushdown. The aggregate-without-GROUP-BY lateral
    * always yields exactly one row per outer row, and the decorrelated
    * shape is one aggregate grouped by the correlation key left-outer-
    * joined back to the outer table — never per-row subquery execution.
    *
    * Deliberately NOT an outer-referencing non-equi lateral: Spark's
    * DecorrelateInnerQuery handles that by materializing a DOMAIN of the
    * referenced outer attribute and nested-loop-joining it against the
    * inner table (measured here: distinct balances × orders BNLJ) —
    * exactly the all-pairs shape the fleet bans. The outer-referencing
    * non-equi case rides q71's EXISTS, where the rewrite keeps it as an
    * extra condition on the semi join; the comparison against the
    * customer's own balance happens on the one-row lateral OUTPUT
    * instead, which is free.
    */
  def lateralAggregate(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.Catalog.registerAll(spark, dir)
    spark.sql(
      """SELECT c.c_custkey, t.n_big_orders, t.big_total,
        |  CASE WHEN t.big_total > 50 * c.c_acctbal THEN 1 ELSE 0 END AS over_balance
        |FROM customer c,
        |LATERAL (
        |  SELECT count(*) AS n_big_orders,
        |         round(coalesce(sum(o.o_totalprice), 0), 2) AS big_total
        |  FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000) t""".stripMargin)
  }

  /** q80: graph analytics over a derived graph — PageRank on the q54
    * part-co-occurrence graph (undirected: both directions of each
    * pair), `iters` synchronous iterations, in FIXED-POINT INTEGER
    * arithmetic (scores in micro-units; per-edge contribution is
    * integral `div` by out-degree, damping is `×85 div 100`): every
    * operation is exact and associative, so the result is identical on
    * any engine and any partitioning — float PageRank can't promise
    * either (per-node sums are order-sensitive), which is why this is
    * the portable formulation. The dropped division remainders are the
    * standard fixed-point quantization, bounded by deg(v) micro-units
    * per node per round.
    *
    * Scale shape: each iteration is one keyed join (edges × ranks, both
    * partitioned on the source node) + one map-side-combined sum — the
    * d06 loop pattern; at real depth the loop body would
    * localCheckpoint every few rounds to cut lineage (documented in
    * d06; 3 rounds here doesn't need it).
    */
  def pageRank(spark: SparkSession, dir: String, iters: Int = 3, minSupport: Long = 2L): DataFrame = {
    val pairs = partCooccurrence(spark, dir, minSupport).select("part_a", "part_b")
    // materialize the derived graph ONCE (d06's pattern): without this
    // the q54 self-join sits in every iteration's lineage and the
    // 3-round loop re-derives it several times over. LAZY checkpoints
    // (eager=false): merely constructing the DataFrame must run zero
    // jobs (PlanAudit plans every query without executing it), and the
    // cut still happens on first action before any iteration re-reads.
    val edges = pairs
      .union(pairs.select(col("part_b").as("part_a"), col("part_a").as("part_b")))
      .select(col("part_a").as("src"), col("part_b").as("dst"))
      .localCheckpoint(false)
    val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")).localCheckpoint(false)
    // r17: the rank frame CARRIES the node's out-degree, so each
    // iteration is ONE keyed join (edges × rank) instead of two — the
    // per-iteration re-join against deg was a second probe pass over
    // every edge for a value that never changes (guide §3: join count
    // is per-iteration cost in a loop). Arithmetic unchanged and exact.
    var rank = deg.select(col("node"), lit(1000000L).as("r"), col("deg"))
    (1 to iters).foreach { _ =>
      val contribs = edges
        .join(rank.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy("node")
        .agg(sum("c").as("in_sum"))
      rank = deg
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("coalesce(in_sum, 0L) * 85 div 100")).as("r"),
          col("deg"))
    }
    rank.select(col("node").as("part"), col("r").as("rank_micro"))
  }

  /** q84: graph analytics over the derived part co-occurrence graph —
    * per-node triangle participation and wedge counts (the local
    * clustering coefficient's exact numerator/denominator, kept as
    * LONGS so the contract is hash-exact; the coefficient itself is
    * their ratio, a presentation detail).
    *
    * Triangle enumeration uses the forward-edge ordering trick (every
    * edge stored a<b, triangles joined as (a,b)⋈(b,c)⋈(a,c)): each
    * triangle is produced exactly once, and the join fan-out is bounded
    * by FORWARD degree — the standard distributed triangle-count shape
    * (node-iterator++), which at 100 TB keeps the quadratic step on the
    * ordered half of each adjacency list instead of full degree. The
    * edge list derives once and localCheckpoints (lazy) because three
    * self-joins would otherwise re-derive the q54 aggregate three
    * times. Wedges = deg·(deg−1)/2 — exact (the product is even).
    */
  def triangleStats(spark: SparkSession, dir: String, minSupport: Long = 2L): DataFrame = {
    val edges = partCooccurrence(spark, dir, minSupport)
      .select(col("part_a").as("a"), col("part_b").as("b"))
      .localCheckpoint(false)
    val tri = edges.as("e1")
      .join(edges.as("e2"), col("e1.b") === col("e2.a"))
      .join(edges.as("e3"), col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val triPerNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("part"))
      .groupBy("part")
      .agg(count(lit(1)).as("n_triangles"))
    val deg = edges.select(col("a").as("part"))
      .union(edges.select(col("b").as("part")))
      .groupBy("part")
      .agg(count(lit(1)).as("degree"))
    deg
      .join(triPerNode, Seq("part"), "left")
      .select(
        col("part"),
        col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        expr("CAST(degree * (degree - 1) / 2 AS BIGINT)").as("n_wedges"))
  }

  /** q85: key-skew diagnostics — the operability primitive that decides
    * WHETHER a join needs q62's salting or an AQE skew hint before it
    * burns a cluster: per-key frequency of a join key with each heavy
    * key's skew factor as an exact integer permille of the uniform
    * share (n·n_keys·1000 DIV total — longs end-to-end, hash-exact).
    * One map-side-combined count, a broadcast of the 3-number global
    * stats row, and a global top-N (TakeOrdered — no full sort) over
    * the heaviest keys: nothing here grows with table size except the
    * first aggregate's key space.
    */
  def skewDiagnostics(spark: SparkSession, dir: String, topN: Int = 20): DataFrame = {
    val counts = Tables
      .lineitem(spark, dir)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"))
    val stats = counts.agg(
      sum("n").as("total"),
      count(lit(1)).as("n_keys"))
    counts
      .crossJoin(broadcast(stats))
      .select(
        col("l_suppkey"),
        col("n"),
        expr("CAST(n * n_keys * 1000 DIV total AS BIGINT)").as("skew_permille"))
      .orderBy(col("n").desc, col("l_suppkey"))
      .limit(topN)
  }

  /** q76: COUNT(DISTINCT …) OVER a partition — SQL surface Spark's
    * window operator refuses outright (`DISTINCT_WINDOW_FUNCTION_
    * UNSUPPORTED`), expressed with the dense_rank identity: the number
    * of distinct values in a partition is the maximum dense_rank under
    * ORDER BY that value. Both windows share one partition key, so the
    * plan pays ONE hash exchange on o_custkey and sorts only within
    * customer-sized groups — never a global window; per-partition state
    * is the group, exactly what the semantics require.
    */
  def windowedDistinct(spark: SparkSession, dir: String): DataFrame = {
    val byVal = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    val part  = Window.partitionBy("o_custkey")
    Tables
      .orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), dense_rank().over(byVal).as("dr"))
      .select(col("o_orderkey"), col("o_custkey"),
        max("dr").over(part).cast("long").as("n_priorities"))
  }

  /** q77: hierarchical rollup via Spark 4's native `WITH RECURSIVE`
    * (UNION ALL) — the org-chart/BOM pattern: every part rolls its
    * revenue up the implied decimal category tree (parent = key DIV 10,
    * root 0), so each node reports its full subtree. Recursion depth is
    * the tree height (≤7 for int keys — each step strictly shrinks the
    * node id), and each iteration is one keyed self-step over rows that
    * only shrink: parts×height rows total, exact DECIMAL sums, no
    * fixpoint loop hand-rolled on the driver.
    *
    * Boundary, probed on this Spark: recursive CTEs accept UNION ALL
    * only (`UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE`), so CYCLIC closure —
    * connected components over an undirected dup graph — still needs
    * d06's DataFrame fixpoint with localCheckpoint lineage control;
    * this row covers the acyclic-hierarchy half of recursion.
    */
  def hierarchyRollup(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.Catalog.registerAll(spark, dir)
    spark.sql(
      """WITH RECURSIVE up (node, part, rev) AS (
        |  SELECT p.p_partkey DIV 10, p.p_partkey, r.rev
        |  FROM part p JOIN (
        |    SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |    FROM lineitem GROUP BY l_partkey) r
        |    ON r.l_partkey = p.p_partkey
        |  UNION ALL
        |  SELECT node DIV 10, part, rev FROM up WHERE node > 0
        |)
        |SELECT node, count(*) AS parts_below,
        |  CAST(round(sum(rev), 2) AS DOUBLE) AS subtree_rev
        |FROM up GROUP BY node""".stripMargin)
  }

  /** q92: GROUPS-frame window — SQL:2011 `GROUPS BETWEEN 2 PRECEDING AND
    * CURRENT ROW` (+ its EXCLUDE GROUP variant), a frame type Spark's
    * Window API does not offer. Composed Spark-first instead of a custom
    * physical operator: `dense_rank()` assigns every peer group (rows
    * tied on the order key) its ordinal, and a RANGE frame over that
    * ordinal is exactly the GROUPS frame — peers share an ordinal, so
    * the whole current peer group is always in-frame (the GROUPS rule),
    * and `k PRECEDING` counts distinct ordinals, not rows. EXCLUDE
    * GROUP = the same frame minus the current ordinal = range(-2, -1).
    * Two windows over ONE partitioning/ordering → a single sort+shuffle
    * (both Window nodes share the exchange); scales like any windowed
    * scan: state is the running frame, never the partition.
    * Oracle: DuckDB's native GROUPS frames replay both columns.
    */
  def groupsFrame(spark: SparkSession, dir: String): DataFrame = {
    val mkey   = year(col("o_orderdate")) * 12 + month(col("o_orderdate"))
    val ranked = Tables
      .orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), mkey.as("mkey"))
      .select(col("*"),
        dense_rank().over(Window.partitionBy("o_custkey").orderBy("mkey")).as("grp"))
    val frame = Window.partitionBy("o_custkey").orderBy("grp")
    ranked.select(
      col("o_orderkey"),
      round(sum("o_totalprice").over(frame.rangeBetween(-2, Window.currentRow)), 2)
        .as("rev_3grp"),
      round(sum("o_totalprice").over(frame.rangeBetween(-2, -1)), 2)
        .as("rev_prior2"),
    )
  }

  /** q95: frame EXCLUSION (SQL:2011 `EXCLUDE GROUP` / `EXCLUDE CURRENT
    * ROW`) — the frame modifier Spark's window grammar lacks, COMPOSED
    * from plain windows over one shared sort (the q92 discipline, so
    * Catalyst plans ONE exchange): a trailing-30-day spend that
    * excludes the current day's own orders is `RANGE-frame sum − same-
    * day peer sum` (NULL when the frame minus the peer group is empty —
    * the count pair decides), and a ±2-neighbor count excluding self is
    * `ROWS-frame count − 1`. The RANGE + EXCLUDE GROUP combination is
    * tie-INSENSITIVE by construction (peers leave together), which is
    * what makes it hashable cross-engine; money rides exact integer
    * cents (micro-unit rule) so no float sum can drift. Oracle: DuckDB's
    * NATIVE `EXCLUDE` clauses over the same windows.
    */
  def excludeFrame(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables
      .orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date")).as("day"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val wRange = Window.partitionBy("o_custkey").orderBy("day")
      .rangeBetween(-30, Window.currentRow)
    val wPeers = Window.partitionBy("o_custkey", "day")
    val wRows = Window.partitionBy("o_custkey").orderBy(col("day"), col("o_orderkey"))
      .rowsBetween(-2, 2)
    val exCnt = count(lit(1)).over(wRange) - count(lit(1)).over(wPeers)
    o.select(
      col("o_custkey"),
      col("o_orderkey"),
      when(exCnt > 0, sum("cents").over(wRange) - sum("cents").over(wPeers))
        .as("cents_30d_other_days"),
      (count(lit(1)).over(wRows) - 1).as("n_neighbors"))
  }

  /** q93: linear-regression aggregates — `regr_slope/intercept/r2/count`
    * of extended price on quantity per return flag. Single-pass
    * map-side-combined sufficient statistics inside whole-stage codegen
    * (Spark's regr_* family), no second scan; rounded on both sides so
    * summation order can't leak into the hash (the q37 precedent).
    */
  def regrLinefit(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("intercept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n_pairs"),
      )

  /** q100: national market share (the TPC-H Q8 shape on this schema) —
    * the flagship 8-table join: NATION_6 suppliers' share of ECONOMY-
    * part revenue sold to AMERICA-region customers, by order year. The
    * declarative plan is the whole point at 100 TB: facts
    * (lineitem⋈orders) shuffle on their join keys with filters pushed
    * to every scan (date range, p_type, r_name prune BEFORE the
    * joins); the four dimension legs (nation ×2, region, supplier,
    * customer) are broadcast-sized or AQE-broadcast; no join order is
    * hand-scheduled. Money discipline: volume = extendedprice·(1 −
    * discount) has exactly 4 decimals, so it rides EXACT integer 1e-4
    * units (the q62 rule: cents × (100 − disc100)), and the share is
    * integer ppm via DECIMAL(38) DIV (the q94 rule) — no float crosses
    * a row boundary, the hash compare is exact at any SF.
    */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val vol = Tables
      .lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (expr("cast(round(l_extendedprice * 100) as bigint)") *
          (lit(100L) - expr("cast(round(l_discount * 100) as bigint)"))).as("vol_e4"))
    val econParts = Tables.part(spark, dir)
      .filter(col("p_type") === "ECONOMY").select("p_partkey")
    // range filter on the raw TIMESTAMP_NTZ column (no cast on the
    // column side) so it reaches the parquet scan as PushedFilters;
    // order dates are midnight-aligned, so [1995-01-01, 1997-01-01) ==
    // BETWEEN the two dates
    val ord = Tables
      .orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
      .select(col("o_orderkey"), col("o_custkey"),
        // long, not int: DuckDB's year() is BIGINT, and the driver's
        // hash gate is dtype-sensitive (the q103/q114 trap class)
        year(col("o_orderdate").cast("date")).cast("long").as("o_year"))
    val amerCust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "AMERICA")
            .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val suppNation = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_nation")
    vol
      .join(econParts, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(amerCust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy("o_year")
      .agg(
        sum(when(col("supp_nation") === "NATION_6", col("vol_e4")).otherwise(0L)).as("nation_vol_e4"),
        sum("vol_e4").as("total_vol_e4"))
      .select(col("o_year"), col("nation_vol_e4"), col("total_vol_e4"),
        expr("CAST(nation_vol_e4 AS DECIMAL(38,0)) * 1000000 DIV total_vol_e4").as("mkt_share_ppm"))
  }

  /** q101: referential-integrity audit — the data-quality gate every
    * ingest pipeline runs before trusting joins (an orphan fact row
    * silently VANISHES from inner-join analytics; a duplicate PK
    * silently DOUBLES revenue). One row of exact violation counts:
    * orphan lineitems (fact→orders FK broken), childless orders
    * (no fact rows — legal but watched), orders with a broken
    * customer FK, and duplicate o_orderkey count. All four are
    * keyed anti-join / combine shapes — each audit is one shuffle on
    * the key it checks, the same cost class as the joins it protects;
    * the four 1-row results assemble by broadcast cross join.
    */
  def integrityAudit(spark: SparkSession, dir: String): DataFrame = {
    val li   = Tables.lineitem(spark, dir).select(col("l_orderkey"))
    val ord  = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"))
    val orphanLineitems = li.join(ord.select("o_orderkey"),
      li("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_lineitems"))
    val childlessOrders = ord.select("o_orderkey").join(li.distinct(),
      col("o_orderkey") === col("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("childless_orders"))
    val orphanOrders = ord.select("o_custkey").join(cust,
      col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orders_bad_custkey"))
    val dupOrderkeys = ord.groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .agg(coalesce(sum("n"), lit(0L)).as("dup_orderkey_rows"))
    orphanLineitems
      .crossJoin(broadcast(childlessOrders))
      .crossJoin(broadcast(orphanOrders))
      .crossJoin(broadcast(dupOrderkeys))
  }

  /** q105: sole-failing-supplier attribution — the TPC-H Q21 shape
    * (suppliers-who-kept-orders-waiting), the classic DOUBLE-correlated
    * quantified query: count a supplier's returned lines on orders where
    * ANOTHER supplier participated (EXISTS) but NO other supplier had a
    * return (NOT EXISTS) — "the one who failed a multi-supplier order
    * alone". (This corpus has no receipt/commit dates, so "failed" =
    * returnflag 'R'; the correlation structure is Q21's exactly.)
    *
    * Spark-first DECORRELATION — no correlated self-joins: one
    * (order, supplier) aggregate (did he return? how many lines?), one
    * order-level rollup of it (suppliers, returning suppliers), one
    * keyed join back, then the supplier-level count. Both EXISTS and
    * NOT EXISTS become comparisons against the rollup's counts, each
    * lineitem row is touched once, and every shuffle is keyed by
    * orderkey/suppkey — the cost class of ONE pass over the fact table
    * at 100 TB, where the textbook doubly-nested form re-scans it twice
    * per outer row. The oracle IS the textbook form: the compare proves
    * the decorrelation.
    */
  def soleFailingSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), (col("l_returnflag") === "R").cast("long").as("ret"))
    val perSupp = li.groupBy("l_orderkey", "l_suppkey")
      .agg(max("ret").as("sup_ret"), sum("ret").as("ret_lines"))
    val perOrder = perSupp.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp"), sum("sup_ret").as("n_ret_supp"))
    perSupp
      .filter(col("sup_ret") === 1)
      .join(perOrder, Seq("l_orderkey"))
      .filter(col("n_supp") > 1 && col("n_ret_supp") === 1)
      .groupBy("l_suppkey")
      .agg(sum("ret_lines").as("kw"))
      .join(broadcast(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      // names are NOT unique per suppkey (the dim dedupes keys, not
      // names) — the report aggregates by name, like the textbook query
      .groupBy("s_name")
      .agg(sum("kw").as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** Global quintile (or any k-tile) score for `value` without a
    * SinglePartition sort — q74's band decomposition generalized to an
    * arbitrary numeric range: rows band by `width_bucket` against the
    * broadcast global min/max, per-band counts (tiny) self-cross into
    * exclusive offsets, and the global rank is offset + the row's rank
    * WITHIN its band — every sort is per-band, cluster-wide. Tile rule
    * is the equal-width quantile cut floor((rank−1)·k/n)+1 (NOT SQL
    * ntile's first-buckets-get-extras rule — this one is a pure formula
    * both engines state identically). Ties break by `id`, so the order
    * is total and the scores engine-exact on integer values.
    */
  private def globalTile(df: DataFrame, value: String, id: String, tiles: Int,
      out: String, bands: Int = 1000): DataFrame = {
    val stats = df.agg(
      min(col(value).cast("double")).as("lo"), max(col(value).cast("double")).as("hi"))
    val banded = df
      .crossJoin(broadcast(stats))
      .withColumn("band",
        least(greatest(
          coalesce(width_bucket(col(value).cast("double"), col("lo"), col("hi"), lit(bands)),
            lit(1L)) - 1L, lit(0L)), lit(bands - 1L)))
      .drop("lo", "hi")
    val counts = banded.groupBy("band").agg(count(lit(1)).as("cnt"))
    val meta = counts.as("a")
      .crossJoin(broadcast(counts.as("b")))
      .groupBy(col("a.band").as("band"))
      .agg(sum(when(col("b.band") < col("a.band"), col("b.cnt"))).as("offset"),
        sum(col("b.cnt")).as("n"))
    val w = Window.partitionBy("band").orderBy(col(value).asc, col(id).asc)
    banded
      .join(broadcast(meta), Seq("band"))
      .withColumn("rn", coalesce(col("offset"), lit(0L)) + row_number().over(w))
      .withColumn(out, (floor((col("rn") - 1) * tiles / col("n")) + 1).cast("long"))
      .drop("band", "offset", "n", "rn")
  }

  /** q106: RFM customer segmentation — the classic lifecycle-marketing
    * cut (Recency / Frequency / Monetary, each scored 1–5 by global
    * quintile) plus a deterministic segment ladder (champion / loyal /
    * recent / at_risk / hibernating / regular). Scope = customers who
    * ordered (RFM is undefined without a purchase).
    *
    * Scale shape: one keyed aggregate over orders (recency as exact
    * epoch micros, monetary as exact integer cents — round(×100) is
    * tie-free on 2-decimal money), then THREE [[globalTile]] passes —
    * each a banded decomposition, so no global sort ever materializes
    * on one partition; the segment CASE is a scan projection.
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val rfm = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(
        max(unix_micros(col("o_orderdate").cast("timestamp"))).as("r_us"),
        count(lit(1)).as("f"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("m_cents"))
    // lazy cuts between the three tile passes (r16): each globalTile
    // references its input 2x (stats agg + banding) and its banded form
    // 2x more, so the uncut 3-pass chain re-inlined the orders aggregate
    // ~2^3 times; one cut per pass keeps every subtree computed once
    val scored = Seq(("r_us", "r_score"), ("f", "f_score"), ("m_cents", "m_score"))
      .foldLeft(rfm.localCheckpoint(false)) { case (df, (v, out)) =>
        globalTile(df, v, "c_custkey", 5, out).localCheckpoint(false) }
    scored.select(
      col("c_custkey"), col("r_score"), col("f_score"), col("m_score"),
      when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4, "champion")
        .when(col("r_score") >= 4 && col("f_score") >= 4, "loyal")
        .when(col("r_score") >= 4, "recent")
        .when(col("r_score") <= 2 && col("f_score") >= 4, "at_risk")
        .when(col("r_score") <= 2, "hibernating")
        .otherwise("regular").as("segment"))
  }

  /** q107: value-concentration cut — the TPC-H Q11 shape ("important
    * stock"): keep the parts whose revenue exceeds a multiple of the
    * AVERAGE part's share (1.5×, a scale-free concentration rule — a
    * fixed fraction of total goes empty as the part universe grows).
    * The classic aggregate-vs-global-scalar query: the naive form
    * re-evaluates a scalar subquery over the whole fact table;
    * decorrelated Spark-first it is ONE keyed aggregate over lineitem, a
    * 1-row global rollup OF THAT AGGREGATE (not a second fact scan),
    * broadcast back as the threshold — the fact table is touched exactly
    * once at any scale.
    *
    * Exactness: revenue in 1e-4-dollar integer units (extprice has 2
    * decimals, discount 2 → the product has ≤4; round(×10000) of the
    * identical IEEE product is tie-free), and the HAVING compares
    * integers cross-multiplied (`value_e4 · n_parts · 10 > total_e4 ·
    * 15`) so no division ever crosses the hash.
    */
  def importantParts(spark: SparkSession, dir: String): DataFrame = {
    val vals = Tables
      .lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
        .cast("long")).as("value_e4"))
    val total = vals.agg(sum("value_e4").as("total_e4"), count(lit(1)).as("n_parts"))
    vals
      .crossJoin(broadcast(total))
      // DECIMAL(38,0) cross-multiply (the q100/q94 DIV discipline):
      // value_e4 (~1e12 at sf1e3) × n_parts (~1e8) × 10 exceeds 2^63,
      // and Spark's default non-ANSI long multiply would wrap SILENTLY
      .filter(col("value_e4").cast("decimal(38,0)") * col("n_parts") * 10 >
        col("total_e4").cast("decimal(38,0)") * 15)
      .select(col("l_partkey"), col("value_e4"))
  }

  /** q108: lapsed high-balance customers — the TPC-H Q22 shape ("global
    * sales opportunity"): customers whose balance beats the average
    * POSITIVE balance yet placed no order since the recency cutoff,
    * rolled up per nation. (This corpus's order history covers every
    * customer, so Q22's literal "never ordered" is empty; the lapsed
    * form keeps the exact query structure — threshold + anti join +
    * rollup — on the predicate a retention team actually runs.) Three
    * classic pieces in one query: an aggregate-derived scalar threshold
    * (broadcast 1-row), an anti join against the DATE-FILTERED fact
    * table (the filter pushes to the scan; never a NOT IN over it), and
    * a final keyed rollup.
    *
    * Exactness: balances in integer cents, and the above-average test is
    * the integer cross-multiply `bal_cents · n_pos > sum_pos_cents` — the
    * exact rational comparison, no float average to disagree over
    * summation order at the boundary.
    */
  def dormantHighBalance(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables
      .customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    val stats = cust
      .filter(col("bal_cents") > 0)
      .agg(count(lit(1)).as("n_pos"), sum("bal_cents").as("sum_pos_cents"))
    val recentBuyers = Tables
      .orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cust
      .crossJoin(broadcast(stats))
      // DECIMAL(38,0): bal_cents (~1e7) × n_pos (~1e10 at sf1e3) is safe
      // today but the wrap would be silent — same discipline as q107
      .filter(col("bal_cents").cast("decimal(38,0)") * col("n_pos") > col("sum_pos_cents"))
      .join(recentBuyers, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("numcust"), sum("bal_cents").as("totacctbal_cents"))
  }

  /** q109: top supplier(s) by windowed revenue — the TPC-H Q15 shape
    * (the "create view revenue0 … where total = (select max …)" query):
    * revenue per supplier over one quarter, keep every supplier tied at
    * the maximum. The aggregate-equals-its-own-max class: one keyed
    * aggregate over the date-sliced fact scan (filter pushed down), a
    * 1-row max OF THAT AGGREGATE broadcast back, an exact integer
    * equality — the fact table is touched once; Q15's view is just the
    * first aggregate named. Ties are REQUIRED semantics here (Q15's
    * spec says "in case of a tie, output all"), and exact 1e-4-dollar
    * integers make the tie test engine-identical.
    */
  def topQuarterSupplier(spark: SparkSession, dir: String): DataFrame = {
    val revenue = Tables
      .lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
        .cast("long")).as("total_e4"))
    val top = revenue.agg(max("total_e4").as("max_e4"))
    revenue
      .crossJoin(broadcast(top))
      .filter(col("total_e4") === col("max_e4"))
      .join(broadcast(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_e4"))
  }

  /** q110: RELATIONAL DIVISION (the "FOR ALL" class — the one classic
    * relational operator the inventory lacked): suppliers whose
    * heavy returned shipments (returnflag R, quantity ≥ 49) reached
    * customers in EVERY region. The textbook statement is the double
    * negation (no region without a shipment — the oracle says it that
    * way); the scalable statement is the COUNTING decorrelation: one
    * pass over the filtered fact chain, `count(DISTINCT region)` per
    * supplier, compared to the 1-row region total broadcast back. Each
    * fact row is touched once; the double-NOT-EXISTS form re-probes the
    * fact table per (supplier, region) pair — |S|·|R| correlated scans
    * at 100 TB. Dims broadcast (nation/region/supplier are genuinely
    * tiny; customer rides a keyed join, it scales with the fact side).
    */
  def regionCoverageDivision(spark: SparkSession, dir: String): DataFrame = {
    val nRegions = Tables.region(spark, dir).agg(count(lit(1)).as("n_regions"))
    Tables
      .lineitem(spark, dir)
      .filter(col("l_returnflag") === "R" && col("l_quantity") >= 49)
      .select(col("l_suppkey"), col("l_orderkey"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir).select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("l_suppkey")
      .agg(countDistinct(col("n_regionkey")).as("n_regions_covered"))
      .crossJoin(broadcast(nRegions))
      .filter(col("n_regions_covered") === col("n_regions"))
      .join(broadcast(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_regions"))
  }

  /** q111: SKYLINE / Pareto frontier (the multi-criteria "best trade-off"
    * operator — no part is both cheaper AND larger): keep every part not
    * DOMINATED (another part ≤ price, ≥ size, strictly better in one).
    * The textbook statement is a correlated NOT EXISTS self-join — the
    * oracle says it that way; at 100 TB that is all-pairs. The scalable
    * decorrelation: dominance only flows through the per-price maximum
    * size, so (1) fold the fact table to one row per DISTINCT price
    * (map-side combine; the price grid is BOUNDED — 2-decimal money, a
    * fixed value range — so this table is small at any corpus size),
    * (2) two running-max windows over that bounded table give
    * `m_lt` (max size at strictly lower price) and `m_le` (≤ price),
    * (3) one keyed join back: dominated ⇔ `m_lt ≥ size ∨ m_le > size`.
    * The only sort is over the bounded price grid, never the parts.
    * Prices in exact integer cents so the grid and the hash agree.
    */
  def paretoParts(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables
      .part(spark, dir)
      .select(col("p_partkey"), col("p_name"),
        round(col("p_retailprice") * 100).cast("long").as("price_cents"),
        col("p_size").cast("long").as("p_size"))
    val w = Window.orderBy("price_cents") // over the DISTINCT-price fold only
    val grid = parts
      .groupBy("price_cents")
      .agg(max("p_size").as("msz"))
      .withColumn("m_le", max("msz").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("m_lt",
        coalesce(max("msz").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(-1L)))
      .select("price_cents", "m_lt", "m_le")
    parts
      .join(grid, Seq("price_cents"))
      .filter(!(col("m_lt") >= col("p_size") || col("m_le") > col("p_size")))
      .select(col("p_partkey"), col("p_name"), col("price_cents"), col("p_size"))
  }

  /** q113: customer order-count distribution — the TPC-H Q13 shape
    * ("count of counts"): per customer, how many non-urgent orders;
    * then a histogram of THAT — including the zero bucket, which is why
    * the join must be LEFT OUTER with the filter in the ON clause (a
    * WHERE would silently drop the zero-order customers, the classic
    * Q13 trap). Two keyed aggregates back to back: the first shuffles
    * on custkey (the join's own key — no extra exchange), the second on
    * the tiny count domain. `count(o_orderkey)` counts matches only
    * (NULL from the outer side doesn't count) — exactly the semantics
    * the zero bucket needs.
    */
  def customerOrderDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables
      .customer(spark, dir)
      .select(col("c_custkey"))
      .join(
        Tables.orders(spark, dir)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))

  /** q118: nation-pair trade volume — the TPC-H Q7 shape ("volume
    * shipping"): revenue flowing between two SPECIFIC nations in both
    * directions, split by supplier nation × customer nation × ship
    * year. The interesting part is the DISJUNCTIVE pair predicate
    * ((s=A ∧ c=B) ∨ (s=B ∧ c=A)): both dimension legs pre-filter to the
    * two nations BEFORE joining (each leg's filter pushes to its scan
    * and shrinks the fact rows entering the orders join), and only the
    * cross-direction residual evaluates post-join. Dim legs broadcast;
    * one fact⋈fact shuffle on orderkey. Money in exact 1e-4 units, the
    * year as a long (the dtype-gate convention).
    */
  def nationPairVolume(spark: SparkSession, dir: String): DataFrame = {
    val pairNations = Tables.nation(spark, dir)
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
    val custLeg = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(pairNations.select(col("n_nationkey").as("cnk"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("cnk"))
      .select("c_custkey", "cust_nation")
    val suppLeg = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(pairNations.select(col("n_nationkey").as("snk"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("snk"))
      .select("s_suppkey", "supp_nation")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate").cast("date")).cast("long").as("l_year"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("vol_e4"))
      .join(broadcast(suppLeg), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(custLeg, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum("vol_e4").as("revenue_e4"))
  }

  /** q119: product-line profit by nation and year — the TPC-H Q9 shape:
    * a name-pattern part slice, profit = discounted revenue − cost
    * (this schema's cost basis is the part's retail price × quantity —
    * no partsupp table), rolled up per supplier nation per order year.
    * The shape's point is expression evaluation ACROSS tables inside
    * one aggregate: parts pre-filtered (the pattern pushes to the part
    * scan) then keyed-joined to the fact on partkey, orders joined for
    * the year, nation leg broadcast. Profit in exact 1e-4 integer
    * units (qty is integral in this corpus; retail has 2 decimals) —
    * negatives legitimate.
    */
  def nationProfit(spark: SparkSession, dir: String): DataFrame = {
    val gearParts = Tables.part(spark, dir)
      .filter(col("p_name").contains("gear"))
      .select(col("p_partkey"), round(col("p_retailprice") * 100).cast("long").as("retail_c"))
    val suppNation = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("qty"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("vol_e4"))
      .join(gearParts, col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate").cast("date")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy("n_name", "o_year")
      .agg(sum(col("vol_e4") - col("retail_c") * 100L * col("qty")).as("profit_e4"))
  }

  /** q120: returned-item report — the TPC-H Q10 shape: customers who
    * returned goods in a quarter, ranked by lost revenue. Fact slice
    * filtered on BOTH fact tables before the join (returnflag on the
    * lineitem scan, the quarter window on the orders scan — both
    * pushed), customer+nation dims joined after the aggregate-relevant
    * rows are known; deterministic top-20 (revenue DESC, custkey).
    */
  def returnedItemReport(spark: SparkSession, dir: String): DataFrame = {
    val returned = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("vol_e4"))
    val q1Orders = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp_ntz"))
      .select("o_orderkey", "o_custkey")
    returned
      .join(q1Orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum("vol_e4").as("lost_e4"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name", "c_nationkey", "c_acctbal"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"), col("lost_e4"))
      .orderBy(col("lost_e4").desc, col("c_custkey"))
      .limit(20)
  }

  /** q121: shipment-lateness priority profile — the TPC-H Q12 shape
    * (conditional priority counts per shipping class; this schema has
    * no shipmode, so the class is the lateness band ship−order in
    * 180-day buckets, capped): one fact⋈fact join on its own key, the
    * lateness in EXACT integer days off midnight-aligned epoch micros,
    * two conditional counts per band. Scan-shaped beyond the one join.
    */
  def latenessPriorityProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))").as("ship_us"))
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_orderpriority"),
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("ord_us")),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        least(greatest((col("ship_us") - col("ord_us")) / lit(86400000000L), lit(0L))
          .cast("long") / lit(180L), lit(4L)).cast("long").as("late_band"),
        col("o_orderpriority"))
      .groupBy("late_band")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("n_high"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("n_low"))

  /** q122: promotion revenue share by month — the TPC-H Q14 shape: the
    * part dimension joined NOT as a filter but as an INDICATOR (every
    * fact row must find its part to classify promo/non-promo), share in
    * integer ppm (the q100 DECIMAL DIV rule). One keyed fact⋈dim join +
    * a 24-row month rollup; the date window pushes to the fact scan.
    */
  def promoShare(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp_ntz"))
      .select(col("l_partkey"),
        date_format(col("l_shipdate"), "yyyy-MM").as("month"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("vol_e4"))
      .join(Tables.part(spark, dir)
          .select(col("p_partkey"), (col("p_type") === "PROMO").as("is_promo")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("month")
      .agg(
        sum(when(col("is_promo"), col("vol_e4")).otherwise(0L)).as("promo_e4"),
        sum("vol_e4").as("total_e4"))
      .select(col("month"), col("promo_e4"), col("total_e4"),
        expr("CAST(promo_e4 AS DECIMAL(38,0)) * 1000000 DIV total_e4").as("promo_ppm"))

  /** q123: supplier breadth per part class — the TPC-H Q16 shape: how
    * many DISTINCT suppliers serve each (brand, type, size) class,
    * excluding blacklisted suppliers via the textbook NOT IN subquery
    * (the analog predicate here: negative account balance). The NOT IN
    * compiles to an anti join against the tiny blacklist (broadcast);
    * the supplier×part pairs come from the fact table (no partsupp),
    * deduplicated INSIDE the per-class count-distinct — one keyed
    * aggregate after one keyed dim join.
    */
  def partSupplierBreadth(spark: SparkSession, dir: String): DataFrame = {
    val badSupp = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey").as("bad_key"))
    val classes = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#1" && col("p_size") <= 30)
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey")
      .join(broadcast(badSupp), col("l_suppkey") === col("bad_key"), "left_anti")
      .join(classes, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .select(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"),
        col("supplier_cnt"))
  }

  /** q124: disjunctive discounted revenue — the TPC-H Q19 shape: the
    * OR-of-ANDs predicate spanning BOTH join sides (three (brand, size
    * range, quantity range) conjunctions). The point is plan shape
    * under disjunction: the join stays a keyed equi-join on partkey
    * with the disjunction as a residual, the part-only disjunction
    * (brand ∨ brand ∨ brand) pre-filters the dim scan, the
    * quantity-only bound pre-filters the fact scan — Catalyst derives
    * both from the OR, and the plan audit would catch a degradation to
    * a nested-loop. One row out: line count + exact revenue.
    */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("vol_e4"))
      .join(Tables.part(spark, dir).select("p_partkey", "p_brand", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#4" && col("p_size").between(1, 15) &&
          col("qty").between(1, 20)) ||
        (col("p_brand") === "Brand#12" && col("p_size").between(10, 25) &&
          col("qty").between(10, 30)) ||
        (col("p_brand") === "Brand#21" && col("p_size").between(20, 35) &&
          col("qty").between(20, 40)))
      .agg(count(lit(1)).as("n_lines"), sum("vol_e4").as("revenue_e4"))

  /** q115: min-cost supplier — the TPC-H Q2 shape: for each qualifying
    * part, every EUROPE supplier offering the MINIMUM price, where the
    * textbook form is a correlated scalar MIN whose inner is itself a
    * multi-join (offers⋈supplier⋈nation⋈region) correlated through two
    * hops (partkey into the offer catalog). The per-(part, supplier)
    * offer catalog is derived from the fact table (this schema carries
    * no partsupp); "cost" is the pair's cheapest observed line.
    *
    * Decorrelation — the class this query exists to prove: the
    * correlated MIN compiles to ONE keyed aggregate over the joined
    * inner (min cost per part among Europe offers) plus a join-back on
    * (partkey, cost = min) that keeps ties, exactly the textbook
    * result. No per-outer-row re-execution anywhere.
    *
    * Scale: one shuffle of the fact table keyed (partkey, suppkey) for
    * the offer fold — restricted FIRST to the filtered parts (semi join
    * before the aggregate, so non-qualifying parts never enter state);
    * the supplier⋈nation⋈region leg is a broadcast dim (the q100
    * discipline); min-per-part and the join-back both key on partkey,
    * so AQE reuses the offer aggregate's partitioning. Money in exact
    * integer cents end to end.
    */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val partsF = Tables.part(spark, dir)
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 25)
      .select(col("p_partkey"))
    val euroSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .join(broadcast(Tables.region(spark, dir)
            .filter(col("r_name") === "EUROPE").select("r_regionkey")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        round(col("s_acctbal") * 100).cast("long").as("bal_cents"))
    val euroOffers = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .join(partsF, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(euroSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min("cents").as("cost_c"),
        first("s_name").as("s_name"), first("n_name").as("n_name"),
        first("bal_cents").as("bal_cents"))
    val minPerPart = euroOffers
      .groupBy(col("l_partkey").as("mp_partkey"))
      .agg(min("cost_c").as("min_c"))
    euroOffers
      .join(minPerPart,
        col("l_partkey") === col("mp_partkey") && col("cost_c") === col("min_c"))
      .select(col("l_partkey").as("p_partkey"), col("s_name"), col("n_name"),
        col("cost_c"), col("bal_cents"))
  }

  /** q116: large-quantity orders — the TPC-H Q18 shape: customers whose
    * order appears IN a HAVING-aggregated subquery (orders whose total
    * line quantity exceeds the threshold). The IN-of-aggregate class:
    * the textbook form re-aggregates lineitem inside the IN; here the
    * HAVING aggregate IS the outer sum, so the decorrelated plan
    * aggregates lineitem ONCE (keyed on orderkey — the join's own key),
    * filters, and joins orders + customer. One fact shuffle total; the
    * IN never re-executes.
    *
    * Quantities are integral in this corpus (long cast is exact);
    * totalprice in integer cents; the date crosses the hash as a
    * yyyy-MM-dd string (the dtype-gate convention).
    */
  def largeQuantityOrders(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
      .groupBy("l_orderkey")
      .agg(sum("qty").as("total_qty"))
      .filter(col("total_qty") > 250L)
    bigOrders
      .join(Tables.orders(spark, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name"),
        col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        round(col("o_totalprice") * 100).cast("long").as("total_cents"),
        col("total_qty"))
  }

  /** q117: excess-stock suppliers — the TPC-H Q20 shape: the DOUBLY
    * nested IN (suppliers IN pairs whose part is IN a name-pattern
    * scan) with a CORRELATED AGGREGATE threshold (the pair qualifies
    * only when its all-time quantity exceeds twice its 1997 quantity —
    * Q20's `availqty > 0.5 · sum(recent)` restated on the derived pair
    * catalog). The textbook NULL rule carries over exactly: a pair with
    * NO 1997 shipments has a NULL correlated sum, the comparison is
    * NULL, the pair is excluded — on the Spark side the conditional
    * `sum(when(...))` is NULL for the same pairs and `>` filters them,
    * no coalesce.
    *
    * One pass: both the all-time and the 1997 sums fold in a single
    * keyed aggregate over the name-restricted fact slice (semi join
    * BEFORE the aggregate); both INs compile to semi joins (never
    * DISTINCT-then-join); nation is a broadcast dim.
    */
  def excessStockSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val smallParts = Tables.part(spark, dir)
      .filter(col("p_name").startsWith("small")).select(col("p_partkey"))
    val excessPairs = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("qty"), col("l_shipdate"))
      .join(smallParts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum("qty").as("qty_all"),
        sum(when(col("l_shipdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"), col("qty")))
          .as("qty_97"))
      .filter(col("qty_all") > lit(2L) * col("qty_97"))
      .select(col("l_suppkey"))
    Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .filter(col("n_name").isin("NATION_2", "NATION_6"))
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(excessPairs, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
  }

  /** q130: EXPLICIT Bloom-filter runtime-filtered semi-join — the
    * "sideways information passing" pattern that makes selective joins
    * scale (Spark's own InjectRuntimeFilter does this opportunistically;
    * here it is a first-class, measurable operator with its false-positive
    * accounting in the output). Build side: customers of one market
    * segment; probe side: orders. The filter is m = 2^20 bits (a 130 KB
    * broadcast — sized so the build side stays ≲10% fill through sf1;
    * at larger build sides m grows with n, the standard m ≈ 10n rule),
    * j = 2 hash functions — bit positions are hex digits 1–5 and 6–10 of
    * md5(key), so both engines derive identical bits.
    *
    * Shape: build-side positions fold into a (word, bits) bitmap table of
    * at most min(⌈2²⁰/63⌉ ≈ 16.6k, 2 × build-side distinct keys) rows
    * (~130 KB dense — still broadcast-trivial)
    * bitmap via bit_or — broadcast TWICE against the probe's two
    * (word, bit) lookups; rows passing both bit tests are BLOOM
    * CANDIDATES, then the exact semi join removes false positives. The
    * output row audits the filter: probe rows / bloom passes / true
    * matches / FP ppm. At 100 TB the candidate cut happens before the
    * fact shuffle — the filter is KB-sized state traded against the
    * probe-side rows that never travel.
    */
  def bloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    def posCols(key: Column): (Column, Column) = {
      val h = md5(key.cast("string"))
      (conv(substring(h, 1, 5), 16, 10).cast("long"),
        conv(substring(h, 6, 5), 16, 10).cast("long"))
    }
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val (b1, b2) = posCols(col("c_custkey"))
    // one bitmap over BOTH hash positions: word = pos div 63, bit = pos mod 63 (63 bits per word: bit 63 is the sign bit and ANSI engines refuse 1<<63)
    val bitmap = cust.select(explode(array(b1, b2)).as("pos"))
      .select(expr("pos DIV 63").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").as("m"))
      .groupBy("word").agg(bit_or(col("m")).as("bits"))
    val (p1, p2) = posCols(col("o_custkey"))
    val probe = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), p1.as("pos1"), p2.as("pos2"))
    val candidates = probe
      .join(broadcast(bitmap.withColumnRenamed("word", "w1").withColumnRenamed("bits", "bits1")),
        expr("pos1 DIV 63") === col("w1"), "left")
      .join(broadcast(bitmap.withColumnRenamed("word", "w2").withColumnRenamed("bits", "bits2")),
        expr("pos2 DIV 63") === col("w2"), "left")
      .filter(
        expr("coalesce(bits1, CAST(0 AS BIGINT)) & shiftleft(CAST(1 AS BIGINT), CAST(pos1 % 63 AS INT))") =!= 0L &&
        expr("coalesce(bits2, CAST(0 AS BIGINT)) & shiftleft(CAST(1 AS BIGINT), CAST(pos2 % 63 AS INT))") =!= 0L)
      .select(col("o_orderkey"), col("o_custkey"))
    val trueMatch = candidates.join(broadcast(cust),
      col("o_custkey") === col("c_custkey"), "left_semi")
    val nProbe = Tables.orders(spark, dir).agg(count(lit(1)).as("n_probe"))
    val nPass  = candidates.agg(count(lit(1)).as("n_bloom_pass"))
    val nTrue  = trueMatch.agg(count(lit(1)).as("n_true_match"))
    nProbe.crossJoin(broadcast(nPass)).crossJoin(broadcast(nTrue))
      .select(col("n_probe"), col("n_bloom_pass"), col("n_true_match"),
        expr("CAST((n_bloom_pass - n_true_match) * 1000000 DIV n_bloom_pass AS BIGINT)")
          .as("fp_ppm"))
  }

  /** q145: GINI concentration of customer spend per nation — the
    * inequality coefficient (how concentrated is revenue across a
    * nation's customers), the standard-economics sibling of q103's
    * entropy and q111's Pareto cut. Closed rank form on ASCENDING spend:
    * `G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx)`, computed entirely in exact
    * integers — spend in e2 cents, ranks by row_number (ties broken by
    * custkey, so both engines rank identically), the numerator in
    * DECIMAL(38,0) (rank·spend products overflow int64 at warehouse
    * scale), and one final truncating DIV onto e6 — nonnegative by
    * Chebyshev's sum inequality, so trunc ≡ floor cross-engine.
    * Shuffle shape: one keyed aggregate (customer spend), one per-nation
    * rank window over customer-count-sized rows, one keyed rollup.
    */
  def giniConcentration(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x2"))
    val ranked = spend
      .join(Tables.customer(spark, dir).select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
        Seq("o_custkey"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("c_nationkey").orderBy(col("x2"), col("o_custkey"))).cast("long"))
    ranked
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum("x2").as("total_spend_e2"),
        expr("CAST(sum(CAST(rk AS DECIMAL(38,0)) * x2) AS DECIMAL(38,0))").as("rx"))
      .select(col("nationkey"), col("n_customers"), col("total_spend_e2"),
        expr("""CAST((2 * rx - (n_customers + 1) * CAST(total_spend_e2 AS DECIMAL(38,0)))
               |  * 1000000 DIV (CAST(n_customers AS DECIMAL(38,0)) * total_spend_e2)
               |  AS BIGINT)""".stripMargin).as("gini_e6"))
  }

  /** q146: BITMAP-INDEX intersection — the categorical-predicate
    * counting primitive (Oracle/Druid bitmap indexes, roaring bitmaps):
    * one bitmap per predicate value over the order-key universe, rows
    * folded into 63-bit words (`1 << 63` is the cross-engine sign trap —
    * the q130 rule), and a conjunctive predicate answered ENTIRELY in
    * word space: join the two values' word tables, AND, popcount — the
    * fact table is never re-touched. Emits every (priority, status)
    * cell's bitmap count next to its exact recount: equality IS the
    * self-audit (these bitmaps are exact, not sketches). At 100 TB the
    * word tables are |universe|/63-sized per value, partition by word
    * range, and every boolean combination of predicates stays a keyed
    * word join + popcount.
    */
  def bitmapIntersect(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderpriority"), col("o_orderstatus"),
      expr("o_orderkey DIV 63").as("w"),
      expr("shiftleft(CAST(1 AS BIGINT), CAST(o_orderkey % 63 AS INT))").as("bit"))
    val pBm = o.groupBy(col("o_orderpriority").as("pr"), col("w"))
      .agg(expr("bit_or(bit)").as("pbits"))
    val sBm = o.groupBy(col("o_orderstatus").as("st"), col("w"))
      .agg(expr("bit_or(bit)").as("sbits"))
    val bitmapCounts = pBm.join(sBm, Seq("w"))
      .groupBy("pr", "st")
      .agg(sum(bit_count(col("pbits").bitwiseAND(col("sbits")))).as("n_bitmap"))
    val exact = o.groupBy(col("o_orderpriority").as("pr"), col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("n_exact"))
    bitmapCounts.join(exact, Seq("pr", "st"), "full_outer")
      .select(col("pr").as("priority"), col("st").as("status"),
        coalesce(col("n_bitmap"), lit(0L)).as("n_bitmap"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"))
  }

  /** q149: SKYLINE (Pareto frontier) over parts — minimize price,
    * maximize size: the multi-objective dominance operator (Börzsönyi
    * et al. 2001). A part is dominated iff another is strictly cheaper
    * with size ≥ its own, OR no pricier with size > its own. The 2-D
    * skyline is a SORTED SWEEP (running max of size over the
    * cheaper-prefix), which textbook-form is one global sort —
    * decomposed here with the q96 banded discipline so no table-sized
    * SinglePartition exists: price bands carry in-band RANGE windows
    * (strictly-cheaper prefix and ≤-price prefix), the cross-band carry
    * is a max over strictly-lower bands via the bounded triangular
    * band-table join (≈ price-domain/100 rows at ANY corpus size).
    * Equal (price, size) duplicates are mutually non-dominating and
    * both survive — the strict-in-one-dim definition, exact in integer
    * cents/sizes on both engines.
    */
  def skylineParts(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir).select(
      col("p_partkey"),
      expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("price_c"),
      col("p_size").cast("long").as("size"))
      .withColumn("band", expr("price_c DIV 10000"))
      .localCheckpoint(false) // read twice: band totals + the sweep
    val totals = p.groupBy("band").agg(max("size").as("bmax"))
    val carry = totals.as("a")
      .join(broadcast(totals.as("b")), col("b.band") < col("a.band"), "left")
      .groupBy(col("a.band").as("band"))
      .agg(max(col("b.bmax")).as("carry"))
    val w1 = Window.partitionBy("band").orderBy("price_c")
      .rangeBetween(Window.unboundedPreceding, -1)
    val w2 = Window.partitionBy("band").orderBy("price_c")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    p.join(broadcast(carry), Seq("band"))
      .withColumn("m1", greatest(
        coalesce(max("size").over(w1), lit(-1L)), coalesce(col("carry"), lit(-1L))))
      .withColumn("m2", greatest(
        max("size").over(w2), coalesce(col("carry"), lit(-1L))))
      .filter(!(col("m1") >= col("size") || col("m2") > col("size")))
      .select(col("p_partkey").as("partkey"), col("price_c"), col("size"))
  }

  /** q150: WEIGHTED MEDIAN per group — the robust center q56's discrete
    * median cannot give when rows carry unequal mass (here: lineitem
    * price weighted by quantity, per return flag). Lower weighted
    * median: the smallest value v with 2·cumweight(≤ v) ≥ totalweight —
    * exact integers end to end (e2 cents, integral quantities), so both
    * engines pick the identical value. Values pre-folded to one row per
    * (group, value) (the weight fold map-side combines), then the q96
    * banded prefix: in-band cumulative weights under a per-(group,band)
    * window, cross-band carry from the bounded triangular band-table
    * join — no table-sized global sort anywhere.
    */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables.lineitem(spark, dir).select(
      col("l_returnflag").as("flag"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_c"),
      expr("CAST(round(l_quantity) AS BIGINT)").as("wt"))
      .groupBy("flag", "price_c").agg(sum("wt").as("w"))
      .withColumn("band", expr("price_c DIV 100000"))
      .localCheckpoint(false) // read three times: totals, carry, sweep
    val tot = v.groupBy("flag").agg(sum("w").as("tw"), count(lit(1)).as("n_values"))
    val totals = v.groupBy("flag", "band").agg(sum("w").as("btot"))
    val carry = totals.as("a")
      .join(broadcast(totals.as("b")),
        col("a.flag") === col("b.flag") && col("b.band") < col("a.band"), "left")
      .groupBy(col("a.flag").as("flag"), col("a.band").as("band"))
      .agg(sum(col("b.btot")).as("carry"))
    val wIn = Window.partitionBy("flag", "band").orderBy("price_c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v.join(broadcast(carry), Seq("flag", "band"))
      .withColumn("cum", coalesce(col("carry"), lit(0L)) + sum("w").over(wIn))
      .join(broadcast(tot), Seq("flag"))
      .filter(col("cum") * 2 >= col("tw"))
      .groupBy("flag")
      .agg(min("price_c").as("wmedian_price_c"),
        max("tw").as("total_weight"), max("n_values").as("n_values"))
  }

  /** q144: Z-ORDER (Morton) layout audit — the multi-dimensional
    * clustering that makes min/max zone-map pruning work on MORE THAN
    * ONE column at once (the Delta/Iceberg `OPTIMIZE ZORDER BY` idea as
    * a first-class operator): interleave the bits of two query
    * dimensions (user bucket 0–255, value bucket 0–255 in the exact-e4
    * integer path) into a 16-bit Morton code, group rows into Z-RANGE
    * partitions (code DIV 64 → ≤1024 buckets), and emit each bucket's
    * row count plus its min/max span over BOTH dimensions — the zone
    * map a scan planner would prune against. Because the Z-curve
    * alternates bits, every bucket's span is narrow in BOTH dims
    * (≲1/32 of either domain for a full bucket), where any single-key
    * sort gives perfect pruning on one dim and none on the other — the
    * scaladoc-visible audit IS that bound. One scan, one bounded-key
    * aggregate; at 100 TB the same code is the repartitionByRange key
    * that lays files out for two-dimensional pruning.
    */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    // Both dims clamped into [0, 255] BEFORE the bit interleave: events
    // are user-supplied, and a negative value would otherwise corrupt
    // the Morton bits differently per engine (Spark DIV truncates toward
    // zero, DuckDB // floors — the q141 offset rule's sibling); pmod
    // already lands `a` nonnegative, greatest∘least does it for `b`.
    val ev = Tables.events(spark, dir).select(
      pmod(col("user_id"), lit(256L)).as("a"),
      least(greatest(expr("CAST(round(value * 10000) AS BIGINT) DIV 400"), lit(0L)),
        lit(255L)).as("b"))
    val morton = (0 until 8).map { i =>
      shiftleft(shiftright(col("a"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(col("b"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
    ev.withColumn("z", morton)
      .withColumn("zbucket", expr("z DIV 64"))
      .groupBy("zbucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min("a").as("a_min"), max("a").as("a_max"),
        min("b").as("b_min"), max("b").as("b_max"))
      .select(col("zbucket"), col("n_rows"),
        col("a_min"), col("a_max"), col("b_min"), col("b_max"),
        // the pruning audit: the bucket's covered area in (a, b) space —
        // small for a Z-clustered layout, domain-wide for a 1-D sort
        ((col("a_max") - col("a_min") + 1) * (col("b_max") - col("b_min") + 1)).as("span_area"))
  }
}
