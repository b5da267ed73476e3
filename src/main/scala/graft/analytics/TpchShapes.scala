package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.{Det, GQuery, Tables}
import Det._

/** The remaining classic TPC-H query shapes (Q7/Q8/Q9/Q11/Q12/Q13/Q14/
  * Q15/Q17/Q19/Q20) over the driver's star schema, adapted where the
  * testdata lacks a column (no partsupp table, no p_container/p_comment
  * — SURVEY.md §2B "joins/aggregations/subqueries"; the reference itself
  * runs no analytics at all, transaction_producer.py:33-39).
  *
  * Shapes, not translations: each query is the *plan* we would want at
  * 100 TB — selective filters pushed into every scan, dimension sides
  * broadcast only when a filter makes them small, fact-fact joins left
  * to shuffle on their keys so AQE can size-adapt, and every money
  * aggregate in exact DECIMAL ([[graft.util.Det]]) so results are
  * partition-order independent and hash-match the DuckDB oracle.
  */
object TpchShapes {

  private val revenueSql =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)"

  private def revenueCol =
    sum(dec(col("l_extendedprice")) * oneMinus(col("l_discount"))).cast("double")

  private def ts(s: String) = lit(s).cast("timestamp_ntz")

  /** TPC-H Q7 (volume shipping): revenue moved between two nations, by
    * supplier nation × customer nation × ship year. The nation filter is
    * pushed into BOTH dimension sides before the fact joins (suppliers
    * and customers shrink to 2/25 of their tables — broadcastable even
    * at scale), so only the OR pair-predicate remains post-join. The
    * lineitem⋈orders fact-fact join shuffles on the order key.
    */
  private lazy val volumeShipping = GQuery("q69_volume_shipping",
    (s, d) => {
      val nats = Seq("NATION_1", "NATION_2")
      val supp = Tables(s, d, "supplier")
        .join(broadcast(Tables(s, d, "nation")
            .filter(col("n_name").isin(nats: _*))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables(s, d, "customer")
        .join(broadcast(Tables(s, d, "nation")
            .filter(col("n_name").isin(nats: _*))
            .select(col("n_nationkey").as("cn_nationkey"),
              col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("cn_nationkey"))
        .select(col("c_custkey"), col("cust_nation"))
      val li = Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
      li.join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(revenueCol.as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some(s"""SELECT supp_nation, cust_nation, l_year, $revenueSql AS revenue
      FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS l_year,
               l_extendedprice, l_discount
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01')
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year"""))

  /** TPC-H Q8 (national market share): NATION_3 suppliers' share of
    * revenue from EUROPE customers, per order year. The share is a
    * CASE-sum over the same exact-DECIMAL revenue — numerator and
    * denominator aggregate in one pass (no second scan), divided once
    * as doubles.
    */
  private lazy val marketShare = GQuery("q70_market_share",
    (s, d) => {
      val cust = Tables(s, d, "customer")
        .join(broadcast(Tables(s, d, "nation")
            .join(broadcast(Tables(s, d, "region")
                .filter(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey").as("cn_nationkey"))),
          col("c_nationkey") === col("cn_nationkey"))
        .select("c_custkey")
      val supp = Tables(s, d, "supplier")
        .join(broadcast(Tables(s, d, "nation")
            .select(col("n_nationkey").as("sn_nationkey"),
              col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      val ord = Tables(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1998-01-01"))
      val rev = dec(col("l_extendedprice")) * oneMinus(col("l_discount"))
      Tables(s, d, "lineitem")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((coalesce(
          sum(when(col("supp_nation") === "NATION_3", rev)).cast("double"),
          lit(0.0)) / sum(rev).cast("double")).as("mkt_share"))
        .orderBy(col("o_year"))
    },
    Some("""SELECT o_year,
        COALESCE(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume END) AS DOUBLE), 0.0)
          / CAST(SUM(volume) AS DOUBLE) AS mkt_share
      FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem, orders, customer, supplier, nation n1, nation n2, region
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND l_suppkey = s_suppkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey AND n2.n_regionkey = r_regionkey
          AND r_name = 'EUROPE'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01')
      GROUP BY o_year ORDER BY o_year"""))

  /** TPC-H Q9 (product-type profit): profit on 'red …' parts by supplier
    * nation × order year. No partsupp in the testdata, so supply cost is
    * `p_retailprice * l_quantity` (same shape: a per-row debit joined
    * from the part dim). Profit stays DECIMAL end to end — the
    * subtraction of two exact products is exact, so partition order
    * cannot perturb the sum.
    */
  private lazy val productProfit = GQuery("q71_product_profit",
    (s, d) => {
      val parts = Tables(s, d, "part").filter(col("p_name").like("red%"))
        .select("p_partkey", "p_retailprice")
      val supp = Tables(s, d, "supplier")
        .join(broadcast(Tables(s, d, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val profit = dec(col("l_extendedprice")) * oneMinus(col("l_discount")) -
        dec(col("p_retailprice")) * dec(col("l_quantity"))
      Tables(s, d, "lineitem")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(profit).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some("""SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      FROM (
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))
                 - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS amount
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE 'red%')
      GROUP BY nation, o_year
      ORDER BY nation, o_year DESC NULLS LAST"""))

  /** TPC-H Q11 (important stock): parts whose revenue exceeds a fixed
    * fraction of total revenue. The threshold is a 1-row broadcast
    * (scalar subquery shape) — the per-part aggregate shuffles once on
    * the part key, the total is a second partial-agg'd pass; both sums
    * exact DECIMAL so the boundary compare cannot flip between engines.
    */
  private lazy val partValueThreshold = GQuery("q72_part_value_threshold",
    (s, d) => {
      val rev = dec(col("l_extendedprice")) * oneMinus(col("l_discount"))
      val li = Tables(s, d, "lineitem")
      val perPart = li.groupBy(col("l_partkey"))
        .agg(sum(rev).as("value_d"))
      val total = li.agg(sum(rev).cast("double").as("total_d"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value_d").cast("double") > col("total_d") * 0.0007)
        .select(col("l_partkey"), col("value_d").cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },
    Some(s"""SELECT l_partkey, $revenueSql AS value
      FROM lineitem GROUP BY l_partkey
      HAVING $revenueSql >
        (SELECT $revenueSql * 0.0007 FROM lineitem)
      ORDER BY value DESC NULLS LAST, l_partkey"""))

  /** TPC-H Q12 (shipping-mode priority classes): no l_shipmode column, so
    * the line status plays the mode; counts of critical
    * (1-URGENT/2-HIGH) vs other orders per class. One fact-fact join on
    * the order key, CASE-count aggregate.
    */
  private lazy val priorityClasses = GQuery("q73_priority_classes",
    (s, d) => {
      val li = Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
      li.join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT" ||
            col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority") =!= "1-URGENT" &&
            col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },
    Some("""SELECT l_linestatus,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** TPC-H Q13 (customer order-count distribution): LEFT OUTER join with
    * a join-side predicate (the '5-LOW' exclusion rides the join, NOT the
    * WHERE — a customer with only low-priority orders still counts at 0),
    * then a histogram of the per-customer counts. Two aggregations: the
    * first shuffles on the customer key, the second on the (tiny) count
    * domain.
    */
  private lazy val custDistribution = GQuery("q74_cust_distribution",
    (s, d) => {
      val ord = Tables(s, d, "orders")
        .filter(col("o_orderpriority") =!= "5-LOW")
        .select("o_custkey", "o_orderkey")
      Tables(s, d, "customer")
        .join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, COUNT(*) AS custdist
      FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST"""))

  /** TPC-H Q14 (promotion effect): PROMO-type share of one month's
    * revenue, as a single percentage row. Numerator and denominator in
    * one aggregate pass; the filtered month keeps the fact side small,
    * the part dim joins on the part key (size-adaptive at scale — AQE
    * broadcasts the month if it fits).
    */
  private lazy val promoRevenue = GQuery("q75_promo_revenue",
    (s, d) => {
      val rev = dec(col("l_extendedprice")) * oneMinus(col("l_discount"))
      Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-03-01") &&
          col("l_shipdate") < ts("1997-04-01"))
        .join(Tables(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .agg((coalesce(
          sum(when(col("p_type") === "PROMO", rev)).cast("double"), lit(0.0))
          * 100.0 / sum(rev).cast("double")).as("promo_revenue"))
    },
    Some("""SELECT COALESCE(CAST(SUM(CASE WHEN p_type = 'PROMO'
          THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) END) AS DOUBLE), 0.0)
        * 100.0
        / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)
        AS promo_revenue
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1997-03-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'"""))

  /** TPC-H Q15 (top supplier): supplier(s) with the maximum quarterly
    * revenue. The max is compared in DECIMAL — exact, so the equality
    * cannot miss by one ulp the way a double max would; cast to double
    * only on output. The 1-row max broadcasts; the revenue aggregate
    * shuffles once on the supplier key.
    */
  private lazy val topSupplier = GQuery("q76_top_supplier",
    (s, d) => {
      val rev = Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1997-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(dec(col("l_extendedprice")) * oneMinus(col("l_discount")))
          .as("rev_d"))
      val maxRev = rev.agg(max(col("rev_d")).as("max_d"))
      rev.crossJoin(broadcast(maxRev))
        .filter(col("rev_d") === col("max_d"))
        .join(Tables(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev_d").cast("double").as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    Some(s"""WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS total_d
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, CAST(total_d AS DOUBLE) AS total_revenue
      FROM supplier, revenue
      WHERE s_suppkey = supplier_no
        AND total_d = (SELECT MAX(total_d) FROM revenue)
      ORDER BY s_suppkey"""))

  /** TPC-H Q17 (small-quantity-order revenue): average yearly revenue
    * lost if small orders (below 50% of the part's average quantity)
    * were not filled. The correlated AVG decorrelates to a per-part
    * aggregate joined back on the part key; the threshold is computed
    * as exact-DECIMAL sum / count on both engines so the `<` boundary
    * is bit-identical.
    */
  private lazy val smallQtyRevenue = GQuery("q77_small_qty_revenue",
    (s, d) => {
      val li = Tables(s, d, "lineitem")
      val avgQty = li.groupBy(col("l_partkey").as("ap_partkey"))
        .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1)))
          .as("avg_qty"))
      val brandParts = Tables(s, d, "part")
        .filter(col("p_brand") === "Brand#4").select("p_partkey")
      li.join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
        .join(avgQty, col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < col("avg_qty") * 0.5)
        .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0)
          .as("avg_yearly"))
    },
    Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND p_brand = 'Brand#4'
        AND l_quantity < (SELECT (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)) * 0.5
                          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""))

  /** TPC-H Q19 (discounted revenue, disjunctive predicates): an
    * OR-of-conjunctions across both join sides. The shared `p_partkey =
    * l_partkey` conjunct stays an equi-join (Catalyst extracts it; the
    * disjunction becomes a post-join filter) — the plan to verify is
    * that this does NOT degrade to a nested-loop join.
    */
  private lazy val disjunctivePredicates = GQuery("q78_disjunctive_join",
    (s, d) => {
      val branch = (brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =>
        col("p_brand") === brand &&
          col("p_size").between(szLo, szHi) &&
          col("l_quantity").between(qLo, qHi)
      Tables(s, d, "lineitem")
        .join(Tables(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .filter(branch("Brand#1", 1, 15, 1, 20) ||
          branch("Brand#2", 10, 30, 10, 30) ||
          branch("Brand#3", 20, 50, 20, 40))
        .agg(revenueCol.as("revenue"))
    },
    Some(s"""SELECT $revenueSql AS revenue
      FROM lineitem, part
      WHERE p_partkey = l_partkey
        AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
          OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
          OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40))"""))

  /** TPC-H Q20 (potential part promotion): suppliers who concentrated
    * more than 20% of their total 'red …' part volume inside one year
    * (the span is 7 years, so uniform shipping sits near 14%) — the
    * nested correlated half-sum threshold, decorrelated into ONE
    * aggregate producing both the windowed and total sums (a CASE-sum
    * replaces the second scan), then a semi join onto the supplier dim.
    */
  private lazy val potentialPromotion = GQuery("q79_potential_promotion",
    (s, d) => {
      val redParts = Tables(s, d, "part")
        .filter(col("p_name").like("red%")).select("p_partkey")
      val inYear = col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1998-01-01")
      val heavy = Tables(s, d, "lineitem")
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(when(inYear, dec(col("l_quantity")))).as("qty_year"),
          sum(dec(col("l_quantity"))).as("qty_total"))
        .filter(col("qty_year").cast("double") >
          col("qty_total").cast("double") * 0.2)
        .select("l_suppkey")
      Tables(s, d, "supplier")
        .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    },
    Some("""SELECT s_suppkey, s_name FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%'
        GROUP BY l_suppkey
        HAVING CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                              AND l_shipdate < TIMESTAMP '1998-01-01'
                             THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
             > CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 0.2)
      ORDER BY s_suppkey"""))

  /** TPC-H Q10 (returned-item reporting): customers who returned goods
    * in a quarter, ranked by lost revenue, top 20. One fact-fact join
    * (quarter-filtered orders × R-flagged lineitem), customer and
    * nation dims broadcast, one agg pair, top-k.
    */
  private lazy val returnedItems = GQuery("q86_returned_items",
    (s, d) => {
      val ord = Tables(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1997-01-01") &&
          col("o_orderdate") < ts("1997-04-01"))
      val li = Tables(s, d, "lineitem").filter(col("l_returnflag") === "R")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(revenueCol.as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some(s"""SELECT c_custkey, c_name, c_acctbal, n_name, $revenueSql AS revenue
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1997-04-01'
        AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC NULLS LAST, c_custkey
      LIMIT 20"""))

  /** TPC-H Q16 (parts/supplier relationship): how many distinct
    * suppliers ship each (brand, type, size-class), excluding suppliers
    * in deficit (the acctbal < 0 exclusion stands in for the LIKE
    * '%Complaints%' filter — same NOT-IN-subquery shape, decorrelated
    * to a left-anti join). The distinct count shuffles once on the
    * (brand, type, size) group key.
    */
  private lazy val supplierPartCounts = GQuery("q87_supplier_part_counts",
    (s, d) => {
      val bad = Tables(s, d, "supplier")
        .filter(col("s_acctbal") < 0).select("s_suppkey")
      val parts = Tables(s, d, "part")
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
          col("p_size") <= 25)
      Tables(s, d, "lineitem")
        .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"),
          (floor(col("p_size") / 5) * 5).cast("int").as("size_class"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("size_class"))
    },
    Some("""SELECT p_brand, p_type,
        CAST(floor(p_size / 5) * 5 AS INT) AS size_class,
        COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3') AND p_size <= 25
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, size_class
      ORDER BY supplier_cnt DESC NULLS LAST, p_brand, p_type, size_class"""))

  val queries: Seq[GQuery] = Seq(volumeShipping, marketShare, productProfit,
    partValueThreshold, priorityClasses, custDistribution, promoRevenue,
    topSupplier, smallQtyRevenue, disjunctivePredicates, potentialPromotion,
    returnedItems, supplierPartCounts)
}
