package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.{Det, GQuery, Tables}
import Det._

/** Core relational surface (SURVEY.md §2B: joins, aggregation, grouping
  * sets, set ops, sort/limit, subqueries). The reference itself only ever
  * runs `SELECT * ... LIMIT n` (transaction_producer.py:33-39); everything
  * here is the Spark-built-in analytics layer the engine exposes on top.
  *
  * Every money aggregate goes through exact DECIMAL (see [[graft.util.Det]])
  * so results are partition-order independent and hash-match the DuckDB
  * oracle bit-for-bit.
  */
object RelationalQueries {

  private val revenueSql =
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE)"

  private def revenueCol =
    sum(dec(col("l_extendedprice")) * oneMinus(col("l_discount"))).cast("double")

  val queries: Seq[GQuery] = Seq(

    GQuery("q01_pricing_summary",
      (s, d) => {
        Tables(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            revenueCol.as("sum_disc_price"),
            sum(dec(col("l_extendedprice")) * oneMinus(col("l_discount")) *
              onePlus(col("l_tax"))).cast("double").as("sum_charge"),
            (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
            (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
            (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2)) * CAST(1.0 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    GQuery("q02_filter_topk",
      (s, d) => Tables(s, d, "lineitem")
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
        FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 45
        ORDER BY l_extendedprice DESC NULLS LAST, l_orderkey, l_linenumber
        LIMIT 100""")),

    GQuery("q03_shipping_priority",
      (s, d) => {
        val cust = Tables(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
        val ord = Tables(s, d, "orders")
          .filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp_ntz"))
        val li = Tables(s, d, "lineitem")
          .filter(col("l_shipdate") > lit("1998-07-01").cast("timestamp_ntz"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(revenueCol.as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate, o_orderpriority, $revenueSql AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
          AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-07-01'
          AND l_shipdate > TIMESTAMP '1998-07-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC NULLS LAST, l_orderkey
        LIMIT 10""")),

    GQuery("q04_exists_agg",
      (s, d) => {
        val big = Tables(s, d, "lineitem").filter(col("l_quantity") > 48)
        Tables(s, d, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 48)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    GQuery("q05_region_revenue",
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        val ord = Tables(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
        val cust = Tables(s, d, "customer")
        val supp = Tables(s, d, "supplier")
        val nat = Tables(s, d, "nation")
        val reg = Tables(s, d, "region").filter(col("r_name") === "ASIA")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(revenueCol.as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some(s"""SELECT n_name, $revenueSql AS revenue
        FROM lineitem, orders, customer, supplier, nation, region
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY revenue DESC NULLS LAST, n_name""")),

    GQuery("q06_selective_agg",
      (s, d) => Tables(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount"), 4, 2))
          .cast("double").as("revenue")),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")),

    GQuery("q07_left_join_agg",
      (s, d) => Tables(s, d, "customer")
        .join(Tables(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(sum(dec(col("o_totalprice"))).cast("double"), lit(0.0)).as("total"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
        COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name ORDER BY c_custkey""")),

    GQuery("q08_right_join_agg",
      (s, d) => Tables(s, d, "supplier")
        .join(Tables(s, d, "nation"), col("s_nationkey") === col("n_nationkey"), "right")
        .groupBy(col("n_name"))
        .agg(
          count(col("s_suppkey")).as("n_suppliers"),
          coalesce(sum(dec(col("s_acctbal"))).cast("double"), lit(0.0)).as("total_acctbal"))
        .orderBy(col("n_name")),
      Some("""SELECT n_name, COUNT(s_suppkey) AS n_suppliers,
        COALESCE(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_acctbal
        FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    GQuery("q09_full_outer_join",
      (s, d) => {
        val c = Tables(s, d, "customer").groupBy(col("c_nationkey").as("ck"))
          .agg(count(lit(1)).as("nc"))
        val p = Tables(s, d, "supplier").groupBy(col("s_nationkey").as("sk"))
          .agg(count(lit(1)).as("ns"))
        c.join(p, col("ck") === col("sk"), "full")
          .select(
            coalesce(col("ck"), col("sk")).as("nationkey"),
            coalesce(col("nc"), lit(0L)).as("n_customers"),
            coalesce(col("ns"), lit(0L)).as("n_suppliers"))
          .orderBy(col("nationkey"))
      },
      Some("""WITH c AS (SELECT c_nationkey AS ck, COUNT(*) AS nc FROM customer GROUP BY 1),
        p AS (SELECT s_nationkey AS sk, COUNT(*) AS ns FROM supplier GROUP BY 1)
        SELECT COALESCE(ck, sk) AS nationkey, COALESCE(nc, 0) AS n_customers,
               COALESCE(ns, 0) AS n_suppliers
        FROM c FULL JOIN p ON ck = sk ORDER BY nationkey""")),

    GQuery("q10_anti_join",
      (s, d) => Tables(s, d, "customer")
        .join(Tables(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey""")),

    GQuery("q11_cross_join",
      (s, d) => Tables(s, d, "region").crossJoin(Tables(s, d, "nation"))
        .select("r_name", "n_name")
        .orderBy(col("r_name"), col("n_name")),
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
        ORDER BY r_name, n_name""")),

    GQuery("q12_distinct_agg",
      (s, d) => Tables(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("dist_orders"),
          countDistinct(col("l_partkey")).as("dist_parts"),
          sum_distinct(col("l_quantity")).as("sum_dist_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS dist_orders,
        COUNT(DISTINCT l_partkey) AS dist_parts,
        SUM(DISTINCT l_quantity) AS sum_dist_qty, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    GQuery("q13_cube",
      (s, d) => Tables(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    GQuery("q14_rollup",
      (s, d) => Tables(s, d, "orders")
        .withColumn("yr", year(col("o_orderdate")))
        .rollup(col("yr"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("yr").asc_nulls_first, col("o_orderstatus").asc_nulls_first),
      Some("""SELECT CAST(year(o_orderdate) AS INT) AS yr, o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY ROLLUP (yr, o_orderstatus)
        ORDER BY yr ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""")),

    GQuery("q15_grouping_sets",
      (s, d) => {
        Tables(s, d, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
          CAST(grouping(o_orderpriority) AS INT) AS g1,
          CAST(grouping(o_orderstatus) AS INT) AS g2
          FROM orders
          GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
          ORDER BY g1, g2, o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""")
      },
      Some("""SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
        CAST(grouping(o_orderpriority) AS INT) AS g1,
        CAST(grouping(o_orderstatus) AS INT) AS g2
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY g1, g2, o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""")),

    GQuery("q20_order_limit",
      (s, d) => Tables(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC NULLS LAST, o_orderkey LIMIT 100""")),

    GQuery("q21_union_all_agg",
      (s, d) => {
        val c = Tables(s, d, "customer")
          .select(col("c_nationkey").as("k"), lit("c").as("src"))
        val p = Tables(s, d, "supplier")
          .select(col("s_nationkey").as("k"), lit("s").as("src"))
        c.unionByName(p).groupBy("k", "src").agg(count(lit(1)).as("n"))
          .orderBy(col("k"), col("src"))
      },
      Some("""SELECT k, src, COUNT(*) AS n FROM (
          SELECT c_nationkey AS k, 'c' AS src FROM customer
          UNION ALL
          SELECT s_nationkey AS k, 's' AS src FROM supplier)
        GROUP BY k, src ORDER BY k, src""")),

    GQuery("q22_intersect",
      (s, d) => Tables(s, d, "customer").select(col("c_nationkey").as("k"))
        .intersect(Tables(s, d, "supplier").select(col("s_nationkey").as("k")))
        .orderBy(col("k")),
      Some("""SELECT c_nationkey AS k FROM customer
        INTERSECT SELECT s_nationkey FROM supplier ORDER BY k""")),

    GQuery("q23_except",
      (s, d) => Tables(s, d, "customer").select(col("c_nationkey").as("k"))
        .except(Tables(s, d, "supplier").select(col("s_nationkey").as("k")))
        .orderBy(col("k")),
      Some("""SELECT c_nationkey AS k FROM customer
        EXCEPT SELECT s_nationkey FROM supplier ORDER BY k""")),

    GQuery("q28_case_buckets",
      (s, d) => Tables(s, d, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 150000, "small")
            .when(col("o_totalprice") < 350000, "mid")
            .otherwise("big"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("bucket")),
      Some("""SELECT CASE WHEN o_totalprice < 150000 THEN 'small'
                   WHEN o_totalprice < 350000 THEN 'mid' ELSE 'big' END AS bucket,
        COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders GROUP BY 1 ORDER BY bucket""")),

    GQuery("q29_having",
      (s, d) => Tables(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 12)
        .orderBy(col("n").desc, col("o_custkey")),
      Some("""SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
        HAVING COUNT(*) > 12 ORDER BY n DESC NULLS LAST, o_custkey""")),

    GQuery("q30_scalar_subquery",
      (s, d) => {
        val ord = Tables(s, d, "orders")
        val avgDf = ord.agg(
          (sum(dec(col("o_totalprice"))).cast("double") / count(lit(1))).as("__avg"))
        ord.crossJoin(broadcast(avgDf))
          .filter(col("o_totalprice") > col("__avg"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT COUNT(*) AS n FROM orders
        WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders)""")),

    GQuery("q31_in_subquery",
      (s, d) => {
        val parts = Tables(s, d, "part").filter(col("p_size") > 40)
          .select("p_partkey")
        Tables(s, d, "lineitem")
          .join(broadcast(parts), col("l_partkey") === col("p_partkey"), "left_semi")
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT COUNT(*) AS n FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)""")),

    // Skew-mitigated join (operators/SaltedJoin): spread each probe key
    // over 8 salts, replicate the build side per salt — the result must
    // be EXACTLY the plain join's, which is what the oracle checks.
    GQuery("q44_salted_join",
      (s, d) => {
        val joined = graft.operators.SaltedJoin.saltedJoin(
          Tables(s, d, "lineitem"), Tables(s, d, "supplier"),
          probeKeys = Seq("l_suppkey"), buildKeys = Seq("s_suppkey"),
          salts = 8)
        joined.groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n"),
            graft.util.Det.dsum(col("l_extendedprice")).as("revenue"))
          .orderBy(col("s_nationkey"))
      },
      Some("""SELECT s_nationkey, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey ORDER BY s_nationkey"""))
  ) ++ Seq(bucketedJoin, correlatedSql) ++ round4

  /** TPC-H Q18 shape ("large-volume customers"): the heavy-order set is
    * derived by a partial-agg'd groupBy on the fact table, so the only
    * full shuffle is lineitem by l_orderkey; the filtered survivors are
    * tiny, which AQE sees at runtime and broadcasts into the orders
    * join, and the customer dim is broadcast outright — at 100 TB the
    * plan stays one fact shuffle + two broadcasts.
    */
  private lazy val heavyGroupTopk = GQuery("q53_heavy_group_topk",
    (s, d) => {
      val big = Tables(s, d, "lineitem").groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 250)
      Tables(s, d, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    },
    Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN (SELECT l_orderkey,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY l_orderkey) b ON o_orderkey = b.l_orderkey
      WHERE sum_qty > 250
      ORDER BY o_totalprice DESC NULLS LAST, o_orderkey"""))

  /** TPC-H Q21 shape (minus the missing receipt/commit dates): per
    * lineitem, one EXISTS and one NOT EXISTS both correlated on the
    * same order — Catalyst decorrelates them into a semi- and an
    * anti-join on l_orderkey, no per-row re-execution (the SQL entry
    * path is the point, as with q50).
    */
  private lazy val doubleCorrelated = GQuery("q54_exists_not_exists",
    (s, d) => {
      Tables(s, d, "supplier").createOrReplaceTempView("v_supplier")
      Tables(s, d, "lineitem").createOrReplaceTempView("v_lineitem")
      Tables(s, d, "orders").createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT s_name, COUNT(*) AS waitcount
        FROM v_supplier, v_lineitem l1, v_orders
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM v_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM v_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_name
        ORDER BY waitcount DESC, s_name""")
    },
    Some("""SELECT s_name, COUNT(*) AS waitcount
      FROM supplier, lineitem l1, orders
      WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > l1.l_shipdate)
      GROUP BY s_name
      ORDER BY waitcount DESC NULLS LAST, s_name"""))

  /** Correlated LATERAL subquery with ORDER BY + LIMIT (top-2 suppliers
    * per nation): Catalyst rewrites the per-row limit into a
    * rank-filtered window join rather than re-running the subquery per
    * outer row.
    */
  private lazy val lateralTopN = GQuery("q56_lateral_topn",
    (s, d) => {
      Tables(s, d, "nation").createOrReplaceTempView("v_nation")
      Tables(s, d, "supplier").createOrReplaceTempView("v_supplier")
      s.sql("""
        SELECT n_name, t.s_name, t.s_acctbal
        FROM v_nation, LATERAL (
          SELECT s_name, s_acctbal FROM v_supplier
          WHERE s_nationkey = n_nationkey
          ORDER BY s_acctbal DESC, s_name LIMIT 2) t
        ORDER BY n_name, t.s_acctbal DESC, t.s_name""")
    },
    Some("""SELECT n_name, t.s_name, t.s_acctbal
      FROM nation, LATERAL (
        SELECT s_name, s_acctbal FROM supplier
        WHERE s_nationkey = n_nationkey
        ORDER BY s_acctbal DESC NULLS LAST, s_name LIMIT 2) t
      ORDER BY n_name, t.s_acctbal DESC NULLS LAST, t.s_name"""))

  /** Multiset (bag) set operations — INTERSECT ALL / EXCEPT ALL keep
    * duplicate multiplicities, which the q22/q23 set variants erase;
    * multiplicities per value are compared exactly.
    */
  private lazy val multisetOps = GQuery("q61_multiset_ops",
    (s, d) => {
      val li = Tables(s, d, "lineitem")
      val r = li.filter(col("l_returnflag") === "R").select(col("l_quantity"))
      val a = li.filter(col("l_returnflag") === "A").select(col("l_quantity"))
      r.intersectAll(a).withColumn("setop", lit("intersect_all"))
        .unionByName(r.exceptAll(a).withColumn("setop", lit("except_all")))
        .groupBy(col("setop"), col("l_quantity"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("setop"), col("l_quantity"))
    },
    Some("""WITH r AS (SELECT l_quantity FROM lineitem WHERE l_returnflag = 'R'),
      a AS (SELECT l_quantity FROM lineitem WHERE l_returnflag = 'A'),
      u AS (
        SELECT 'intersect_all' AS setop, l_quantity
        FROM (SELECT * FROM r INTERSECT ALL SELECT * FROM a)
        UNION ALL
        SELECT 'except_all' AS setop, l_quantity
        FROM (SELECT * FROM r EXCEPT ALL SELECT * FROM a))
      SELECT setop, l_quantity, COUNT(*) AS n FROM u
      GROUP BY setop, l_quantity ORDER BY setop, l_quantity"""))

  /** Recursive CTE (Spark 4 WITH RECURSIVE): a bounded reachability
    * walk over a key-derived edge relation (nationkey → nationkey+5,
    * i.e. hop to the same position in the next region) — the iterate-
    * until-fixpoint surface (org charts, BOM explosions, graph
    * closures) that plain joins can't express.
    */
  private lazy val recursiveCte = GQuery("q64_recursive_cte",
    (s, d) => {
      Tables(s, d, "nation").createOrReplaceTempView("v_nation")
      s.sql("""
        WITH RECURSIVE chain(start_key, cur_key, depth) AS (
          SELECT n_nationkey, n_nationkey, 0 FROM v_nation
          UNION ALL
          SELECT c.start_key, n.n_nationkey, c.depth + 1
          FROM chain c JOIN v_nation n ON n.n_nationkey = c.cur_key + 5
          WHERE c.depth < 10)
        SELECT start_key, CAST(max(depth) AS INT) AS chain_len,
               max(cur_key) AS last_key
        FROM chain GROUP BY start_key ORDER BY start_key""")
    },
    Some("""WITH RECURSIVE chain(start_key, cur_key, depth) AS (
        SELECT n_nationkey, n_nationkey, 0 FROM nation
        UNION ALL
        SELECT c.start_key, n.n_nationkey, c.depth + 1
        FROM chain c JOIN nation n ON n.n_nationkey = c.cur_key + 5
        WHERE c.depth < 10)
      SELECT start_key, CAST(max(depth) AS INT) AS chain_len,
             max(cur_key) AS last_key
      FROM chain GROUP BY start_key ORDER BY start_key"""))

  /** TPC-H Q2 shape (no partsupp in the testdata — lineitem stands in as
    * the part↔supplier price relation): pick, per small part, every
    * supplier whose price equals the part's global minimum. Catalyst
    * decorrelates the `= (SELECT min ...)` into a per-part aggregate +
    * equi-join — one lineitem shuffle on l_partkey feeds both the min
    * and the match, no per-row re-execution. No float arithmetic: the
    * min/equality compare source doubles verbatim.
    */
  private lazy val minCostSupplier = GQuery("q65_min_cost_supplier",
    (s, d) => {
      Tables(s, d, "part").createOrReplaceTempView("v_part")
      Tables(s, d, "lineitem").createOrReplaceTempView("v_lineitem")
      Tables(s, d, "supplier").createOrReplaceTempView("v_supplier")
      s.sql("""
        SELECT DISTINCT p_partkey, p_name, s_name, l_extendedprice AS price
        FROM v_part, v_lineitem, v_supplier
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND p_size < 10
          AND l_extendedprice = (SELECT min(l2.l_extendedprice)
                                 FROM v_lineitem l2
                                 WHERE l2.l_partkey = p_partkey)
        ORDER BY p_partkey, s_name""")
    },
    Some("""SELECT DISTINCT p_partkey, p_name, s_name, l_extendedprice AS price
      FROM part, lineitem, supplier
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND p_size < 10
        AND l_extendedprice = (SELECT min(l2.l_extendedprice)
                               FROM lineitem l2
                               WHERE l2.l_partkey = p_partkey)
      ORDER BY p_partkey, s_name"""))

  /** TPC-H Q22 shape (no phone column — the customer's nation-name
    * prefix stands in for the country code): customers above the global
    * average balance with no orders at all. The average is computed in
    * exact DECIMAL sum / count so the boundary comparison cannot flip
    * between engines; the NOT EXISTS decorrelates to a left-anti join
    * on o_custkey.
    */
  private lazy val globalSalesFilter = GQuery("q66_anti_join_avg_filter",
    (s, d) => {
      Tables(s, d, "customer").createOrReplaceTempView("v_customer")
      Tables(s, d, "nation").createOrReplaceTempView("v_nation")
      Tables(s, d, "orders").createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT cntrycode, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM (
          SELECT substring(n_name, 1, 2) AS cntrycode, c_acctbal
          FROM v_customer JOIN v_nation ON c_nationkey = n_nationkey
          WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                      / COUNT(*)
                             FROM v_customer WHERE c_acctbal > 0.0)
            AND NOT EXISTS (SELECT 1 FROM v_orders
                            WHERE o_custkey = c_custkey))
        GROUP BY cntrycode ORDER BY cntrycode""")
    },
    Some("""SELECT cntrycode, COUNT(*) AS numcust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      FROM (
        SELECT substring(n_name, 1, 2) AS cntrycode, c_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                    / COUNT(*)
                           FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey))
      GROUP BY cntrycode ORDER BY cntrycode"""))

  /** Spark-4 collation support: case-insensitive comparison and distinct
    * counting via UTF8_LCASE, without materializing lower() copies. The
    * oracle is the portable lower() twin — results must agree exactly on
    * the ASCII data (collation keys replace the rewrite, not change it).
    */
  private lazy val collationQ = GQuery("q67_collation",
    (s, d) => {
      val mixed = Tables(s, d, "nation").select(col("n_nationkey"),
        when(col("n_nationkey") % 2 === 0, upper(col("n_name")))
          .otherwise(lower(col("n_name"))).as("name"))
      val c = collate(col("name"), "UTF8_LCASE")
      mixed.agg(
        countDistinct(c).as("n_distinct"),
        sum(when(c === lit("germany"), 1).otherwise(0)).as("n_germany"))
    },
    Some("""SELECT count(DISTINCT lower(name)) AS n_distinct,
        CAST(SUM(CASE WHEN lower(name) = 'germany' THEN 1 ELSE 0 END) AS BIGINT)
          AS n_germany
      FROM (SELECT CASE WHEN n_nationkey % 2 = 0 THEN upper(n_name)
                        ELSE lower(n_name) END AS name FROM nation)"""))

  private lazy val round4: Seq[GQuery] =
    Seq(heavyGroupTopk, doubleCorrelated, lateralTopN, multisetOps,
      recursiveCte, minCostSupplier, globalSalesFilter, collationQ)

  /** Correlated scalar subqueries through the SQL entry path: each order
    * compared against ITS customer's aggregate — Catalyst decorrelates
    * the two per-row subqueries into aggregate+join (no per-row
    * re-execution; the same shape a 100 TB plan needs). The predicate is
    * written in exact DECIMAL products (price·cnt > 2·sum) so no
    * float-average boundary row can flip between engines.
    */
  private lazy val correlatedSql = GQuery("q50_correlated_sql",
    (s, d) => {
      Tables(s, d, "orders").createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM v_orders o
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
              (SELECT COUNT(*) FROM v_orders o2
               WHERE o2.o_custkey = o.o_custkey)
          > 2 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 FROM v_orders o2 WHERE o2.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders o
      WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
            (SELECT COUNT(*) FROM orders o2
             WHERE o2.o_custkey = o.o_custkey)
        > 2 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      ORDER BY o_orderkey"""))

  /** Co-located join via bucketed tables: both sides written with
    * `bucketBy(8, key) + sortBy(key)`, so the fact-fact join runs with
    * NO shuffle exchange on either side (asserted on the physical plan
    * in OperatorsSpec; the in-task sort remains when a bucket spans
    * multiple files) — at 100 TB, pre-bucketing the two biggest tables
    * on their join key turns every recurring join into a map-side merge
    * of co-located bucket files. The oracle checks the result equals the
    * plain join.
    */
  private lazy val bucketedJoin = GQuery("q45_bucketed_join",
    (s, d) => {
      buildBucketedTables(s, d)
      val j = s.table("g_orders_b").join(s.table("g_lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      j.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          graft.util.Det.dsum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** (Re)write the two bucketed external tables under java.io.tmpdir.
    * Also used by the no-shuffle plan assertion in OperatorsSpec.
    */
  def buildBucketedTables(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    val base = new java.io.File(
      System.getProperty("java.io.tmpdir"), "graft_bucketed")
    val marker = new java.io.File(base, ".sfdir")
    // pre-bucketing is a one-time layout investment — rebuilding the
    // tables on every query run would charge the bench (and a real
    // pipeline) the write cost instead of the join cost. Rebuild only
    // when the source scale factor changed or this session has not
    // registered the tables yet.
    val fresh = marker.exists() &&
      java.nio.file.Files.readString(marker.toPath) == d &&
      s.catalog.tableExists("g_orders_b") && s.catalog.tableExists("g_lineitem_b")
    if (fresh) return
    def write(name: String, df: org.apache.spark.sql.DataFrame, key: String): Unit = {
      s.sql(s"DROP TABLE IF EXISTS $name")
      df.write.bucketBy(8, key).sortBy(key)
        .option("path", s"${base.getAbsolutePath}/$name")
        .mode("overwrite").format("parquet").saveAsTable(name)
    }
    write("g_orders_b", Tables(s, d, "orders")
      .select("o_orderkey", "o_orderpriority"), "o_orderkey")
    write("g_lineitem_b", Tables(s, d, "lineitem")
      .select("l_orderkey", "l_extendedprice"), "l_orderkey")
    base.mkdirs()
    java.nio.file.Files.writeString(marker.toPath, d)
  }
}
