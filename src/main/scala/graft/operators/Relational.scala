package graft.operators

import graft.QueryDef
import graft.QueryHelpers._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational core over the TPC-H-ish star schema: scan/filter/project,
  * hash + broadcast joins, aggregation, windows, set ops, rollup,
  * subqueries, top-k. All declarative DataFrame plans — Catalyst handles
  * pushdown, pruning, join selection (small dims are broadcast explicitly),
  * partial aggregation and AQE. Shuffle keys are the natural group/join
  * keys, so the plans scale horizontally with the data.
  *
  * The reference (`/root/reference/`) has no relational operators at all
  * (SURVEY.md §2.2); this is the driver-mandated extension surface (§2.3).
  */
object Relational {

  private val SumQty = sumExactSql("l_quantity")

  val entries: Seq[QueryDef] = Seq(

    QueryDef("q01_pricing_summary",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        tbl(s, dir, "lineitem")
          .filter($"l_shipdate" <= lit("2000-06-30").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sumExact($"l_quantity").as("sum_qty"),
            sumExact($"l_extendedprice").as("sum_base_price"),
            sumExact($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
            sumExact(($"l_extendedprice" * (lit(1.0) - $"l_discount")) * (lit(1.0) + $"l_tax"))
              .as("sum_charge"),
            avgExact($"l_quantity").as("avg_qty"),
            avgExact($"l_extendedprice").as("avg_price"),
            avgExact($"l_discount").as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${sumExactSql("l_quantity")} AS sum_qty,
        ${sumExactSql("l_extendedprice")} AS sum_base_price,
        ${sumExactSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
        ${sumExactSql("(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)")} AS sum_charge,
        ${sumExactSql("l_quantity")} / COUNT(l_quantity) AS avg_qty,
        ${sumExactSql("l_extendedprice")} / COUNT(l_extendedprice) AS avg_price,
        ${sumExactSql("l_discount")} / COUNT(l_discount) AS avg_disc,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-06-30 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    QueryDef("q02_filter_topn",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        tbl(s, dir, "orders")
          .filter($"o_orderstatus" === "O" && $"o_totalprice" > 400000.0)
          .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderdate")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(100)
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 400000.0
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")),

    QueryDef("q03_shipping_priority",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        val cust = tbl(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
        val ord = tbl(s, dir, "orders")
          .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
        val li = tbl(s, dir, "lineitem")
          .filter($"l_shipdate" > lit("1998-01-01").cast("timestamp"))
        cust.join(ord, $"c_custkey" === $"o_custkey")
          .join(li, $"o_orderkey" === $"l_orderkey")
          .groupBy($"l_orderkey", $"o_orderdate")
          .agg(sumExact($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
          .orderBy($"revenue".desc, $"l_orderkey")
          .limit(10)
      },
      Some(s"""SELECT l_orderkey, o_orderdate,
        ${sumExactSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND o_orderkey = l_orderkey
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    QueryDef("q04_order_priority_semi",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        val ord = tbl(s, dir, "orders").filter(
          $"o_orderdate".between(lit("1996-01-01").cast("timestamp"),
            lit("1996-12-31").cast("timestamp")))
        val returned = tbl(s, dir, "lineitem").filter($"l_returnflag" === "R")
        ord.join(returned, $"o_orderkey" === $"l_orderkey", "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    QueryDef("q05_nation_volume",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        val ord = tbl(s, dir, "orders").filter(
          $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
        val asia = broadcast(tbl(s, dir, "region").filter($"r_name" === "ASIA"))
        val nat = broadcast(tbl(s, dir, "nation"))
        // supplier scales with sf (unlike nation/region) — no broadcast
        // hint; AQE picks broadcast at small sf and shuffle join at scale.
        val sup = tbl(s, dir, "supplier")
        tbl(s, dir, "customer")
          .join(ord, $"c_custkey" === $"o_custkey")
          .join(tbl(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
          .join(sup, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
          .join(nat, $"s_nationkey" === $"n_nationkey")
          .join(asia, $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(sumExact($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
          .orderBy($"revenue".desc, $"n_name")
      },
      Some(s"""SELECT n_name,
        ${sumExactSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    QueryDef("q06_revenue_forecast",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        tbl(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
            $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24.0)
          .agg(sumExact($"l_extendedprice" * $"l_discount").as("revenue"))
      },
      Some(s"""SELECT ${sumExactSql("l_extendedprice * l_discount")} AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24.0""")),

    QueryDef("q07_top_customers",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        tbl(s, dir, "orders")
          .groupBy($"o_custkey")
          .agg(sumExact($"o_totalprice").as("total_spent"), count(lit(1)).as("n_orders"))
          .join(tbl(s, dir, "customer"), $"o_custkey" === $"c_custkey")
          .select($"c_custkey", $"c_name", $"total_spent", $"n_orders")
          .orderBy($"total_spent".desc, $"c_custkey")
          .limit(20)
      },
      Some(s"""SELECT c_custkey, c_name, total_spent, n_orders
        FROM (SELECT o_custkey,
                ${sumExactSql("o_totalprice")} AS total_spent,
                COUNT(*) AS n_orders
              FROM orders GROUP BY o_custkey) o
        JOIN customer ON o_custkey = c_custkey
        ORDER BY total_spent DESC, c_custkey LIMIT 20""")),

    QueryDef("q08_part_type_revenue",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // part scales with sf — no broadcast hint (AQE decides).
        tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "part"), $"l_partkey" === $"p_partkey")
          .groupBy($"p_type")
          .agg(
            sumExact($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"p_type")
      },
      Some(s"""SELECT p_type,
        ${sumExactSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
        COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_type ORDER BY p_type""")),

    QueryDef("q09_customer_order_ranks",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey")
        tbl(s, dir, "orders")
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter($"rnk" <= 3 && $"o_custkey" < 200)
          .select($"o_custkey", $"rnk", $"o_orderkey", $"o_totalprice")
          .orderBy($"o_custkey", $"rnk")
      },
      Some("""SELECT o_custkey, rnk, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders) t
        WHERE rnk <= 3 AND o_custkey < 200
        ORDER BY o_custkey, rnk""")),

    QueryDef("q10_running_quantity",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tbl(s, dir, "lineitem")
          .filter($"l_suppkey" <= 5)
          .withColumn("running_qty", sum($"l_quantity").over(w))
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"running_qty")
          .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
          SUM(l_quantity) OVER (PARTITION BY l_suppkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        FROM lineitem WHERE l_suppkey <= 5
        ORDER BY l_suppkey, l_orderkey, l_linenumber""")),

    QueryDef("q11_distinct_combos",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        tbl(s, dir, "customer")
          .join(tbl(s, dir, "orders"), $"c_custkey" === $"o_custkey")
          .select($"c_mktsegment", $"o_orderpriority")
          .distinct()
          .orderBy($"c_mktsegment", $"o_orderpriority")
      },
      Some("""SELECT DISTINCT c_mktsegment, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
        ORDER BY c_mktsegment, o_orderpriority""")),

    QueryDef("q12_nations_except",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // nation keys that are not also region keys — non-empty at every sf
        tbl(s, dir, "nation").select($"n_nationkey".as("key"))
          .except(tbl(s, dir, "nation").select($"n_regionkey".as("key")))
          .orderBy($"key")
      },
      Some("""SELECT n_nationkey AS key FROM nation
        EXCEPT SELECT n_regionkey FROM nation
        ORDER BY key""")),

    QueryDef("q12b_shared_nations_intersect",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        tbl(s, dir, "customer").select($"c_nationkey".as("nationkey"))
          .intersect(tbl(s, dir, "supplier").select($"s_nationkey".as("nationkey")))
          .orderBy($"nationkey")
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
        INTERSECT SELECT s_nationkey FROM supplier
        ORDER BY nationkey""")),

    QueryDef("q13_rollup_summary",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        tbl(s, dir, "lineitem")
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"), sumExact($"l_quantity").as("sum_qty"))
          .select(
            coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
            coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
            $"n", $"sum_qty")
          .orderBy($"returnflag", $"linestatus")
      },
      Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        COALESCE(l_linestatus, 'ALL') AS linestatus,
        COUNT(*) AS n, $SumQty AS sum_qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY returnflag, linestatus""")),

    QueryDef("q14_conditional_agg",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        tbl(s, dir, "orders")
          .join(tbl(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_orderpriority")
          .agg(
            sum(when($"l_quantity" > 25.0, 1L).otherwise(0L)).as("high_qty"),
            sum(when($"l_quantity" <= 25.0, 1L).otherwise(0L)).as("low_qty"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
        CAST(SUM(CASE WHEN l_quantity > 25.0 THEN 1 ELSE 0 END) AS BIGINT) AS high_qty,
        CAST(SUM(CASE WHEN l_quantity <= 25.0 THEN 1 ELSE 0 END) AS BIGINT) AS low_qty
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    QueryDef("q15_above_avg_orders",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        val ord = tbl(s, dir, "orders")
        val avgRow = ord.agg(avgExact($"o_totalprice").as("avg_price"))
        ord.crossJoin(broadcast(avgRow))
          .filter($"o_totalprice" > $"avg_price")
          .agg(count(lit(1)).as("n_above"))
      },
      Some(s"""SELECT COUNT(*) AS n_above FROM orders
        WHERE o_totalprice > (
          SELECT ${sumExactSql("o_totalprice")} / COUNT(o_totalprice)
          FROM orders)""")),

    QueryDef("q16_big_customers_having",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        tbl(s, dir, "orders")
          .groupBy($"o_custkey")
          .agg(count(lit(1)).as("n_orders"))
          .filter($"n_orders" >= 15)
          .orderBy($"n_orders".desc, $"o_custkey")
      },
      Some("""SELECT o_custkey, COUNT(*) AS n_orders FROM orders
        GROUP BY o_custkey HAVING COUNT(*) >= 15
        ORDER BY n_orders DESC, o_custkey""")),

    QueryDef("q17_star_wide",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        tbl(s, dir, "lineitem")
          .join(tbl(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
          .join(tbl(s, dir, "customer"), $"o_custkey" === $"c_custkey")
          .join(broadcast(tbl(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
          .join(broadcast(tbl(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name", $"o_orderpriority")
          .agg(
            sumExact($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"r_name", $"o_orderpriority")
      },
      Some(s"""SELECT r_name, o_orderpriority,
        ${sumExactSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
        COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, o_orderpriority ORDER BY r_name, o_orderpriority""")),

    QueryDef("q19_revenue_deciles",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // ntile deciles WITHIN each priority. Five priorities funnel
        // n/5 rows each through ONE window task — the few-key
        // partitioned-window single-reducer shape (measured 8.3 s of
        // the sf6.4 serve band). r19: p01's two-phase bucketed rank —
        // RANGE-bucket each priority on o_totalprice (monotone, so
        // bucket-major order IS the window order; equal prices land in
        // one bucket so the (price, orderkey) tiebreak stays local),
        // rank = per-bucket local row_number + the bucket's exclusive
        // prefix count (a window over ≤ priorities × B count rows),
        // and ntile's exact integer rule replayed on the rank:
        // bs = n DIV 10, rem = n MOD 10, thresh = (bs+1)·rem;
        // r ≤ thresh → (r−1) DIV (bs+1) + 1 else
        // rem + (r−1−thresh) DIV bs + 1 (bs = 0 ⇒ thresh = n ⇒ the
        // else branch is unreachable, so no zero division). Identical
        // output: RelationalSpec replays ntile-vs-two-phase row for
        // row, and the oracle still spells ntile.
        val B = 32
        val o = tbl(s, dir, "orders")
          .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
        val spans = o.groupBy($"o_orderpriority").agg(
          min($"o_totalprice").as("_lo"), max($"o_totalprice").as("_hi"),
          count(lit(1)).as("_n"))
          .withColumn("_w", (($"_hi" - $"_lo") / lit(B.toDouble)))
        val withB = o.join(broadcast(spans), Seq("o_orderpriority"))
          .withColumn("_bkt", least(lit(B - 1),
            when($"_w" > 0.0, floor(($"o_totalprice" - $"_lo") / $"_w").cast("int"))
              .otherwise(lit(0))))
        val wLocal = Window.partitionBy($"o_orderpriority", $"_bkt")
          .orderBy($"o_totalprice", $"o_orderkey")
        val wOff = Window.partitionBy($"o_orderpriority").orderBy($"_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = withB.groupBy($"o_orderpriority", $"_bkt")
          .agg(count(lit(1)).as("_bn"))
          .withColumn("_off", coalesce(sum($"_bn").over(wOff), lit(0L)))
          .select($"o_orderpriority", $"_bkt", $"_off")
        withB
          .withColumn("_lrn", row_number().over(wLocal).cast("long"))
          .join(broadcast(offs), Seq("o_orderpriority", "_bkt"))
          .withColumn("_r", $"_off" + $"_lrn")
          .withColumn("decile", expr(
            """CASE WHEN _r <= ((_n DIV 10) + 1) * (_n % 10)
                 THEN (_r - 1) DIV ((_n DIV 10) + 1) + 1
                 ELSE (_n % 10) + (_r - 1 - ((_n DIV 10) + 1) * (_n % 10)) DIV (_n DIV 10) + 1
               END""").cast("long"))
          .groupBy($"o_orderpriority", $"decile")
          .agg(
            count(lit(1)).as("n"),
            sumExact($"o_totalprice").as("sum_price"),
            max($"o_totalprice").as("max_price"))
          .orderBy($"o_orderpriority", $"decile")
      },
      Some(s"""SELECT o_orderpriority, decile, COUNT(*) AS n,
        ${sumExactSql("o_totalprice")} AS sum_price,
        MAX(o_totalprice) AS max_price
        FROM (SELECT o_orderpriority, o_totalprice,
                ntile(10) OVER (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice, o_orderkey) AS decile
              FROM orders)
        GROUP BY 1, 2 ORDER BY o_orderpriority, decile""")),

    QueryDef("q21_cube_grouping",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        tbl(s, dir, "lineitem")
          .cube($"l_returnflag", $"l_linestatus")
          .agg(
            grouping_id().cast("long").as("gid"),
            count(lit(1)).as("n"),
            sumExact($"l_quantity").as("sum_qty"))
          .select(
            coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
            coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
            $"gid", $"n", $"sum_qty")
          .orderBy($"gid", $"returnflag", $"linestatus")
      },
      Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
        COALESCE(l_linestatus, 'ALL') AS linestatus,
        CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        COUNT(*) AS n, $SumQty AS sum_qty
        FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY gid, returnflag, linestatus""")),

    QueryDef("q22_customers_no_orders_anti",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // customers with NO orders in 2001 — anti-join against a
        // date-filtered side (filter pushes below the join build)
        val recent = tbl(s, dir, "orders")
          .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp"))
        tbl(s, dir, "customer")
          .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"c_mktsegment")
          .agg(count(lit(1)).as("n_inactive"),
            sumExact($"c_acctbal").as("sum_acctbal"))
          .orderBy($"c_mktsegment")
      },
      Some(s"""SELECT c_mktsegment, COUNT(*) AS n_inactive,
        ${sumExactSql("c_acctbal")} AS sum_acctbal
        FROM customer WHERE NOT EXISTS (
          SELECT 1 FROM orders WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    QueryDef("q23_price_band_range_frame",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // RANGE frame over a numeric ordering: for each order, how many
        // same-priority orders fall within ±1000 of its total price
        val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice")
          .rangeBetween(-1000L, 1000L)
        tbl(s, dir, "orders")
          .filter($"o_custkey" < 100)
          .withColumn("n_in_band", count(lit(1)).over(w))
          .select($"o_orderkey", $"o_orderpriority", $"o_totalprice", $"n_in_band")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice,
        COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
          RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_in_band
        FROM orders WHERE o_custkey < 100
        ORDER BY o_orderkey""")),

    QueryDef("q24_name_edit_distance",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // string-similarity battery: Levenshtein distance between nation
        // names (exact integer DP in both engines) + shared-prefix length
        val n = tbl(s, dir, "nation").select($"n_name")
        n.as("a").join(n.as("b"), col("a.n_name") < col("b.n_name"))
          .select(col("a.n_name").as("name_a"), col("b.n_name").as("name_b"),
            levenshtein(col("a.n_name"), col("b.n_name")).cast("long").as("edit_dist"))
          .filter($"edit_dist" <= 4)
          .orderBy($"name_a", $"name_b")
      },
      Some("""SELECT a.n_name AS name_a, b.n_name AS name_b,
        CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS edit_dist
        FROM nation a JOIN nation b ON a.n_name < b.n_name
        WHERE levenshtein(a.n_name, b.n_name) <= 4
        ORDER BY name_a, name_b""")),

    QueryDef("q20_pivot_priority",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // explicit pivot values: fixes column order AND skips the extra
        // distinct-values job Spark otherwise runs
        val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val renames = Seq("p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low")
        val pivoted = tbl(s, dir, "customer")
          .join(tbl(s, dir, "orders"), $"c_custkey" === $"o_custkey")
          .groupBy($"c_mktsegment")
          .pivot("o_orderpriority", priorities)
          .agg(count(lit(1)))
        priorities.zip(renames).foldLeft(pivoted) { case (df, (from, to)) =>
          df.withColumnRenamed(from, to)
        }.na.fill(0L, renames).orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
        CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p1_urgent,
        CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p2_high,
        CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p3_medium,
        CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p4_not_specified,
        CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p5_low
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    QueryDef("q25_zorder_layout",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // Z-order (Morton) clustering — the multi-dimensional DATA
        // LAYOUT primitive behind file skipping at 100 TB: writing
        // `repartitionByRange('zval).sortWithinPartitions('zval)` makes
        // every parquet file cover a narrow RECTANGLE in (partkey,
        // suppkey) space, so min/max footer stats prune scans on EITHER
        // predicate column — a plain sort clusters one dimension and
        // shreds the other. This query computes the interleave and
        // proves the locality claim relationally: each of the 32
        // occupied top-6-bit buckets spans ≤ 1/8 of the partkey range ×
        // ≤ 1/3 of the suppkey range (asserted in RelationalSpec).
        // The bit interleave is integer div/mod arithmetic GENERATED
        // from one Scala loop for both engines (only the integer-div
        // token differs), so the forms cannot drift; values < 2^16 —
        // exact everywhere.
        tbl(s, dir, "lineitem")
          .withColumn("zval", expr(zvalExpr("l_partkey div 8", "l_suppkey", "div")))
          .groupBy(expr("zval div 1024").cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"),
            min($"l_partkey").as("pk_min"), max($"l_partkey").as("pk_max"),
            min($"l_suppkey").as("sk_min"), max($"l_suppkey").as("sk_max"))
          .orderBy($"bucket")
      },
      Some(s"""WITH z AS (SELECT l_partkey, l_suppkey,
               ${zvalExpr("(l_partkey // 8)", "l_suppkey", "//")} AS zval
               FROM lineitem)
        SELECT CAST(zval // 1024 AS BIGINT) AS bucket, COUNT(*) AS n,
               MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
               MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
        FROM z GROUP BY 1 ORDER BY bucket""")),

    QueryDef("q26_latest_order_lateral",
      (s: SparkSession, dir: String) => {
        // literal SQL-surface parity: both engines execute the SAME
        // lateral text (see [[LateralSql]]); customers without orders
        // drop out under inner-lateral semantics in both
        graft.Catalog.registerViews(s, dir)
        s.sql(LateralSql)
      },
      Some(LateralSql)),

    QueryDef("q27_price_distribution_ranks",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // distribution window functions (percent_rank, cume_dist) —
        // the remaining SQL window family the catalog didn't yet gate.
        // Both are RANK-based ((rank-1)/(n-1), peers-inclusive count/n):
        // tie groups share a value, so the output is deterministic
        // however the engine orders tied rows, and the single integer/
        // integer IEEE division matches bit-for-bit cross-engine. One
        // exchange on o_orderpriority feeds both functions (shared
        // window frame) — same partitioned-sort scale shape as q19's
        // ntile; nothing global.
        // Two-phase bucketed form (r19, q19's rationale — five
        // priorities previously funneled n/5 rows each through one
        // window task, 8.4 s of the sf6.4 serve band): range-bucket on
        // o_totalprice (equal prices share a bucket, so tie groups stay
        // local), global rank = bucket exclusive-prefix count + local
        // rank() (tie-min, exactly the window's), peers-inclusive count
        // = prefix + local RANGE-frame count, then percent_rank's and
        // cume_dist's own arithmetic replayed on the exact integers:
        // (rank−1)/(n−1) with the n = 1 → 0.0 guard, cnt/n — the same
        // single IEEE divisions. RelationalSpec replays the direct
        // window row for row; the oracle still spells
        // percent_rank/cume_dist.
        val B = 32
        val o = tbl(s, dir, "orders")
          .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
        val spans = o.groupBy($"o_orderpriority").agg(
          min($"o_totalprice").as("_lo"), max($"o_totalprice").as("_hi"),
          count(lit(1)).as("_n"))
          .withColumn("_w", (($"_hi" - $"_lo") / lit(B.toDouble)))
        val withB = o.join(broadcast(spans), Seq("o_orderpriority"))
          .withColumn("_bkt", least(lit(B - 1),
            when($"_w" > 0.0, floor(($"o_totalprice" - $"_lo") / $"_w").cast("int"))
              .otherwise(lit(0))))
        val wRnk = Window.partitionBy($"o_orderpriority", $"_bkt")
          .orderBy($"o_totalprice")
        val wOff = Window.partitionBy($"o_orderpriority").orderBy($"_bkt")
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = withB.groupBy($"o_orderpriority", $"_bkt")
          .agg(count(lit(1)).as("_bn"))
          .withColumn("_off", coalesce(sum($"_bn").over(wOff), lit(0L)))
          .select($"o_orderpriority", $"_bkt", $"_off")
        withB
          .withColumn("_lrk", rank().over(wRnk).cast("long"))
          .withColumn("_lcnt", count(lit(1)).over(wRnk).cast("long"))
          .join(broadcast(offs), Seq("o_orderpriority", "_bkt"))
          .withColumn("pct_rank",
            when($"_n" > 1L, ($"_off" + $"_lrk" - 1L).cast("double") /
              ($"_n" - 1L).cast("double")).otherwise(lit(0.0)))
          .withColumn("cume",
            ($"_off" + $"_lcnt").cast("double") / $"_n".cast("double"))
          .select($"o_orderkey", $"o_orderpriority", $"o_totalprice",
            $"pct_rank", $"cume")
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice,
          percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS pct_rank,
          cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS cume
        FROM orders ORDER BY o_orderkey""")),

    QueryDef("q28_salted_supplier_revenue",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // the skew-mitigation path under the hash gate: the EXECUTION is
        // [[graft.plans.Salting.saltedJoin]] (every lineitem row salted by
        // l_orderkey into 8 buckets, supplier replicated once per bucket,
        // join key = (suppkey, salt)) while the ORACLE is the plain join —
        // identical results is the operator's contract, now checked per
        // round instead of only in ScaleSpec. At 100 TB a handful of hot
        // suppliers would pin single reducers; salting spreads each hot
        // key across 8, at the fixed cost of an 8x replication of the
        // (small) build side. Aggregation happens AFTER the salted join
        // on the natural key, partial map-side as usual.
        val big = tbl(s, dir, "lineitem")
          .select($"l_suppkey", $"l_orderkey", $"l_extendedprice", $"l_discount")
        val small = tbl(s, dir, "supplier")
          .select($"s_suppkey".as("l_suppkey"), $"s_nationkey")
        graft.plans.Salting.saltedJoin(big, small, "l_suppkey", "l_orderkey", 8)
          .groupBy($"s_nationkey")
          .agg(sumExact($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"s_nationkey")
      },
      Some(s"""SELECT s_nationkey,
        ${sumExactSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
        COUNT(*) AS n_items
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey ORDER BY s_nationkey""")),

    QueryDef("q29_grouping_sets",
      (s: SparkSession, dir: String) => {
        // literal SQL-surface parity, as q26: both engines execute the
        // SAME grouping-sets text (see [[GroupingSetsSql]] for why this
        // grouping surface is distinct from q13/q21 and the NULLS FIRST
        // pin)
        graft.Catalog.registerViews(s, dir)
        s.sql(GroupingSetsSql)
      },
      Some(GroupingSetsSql)),

    QueryDef("q30_merge_upsert",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // MERGE INTO (upsert) on the orders table via
        // [[MergeUpsert]]: a deterministic update batch bumps the price
        // of every 97th order (status → 'U') and inserts brand-new
        // orders under shifted keys (status → 'N'); matched base rows
        // are replaced, unmatched pass through. The oracle replays the
        // identical anti-join + union in DuckDB, so the gate checks the
        // MERGE SEMANTICS (exactly-once replacement, no lost rows), not
        // just the summary arithmetic. Price bump is one IEEE multiply
        // quantized to the cent grid — bit-identical cross-engine.
        // Output is the per-status fingerprint of the merged table:
        // updated/inserted rows surface under their own statuses, and a
        // single lost or doubled row shifts n/total for its status.
        val base = tbl(s, dir, "orders")
          .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        val touched = base.filter($"o_orderkey" % 97 === 0)
          .select($"o_orderkey",
            floor($"o_totalprice" * lit(1.05) * 100 + lit(0.5)).cast("double")
              .divide(lit(100)).as("o_totalprice"))
        val updates = touched.select($"o_orderkey", lit("U").as("o_orderstatus"), $"o_totalprice")
          .unionByName(touched.select(($"o_orderkey" + 100000000L).as("o_orderkey"),
            lit("N").as("o_orderstatus"), $"o_totalprice"))
        MergeUpsert(base, updates, Seq("o_orderkey"))
          .groupBy($"o_orderstatus")
          .agg(count(lit(1)).as("n"), sumExact($"o_totalprice").as("total"))
          .orderBy($"o_orderstatus")
      },
      Some(s"""WITH touched AS MATERIALIZED (
          SELECT o_orderkey,
                 FLOOR(o_totalprice * CAST(1.05 AS DOUBLE) * 100 + 0.5) / 100 AS o_totalprice
          FROM orders WHERE o_orderkey % 97 = 0),
        upd AS MATERIALIZED (
          SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice FROM touched
          UNION ALL
          SELECT o_orderkey + 100000000, 'N', o_totalprice FROM touched),
        merged AS (
          SELECT b.o_orderkey, b.o_orderstatus, b.o_totalprice
          FROM orders b LEFT JOIN upd u ON b.o_orderkey = u.o_orderkey
          WHERE u.o_orderkey IS NULL
          UNION ALL
          SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd)
        SELECT o_orderstatus, COUNT(*) AS n,
               ${sumExactSql("o_totalprice")} AS total
        FROM merged GROUP BY 1 ORDER BY 1""")),

    QueryDef("q31_scd2",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // SCD Type 2 history build via [[Scd2]]: a deterministic update
        // batch against the customer dimension — every 13th customer
        // relocates segment (a CHANGE → close + new version), every 17th
        // re-sends its current segment (a NO-OP → must create no
        // version), and shifted keys arrive as brand-new customers (an
        // INSERT → open row). The oracle replays close/version/insert
        // with two joins in DuckDB, so the gate checks the versioning
        // semantics row-for-row: one row per (key, valid_from), closed
        // rows carry the update's effective date, no-ops are invisible.
        val dim = tbl(s, dir, "customer")
          .select($"c_custkey", $"c_mktsegment",
            lit("2024-01-01").as("valid_from"),
            lit(null).cast("string").as("valid_to"))
        val upd = tbl(s, dir, "customer")
          .filter($"c_custkey" % 13 === 0 || $"c_custkey" % 17 === 0)
          .select($"c_custkey",
            when($"c_custkey" % 13 === 0, lit("RELOCATED"))
              .otherwise($"c_mktsegment").as("c_mktsegment"),
            lit("2024-02-01").as("eff"))
          .unionByName(tbl(s, dir, "customer")
            .filter($"c_custkey" % 13 === 0)
            .select(($"c_custkey" + 10000000L).as("c_custkey"),
              lit("NEWCOMER").as("c_mktsegment"), lit("2024-02-01").as("eff")))
        Scd2(dim, upd, Seq("c_custkey"), Seq("c_mktsegment"), "eff")
          .orderBy($"c_custkey", $"valid_from")
      },
      Some("""WITH dim AS MATERIALIZED (
          SELECT c_custkey, c_mktsegment,
                 '2024-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
          FROM customer),
        upd AS MATERIALIZED (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 13 = 0 THEN 'RELOCATED' ELSE c_mktsegment END AS seg,
                 '2024-02-01' AS eff
          FROM customer WHERE c_custkey % 13 = 0 OR c_custkey % 17 = 0
          UNION ALL
          SELECT c_custkey + 10000000, 'NEWCOMER', '2024-02-01'
          FROM customer WHERE c_custkey % 13 = 0)
        SELECT * FROM (
          SELECT d.c_custkey, d.c_mktsegment, d.valid_from,
                 CASE WHEN u.seg IS NOT NULL AND u.seg IS DISTINCT FROM d.c_mktsegment
                      THEN u.eff END AS valid_to
          FROM dim d LEFT JOIN upd u USING (c_custkey)
          UNION ALL
          SELECT u.c_custkey, u.seg, u.eff, NULL
          FROM upd u LEFT JOIN dim d USING (c_custkey)
          WHERE d.c_custkey IS NULL OR u.seg IS DISTINCT FROM d.c_mktsegment)
        ORDER BY c_custkey, valid_from""")),

    QueryDef("q32_unpivot",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // wide-to-long melt via Spark's native unpivot (SQL UNPIVOT /
        // pandas melt): four measure columns become (measure, value)
        // pairs, then a per-measure fingerprint aggregate. The oracle
        // spells the same relation as a UNION ALL over the RAW 18M-row
        // melt (the canonical unpivot desugaring), so the cross-engine
        // gate covers the measure labels and the aggregate totals; the
        // Spark side exercises native unpivot on per-order partials
        // (4 non-null BIGINT sums per order), so raw-stream null
        // handling is the oracle's desugaring, not Spark's generator.
        // unpivot is a NARROW map-side generator (each input row emits
        // its 4 pairs in place). The distinct-order count is
        // computed as a two-level aggregate — per-orderkey partials,
        // then measure — instead of countDistinct: the single-distinct
        // plan Expands the quadrupled stream AGAIN (8 projections/row,
        // 144M rows into the partial agg at 30×). Aggregating per
        // l_orderkey FIRST (one narrow scan, map-side partials) and
        // unpivoting the 4 per-order sums afterward runs the Expand
        // over orders (4.5M rows at 30×), not lineitems (18M), and
        // shuffles one row per order instead of four
        // (PROBES_r12.md: warm sf3 8.3 → measured). The fixed-point
        // fold is association-safe (each row's value is floored to a
        // BIGINT BEFORE any sum; partial sums then add exactly; one
        // terminal divide), so the oracle hash is unchanged; l_orderkey
        // is non-null, so group-count == COUNT(DISTINCT).
        def ps(c: org.apache.spark.sql.Column) = sum(floor(c * lit(1e6) + lit(0.5)))
        tbl(s, dir, "lineitem")
          .groupBy($"l_orderkey")
          .agg(count(lit(1)).as("pn"), ps($"l_discount").as("l_discount"),
            ps($"l_extendedprice").as("l_extendedprice"),
            ps($"l_quantity").as("l_quantity"), ps($"l_tax").as("l_tax"))
          .unpivot(
            ids = Array($"l_orderkey", $"pn"),
            values = Array($"l_discount", $"l_extendedprice", $"l_quantity", $"l_tax"),
            variableColumnName = "measure",
            valueColumnName = "value")
          .groupBy($"measure")
          .agg(sum($"pn").as("n"), (sum($"value").cast("double") / lit(1e6)).as("total"),
            count(lit(1)).as("n_orders"))
          .orderBy($"measure")
      },
      Some(s"""WITH m AS (
          SELECT l_orderkey, 'l_discount' AS measure, l_discount AS value FROM lineitem
          UNION ALL SELECT l_orderkey, 'l_extendedprice', l_extendedprice FROM lineitem
          UNION ALL SELECT l_orderkey, 'l_quantity', l_quantity FROM lineitem
          UNION ALL SELECT l_orderkey, 'l_tax', l_tax FROM lineitem)
        SELECT measure, COUNT(*) AS n, ${sumExactSql("value")} AS total,
               CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        FROM m GROUP BY 1 ORDER BY 1""")),

    QueryDef("q33_copurchase_pairs",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        // Market-basket co-occurrence: support (order count) of every
        // unordered part pair bought in the same order, top 20 by
        // (support desc, part_a, part_b) — the frequent-itemset k=2
        // workload the catalog lacked. Scale shape: pairs are generated
        // MAP-SIDE from each order's sorted distinct part set (one
        // groupBy(orderkey) exchange; TPC-H baskets are ≤7 lines, so the
        // per-order pair fan-out is a small constant, never a data-sized
        // self-join), then the (part_a, part_b) count aggregates with
        // map-side partials; hot pairs are just hot aggregate keys —
        // Salting.saltedCounts is the documented skew path. The
        // (support, part_a, part_b) ordering is total (the pair IS the
        // group key), so the top-20 cut is deterministic cross-engine.
        // Oracle spells the same relation as the canonical orderkey
        // self-join with part_a < part_b — checking the pair GENERATOR
        // (sorted-set combinations), not just the counts.
        // no pre-distinct: collect_set dedups per order (including in
        // its map-side partial). Catalyst was already collapsing the
        // former distinct() into the aggregate (r19 plan diff:
        // byte-identical physical plans), so this only simplifies the
        // source; identical pair sets either way
        tbl(s, dir, "lineitem").select($"l_orderkey", $"l_partkey")
          .groupBy($"l_orderkey")
          .agg(sort_array(collect_set($"l_partkey")).as("ps"))
          .select(explode(expr(
            """flatten(transform(ps, (x, i) ->
              transform(slice(ps, i + 2, size(ps) - i - 1),
                y -> struct(x AS part_a, y AS part_b))))""")).as("p"))
          .groupBy($"p.part_a".as("part_a"), $"p.part_b".as("part_b"))
          .agg(count(lit(1)).as("support"))
          .orderBy($"support".desc, $"part_a", $"part_b")
          .limit(20)
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS support
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        ORDER BY support DESC, part_a, part_b
        LIMIT 20"""))
  )

  /** Shared with the write-side layout job ([[graft.plans.ZOrder]]): one
    * generator renders both engines' forms, so query and writer cannot
    * drift from each other or from the oracle. */
  private def zvalExpr(x: String, y: String, idiv: String): String =
    graft.plans.ZOrder.zvalExpr(x, y, idiv)

  /** The LATERAL SQL text both engines run verbatim — top-1-per-key via a
    * correlated ordered-limit subquery (SQL:2016 lateral), the idiomatic
    * "latest row per entity" a warehouse user writes. Spark decorrelates
    * it (DecorrelateInnerQuery) into a ranked join rather than executing
    * a per-row subquery — the plan the optimizer SHOULD pick at scale —
    * and the identical text is the DuckDB oracle, so the surface parity
    * is literal. (lazy: declared after `entries`, which captures it
    * during object init — a plain val would still be null there.) */
  private lazy val LateralSql =
    """SELECT c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS STRING) AS o_orderdate, o.o_totalprice
       FROM customer c,
       LATERAL (SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
                WHERE o_custkey = c.c_custkey
                ORDER BY o_orderdate DESC, o_orderkey LIMIT 1) o
       WHERE c.c_custkey < 100
       ORDER BY c.c_custkey"""

  /** Arbitrary (non-hierarchical) GROUPING SETS — the grouping surface
    * neither q13's ROLLUP (prefix hierarchies) nor q21's CUBE (all
    * subsets) expresses: two independent one-column slices plus the
    * grand total in ONE pass over orders. Both engines run this IDENTICAL
    * text (q26's literal-parity technique). GROUPING() disambiguates the
    * per-set NULLs from data NULLs and is cast to BIGINT on both sides;
    * the ORDER BY pins NULLS FIRST because the engines' defaults differ
    * (Spark: nulls first asc; DuckDB: nulls last). Scale shape: Spark
    * plans one Expand (3 replicas) + one hash aggregate — partial
    * map-side combine applies, no extra shuffle per set. */
  private lazy val GroupingSetsSql =
    s"""SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
       COUNT(*) AS n, ${sumExactSql("o_totalprice")} AS revenue
       FROM orders
       GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
       ORDER BY g_pri, g_st,
         o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST"""
}
