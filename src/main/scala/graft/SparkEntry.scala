package graft

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each paired with ANSI SQL in [[Oracles]] that DuckDB runs
  * over the same parquet tables for the correctness gate.
  *
  * Parity conventions (see TextFunctions): scores are `trunc6`'d before
  * ranking, big double sums go through DECIMAL casts, every query ends in
  * a total deterministic ORDER BY, and output types are restricted to
  * BIGINT / DOUBLE / VARCHAR / DATE / BOOLEAN so Spark's parquet schema
  * and DuckDB's result schema agree.
  */
object SparkEntry {

  /** Smirnov critical-value coefficient at α = 0.05, √(−ln(α/2)/2) —
    * pinned ONCE so q204's Spark call and its oracle twin compare
    * against the same double. */
  private[graft] val KsC05: Double = math.sqrt(-math.log(0.025) / 2.0)

  /** q159: ONE SQL text, run verbatim by BOTH engines (Spark over temp
    * views named like the tables; DuckDB over the parquet views) — the
    * spark.sql surface demonstrated with zero dialect drift: ANSI
    * joins, CTE, window, pinned BIGINT casts. */
  private[graft] val SqlInterfaceQuery: String =
    """WITH spend AS (
      |  SELECT c_mktsegment, o_orderpriority,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY c_mktsegment, o_orderpriority)
      |SELECT c_mktsegment, o_orderpriority, n, rn FROM (
      |  SELECT c_mktsegment, o_orderpriority, n,
      |         CAST(row_number() OVER (PARTITION BY c_mktsegment
      |           ORDER BY n DESC, o_orderpriority) AS BIGINT) AS rn
      |  FROM spend)
      |WHERE rn <= 2 ORDER BY c_mktsegment, rn""".stripMargin

  /** The verbatim shared-SQL family (q169–q178): each entry is ONE SQL
    * text BOTH engines run — Spark over temp views through the
    * [[GraftExtensions]] session (so the registered functions and
    * optimizer rules sit on the SQL path) and DuckDB over the parquet
    * views — guarding the SQL surface against DataFrame-only drift.
    * The texts stay inside the ANSI intersection of the two dialects:
    * exact sums via the inline scaled-long form, truncation via floor,
    * every aggregate CAST-pinned, a total ORDER BY. The one documented
    * exception: DuckDB spells Spark's `dot_product(x, y)` as
    * `list_dot_product(x, y)` and `ARRAY<DOUBLE>` as `DOUBLE[]`;
    * [[duckanizeSql]] applies exactly those two token substitutions to
    * derive the oracle twin — everything else is byte-identical.
    * Entries: (name, views used, text). */
  private def sharedXsum(x: String): String =
    s"(CAST(SUM(CAST(floor($x) AS BIGINT)) AS DOUBLE) + " +
      s"CAST(SUM(CAST(floor((($x) - floor($x)) * 1e8 + 0.5) AS BIGINT)) AS DOUBLE) / 1e8)"
  /** Signed exact sum on a 6-decimal grid: round-half-up each term to a
    * scaled long, integer-sum (order-free), divide once. For terms that
    * may be negative — [[sharedXsum]]'s int/frac split assumes x ≥ 0.
    * Headroom: |term| ≤ ~1e7 → 1e13 scaled; 2^63/1e13 ≈ 9e5 rows per
    * group at worst — fine for grouped sums, would need a wider grid
    * for a single global sum over billions of rows. */
  private def sharedZsum6(x: String): String =
    s"(CAST(SUM(CAST(floor(($x) * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)"
  private def sharedTrunc6(x: String): String =
    s"CAST(floor(($x) * 1e6) / 1e6 AS DOUBLE)"
  private[graft] val SharedSqlQueries: Seq[(String, Seq[String], String)] = Seq(
    // row_number() <= k from SQL — WindowTopKRewrite must route this
    // into the TopKPerKey heap operator (PlanSpec pins it); DuckDB just
    // runs the window
    ("q169_sql_topk_per_group", Seq("lineitem"),
      """SELECT l_returnflag, l_orderkey, l_extendedprice, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT l_returnflag, l_orderkey, l_extendedprice,
        |         row_number() OVER (PARTITION BY l_returnflag
        |           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem)
        |WHERE rn <= 5 ORDER BY l_returnflag, rn""".stripMargin),
    // the registered codegen'd dot_product through spark.sql — the
    // GraftSql function surface exercised from a shared text
    ("q170_sql_dot_product", Seq("embeddings"),
      s"""SELECT e.vec_id AS id,
         |       ${sharedTrunc6("dot_product(CAST(e.embedding AS ARRAY<DOUBLE>), q.qv)")} AS dot
         |FROM embeddings e,
         |     (SELECT CAST(embedding AS ARRAY<DOUBLE>) AS qv FROM embeddings WHERE vec_id = 0) q
         |WHERE e.vec_id != 0
         |ORDER BY dot DESC, id LIMIT 10""".stripMargin),
    ("q171_sql_revenue_by_nation", Seq("orders", "customer", "nation"),
      s"""SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_orders,
         |       ${sharedXsum("o.o_totalprice")} AS revenue
         |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |JOIN nation n ON c.c_nationkey = n.n_nationkey
         |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin),
    ("q172_sql_running_monthly", Seq("orders"),
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1)
        |SELECT month, n, CAST(sum(n) OVER (ORDER BY month) AS BIGINT) AS running_n
        |FROM m ORDER BY month""".stripMargin),
    ("q173_sql_exists_semi", Seq("customer", "orders"),
      """SELECT c_custkey, c_acctbal FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin),
    ("q174_sql_filter_agg", Seq("orders"),
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(*) FILTER (WHERE o_totalprice > CAST(100000.0 AS DOUBLE)) AS BIGINT) AS n_big
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    ("q175_sql_string_report", Seq("part"),
      """SELECT upper(substr(p_name, 1, 8)) AS prefix8,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(length(p_name)) AS BIGINT) AS min_len
        |FROM part GROUP BY 1 ORDER BY prefix8""".stripMargin),
    ("q176_sql_intersect", Seq("supplier", "lineitem"),
      """SELECT CAST(s_suppkey AS BIGINT) AS key FROM supplier
        |WHERE s_acctbal > CAST(5000.0 AS DOUBLE)
        |INTERSECT
        |SELECT CAST(l_suppkey AS BIGINT) AS key FROM lineitem
        |WHERE l_quantity >= CAST(45.0 AS DOUBLE)
        |ORDER BY key""".stripMargin),
    ("q177_sql_having", Seq("lineitem"),
      """SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem GROUP BY l_partkey HAVING count(*) >= 6
        |ORDER BY l_partkey""".stripMargin),
    ("q178_sql_case_buckets", Seq("orders"),
      """SELECT CASE WHEN o_totalprice < CAST(50000.0 AS DOUBLE) THEN 'small'
        |            WHEN o_totalprice < CAST(150000.0 AS DOUBLE) THEN 'mid'
        |            ELSE 'large' END AS bucket,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin),
    ("q179_sql_anti", Seq("customer", "orders"),
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin),
    // TPC-H Q3 (shipping-priority shape) as ONE shared text: the
    // classic 3-way join + date band + grouped exact revenue — the
    // optimizer's bread-and-butter plan exercised from SQL
    ("q221_sql_tpch_q3", Seq("customer", "orders", "lineitem"),
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
         |       ${sharedXsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND CAST(o_orderdate AS DATE) < DATE '1997-06-01'
         |  AND CAST(l_shipdate AS DATE) > DATE '1997-06-01'
         |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),
    // TPC-H Q10 (returned-item reporting shape): which customers
    // returned the most revenue last half-year
    ("q222_sql_tpch_q10", Seq("customer", "orders", "lineitem", "nation"),
      s"""SELECT c_custkey, c_name, n_name,
         |       ${sharedXsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS revenue,
         |       CAST(count(*) AS BIGINT) AS n_items
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
         |  AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
         |GROUP BY c_custkey, c_name, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
    // NTILE from one shared text: equal-count quartiles within each
    // priority under a tie-broken total order, rolled up to a quartile
    // profile — both engines share NTILE's extras-go-early convention
    ("q218_sql_ntile", Seq("orders"),
      """SELECT o_orderpriority, CAST(q AS BIGINT) AS q,
        |       CAST(count(*) AS BIGINT) AS n,
        |       min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM (SELECT o_orderpriority, o_totalprice,
        |             ntile(4) OVER (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice, o_orderkey) AS q
        |      FROM orders)
        |GROUP BY o_orderpriority, q ORDER BY o_orderpriority, q""".stripMargin),
    // value-based RANGE frame from one shared text: each order's count
    // and exact revenue of same-priority orders within $1000 below it —
    // peers included by RANGE semantics in both engines; the window
    // runs over ALL orders, the outer modulus only thins the output
    ("q206_sql_range_frame", Seq("orders"),
      """WITH win AS (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         CAST(count(*) OVER w AS BIGINT) AS n_window,
        |         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) OVER w AS BIGINT) AS rev_i,
        |         CAST(sum(CAST(floor((o_totalprice - floor(o_totalprice)) * 1e8 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS rev_f
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |    RANGE BETWEEN CAST(1000.0 AS DOUBLE) PRECEDING AND CURRENT ROW))
        |SELECT o_orderpriority, o_orderkey,
        |       CAST(floor(o_totalprice * 1e6) / 1e6 AS DOUBLE) AS price,
        |       n_window,
        |       CAST(CAST(rev_i AS DOUBLE) + CAST(rev_f AS DOUBLE) / 1e8 AS DOUBLE) AS window_revenue
        |FROM win WHERE o_orderkey % 97 = 0
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin),
    // TPC-H Q4 shape (order-priority checking): correlated EXISTS
    // against lineitem inside a date band — the decorrelate-to-semi
    // plan from one shared text (late-ship proxy: shipped after order)
    ("q231_sql_tpch_q4", Seq("orders", "lineitem"),
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
        |  AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE))
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    // TPC-H Q14 shape (promotion effect): conditional-over-total exact
    // revenue ratio for one ship month
    ("q232_sql_tpch_q14", Seq("lineitem", "part"),
      s"""SELECT ${sharedTrunc6("CAST(100.0 AS DOUBLE) * (" +
           sharedXsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) ELSE CAST(0.0 AS DOUBLE) END") +
           ") / (" + sharedXsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)") + ")")} AS promo_revenue,
         |       CAST(count(*) AS BIGINT) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-09-01'
         |  AND CAST(l_shipdate AS DATE) < DATE '1997-10-01'""".stripMargin),
    // TPC-H Q16 shape (parts/supplier relationship): multi-column
    // grouped COUNT DISTINCT with a NOT IN supplier exclusion
    ("q233_sql_tpch_q16", Seq("lineitem", "part", "supplier"),
      """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#13'
        |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < CAST(0.0 AS DOUBLE))
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
    // TPC-H Q18 shape (large-volume customers): IN over a grouped
    // HAVING subquery, integer-exact quantity sums
    ("q234_sql_tpch_q18", Seq("customer", "orders", "lineitem"),
      """SELECT c_name, c_custkey, o_orderkey,
        |       CAST(o_orderdate AS DATE) AS order_date, o_totalprice,
        |       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(floor(l_quantity) AS BIGINT)) > 300)
        |GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),
    // TPC-H Q19 shape (discounted revenue): three disjunctive
    // brand/size/quantity bands — the OR-pushdown plan
    ("q235_sql_tpch_q19", Seq("lineitem", "part"),
      s"""SELECT ${sharedXsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS revenue,
         |       CAST(count(*) AS BIGINT) AS n_lines
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity >= CAST(1.0 AS DOUBLE) AND l_quantity <= CAST(11.0 AS DOUBLE))
         |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity >= CAST(10.0 AS DOUBLE) AND l_quantity <= CAST(20.0 AS DOUBLE))
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity >= CAST(20.0 AS DOUBLE) AND l_quantity <= CAST(30.0 AS DOUBLE))""".stripMargin),
    // TPC-H Q22 shape (global-relationship check): scalar average
    // subquery + correlated NOT EXISTS (anti on urgent orders — every
    // positive-balance customer here has SOME order), country-code
    // grouping proxied by custkey residue
    ("q236_sql_tpch_q22", Seq("customer", "orders"),
      s"""WITH pos AS (SELECT ${sharedXsum("c_acctbal")} AS s, CAST(count(*) AS BIGINT) AS n
         |             FROM customer WHERE c_acctbal > CAST(0.0 AS DOUBLE)),
         |sel AS (SELECT CAST(c_custkey % 5 AS BIGINT) AS cntrycode, c_acctbal
         |        FROM customer, pos
         |        WHERE c_acctbal > s / CAST(n AS DOUBLE)
         |          AND c_custkey % 5 IN (1, 2, 3)
         |          AND NOT EXISTS (SELECT 1 FROM orders
         |                          WHERE o_custkey = c_custkey
         |                            AND o_orderpriority = '1-URGENT'))
         |SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
         |       ${sharedXsum("c_acctbal")} AS totacctbal
         |FROM sel GROUP BY cntrycode ORDER BY cntrycode""".stripMargin),
    ("q255_sql_except", Seq("supplier", "lineitem"),
      """SELECT CAST(s_suppkey AS BIGINT) AS key FROM supplier
        |WHERE s_acctbal > CAST(1000.0 AS DOUBLE)
        |EXCEPT
        |SELECT CAST(l_suppkey AS BIGINT) AS key FROM lineitem
        |WHERE l_quantity >= CAST(50.0 AS DOUBLE) AND l_returnflag = 'R'
        |  AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1997-07-01'
        |ORDER BY key""".stripMargin),
    // cume_dist from one shared text: both engines define it as
    // rows-with-value-≤-current / partition rows, so ties share a value
    ("q256_sql_cume_dist", Seq("orders"),
      """SELECT o_orderpriority, o_orderkey,
        |       CAST(floor(cd * 1e6) / 1e6 AS DOUBLE) AS cume
        |FROM (SELECT o_orderpriority, o_orderkey,
        |             cume_dist() OVER (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice) AS cd
        |      FROM orders)
        |WHERE o_orderkey % 101 = 0
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin),
    // share-of-total from one shared text: a window aggregate OVER a
    // grouped aggregate — sum(count(*)) over the partition
    ("q258_sql_share_of_total", Seq("lineitem"),
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |       CAST(floor(CAST(count(*) AS DOUBLE)
        |         / CAST(sum(count(*)) OVER (PARTITION BY l_returnflag) AS DOUBLE)
        |         * 1e6) / 1e6 AS DOUBLE) AS share
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    ("q191_sql_correlated_scalar", Seq("customer", "orders"),
      """SELECT c_custkey,
        |       (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |        WHERE o.o_custkey = c.c_custkey
        |          AND o.o_orderpriority = '1-URGENT') AS n_urgent,
        |       (SELECT max(o_totalprice) FROM orders o
        |        WHERE o.o_custkey = c.c_custkey) AS max_price
        |FROM customer c
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin),
    ("q187_sql_grouping_sets", Seq("lineitem"),
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
        |       coalesce(l_linestatus, '(all)') AS linestatus,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin),
    // TPC-H Q7 (volume shipping): bilateral trade flow between two
    // nations by ship year — the 6-table snowflake join; both nation
    // roles resolved from ONE dimension via two aliases
    ("q259_sql_tpch_q7", Seq("lineitem", "orders", "customer", "supplier", "nation"),
      s"""SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         |       CAST(EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) AS BIGINT) AS l_year,
         |       ${sharedXsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation nc ON c_nationkey = nc.n_nationkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ns ON s_nationkey = ns.n_nationkey
         |WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
         |    OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
         |  AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
         |GROUP BY ns.n_name, nc.n_name, CAST(EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) AS BIGINT)
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),
    // TPC-H Q8 (national market share): one nation's share of regional
    // PROMO revenue per order year — conditional-over-total inside one
    // grouped pass, exact on the shared scaled-long grid
    ("q260_sql_tpch_q8", Seq("lineitem", "part", "orders", "customer", "supplier", "nation", "region"),
      s"""WITH all_nations AS (
         |  SELECT CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
         |         l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS volume,
         |         ns.n_name AS supp_nation
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation nc ON c_nationkey = nc.n_nationkey
         |  JOIN region ON nc.n_regionkey = r_regionkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ns ON s_nationkey = ns.n_nationkey
         |  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
         |    AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31')
         |SELECT o_year,
         |       ${sharedTrunc6("(" +
             sharedXsum("CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE CAST(0.0 AS DOUBLE) END") +
             ") / (" + sharedXsum("volume") + ")")} AS mkt_share
         |FROM all_nations GROUP BY o_year ORDER BY o_year""".stripMargin),
    // TPC-H Q9 shape (product-type profit): signed profit per supplier
    // nation and year; the testdata has no partsupp, so supply cost is
    // proxied as 1% of retail price per unit — the shape (LIKE-filtered
    // part, signed grouped sum over a 4-way join) is what's exercised
    ("q261_sql_tpch_q9", Seq("lineitem", "part", "supplier", "nation", "orders"),
      s"""SELECT nation, o_year, ${sharedZsum6("amount")} AS sum_profit
         |FROM (
         |  SELECT ns.n_name AS nation,
         |         CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
         |         l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
         |           - p_retailprice * CAST(0.01 AS DOUBLE) * l_quantity AS amount
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ns ON s_nationkey = ns.n_nationkey
         |  JOIN orders ON l_orderkey = o_orderkey) profit
         |GROUP BY nation, o_year ORDER BY nation, o_year""".stripMargin),
    // TPC-H Q13 (customer order distribution): LEFT JOIN with an extra
    // ON-clause predicate, then a histogram of the per-customer counts
    ("q262_sql_tpch_q13", Seq("customer", "orders"),
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |      FROM customer LEFT JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey) c_orders
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin),
    // TPC-H Q15 (top supplier): quarterly revenue CTE consumed twice —
    // once for the rows, once for the scalar max; exact grid sums make
    // the double equality engine-portable
    ("q263_sql_tpch_q15", Seq("supplier", "lineitem"),
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |         ${sharedXsum("l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)")} AS total_revenue
         |  FROM lineitem
         |  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
         |    AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin),
    // TPC-H Q17 (small-quantity-order revenue): correlated per-part
    // average-quantity scalar subquery as the filter; quantities are
    // integral doubles so the average is order-free exact
    ("q264_sql_tpch_q17", Seq("lineitem", "part"),
      s"""SELECT ${sharedTrunc6("(" + sharedXsum("l_extendedprice") + ") / CAST(7.0 AS DOUBLE)")} AS avg_yearly,
         |       CAST(count(*) AS BIGINT) AS n_lines
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE p_brand = 'Brand#1'
         |  AND l_quantity < (
         |    SELECT CAST(0.2 AS DOUBLE) * (CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
         |                                   / CAST(count(*) AS DOUBLE))
         |    FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)""".stripMargin),
    // TPC-H Q21 shape (suppliers who kept orders waiting): the testdata
    // has no receipt/commit dates, so "late" is shipped >120 days after
    // the order date; the double-correlated EXISTS / NOT EXISTS pair is
    // the exercised machinery
    ("q265_sql_tpch_q21", Seq("supplier", "lineitem", "orders"),
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND CAST(l1.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 120
        |  AND s_nationkey = 3
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND CAST(l3.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 120)
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin),
    // first/nth/last_value over an explicit full frame from one shared
    // text — the value-window surface beyond rank/sum
    ("q280_sql_value_windows", Seq("lineitem"),
      """SELECT l_returnflag, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       l_extendedprice, top_price, second_price, bottom_price
        |FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |         first_value(l_extendedprice) OVER w AS top_price,
        |         nth_value(l_extendedprice, 2) OVER w AS second_price,
        |         last_value(l_extendedprice) OVER w AS bottom_price,
        |         row_number() OVER w2 AS rn
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_returnflag
        |               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        |         w2 AS (PARTITION BY l_returnflag
        |                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber))
        |WHERE rn <= 5 ORDER BY l_returnflag, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin),
    // correlated LATERAL top-2: per-customer dependent subquery with
    // ORDER BY + LIMIT — the lateral-join surface both engines share
    ("q281_sql_lateral_top2", Seq("customer", "orders"),
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c,
        |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_custkey = c.c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_custkey <= 100
        |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin),
    // TPC-H Q6 (forecast revenue change): the classic single-pass
    // selective scan-and-sum — predicate pushdown straight to parquet,
    // revenue exact on the shared scaled-long grid
    ("q282_sql_tpch_q6", Seq("lineitem"),
      s"""SELECT ${sharedXsum("l_extendedprice * l_discount")} AS revenue,
         |       CAST(count(*) AS BIGINT) AS n_lines
         |FROM lineitem
         |WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
         |  AND CAST(l_shipdate AS DATE) < DATE '1996-01-01'
         |  AND l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
         |  AND l_quantity < CAST(24.0 AS DOUBLE)""".stripMargin),
    // TPC-H Q2 shape (min-cost supplier): the testdata has no partsupp,
    // so the part-supplier relation is derived from lineitem with unit
    // cost = min(extendedprice/quantity); the exercised machinery is the
    // region-filtered snowflake plus the correlated scalar-min subquery
    // over a CTE consumed twice
    ("q283_sql_tpch_q2", Seq("lineitem", "part", "supplier", "nation", "region"),
      s"""WITH ps AS (
         |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         |         min(l_extendedprice / l_quantity) AS ps_supplycost
         |  FROM lineitem GROUP BY l_partkey, l_suppkey)
         |SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
         |       ${sharedTrunc6("ps_supplycost")} AS supplycost
         |FROM part p
         |JOIN ps ON p_partkey = ps_partkey
         |JOIN supplier s ON s_suppkey = ps_suppkey
         |JOIN nation n ON s_nationkey = n_nationkey
         |JOIN region r ON n_regionkey = r_regionkey
         |WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE' AND r_name = 'EUROPE'
         |  AND ps_supplycost = (
         |    SELECT min(ps2.ps_supplycost) FROM ps ps2
         |    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
         |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
         |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
         |    WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
         |ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey""".stripMargin),
    // TPC-H Q11 shape (important stock): per-part value restricted to
    // one supplier region vs a scalar fraction of the total — the
    // grouped-CTE + scalar-threshold HAVING pattern; the total re-sums
    // the already-grid-exact per-part values on a 1e6 grid so the
    // threshold is order-free in both engines
    ("q284_sql_tpch_q11", Seq("lineitem", "supplier", "nation"),
      s"""WITH value AS (
         |  SELECT l_partkey, ${sharedXsum("l_extendedprice")} AS val
         |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_regionkey = 1
         |  GROUP BY l_partkey)
         |SELECT l_partkey, val FROM value
         |WHERE val > (SELECT (CAST(SUM(CAST(floor(val * 1e6 + 0.5) AS BIGINT)) AS DOUBLE) / 1e6)
         |                    * CAST(0.001 AS DOUBLE) FROM value)
         |ORDER BY val DESC, l_partkey""".stripMargin),
    // TPC-H Q12 shape (shipping-priority counts): the testdata has no
    // l_shipmode, so lines group by return flag; the exercised machinery
    // is the date-windowed join with dual conditional counts
    ("q285_sql_tpch_q12", Seq("orders", "lineitem"),
      """SELECT l_returnflag,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
        |  AND CAST(l_shipdate AS DATE) < DATE '1996-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
    // TPC-H Q20 shape (potential part promotion): nested IN subqueries
    // with a grouped-HAVING quantity floor — suppliers who moved more
    // than 60 units of any red part in the window; quantities are
    // integral doubles so the HAVING sum is BIGINT-exact
    ("q286_sql_tpch_q20", Seq("supplier", "lineitem", "part"),
      """SELECT s_name, s_acctbal FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |    AND CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1996-01-01'
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) > 60)
        |ORDER BY s_name""".stripMargin))

  /** The two mechanical token substitutions separating the dialects on
    * the shared texts (see [[SharedSqlQueries]]). */
  private[graft] def duckanizeSql(text: String): String =
    text.replace("dot_product(", "list_dot_product(")
      .replace("ARRAY<DOUBLE>", "DOUBLE[]")

  private def sharedSqlRun(s: SparkSession, d: String,
      views: Seq[String], text: String): DataFrame = {
    views.foreach { v =>
      val df = v match {
        case "region" => Tables.region(s, d)
        case "nation" => Tables.nation(s, d)
        case "customer" => Tables.customer(s, d)
        case "supplier" => Tables.supplier(s, d)
        case "part" => Tables.part(s, d)
        case "orders" => Tables.orders(s, d)
        case "lineitem" => Tables.lineitem(s, d)
        case "events" => Tables.events(s, d)
        case "documents" => Tables.documents(s, d)
        case "embeddings" => Tables.embeddings(s, d)
      }
      df.createOrReplaceTempView(v)
    }
    s.sql(text)
  }

  /** q293/q294 input: each order's top-2 lineitems by price define a
    * preference "duel" — the return flag of the most expensive line
    * beats the runner-up's. Orders with one line or a same-flag top-2
    * contribute nothing. The per-order window is key-partitioned
    * (never global), so the reduction from line-level data to the
    * players×players preference frame is one shuffle at any scale. */
  private def duelsFor(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
    Tables.lineitem(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy("l_orderkey")
      .agg(max(when(col("rn") === 1, col("l_returnflag"))).as("wf"),
        max(when(col("rn") === 2, col("l_returnflag"))).as("lf"))
      .filter(col("lf").isNotNull && col("wf") =!= col("lf"))
  }

  /** Right-censored gap-session lifetimes (q214's 1-hour-gap sessions,
    * minutes; a session ending inside the final hour is censored) —
    * the shared survival frame of q229 (Kaplan–Meier) and q247
    * (Nelson–Aalen). */
  private def sessionDurations(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val sess = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("ns", when(lag(col("us"), 1).over(w).isNull ||
        col("us") - lag(col("us"), 1).over(w) > 3600000000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
    val horizon = sess.agg(max(col("e_us")).as("h_us"))
    sess.crossJoin(broadcast(horizon))
      .select(expr("(e_us - s_us) div 60000000").as("dur_min"),
        (col("h_us") - col("e_us") > lit(3600000000L)).as("observed"),
        (col("user_id") % 2).as("arm"))
  }

  /** Daily per-type totals on the 8-decimal integer grid — the shared
    * input frame of the q242/q243 trend tests. */
  private def dailyTotalsByType(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * lit(1e8) + lit(0.5)).cast("long").as("v8"))
      .groupBy("event_type", "day").agg(sum(col("v8")).as("t8"))

  // ---- shared constants (must match the literal values in Oracles) ----
  private[graft] val KwQuery = "spark join filter table scan the"
  private[graft] val Bm25Terms = Seq("join", "filter", "table", "scan")
  private[graft] val GraphQueryText = "cold bolt red gear"
  private[graft] val KnnQueryId = 0L
  private[graft] val IvfQueryId = 7L
  // q70/q71 product-quantization shape: 64-d → 16 subspaces × 16 codes
  // (16 bytes/vector — measured the recall sweet spot at this dim: 4-d
  // subspaces quantize much tighter than 8-d ones at equal ksub),
  // 2 Lloyd refinement steps over a 256-row md5-chosen sample
  private[graft] val PqM = 16
  private[graft] val PqKsub = 16
  private[graft] val PqIters = 2
  private[graft] val PqSample = 256
  private[graft] val PqOversample = 4
  // q80/q81 IVF-PQ shape: 8 coarse cells, residuals at 8 subspaces ×
  // 16 codes, 2 of 8 cells probed
  private[graft] val IvfPqNlist = 8
  private[graft] val IvfPqM = 8
  private[graft] val IvfPqKsub = 16
  private[graft] val IvfPqNProbe = 2
  // the q168 frontier sweep: every (nProbe, oversample) operating point
  private[graft] val FrontierProbes = Seq(1, 2, 4, 8)
  private[graft] val FrontierOversamples = Seq(2, 4, 8)
  // q328's held-out query set: the recall the tuner SLAs is measured
  // over these, NOT over the single q168/q321 tuning query (qid 0)
  private[graft] val HeldoutQueryIds = Seq(7L, 23L, 42L)
  private[graft] val HeldoutRecallTarget = 0.7
  private[graft] val FusionWeights = Map("vector" -> 1.0, "keyword" -> 0.5)

  // q65 freshness-boost fixture: epoch base (2024-06-01) for the
  // deterministic one-hour-per-doc created_at, and the boost factor
  private[graft] val FreshBaseEpoch = 1717200000L
  private[graft] val FreshBoost = 0.5
  private[graft] val ThreeWayWeights =
    Map("vector" -> 1.0, "keyword" -> 0.5, "graph" -> 0.75)
  private[graft] val RrfK = 60.0 // reference config/retrieval/default.yaml rrf_k
  private[graft] val CleanSpec = TextAnalysis.CleanRecipe(
    langs = Seq("en", "fr"), minQuality = 0.3, maxRepRatio = 0.2,
    sampleRate = 0.8, salt = "clean")

  /** documents ∪ an exact copy shifted by +10000 — the corpus for exact
    * dedup (the synthetic docs have no duplicates of their own). */
  private def docsWithCopies(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    docs.unionByName(docs.select((col("doc_id") + 10000).as("doc_id"), col("text")))
  }

  /** documents ∪ a half-length PREFIX copy shifted by +10000 — the
    * corpus for containment detection: a prefix has Jaccard ≈ 0.5 with
    * its source (resemblance misses it at any strict threshold) but
    * containment ≈ 1.0. */
  private def docsWithPrefixCopies(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    docs.unionByName(docs.select(
      (col("doc_id") + 10000).as("doc_id"),
      expr("substring(text, 1, length(text) div 2)").as("text")))
  }

  /** documents ∪ a near-duplicate copy (first word dropped) shifted by
    * +10000 — the corpus for near-dup detection. */
  private def docsWithNearDups(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    docs.unionByName(docs.select(
      (col("doc_id") + 10000).as("doc_id"),
      expr("substring(text, instr(text, ' ') + 1)").as("text")))
  }

  /** documents ∪ a RE-SALTED copy shifted by +20000 (every odd-position
    * token rewritten, the ScaleUp replica recipe) — a corpus whose
    * distinct shingle set genuinely ~doubles, unlike an exact or
    * near-dup copy whose windows are content-identical to the source.
    * The 2× rung of the incremental-span index fixtures. */
  private def docsWithSaltedCopies(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    docs.unionByName(docs.select(
      (col("doc_id") + 20000).as("doc_id"),
      array_join(zip_with(
        split(col("text"), " "),
        sequence(lit(0), size(split(col("text"), " ")) - 1),
        (t, p) => when(p % 2 === 1,
          concat(lit("z9q"), p.cast("string"))).otherwise(t)), " ").as("text")))
  }

  /** The 100-doc incremental batch shared by the x50–x52 span rungs
    * (q324's batch: the near-dup variants of docs 0–99). */
  private def spanBatchFor(s: SparkSession, d: String): DataFrame =
    docsWithNearDups(s, d)
      .filter(col("doc_id") >= 10000 && col("doc_id") < 10100)

  /** Persisted corpus shingle indexes for the incremental-span bench
    * pair — the ingest-time artifact [[operators.Dedup.shingleIndex]]
    * maintains; built once per dataset (untimed fixture phase), hashed
    * keys (the production shape). 1× = documents, 2× = documents ∪ the
    * re-salted copy. Cached through [[stageCached]]: persisted frames
    * die with their session, so the key carries the session reference
    * and stopped-session entries evict (the fusionStageCache pattern —
    * a dataset-only key would serve a second same-JVM session a frame
    * pinned to a dead session's blocks). */
  private def shingleIndexFor(s: SparkSession, d: String,
      twoX: Boolean): DataFrame =
    stageCached(s, s"$d#shidx${if (twoX) 2 else 1}") {
      val corpus =
        if (twoX) docsWithSaltedCopies(s, d)
        else Tables.documents(s, d).select("doc_id", "text")
      val idx = Dedup.shingleIndex(corpus, k = 8, hashKeys = true).persist()
      idx.count()
      idx
    }

  /** Bloom snapshot of the 2× shingle index (the persisted prefilter
    * artifact), built once per dataset alongside the index fixture.
    * Plain bytes — deterministic per dataset and free of any session
    * state, so the dataset-only key cannot go stale across sessions. */
  private val shingleBloomCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Byte]]
  private def shingleBloomFor(s: SparkSession, d: String): Array[Byte] =
    shingleBloomCache.getOrElseUpdate(d,
      Dedup.shingleIndexBloom(shingleIndexFor(s, d, twoX = true)))

  /** Pre-seeded span-log warehouses for the write-side fold rungs
    * (x68/x69): the 1×/2× corpus shingle index written ONCE (untimed,
    * first warmup touch) as the compacted base of a
    * [[graft.streaming.StreamingIngest]] span log. Each timed run then
    * folds one 100-doc batch — detection scan + batch-sized delta
    * append + one meta CAS, the full ingest step — whose cost must stay
    * flat as the corpus index doubles (the WRITE-side twin of x51's
    * read-side claim; round-10 verdict #1). Keyed by dataset only: the
    * value is a directory of bytes on disk, free of session state. */
  private val spanLogCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def spanLogFor(s: SparkSession, d: String, twoX: Boolean): String =
    spanLogCache.getOrElseUpdate(s"$d#${if (twoX) 2 else 1}", {
      val dir = graft.TempDirs.create("graft_spanlog").toString
      graft.streaming.StreamingIngest.seedSpanLog(
        shingleIndexFor(s, d, twoX), dir)
      dir
    })

  /** One span-ingest fold step over the pre-seeded log — what x68/x69
    * time. compactEvery is effectively infinite so the rung prices the
    * per-batch FOLD (the flat-cost claim), not amortized compaction;
    * repeat runs append further batch-sized deltas, identically on both
    * rungs, so the 1×/2× ratio stays the corpus-independence measure. */
  private def spanFoldBench(s: SparkSession, d: String,
      twoX: Boolean): DataFrame = {
    import s.implicits._
    val dir = spanLogFor(s, d, twoX)
    val next = graft.streaming.StreamingIngest
      .spanLogState(s, dir).lastBatch + 1
    graft.streaming.StreamingIngest.applySpanBatch(
      spanBatchFor(s, d), dir, k = 8, hashKeys = true, batchId = next,
      compactEvery = Int.MaxValue)
    val nDelta = s.read.parquet(s"$dir/spanlog/delta/batch_id=$next").count()
    Seq((next, nDelta)).toDF("batch_id", "n_delta_keys")
  }

  /** Pre-seeded span logs for the COMPACTION rungs (x6a/x6b) — a
    * separate warehouse per rung so the compaction cadence here never
    * disturbs the fold rungs' loose-delta ladder. Same seeding: the
    * 1×/2× corpus shingle index as the shard-bucketed base. */
  private val spanCompactLogCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def spanCompactLogFor(s: SparkSession, d: String,
      twoX: Boolean): String =
    spanCompactLogCache.getOrElseUpdate(s"$d#${if (twoX) 2 else 1}", {
      val dir = graft.TempDirs.create("graft_spancompact").toString
      graft.streaming.StreamingIngest.seedSpanLog(
        shingleIndexFor(s, d, twoX), dir)
      dir
    })

  /** One L1-COMPACTION cycle over the pre-seeded log — the compaction
    * twin of x68/x69 (round-11 verdict #1): two ingest folds with
    * compactEvery = 2, so the second triggers exactly one L1 compaction
    * (loose deltas → one run) inside the timed cycle. The r11 form
    * re-aggregated base ∪ deltas and rewrote the WHOLE base at this
    * moment — O(index) every cadence; the tiered form's step reads only
    * the deltas being folded, so the 1×/2× ratio across the corpus-index
    * doubling is the flat-compaction proof. absorbEvery is pinned
    * effectively infinite so every cycle measures the SAME step (base
    * absorption — per-shard, on the cadence² schedule — is priced by
    * its own spec and stays out of this rung); repeat runs accumulate
    * run dirs identically on both rungs. */
  private def spanCompactBench(s: SparkSession, d: String,
      twoX: Boolean): DataFrame = {
    import s.implicits._
    val dir = spanCompactLogFor(s, d, twoX)
    val st0 = graft.streaming.StreamingIngest.spanLogState(s, dir)
    (1 to 2).foreach { i =>
      graft.streaming.StreamingIngest.applySpanBatch(
        spanBatchFor(s, d), dir, k = 8, hashKeys = true,
        batchId = st0.lastBatch + i,
        compactEvery = 2, absorbEvery = Int.MaxValue)
    }
    val st = graft.streaming.StreamingIngest.spanLogState(s, dir)
    require(st.runs.size.toLong == st0.runs.size + 1,
      s"cycle must compact exactly once: ${st0.runs.size} -> ${st.runs.size}")
    Seq((st.lastBatch, st.runs.size.toLong)).toDF("batch_id", "n_runs")
  }

  /** Pre-seeded span logs for the base-ABSORPTION rungs (x6c/x6d) —
    * their own warehouses so the absorption cadence never disturbs the
    * fold or L1-compaction ladders. */
  private val spanAbsorbLogCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def spanAbsorbLogFor(s: SparkSession, d: String,
      twoX: Boolean): String =
    spanAbsorbLogCache.getOrElseUpdate(s"$d#${if (twoX) 2 else 1}", {
      val dir = graft.TempDirs.create("graft_spanabsorb").toString
      graft.streaming.StreamingIngest.seedSpanLog(
        shingleIndexFor(s, d, twoX), dir)
      dir
    })

  /** One base-ABSORPTION cycle over the pre-seeded log — the absorption
    * twin of x6a/x6b and the span-LSM story's last unmeasured moment
    * (r12 verdict "next round" #4): two ingest folds with
    * compactEvery = 2 and absorbEvery = 1, so the second fold's cadence
    * step absorbs the loose deltas STRAIGHT into the shard-bucketed
    * base — only segments the incoming keys touch read, merge and
    * rewrite (untouched segments carry by reference;
    * StreamingSpec pins the touched-only contract). The cost claim this
    * rung prices is BUCKET-PROPORTIONAL, not flat: a batch whose keys
    * hash across all shards rewrites a base-sized byte volume, so the
    * 1×/2× ratio across the corpus-index doubling is expected ≈ the
    * touched-segment size ratio (bounded class, ≤ the doubling) — vs
    * the L1 step (x6a/x6b) which stays flat. Repeat runs absorb one
    * further batch pair identically on both rungs. */
  private def spanAbsorbBench(s: SparkSession, d: String,
      twoX: Boolean): DataFrame = {
    import s.implicits._
    val dir = spanAbsorbLogFor(s, d, twoX)
    val st0 = graft.streaming.StreamingIngest.spanLogState(s, dir)
    (1 to 2).foreach { i =>
      graft.streaming.StreamingIngest.applySpanBatch(
        spanBatchFor(s, d), dir, k = 8, hashKeys = true,
        batchId = st0.lastBatch + i,
        compactEvery = 2, absorbEvery = 1)
    }
    val st = graft.streaming.StreamingIngest.spanLogState(s, dir)
    require(st.runs.isEmpty && st.foldedThrough == st0.lastBatch + 2,
      s"cycle must absorb exactly once: runs=${st.runs.size}, " +
        s"folded ${st0.foldedThrough} -> ${st.foldedThrough}")
    Seq((st.lastBatch, st.basePaths.size.toLong))
      .toDF("batch_id", "n_base_segments")
  }

  /** Three-variant duplicate families over the first 100 docs: the
    * original, an exact copy (+10000) and a first-word-dropped near-dup
    * (+20000) — the corpus for transitive duplicate-cluster resolution. */
  private def docsWithDupFamilies(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
      .filter(col("doc_id") < 100)
    docs
      .unionByName(docs.select((col("doc_id") + 10000).as("doc_id"), col("text")))
      .unionByName(docs.select((col("doc_id") + 20000).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text")))
  }

  /** Graph derived from lineitem: supplier --[returnflag, extendedprice]-->
    * part, with part node ids offset by +100000 into a shared id space. */
  private def graphEdges(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      col("l_suppkey").as("src"),
      (col("l_partkey") + 100000L).as("dst"),
      col("l_returnflag").as("relation"),
      col("l_extendedprice").as("weight"))

  private def graphVertices(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      (col("p_partkey") + 100000L).as("id"), col("p_name").as("name"))

  /** Session-scoped index caches for the benched index-lookup queries:
    * built once per dataset dir (the ingest-time cost), then every query
    * touches only posting slices / probed clusters — the shape that
    * replaces per-query corpus scans at 100 TB. */
  private val kwIndexCache =
    scala.collection.concurrent.TrieMap.empty[String, pipeline.KeywordIndex]
  private def keywordIndexFor(s: SparkSession, d: String): pipeline.KeywordIndex =
    kwIndexCache.getOrElseUpdate(d, {
      val dir = graft.TempDirs.create("graft_kwidx").toString
      val idx = new pipeline.KeywordIndex(s, dir)
      idx.build(Tables.documents(s, d))
      idx
    })

  private val ivfIndexCache =
    scala.collection.concurrent.TrieMap.empty[String, pipeline.IvfIndex]
  private def ivfIndexFor(s: SparkSession, d: String): pipeline.IvfIndex =
    ivfIndexCache.getOrElseUpdate(d, {
      val dir = graft.TempDirs.create("graft_ivfidx").toString
      pipeline.IvfIndex.build(s, Tables.embeddings(s, d), nlist = 8).save(dir)
      pipeline.IvfIndex.load(s, dir)
    })

  private val pqIndexCache =
    scala.collection.concurrent.TrieMap.empty[String, pipeline.PqIndex]
  private def pqIndexFor(s: SparkSession, d: String): pipeline.PqIndex =
    pqIndexCache.getOrElseUpdate(d, {
      val dir = graft.TempDirs.create("graft_pqidx").toString
      pipeline.PqIndex.build(Tables.embeddings(s, d),
        m = PqM, ksub = PqKsub, iters = PqIters, sampleRows = PqSample).save(dir)
      pipeline.PqIndex.load(s, dir)
    })

  private val ivfPqIndexCache =
    scala.collection.concurrent.TrieMap.empty[String, pipeline.IvfPqIndex]
  private def ivfPqIndexFor(s: SparkSession, d: String): pipeline.IvfPqIndex =
    ivfPqIndexCache.getOrElseUpdate(d, {
      val dir = graft.TempDirs.create("graft_ivfpqidx").toString
      pipeline.IvfPq.build(Tables.embeddings(s, d), nlist = IvfPqNlist,
        m = IvfPqM, ksub = IvfPqKsub, iters = PqIters, sampleRows = PqSample)
        .save(dir)
      pipeline.IvfPq.load(s, dir)
    })

  /** q62's resolved cluster labels, materialized once per dataset: q82
    * (canonical selection) consumes these instead of re-mining pairs +
    * re-running star contraction — the label table is an upstream
    * artifact in a real pipeline, produced once per corpus snapshot. */
  private val dupLabelsCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def dupLabelsFor(s: SparkSession, d: String): DataFrame =
    dupLabelsCache.getOrElseUpdate(d, {
      val df = Dedup.duplicateClusters(
        Dedup.ngramJaccardPairs(docsWithDupFamilies(s, d),
          n = 3, threshold = 0.5)).persist()
      df.count() // materialize eagerly: one contraction run per dataset
      df
    })

  /** The symmetrized near-dup pair graph (q31's corpus/params) shared
    * by the graph-analytics queries q99/q109/q110 — mined once per
    * dataset and kept resident (the q82 label-cache pattern), so the
    * trio prices graph analytics, not repeated pair mining. */
  private val nearDupEdgesCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  /** Part co-occurrence edges (pairs co-ordered in ≥ 2 baskets), both
    * directions, cached per dataset — q217's assortativity and q223's
    * hop histogram read the same graph; the q154 row-local pair
    * fan-out builds it once. */
  private val partCoocCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def partCooccurrenceEdges(s: SparkSession, d: String): DataFrame =
    partCoocCache.getOrElseUpdate(d, {
      // collect_set IS the per-basket distinct — no standalone
      // exchange ahead of it (the itemCosine treatment, guide §2.4)
      val b = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("bid"), col("l_partkey").as("item"))
      val pairs = b.groupBy("bid")
        .agg(sort_array(collect_set(col("item"))).as("ps"))
        .filter(size(col("ps")) >= 2)
        .select(explode(expr(
          "flatten(transform(sequence(1, size(ps) - 1), " +
            "i -> transform(slice(ps, i + 1, size(ps) - i), " +
            "x -> struct(ps[i - 1] AS a, x AS b))))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(pairs.select(col("b").as("src"), col("a").as("dst")))
        .persist()
      edges.count() // materialize eagerly, once
      edges
    })

  private def nearDupPairEdges(s: SparkSession, d: String): DataFrame =
    nearDupEdgesCache.getOrElseUpdate(d, {
      val pairs = Dedup.ngramJaccardPairs(
        docsWithNearDups(s, d).filter(col("doc_id") < 100 ||
          (col("doc_id") >= 10000 && col("doc_id") < 10100)),
        n = 3, threshold = 0.5)
      val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
        .persist()
      edges.count() // materialize eagerly, once
      edges
    })

  /** Two on-disk layouts of the events table — z-ordered on
    * (user_id, ts_us) vs plain ts-sorted — for the x64/x65 bench pair
    * pricing what multi-dimensional clustering buys a two-sided
    * predicate (parquet row-group stats prune where the data is
    * clustered; the ts-sort leaves user_id full-range in every file). */
  private val zLayoutCache =
    scala.collection.concurrent.TrieMap.empty[String, (String, String, Long, Long, Long, Long)]
  private def zLayoutFor(s: SparkSession, d: String): (String, String, Long, Long, Long, Long) =
    zLayoutCache.getOrElseUpdate(d, {
      val ev = Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
      val base = graft.TempDirs.create("graft_zord").toString
      val (zDir, sDir) = (s"$base/z", s"$base/s")
      graft.pipeline.Layout.writeZOrdered(ev, zDir,
        Seq("user_id", "ts_us"), nFiles = 16)
      ev.repartitionByRange(16, col("ts_us")).sortWithinPartitions("ts_us")
        .write.mode("overwrite").parquet(sDir)
      // ~10%-selective bands on BOTH dims, derived once from the data
      val r = ev.agg(min("user_id"), max("user_id"),
        min("ts_us"), max("ts_us")).head()
      val (u0, u1, t0, t1) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      (zDir, sDir,
        u0 + (u1 - u0) * 4 / 10, u0 + (u1 - u0) * 5 / 10,
        t0 + (t1 - t0) * 4 / 10, t0 + (t1 - t0) * 5 / 10)
    })

  private def zScanProbe(s: SparkSession, dir: String,
      loU: Long, hiU: Long, loT: Long, hiT: Long): DataFrame =
    // two-sided selective band — the shape only a multi-dimensionally
    // clustered layout lets parquet row-group stats prune on BOTH dims
    s.read.parquet(dir)
      .filter(col("user_id").between(loU, hiU) &&
        col("ts_us").between(loT, hiT))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), xsum(col("value")).as("total"))
      .orderBy("event_type")

  private val ivfQueryVecCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Float]]
  private def ivfQueryVec(s: SparkSession, d: String): Array[Float] =
    ivfQueryVecCache.getOrElseUpdate(d,
      Tables.embeddings(s, d)
        .filter(col("vec_id") === KnnQueryId)
        .select("embedding").head()
        .getAs[scala.collection.Seq[Float]](0).toArray)

  /** Per-qid query vectors for the held-out recall frontier (1-row
    * bounded fetches, cached like [[ivfQueryVec]]). */
  private val heldoutVecCache =
    scala.collection.concurrent.TrieMap.empty[String, Array[Float]]
  private def queryVecFor(s: SparkSession, d: String, qid: Long): Array[Float] =
    heldoutVecCache.getOrElseUpdate(s"$d#$qid",
      Tables.embeddings(s, d)
        .filter(col("vec_id") === qid)
        .select("embedding").head()
        .getAs[scala.collection.Seq[Float]](0).toArray)

  /** Vertex embeddings encoded ONCE per dataset and kept resident — the
    * K5 ingest-time cost. The benched q45 then scores STORED embeddings
    * (the plan you'd run at 100 TB), never re-encoding the corpus per
    * query; `MemFuse.buildSemanticLayer` persists the same thing to
    * parquet for the facade path. */
  private val vertexEmbCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]
  private def vertexEmbeddingsFor(s: SparkSession, d: String): DataFrame =
    vertexEmbCache.getOrElseUpdate(d, {
      val df = pipeline.Md5SignEncoder()
        .encode(graphVertices(s, d), "name").persist()
      df.count() // materialize the encode once, eagerly
      df
    })

  /** Two fact corpora built from `part` for conflict detection (H6):
    * "name is TYPE" as the existing facts, "name is|has BRAND" as the
    * new facts — same subjects, different objects, so same-name pairs are
    * DIRECT_CONTRADICTIONs ("is" rows) or SEMANTIC_CONFLICTs ("has"
    * rows). Bounded to p_partkey < 500 like q31's pair corpus. */
  private def factCorpora(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val p = Tables.part(s, d).filter(col("p_partkey") < 500)
    val existing = p.select(
      col("p_partkey").cast("string").as("chunk_id"), lit("u").as("user_id"),
      concat(col("p_name"), lit(" is "), col("p_type")).as("content"))
    val fresh = p.select(
      (col("p_partkey") + 100000L).cast("string").as("chunk_id"),
      lit("u").as("user_id"),
      concat(col("p_name"),
        when(col("p_size") % 2 === 0, lit(" is ")).otherwise(lit(" has ")),
        col("p_brand")).as("content"))
    (pipeline.SemanticLayer.extractFacts(existing),
      pipeline.SemanticLayer.extractFacts(fresh))
  }

  /** union of the vector and keyword scored scans — the fusion input
    * relation (SURVEY §2.6 T3). */
  private[graft] def hybridInputs(s: SparkSession, d: String): DataFrame = {
    val vector = Retrieval
      .cosineKnn(Tables.embeddings(s, d), KnnQueryId, 50)
      .withColumn("store_type", lit("vector"))
    val keyword = Retrieval
      .bm25(Tables.documents(s, d), Bm25Terms, 50)
      .withColumn("store_type", lit("keyword"))
    vector.unionByName(keyword)
  }

  /** Flagship hybrid retrieval (SURVEY §3.1): vector ∪ keyword scans →
    * RRF fusion → hydration join against documents → top-k. */
  private def hybridQuery(s: SparkSession, d: String): DataFrame = {
    val fused = Fusion.rrf(hybridInputs(s, d), RrfK, FusionWeights, 15)
    val docs = Tables.documents(s, d)
    fused
      .join(docs, fused("id") === docs("doc_id"))
      .select(col("id"), col("fused_score"), col("lang"), col("source"),
        substring(col("text"), 1, 80).as("preview"))
      .orderBy(col("fused_score").desc, col("id"))
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    hybridQuery(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
    // ---- relational scans / filters / joins / aggregations ----
    "q01_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          // xsum/xavg: dsum's exact-rounded semantics via scaled-long
          // sums — no per-row decimal cast (2.7x on this, the biggest
          // single-table aggregation; all columns nonnegative)
          xsum(col("l_quantity")).as("sum_qty"),
          xsum(col("l_extendedprice")).as("sum_base_price"),
          xsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          xsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          xavg(col("l_quantity")).as("avg_qty"),
          xavg(col("l_extendedprice")).as("avg_price"),
          xavg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q02_top_revenue_orders" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      // broadcast ONLY the filtered dimension: customer is the side that
      // stays small at scale. orders and lineitem both grow with SF, so
      // neither may ever sit on a broadcast build side — customer⋈orders
      // stays a broadcast join (customer built), then orders⋈lineitem is
      // pinned to a shuffle join (at toy SF the planner's size estimate
      // would otherwise happily broadcast the column-pruned FACT table,
      // the exact inversion that OOMs at 100×). PlanSpec guards both.
      broadcast(c).join(o, c("c_custkey") === o("o_custkey"))
        .join(l.hint("shuffle_merge"), o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
        .agg(trunc6(xsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate")
    }),

    "q03_region_rollup" -> ((s, d) => {
      val su = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      su.join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"), dsum(col("s_acctbal")).as("total_acctbal"))
        .orderBy("r_name", "n_name")
    }),

    "q04_point_lookup" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_custkey") === 42L)
        .select(col("c_custkey"), col("c_name"),
          col("c_nationkey").cast("long").as("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"))),

    "q05_order_priority" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d).filter(col("l_quantity") > 45.0)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    "q06_revenue_filter" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
        .agg(trunc6(xsum(col("l_extendedprice") * col("l_discount"))).as("revenue"))),

    "q07_customer_spend" -> ((s, d) => {
      val spend = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), xsum(col("o_totalprice")).as("total_spent"))
      val c = Tables.customer(s, d)
      spend.join(c, spend("o_custkey") === c("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("n_orders"), col("total_spent"))
        .orderBy(col("total_spent").desc, col("c_custkey"))
        .limit(20)
    }),

    // ---- events: rollups, sessionization, freshness, quality ----
    "q08_events_rollup" -> ((s, d) =>
      EventOps.rollup(Tables.events(s, d))
        .withColumn("day", col("day").cast("date"))),

    "q09_sessionize" -> ((s, d) =>
      EventOps.sessionize(Tables.events(s, d), 3600L)),

    "q10_freshness_boost" -> ((s, d) =>
      EventOps.freshnessBoost(Tables.events(s, d), 0.2, 100)),

    "q11_quality_assessment" -> ((s, d) =>
      EventOps.qualityAssessment(Tables.events(s, d), 24.0)),

    "q12_user_events" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("user_id") === 3L)
        .orderBy(col("ts"), col("event_id"))
        .limit(20)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_type"), col("value"))),

    // as-of join: each purchase picks up the latest click of the same
    // user at-or-before it — the union-window formulation (one shuffle
    // on user_id, no theta-join); clicks pre-aggregate to one row per
    // (user, instant) so the match is deterministic
    "q90_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("value")).as("click_value"))
        .withColumn("click_ts_us", col("ts_us"))
      Joins.asofJoin(purchases, clicks, Seq("user_id"), "ts_us",
          Seq("click_value", "click_ts_us"))
        .select(col("event_id"), col("ts_us"), col("value"),
          col("click_value"), col("click_ts_us"))
        .orderBy("event_id")
    }),

    // range join: views landing inside the hour after an error of the
    // same user, via bin-bucketed interval join (shuffle |views| + ≤2×
    // |errors|, never the cross product)
    "q91_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts_us"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          col("ts_us").as("w_start"),
          (col("ts_us") + 3600000000L).as("w_end"))
      Joins.rangeJoin(views, errors, Seq("user_id"), "ts_us",
          "w_start", "w_end", binWidth = 3600000000L)
        .select(col("view_id"), col("error_id"),
          (col("ts_us") - col("w_start")).as("lag_us"))
        .orderBy("view_id", "error_id")
    }),

    // trailing-24h rolling count + exact scaled-long sum per event
    "q92_rolling_window" -> ((s, d) =>
      EventOps.rollingWindow(Tables.events(s, d))),

    // 3-step ordered conversion funnel (view → click → purchase)
    "q93_funnel" -> ((s, d) =>
      EventOps.funnel(Tables.events(s, d), Seq("view", "click", "purchase"))),

    // ---- documents: text analysis ----
    "q13_token_stats" -> ((s, d) =>
      TextAnalysis.tokenStats(Tables.documents(s, d))),

    "q14_quality_score" -> ((s, d) =>
      TextAnalysis.qualityScore(Tables.documents(s, d))),

    // the Gopher rule battery: row-local structural signals + keep flag
    "q88_gopher_quality" -> ((s, d) =>
      TextAnalysis.gopherQuality(Tables.documents(s, d))),

    // SemDeDup: k-means clusters + within-cluster cosine-threshold drop
    // (k matches the q77 clustering so the oracle reuses its replay)
    "q89_semantic_dedup" -> ((s, d) =>
      Dedup.semanticDedup(Tables.embeddings(s, d), k = 8, threshold = 0.5)),

    "q15_fingerprint" -> ((s, d) =>
      TextAnalysis.fingerprint(Tables.documents(s, d))),

    "q16_lang_id" -> ((s, d) =>
      TextAnalysis.languageId(Tables.documents(s, d), Oracles.LangMarkers)),

    "q50_token_count_bpe" -> ((s, d) =>
      TextAnalysis.bpeTokenCount(Tables.documents(s, d))),

    // ---- EXACT BPE token counts over the shipped trained merge table
    // (the committed TrainBpe vocab — the tiktoken-with-vocab-file slot;
    // q50 stays the vocab-free estimate). Bounded input: the oracle
    // replays every merge in a recursive CTE ----
    "q60_token_count_bpe_exact" -> ((s, d) =>
      TextAnalysis.bpeExactTokenCount(
        Tables.documents(s, d).filter(col("doc_id") < 60))),

    // ---- BPE TRAINING-side statistics: the weighted adjacent char-pair
    // counts round 0 of the trainer maximizes (TextAnalysis.bpeTrain is
    // the full distributed trainer, spec-pinned merge-for-merge to the
    // committed local TrainBpe; its per-round argmax is not SQL-
    // expressible, so the oracle checks this round-0 aggregation) ----
    "q84_bpe_pair_stats" -> ((s, d) =>
      TextAnalysis.bpePairStats(Tables.documents(s, d), topK = 40)),

    // ---- corpus mixing: deterministic hash-threshold subsample per
    // stratum (reproducible across engines/partitionings, pushes to the
    // scan) + the mixture report a data recipe starts from ----
    "q53_stratified_sample" -> ((s, d) =>
      TextAnalysis.stratifiedSample(
        Tables.documents(s, d), "doc_id", "lang",
        rates = Map("en" -> 0.5, "zh" -> 0.2))
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    "q54_mixture_report" -> ((s, d) =>
      TextAnalysis.mixtureReport(Tables.documents(s, d), Seq("lang", "source"))),

    // ---- n-gram repetition ratio (Gopher/C4 "repetitious text" filter):
    // narrow array-slice projection, scan speed ----
    "q56_repetition_ratio" -> ((s, d) =>
      TextAnalysis.repetitionRatio(Tables.documents(s, d))),

    // ---- PII scrubbing with an audit count. The corpus carries no real
    // PII, so a phone-shaped span is composed deterministically from
    // c_custkey on BOTH engines (1 in 5 rows get none) — the operator
    // under test is the regex redaction itself ----
    "q57_pii_redaction" -> ((s, d) => {
      val phone = concat_ws("-",
        lpad((col("c_custkey") % 89 + 10).cast("string"), 2, "0"),
        lpad((col("c_custkey") * 7 % 1000).cast("string"), 3, "0"),
        lpad((col("c_custkey") * 13 % 1000).cast("string"), 3, "0"),
        lpad((col("c_custkey") * 17 % 10000).cast("string"), 4, "0"))
      val text = when(col("c_custkey") % 5 === 0,
        concat(col("c_name"), lit(" segment "), col("c_mktsegment")))
        .otherwise(concat(col("c_name"), lit(" reachable at "), phone,
          lit(" segment "), col("c_mktsegment")))
      TextAnalysis.redactPii(
        Tables.customer(s, d).withColumn("text", text), "text")
        .select(col("c_custkey"), col("redacted"), col("n_redacted"))
        .orderBy("c_custkey")
    }),

    // ---- exact-substring dedup: verbatim 8-gram passages shared across
    // documents (the suffix-array replacement that scales) ----
    "q58_shared_passages" -> ((s, d) =>
      Dedup.sharedPassages(
        Tables.documents(s, d).select("doc_id", "text"), n = 8)),

    // ---- benchmark decontamination: every 10th doc plays the held-out
    // eval set; training docs sharing a verbatim 8-gram with it are
    // flagged with their shared-gram count (broadcast eval grams — the
    // train side never shuffles by gram) ----
    "q61_decontamination" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      Dedup.contamination(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0), n = 8)
    }),

    // ---- decontamination's big-eval-suite scale path: a Bloom filter
    // over the eval grams prunes the train side map-side before any
    // exchange, and the exact survivor join keeps the result EXACT —
    // same oracle shape as q61, tighter params (n=6, >=2 shared) ----
    "q83_decontamination_bloom" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      Dedup.contaminationBloom(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0), n = 6, minShared = 2)
    }),

    // ---- the SAME per-key top-k written as the universal window idiom:
    // on a Graft session the WindowTopKRewrite optimizer rule routes it
    // into the bounded-heap operator automatically (plan-guarded) — the
    // user keeps their SQL, the engine swaps the O(n log n) sort for
    // O(n log k) heaps ----
    "q55_topk_window_rewrite" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      Tables.lineitem(s, d)
        .select("l_suppkey", "l_extendedprice", "l_orderkey", "l_linenumber")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"))
        .orderBy(col("l_suppkey"), col("l_extendedprice").desc,
          col("l_orderkey"), col("l_linenumber"))
    }),

    "q17_text_search" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(lower(col("text")).contains("join filter"))
        .orderBy("doc_id")
        .limit(20)
        .select("doc_id", "lang", "source")),

    "q18_keyword_overlap" -> ((s, d) =>
      Retrieval.keywordOverlap(Tables.documents(s, d), KwQuery, 50)),

    "q19_bm25" -> ((s, d) =>
      Retrieval.bm25(Tables.documents(s, d), Bm25Terms, 50)),

    // ---- indexed BM25 (S8/A4 at scale): same scores as q19 but read
    // from the persisted term-bucket-partitioned postings — the query
    // touches the query terms' posting slices, never the corpus ----
    "q46_bm25_indexed" -> ((s, d) =>
      keywordIndexFor(s, d).bm25(Bm25Terms, 50)),

    // ---- real IVF probe (K2 at scale): k-means quantizer + cluster-
    // partitioned scan. Registered with nProbe = nlist (exhaustive
    // probe), which provably equals brute-force KNN — so q20's oracle
    // SQL checks the whole index machinery (build, assignment,
    // partition-pruned probe, rescore) end to end. The realistic
    // nProbe=2 probe is benched separately (benchExtras) and its recall
    // is pinned by IvfSpec ----
    "q47_knn_ivf_probe" -> ((s, d) => {
      val idx = ivfIndexFor(s, d)
      idx.query(ivfQueryVec(s, d), topK = 20, nProbe = idx.nlist,
        excludeId = Some(KnnQueryId))
    }),

    // ---- vectors: exact KNN, IVF probe, near-dups, centroids ----
    "q20_knn_cosine" -> ((s, d) =>
      Retrieval.cosineKnn(Tables.embeddings(s, d), KnnQueryId, 20)),

    "q21_knn_ivf" -> ((s, d) =>
      Retrieval.cosineKnnIvf(Tables.embeddings(s, d), IvfQueryId, 20)),

    "q41_knn_lsh" -> ((s, d) =>
      Retrieval.cosineKnnLsh(Tables.embeddings(s, d), KnnQueryId, 10)),

    // ---- product quantization (K2's memory side at 100 TB: 16
    // subspaces × 16 codes = 16 bytes/vector, 16× compression): train
    // codebooks on an md5-chosen sample with decimal-widened Lloyd
    // means, encode the corpus against the broadcast codebook, rank by
    // asymmetric distance (m LUT lookups per vector, no decode). The
    // query reads the PERSISTED codes (built+saved once per dataset,
    // like q46/q47's indexes — build cost lives in the index
    // lifecycle, not the per-query scan); training is deterministic,
    // so the oracle replays train+encode+ADC from the raw table in SQL
    // and still hash-matches ----
    "q70_knn_pq" -> ((s, d) =>
      pqIndexFor(s, d).query(ivfQueryVec(s, d), topK = 20,
        excludeId = Some(KnnQueryId))),

    // ---- PQ + exact rescore (FAISS refine): ADC ranks the compressed
    // corpus, only topK×4 full vectors are fetched by id for exact
    // cosine — the recall-recovery step of every PQ deployment ----
    "q71_knn_pq_rescored" -> ((s, d) =>
      pqIndexFor(s, d).query(ivfQueryVec(s, d), topK = 20,
        excludeId = Some(KnnQueryId),
        rescoreFrom = Some(Tables.embeddings(s, d)),
        oversample = PqOversample)),

    // ---- IVF-PQ (IVFADC, Jégou et al. §IV / FAISS IndexIVFPQ): the
    // canonical billion-scale composition — coarse k-means cells with
    // PQ-encoded RESIDUALS, probe 2 of 8 cells, per-cell ADC from the
    // query's own residual. The persisted code table is partitioned by
    // cluster, so the probe is pure partition pruning; both training
    // stages are the deterministic md5-sampled Lloyd pipeline, so the
    // oracle replays the whole build+probe+scan in SQL and
    // hash-matches the lossy ranking itself ----
    "q80_knn_ivfpq" -> ((s, d) =>
      ivfPqIndexFor(s, d).query(ivfQueryVec(s, d), topK = 20,
        nProbe = IvfPqNProbe, excludeId = Some(KnnQueryId))),

    // ---- IVF-PQ + exact rescore (FAISS refine) over the probed cells ----
    "q81_knn_ivfpq_rescored" -> ((s, d) =>
      ivfPqIndexFor(s, d).query(ivfQueryVec(s, d), topK = 20,
        nProbe = IvfPqNProbe, excludeId = Some(KnnQueryId),
        rescoreFrom = Some(Tables.embeddings(s, d)),
        oversample = PqOversample)),

    // ---- document clustering (SemDeDup-style curation primitive):
    // the same SQL-replayable k-means with one full-vector subspace ----
    "q77_kmeans_clusters" -> ((s, d) =>
      Retrieval.kmeansClusters(Tables.embeddings(s, d), k = 8)),

    // ---- centroid-silhouette audit of the q77 clustering: was k=8
    // right before SemDeDup trusts the cells ----
    "q279_silhouette" -> ((s, d) =>
      Retrieval.silhouette(Tables.embeddings(s, d), k = 8)),

    // ---- cluster-balanced diversity sampling: ≤10 vectors per
    // cluster in md5 order, cut through the bounded-heap operator ----
    "q78_diverse_sample" -> ((s, d) =>
      Retrieval.diverseSample(Tables.embeddings(s, d), k = 8, perCluster = 10)),

    // exact quadratic near-dup BASELINE: input capped like q31's pair
    // corpus so the all-pairs join stays bounded at every SF — the
    // uncapped corpus goes through q49's LSH-bucketed path instead
    "q22_near_dup_vectors" -> ((s, d) =>
      Dedup.embeddingNearDups(
        Tables.embeddings(s, d).filter(col("vec_id") < 500), 0.25)),

    // the 100 TB near-dup path: same verification, candidates from
    // sign-LSH buckets instead of all pairs
    "q49_near_dup_lsh" -> ((s, d) =>
      Dedup.embeddingNearDupsLsh(Tables.embeddings(s, d), 0.25)),

    "q23_label_centroids" -> ((s, d) =>
      Tables.embeddings(s, d)
        .select(col("label").cast("long").as("label"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos").cast("long").as("pos"))
        .agg(davg(col("v").cast("double")).as("centroid"))
        .orderBy("label", "pos")),

    // ---- fusion (A1–A3) + the flagship hybrid pipeline ----
    "q24_fusion_rrf" -> ((s, d) =>
      Fusion.rrf(hybridInputs(s, d), RrfK, FusionWeights, 20)),

    "q25_fusion_weighted" -> ((s, d) =>
      Fusion.weightedSum(hybridInputs(s, d), FusionWeights, 20)),

    "q26_fusion_normalized" -> ((s, d) =>
      Fusion.normalizedWeightedSum(hybridInputs(s, d), FusionWeights, 20)),

    "q27_hybrid_query" -> ((s, d) => hybridQuery(s, d)),

    // ---- the reference's T3 THREE-way hybrid (rag/retrieve/hybrid.py:
    // 279-313): vector ∪ keyword ∪ graph-semantic legs RRF-fused. The
    // graph leg scores STORED vertex embeddings (q45's cached encode) so
    // the whole union is scan+rank work — no per-query encoding ----
    "q59_fusion_three_way" -> ((s, d) => {
      val graph = GraphOps.semanticQuery(
        vertexEmbeddingsFor(s, d),
        pipeline.Md5SignEncoder().encodeOne(GraphQueryText), 50)
        .select(col("id"), col("score"))
        .withColumn("store_type", lit("graph"))
      Fusion.rrf(hybridInputs(s, d).unionByName(graph), RrfK, ThreeWayWeights, 20)
    }),

    // ---- the MemFuse.query fusion/freshness knobs, facade-shaped and
    // oracle-checked: NON-RRF (weighted-sum) fusion with the K11 recency
    // boost multiplied into the fused scores (reference applies the
    // boost inside hybrid retrieval, rag/retrieve/hybrid.py:517-562, and
    // selects the strategy via ScoreFusionStrategy, strategies.py:11-28).
    // Documents carry a deterministic created_at (one hour per doc id),
    // so only docs within 24h of the corpus max get boosted — both
    // branches of the max(0, ...) cutoff are exercised ----
    "q65_fusion_boosted" -> ((s, d) => {
      val fused = Fusion.weightedSum(hybridInputs(s, d), FusionWeights, 40)
      val docs = Tables.documents(s, d).withColumn("created_at",
        timestamp_seconds(lit(FreshBaseEpoch) + col("doc_id") * 3600L))
      val maxTs = docs.agg(max(unix_micros(col("created_at"))).as("max_us"))
      fused.join(docs, fused("id") === docs("doc_id"))
        .crossJoin(broadcast(maxTs))
        .select(col("id"),
          EventOps.boostedScore(col("fused_score"),
            unix_micros(col("created_at")), col("max_us"), FreshBoost)
            .as("boosted_score"),
          col("lang"), col("source"))
        .orderBy(col("boosted_score").desc, col("id"))
    }),

    // ---- CCNet-style LM-quality proxy: mean unigram NLL per document
    // under the corpus's own distribution (the perplexity-filter slot
    // of every pretraining recipe; Wenzek et al.) ----
    "q66_unigram_nll" -> ((s, d) =>
      TextAnalysis.unigramLogProb(Tables.documents(s, d))),

    // ---- the next rung of the perplexity-filter ladder: interpolated
    // BIGRAM NLL (λ·p(w|prev) + (1−λ)·p(w)) under the corpus's own
    // counts — row-local pair expansion, vocab-sized count tables ----
    "q85_bigram_nll" -> ((s, d) =>
      TextAnalysis.bigramLogProb(Tables.documents(s, d))),

    // ---- TF-IDF keyword extraction, per-doc top-3 through the
    // bounded-heap TopKPerKey operator (no corpus-wide window sort) ----
    "q67_tfidf_keywords" -> ((s, d) =>
      TextAnalysis.tfidfKeywords(Tables.documents(s, d), topK = 3)),

    // ---- token-balanced contiguous export sharding: two-phase
    // distributed prefix sum (per-partition sums → driver prefix scan →
    // offset-seeded running totals) — the scalable stand-in for the
    // single-partition window cumsum Spark would otherwise plan ----
    "q68_token_shards" -> ((s, d) =>
      TextAnalysis.shardByTokens(Tables.documents(s, d), targetTokens = 20000L)),

    // ---- GPT-style fixed-block packing: the corpus's token stream cut
    // every 2048, documents SPLITTING across block boundaries (q75
    // packs whole docs; this is what next-token pretraining consumes).
    // Prefix-sum offsets + row-local block expansion, one exchange ----
    "q86_block_pack" -> ((s, d) =>
      TextAnalysis.packBlocks(Tables.documents(s, d), blockTokens = 2048L)),

    // ---- the same packer after a SEEDED GLOBAL SHUFFLE (md5 order) —
    // real pretraining packs shuffled, since adjacent source docs
    // correlate; the permutation is engine-reproducible so the oracle
    // replays it ----
    "q87_block_pack_shuffled" -> ((s, d) =>
      TextAnalysis.packBlocksShuffled(Tables.documents(s, d),
        blockTokens = 1024L, seed = "epoch0")),

    // ---- cohort retention triangle: users bucketed by first-active
    // epoch day, distinct-active counts per (cohort, day offset) ----
    "q94_retention_cohorts" -> ((s, d) =>
      EventOps.retentionCohorts(Tables.events(s, d))),

    // ---- count–min sketch heavy hitters: the exact top-20 terms with
    // their CMS upper-bound estimates from a 4×256 md5-hashed counter
    // table (mergeable per shard; est ≥ cnt always) ----
    "q95_cms_heavy_hitters" -> ((s, d) => {
      // one tokenize scan feeds sketch AND exact top-k (lineage cut)
      val toks = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("term"))
        .localCheckpoint()
      val sketch = Sketches.cmsSketch(toks, col("term"))
      val top = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("term")).limit(20)
      Sketches.cmsEstimate(sketch, top)
        .orderBy(col("cnt").desc, col("term"))
    }),

    // ---- DSIR data selection: non-English docs scored by the hashed-
    // unigram log importance ratio toward the English target slice ----
    "q96_dsir_weights" -> ((s, d) =>
      TextAnalysis.dsirWeights(Tables.documents(s, d), col("lang") === "en")),

    // ---- 8-bit scalar-quantized KNN: reconstructed-vector cosine
    // ranking vs the full-precision query (asymmetric distance) ----
    "q97_sq8_knn" -> ((s, d) =>
      Retrieval.sq8TopK(Tables.embeddings(s, d), queryId = IvfQueryId, topK = 10)),

    // ---- weighted sampling without replacement (Efraimidis–Spirakis):
    // 50 docs drawn ∝ n_chars via the deterministic ln(u)/w key ----
    "q100_weighted_sample" -> ((s, d) =>
      TextAnalysis.weightedSample(Tables.documents(s, d), "doc_id",
        col("n_chars"), k = 50)),

    // ---- ROLLUP report: pricing summary at (flag, status), per-flag
    // subtotals and the grand total in one pass (partial aggregation
    // handles all three grouping sets in a single shuffle) ----
    "q101_rollup_report" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), xsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)),

    // ---- per-nation customer spend quartiles: users-sized aggregate,
    // then ntile(4) co-partitioned by nation ----
    "q102_spend_quartiles" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val spend = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"),
          col("c_nationkey").cast("long").as("c_nationkey"))
        .agg(xsum(col("o_totalprice")).as("spend"))
      spend.withColumn("quartile",
        ntile(4).over(Window.partitionBy("c_nationkey")
          .orderBy(col("spend").desc, col("c_custkey"))).cast("long"))
        .select(col("c_custkey"), col("c_nationkey"), col("spend"), col("quartile"))
        .orderBy("c_custkey")
    }),

    // ---- exact Pearson correlation per group: the textbook moment
    // formula over scaled-long exact sums (psum6 splits the big
    // products into hi/lo/frac long accumulators — no per-row decimal
    // cast) — engine-exact where the built-in corr's running doubles
    // drift with partitioning ----
    "q103_price_correlation" -> ((s, d) => {
      val (x, y) = (col("l_quantity"), col("l_extendedprice"))
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          psum6(x * y).as("sxy"), xsum(x).as("sx"), xsum(y).as("sy"),
          psum6(x * x).as("sxx"), psum6(y * y).as("syy"))
        .select(col("l_returnflag"), col("n"),
          trunc6((col("n").cast("double") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n").cast("double") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n").cast("double") * col("syy") - col("sy") * col("sy"))))
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // ---- fixed-width histogram of the event value distribution:
    // row-local binning, one map-side-combinable groupBy ----
    "q104_value_histogram" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(floor(col("value") / lit(50.0)).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"), xsum(col("value")).as("bin_sum"))
        .orderBy("bin")),

    // ---- image-header dimension extraction from REAL byte layouts
    // (RFC 2083 PNG IHDR, ISO 10918 JPEG SOFn scan, GIF screen
    // descriptor): bytes are synthesized with planted sizes, so the
    // oracle states the plant and any parser bug breaks the match ----
    "q111_image_dims" -> ((s, d) => {
      val w = (lit(100L) + pmod(col("doc_id"), lit(900L)))
      val h = (lit(50L) + pmod(col("doc_id"), lit(500L)))
      val be32 = (c: org.apache.spark.sql.Column) => lpad(hex(c), 8, "0")
      val be16 = (c: org.apache.spark.sql.Column) => lpad(hex(c), 4, "0")
      val le16 = (c: org.apache.spark.sql.Column) =>
        concat(substring(be16(c), 3, 2), substring(be16(c), 1, 2))
      val hexStr = when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit("89504E470D0A1A0A0000000D49484452"),
            be32(w), be32(h), lit("0806000000")))
        .when(pmod(col("doc_id"), lit(3)) === 1,
          // SOI | APP0 (skipped by length) | SOF0 | precision+dims
          concat(lit("FFD8FFE000040000FFC0001108"), be16(h), be16(w), lit("03")))
        .otherwise(concat(lit("474946383961"), le16(w), le16(h), lit("F70000")))
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.MediaFunctions.imageDims(unhex(hexStr)).as("dims"))
        .select(col("doc_id"), col("dims.format").as("format"),
          col("dims.width").cast("long").as("width"),
          col("dims.height").cast("long").as("height"))
        .orderBy("doc_id")
    }),

    // ---- WAV/RIFF audio metadata from the real container layout:
    // fmt-chunk channels/rate, data-size → sample-frame count ----
    "q112_audio_meta" -> ((s, d) => {
      val ch = lit(1L) + pmod(col("doc_id"), lit(2L))
      val rate = lit(8000L) * (lit(1L) + pmod(col("doc_id"), lit(3L)))
      val frames = lit(1L) + pmod(col("doc_id"), lit(1000L))
      val block = ch * lit(2L)
      val dataSize = frames * block
      val le16 = (c: org.apache.spark.sql.Column) => {
        val x = lpad(hex(c), 4, "0")
        concat(substring(x, 3, 2), substring(x, 1, 2))
      }
      val le32 = (c: org.apache.spark.sql.Column) => {
        val x = lpad(hex(c), 8, "0")
        concat(substring(x, 7, 2), substring(x, 5, 2),
          substring(x, 3, 2), substring(x, 1, 2))
      }
      val hexStr = concat(lit("52494646"), le32(lit(36L) + dataSize),
        lit("57415645"), lit("666D7420"), lit("10000000"), lit("0100"),
        le16(ch), le32(rate), le32(rate * block), le16(block),
        le16(lit(16L)), lit("64617461"), le32(dataSize))
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.MediaFunctions.wavMeta(unhex(hexStr)).as("m"))
        .select(col("doc_id"),
          col("m.channels").cast("long").as("channels"),
          col("m.sample_rate").cast("long").as("sample_rate"),
          col("m.n_samples").as("n_samples"))
        .orderBy("doc_id")
    }),

    // ---- MP4 movie duration from the real ISO-BMFF box layout:
    // ftyp skipped, moov scanned to mvhd, timescale/duration read ----
    "q113_video_meta" -> ((s, d) => {
      val timescale = lit(1000L) * (lit(1L) + pmod(col("doc_id"), lit(3L)))
      val duration = lit(1L) + pmod(col("doc_id"), lit(100000L))
      val be32 = (c: org.apache.spark.sql.Column) => lpad(hex(c), 8, "0")
      val hexStr = concat(
        lit("0000001066747970" + "69736F6D" + "00000000"), // ftyp
        lit("000000246D6F6F76"), // moov, one child
        lit("0000001C6D766864" + "00000000" + "00000000" + "00000000"),
        be32(timescale), be32(duration))
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.MediaFunctions.mp4Meta(unhex(hexStr)).as("m"))
        .select(col("doc_id"), col("m.timescale").as("timescale"),
          col("m.duration").as("duration"))
        .orderBy("doc_id")
    }),

    // ---- epoch-0 gradient of the distributed LR quality classifier:
    // at w=0 the sigmoid is exactly 0.5, so the full-batch gradient is
    // transcendental-free and replays in SQL (the trained weights are
    // spec-pinned against a local reference, the q84-BPE design) ----
    "q108_lr_grad_stats" -> ((s, d) =>
      TextAnalysis.lrEpoch0Grad(Tables.documents(s, d), col("lang") === "en")),

    // ---- Naive Bayes language classifier (the fasttext slot):
    // training IS counting, so train+score replays exactly in SQL ----
    "q107_naive_bayes" -> ((s, d) =>
      TextAnalysis.naiveBayesLang(Tables.documents(s, d))),

    // ---- trailing-7-day distinct actives (the WAU curve): the
    // user-day grid fans out row-locally, no day-band self-join ----
    "q105_rolling_actives" -> ((s, d) =>
      EventOps.rollingDistinctUsers(Tables.events(s, d), windowDays = 7)),

    // ---- mergeable HLL cardinality sketch (corpus profiling without a
    // corpus-sized distinct shuffle): distinct documents per language,
    // 64 registers, exact-integer harmonic sum — deterministic in any
    // engine, unlike approx_count_distinct's private sketch ----
    "q72_hll_distinct" -> ((s, d) =>
      operators.Sketches.hllDistinct(
        Tables.documents(s, d), Seq("lang"), col("text"))),

    // ---- exact token-length quantiles per language (the corpus length
    // distribution report) — percentile_cont interpolation spelled out
    // so both engines run identical IEEE ops ----
    "q73_length_quantiles" -> ((s, d) =>
      TextAnalysis.lengthQuantiles(Tables.documents(s, d))),

    // ---- sequence packing: the cleaned corpus concatenated into
    // ~2048-token training rows via the distributed prefix sum ----
    "q75_pack_sequences" -> ((s, d) =>
      TextAnalysis.packSequences(Tables.documents(s, d), seqTokens = 2048L)),

    // ---- temperature-weighted mixing (α = 0.7): keep-rates make the
    // expected mixture follow n^α shares, biggest stratum at 1.0; the
    // keep decision is the md5-threshold row predicate ----
    "q76_temperature_mix" -> ((s, d) =>
      TextAnalysis.temperatureMix(Tables.documents(s, d), "lang", alpha = 0.7)
        .select("doc_id", "lang", "rate")),

    // ---- the whole export pipeline as ONE plan: clean (q63's recipe)
    // → temperature mix (α = 0.7 over the guessed language) → pack
    // into ~1024-token training rows. Every stage is the already-
    // oracle-checked operator; the composition is what a user ships ----
    "q79_training_export" -> ((s, d) =>
      TextAnalysis.trainingExport(docsWithCopies(s, d),
        Oracles.LangMarkers, CleanSpec, alpha = 0.7, seqTokens = 1024L)),

    // ---- dedup family ----
    "q28_dedup_exact" -> ((s, d) =>
      Dedup.exact(docsWithCopies(s, d), ordered = true)),

    // ---- passage-level dedup with reassembly (RefinedWeb/CCNet): drop
    // every 20-token passage duplicated anywhere in the corpus (first
    // occurrence wins), rebuild documents from the survivors — the cut
    // runs through the bounded-heap TopKPerKey operator with k=1 ----
    "q69_paragraph_dedup" -> ((s, d) =>
      Dedup.paragraphDedup(docsWithCopies(s, d), paraTokens = 20,
        ordered = true)),

    "q29_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLsh(docsWithNearDups(s, d),
        shingleSize = 3, bands = 4, rowsPerBand = 2, jaccardThreshold = 0.5,
        ordered = true)),

    // ---- the verify-free signature-agreement estimator over the same
    // banded candidates: Ĵ = matching minhash positions / 8 — what the
    // 100 TB path scores with when re-reading text is the cost ----
    "q106_minhash_estimate" -> ((s, d) =>
      Dedup.minhashEstimatePairs(docsWithNearDups(s, d),
        shingleSize = 3, bands = 4, rowsPerBand = 2, ordered = true)),

    // ---- incremental dedup (the daily-ingest flow): a new batch of 50
    // exact copies + 50 near-dups + 100 genuinely-new docs deduped
    // against a 300-doc corpus — exact hash join, then new-vs-corpus
    // band candidates only (cost ∝ batch, never corpus × corpus) ----
    "q74_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val corpus = docs.filter(col("doc_id") < 300)
      val batch = docs.filter(col("doc_id") < 50)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))
        .unionByName(docs.filter(col("doc_id") >= 50 && col("doc_id") < 100)
          .select((col("doc_id") + 20000).as("doc_id"),
            expr("substring(text, instr(text, ' ') + 1)").as("text")))
        .unionByName(docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
          .select((col("doc_id") + 30000).as("doc_id"), col("text")))
      Dedup.incrementalDedup(batch, corpus,
        shingleSize = 3, bands = 4, rowsPerBand = 2, jaccardThreshold = 0.5)
    }),

    "q30_simhash" -> ((s, d) =>
      Dedup.simhash(Tables.documents(s, d), bits = 16, ordered = true)),

    "q31_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardPairs(
        docsWithNearDups(s, d).filter(col("doc_id") < 100 ||
          (col("doc_id") >= 10000 && col("doc_id") < 10100)),
        n = 3, threshold = 0.5, ordered = true)),

    // ---- exact duplicated-span detection + removal (substring dedup,
    // Lee et al. 2022 suffix-array semantics re-shaped as one shingle
    // shuffle + per-doc run merge): maximal >=8-token spans occurring
    // >=2 times corpus-wide, then the keep-first cleaning pass ----
    "q322_dup_spans" -> ((s, d) =>
      Dedup.duplicatedSpans(
        docsWithNearDups(s, d).filter(col("doc_id") < 100 ||
          (col("doc_id") >= 10000 && col("doc_id") < 10100)), k = 8)),
    // ordered = true ONLY here: the oracle hash needs the total order;
    // the operator default skips the global sort (r11 verdict #4)
    "q323_dup_span_removal" -> ((s, d) =>
      Dedup.spanRemoval(
        docsWithNearDups(s, d).filter(col("doc_id") < 100 ||
          (col("doc_id") >= 10000 && col("doc_id") < 10100)), k = 8,
        ordered = true)),
    // incremental shape: a new batch scanned against the committed
    // corpus's distinct-shingle set (one semi-join) + itself
    "q324_incremental_spans" -> ((s, d) =>
      Dedup.incrementalSpans(
        docsWithNearDups(s, d).filter(col("doc_id") >= 10000 &&
          col("doc_id") < 10100),
        Tables.documents(s, d).filter(col("doc_id") < 100)
          .select("doc_id", "text"), k = 8)),
    "q325_duplication_report" -> ((s, d) =>
      Dedup.duplicationReport(
        docsWithNearDups(s, d).filter(col("doc_id") < 100 ||
          (col("doc_id") >= 10000 && col("doc_id") < 10100)), k = 8)),
    // index-backed incremental form: the SAME batch scanned against a
    // PERSISTED corpus shingle index (one semi-join, no corpus re-scan);
    // the oracle is q324's recompute SQL verbatim, so a green row IS the
    // hash-for-hash equivalence of the two formulations
    "q326_incremental_spans_indexed" -> ((s, d) =>
      Dedup.incrementalSpansIndexed(
        docsWithNearDups(s, d).filter(col("doc_id") >= 10000 &&
          col("doc_id") < 10100),
        Dedup.shingleIndex(Tables.documents(s, d).filter(col("doc_id") < 100)
          .select("doc_id", "text"), k = 8), k = 8)),
    // Bloom-prefiltered twin of q326 (the extreme-corpus shape): the
    // batch probes a Bloom snapshot of the index key set map-side, the
    // exact confirm kills false positives — same oracle as q324/q326,
    // so a green row IS the exactness of the prefiltered path
    "q329_incremental_spans_bloom" -> ((s, d) => {
      val idx = Dedup.shingleIndex(
        Tables.documents(s, d).filter(col("doc_id") < 100)
          .select("doc_id", "text"), k = 8)
      Dedup.incrementalSpansBloom(
        docsWithNearDups(s, d).filter(col("doc_id") >= 10000 &&
          col("doc_id") < 10100),
        idx, Dedup.shingleIndexBloom(idx), k = 8)
    }),
    // SHARDED-Bloom twin of q329 (the form that survives extreme corpus
    // sizes: per-key-shard filters stored as a table, probed via a
    // batch-keys shuffle — no driver-resident array, no broadcast of the
    // snapshot). Same oracle as q324/q326/q329, so a green row IS the
    // exactness of the sharded path.
    "q330_incremental_spans_bloom_sharded" -> ((s, d) => {
      val idx = Dedup.shingleIndex(
        Tables.documents(s, d).filter(col("doc_id") < 100)
          .select("doc_id", "text"), k = 8)
      Dedup.incrementalSpansBloomSharded(
        docsWithNearDups(s, d).filter(col("doc_id") >= 10000 &&
          col("doc_id") < 10100),
        idx, Dedup.shingleIndexBloomShards(idx, shards = 16), k = 8)
    }),
    // LSH banding operating-point sweep on a bounded audit slice
    // (first 100 docs + their near-dups): recall vs candidate cost at
    // every (bands, rowsPerBand) split of one 8-function signature
    // matrix, scored against exact all-pairs Jaccard truth — the
    // tuning-as-data convention (q316/q317/q320/q321) applied to the
    // q29 operator's own knob
    "q331_lsh_banding_sweep" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 100)
        .select("doc_id", "text")
      val slice = docs.unionByName(docs.select(
        (col("doc_id") + 10000).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text")))
      Dedup.lshBandingSweep(slice, shingleSize = 3, numHashes = 8,
        bandCounts = Seq(1, 2, 4, 8), jaccardThreshold = 0.5)
    }),
    // hashed-key twin of q322: xxhash64'd fixed-width shingle shuffle
    // keys (the 100 TB key shape) checked against the TEXT oracle — a
    // green row pins span-identity of the two key representations on
    // this corpus (OperatorSpec additionally asserts collision-freedom)
    "q327_dup_spans_hashed" -> ((s, d) =>
      Dedup.duplicatedSpans(
        docsWithNearDups(s, d).filter(col("doc_id") < 100 ||
          (col("doc_id") >= 10000 && col("doc_id") < 10100)),
        k = 8, hashKeys = true)),

    // ---- per-label centroid-similarity outlier scoring: every vector
    // cosine-scored against its own class centroid (decimal-widened
    // means; the scan is row-local against literal centroids) ----
    "q98_centroid_outliers" -> ((s, d) =>
      Retrieval.centroidOutliers(Tables.embeddings(s, d))),

    // ---- PageRank over the near-dup doc graph (q31's pairs,
    // symmetrized): 5 iterations, d = 0.85, per-vertex sums decimal-
    // widened so the iteration replays exactly in SQL ----
    "q99_pagerank" -> ((s, d) =>
      GraphOps.pageRank(nearDupPairEdges(s, d), iters = 5)
        .select(col("v").as("doc_id"), col("rank"))
        .orderBy("doc_id")),

    // ---- deterministic label propagation on the same graph: 3 rounds,
    // (count desc, label) argmax — communities of near-dup families ----
    "q109_label_propagation" -> ((s, d) =>
      GraphOps.labelPropagation(nearDupPairEdges(s, d), rounds = 3)
        .select(col("v").as("doc_id"), col("label"))
        .orderBy("doc_id")),

    // ---- triangle count via the ordered-wedge join ----
    "q110_triangle_count" -> ((s, d) =>
      GraphOps.triangleCount(nearDupPairEdges(s, d))),

    // ---- DDSketch mergeable quantiles: relative-error buckets, one
    // map-side-combinable groupBy, no corpus sort ----
    "q114_ddsketch_quantiles" -> ((s, d) =>
      Sketches.ddSketchQuantiles(Tables.lineitem(s, d), Seq("l_returnflag"),
        col("l_extendedprice"), Seq(0.5, 0.9, 0.99))),

    // ---- zero-filled daily resample per event_type ----
    "q115_gap_fill_daily" -> ((s, d) =>
      EventOps.gapFillDaily(Tables.events(s, d))),

    // ---- per-user z-score outliers from exact moment sums ----
    "q116_zscore_anomalies" -> ((s, d) =>
      EventOps.zscoreAnomalies(Tables.events(s, d), threshold = 2.5)),

    // ---- blocked fuzzy entity matching over part names ----
    "q117_fuzzy_name_pairs" -> ((s, d) =>
      Joins.fuzzyBlockedPairs(Tables.part(s, d), "p_name", maxDist = 3)),

    // ---- containment dedup: catches prefix/subset duplication that
    // Jaccard structurally under-scores ----
    "q118_containment_pairs" -> ((s, d) =>
      Dedup.containmentPairs(
        docsWithPrefixCopies(s, d).filter(col("doc_id") < 100 ||
          (col("doc_id") >= 10000 && col("doc_id") < 10100)),
        n = 3, threshold = 0.9, ordered = true)),

    // ---- per-language top-k collocations via the bounded-heap cut ----
    "q119_top_bigrams_lang" -> ((s, d) =>
      TextAnalysis.topBigramsPerLang(Tables.documents(s, d), topK = 5)),

    // ---- Johnson–Lindenstrauss ±1 projection, 64 → 16 dims ----
    "q120_random_projection" -> ((s, d) =>
      Retrieval.randomProject(Tables.embeddings(s, d), outDim = 16)),

    // ---- exact covariance matrix of the embedding dims (PCA input) ----
    "q121_covariance_matrix" -> ((s, d) =>
      Retrieval.covarianceMatrix(Tables.embeddings(s, d))),

    // ---- CUBE rollup: all four grouping sets in one pass ----
    "q122_cube_report" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"), xsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))),

    // ---- pivoted cross-tab: order priority × return flag ----
    "q123_pivot_returnflag" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(xsum(col("l_quantity")))
        .orderBy("o_orderpriority")),

    // ---- per-user inter-arrival gap profile (exact integer µs) ----
    "q124_session_gaps" -> ((s, d) =>
      EventOps.sessionGaps(Tables.events(s, d))),

    // ---- PPJoin prefix-filtered set-similarity join: lossless
    // candidate pruning (rarest-first prefixes), verified equal to the
    // naive all-pairs join by the oracle itself ----
    "q127_prefix_filter_jaccard" -> ((s, d) =>
      Dedup.prefixFilterJaccardPairs(
        docsWithNearDups(s, d).filter(col("doc_id") < 100 ||
          (col("doc_id") >= 10000 && col("doc_id") < 10100)),
        threshold = 0.8)),

    // ---- join-key skew profile: the pre-flight report that decides
    // salting / AQE skew handling ----
    "q128_key_skew_profile" -> ((s, d) =>
      SkewOps.keyProfile(Tables.lineitem(s, d), "l_partkey", topN = 20)),

    // ---- per-doc novelty: fraction of shingles unseen in earlier
    // docs — two passes over the gram table, no pair join ----
    "q129_novelty_score" -> ((s, d) =>
      Dedup.noveltyScores(
        docsWithNearDups(s, d).filter(col("doc_id") < 100 ||
          (col("doc_id") >= 10000 && col("doc_id") < 10100)), n = 3)),

    // ---- percent_rank / cume_dist within priority (window coverage) ----
    "q130_percent_rank" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("pr", trunc6(percent_rank().over(w)))
        .withColumn("cd", trunc6(cume_dist().over(w)))
        .filter(col("o_orderkey") % 100 === 0)
        .select("o_orderkey", "o_orderpriority", "pr", "cd")
        .orderBy("o_orderkey")
    }),

    // ---- matryoshka-truncated KNN: first-16-dim coarse scan ----
    "q131_matryoshka_knn" -> ((s, d) =>
      Retrieval.cosineKnnTruncated(Tables.embeddings(s, d),
        queryId = KnnQueryId, topK = 10, dims = 16)),

    // ---- per-group OLS fit from the exact moment sums ----
    "q132_ols_by_flag" -> ((s, d) => {
      val (x, y) = (col("l_quantity"), col("l_extendedprice"))
      val nD = col("n").cast("double")
      val slope = (nD * col("sxy") - col("sx") * col("sy")) /
        (nD * col("sxx") - col("sx") * col("sx"))
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          psum6(x * y).as("sxy"), xsum(x).as("sx"), xsum(y).as("sy"),
          psum6(x * x).as("sxx"))
        .select(col("l_returnflag"), col("n"),
          trunc6(slope).as("slope"),
          trunc6((col("sy") - slope * col("sx")) / nD).as("intercept"))
        .orderBy("l_returnflag")
    }),

    // ---- lexical-diversity gate: per-doc token entropy ----
    "q133_token_entropy" -> ((s, d) =>
      TextAnalysis.tokenEntropy(Tables.documents(s, d))),

    // ---- cross-source duplication matrix: |sources|²-bounded, gram
    // sets deduped per source before the join ----
    "q135_source_overlap" -> ((s, d) =>
      Dedup.sourceOverlap(Tables.documents(s, d), n = 3)),

    // ---- deterministic doc-level train/val/test split report ----
    "q138_dataset_split" -> ((s, d) => {
      val u = (md5Long(concat(lit("split|"), col("doc_id").cast("string")))
        % 1000000L).cast("double") / lit(1e6)
      Tables.documents(s, d)
        .withColumn("split",
          when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(tokens(col("text")))).cast("long").as("n_tokens"))
        .orderBy("split")
    }),

    // ---- leakage-safe split: assignment per duplicate CLUSTER, so a
    // held-out doc's near-copies can't land in train ----
    "q139_leakage_safe_split" -> ((s, d) =>
      Dedup.leakageSafeSplit(docsWithDupFamilies(s, d), dupLabelsFor(s, d))),

    // ---- one-pass column profiling report (null/distinct/bounds) ----
    "q140_profile_orders" -> ((s, d) =>
      Profile.tableProfile(Tables.orders(s, d),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
          "o_orderpriority"))),

    // ---- the 100 TB profile twin of q140: every column's distinct
    // count from ONE sketch pass (per-column HLL registers keyed by
    // col_name — mergeable, no multi-distinct expand) ----
    "q188_profile_sketched" -> ((s, d) =>
      Profile.tableProfileSketched(Tables.orders(s, d),
        Seq("o_custkey", "o_orderkey", "o_orderpriority", "o_orderstatus"))),

    // ---- point-in-time lookup against the q185 SCD2 dimension: each
    // event joins the version valid AT ITS TIMESTAMP (user-keyed
    // equi-join + range predicate — co-partitioned, never a band-only
    // cross product), rolled up per user-version ordinal ----
    "q189_scd2_lookup" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val dim = pipeline.TableOps.scd2(
        Tables.events(s, d).select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id")),
        key = "user_id", attrs = Seq("event_type"),
        tsCol = "ts_us", tieCol = "event_id")
        .withColumn("version_rank", row_number().over(
          Window.partitionBy("user_id").orderBy("valid_from")).cast("long"))
      val ev = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      ev.join(dim, ev("user_id") === dim("user_id") &&
          ev("ts_us") >= dim("valid_from") &&
          (dim("valid_to").isNull || ev("ts_us") < dim("valid_to")))
        .groupBy(col("version_rank"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(ev("user_id")).as("n_users"))
        .orderBy("version_rank")
    }),

    // ---- Benford first-digit audit of order totals: the fraud /
    // data-quality screen — observed leading-digit frequencies against
    // ln(1+1/d)/ln(10), expectations pinned driver-side ----
    "q190_benford" -> ((s, d) => {
      val x = col("o_totalprice")
      val e10 = floor(log(x) / log(lit(10.0))).cast("double")
      val digit = floor(x / pow(lit(10.0), e10)).cast("long")
      val expected = (1 to 9).map(dd =>
        dd.toLong -> math.log(1.0 + 1.0 / dd) / math.log(10.0))
      val expCol = expected.tail.foldLeft(
        when(col("digit") === expected.head._1, lit(expected.head._2))) {
        case (acc, (dd, f)) => acc.when(col("digit") === dd, lit(f))
      }
      val counts = Tables.orders(s, d).filter(x > lit(0.0))
        .select(digit.as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val total = counts.agg(sum(col("n")).as("n_total"))
      counts.crossJoin(total)
        .select(col("digit"), col("n"),
          trunc6(col("n").cast("double") / col("n_total").cast("double"))
            .as("obs_freq"),
          trunc6(expCol).as("benford_freq"))
        .orderBy("digit")
    }),

    // ---- exact multi-quantiles per group from ONE window sort: the
    // ddQuantiles rank convention (max(1, ⌈q·n⌉)) joined back against
    // the ranked frame — the exact twin of q114 at arbitrary probes ----
    "q192_exact_quantiles" -> ((s, d) =>
      Stats.exactQuantilesPerKey(Tables.lineitem(s, d), "l_returnflag",
        "l_extendedprice", Seq(0.25, 0.5, 0.75, 0.95))),

    // ---- per-user z-score outlier report: moments in one pass
    // (scaled-long exact), z computed row-local after a user-keyed
    // join — the monitoring screen before any threshold alert ----
    "q193_zscore_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("value"))
      val m = ev.groupBy("user_id").agg(count(lit(1)).as("n"),
        xsum(col("value")).as("sx"), psum6(col("value") * col("value")).as("sxx"))
      val nD = col("n").cast("double")
      val mu = col("sx") / nD
      val sd = sqrt(col("sxx") / nD - mu * mu)
      val z = (col("value") - mu) / sd
      ev.join(m, "user_id")
        .select(col("user_id"), col("n"), z.as("z"))
        .groupBy("user_id")
        .agg(max(col("n")).as("n_events"),
          count(when(abs(col("z")) > lit(3.0), 1)).as("n_outliers"),
          trunc6(max(abs(col("z")))).as("max_abs_z"))
        .orderBy("user_id")
    }),

    // ---- join-key skew report: the pre-flight that decides salting /
    // AQE skew handling — key count, hottest key, exact mean
    // frequency and the max/mean skew ratio in two tiny aggs ----
    "q194_skew_report" -> ((s, d) => {
      val counts = Tables.lineitem(s, d).groupBy("l_partkey")
        .agg(count(lit(1)).as("n"))
      counts.agg(count(lit(1)).as("n_keys"), max(col("n")).as("max_n"),
          sum(col("n")).as("total"))
        .select(col("n_keys"), col("max_n"),
          trunc6(col("total").cast("double") / col("n_keys").cast("double"))
            .as("avg_n"),
          trunc6(col("max_n").cast("double") * col("n_keys").cast("double") /
            col("total").cast("double")).as("skew_ratio"))
    }),

    // ---- Gini coefficient of the term-frequency distribution: corpus
    // concentration in one number (0 = uniform vocabulary use, →1 = a
    // few terms own the corpus). One vocabulary-sized sort + window:
    // G = 2·Σ(i·x_i) / (n·Σx) − (n+1)/n over ascending counts ----
    "q195_term_gini" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.documents(s, d)
        .select(explode(tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("n"))
      val w = Window.orderBy(col("n"), col("term"))
      tf.withColumn("i", row_number().over(w).cast("long"))
        .agg(count(lit(1)).as("n_terms"), sum(col("n")).as("total"),
          sum(col("i") * col("n")).as("weighted"))
        .select(col("n_terms"), col("total"),
          trunc6(lit(2.0) * col("weighted").cast("double") /
            (col("n_terms").cast("double") * col("total").cast("double")) -
            (col("n_terms") + lit(1L)).cast("double") /
              col("n_terms").cast("double")).as("gini"))
    }),

    // ---- Heaps'-law vocabulary growth: cumulative distinct terms vs
    // cumulative tokens at every 100th doc — each term credits its
    // FIRST document (one groupBy min), then two running sums over the
    // doc order give the whole curve without any per-checkpoint
    // distinct-count ----
    "q196_vocab_growth" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toksDf = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      val firstSeen = toksDf.groupBy("term").agg(min(col("doc_id")).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("new_terms"))
      val tokCount = toksDf.groupBy("doc_id").agg(count(lit(1)).as("n_toks"))
      val w = Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tokCount.join(firstSeen, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_toks"),
          coalesce(col("new_terms"), lit(0L)).as("new_terms"))
        .withColumn("cum_tokens", sum(col("n_toks")).over(w))
        .withColumn("cum_vocab", sum(col("new_terms")).over(w))
        .filter(col("doc_id") % 100 === 0)
        .select(col("doc_id"), col("cum_tokens"), col("cum_vocab"))
        .orderBy("doc_id")
    }),

    // ---- top collocations by PMI (Church–Hanks): one product-form ln
    // over bigram/unigram counts, min-count floor against rare-pair
    // noise ----
    "q197_pmi_collocations" -> ((s, d) =>
      TextAnalysis.pmiCollocations(Tables.documents(s, d))),

    // ---- Jensen–Shannon drift between corpus halves: the
    // dataset-shift number checked before mixing a new crawl in ----
    "q198_corpus_divergence" -> ((s, d) =>
      TextAnalysis.corpusDivergence(Tables.documents(s, d),
        (col("doc_id") % 2).cast("int"))),

    // ---- per-language distinguishing terms: Monroe log-odds with an
    // informative Dirichlet prior, variance-priced z-scores ----
    "q199_fightin_words" -> ((s, d) =>
      TextAnalysis.fightinWords(Tables.documents(s, d), "lang")),

    // ---- first/last-touch conversion attribution: both models off
    // one ignore-nulls window pass ----
    "q200_attribution" -> ((s, d) =>
      EventOps.attribution(Tables.events(s, d))),

    // ---- peak concurrent sessions per day: gap-sessionize + sweep
    // line over ±1 boundary points ----
    "q201_session_concurrency" -> ((s, d) =>
      EventOps.sessionConcurrency(Tables.events(s, d), 3600L)),

    // ---- robust outliers per flag: exact median/MAD modified z-score
    // (Iglewicz–Hoaglin), immune to the outliers it hunts ----
    "q202_mad_outliers" -> ((s, d) =>
      Profile.madOutliers(Tables.lineitem(s, d), "l_returnflag",
        "l_extendedprice")),

    // ---- Poisson-bootstrap CI for the mean order value: the
    // resampling scheme that distributes (row-local Poisson(1)
    // weights, one aggregation per scan) ----
    "q203_poisson_bootstrap" -> ((s, d) =>
      Stats.poissonBootstrap(Tables.orders(s, d), "o_totalprice",
        "o_orderkey")),

    // ---- two-sample KS test: urgent vs low-priority order values,
    // exact D over distinct values + Smirnov critical value ----
    "q204_ks_test" -> ((s, d) =>
      Stats.ksTest(
        Tables.orders(s, d)
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW")),
        "o_totalprice", col("o_orderpriority") === "1-URGENT",
        KsC05)),

    // ---- market-basket rules: support/confidence/lift over parts
    // co-ordered, top-k by lift ----
    "q205_association_rules" -> ((s, d) =>
      Stats.associationRules(Tables.lineitem(s, d), "l_orderkey",
        "l_partkey")),

    // ---- funnel time-to-convert: exact median/min/max latency per
    // completed transition of the view→click→purchase chain ----
    "q207_funnel_latency" -> ((s, d) =>
      EventOps.funnelLatency(Tables.events(s, d),
        Seq("view", "click", "purchase"))),

    // ---- bigram-LM next-token table: top continuations of the
    // hottest contexts with conditional probabilities ----
    "q208_next_token" -> ((s, d) =>
      TextAnalysis.nextTokenDistribution(Tables.documents(s, d))),

    // ---- weekday seasonality profile: mean value and seasonal ratio
    // per (event_type, epoch_day % 7) ----
    "q209_dow_seasonality" -> ((s, d) =>
      EventOps.dowSeasonality(Tables.events(s, d))),

    // ---- CUSUM changepoint per type: integer-exact peak cumulative
    // deviation of daily totals ----
    "q210_cusum_changepoint" -> ((s, d) =>
      EventOps.cusumChangepoint(Tables.events(s, d))),

    // ---- exact midrank AUC: does order value rank urgent orders? ----
    "q211_auc" -> ((s, d) =>
      Stats.aucRankSum(Tables.orders(s, d), "o_totalprice",
        col("o_orderpriority") === "1-URGENT")),

    // ---- quantity-weighted price quartiles per flag: integer
    // cumulative-weight thresholds, no FP at the boundary ----
    "q212_weighted_quantiles" -> ((s, d) =>
      Stats.weightedQuantiles(Tables.lineitem(s, d), "l_returnflag",
        "l_extendedprice", "l_quantity")),

    // ---- MI between quantity and return flag: the feature-dependence
    // screen with normalized score ----
    "q213_mutual_information" -> ((s, d) =>
      Stats.mutualInformation(
        Tables.lineitem(s, d).withColumn("qty", col("l_quantity").cast("long")),
        "qty", "l_returnflag")),

    // ---- top clickstream paths per gap-session, first 8 steps ----
    "q214_session_paths" -> ((s, d) =>
      EventOps.sessionPaths(Tables.events(s, d), 3600L)),

    // ---- NB confidence calibration: margin-ranked decile bins vs
    // empirical accuracy — the threshold-picking table ----
    "q215_nb_calibration" -> ((s, d) =>
      TextAnalysis.nbCalibration(Tables.documents(s, d))),

    // ---- Lorenz table: customer revenue concentration by decile ----
    "q216_lorenz_deciles" -> ((s, d) =>
      Stats.lorenzDeciles(Tables.orders(s, d), "o_custkey", "o_totalprice")),

    // ---- daily-value autocorrelation at lags 1..7: the weekly-cycle
    // detector ----
    "q219_daily_acf" -> ((s, d) =>
      EventOps.dailyAcf(Tables.events(s, d))),

    // ---- inter-event burstiness per type: CV of per-user gaps,
    // Goh–Barabási B ----
    "q220_burstiness" -> ((s, d) =>
      EventOps.burstiness(Tables.events(s, d))),

    // ---- degree assortativity of the part co-occurrence graph (pairs
    // co-ordered ≥ 2×): do hub parts co-occur with other hubs? (the
    // near-dup graph is 1-regular here — zero degree variance, the
    // coefficient's undefined case) ----
    "q217_assortativity" -> ((s, d) =>
      GraphOps.degreeAssortativity(partCooccurrenceEdges(s, d))),

    // ---- hop histogram from part 0 over the same graph: the
    // small-world reachability profile per BFS level ----
    "q223_hop_histogram" -> ((s, d) =>
      GraphOps.bfsLevels(partCooccurrenceEdges(s, d), source = 0L, rounds = 4)
        .groupBy("dist").agg(count(lit(1)).as("n_vertices"))
        .orderBy("dist")),

    // ---- expanding z-score anomaly screen: each event vs its user's
    // strictly-prior history, centi-scaled integer moments — the batch
    // twin of StreamingIngest.streamingZscore (stream ≡ batch spec'd) ----
    "q224_expanding_zscore" -> ((s, d) =>
      EventOps.expandingZscore(Tables.events(s, d))),

    // ---- Spearman rank correlation: quantity vs price, exact integer
    // midranks via the two-phase sweep — no global window ----
    "q225_spearman" -> ((s, d) =>
      Stats.spearman(Tables.lineitem(s, d), "l_quantity", "l_extendedprice")),

    // ---- chi-square independence of event type × day-of-week +
    // Cramér's V — the categorical twin of q213's MI ----
    "q226_chi_square" -> ((s, d) =>
      Stats.chiSquareIndependence(
        Tables.events(s, d)
          .withColumn("dow", expr("unix_micros(ts) div 86400000000 % 7")),
        "event_type", "dow")),

    // ---- Welch two-sample t: error-event values vs the rest, exact
    // centi-scaled moments, scale-invariant t/df ----
    "q227_welch_ttest" -> ((s, d) =>
      Stats.welchTTest(Tables.events(s, d), "value",
        col("event_type") === "error")),

    // ---- Benjamini–Hochberg FDR over per-type weekend-vs-weekday
    // Welch tests (epoch-day%7: 2=Sat, 3=Sun) ----
    "q228_bh_fdr" -> ((s, d) =>
      Stats.bhFdr(
        Tables.events(s, d)
          .withColumn("dow", expr("unix_micros(ts) div 86400000000 % 7")),
        "event_type", "value", col("dow") === 2 || col("dow") === 3)),

    // ---- Kaplan–Meier survival of session lifetimes (q214's 1-hour
    // gap sessions, duration in minutes): a session is an observed
    // "death" unless it runs into the final hour before the horizon —
    // those are right-censored and only feed the risk sets ----
    "q229_kaplan_meier" -> ((s, d) =>
      Stats.kaplanMeier(sessionDurations(s, d), "dur_min", "observed")),

    // ---- RFM segmentation of customers from their orders ----
    "q230_rfm_segments" -> ((s, d) =>
      EventOps.rfmSegments(Tables.orders(s, d), "o_custkey",
        "o_orderdate", "o_totalprice")),

    // ---- Adamic–Adar link prediction on the cached co-occurrence
    // graph (q217/q223's fixture): which non-linked part pairs the
    // structure most expects to link next ----
    "q237_adamic_adar" -> ((s, d) =>
      GraphOps.adamicAdar(partCooccurrenceEdges(s, d))),

    // ---- HITS on the directed buyer→part bipartite graph: hubs are
    // broad buyers, authorities popular parts (ids disjoint by offset) ----
    "q238_hits" -> ((s, d) => {
      val e = Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_partkey") + lit(1000000L)).as("dst"))
        .distinct()
      GraphOps.hits(e, iters = 5)
    }),

    // ---- TextRank keywords: PageRank over the adjacent-content-token
    // co-occurrence graph, corpus-wide top terms ----
    "q239_textrank" -> ((s, d) =>
      TextAnalysis.textRank(Tables.documents(s, d))),

    // ---- MMR diversified rerank of the q20 candidate pool ----
    "q240_mmr_rerank" -> ((s, d) =>
      Retrieval.mmrRerank(Tables.embeddings(s, d), KnnQueryId)),

    // ---- classical additive seasonal decomposition of daily totals ----
    "q241_seasonal_decompose" -> ((s, d) =>
      EventOps.seasonalDecompose(Tables.events(s, d))),

    // ---- seasonal-adjusted anomaly flags on the q241 residuals ----
    "q257_seasonal_anomalies" -> ((s, d) =>
      EventOps.seasonalAnomalies(Tables.events(s, d))),

    // ---- one-way ANOVA F: does mean event value differ by type ----
    "q266_anova_f" -> ((s, d) =>
      Stats.anovaF(Tables.events(s, d), "value", "event_type")),

    // ---- Kruskal–Wallis (rank one-way ANOVA) on the same split;
    // χ²₀.₀₅ at df=4 pinned ----
    "q267_kruskal_wallis" -> ((s, d) =>
      Stats.kruskalWallis(Tables.events(s, d), "value", "event_type",
        hCrit = 9.487729036781154)),

    // ---- Kendall tau-b between daily event volume and daily value
    // total on the bounded day frame ----
    "q268_kendall_tau" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * lit(1e8) + lit(0.5)).cast("long").as("v8"))
        .groupBy("day")
        .agg(sum(col("v8")).as("t8"), count(lit(1)).as("n_events"))
      Stats.kendallTau(daily, "day", "n_events", "t8")
    }),

    // ---- two-arm log-rank on the q229 session lifetimes: do
    // even/odd-user cohorts churn at the same rate ----
    "q269_log_rank" -> ((s, d) =>
      Stats.logRank(sessionDurations(s, d), "dur_min", "observed",
        "arm", zCrit = 1.959964)),

    // ---- truncated-memory Holt linear backtest per type: level+trend
    // forecast over the last week, weights pinned driver-side ----
    "q270_holt_forecast" -> ((s, d) =>
      Stats.holtForecast(dailyTotalsByType(s, d), "event_type", "day",
        "t8", alpha = 0.3, beta = 0.2, horizon = 7)),

    // ---- lead/lag cross-correlation: do views predict purchase value
    // h days later ----
    "q271_cross_correlation" -> ((s, d) =>
      Stats.crossCorrelation(dailyTotalsByType(s, d), "event_type",
        "day", "t8", typeX = "view", typeY = "purchase")),

    // ---- stationary distribution of the event-type Markov chain vs
    // the empirical type share ----
    "q276_markov_stationary" -> ((s, d) =>
      EventOps.markovStationary(Tables.events(s, d))),

    // ---- probability of reaching 'purchase' within 7 transitions,
    // by starting state ----
    "q277_conversion_within" -> ((s, d) =>
      EventOps.conversionWithin(Tables.events(s, d))),

    // ---- dwell time per transition (within-session), mean + lower
    // median ----
    "q278_transition_dwell" -> ((s, d) =>
      EventOps.transitionDwell(Tables.events(s, d))),

    // ---- Zipf rank–frequency slope over the top-200 terms ----
    "q273_zipf_slope" -> ((s, d) =>
      TextAnalysis.zipfSlope(Tables.documents(s, d))),

    // ---- Flesch / FK readability per document ----
    "q274_readability" -> ((s, d) =>
      TextAnalysis.readability(Tables.documents(s, d))),

    // ---- lexical richness per language (TTR, hapax, Herdan's C) ----
    "q275_lexical_richness" -> ((s, d) =>
      TextAnalysis.lexicalRichness(Tables.documents(s, d))),

    // ---- binary-segmentation changepoint on the global daily total ----
    "q272_changepoint" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(expr("unix_micros(ts) div 86400000000").as("day"),
          floor(col("value") * lit(1e8) + lit(0.5)).cast("long").as("v8"))
        .groupBy("day").agg(sum(col("v8")).as("t8"))
      Stats.binarySegmentation(daily, "day", "t8")
    }),

    // ---- Mann–Kendall monotone-trend test per type on daily totals
    // (α=0.05 normal cut pinned) ----
    "q242_mann_kendall" -> ((s, d) =>
      Stats.mannKendall(dailyTotalsByType(s, d), "event_type", "day", "t8",
        zCrit = 1.959964)),

    // ---- Theil–Sen robust slope per type on the same daily series ----
    "q243_theil_sen" -> ((s, d) =>
      Stats.theilSen(dailyTotalsByType(s, d), "event_type", "day", "t8")),

    // ---- item–item cosine CF kernel: top co-purchase affinities ----
    "q244_item_cosine" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      Stats.itemCosine(Tables.lineitem(s, d), "l_orderkey", "l_partkey")
        .withColumn("rank", row_number().over(
          Window.orderBy(col("sim").desc, col("ia"), col("ib"))).cast("long"))
        .filter(col("rank") <= 20)
        .select(col("rank"), col("ia"), col("ib"), col("n_ab"), col("sim"))
        .orderBy("rank")
    }),

    // ---- item-based CF recommendations per customer ----
    "q245_recommendations" -> ((s, d) => {
      val baskets = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"), col("l_partkey"))
      Stats.recommendItems(baskets, "o_custkey", "o_orderkey", "l_partkey")
    }),

    // ---- seasonal-naive forecast backtest per type (MAE/sMAPE/MASE) ----
    "q246_forecast_backtest" -> ((s, d) =>
      Stats.forecastBacktest(dailyTotalsByType(s, d), "event_type", "day", "t8")),

    // ---- Nelson–Aalen cumulative hazard on the q229 survival frame ----
    "q247_nelson_aalen" -> ((s, d) =>
      Stats.nelsonAalen(sessionDurations(s, d), "dur_min", "observed")),

    // ---- PSI drift of event values: first 15 days = reference ----
    "q248_psi_drift" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("value"), expr("unix_micros(ts) div 86400000000").as("day"))
      val d0 = ev.agg(min(col("day")).as("day0"))
      Stats.psi(ev.crossJoin(broadcast(d0)), "value",
        col("day") < col("day0") + lit(15L))
    }),

    // ---- OLS inference diagnostics per flag: R², stderr, slope t ----
    "q249_ols_diagnostics" -> ((s, d) =>
      Stats.olsDiagnostics(Tables.lineitem(s, d), "l_returnflag",
        "l_quantity", "l_extendedprice")),

    // ---- decision-stump feature screen: info gain of three
    // categoricals against the big-order label ----
    "q250_information_gain" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .withColumn("y", (col("o_totalprice") > lit(100000.0)).cast("long"))
      val melted = o.select(lit("priority").as("f"),
          col("o_orderpriority").as("v"), col("y"))
        .unionAll(o.select(lit("status").as("f"),
          col("o_orderstatus").as("v"), col("y")))
        .unionAll(o.select(lit("segment").as("f"),
          col("c_mktsegment").as("v"), col("y")))
      Stats.informationGain(melted, "f", "v", "y")
    }),

    // ---- one-vs-rest AUC of the q107 NB classifier's 'en' score:
    // model evaluation end-to-end through the q211 exact rank sweep ----
    "q253_nb_auc" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val lab = TextAnalysis.naiveBayesScores(docs)
        .filter(col("cls") === "en")
        .join(docs.select(col("doc_id"), (col("lang") === "en").as("is_en")),
          "doc_id")
      Stats.aucRankSum(lab, "score", col("is_en"))
    }),

    // ---- cumulative gains / lift deciles of the same ranking ----
    "q254_gains_deciles" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val lab = TextAnalysis.naiveBayesScores(docs)
        .filter(col("cls") === "en")
        .join(docs.select(col("doc_id"),
          when(col("lang") === "en", 1L).otherwise(0L).as("pos")), "doc_id")
      val ranked = lab
        .withColumn("rn", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        .withColumn("decile", expr("(rn - 1) * 10 div n"))
      val byDec = ranked.groupBy("decile")
        .agg(count(lit(1)).as("n_docs"), sum(col("pos")).as("n_pos"))
      val tot = byDec.agg(sum(col("n_docs")).as("n_all"),
        sum(col("n_pos")).as("pos_all"))
      val wc = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dd = (c: String) => col(c).cast("double")
      byDec.crossJoin(broadcast(tot))
        .withColumn("cum_n", sum(col("n_docs")).over(wc))
        .withColumn("cum_pos", sum(col("n_pos")).over(wc))
        .select(col("decile"), col("n_docs"), col("n_pos"),
          trunc6(dd("cum_pos") / dd("pos_all")).as("gain"),
          trunc6((dd("cum_pos") / dd("cum_n")) /
            (dd("pos_all") / dd("n_all"))).as("lift"))
        .orderBy("decile")
    }),

    // ---- frequent 3-itemsets: the lattice level above q205's pairs ----
    "q251_frequent_triples" -> ((s, d) =>
      Stats.frequentTriples(Tables.lineitem(s, d), "l_orderkey", "l_partkey")),

    // ---- weekend-vs-weekday purchase-rate A/B readout per user-day ----
    "q252_two_proportion_z" -> ((s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          (col("event_type") === "purchase").cast("long").as("pur"))
        .groupBy("user_id", "day")
        .agg(max(col("pur")).as("converted"))
      Stats.twoProportionZ(ud,
        col("day") % 7 === 2 || col("day") % 7 === 3,
        col("converted") === 1L, zCrit = 1.959964)
    }),

    // ---- Cohen's κ: do the char-count and word-count size buckets
    // agree — two independent raters over the same documents ----
    "q287_cohen_kappa" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("spaces",
          length(col("text")) -
            length(expr("replace(text, ' ', '')")))
      Stats.cohenKappa(docs,
        when(col("n_chars") < 220, "S")
          .when(col("n_chars") < 380, "M").otherwise("L"),
        when(col("spaces") < 38, "S")
          .when(col("spaces") < 67, "M").otherwise("L"))
    }),

    // ---- MCC of the q107 NB 'en' classifier at the top-quartile
    // rank cut: the balance-proof confusion-matrix summary ----
    "q288_nb_mcc" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val lab = TextAnalysis.naiveBayesScores(docs)
        .filter(col("cls") === "en")
        .join(docs.select(col("doc_id"), (col("lang") === "en").as("is_en")),
          "doc_id")
      Stats.mccAtRankCut(lab, "score", "doc_id", col("is_en"), cutDiv = 4)
    }),

    // ---- temporal-holdout Brier score of a weekday base-rate
    // conversion model: train on the first 15 days, score the rest ----
    "q289_brier_holdout" -> ((s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          (col("event_type") === "purchase").cast("long").as("pur"))
        .groupBy("user_id", "day")
        .agg(max(col("pur")).as("converted"))
        .withColumn("seg", col("day") % 7)
      Stats.brierBySegment(ud, "seg",
        col("day") < 19738L, col("converted") === 1L)
    }),

    // ---- CART best-split scan: the order-value threshold that best
    // separates urgent orders, by weighted Gini over all candidates ----
    "q290_best_split" -> ((s, d) =>
      Stats.bestGiniSplit(Tables.orders(s, d), "o_totalprice",
        col("o_orderpriority") === "1-URGENT")),

    // ---- top principal component of the embedding cloud: power
    // iteration over the exact q121 covariance matrix ----
    "q291_pca_component" -> ((s, d) =>
      Retrieval.pcaTopComponent(Tables.embeddings(s, d))),

    // ---- spectral summary of the same chain: λ₁, trace, and the
    // explained-variance ratio that prices matryoshka truncation ----
    "q292_pca_explained" -> ((s, d) =>
      Retrieval.pcaExplained(Tables.embeddings(s, d))),

    // ---- Bradley–Terry preference strengths over the per-order
    // top-2-price "duels": the RLHF pairwise-preference reduction ----
    "q293_bradley_terry" -> ((s, d) =>
      Stats.bradleyTerry(duelsFor(s, d), "wf", "lf")),

    // ---- directed pairwise win rates with the Wilson lower bound:
    // the preference-data QC table over the same duels ----
    "q294_winrate_wilson" -> ((s, d) =>
      Stats.pairwiseWilson(duelsFor(s, d), "wf", "lf", z = 1.959964)),

    // ---- entropy rate of the behavior Markov chain, decomposed per
    // state: π · h(state) over the q276 stationary chain ----
    "q295_markov_entropy" -> ((s, d) =>
      EventOps.markovEntropyRate(Tables.events(s, d))),

    // ---- difference-in-differences on event value around the
    // mid-window day, user_id%3 as the synthetic treatment arm ----
    "q296_diff_in_diff" -> ((s, d) =>
      EventOps.diffInDiff(Tables.events(s, d),
        col("user_id") % 3 === 0, splitDay = 19738L)),

    // ---- CUPED: pre-period covariate adjustment of the same
    // experiment — θ, adjusted lift, variance-reduction ratio ----
    "q297_cuped" -> ((s, d) =>
      EventOps.cuped(Tables.events(s, d),
        col("user_id") % 3 === 0, splitDay = 19738L)),

    // ---- split-conformal interval for the per-flag price~quantity
    // OLS: q̂ from the calibration slice, coverage on the test slice ----
    "q298_conformal_ols" -> ((s, d) =>
      Stats.conformalOls(Tables.lineitem(s, d), "l_returnflag",
        "l_quantity", "l_extendedprice", col("l_orderkey") % 4)),

    // ---- greedy k-center coreset over the embeddings: the
    // farthest-point diverse-subset picker ----
    "q299_k_center" -> ((s, d) =>
      Retrieval.kCenterGreedy(Tables.embeddings(s, d), k = 5)),

    // ---- Good–Turing smoothed counts for the low-frequency band:
    // how much mass rare terms really deserve ----
    "q300_good_turing" -> ((s, d) =>
      TextAnalysis.goodTuring(Tables.documents(s, d))),

    // ---- Newman modularity of the q109 label-propagation communities:
    // per-community intra-edge share vs degree expectation; Σ = Q ----
    "q301_modularity" -> ((s, d) => {
      val e = nearDupPairEdges(s, d)
      GraphOps.modularity(e, GraphOps.labelPropagation(e, rounds = 3))
    }),

    // ---- 2-D Pareto frontier of parts (cheapest price per size level):
    // prefix-max sweep, no dominance self-join ----
    "q302_pareto_frontier" -> ((s, d) =>
      Stats.paretoFrontier2d(Tables.part(s, d), "p_retailprice", "p_size")),

    // ---- sorted-neighborhood near-dup candidates: rank docs by their
    // simhash, pair each with the next 2, keep pairs ≤ 2 bits apart ----
    "q303_simhash_neighborhood" -> ((s, d) =>
      Dedup.simhashNeighborhood(Tables.documents(s, d),
        bits = 16, window = 2, maxHamming = 2, ordered = true)),

    // ---- HLL set overlap: click∩purchase users by inclusion–exclusion
    // on register-max-merged sketches, audited against the exact join ----
    "q304_hll_overlap" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val exact = ev.filter(col("event_type") === "click")
        .select("user_id").distinct()
        .join(ev.filter(col("event_type") === "purchase")
          .select("user_id").distinct(), "user_id")
        .agg(count(lit(1)).as("exact_intersection"))
      Sketches.hllOverlap(ev, "event_type", "click", "purchase",
        col("user_id").cast("string"), b = 10)
        .crossJoin(broadcast(exact))
    }),

    // ---- rolling 7-day active users from mergeable per-day HLL
    // sketches — q105's exact report at sketch cost, audit included ----
    "q305_rolling_hll_wau" -> ((s, d) =>
      Sketches.rollingHllWau(Tables.events(s, d))),

    // ---- join-cardinality estimate: 16-bucket equi-depth histograms
    // on the shared user key, containment formula vs the real join ----
    "q306_join_cardinality" -> ((s, d) =>
      Profile.joinCardinalityEstimate(
        Tables.events(s, d), "user_id",
        Tables.orders(s, d), "o_custkey")),

    // ---- declarative expectations gate over orders: volume, key
    // uniqueness, null/positivity shares, domain membership ----
    "q307_expectations_audit" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val n = count(lit(1)).cast("double")
      def share(c: org.apache.spark.sql.Column) =
        sum(when(c, 1L).otherwise(0L)).cast("double") / n
      Profile.expectationsAudit(o, Seq(
        ("order_count", count(lit(1)).cast("double"), 1000.0, 1e15),
        ("orderkey_unique",
          countDistinct(col("o_orderkey")).cast("double") / n, 1.0, 1.0),
        ("priority_domain_share", share(col("o_orderpriority").isin(
          "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
          1.0, 1.0),
        ("totalprice_nonnull_share",
          share(col("o_totalprice").isNotNull), 0.999, 1.0),
        ("totalprice_positive_share",
          share(col("o_totalprice") > 0.0), 0.999, 1.0)))
    }),

    // ---- reproducible stratified 5-fold assignment + balance report ----
    "q308_stratified_kfold" -> ((s, d) =>
      Profile.stratifiedKfold(Tables.orders(s, d), "o_orderpriority",
        col("o_orderkey"), k = 5)),

    // ---- hash-gated majority downsampling toward 1:1 with the
    // logit correction reported per class ----
    "q309_balanced_downsample" -> ((s, d) =>
      Profile.balancedDownsample(Tables.lineitem(s, d),
        col("l_returnflag") === "R",
        concat_ws("-", col("l_orderkey"), col("l_linenumber")))),

    // ---- the blocking→resolution ER pipeline end-to-end: q303's
    // sorted-neighborhood candidates feed star-contraction clusters ----
    "q310_neighborhood_clusters" -> ((s, d) =>
      Dedup.duplicateClusters(
        Dedup.simhashNeighborhood(Tables.documents(s, d),
          bits = 16, window = 2, maxHamming = 2), ordered = true)),

    // ---- contrastive triplets: exact top-1 positive + 4 hash-ranked
    // negatives per query — the DPR/InfoNCE training-data shape ----
    "q312_triplet_mine" -> ((s, d) =>
      Retrieval.tripletMine(Tables.embeddings(s, d),
        queryIds = Seq(0L, 7L, 11L, 23L, 42L), negatives = 4)),

    // ---- stutter audit: what a consecutive-duplicate-token collapse
    // (C4-style repetition trim) would remove, per language ----
    "q313_stutter_audit" -> ((s, d) =>
      TextAnalysis.stutterAudit(Tables.documents(s, d))),

    // ---- ingest-integrity audit: does the materialized n_chars
    // column still agree with the text it describes ----
    "q314_field_consistency" -> ((s, d) =>
      Tables.documents(s, d).agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_chars") =!= length(col("text")), 1L)
          .otherwise(0L)).as("n_mismatch"),
        max(abs(col("n_chars") - length(col("text")))).cast("long")
          .as("max_abs_diff"))),

    // ---- blocking-recall audit: q303's sorted-neighborhood candidates
    // scored against exact-duplicate ground truth (planted copies) ----
    "q316_blocking_recall" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val corpus = docs.unionByName(docs.select(
        (col("doc_id") + 10000).as("doc_id"), col("text")))
      Dedup.blockingRecallAudit(corpus, bits = 16, window = 2,
        maxHamming = 2)
    }),

    // ---- tokenizer fertility per language: exact BPE tokens per
    // whitespace word — the multilingual-tokenizer health metric
    // (capped corpus, the q60 convention) ----
    "q318_tokenizer_fertility" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 60)
      docs.select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_words"))
        .join(TextAnalysis.bpeExactTokenCount(docs), "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words"),
          sum(col("n_tokens_exact")).as("n_bpe_tokens"))
        .withColumn("fertility", trunc6(
          col("n_bpe_tokens").cast("double") / col("n_words").cast("double")))
        .orderBy("lang")
    }),

    // ---- packing-budget sweep: sequences, overflow count and mean
    // fill at budget ∈ {512,1024,2048,4096} — the fragmentation data
    // behind choosing a training sequence length ----
    "q319_packing_sweep" -> ((s, d) =>
      TextAnalysis.packingSweep(Tables.documents(s, d),
        Seq(512L, 1024L, 2048L, 4096L))),

    // ---- the recall/cost frontier over blocking window sizes: one
    // shared ranking, every operating point a filter (q168 pattern) ----
    "q317_blocking_sweep" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val corpus = docs.unionByName(docs.select(
        (col("doc_id") + 10000).as("doc_id"), col("text")))
      Dedup.blockingRecallSweep(corpus, windows = Seq(1, 2, 4, 8))
    }),

    // ---- blocking auto-tuner: the smallest window meeting a recall
    // target within a candidate budget, picked from q317's MEASURED
    // frontier (at sf0.01 window 4 is the unique answer: 8 clears the
    // recall bar but busts the budget) ----
    "q320_blocking_autotune" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val corpus = docs.unionByName(docs.select(
        (col("doc_id") + 10000).as("doc_id"), col("text")))
      Dedup.blockingAutoTune(corpus, windows = Seq(1, 2, 4, 8),
        recallTarget = 0.75, candidateBudget = 3000L)
    }),

    // ---- per-source Gopher gate pass rates: which feeds are worth
    // ingesting at all — the acquisition-level quality report ----
    "q315_source_quality_gate" -> ((s, d) => {
      val g = TextAnalysis.gopherQuality(Tables.documents(s, d))
        .select(col("doc_id"), col("keep"))
      Tables.documents(s, d).select(col("doc_id"), col("source"))
        .join(g, "doc_id")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_pass"))
        .withColumn("pass_rate", trunc6(
          col("n_pass").cast("double") / col("n_docs").cast("double")))
        .orderBy("source")
    }),

    // ---- cross-validated ranking metric: per-fold exact midrank AUC
    // of order value → urgency, all five folds in ONE keyed sweep ----
    "q311_kfold_auc" -> ((s, d) => {
      import graft.functions.TextFunctions.md5Long
      val o = Tables.orders(s, d).withColumn("fold",
        md5Long(concat(lit("fold|"), col("o_orderkey").cast("string"))) % 5)
      Stats.aucByKey(o, col("fold"), "o_totalprice",
          col("o_orderpriority") === "1-URGENT")
        .select(col("fold").cast("long").as("fold"), col("n_pos"),
          col("n_neg"), col("auc"))
        .orderBy("fold")
    }),

    // ---- time-travel diff: what did the q126 MERGE actually touch ----
    "q141_snapshot_diff" -> ((s, d) =>
      pipeline.TableOps.snapshotDiff(s, mergeTableFor(s, d),
        fromVersion = 0L, key = "user_id", compareCols = Seq("text"))
        .select(col("user_id").as("doc_id"), col("change"))
        .orderBy("doc_id")),

    // ---- mutual top-1 pairs: hub-proof duplicate confirmation
    // (exact quadratic baseline on the q22 cap; LSH candidates are
    // the scale path) ----
    "q142_mutual_nn_pairs" -> ((s, d) =>
      Dedup.mutualNnPairs(
        Tables.embeddings(s, d).filter(col("vec_id") < 500))),

    // ---- dedup reporting: resolved-cluster size histogram ----
    "q143_cluster_sizes" -> ((s, d) =>
      dupLabelsFor(s, d)
        .groupBy("cluster_rep").agg(count(lit(1)).as("sz"))
        .groupBy("sz").agg(count(lit(1)).as("n_clusters"))
        .orderBy("sz")),

    // ---- near-dup graph degree distribution ----
    "q144_degree_histogram" -> ((s, d) =>
      nearDupPairEdges(s, d)
        .groupBy("src").agg(count(lit(1)).as("deg"))
        .groupBy("deg").agg(count(lit(1)).as("n_vertices"))
        .orderBy("deg")),

    // ---- JSONL export/import roundtrip (the interchange format):
    // explicit read schema, content verified against the source ----
    "q145_jsonl_roundtrip" -> ((s, d) =>
      s.read.schema("doc_id LONG, lang STRING, text STRING")
        .json(jsonlDocsFor(s, d))
        .select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("text_len"))
        .orderBy("doc_id")),

    // ---- hive-partitioned layout: the lang filter never touches
    // other languages' files (PlanSpec pins the partition filter) ----
    "q146_lang_partitioned_scan" -> ((s, d) =>
      s.read.parquet(langPartitionedFor(s, d))
        .filter(col("lang") === "en")
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("total_chars"))
        .orderBy("source")),

    // ---- higher central moments from exact power sums: the skew /
    // tail report that decides winsorization and mixture caps ----
    "q147_moments" -> ((s, d) => {
      val x = col("l_quantity")
      val nD = col("n").cast("double")
      val mu = col("s1") / nD
      val m2 = col("s2") / nD - mu * mu
      val m3 = col("s3") / nD - lit(3.0) * mu * (col("s2") / nD) +
        lit(2.0) * mu * mu * mu
      val m4 = col("s4") / nD - lit(4.0) * mu * (col("s3") / nD) +
        lit(6.0) * mu * mu * (col("s2") / nD) - lit(3.0) * mu * mu * mu * mu
      Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), xsum(x).as("s1"),
          psum6(x * x).as("s2"), psum6(x * x * x).as("s3"),
          psum6(x * x * x * x).as("s4"))
        .select(col("l_returnflag"), col("n"),
          trunc6(m3 / pow(m2, lit(1.5))).as("skewness"),
          trunc6(m4 / (m2 * m2) - lit(3.0)).as("kurtosis"))
        .orderBy("l_returnflag")
    }),

    // ---- HTML main-text extraction: the crawl pipeline's boilerplate
    // strip as a pure codegen'd regex chain, replayed byte-for-byte ----
    "q149_html_extract" -> ((s, d) => {
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><style>p{margin:0}</style></head><body>" +
          "<nav>home | about | <a href=\"/x\">links</a></nav>" +
          "<p>intro &amp; &quot;quoted&quot;</p><p>"),
        col("text"),
        lit("</p><footer>site footer junk</footer></body></html>"))
      Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.stripHtml(html).as("extracted"))
        .withColumn("extracted_len", length(col("extracted")).cast("long"))
        .orderBy("doc_id")
    }),

    // ---- classifier audit: NB prediction × labeled lang confusion ----
    "q150_lang_confusion" -> ((s, d) =>
      TextAnalysis.naiveBayesLang(Tables.documents(s, d))
        .join(Tables.documents(s, d).select("doc_id", "lang"), "doc_id")
        .groupBy(col("lang").as("actual"), col("pred_lang").as("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy("actual", "predicted")),

    // ---- measured ANN quality as data: IVF-PQ overlap@10 vs exact ----
    "q151_ivfpq_recall" -> ((s, d) => {
      val exact = Retrieval.cosineKnn(Tables.embeddings(s, d), KnnQueryId,
        topK = 10).select("id")
      val approx = ivfPqIndexFor(s, d).query(ivfQueryVec(s, d), topK = 10,
        nProbe = IvfPqNProbe, excludeId = Some(KnnQueryId)).select("id")
      exact.join(approx, "id").agg(count(lit(1)).as("overlap_at_10"))
    }),

    // ---- ANN recall/latency frontier as DATA: overlap@10 of the
    // IVF-PQ probe + exact rescore against the exact scan, swept over
    // nProbe × oversample (the FAISS-bench operating curve; the
    // reference exposes the same dials as DiskANN params,
    // m1_episodic.py:148-162). Each row is one operating point a
    // deployment would pick from; IvfPqSpec pins recall monotone in
    // nProbe. The probe itself stays pure partition pruning — cost
    // scales with nProbe/nlist of the corpus, never the corpus. ----
    "q168_ann_frontier" -> ((s, d) => annFrontier(s, d)),

    // ---- ANN auto-tuner: the cheapest (n_probe, oversample) point
    // meeting an overlap@10 target on q168's MEASURED frontier — probe
    // width (the corpus-touching knob) minimized first, rescore pool
    // second; fallback flagged by met_target (q320's contract on the
    // ANN side). At sf0.01 overlap 8 is first reached at (4, 8). ----
    "q321_ann_autotune" -> ((s, d) =>
      Retrieval.annAutoTune(annFrontier(s, d), minOverlap = 8L)),

    // ---- recall-mode ANN auto-tuner (q321 generalized): the cheapest
    // operating point whose MEASURED MEAN RECALL@10 over a held-out
    // query set meets the SLA target — recall averaged over queries is
    // the number a deployment actually commits to, where q321's single
    // tuning query can over- or under-state the operating point ----
    "q328_ann_autotune_recall" -> ((s, d) =>
      Retrieval.annAutoTuneRecall(annFrontierHeldout(s, d),
        minRecall = HeldoutRecallTarget)),

    // ---- batched serving: five queries' exact top-5 from ONE corpus
    // scan, per-query cut through the bounded heap ----
    "q161_batched_knn" -> ((s, d) =>
      Retrieval.cosineKnnBatch(Tables.embeddings(s, d),
        queryIds = Seq(0L, 7L, 11L, 23L, 42L), topK = 5)),

    // ---- personalized PageRank from doc 0: link-structure relevance
    // for graph-memory retrieval, relevance-ordered ----
    "q167_personalized_pagerank" -> ((s, d) =>
      GraphOps.personalizedPageRank(nearDupPairEdges(s, d), source = 0L,
        iters = 5)),

    // ---- weighted single-source shortest paths (Bellman–Ford, 4
    // unrolled min-plus rounds) over the near-dup graph with
    // w = 1 − jaccard: how duplicate-reachable each doc is from the
    // source family — one join + one min-agg per round ----
    "q180_sssp" -> ((s, d) => {
      val pairs = Dedup.ngramJaccardPairs(
        docsWithNearDups(s, d).filter(col("doc_id") < 100 ||
          (col("doc_id") >= 10000 && col("doc_id") < 10100)),
        n = 3, threshold = 0.5)
      def half(a: String, b: String) =
        pairs.select(col(a).as("src"), col(b).as("dst"),
          (lit(1.0) - col("jaccard")).as("w"))
      GraphOps.sssp(half("doc_a", "doc_b").union(half("doc_b", "doc_a")),
        source = 0L, rounds = 4)
    }),

    // ---- EWMA over event time per user: fixed-depth unrolled kernel
    // (α = 0.5 → exact power-of-two weights), normalized over present
    // lags — one user-keyed shuffle, zero recursive state ----
    "q181_ewma" -> ((s, d) =>
      EventOps.ewma(Tables.events(s, d), alpha = 0.5, depth = 5)),

    // ---- graded ranking quality of the served ANN path: NDCG@10 and
    // MRR of the rescored IVF-PQ ranking against the exact scan
    // (completes the audit family beyond set-overlap recall: position-
    // sensitive quality as oracle-checked DATA; ln-discounted DCG so
    // both engines discount through the already-parity-proven ln) ----
    "q182_ndcg_mrr" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      def ranked(df: DataFrame, rankName: String) =
        df.withColumn(rankName, row_number().over(
          Window.orderBy(col("score").desc, col("id"))).cast("long"))
      val exact = ranked(Retrieval.cosineKnn(Tables.embeddings(s, d),
        KnnQueryId, topK = 10), "erank").select("id", "erank")
      val approx = ranked(ivfPqIndexFor(s, d).query(ivfQueryVec(s, d),
        topK = 10, nProbe = IvfPqNProbe, excludeId = Some(KnnQueryId),
        rescoreFrom = Some(Tables.embeddings(s, d)), oversample = 4), "arank")
        .select("id", "arank")
      // ideal DCG for 10 graded positions, pinned driver-side
      val idcg = (1 to 10).map(i => (11 - i).toDouble / math.log(i + 1.0)).sum
      approx.join(exact, Seq("id"), "left")
        .select(col("arank"), col("erank"))
        .agg(
          trunc6(dsum12(when(col("erank").isNotNull,
            (lit(11L) - col("erank")).cast("double") /
              log((col("arank") + lit(1L)).cast("double")))
            .otherwise(lit(0.0))) / lit(idcg)).as("ndcg_at_10"),
          trunc6(coalesce(
            lit(1.0) / min(when(col("erank") === 1L, col("arank")))
              .cast("double"),
            lit(0.0))).as("mrr"))
    }),

    // ---- exact per-group median via the keyed prefix-count sweep
    // (the (n+1)/2,(n+2)/2 middle ranks averaged — the exact twin of
    // the q114 DDSketch scale path, with no per-key window sort) ----
    "q183_exact_median" -> ((s, d) =>
      Stats.exactMedianReport(Tables.lineitem(s, d), "l_returnflag",
        "l_extendedprice")),

    // ---- pairwise Pearson matrix over four measures in ONE pass:
    // 15 map-side-combinable moment accumulators (scaled-long exact —
    // psum6 where extendedprice inflates the product, zsum8 for the
    // small ones), then the 6 correlations unfold from the single
    // 1-row moment frame ----
    "q184_corr_matrix" -> ((s, d) => {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      def sumf(a: String, b: String)(
          c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        if (a == "l_extendedprice" || b == "l_extendedprice") psum6(c)
        else zsum8(c)
      val aggs = cs.map(c => xsum(col(c)).as(s"s_$c")) ++
        (for { i <- cs.indices; j <- i until cs.length } yield
          sumf(cs(i), cs(j))(col(cs(i)) * col(cs(j))).as(s"p_${i}_$j"))
      val m = Tables.lineitem(s, d)
        .agg(count(lit(1)).as("n"), aggs: _*)
      val nD = col("n").cast("double")
      // unfold the six pairs from the SINGLE 1-row moment frame via a
      // row-local explode — a union of per-pair selects would re-scan
      // and re-aggregate the fact table once per pair (verified in the
      // physical plan: 6 independent Scan+HashAggregate chains)
      val pairRows = for { i <- cs.indices; j <- (i + 1) until cs.length }
        yield {
          val (sa, sb) = (col(s"s_${cs(i)}"), col(s"s_${cs(j)}"))
          struct(lit(cs(i)).as("col_a"), lit(cs(j)).as("col_b"),
            trunc6((nD * col(s"p_${i}_$j") - sa * sb) /
              (sqrt(nD * col(s"p_${i}_$i") - sa * sa) *
                sqrt(nD * col(s"p_${j}_$j") - sb * sb))).as("corr"))
        }
      m.select(explode(array(pairRows: _*)).as("r"))
        .select(col("r.col_a"), col("r.col_b"), col("r.corr"))
        .orderBy("col_a", "col_b")
    }),

    // ---- type-2 slowly-changing dimension from the event feed: each
    // user's event_type history versioned into [valid_from, valid_to)
    // rows with unchanged-value collapse — one key shuffle, two windows
    // (TableOps.scd2; the dimension-build twin of q141's CDC diff) ----
    "q185_scd2" -> ((s, d) =>
      pipeline.TableOps.scd2(
        Tables.events(s, d).select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("event_id")),
        key = "user_id", attrs = Seq("event_type"),
        tsCol = "ts_us", tieCol = "event_id")),

    // ---- wide→long melt of the lineitem measures (Spark unpivot ≡
    // the SQL UNION-ALL form), re-aggregated per (flag, measure) ----
    "q186_melt" -> ((s, d) =>
      Tables.lineitem(s, d)
        .unpivot(Array(col("l_returnflag")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "val")
        .groupBy("l_returnflag", "measure")
        .agg(count(lit(1)).as("n"), trunc6(xsum(col("val"))).as("total"))
        .orderBy("l_returnflag", "measure")),

    // ---- referential-integrity audit: orphan counts across the FK
    // graph in one pass of anti-joins (the ingest health check) ----
    "q166_integrity_audit" -> ((s, d) => {
      def orphans(name: String, child: DataFrame, key: String,
          parent: DataFrame, pkey: String) =
        child.join(parent, child(key) === parent(pkey), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
          .withColumn("relation", lit(name))
      orphans("lineitem->orders", Tables.lineitem(s, d), "l_orderkey",
        Tables.orders(s, d), "o_orderkey")
        .unionByName(orphans("lineitem->part", Tables.lineitem(s, d),
          "l_partkey", Tables.part(s, d), "p_partkey"))
        .unionByName(orphans("orders->customer", Tables.orders(s, d),
          "o_custkey", Tables.customer(s, d), "c_custkey"))
        .select("relation", "n_orphans")
        .orderBy("relation")
    }),

    // ---- BFS levels from doc 0 over the near-dup graph (4-hop
    // horizon, fixed unroll = the SQL twin) ----
    "q164_bfs_levels" -> ((s, d) =>
      GraphOps.bfsLevels(nearDupPairEdges(s, d), source = 0L, rounds = 4)),

    // ---- local clustering coefficient: mutually-duplicating families
    // score ~1, hub-stitched neighborhoods score low ----
    "q165_clustering_coeff" -> ((s, d) =>
      GraphOps.clusteringCoefficient(nearDupPairEdges(s, d))),

    // ---- Bloom semi-join reduction: orders of high-balance customers
    // — the key filter probes map-side BEFORE the exchange; exact
    // verify makes the result precisely the plain semi-join ----
    "q163_bloom_semi_join" -> ((s, d) => {
      val rich = Tables.customer(s, d)
        .filter(col("c_acctbal") > lit(9000.0))
        .select(col("c_custkey").as("o_custkey"))
      Joins.bloomSemiJoin(Tables.orders(s, d), rich, "o_custkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          trunc6(xsum(col("o_totalprice"))).as("total"))
        .orderBy("o_orderpriority")
    }),

    // ---- DDSketch accuracy audit: estimate vs the exact rank
    // statistic, relative error pinned (completes the audit family:
    // HLL q152, LSH q157, IVF-PQ q151) ----
    "q162_ddsketch_error_audit" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, d)
      val n = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      val ranked = li.withColumn("rn", row_number().over(
        Window.partitionBy("l_returnflag").orderBy(col("l_extendedprice"))))
      val exact = ranked.join(broadcast(n), "l_returnflag")
        .withColumn("q", explode(array(lit(0.5), lit(0.99))))
        .filter(col("rn") === greatest(lit(1L),
          ceil(col("q") * col("n").cast("double")).cast("long")))
        .select(col("l_returnflag"), col("q"),
          col("l_extendedprice").as("exact_q"))
      val est = Sketches.ddSketchQuantiles(li, Seq("l_returnflag"),
        col("l_extendedprice"), Seq(0.5, 0.99))
        .select(col("l_returnflag"), col("q"), col("est"))
      est.join(exact, Seq("l_returnflag", "q"))
        .withColumn("rel_error",
          trunc6(abs(col("est") - col("exact_q")) / col("exact_q")))
        .select("l_returnflag", "q", "exact_q", "est", "rel_error")
        .orderBy("l_returnflag", "q")
    }),

    // ---- the spark.sql SURFACE: one SQL text shared verbatim with
    // the oracle (zero dialect drift), run over temp views ----
    "q159_sql_interface" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.customer(s, d).createOrReplaceTempView("customer")
      s.sql(SqlInterfaceQuery)
    }),

    // ---- calendar ops: monthly revenue + month-over-month delta ----
    "q160_monthly_revenue" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("month")
      Tables.orders(s, d)
        .groupBy(trunc(col("o_orderdate"), "month").as("month"))
        .agg(count(lit(1)).as("n_orders"),
          trunc6(xsum(col("o_totalprice"))).as("revenue"))
        .withColumn("mom_delta",
          trunc6(col("revenue") - lag(col("revenue"), 1).over(w)))
        .orderBy("month")
    }),

    // ---- measured recall of the LSH near-dup path vs the exact
    // baseline — the bucketing trade quantified as data ----
    "q157_lsh_recall" -> ((s, d) => {
      val e = SparkEntry.queries("q22_near_dup_vectors")(s, d)
        .select("id_a", "id_b")
      val l = SparkEntry.queries("q49_near_dup_lsh")(s, d)
        .select("id_a", "id_b")
      e.agg(count(lit(1)).as("n_exact"))
        .crossJoin(l.agg(count(lit(1)).as("n_lsh")))
        .crossJoin(e.join(l, Seq("id_a", "id_b"))
          .agg(count(lit(1)).as("n_common")))
        .withColumn("recall", trunc6(
          col("n_common").cast("double") / col("n_exact").cast("double")))
    }),

    // ---- the curation planning curve: docs/tokens surviving each
    // quality threshold ----
    "q158_quality_sweep" -> ((s, d) => {
      val q = TextAnalysis.qualityScore(Tables.documents(s, d))
        .select("doc_id", "quality")
      val tk = Tables.documents(s, d).select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      q.join(tk, "doc_id")
        .withColumn("threshold",
          explode(array(Seq(0.5, 0.55, 0.6, 0.65, 0.7).map(lit): _*)))
        .filter(col("quality") >= col("threshold"))
        .groupBy("threshold")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .orderBy("threshold")
    }),

    // ---- market-basket co-occurrence: part pairs ordered together.
    // The self-join is per-ORDER (≤7 lines), so the pair fan-out is
    // bounded per key — never a table-level product ----
    "q154_part_cooccurrence" -> ((s, d) =>
      // one order-keyed shuffle; the pair fan-out is ROW-LOCAL from the
      // sorted per-order part array (a self-join would shuffle lineitem
      // twice and join — measured 2.3 s vs 0.8 s). Equal-part pairs are
      // excluded by the strict <, multiplicities preserved, so counts
      // match the oracle's row-level < join exactly
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_partkey"))).as("ps"))
        // guard: sequence(1, 0) is DESCENDING in Spark — a single-line
        // order would index ps[-1] (an ANSI error), not produce zero pairs
        .filter(size(col("ps")) >= 2)
        .select(explode(expr(
          "flatten(transform(sequence(1, size(ps) - 1), " +
            "i -> transform(slice(ps, i + 1, size(ps) - i), " +
            "x -> struct(ps[i - 1] AS part_a, x AS part_b))))")).as("p"))
        .filter(col("p.part_a") < col("p.part_b"))
        .groupBy(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
        .limit(20)),

    // ---- event-type transition matrix (first-order Markov counts):
    // one lag window per user, one count aggregation ----
    "q155_event_transitions" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("prev_type", "next_type")
    }),

    // ---- multimodal keep/drop gate: the three byte-layout parsers
    // composed into one curation decision per asset ----
    "q156_media_gate" -> ((s, d) => {
      val img = SparkEntry.queries("q111_image_dims")(s, d)
        .select(col("doc_id"), (col("width") >= 500 && col("height") >= 300)
          .as("img_ok"))
      val aud = SparkEntry.queries("q112_audio_meta")(s, d)
        .select(col("doc_id"), (col("sample_rate") >= 16000).as("aud_ok"))
      val vid = SparkEntry.queries("q113_video_meta")(s, d)
        .select(col("doc_id"),
          ((col("duration").cast("double") / col("timescale").cast("double"))
            <= lit(60.0)).as("vid_ok"))
      img.join(aud, "doc_id").join(vid, "doc_id")
        .withColumn("keep", col("img_ok") && col("aud_ok") && col("vid_ok"))
        .select(col("doc_id"), col("img_ok"), col("aud_ok"), col("vid_ok"),
          col("keep"))
        .orderBy("doc_id")
    }),

    // ---- sketch-accuracy audit: HLL estimate vs exact distinct ----
    "q152_hll_error_audit" -> ((s, d) => {
      val est = Sketches.hllDistinct(Tables.documents(s, d), Seq("lang"),
        col("text"))
      val exact = Tables.documents(s, d).groupBy("lang")
        .agg(countDistinct(col("text")).as("exact_distinct"))
      est.join(exact, "lang")
        .select(col("lang"), col("exact_distinct"), col("est_distinct"),
          trunc6(abs(col("est_distinct") - col("exact_distinct").cast("double")) /
            col("exact_distinct").cast("double")).as("rel_error"))
        .orderBy("lang")
    }),

    // ---- bucketed co-located join: neither side shuffles (the
    // persisted-layout answer to a hot repeated join key) ----
    "q153_bucketed_join" -> ((s, d) => {
      val (ot, ct) = bucketedTablesFor(s, d)
      s.table(ot)
        .join(s.table(ct).hint("merge"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          xsum(col("o_totalprice")).as("revenue"))
        .orderBy("c_mktsegment")
    }),

    // ---- set-operator coverage: INTERSECT/EXCEPT with set semantics ----
    "q148_set_ops" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_custkey")
      val low = o.filter(col("o_orderpriority") === "5-LOW")
        .select("o_custkey")
      urgent.intersect(low).withColumn("relation", lit("both"))
        .unionByName(urgent.except(low)
          .withColumn("relation", lit("urgent_only")))
        .withColumnRenamed("o_custkey", "custkey")
        .orderBy("custkey", "relation")
    }),

    // ---- TPC-H Q5 shape: six-table join, small dims broadcast,
    // same-nation customer/supplier constraint ----
    "q136_tpch_q5" -> ((s, d) => {
      val joined = Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
      joined.filter(col("r_name") === "ASIA")
        .groupBy("n_name")
        .agg(trunc6(xsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // ---- power-of-two length histogram (batch-shape planning):
    // floor(log2) via the EXACT integer bin-string length ----
    "q137_length_buckets" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("n_chars") > 0)
        .withColumn("bucket", (length(bin(col("n_chars"))) - 1).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy("bucket")),

    // ---- 2-core of a duplication graph with real structure: docs
    // < 60 appear as (orig, exact copy, near copy) triangles — they
    // survive the peel; docs 60-99 pair only with one near copy —
    // isolated edges, peeled away. Convergence-asserted. ----
    "q134_kcore" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
        .filter(col("doc_id") < 100)
      val tri = docs.filter(col("doc_id") < 60)
      val dropFirst = expr("substring(text, instr(text, ' ') + 1)")
      val corpus = docs
        .unionByName(tri.select((col("doc_id") + 10000).as("doc_id"), col("text")))
        .unionByName(tri.select((col("doc_id") + 20000).as("doc_id"),
          dropFirst.as("text")))
        .unionByName(docs.filter(col("doc_id") >= 60)
          .select((col("doc_id") + 10000).as("doc_id"), dropFirst.as("text")))
      val pairs = Dedup.ngramJaccardPairs(corpus, n = 3, threshold = 0.5)
      val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      GraphOps.kCore(edges, k = 2, rounds = 4)
    }),

    // ---- sketch-clipped robust sums: DDSketch bounds broadcast onto
    // one clipping scan — no quantile sort at any scale ----
    "q125_winsorized_stats" -> ((s, d) =>
      Sketches.winsorizedStats(Tables.lineitem(s, d), Seq("l_returnflag"),
        col("l_extendedprice"), loQ = 0.05, hiQ = 0.95)),

    // ---- MERGE upsert through the real manifest layer: matched keys
    // replaced, unmatched inserted, only touched buckets rewritten ----
    "q126_merge_upsert" -> ((s, d) =>
      pipeline.TableOps.read(s, mergeTableFor(s, d))
        .select(col("user_id").as("doc_id"),
          length(col("text")).cast("long").as("text_len"))
        .orderBy("doc_id")),

    // ---- the full corpus-cleaning recipe (C4/Gopher lineage), one scan
    // pass + one dedup shuffle: language allowlist → quality floor →
    // repetition ceiling → deterministic sample → PII redaction → exact
    // dedup; and its one-pass per-stage audit report ----
    "q63_clean_corpus" -> ((s, d) =>
      TextAnalysis.cleanCorpus(docsWithCopies(s, d), Oracles.LangMarkers, CleanSpec)),

    "q64_clean_report" -> ((s, d) =>
      TextAnalysis.cleanReport(docsWithCopies(s, d), Oracles.LangMarkers, CleanSpec)),

    // ---- duplicate-cluster resolution: the keep-one-per-group step
    // after pair mining. Three variants per doc (original, exact copy,
    // first-word-dropped) so clusters close TRANSITIVELY over the pair
    // list; every member labels with the family's smallest doc id ----
    "q62_duplicate_clusters" -> ((s, d) =>
      Dedup.duplicateClusters(
        Dedup.ngramJaccardPairs(docsWithDupFamilies(s, d), n = 3,
          threshold = 0.5), ordered = true)),

    // ---- canonical selection: after cluster resolution, KEEP exactly
    // one member per cluster — the highest-quality copy (doc_id breaks
    // exact-copy ties). Per-cluster argmax rides the bounded-heap
    // TopKPerKey operator with k=1; singletons keep themselves.
    // Cluster labels come from the session cache (the q62 result,
    // materialized once per dataset): in a real deployment canonical
    // selection consumes an already-resolved label table rather than
    // re-mining pairs, so this prices only the selection step ----
    "q82_canonical_per_cluster" -> ((s, d) => {
      val corpus = docsWithDupFamilies(s, d)
      Dedup.canonicalPerCluster(
        corpus.select(col("doc_id"),
          TextAnalysis.qualityExpr(col("text")).as("quality")),
        dupLabelsFor(s, d),
        "quality")
    }),

    // ---- multimodal binary columns: synthesize media from text bytes,
    // explode into even frame slices — the frame-sampling plumbing is
    // pure expressions (binary substring) and oracle-checked; only the
    // codec kernel itself is a stub ----
    "q51_multimodal_frames" -> ((s, d) => {
      val media = Multimodal.synthesize(
        Tables.documents(s, d).filter(col("doc_id") < 200), "doc_id", "text")
      Multimodal.sampleFrames(media)
        .select(col("media_id"), col("kind"),
          col("frame_idx").cast("long").as("frame_idx"),
          md5(col("frame").cast("string")).as("frame_hash"),
          length(col("frame")).cast("long").as("frame_bytes"))
        .orderBy("media_id", "frame_idx")
    }),

    // ---- chunking ----
    "q32_char_chunks" -> ((s, d) =>
      Chunking.characterChunks(
        Tables.documents(s, d).filter(col("doc_id") < 50),
        "doc_id", "text", size = 200, overlap = 20)),

    "q33_message_chunks" -> ((s, d) =>
      Chunking.messageChunks(
        Tables.events(s, d).filter(col("user_id") < 10),
        groupCol = "user_id", seqCol = "event_id",
        roleCol = "event_type", contentCol = "props")),

    "q34_token_budget_chunks" -> ((s, d) =>
      Chunking.tokenBudgetChunks(
        Tables.documents(s, d), groupCol = "source", seqCol = "doc_id",
        contentCol = "text", budget = 500)
        .drop("m0_raw_ids")), // lineage column has no SQL twin

    // ---- graph ----
    "q35_graph_neighbors" -> ((s, d) =>
      GraphOps.neighbors(graphEdges(s, d), graphVertices(s, d),
        srcId = 1L, relation = Some("A"), topK = 20)),

    "q36_two_hop" -> ((s, d) => {
      val e = graphEdges(s, d)
      val bidir = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst"),
          col("relation"), col("weight")))
      GraphOps.twoHop(bidir, srcId = 1L, topK = 20)
    }),

    "q37_edges_between" -> ((s, d) =>
      GraphOps.edgesBetween(graphEdges(s, d), 1L, 101967L, None)),

    // ---- graph semantic query (K5): cosine top-k over STORED vertex
    // embeddings (encoded once per dataset at "ingest", cached), md5-
    // sign encoded so the oracle rebuilds the exact similarity from
    // md5() alone. The measured plan is score-stored-vectors — the
    // per-query-encode variant was the K5 anti-pattern ----
    "q45_graph_semantic" -> ((s, d) =>
      GraphOps.semanticQuery(
        vertexEmbeddingsFor(s, d),
        pipeline.Md5SignEncoder().encodeOne(GraphQueryText), 20)),

    // ---- per-key top-k through the custom TopKPerKey plan node
    // (bounded heaps + one exchange — no windowed sort); the oracle is
    // the equivalent row_number window ----
    "q52_topk_per_key" -> ((s, d) =>
      graft.plans.TopKPerKey(
        Tables.lineitem(s, d)
          .select("l_suppkey", "l_extendedprice", "l_orderkey", "l_linenumber"),
        Seq("l_suppkey"),
        Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")),
        k = 3)
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"))
        .orderBy(col("l_suppkey"), col("l_extendedprice").desc,
          col("l_orderkey"), col("l_linenumber"))),

    // ---- array lineage join (J2 shape: array membership → explode-join) ----
    "q38_lineage_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_orderkey") < 500)
      val withParts = li.groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_partkey"))).as("part_ids"))
        .select(col("l_orderkey"), explode(col("part_ids")).as("pk"))
      val p = Tables.part(s, d)
      withParts.join(p, withParts("pk") === p("p_partkey"))
        .groupBy("l_orderkey")
        .agg(countDistinct(col("p_brand")).as("n_brands"), count(lit(1)).as("n_parts"))
        .orderBy("l_orderkey")
    }),

    // ---- scalar function suite (§2.7) ----
    "q39_scalar_suite" -> ((s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          contentHash(col("text")).as("content_hash"),
          md5Long(col("text")).as("h52"),
          concat(lit("["), col("lang"), lit("] "), col("source")).as("tag"),
          length(col("text")).cast("long").as("n_chars_sql"),
          lower(col("text")).contains("join").as("has_join"))
        .orderBy("doc_id")),

    // ---- CJK-aware token counting (A7 fallback semantics:
    // whitespace words + one token per Han char, ×1.3 estimate —
    // reference utils/token_counter.py:114-160) ----
    "q42_token_count_cjk" -> ((s, d) => {
      val nWs = size(tokens(col("text"))).cast("long")
      val nCjk = (length(col("text")) -
        length(regexp_replace(col("text"), "\\p{IsHan}", ""))).cast("long")
      Tables.documents(s, d).select(
        col("doc_id"),
        nWs.as("n_ws_tokens"),
        nCjk.as("n_cjk_chars"),
        floor((nWs + nCjk) * lit(1.3)).cast("long").as("token_estimate"))
        .orderBy("doc_id")
    }),

    // ---- two-stage retrieval (K8 shape: recall 2k by cosine, rerank by
    // a second scorer, cut to k — reference memory_service.py:1553,1778) ----
    "q43_two_stage_rerank" -> ((s, d) => {
      val k = 10
      val qTokens = KwQuery.split(" ").distinct
        .filterNot(graft.functions.TextFunctions.StopWords.contains)
      val stage1 = Retrieval.cosineKnn(Tables.embeddings(s, d), KnnQueryId, 2 * k)
      val docs = Tables.documents(s, d)
      val overlap = size(array_intersect(tokenSet(col("text")), lit(qTokens)))
        .cast("double") / lit(qTokens.length.toDouble)
      stage1.join(docs, stage1("id") === docs("doc_id"))
        .withColumn("rerank_score",
          trunc6(col("score") * 0.7 + overlap * 0.3))
        .select(col("id"), col("score"), col("rerank_score"))
        .orderBy(col("rerank_score").desc, col("id"))
        .limit(k)
    }),

    // ---- JSON metadata serde (§2.7): parse the events props JSON into
    // a MapType and extract typed values — the JSONB edge of the memory
    // tables, oracle-checked against DuckDB's JSON functions ----
    "q48_metadata_json" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("meta",
          from_json(col("props"), graft.pipeline.Schemas.MetadataType))
        .select(col("event_id"),
          col("meta")("k").cast("long").as("k_value"),
          size(map_keys(col("meta"))).cast("long").as("n_keys"),
          (col("meta")("k").cast("long") % 10 === 0).as("k_mod10"))
        .filter(col("k_value").isNotNull)
        .orderBy("event_id")),

    // ---- conflict detection (H6): equi-join candidates + md5-sign
    // cosine verify + rule verdicts — no cartesian anywhere ----
    "q44_conflicts" -> ((s, d) => {
      val (oldFacts, newFacts) = factCorpora(s, d)
      pipeline.SemanticLayer
        .detectConflicts(newFacts, oldFacts, pipeline.Md5SignEncoder(), 0.5)
        .orderBy("new_id", "old_id")
    }),

    // ---- first-wins union dedup (T4) ----
    "q40_first_wins_dedup" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val prio = hybridInputs(s, d)
        .withColumn("priority", when(col("store_type") === "vector", 1).otherwise(2))
      val w = Window.partitionBy("id")
        .orderBy(col("priority"), col("score").desc)
      prio.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id"), col("score"), col("store_type"))
        .orderBy("id")
    }),
  ) ++ SharedSqlQueries.map { case (name, views, text) =>
    name -> ((s: SparkSession, d: String) => sharedSqlRun(s, d, views, text))
  }.toMap

  /** Bench-only entries (no oracle): measured by [[Bench]] alongside the
    * oracle-checked queries, named x* so the bench log separates them.
    * These cover paths whose VALUE is performance, not a new result:
    * the realistic (nProbe < nlist) IVF probe, and the facade's hybrid
    * query with and without its persisted side indexes on the same
    * corpus — the scan-vs-index win measured head to head. */
  /** Per-(combo) exact-top-10 hit counts behind the q168/q321/q328
    * frontiers, in ONE codes scan per query: [[pipeline.IvfPq.adcSweep]]
    * ranks every vector once at full probe width with its cell rank
    * carried, exact cosines are scored once per (query, vector), and
    * each (nProbe, oversample) operating point derives as a broadcast
    * filter + two windowed cuts — exactly the optimization the DuckDB
    * oracle replay already used (the 12-probe union form ran 12 scans
    * + 12 rescores per query; q328's 36-branch union took 5.9 s where
    * this takes one scan + one window pass). Candidate semantics are
    * operator-identical to `adcTopKRescored`: rank by (adc_dist, id)
    * within the probed cells, keep 10·oversample, exact-rescore by
    * (score desc, id), keep 10. */
  private def frontierHits(s: SparkSession, d: String,
      qids: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val idx = ivfPqIndexFor(s, d)
    val sweeps = qids.map { qid =>
      pipeline.IvfPq.adcSweep(idx.codes, idx.model,
        queryVecFor(s, d, qid), excludeId = Some(qid))
        .withColumn("qid", lit(qid))
    }.reduce(_ unionByName _)
    val qvecs = qids.map(qid => (qid, queryVecFor(s, d, qid).toSeq))
      .toDF("qid", "qvec")
    val scored = Tables.embeddings(s, d).crossJoin(broadcast(qvecs))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("id"),
        trunc6(VectorFunctions.cosine(col("embedding"), col("qvec")))
          .as("score"))
    // every corpus-sized cut rides the bounded-heap TopKPerKey (window
    // fallback on plain sessions, the cosineKnnBatch pattern): a
    // row_number window partitioned by (qid, combo) would sort
    // corpus-sized partitions with parallelism capped at |qids|·12 —
    // the heap cuts per-partition first, and the rank windows below
    // only ever see the bounded survivors
    val heap = s.sessionState.planner
      .strategies.exists(_ eq graft.plans.TopKPerKeyStrategy)
    val wTop = Window.partitionBy("qid").orderBy(col("score").desc, col("id"))
    val etop = (if (heap)
        graft.plans.TopKPerKey(scored, Seq("qid"),
          Seq(col("score").desc, col("id")), 10)
      else scored.withColumn("rn", row_number().over(wTop))
        .filter(col("rn") <= 10))
      .select(col("qid"), col("id"), lit(1L).as("hit"))
    val combos = (for { np <- FrontierProbes; os <- FrontierOversamples }
      yield (np.toLong, os.toLong)).toDF("n_probe", "oversample")
    val cand = sweeps
      .join(broadcast(combos), col("cell_rank") <= col("n_probe"))
    val kMax = 10 * FrontierOversamples.max
    val cut = if (heap)
      graft.plans.TopKPerKey(cand, Seq("qid", "n_probe", "oversample"),
        Seq(col("adc_dist"), col("id")), kMax)
    else cand
    val wAdc = Window.partitionBy("qid", "n_probe", "oversample")
      .orderBy(col("adc_dist"), col("id"))
    val pool = cut.withColumn("rn", row_number().over(wAdc))
      .filter(col("rn") <= lit(10L) * col("oversample"))
      .select("qid", "id", "n_probe", "oversample")
    // the pool is bounded (≤ kMax rows per combo) — broadcast it so the
    // corpus-sized exact-score stream joins map-side, never shuffling
    val wSc = Window.partitionBy("qid", "n_probe", "oversample")
      .orderBy(col("score").desc, col("id"))
    val got = scored.join(broadcast(pool), Seq("qid", "id"))
      .withColumn("rr", row_number().over(wSc)).filter(col("rr") <= 10)
      .join(etop, Seq("qid", "id"), "left")
      .groupBy("n_probe", "oversample")
      .agg(sum(coalesce(col("hit"), lit(0L))).as("h"))
    // left-join back onto the combo grid: an operating point with ZERO
    // candidates (e.g. an empty rank-1 coarse cell at n_probe=1) must
    // still appear as a hits=0 row — the DuckDB oracle LEFT JOINs from
    // the combos and emits it, so dropping it would diverge
    combos.join(got, Seq("n_probe", "oversample"), "left")
      .select(col("n_probe"), col("oversample"),
        coalesce(col("h"), lit(0L)).as("hits"))
  }

  /** The q168 recall/cost frontier: overlap@10 of the rescored IVF-PQ
    * probe against the exact scan at every (nProbe, oversample)
    * operating point — [[frontierHits]] over the single tuning query.
    * Shared by q168 (the frontier as data) and q321 (the auto-tuner's
    * selection over it). */
  private def annFrontier(s: SparkSession, d: String): DataFrame =
    frontierHits(s, d, Seq(KnnQueryId))
      .select(col("n_probe"), col("oversample"),
        col("hits").as("overlap_at_10"))
      .orderBy("n_probe", "oversample")

  /** The held-out recall frontier behind q328: mean recall@10 over
    * [[HeldoutQueryIds]] per (nProbe, oversample) operating point —
    * the q168 sweep generalized from one tuning query's overlap to the
    * quantity an ANN deployment SLAs. [[frontierHits]] prices it at
    * one codes scan + one exact-score pass PER QUERY (3 queries × 12
    * combos would otherwise be 36 probe plans). */
  private def annFrontierHeldout(s: SparkSession, d: String): DataFrame =
    frontierHits(s, d, HeldoutQueryIds)
      .select(col("n_probe"), col("oversample"),
        trunc6(col("hits").cast("double") /
          lit(10.0 * HeldoutQueryIds.size)).as("mean_recall"))
      .orderBy("n_probe", "oversample")

  /** Pre-materialized fusion input (the ~100-row vector ∪ keyword
    * union) and pre-fused frame — stage fixtures letting the x4x
    * entries time the fusion CORE and the hydration join separately
    * from the input scans (round-8 verdict #2: decompose the
    * fusion-family drift instead of theorizing about it). */
  // keys carry the session REFERENCE itself (reference equality — no
  // identityHashCode collision can ever serve a frame bound to the
  // wrong session): persisted frames die with their session, so a
  // second SparkSession in the same JVM (per-suite test sessions) must
  // rebuild rather than touch a dead session's blocks. Entries of
  // stopped sessions are dropped at each access, so dead per-suite
  // sessions and their frames don't stay pinned for the JVM lifetime.
  private val fusionStageCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private def stageCached(s: SparkSession, key: String)
      (build: => DataFrame): DataFrame = {
    fusionStageCache.keys.filter(_._1.sparkContext.isStopped)
      .foreach(fusionStageCache.remove)
    fusionStageCache.getOrElseUpdate((s, key), build)
  }
  private def fusionInputsFor(s: SparkSession, d: String): DataFrame =
    stageCached(s, s"$d#in") {
      val df = hybridInputs(s, d).persist(); df.count(); df
    }
  private def fusedFor(s: SparkSession, d: String): DataFrame =
    stageCached(s, s"$d#fused") {
      val df = Fusion.rrf(fusionInputsFor(s, d), RrfK, FusionWeights, 15)
        .persist()
      df.count(); df
    }

  def benchExtras: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- fusion drift decomposition (round-8 verdict #2): the family's
    // stages timed separately — the two input scans and their union,
    // the fusion arithmetic over a PRE-MATERIALIZED input, and the
    // hydration join over a pre-fused frame. q24–q26 ≈ stage_union +
    // core; q27 adds hydrate. Whichever stage drifts round-over-round
    // owns the family's drift. ----
    "x40_fusion_stage_vector" -> ((s, d) =>
      Retrieval.cosineKnn(Tables.embeddings(s, d), KnnQueryId, 50)),
    "x41_fusion_stage_keyword" -> ((s, d) =>
      Retrieval.bm25(Tables.documents(s, d), Bm25Terms, 50)),
    "x42_fusion_stage_union" -> ((s, d) => hybridInputs(s, d)),
    "x43_fusion_core_rrf" -> ((s, d) =>
      Fusion.rrf(fusionInputsFor(s, d), RrfK, FusionWeights, 20)),
    "x44_fusion_core_normalized" -> ((s, d) =>
      Fusion.normalizedWeightedSum(fusionInputsFor(s, d), FusionWeights, 20)),
    "x45_fusion_stage_hydrate" -> ((s, d) => {
      val fused = fusedFor(s, d)
      val docs = Tables.documents(s, d)
      fused.join(docs, fused("id") === docs("doc_id"))
        .select(col("id"), col("fused_score"), col("lang"), col("source"),
          substring(col("text"), 1, 80).as("preview"))
        .orderBy(col("fused_score").desc, col("id"))
    }),

    // realistic IVF probe: 2 of 8 clusters scanned; recall pinned by
    // IvfSpec, exactness of the exhaustive probe by q47's oracle
    "x47_ivf_probe2" -> ((s, d) =>
      ivfIndexFor(s, d).query(ivfQueryVec(s, d), topK = 20, nProbe = 2,
        excludeId = Some(KnnQueryId))),

    // substring dedup priced at corpus scale (q322 runs the oracle-sized
    // 200-doc cut): the full near-dup corpus — 2x documents, one
    // shingle shuffle + semi-join + per-doc window. Round 10 switched
    // this rung to HASHED shuffle keys (xxhash64'd fixed-width longs —
    // the production key shape; q327 pins hash≡text on the oracle cut),
    // so its round-over-round delta prices exactly what pre-hashing
    // buys the ladder's worst curve (r9 corpus ratio ×8.25)
    "x49_dup_spans_corpus" -> ((s, d) =>
      Dedup.duplicatedSpans(docsWithNearDups(s, d), k = 8, hashKeys = true)),

    // span REMOVAL priced at the same corpus scale (q323 runs the
    // 200-doc oracle cut): detection's shuffle + the covered-token
    // fan-out (≤k rows/occurrence) + per-doc re-assembly — the ladder
    // rung for the claim that re-assembly stays bounded by doc length
    "x48_span_removal_corpus" -> ((s, d) =>
      Dedup.spanRemoval(docsWithNearDups(s, d), k = 8, hashKeys = true)),

    // incremental span dedup, the crawl-ingest pair: the SAME 100-doc
    // batch against a PERSISTED corpus shingle index at 1× and 2× the
    // corpus — flat latency across the doubling is the operator's whole
    // claim (batch cost independent of corpus size); x52 prices the
    // recompute formulation on the 2× corpus for contrast (the
    // O(corpus)-per-batch tax the index removes)
    "x50_inc_spans_indexed_1x" -> ((s, d) =>
      Dedup.incrementalSpansIndexed(spanBatchFor(s, d),
        shingleIndexFor(s, d, twoX = false), k = 8, hashKeys = true)),
    "x51_inc_spans_indexed_2x" -> ((s, d) =>
      Dedup.incrementalSpansIndexed(spanBatchFor(s, d),
        shingleIndexFor(s, d, twoX = true), k = 8, hashKeys = true)),
    "x52_inc_spans_recompute_2x" -> ((s, d) =>
      Dedup.incrementalSpans(spanBatchFor(s, d),
        docsWithSaltedCopies(s, d), k = 8)),
    // the Bloom-prefiltered rung on the same 2× index (snapshot built
    // untimed as a fixture): prices what the O(batch) map-side probe
    // saves the exact confirm at this index size
    "x53_inc_spans_bloom_2x" -> ((s, d) =>
      Dedup.incrementalSpansBloom(spanBatchFor(s, d),
        shingleIndexFor(s, d, twoX = true), shingleBloomFor(s, d),
        k = 8, hashKeys = true)),

    // the WRITE-side twin of the x50/x51 pair: one full span-ingest
    // fold step (detection + batch-sized delta append + meta CAS)
    // against a pre-seeded log whose compacted base is the 1×/2×
    // corpus index — flat across the doubling is the log-structured
    // fold's whole claim (per-batch ingest cost independent of index
    // size; round-10 verdict #1's "x51 twin")
    "x68_span_fold_1x" -> ((s, d) => spanFoldBench(s, d, twoX = false)),
    "x69_span_fold_2x" -> ((s, d) => spanFoldBench(s, d, twoX = true)),

    // the COMPACTION twin of x68/x69 (round-11 verdict #1): one L1
    // compaction cycle (two folds, the second folding the loose deltas
    // into a run) against the 1×/2× seeded base — flat across the
    // doubling is the tiered log's claim that NO cadence step ever
    // re-aggregates the index (the r11 form paid O(index) here)
    "x6a_span_compact_1x" -> ((s, d) => spanCompactBench(s, d, twoX = false)),
    "x6b_span_compact_2x" -> ((s, d) => spanCompactBench(s, d, twoX = true)),

    // the base-ABSORPTION twin (r12 verdict next-round #4): one cadence
    // step that folds the loose deltas straight into the shard-bucketed
    // base — prices the touched-segment rewrite, the one span-LSM
    // moment x6a/x6b pin OUT by design. Expected bucket-proportional
    // (≈ base-size ratio across the doubling), not flat.
    "x6c_span_absorb_1x" -> ((s, d) => spanAbsorbBench(s, d, twoX = false)),
    "x6d_span_absorb_2x" -> ((s, d) => spanAbsorbBench(s, d, twoX = true)),


    // z-order vs single-sort layout under a two-sided band scan: the
    // same aggregate over the same rows, different on-disk clustering —
    // prices what Morton layout buys parquet row-group pruning
    // deflate-ratio quality gate: zlib is JNI-only (no SQL oracle
    // possible) — spec'd in OperatorSpec, benched here
    "x66_compression_ratio" -> ((s, d) =>
      TextAnalysis.compressionRatio(Tables.documents(s, d))),

    // the amortization pair for q161: the SAME five queries as five
    // separate corpus scans — q161's one-scan batch should beat this
    "x67_knn_five_single_scans" -> ((s, d) =>
      Seq(0L, 7L, 11L, 23L, 42L).map(q =>
        Retrieval.cosineKnn(Tables.embeddings(s, d), q, topK = 5)
          .withColumn("qid", lit(q)))
        .reduce(_ unionByName _)),

    "x64_zorder_scan" -> ((s, d) => {
      val (z, _, loU, hiU, loT, hiT) = zLayoutFor(s, d)
      zScanProbe(s, z, loU, hiU, loT, hiT)
    }),
    "x65_tsorted_scan" -> ((s, d) => {
      val (_, srt, loU, hiU, loT, hiT) = zLayoutFor(s, d)
      zScanProbe(s, srt, loU, hiU, loT, hiT)
    }),

    // q61's decontamination at ITS params (n=8, >=1) through the Bloom
    // prefilter path — the true head-to-head for the big-eval-suite
    // scale plan (q83 runs tighter params, so this pair is the honest
    // comparison; results are identical by construction)
    "x63_contamination_bloom" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      Dedup.contaminationBloom(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0), n = 8)
    }),

    "x55_facade_query_scan" -> ((s, d) =>
      facadeFor(s, d).query(KwQuery, FacadeUser, topK = 10)),

    "x56_facade_query_indexed" -> ((s, d) =>
      facadeFor(s, d).query(KwQuery, FacadeUser, topK = 10,
        useIndexes = true, nProbe = 2)),

    // the PQ-backed twin of x56: ADC over 16-byte codes + exact rescore
    // of the oversampled candidates, on an identical warehouse
    "x60_facade_query_pq" -> ((s, d) =>
      facadePqFor(s, d).query(KwQuery, FacadeUser, topK = 10,
        useIndexes = true)),

    // the IVF-PQ-backed twin of x56/x60: residual-ADC over 2 of 8
    // probed cells (partition pruning) + exact rescore, on an
    // identical warehouse
    "x62_facade_query_ivfpq" -> ((s, d) =>
      facadeIvfPqFor(s, d).query(KwQuery, FacadeUser, topK = 10,
        useIndexes = true, nProbe = 2)),

    // the codegen'd array-ADC twin of q70: the compressed scan is ONE
    // per-row PqAdc projection feeding TakeOrdered — no code explode,
    // no LUT join, no aggregation exchange; prices the fast path
    // against q70's decimal-exact row form on the same saved index
    "x61_knn_pq_fast" -> ((s, d) =>
      pqIndexFor(s, d).query(ivfQueryVec(s, d), topK = 20,
        excludeId = Some(KnnQueryId), fast = true)),

    // the model-scoring rerank path, measured against x55's overlap
    // heuristic on the SAME warehouse: the trained cross-encoder runs
    // its P-projection + MLP forward per candidate pair — the cost a
    // real ONNX reranker slot would pay, benched not just spec'd
    "x57_facade_query_trained_ce" -> ((s, d) =>
      facadeCeFor(s, d).query(KwQuery, FacadeUser, topK = 10)),

    // session-scoped retrieval, scan vs indexed, on the shared
    // warehouse (50 sessions → one session ≈ 2% of the corpus): the
    // indexed path over-fetches by scope selectivity, so this pair
    // prices that recall guarantee against the bucket-pruned scan
    "x58_facade_scoped_scan" -> ((s, d) =>
      facadeFor(s, d).query(KwQuery, FacadeUser, topK = 10,
        sessionId = Some("s7"))),

    "x59_facade_scoped_indexed" -> ((s, d) =>
      facadeFor(s, d).query(KwQuery, FacadeUser, topK = 10,
        sessionId = Some("s7"), useIndexes = true, nProbe = 2)),

    // one full churn cycle on a dedicated small warehouse: ingest a
    // session → cascade-delete it (tombstoning the indexes) → maintain
    // (commit-marker fold, compaction, vacuum, stale-triggered index
    // rebuild) → query. Prices the maintenance cadence every
    // deletion-churn deployment pays, instead of only spec'ing it.
    "x90_facade_churn_maintain" ->
      ((s, d) => churnCycle(s, d, "ivf", "x90_facade_churn_maintain")),
    // the same cycle on the OTHER vector backends: the tombstone /
    // stale-rebuild lifecycle is backend-specific machinery (PQ re-
    // encodes against its codebook, IVF-PQ against residual codebooks),
    // so each backend's maintenance cost is priced, not just spec'd
    "x91_facade_churn_pq" ->
      ((s, d) => churnCycle(s, d, "pq", "x91_facade_churn_pq")),
    "x92_facade_churn_ivfpq" ->
      ((s, d) => churnCycle(s, d, "ivfpq", "x92_facade_churn_ivfpq")),

    // ---- streaming-path throughput (the reference's §2.8 buffer
    // system is its performance centerpiece — hybrid_buffer.py's 60 s
    // flush cadence): these price the stream recipes end-to-end as
    // multi-micro-batch runs instead of only spec'ing their semantics.
    // MemoryStream inputs necessarily originate driver-side (the
    // standard Spark streaming micro-bench shape) — the fed slices are
    // BOUNDED, and all heavy work (batching state, encoding, bucketed
    // appends, index absorption, dedup state) runs distributed. x9
    // prefix → isolated from the comparative passes (side-effectful). ----
    "x93_stream_ingest_e2e" -> ((s, d) =>
      streamIngestBench(s, d, entryName = "x93_stream_ingest_e2e")),
    "x94_stream_clean" -> ((s, d) =>
      streamCleanBench(s, d, entryName = "x94_stream_clean")),
    "x95_stream_backfill" -> ((s, d) => streamBackfillBench(s, d)),
    // throughput amortization ladder (round-8 verdict #4): the SAME
    // pipeline and 6-batch shape at 10× and 100× the x93 message count;
    // rows/s = n_messages / entry wall time. Fixed per-micro-batch
    // overhead (state round, commit marker, file commit) should make
    // rows/s grow ~10× per 10× batch size
    "x96_stream_ingest_6k" -> ((s, d) =>
      streamIngestBench(s, d, 6000, "x96_stream_ingest_6k")),
    "x97_stream_ingest_60k" -> ((s, d) =>
      streamIngestBench(s, d, 60000, "x97_stream_ingest_60k")),
    // warm-path facade latency (round-8 verdict #5): repeated-query p50
    // for the B5 result cache's hit and miss paths, measured separately
    "x98_facade_warm_query" -> ((s, d) => facadeWarmBench(s, d)),
    // the clean-path amortization rung (x96/x97's contract for x94):
    // SAME recipe and 4-batch shape at ~4× the x94 document count
    "x99_stream_clean_24k" -> ((s, d) =>
      streamCleanBench(s, d, 24000, "x99_stream_clean_24k")),
    // the fourth throughput decade (x93→x96→x97→here: 600 → 6k → 60k →
    // 600k messages, identical pipeline and 6-batch shape): rows/s =
    // 600000 / wall either continues the ~10×-per-decade amortization
    // line or exposes the knee where per-row work overtakes per-batch
    // fixed overhead — committed as data instead of extrapolated.
    // Fed from a PARQUET FILE STREAM (round-10 verdict #2): the
    // MemoryStream instrument held 600k driver-resident rows and was
    // itself the bottleneck at this rung (records diverged 4.4×)
    // ("x9a" sorts after x99, keeping the isolated block's order)
    "x9a_stream_ingest_600k" -> ((s, d) =>
      streamIngestBenchFile(s, d, 600000, "x9a_stream_ingest_600k")),
  )

  /** Warm-path latency decomposition for [[pipeline.MemFuse.queryCached]]
    * (the reference's ms-scale cached-retrieval envelope,
    * docs/optimization/performance/README.md:66-73): 21 distinct
    * queries time the MISS path (first one dropped — it also rebuilds
    * the cleared views), then 20 repeats of one primed key time the HIT
    * path. p50s land in [[churnPhaseTimings]] → the bench JSON's
    * `phases` block; the entry's own wall time is the whole experiment. */
  private def facadeWarmBench(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val eng = facadeFor(s, d)
    eng.clearCache()
    def p50(ts: Seq[Double]): Double = { val x = ts.sorted; x(x.length / 2) }
    def timeOne(q: String): Double = {
      val t0 = System.nanoTime()
      eng.queryCached(q, FacadeUser, topK = 10)
      (System.nanoTime() - t0) / 1e9
    }
    val missT = (0 until 21).map(i => timeOne(s"$KwQuery warm $i")).drop(1)
    val hitT = (0 until 20).map(_ => timeOne(s"$KwQuery warm 1"))
    churnPhaseTimings("x98_facade_warm_query") = Seq(
      "p50_miss" -> p50(missT), "p50_hit" -> p50(hitT))
    Seq((p50(missT), p50(hitT), missT.length.toLong, hitT.length.toLong))
      .toDF("p50_miss_sec", "p50_hit_sec", "n_miss", "n_hit")
  }

  /** Per-phase wall times of the LAST churn cycle per bench entry —
    * written by [[churnCycle]] on each run, drained by `Bench` into the
    * artifact's `"phases"` object so a regression inside one phase
    * (e.g. the stale rebuild firing every cycle) is attributable
    * instead of hiding in the cycle total. The residual `query` phase
    * (plan execution via the noop sink) is derived by Bench as
    * entry-total − Σ(recorded phases). */
  private[graft] val churnPhaseTimings =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(String, Double)]]

  /** One full churn cycle (ingest a session → cascade-delete it →
    * maintain with a low stale threshold → indexed query) on the
    * dedicated churn warehouse for `backend`. Ends at net-zero rows, so
    * bench passes stay comparable. */
  private def churnCycle(s: SparkSession, d: String, backend: String,
      entryName: String): DataFrame = {
    val eng = churnFacadeFor(s, d, backend)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      buf += name -> (System.nanoTime() - t0) / 1e9
      r
    }
    timed("ingest") {
      eng.createSession(ChurnSession, FacadeUser, "bench_agent")
      eng.ingest(Tables.documents(s, d).filter(col("doc_id") < 100).select(
        concat(lit("cm"), col("doc_id")).as("message_id"),
        lit(ChurnSession).as("session_id"),
        lit(FacadeUser).as("user_id"),
        concat(lit("cr"), col("doc_id")).as("round_id"),
        lit(1).as("sequence_number"),
        lit("user").as("role"),
        col("text").as("content"),
        lit("2024-06-01 00:00:00").cast("timestamp").as("created_at")))
    }
    timed("delete") { eng.deleteSession(ChurnSession) }
    eng.maintain(maxSegments = 2, indexStaleThreshold = 0.1,
      onPhase = (ph, sec) => buf += s"maintain_$ph" -> sec)
    val out =
      eng.query(KwQuery, FacadeUser, topK = 10, useIndexes = true, nProbe = 2)
    churnPhaseTimings(entryName) = buf.toSeq
    out
  }

  private val ChurnSession = "churn_session"

  /** End-to-end streaming ingest throughput: `nMessages` document-texts
    * as messages over 12 sessions, fed as SIX micro-batches through the
    * full [[graft.streaming.StreamingIngest.start]] pipeline (session
    * batching state → dual m0/m1 bucketed appends → commit markers →
    * per-insert index absorption) into a fresh throwaway warehouse.
    * Returns the run's row accounting; rows/s = n_messages / the bench
    * entry's wall time. The x93/x96/x97 family varies ONLY nMessages at
    * a fixed 6-batch shape, so the per-micro-batch fixed overhead
    * (state-store round, commit marker, file commit) amortizes with
    * batch size — the throughput-scaling evidence the reference's
    * headline ingest claim rests on (phase2_buffer_system.md:199-202).
    * Past sf0.1's 5000 docs the texts recycle (ids stay unique), so the
    * driver never collects more than the corpus. */
  private def streamIngestBench(s: SparkSession, d: String,
      nMessages: Int = 600, entryName: String = ""): DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val texts = Tables.documents(s, d)
      .filter(col("doc_id") < math.min(nMessages, 5000))
      .select(col("doc_id").cast("long"), col("text"))
      .orderBy("doc_id").collect()
      .map(_.getString(1))
    val msgs = (0 until nMessages).map { i =>
      val id = i.toLong
      pipeline.Schemas.Message(s"sm$id", s"ss${id % 12}", "u1", s"sr$id", i,
        "user", texts((i % texts.length).toInt),
        new java.sql.Timestamp(1717200000000L + id * 1000L))
    }
    val dir = graft.TempDirs.create("graft_sb_ingest").toString
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[pipeline.Schemas.Message]
    val q = graft.streaming.StreamingIngest.start(source.toDS(), dir,
      pipeline.HashingEncoder(), maxTokens = 400, timeoutMs = 0,
      checkpoint = s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    val tFeed0 = System.nanoTime()
    // tFeed closes right after the last processAllAvailable(), BEFORE
    // the finally stops the query — the fourth-decade knee claim rests
    // on feed owning the entry total, and q.stop() teardown must not
    // inflate that attribution
    var tFeed = 0.0
    try {
      msgs.grouped(math.max(1, nMessages / 6)).foreach { g =>
        source.addData(g.toSeq); q.processAllAvailable()
      }
      tFeed = (System.nanoTime() - tFeed0) / 1e9
    } finally q.stop()
    val nBatches = graft.streaming.StreamingIngest.committedBatchIds(s, dir).size
    val m1n = graft.streaming.StreamingIngest.m1Committed(s, dir).count()
    // phase attribution for the throughput-decade ladder: "feed" is the
    // six micro-batch rounds end to end (per-row encode/append + the
    // per-batch fixed overhead); the residual "query" phase Bench
    // derives is the setup + commit verification around it. The fourth
    // decade's knee claim (per-row work now dominates) rests on feed
    // owning the entry total at 600k.
    if (entryName.nonEmpty)
      churnPhaseTimings(entryName) = Seq("feed" -> tFeed)
    Seq((msgs.length.toLong, nBatches.toLong, m1n))
      .toDF("n_messages", "n_batches", "m1_chunks")
  }

  /** Pre-generated parquet message feeds for [[streamIngestBenchFile]],
    * keyed (dataset, n): six files of Message rows generated ENGINE-SIDE
    * (range × broadcast-joined document texts — the driver never
    * constructs or holds a message object) during the isolated entries'
    * untimed first cycle. Bytes on disk — session-free. */
  private val msgFeedCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def msgFeedFor(s: SparkSession, d: String, nMessages: Int): String =
    msgFeedCache.getOrElseUpdate(s"$d#$nMessages", {
      val dir = graft.TempDirs.create("graft_sb_feed").toString
      val docs = Tables.documents(s, d).filter(col("doc_id") < 5000)
        .select(col("doc_id"), col("text"))
      // dense 0-based text index via row_number, NOT the raw doc_id: a
      // sparse or non-zero-based doc_id domain would silently drop
      // messages on the pmod join while n_messages still reported the
      // full count (the tiny ≤5000-row frame makes the single-partition
      // window free)
      val texts = docs.select(
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("doc_id")) - 1).cast("long").as("__t"),
        col("text"))
      val nTexts = math.min(nMessages.toLong, math.max(1L, texts.count()))
      s.range(nMessages)
        .withColumn("__t", pmod(col("id"), lit(nTexts)))
        .join(broadcast(texts), Seq("__t"))
        .select(
          concat(lit("sm"), col("id")).as("message_id"),
          concat(lit("ss"), pmod(col("id"), lit(12L))).as("session_id"),
          lit("u1").as("user_id"),
          concat(lit("sr"), col("id")).as("round_id"),
          col("id").cast("int").as("sequence_number"),
          lit("user").as("role"),
          col("text").as("content"),
          timestamp_millis(lit(1717200000000L) + col("id") * lit(1000L))
            .as("created_at"))
        .repartitionByRange(6, col("sequence_number"))
        .write.mode("overwrite").parquet(dir)
      // the throughput claim divides by nMessages — a silently short
      // feed would inflate rows/s, so the written count is asserted
      val written = s.read.parquet(dir).count()
      require(written == nMessages.toLong,
        s"message feed wrote $written of $nMessages rows")
      dir
    })

  /** [[streamIngestBench]]'s harness-independent form for the largest
    * throughput decade (round-10 verdict #2): the feed is a
    * PARQUET-BACKED FILE STREAM read one file per trigger (six files =
    * the family's fixed six-micro-batch shape) instead of a
    * driver-resident MemoryStream — at 600k messages the MemoryStream
    * harness held every row on the driver and became the bottleneck it
    * was supposed to measure (committed vs driver records diverged
    * 4.4× with a 70 GB heap peak; the engine path itself reproduces to
    * 0.5% at 60k). The pipeline under test is IDENTICAL
    * ([[graft.streaming.StreamingIngest.start]] end to end); only the
    * instrument changed. */
  private def streamIngestBenchFile(s: SparkSession, d: String,
      nMessages: Int, entryName: String): DataFrame = {
    import s.implicits._
    val feedDir = msgFeedFor(s, d, nMessages)
    val dir = graft.TempDirs.create("graft_sb_ingest").toString
    val feed = s.readStream
      .schema(org.apache.spark.sql.Encoders.product[pipeline.Schemas.Message]
        .schema)
      .option("maxFilesPerTrigger", 1).parquet(feedDir)
      .as[pipeline.Schemas.Message]
    val q = graft.streaming.StreamingIngest.start(feed, dir,
      pipeline.HashingEncoder(), maxTokens = 400, timeoutMs = 0,
      checkpoint = s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    val tFeed0 = System.nanoTime()
    var tFeed = 0.0
    try {
      q.processAllAvailable()
      tFeed = (System.nanoTime() - tFeed0) / 1e9
    } finally q.stop()
    val nBatches = graft.streaming.StreamingIngest.committedBatchIds(s, dir).size
    val m1n = graft.streaming.StreamingIngest.m1Committed(s, dir).count()
    if (entryName.nonEmpty)
      churnPhaseTimings(entryName) = Seq("feed" -> tFeed)
    Seq((nMessages.toLong, nBatches.toLong, m1n))
      .toDF("n_messages", "n_batches", "m1_chunks")
  }

  /** Streaming clean throughput: the full stream-side cleaning recipe
    * (language gate, quality floor, repetition ceiling, PII redaction,
    * watermark-bounded exact dedup) over 4 micro-batches of document
    * rows. Output batches drain to the noop sink with every column
    * materialized; the returned frame carries the kept-row count. */
  private def streamCleanBench(s: SparkSession, d: String,
      explicitDocs: Int = 0, entryName: String = ""): DataFrame = {
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    // bounded like streamIngestBench's 600-doc cut: MemoryStream feeds
    // from the driver, so an uncapped collect of the documents table
    // would make the bench harness itself driver-bound at sf1+ (the
    // cap sits just above sf0.1's 5000 docs). With no explicitDocs the
    // workload is exactly the capped corpus — x94 prices the same rows
    // round over round. The x99 amortization rung passes a LARGER
    // explicitDocs — a bounded constant, not corpus-scaling — and past
    // the corpus the texts recycle with a per-row salt so the
    // watermark-bounded exact dedup sees distinct content (throughput
    // is priced, not dedup drops); ids stay unique either way.
    val base = Tables.documents(s, d).filter(col("doc_id") < 6000)
      .select(col("doc_id").cast("long"), col("text"))
      .orderBy("doc_id").collect().map(_.getString(1))
    val nDocs = if (explicitDocs > 0) explicitDocs else base.length
    val rows = (0 until nDocs).map { i =>
      val text =
        if (i < base.length) base(i) else base(i % base.length) + " #" + i
      (i.toLong, new java.sql.Timestamp(1717200000000L + i * 1000L), text)
    }.toArray
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, String)]
    val cleaned = graft.streaming.StreamingIngest.streamingClean(
      source.toDS().toDF("doc_id", "ts", "text"),
      Oracles.LangMarkers, CleanSpec, "ts", "10 minutes")
    val kept = new java.util.concurrent.atomic.AtomicLong()
    val q = cleaned.writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.persist()
        b.write.format("noop").mode("overwrite").save()
        kept.addAndGet(b.count())
        b.unpersist(); ()
      }.start()
    // phase attribution (r13 verdict #7: x94 swung 5x between records
    // with nothing in the artifact to attribute it): "feed" is the four
    // micro-batch rounds end to end, closed BEFORE q.stop() teardown;
    // the residual "query" phase Bench derives is corpus collect +
    // stream setup + teardown. A swing now names its phase.
    val tFeed0 = System.nanoTime()
    var tFeed = 0.0
    try {
      rows.grouped(math.max(1, rows.length / 4)).foreach { g =>
        source.addData(g.toSeq); q.processAllAvailable()
      }
      tFeed = (System.nanoTime() - tFeed0) / 1e9
    } finally q.stop()
    if (entryName.nonEmpty)
      churnPhaseTimings(entryName) = Seq("feed" -> tFeed)
    Seq((rows.length.toLong, kept.get()))
      .toDF("n_docs", "n_kept")
  }

  /** Embedding-backfill throughput (B7): a fresh m1 table where HALF
    * the chunks are flagged `needs_embedding`, then one
    * [[graft.streaming.StreamingIngest.embedBackfill]] pass — the
    * partial-index predicate reads only pending buckets and rewrites
    * only those; the encode itself is the dominant distributed cost. */
  private def streamBackfillBench(s: SparkSession, d: String): DataFrame = {
    val dir = graft.TempDirs.create("graft_sb_backfill").toString
    val docs = Tables.documents(s, d).select(
      concat(lit("bf"), col("doc_id")).as("chunk_id"),
      col("text").as("content"),
      lit("token_based").as("chunking_strategy"),
      size(split(col("text"), " ")).as("token_count"),
      typedlit(Array.empty[Float]).as("embedding"),
      array(concat(lit("m"), col("doc_id"))).as("m0_raw_ids"),
      concat(lit("u"), col("doc_id") % 8).as("user_id"),
      lit("s1").as("session_id"),
      (col("doc_id") % 2 === 0).as("needs_embedding"),
      lit("2024-06-01 00:00:00").cast("timestamp").as("created_at"),
      lit("2024-06-01 00:00:00").cast("timestamp").as("updated_at"))
    pipeline.TableOps.appendBucketed(docs, s"$dir/m1_episodic")
    val n = graft.streaming.StreamingIngest.embedBackfill(
      s, dir, pipeline.HashingEncoder())
    import s.implicits._
    Seq(n).toDF("n_backfilled")
  }

  /** Dedicated churn warehouse for x60 (NOT the shared x55/x56 one — the
    * churn cycle mutates tables and rebuilds indexes, which would skew
    * the scan/index pair): 300 docs ingested once, indexed; each bench
    * pass then runs one ingest→delete→maintain→query cycle that ends at
    * net-zero rows, so passes stay comparable. */
  private val churnFacadeCache =
    scala.collection.concurrent.TrieMap.empty[String, pipeline.MemFuse]
  private def churnFacadeFor(s: SparkSession, d: String,
      backend: String): pipeline.MemFuse =
    churnFacadeCache.getOrElseUpdate(s"$d#$backend", {
      val dir = graft.TempDirs.create("graft_churn").toString
      val eng = new pipeline.MemFuse(s, dir)
      eng.createUser(FacadeUser, "Bench User")
      eng.createAgent("bench_agent", "Bench Agent")
      eng.ingest(Tables.documents(s, d).filter(col("doc_id") >= 100 && col("doc_id") < 400)
        .select(
          concat(lit("m"), col("doc_id")).as("message_id"),
          concat(lit("s"), col("doc_id") % 10).as("session_id"),
          lit(FacadeUser).as("user_id"),
          concat(lit("r"), col("doc_id")).as("round_id"),
          lit(1).as("sequence_number"),
          lit("user").as("role"),
          col("text").as("content"),
          lit("2024-06-01 00:00:00").cast("timestamp").as("created_at")))
      eng.buildIndexes(nlist = 4, vectorIndex = backend)
      eng
    })

  private[graft] val FacadeUser = "bench_user"

  /** Facade warehouse per dataset: documents ingested ONCE as single-
    * message rounds, side indexes built — the ingest-time cost. The two
    * x55/x56 bench entries then measure only MemFuse.query itself, scan
    * vs indexed, on identical corpora. */
  private val facadeCache =
    scala.collection.concurrent.TrieMap.empty[String, pipeline.MemFuse]
  private val facadeDirCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def facadeDirs(d: String): String =
    facadeDirCache.getOrElseUpdate(d,
      graft.TempDirs.create("graft_facade").toString)
  private def facadeMessages(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      concat(lit("m"), col("doc_id")).as("message_id"),
      concat(lit("s"), col("doc_id") % 50).as("session_id"),
      lit(FacadeUser).as("user_id"),
      concat(lit("r"), col("doc_id")).as("round_id"),
      lit(1).as("sequence_number"),
      lit("user").as("role"),
      col("text").as("content"),
      lit("2024-06-01 00:00:00").cast("timestamp").as("created_at"))
  private def facadeFor(s: SparkSession, d: String): pipeline.MemFuse =
    facadeCache.getOrElseUpdate(d, {
      val dir = facadeDirs(d)
      val eng = new pipeline.MemFuse(s, dir)
      eng.ingest(facadeMessages(s, d))
      eng.buildIndexes(nlist = 4)
      eng
    })

  /** A SEPARATE warehouse with the PQ vector backend (pq and ivf
    * artifacts in one index dir would silently flip x56's backend —
    * the query path prefers pq when present). x56 vs x60 prices the
    * two backends on identical corpora and the identical fused query. */
  private val facadePqCache =
    scala.collection.concurrent.TrieMap.empty[String, pipeline.MemFuse]
  private def facadePqFor(s: SparkSession, d: String): pipeline.MemFuse =
    facadePqCache.getOrElseUpdate(d, {
      val dir = graft.TempDirs.create("graft_facade_pq").toString
      val eng = new pipeline.MemFuse(s, dir)
      eng.ingest(facadeMessages(s, d))
      eng.buildIndexes(vectorIndex = "pq")
      eng
    })

  /** A third warehouse with the IVF-PQ backend (same isolation argument
    * as [[facadePqFor]]): x56 vs x60 vs x62 prices cluster-partitioned
    * full vectors vs compressed global codes vs compressed probed
    * cells on identical corpora and the identical fused query. */
  private val facadeIvfPqCache =
    scala.collection.concurrent.TrieMap.empty[String, pipeline.MemFuse]
  private def facadeIvfPqFor(s: SparkSession, d: String): pipeline.MemFuse =
    facadeIvfPqCache.getOrElseUpdate(d, {
      val dir = graft.TempDirs.create("graft_facade_ivfpq").toString
      val eng = new pipeline.MemFuse(s, dir)
      eng.ingest(facadeMessages(s, d))
      eng.buildIndexes(nlist = 8, vectorIndex = "ivfpq")
      eng
    })

  /** q126 fixture: documents ingested into a real bucketed manifest
    * table, then MERGEd — every 10th doc's text prefixed (matched →
    * replace) and every 7th doc re-inserted under +90000 (unmatched →
    * insert). Cached per dataset dir; re-running the merge would be
    * idempotent anyway. */
  private val mergeTableCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def mergeTableFor(s: SparkSession, d: String): String =
    mergeTableCache.getOrElseUpdate(d, {
      val dir = graft.TempDirs.create("graft_merge")
        .toString + "/docs"
      val base = Tables.documents(s, d)
        .select(col("doc_id").as("user_id"), col("text"))
      pipeline.TableOps.appendBucketed(base, dir)
      val docs = Tables.documents(s, d)
      val updates = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("user_id"),
          concat(lit("UPDATED "), col("text")).as("text"))
        .unionByName(docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 90000L).as("user_id"), col("text")))
      pipeline.TableOps.mergeBucketed(updates, dir, "user_id")
      dir
    })

  /** q153 fixture: orders + customer saved as BUCKETED tables (8
    * buckets on the join key, orders additionally sorted in-bucket) —
    * Spark's persisted co-location: a join between them needs NO
    * exchange on either side (PlanSpec pins exactly one shuffle in
    * the whole query — the final aggregation). Table names carry the
    * dataset hash so sf0.001 tests and sf0.01 verify runs coexist in
    * one catalog. */
  private val bucketedCache =
    scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private def bucketedTablesFor(s: SparkSession, d: String): (String, String) =
    bucketedCache.getOrElseUpdate(d, {
      val suffix = math.abs(d.hashCode).toString
      val (ot, ct) = (s"orders_bkt_$suffix", s"customer_bkt_$suffix")
      // external tables at a fresh temp location: a stale
      // spark-warehouse dir from an earlier JVM can't collide
      val base = graft.TempDirs.create("graft_bkt").toString
      Tables.orders(s, d).write.mode("overwrite").option("path", s"$base/$ot")
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable(ot)
      Tables.customer(s, d).write.mode("overwrite").option("path", s"$base/$ct")
        .bucketBy(8, "c_custkey").saveAsTable(ct)
      (ot, ct)
    })

  /** q145 fixture: documents exported once as JSONL — the interchange
    * format every training pipeline reads and writes; the query reads
    * it back through the json source with an explicit schema (schema
    * inference would be a second full pass). */
  private val jsonlCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def jsonlDocsFor(s: SparkSession, d: String): String =
    jsonlCache.getOrElseUpdate(d, {
      val dir = graft.TempDirs.create("graft_jsonl")
        .toString + "/docs"
      Tables.documents(s, d).select("doc_id", "lang", "text")
        .write.mode("overwrite").json(dir)
      dir
    })

  /** q146 fixture: documents written hive-partitioned by lang — the
    * layout that turns a language filter into pure partition pruning. */
  private val langPartCache =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def langPartitionedFor(s: SparkSession, d: String): String =
    langPartCache.getOrElseUpdate(d, {
      val dir = graft.TempDirs.create("graft_langpart")
        .toString + "/docs"
      Tables.documents(s, d).write.mode("overwrite")
        .partitionBy("lang").parquet(dir)
      dir
    })

  /** Same warehouse as [[facadeFor]] (tables + indexes shared), with the
    * shipped TRAINED cross-encoder in the reranker slot instead of the
    * overlap heuristic — x55 vs x57 isolates the reranker's cost. */
  private val facadeCeCache =
    scala.collection.concurrent.TrieMap.empty[String, pipeline.MemFuse]
  private def facadeCeFor(s: SparkSession, d: String): pipeline.MemFuse =
    facadeCeCache.getOrElseUpdate(d, {
      facadeFor(s, d) // ensure the shared warehouse is ingested + indexed
      new pipeline.MemFuse(s, facadeDirs(d),
        reranker = pipeline.ProjectionCrossEncoder.trained)
    })

  /** Build every session-scoped fixture (facade warehouses, keyword /
    * IVF / PQ / IVF-PQ indexes, persisted vertex embeddings) for a
    * dataset dir, eagerly. The bench calls this in an UNTIMED setup
    * phase before pass 1 so fixture construction cost — the ingest-time
    * cost a deployment pays once — never lands inside a timed query,
    * and the first timed pass starts from the same resident state as
    * every later one (round-5 verdict: lazy construction inside the
    * pass loop inflated unrelated queries via heap/GC pressure). */
  /** Build every session fixture eagerly. `afterEach` fires with the
    * fixture-group name after each build — the bench measures post-GC
    * used heap there, so each group's RESIDENT footprint is committed
    * as data (heap_bytes.fixtures) instead of the session's ambient
    * drift being guessed at. */
  def warmFixtures(s: SparkSession, d: String,
      afterEach: String => Unit = _ => ()): Unit = {
    def step(name: String)(f: => Any): Unit = { f; afterEach(name) }
    step("kw_index")(keywordIndexFor(s, d))
    step("ivf_index")(ivfIndexFor(s, d))
    step("pq_index")(pqIndexFor(s, d))
    step("ivfpq_index")(ivfPqIndexFor(s, d))
    step("ivf_query_vec")(ivfQueryVec(s, d))
    step("dup_labels")(dupLabelsFor(s, d))
    step("near_dup_edges")(nearDupPairEdges(s, d))
    step("vertex_embeddings")(vertexEmbeddingsFor(s, d))
    step("z_layout")(zLayoutFor(s, d))
    step("facade")(facadeFor(s, d))
    step("facade_pq")(facadePqFor(s, d))
    step("facade_ivfpq")(facadeIvfPqFor(s, d))
    step("facade_ce")(facadeCeFor(s, d))
    step("merge_table")(mergeTableFor(s, d))
    step("fusion_inputs")(fusionInputsFor(s, d))
    step("fusion_fused")(fusedFor(s, d))
    step("shingle_index_1x")(shingleIndexFor(s, d, twoX = false))
    step("shingle_index_2x")(shingleIndexFor(s, d, twoX = true))
    step("shingle_bloom")(shingleBloomFor(s, d))
  }

  def oracleSql: Map[String, String] = Oracles.sql
}
