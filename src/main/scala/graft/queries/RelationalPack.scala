package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.QueryPack
import graft.io.Tables
import graft.relational.{Joins, StatsProjection}
import graft.util.Parity._

/** Relational query surface: scans, filters, grouped/grand aggregation,
  * joins (broadcast/shuffle/semi/anti/positional), windows, top-k, set ops,
  * scalar/date/JSON functions, stats-driven projection (SURVEY §2.1–§2.8).
  *
  * Every query has a DuckDB oracle; numeric outputs follow the
  * [[graft.util.Parity]] determinism rules.
  */
object RelationalPack extends QueryPack {

  val valueCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1+P1+P5+A-grouped — TPC-H Q1-style pricing summary. Filter and the
    // 6 needed columns are pushed to the parquet scan; single hash-agg with
    // map-side partial aggregation; ~6-row result, no sort needed.
    "q01_pricing_summary" -> { (s, d) =>
      val li = Tables.lineitem(s, d).filter(col("l_shipdate") <= lit("1998-09-01"))
      li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
    },

    // J2+shuffle joins — revenue per nation in ASIA (TPC-H Q5 shape).
    // region⋈nation is broadcast (tiny dims); lineitem⋈orders shuffles on
    // orderkey; AQE broadcasts the filtered customer side when small.
    "q02_revenue_by_nation" -> { (s, d) =>
      val asia = Tables.nation(s, d).join(
        broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      val cust = Tables.customer(s, d).join(broadcast(asia), col("c_nationkey") === col("n_nationkey"))
      val ords = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-01-01") && col("o_orderdate") < lit("1997-01-01"))
      Tables.lineitem(s, d)
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("n_name").agg(
          dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // J1 — semi-join: customers that have at least one order, by segment.
    "q03_active_customers_by_segment" -> { (s, d) =>
      val withOrders = Joins.semi(
        Tables.customer(s, d),
        Tables.orders(s, d).select(col("o_custkey").as("c_custkey")), Seq("c_custkey"))
      withOrders.groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
    },

    // anti-join: customers with no large order (>300k).
    "q04_customers_without_orders" -> { (s, d) =>
      Joins.anti(
        Tables.customer(s, d),
        Tables.orders(s, d).filter(col("o_totalprice") > 300000)
          .select(col("o_custkey").as("c_custkey")), Seq("c_custkey"))
        .select("c_custkey", "c_name", "c_acctbal")
    },

    // O1-analog top-k: TakeOrdered (per-partition top-k then merge — no
    // global sort even at 100 TB). Deterministic tie-break on orderkey.
    "q05_top_orders" -> { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
    },

    // window ranking: 3 most recent orders per customer.
    "q06_latest_orders_per_customer" -> { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("order_date"))
    },

    // window running aggregate over a total per-partition order; decimal
    // running sum is order-exact so it hash-matches the oracle.
    "q07_running_supplier_qty" -> { (s, d) =>
      // l_quantity closes the ordering: the synthetic data has duplicate
      // (suppkey, orderkey, linenumber) rows with differing quantities, so
      // without it the running sum at a tie is engine-order-dependent.
      // With every aggregated column in the sort key, tied rows are
      // interchangeable and the output multiset is deterministic.
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d).select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(col("l_quantity").cast("decimal(28,4)")).over(w).cast("double").as("running_qty"))
    },

    // set operations: UNION / INTERSECT / EXCEPT (all distinct semantics).
    "q08_set_ops" -> { (s, d) =>
      val rich   = Tables.customer(s, d).filter(col("c_acctbal") > 5000).select(col("c_custkey").as("k"))
      val bigBuy = Tables.orders(s, d).filter(col("o_totalprice") > 300000).select(col("o_custkey").as("k"))
      def n(df: DataFrame, op: String) =
        df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
      n(rich.union(bigBuy).distinct, "union")
        .unionByName(n(rich.intersect(bigBuy), "intersect"))
        .unionByName(n(rich.except(bigBuy), "except"))
    },

    // scalar function surface: string, regex, math (F2/F6/F7-analog).
    "q09_part_features" -> { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).cast("long").as("name_len"),
        size(split(col("p_name"), " ")).cast("long").as("n_words"),
        regexp_extract(col("p_brand"), "([0-9]+)", 1).cast("long").as("brand_num"),
        concat_ws("/", col("p_type"), col("p_brand")).as("type_brand"),
        floor(col("p_retailprice") / 100.0).cast("long").as("price_bucket"),
        (col("p_retailprice") / col("p_size")).as("price_per_size"),
        round(log2(col("p_retailprice")), 6).as("log2_price"))
    },

    // S4-analog JSON + timestamp bucketing on the events table.
    "q10_events_daily" -> { (s, d) =>
      val k = get_json_object(col("props"), "$.k").cast("double")
      Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"), davg(k).as("avg_k"))
    },

    // schema-driven struct decode of the JSON props column (`from_json`
    // with a declared schema — the Jackson parse happens ONCE per row and
    // every field is a codegen-visible struct column, vs q10's per-path
    // `get_json_object` re-parse), histogrammed by k-decile.
    "q154_json_struct" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
            .getField("k").as("k"))
        // FLOOR division, exact for all longs: subtract the (nonnegative)
        // pmod remainder, then the truncating DIV is exact division. This
        // matches DuckDB's flooring `//` even for negative k — plain
        // `k DIV 10` truncates toward zero and would silently diverge
        // there. (Column./ would promote to double: wrong above 2^53.)
        .groupBy(expr("(k - pmod(k, 10)) DIV 10").as("k_decile"))
        .agg(count(lit(1)).as("n"), countDistinct(col("event_type")).as("n_types"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    },

    // date part extraction + monthly rollup of orders.
    "q11_orders_by_month" -> { (s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"),
                 month(col("o_orderdate")).cast("long").as("o_month"))
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice")).as("total_price"),
             min(col("o_totalprice")).as("min_price"),
             max(col("o_totalprice")).as("max_price"))
    },

    // conditional aggregation pivot (P6 when/otherwise) + exact distinct.
    "q12_returnflag_pivot" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      li.groupBy("l_returnflag").agg(
        dsum(when(col("l_linestatus") === "F", col("l_quantity")).otherwise(0.0)).as("qty_f"),
        dsum(when(col("l_linestatus") === "O", col("l_quantity")).otherwise(0.0)).as("qty_o"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
    },

    // A1–A3/P3 — per-column moments + quantile-threshold keep mask in long
    // form (the stats half of the reference's stats-driven projection).
    "q13_column_stats" -> { (s, d) =>
      val stats = StatsProjection.columnStats(Tables.lineitem(s, d), valueCols)
      val th = stats.agg(
        expr("percentile(mean, 0.25)").as("tm"),
        expr("percentile(variance, 0.25)").as("tv"))
      stats.crossJoin(th).select(
        col("col_name"), col("n"),
        round(col("mean"), 6).as("mean"),
        round(col("variance"), 6).as("variance"),
        (col("mean") > col("tm") && col("variance") > col("tv")).as("kept"))
    },

    // J3 — positional zip join of two independently-ordered projections.
    "q14_zip_join" -> { (s, d) =>
      val o = Tables.orders(s, d)
      Joins.zipJoin(
          o.select("o_orderkey"), Seq(col("o_orderkey").asc),
          o.select(col("o_totalprice"), col("o_orderkey").as("tiebreak")),
          Seq(col("o_totalprice").asc, col("tiebreak").asc))
        .select("row_id", "o_orderkey", "o_totalprice")
    },

    // P2/P3+F1 end-to-end dynamic projection: stats job → driver mask →
    // log2(x+1) sums over the surviving columns only.
    "q15_masked_log_sums" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val kept = StatsProjection.projectByQuantileThreshold(li, valueCols, 0.25).columns.toSeq
      val aggs = kept.map(c => dsum6(log2(col(c) + lit(1.0))).as(c))
      // log2-per-value over every row: fan the surviving-column projection
      val one = graft.relational.Scale.fanOut(li.select(kept.map(col): _*))
        .agg(aggs.head, aggs.tail: _*)
      one.selectExpr(
        s"stack(${kept.size}, ${kept.map(c => s"'$c', $c").mkString(", ")}) as (col_name, sum_log2)")
    },

    // exact-decimal pairwise Pearson correlation (the feature-selection
    // stat): ONE aggregation pass computes all pairs' decimal moments —
    // unlike built-in `corr`, the result is partition-order independent
    // and bit-replayable (Parity.dcorr / Sql.dcorr).
    "q84_feature_correlations" -> { (s, d) =>
      val one = Tables.lineitem(s, d).agg(
        r6(dcorr(col("l_quantity"), col("l_extendedprice"))).as("c_qty_price"),
        r6(dcorr(col("l_quantity"), col("l_discount"))).as("c_qty_disc"),
        r6(dcorr(col("l_extendedprice"), col("l_discount"))).as("c_price_disc"))
      one.selectExpr(
        """stack(3,
             'l_quantity', 'l_extendedprice', c_qty_price,
             'l_quantity', 'l_discount', c_qty_disc,
             'l_extendedprice', 'l_discount', c_price_disc) as (col_a, col_b, corr)""")
    }
  )

  private def statsCte: String = {
    val perCol = valueCols.map { c =>
      s"SELECT '$c' AS col_name, COUNT($c) AS n, ${Sql.davg(c)} AS mean, ${Sql.dvar(c)} AS variance FROM lineitem"
    }.mkString(" UNION ALL ")
    s"stats AS ($perCol), th AS (SELECT quantile_cont(mean, 0.25) AS tm, quantile_cont(variance, 0.25) AS tv FROM stats)"
  }

  override def oracles: Map[String, String] = Map(
    "q84_feature_correlations" ->
      s"""SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
            round(${Sql.dcorr("l_quantity", "l_extendedprice")}, 6) AS corr FROM lineitem
          UNION ALL SELECT 'l_quantity', 'l_discount',
            round(${Sql.dcorr("l_quantity", "l_discount")}, 6) FROM lineitem
          UNION ALL SELECT 'l_extendedprice', 'l_discount',
            round(${Sql.dcorr("l_extendedprice", "l_discount")}, 6) FROM lineitem""",

    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         ${Sql.dsum("l_quantity")} AS sum_qty,
         ${Sql.dsum("l_extendedprice")} AS sum_base_price,
         ${Sql.dsum6("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         ${Sql.dsum6("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
         ${Sql.davg("l_quantity")} AS avg_qty,
         ${Sql.davg("l_extendedprice")} AS avg_price,
         ${Sql.davg("l_discount")} AS avg_disc,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",

    "q02_revenue_by_nation" ->
      s"""SELECT n_name,
         ${Sql.dsum6("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         COUNT(*) AS n_items
         FROM lineitem, orders, customer, nation, region
         WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name""",

    "q03_active_customers_by_segment" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_mktsegment""",

    "q04_customers_without_orders" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)""",

    "q05_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",

    "q06_latest_orders_per_customer" ->
      """SELECT o_custkey, rn, o_orderkey, order_date FROM (
           SELECT o_custkey,
                  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS BIGINT) AS rn,
                  o_orderkey, CAST(o_orderdate AS DATE) AS order_date
           FROM orders) WHERE rn <= 3""",

    "q07_running_supplier_qty" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) OVER (
             PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
         FROM lineitem""",

    "q08_set_ops" ->
      """WITH rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
            bigbuy AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000)
         SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT k FROM rich UNION SELECT k FROM bigbuy)
         UNION ALL
         SELECT 'intersect', COUNT(*) FROM (SELECT k FROM rich INTERSECT SELECT k FROM bigbuy)
         UNION ALL
         SELECT 'except', COUNT(*) FROM (SELECT k FROM rich EXCEPT SELECT k FROM bigbuy)""",

    "q09_part_features" ->
      """SELECT p_partkey,
           upper(p_name) AS name_upper,
           CAST(length(p_name) AS BIGINT) AS name_len,
           CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
           CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
           p_type || '/' || p_brand AS type_brand,
           CAST(floor(p_retailprice / 100.0) AS BIGINT) AS price_bucket,
           p_retailprice / p_size AS price_per_size,
           round(log2(p_retailprice), 6) AS log2_price
         FROM part""",

    "q10_events_daily" ->
      s"""SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
          COUNT(*) AS n,
          ${Sql.dsum("value")} AS sum_value,
          ${Sql.davg("CAST(json_extract_string(props, '$.k') AS DOUBLE)")} AS avg_k
          FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)""",

    "q154_json_struct" ->
      """WITH j AS (SELECT event_type,
                 CAST(json_extract(props, '$.k') AS BIGINT) AS k
               FROM events)
          SELECT k // 10 AS k_decile, COUNT(*) AS n,
                 CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
                 MIN(k) AS min_k, MAX(k) AS max_k
          FROM j GROUP BY k // 10""",

    "q11_orders_by_month" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
          CAST(month(o_orderdate) AS BIGINT) AS o_month,
          COUNT(*) AS n_orders,
          ${Sql.dsum("o_totalprice")} AS total_price,
          min(o_totalprice) AS min_price,
          max(o_totalprice) AS max_price
          FROM orders GROUP BY 1, 2""",

    "q12_returnflag_pivot" ->
      s"""SELECT l_returnflag,
          ${Sql.dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0.0 END")} AS qty_f,
          ${Sql.dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0.0 END")} AS qty_o,
          COUNT(DISTINCT l_partkey) AS n_parts,
          COUNT(DISTINCT l_suppkey) AS n_supps
          FROM lineitem GROUP BY l_returnflag""",

    "q13_column_stats" ->
      s"""WITH $statsCte
          SELECT col_name, n, round(mean, 6) AS mean, round(variance, 6) AS variance,
                 (mean > tm AND variance > tv) AS kept
          FROM stats, th""",

    "q14_zip_join" ->
      """WITH a AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS row_id, o_orderkey FROM orders),
            b AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) - 1 AS BIGINT) AS row_id, o_totalprice FROM orders)
         SELECT a.row_id AS row_id, o_orderkey, o_totalprice FROM a JOIN b USING (row_id)""",

    "q15_masked_log_sums" -> {
      val sums = valueCols.map { c =>
        s"SELECT '$c' AS col_name, ${Sql.dsum6(s"log2($c + 1.0)")} AS sum_log2 FROM lineitem"
      }.mkString(" UNION ALL ")
      s"""WITH $statsCte,
          kept AS (SELECT col_name FROM stats, th WHERE mean > tm AND variance > tv),
          sums AS ($sums)
          SELECT s.col_name, s.sum_log2 FROM sums s JOIN kept k USING (col_name)"""
    }
  )
}
