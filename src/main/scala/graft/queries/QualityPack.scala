package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.io.Tables
import graft.text.TextOps
import graft.util.Parity

/** Wave-7 governance / quality surface: blocked fuzzy entity resolution,
  * a distributed statistical independence test, and a Deequ-style
  * data-quality constraint suite — the checks that gate a production
  * 100 TB ingest.
  */
object QualityPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── q133: entity resolution — blocked fuzzy join ───────────────────
    // A deterministically corrupted copy of customer names (3rd char
    // dropped) is re-matched to the master list: BLOCK on (nation, last-4
    // name chars) — a key the corruption can't touch — then exact edit
    // distance ≤ 1 only within blocks. The hash equi-join on the block key
    // replaces the quadratic all-pairs comparison; block cardinality
    // scales with the data (numeric suffixes), so blocks stay O(1) and
    // the join stays linear at 100 TB. The oracle replays blocking AND
    // distance (DuckDB `levenshtein` ≡ Spark `levenshtein`).
    "q133_fuzzy_match" -> { (s, d) =>
      val master = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          substring(col("c_name"), -4, 4).as("blk"))
      val dirty = Tables.customer(s, d)
        .select(col("c_custkey").as("d_custkey"),
          concat(substring(col("c_name"), 1, 2), expr("substring(c_name, 4)")).as("d_name"),
          col("c_nationkey").as("d_nationkey"))
        .withColumn("blk", substring(col("d_name"), -4, 4))
      dirty.join(master, Seq("blk"))
        .filter(col("d_nationkey") === col("c_nationkey") &&
          levenshtein(col("d_name"), col("c_name")) <= 1)
        .select(col("d_custkey"), col("c_custkey"),
          levenshtein(col("d_name"), col("c_name")).cast("long").as("dist"))
    },

    // ── q134: chi-square test of independence ──────────────────────────
    // Market segment × order status over the orders↔customer join: three
    // tiny aggregates (cells, row totals, column totals) broadcast
    // together, per-cell (o−e)²/e rounded at source, exact-decimal total.
    // The join keys on custkey; the contingency table itself is O(r·c).
    "q134_chi_square" -> { (s, d) =>
      val joined = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"), col("o_orderstatus").as("st"))
      val cells = joined.groupBy("seg", "st").agg(count(lit(1)).as("o"))
      val rows = joined.groupBy("seg").agg(count(lit(1)).as("rt"))
      val cols = joined.groupBy("st").agg(count(lit(1)).as("ct"))
      val n = joined.agg(count(lit(1)).as("n"))
      cells.join(broadcast(rows), "seg").join(broadcast(cols), "st")
        .crossJoin(broadcast(n))
        .withColumn("e",
          col("rt").cast("double") * col("ct").cast("double") / col("n").cast("double"))
        .withColumn("term", round(
          (col("o").cast("double") - col("e")) * (col("o").cast("double") - col("e")) / col("e"), 6))
        .agg(round(Parity.dsum6(col("term")), 6).as("chi2"),
          ((countDistinct(col("seg")) - 1) * (countDistinct(col("st")) - 1)).as("dof"))
    },

    // ── q148: Welch's t-test per group vs baseline ─────────────────────
    // Does each event type's value distribution differ from the 'view'
    // baseline? One exact-decimal moments aggregate (the q129 discipline),
    // baseline row broadcast-crossed, t statistic and Welch–Satterthwaite
    // dof as mirrored IEEE ops rounded at the edge.
    "q148_welch_ttest" -> { (s, d) =>
      val stats = Tables.events(s, d).groupBy("event_type")
        .agg(count(lit(1)).as("n"), Parity.davg(col("value")).as("m"),
          Parity.dvar(col("value")).as("v"))
      val base = stats.filter(col("event_type") === "view")
        .select(col("n").as("n0"), col("m").as("m0"), col("v").as("v0"))
      val se2 = col("v") / col("n").cast("double") + col("v0") / col("n0").cast("double")
      stats.filter(col("event_type") =!= "view").crossJoin(broadcast(base))
        .select(col("event_type"), col("n"),
          round((col("m") - col("m0")) / sqrt(se2), 6).as("t_stat"),
          round(se2 * se2 /
            ((col("v") / col("n").cast("double")) * (col("v") / col("n").cast("double"))
              / (col("n").cast("double") - 1.0)
             + (col("v0") / col("n0").cast("double")) * (col("v0") / col("n0").cast("double"))
              / (col("n0").cast("double") - 1.0)), 6).as("dof"))
    },

    // ── q149: mutual information (feature relevance) ───────────────────
    // MI between a fixed-threshold price bin and the order status — the
    // information-theoretic upgrade of the reference's variance-based
    // feature selection. Joint counts in one aggregate; marginals DERIVE
    // from the tiny joint table; p·ln(p_xy/(p_x·p_y)) with the ln rounded
    // at source and an exact-decimal total.
    "q149_mutual_information" -> { (s, d) =>
      val binned = Tables.orders(s, d).select(
        when(col("o_totalprice") < 50000, lit(0)).when(col("o_totalprice") < 100000, lit(1))
          .when(col("o_totalprice") < 150000, lit(2)).otherwise(lit(3)).as("xb"),
        col("o_orderstatus").as("y"))
      val joint = binned.groupBy("xb", "y").agg(count(lit(1)).as("nxy"))
      val px = joint.groupBy("xb").agg(sum(col("nxy")).as("nx"))
      val py = joint.groupBy("y").agg(sum(col("nxy")).as("ny"))
      val tot = joint.agg(sum(col("nxy")).as("n"))
      joint.join(broadcast(px), "xb").join(broadcast(py), "y")
        .crossJoin(broadcast(tot))
        .withColumn("term", round(
          (col("nxy").cast("double") / col("n").cast("double")) *
            log((col("nxy").cast("double") * col("n").cast("double")) /
              (col("nx").cast("double") * col("ny").cast("double"))), 6))
        .agg(Parity.dsum6(col("term")).as("mi"), count(lit(1)).as("n_cells"))
    },

    // ── q151: cross-source contamination matrix ────────────────────────
    // How much shingle content do sources share? Distinct (source, gram)
    // pairs — ONE gram-keyed shuffle — self-joined on the gram (the gram
    // side is df-capped at 10 first: boilerplate grams shared by many
    // sources would otherwise fan out quadratically per gram and skew the
    // join), then one count per source pair. The corpus-diagnostics op
    // behind "which crawls duplicate each other".
    "q151_source_overlap" -> { (s, d) =>
      val sg = Tables.documents(s, d)
        .select(col("source"),
          explode(array_distinct(TextOps.wordNgrams(TextOps.words(col("text")), 5))).as("sgl"))
        .select(col("source"), TextOps.hash32(col("sgl")).as("g"))
        .distinct()
        // feeds the df-cap aggregate AND both self-join sides: persist
        // beats re-exploding the corpus (min-of-7 at sf0.1: 3.45 s vs
        // 4.03 s; session cache clear keeps bench repeats cold)
        .persist()
      val dfCap = sg.groupBy("g").agg(count(lit(1)).as("nsrc")).filter(col("nsrc") <= 10)
        .select("g")
      val capped = sg.join(dfCap, "g")
      val b = capped.select(col("g"), col("source").as("source_b"))
      capped.join(b, "g").filter(col("source") < col("source_b"))
        .groupBy("source", "source_b").agg(count(lit(1)).as("shared_grams"))
    },

    // ── q152: population-stability-index drift ─────────────────────────
    // Event-type mix drift between the first and second half of the
    // month: PSI = Σ (p1 − p2)·ln(p1/p2). Two tiny aggregates from one
    // scan (pivot on the half flag), probabilities as int/int IEEE
    // divisions, ln rounded at source — the model-monitoring metric as
    // an exact query.
    "q152_psi_drift" -> { (s, d) =>
      val ev = Tables.events(s, d)
      // integer midpoint (DIV, not /): Column./ on longs promotes to
      // double and the truncation boundary must match the oracle exactly
      val mid = ev.agg(unix_micros(min(col("ts"))).as("mn"), unix_micros(max(col("ts"))).as("mx"))
        .select(timestamp_micros(expr("(mn + mx) DIV 2")).as("mid"))
      val halves = ev.crossJoin(broadcast(mid))
        .groupBy("event_type")
        .agg(count(when(col("ts") < col("mid"), lit(1))).as("n1"),
          count(when(col("ts") >= col("mid"), lit(1))).as("n2"))
      val tots = halves.agg(sum(col("n1")).as("t1"), sum(col("n2")).as("t2"))
      halves.crossJoin(broadcast(tots))
        .withColumn("p1", col("n1").cast("double") / col("t1").cast("double"))
        .withColumn("p2", col("n2").cast("double") / col("t2").cast("double"))
        .withColumn("term", round((col("p1") - col("p2")) * log(col("p1") / col("p2")), 6))
        .agg(Parity.dsum6(col("term")).as("psi"), count(lit(1)).as("n_bins"))
    },

    // ── q135: data-quality constraint suite ────────────────────────────
    // Referential integrity, key uniqueness, domain bounds, null rates —
    // each check one aggregate (the FK check a broadcast anti join),
    // union'd into the one-row-per-check report a 100 TB ingest gates on.
    "q135_dq_checks" -> { (s, d) =>
      val orders = Tables.orders(s, d)
      val customer = Tables.customer(s, d)
      val lineitem = Tables.lineitem(s, d)
      val events = Tables.events(s, d)
      def report(name: String, violations: DataFrame): DataFrame =
        violations.select(lit(name).as("check_name"),
          col("v").as("n_violations"), (col("v") === 0).as("passed"))
      val fk = report("orders_custkey_fk",
        orders.join(broadcast(customer.select(col("c_custkey"))),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("v")))
      val uqC = report("customer_custkey_unique",
        customer.agg((count(lit(1)) - countDistinct(col("c_custkey"))).as("v")))
      val uqO = report("orders_orderkey_unique",
        orders.agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("v")))
      val qty = report("lineitem_quantity_positive",
        lineitem.agg(count(when(col("l_quantity") <= 0, lit(1))).as("v")))
      val price = report("orders_totalprice_positive",
        orders.agg(count(when(col("o_totalprice") <= 0, lit(1))).as("v")))
      val nn = report("events_value_nonnull",
        events.agg(count(when(col("value").isNull, lit(1))).as("v")))
      Seq(fk, uqC, uqO, qty, price, nn).reduce(_ unionByName _)
    }
  )

  override def oracles: Map[String, String] = Map(

    "q133_fuzzy_match" ->
      """WITH dirty AS (SELECT c_custkey AS d_custkey,
                 substring(c_name, 1, 2) || substring(c_name, 4) AS d_name,
                 c_nationkey AS d_nationkey
               FROM customer),
          m AS (SELECT c_custkey, c_name, c_nationkey,
                  substring(c_name, length(c_name) - 3, 4) AS blk FROM customer),
          db AS (SELECT *, substring(d_name, length(d_name) - 3, 4) AS blk FROM dirty)
          SELECT d_custkey, c_custkey,
                 CAST(levenshtein(d_name, c_name) AS BIGINT) AS dist
          FROM db JOIN m USING (blk)
          WHERE d_nationkey = c_nationkey AND levenshtein(d_name, c_name) <= 1""",

    "q134_chi_square" ->
      s"""WITH j AS (SELECT c_mktsegment AS seg, o_orderstatus AS st
                     FROM orders JOIN customer ON o_custkey = c_custkey),
          cells AS (SELECT seg, st, COUNT(*) AS o FROM j GROUP BY seg, st),
          r AS (SELECT seg, COUNT(*) AS rt FROM j GROUP BY seg),
          c AS (SELECT st, COUNT(*) AS ct FROM j GROUP BY st),
          n AS (SELECT COUNT(*) AS n FROM j),
          t AS (SELECT round((CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n.n AS DOUBLE))
                           * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n.n AS DOUBLE))
                           / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n.n AS DOUBLE)), 6) AS term,
                       seg, st
                FROM cells JOIN r USING (seg) JOIN c USING (st) CROSS JOIN n)
          SELECT round(${Sql.dsum6("term")}, 6) AS chi2,
                 CAST((COUNT(DISTINCT seg) - 1) * (COUNT(DISTINCT st) - 1) AS BIGINT) AS dof
          FROM t""",

    "q151_source_overlap" -> {
      val ngrams5 = graft.text.TextOps.wordNgramsSql("w", 5)
      s"""WITH ws AS (SELECT source, string_split(text, ' ') AS w FROM documents),
          gr AS (SELECT source, unnest(list_distinct($ngrams5)) AS s FROM ws),
          sg AS (SELECT DISTINCT source, ${graft.text.TextOps.hash32Sql("s")} AS g FROM gr),
          cap AS (SELECT g FROM (SELECT g, COUNT(*) AS nsrc FROM sg GROUP BY g)
                  WHERE nsrc <= 10),
          c AS (SELECT sg.source, sg.g FROM sg JOIN cap USING (g))
          SELECT a.source, b.source AS source_b, COUNT(*) AS shared_grams
          FROM c a JOIN c b ON a.g = b.g AND a.source < b.source
          GROUP BY a.source, b.source"""
    },

    "q152_psi_drift" ->
      """WITH mm AS (SELECT epoch_us(MIN(CAST(ts AS TIMESTAMP))) AS mn,
                 epoch_us(MAX(CAST(ts AS TIMESTAMP))) AS mx FROM events),
          mid AS (SELECT make_timestamp((mn + mx) // 2) AS mid FROM mm),
          h AS (SELECT event_type,
                  COUNT(CASE WHEN CAST(ts AS TIMESTAMP) < mid THEN 1 END) AS n1,
                  COUNT(CASE WHEN CAST(ts AS TIMESTAMP) >= mid THEN 1 END) AS n2
                FROM events CROSS JOIN mid GROUP BY event_type),
          t AS (SELECT CAST(SUM(n1) AS BIGINT) AS t1, CAST(SUM(n2) AS BIGINT) AS t2 FROM h),
          x AS (SELECT round((CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE)
                            - CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE))
                   * ln((CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE))
                      / (CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE))), 6) AS term
                FROM h CROSS JOIN t)
          SELECT CAST(SUM(CAST(term AS DECIMAL(28,6))) AS DOUBLE) AS psi,
                 COUNT(*) AS n_bins FROM x""",

    "q148_welch_ttest" -> {
      val mean = Sql.davg("value")
      val vr = Sql.dvar("value")
      s"""WITH st AS (SELECT event_type, COUNT(*) AS n, $mean AS m, $vr AS v
                      FROM events GROUP BY event_type),
          b AS (SELECT n AS n0, m AS m0, v AS v0 FROM st WHERE event_type = 'view')
          SELECT event_type, n,
                 round((m - b.m0) / sqrt(v / CAST(n AS DOUBLE) + b.v0 / CAST(b.n0 AS DOUBLE)), 6) AS t_stat,
                 round((v / CAST(n AS DOUBLE) + b.v0 / CAST(b.n0 AS DOUBLE))
                     * (v / CAST(n AS DOUBLE) + b.v0 / CAST(b.n0 AS DOUBLE))
                   / ((v / CAST(n AS DOUBLE)) * (v / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
                      + (b.v0 / CAST(b.n0 AS DOUBLE)) * (b.v0 / CAST(b.n0 AS DOUBLE)) / (CAST(b.n0 AS DOUBLE) - 1.0)), 6) AS dof
          FROM st CROSS JOIN b WHERE event_type <> 'view'"""
    },

    "q149_mutual_information" ->
      s"""WITH binned AS (SELECT CASE WHEN o_totalprice < 50000 THEN 0
                   WHEN o_totalprice < 100000 THEN 1
                   WHEN o_totalprice < 150000 THEN 2 ELSE 3 END AS xb,
                 o_orderstatus AS y
               FROM orders),
          joint AS (SELECT xb, y, COUNT(*) AS nxy FROM binned GROUP BY xb, y),
          px AS (SELECT xb, CAST(SUM(nxy) AS BIGINT) AS nx FROM joint GROUP BY xb),
          py AS (SELECT y, CAST(SUM(nxy) AS BIGINT) AS ny FROM joint GROUP BY y),
          tot AS (SELECT CAST(SUM(nxy) AS BIGINT) AS n FROM joint),
          t AS (SELECT round((CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE))
                   * ln((CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE))
                     / (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))), 6) AS term
                FROM joint JOIN px USING (xb) JOIN py USING (y) CROSS JOIN tot)
          SELECT ${Sql.dsum6("term")} AS mi, COUNT(*) AS n_cells FROM t""",

    "q135_dq_checks" ->
      """SELECT 'orders_custkey_fk' AS check_name,
                CAST((SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT) AS n_violations,
                (SELECT COUNT(*) FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) = 0 AS passed
         UNION ALL
         SELECT 'customer_custkey_unique',
                CAST((SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer) AS BIGINT),
                (SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer) = 0
         UNION ALL
         SELECT 'orders_orderkey_unique',
                CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT),
                (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) = 0
         UNION ALL
         SELECT 'lineitem_quantity_positive',
                CAST((SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0) AS BIGINT),
                (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0) = 0
         UNION ALL
         SELECT 'orders_totalprice_positive',
                CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) AS BIGINT),
                (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) = 0
         UNION ALL
         SELECT 'events_value_nonnull',
                CAST((SELECT COUNT(*) FROM events WHERE value IS NULL) AS BIGINT),
                (SELECT COUNT(*) FROM events WHERE value IS NULL) = 0"""
  )
}
