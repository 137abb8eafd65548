package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Q._
import graft.functions.RpmVersion

/** SURVEY §2 relational operator inventory (projections P*, joins J*,
  * aggregations A*, windows W*, sorts O*, set ops T*) demonstrated on the
  * driver's TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Scale notes are attached per query: which side broadcasts, what the
  * shuffle key is, why the plan survives 1000 executors.
  */
object QueriesRelational {

  val entries: Seq[(String, Entry)] = Seq(

    // ---- A-class: grouped reductions --------------------------------
    // A1-ish pricing summary (partial agg → 2-col shuffle key; map-side
    // combine shrinks 100 TB of lineitem to |groups| rows per partition).
    "q_agg_pricing" -> Entry(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("1997-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            moneySum(col("l_quantity")).as("sum_qty"),
            moneySum(col("l_extendedprice")).as("sum_base_price"),
            moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
              .as("sum_disc_price"),
            count(lit(1)).as("count_order"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${sqlMoneySum("l_quantity")} AS sum_qty,
        ${sqlMoneySum("l_extendedprice")} AS sum_base_price,
        ${sqlMoneySum("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-09-02'
        GROUP BY l_returnflag, l_linestatus""")),

    // A3: severity max-merge (vunnel debian severity_order) — max_by with
    // a rank, ties carry equal payloads so the pick is deterministic.
    "q_agg_severity_max" -> Entry(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val rank = lit(6) - substring(col("o_orderpriority"), 1, 1).cast("int")
        o.groupBy(col("o_custkey"))
          // obj_max_by: same SortAggregate-avoidance as q_agg_rpm_max
          // (rank is injective on the five fixed priority strings)
          .agg(graft.plans.ArgExtremumAgg
            .obj_max_by(col("o_orderpriority"), rank).as("top_priority"),
            count(lit(1)).as("n_orders"))
      },
      Some("""SELECT o_custkey,
        arg_max(o_orderpriority, 6 - cast(substring(o_orderpriority,1,1) as int)) AS top_priority,
        count(*) AS n_orders
        FROM orders GROUP BY o_custkey""")),

    // A8: duplicate-id detection (groupBy count>1).
    "q_agg_dup_detect" -> Entry(
      (s, dir) => t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 5),
      Some("""SELECT user_id, event_type, count(*) AS n FROM events
        GROUP BY user_id, event_type HAVING count(*) > 5""")),

    // A10: grouping-sets rollup (vunnel debian advisory metrics cube).
    "q_agg_rollup" -> Entry(
      (s, dir) => t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total")),
      Some(s"""SELECT coalesce(o_orderstatus,'ALL') AS status,
        coalesce(o_orderpriority,'ALL') AS priority,
        count(*) AS n, ${sqlMoneySum("o_totalprice")} AS total
        FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""")),

    // A12: distinct accumulation (collect_set ≡ count distinct surface).
    "q_agg_distinct" -> Entry(
      (s, dir) => {
        // A12 as per-column SINGLE-distinct aggregates joined — two
        // multi-distincts in one agg trigger the RewriteDistinct-
        // Aggregates Expand (2× row replication before the first
        // exchange, the q_profile_stats pathology from the r7 audit);
        // each single-distinct plans partial_count(distinct …) with
        // map-side dedup and no Expand, and the join keys are the
        // group keys (broadcast-sized)
        // spreadBy(l_suppkey): HashPartitioning(l_suppkey) satisfies
        // BOTH branch aggregates' clustering (the distinct dedup on
        // (l_suppkey, c) and the final group on l_suppkey) AND the
        // join, so each branch plans zero further exchanges and
        // ReuseExchange shares the one respread between them —
        // 4 exchanges down to 1
        val li = Q.spreadBy(t(s, dir, "lineitem"), col("l_suppkey"))
        def one(c: String, as: String) = li
          .groupBy(col("l_suppkey"))
          .agg(countDistinct(col(c)).as(as))
        // explicit plan aliases: both branches derive from the same
        // `li`, so dataframe-column refs (a("l_suppkey")) resolve to ONE
        // attribute and Spark logs `trivially true equals predicate` on
        // every run while DeduplicateRelations quietly rescues the join —
        // version-fragile; string-qualified refs bind unambiguously
        val a = one("l_partkey", "n_parts").alias("a")
        val b = one("l_orderkey", "n_orders").alias("b")
        // null-safe equi-join: both sides carry the SAME group set, but
        // a plain `=` would drop a NULL group key that SQL's GROUP BY
        // (and the oracle) retains
        a.join(b, col("a.l_suppkey") <=> col("b.l_suppkey"))
          .select(col("a.l_suppkey"), col("n_parts"), col("n_orders"))
      },
      Some("""SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
        count(DISTINCT l_orderkey) AS n_orders
        FROM lineitem GROUP BY l_suppkey""")),

    // A2/O1/F1: grouped max by RPM-EVR order. Versions are synthesized
    // with zero-padded numeric segments so the DuckDB oracle's plain
    // lexicographic max is provably the same order as rpmvercmp — the
    // Spark side still exercises the real EVR parse/sort-key machinery.
    "q_agg_rpm_max" -> Entry(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        // spread: rpm_sort_key kernel per row (Q.spread)
        // spreadBy(l_partkey): keyed respread; groupBy(l_partkey)
        // reuses the partitioning — one exchange, no local sort
        // stage(): pin the version build above the respread (see
        // q_fn_evr_split)
        Q.spreadBy(li, col("l_partkey")).select(col("l_partkey"),
          graft.plans.StageBarrier.stage(QueriesDomain.synthVer).as("ver"))
          .groupBy(col("l_partkey"))
          // obj_max_by: declarative max_by with a string key degrades
          // the whole aggregation to SortAggregate (two full sorts of
          // the respread stream); the object-hash form is plan-
          // identical semantics on the hash path (ties impossible:
          // rpm_sort_key is injective on these synthesized versions)
          .agg(graft.plans.ArgExtremumAgg
            .obj_max_by(col("ver"), RpmVersion.rpm_sort_key(col("ver")))
            .as("max_ver"),
            count(lit(1)).as("n_builds"))
      },
      Some("""SELECT l_partkey,
        max(printf('%d.%03d-%02d%s', l_linenumber,
          cast(floor(l_quantity) as int),
          cast(floor(l_discount*100 + 0.5) as int),
          lower(l_returnflag))) AS max_ver,
        count(*) AS n_builds
        FROM lineitem GROUP BY l_partkey""")),

    // A7/A11: flatten-merge of per-subgroup arrays into the parent group
    // (SLES FixedIn concat / ubuntu base-pass envelope merge) — order
    // made explicit by sorting after the flatten, never by row arrival.
    "q_agg_flatten_merge" -> Entry(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        // no inner sort_array: the final array_sort over the flatten
        // re-establishes the total order, so per-order sorting was
        // pure wasted work (one sort per order group)
        //
        // spreadBy(l_orderkey): partial collect_list reduces NOTHING
        // (it's a list), so hoisting the collect above a keyed respread
        // moves the same bytes while the groupBy reuses the exchange —
        // and the single-task scan partial (716 ms of the wall) runs
        // 32-way instead
        val perOrder = graft.Q.spreadBy(
            li.select(col("l_orderkey"), col("l_linenumber")),
            col("l_orderkey"))
          .groupBy(col("l_orderkey"))
          .agg(collect_list(col("l_linenumber")).as("lines"))
        o.join(perOrder, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(array_sort(flatten(collect_list(col("lines")))).as("merged"))
          .select(col("o_custkey"),
            size(col("merged")).as("n_lines"),
            array_join(transform(col("merged"), x => x.cast("string")), ",")
              .as("lines"))
      },
      Some("""SELECT o_custkey, cast(count(*) as int) AS n_lines,
        string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS lines
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_custkey""")),

    // F19: nested array-of-struct patch (the OSV fixes walk:
    // affected[].ranges[].events[].fixed → database_specific patch) —
    // collect to nested, transform to add a computed field, explode back.
    "q_nested_patch" -> Entry(
      (s, dir) => {
        // row-filter BEFORE the collect: dq = l_quantity*2 > 50 is
        // exactly l_quantity > 25 (*2 is exact in IEEE), so the
        // predicate pushes into the parquet scan and the collect_list
        // exchange carries only surviving rows (~half) — the nested
        // patch (transform-over-collected structs, explode back) is
        // unchanged, it just never nests rows the array filter would
        // drop anyway
        val li = t(s, dir, "lineitem").filter(col("l_quantity") > 25)
        // spreadBy(l_orderkey): same rationale as q_agg_flatten_merge —
        // a partial collect_list reduces nothing, so the keyed respread
        // (reused by the groupBy) costs the same shuffle bytes and
        // un-single-tasks the scan-side collect
        val nested = graft.Q.spreadBy(li, col("l_orderkey"))
          .groupBy(col("l_orderkey"))
          .agg(collect_list(struct(col("l_partkey"), col("l_quantity")))
            .as("items"))
        nested
          .select(col("l_orderkey"),
            explode(
              transform(col("items"), it => struct(
                it.getField("l_partkey").as("partkey"),
                (it.getField("l_quantity") * 2).as("dq")))).as("item"))
          .select(col("l_orderkey"), col("item.partkey").as("partkey"),
            col("item.dq").as("dq"))
      },
      Some("""SELECT l_orderkey, l_partkey AS partkey,
        l_quantity * 2 AS dq FROM lineitem WHERE l_quantity * 2 > 50""")),

    // ---- P-class: projections / filters -----------------------------
    // P1: field projection + rename + computed column.
    "q_proj_rename" -> Entry(
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey").as("id"),
          upper(col("p_name")).as("name_uc"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          (cents(col("p_retailprice")) / 100.0).as("price")),
      Some("""SELECT p_partkey AS id, upper(p_name) AS name_uc,
        regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        cast(floor(p_retailprice*100 + 0.5) as bigint)/100.0 AS price
        FROM part""")),

    // P2: regex keep-filter (vunnel ^CVE- filters).
    "q_filter_regex" -> Entry(
      (s, dir) => t(s, dir, "documents")
        .filter(col("text").rlike("spark\\s+\\w+\\s+join"))
        .select(col("doc_id"), col("lang"), col("source")),
      Some("""SELECT doc_id, lang, source FROM documents
        WHERE regexp_matches(text, 'spark\s+\w+\s+join')""")),

    // P3+P4: deny-list + regex extraction (rhel namespace skip + release
    // number extraction).
    "q_filter_denylist_extract" -> Entry(
      (s, dir) => t(s, dir, "nation")
        .filter(!col("n_name").isin("NATION_0", "NATION_1"))
        .select(col("n_nationkey"),
          regexp_extract(col("n_name"), "NATION_(\\d+)", 1).cast("int")
            .as("nation_num"),
          col("n_regionkey")),
      Some("""SELECT n_nationkey,
        cast(regexp_extract(n_name, 'NATION_(\d+)', 1) as int) AS nation_num,
        n_regionkey
        FROM nation WHERE n_name NOT IN ('NATION_0','NATION_1')""")),

    // P5+P7: status predicate mapping + allow-list map lookup with
    // unmapped-dropped semantics (vunnel fix_state / ecosystem maps).
    "q_map_allowlist" -> Entry(
      (s, dir) => {
        val m = map(lit("BUILDING"), lit("bld"), lit("MACHINERY"), lit("mch"),
          lit("AUTOMOBILE"), lit("auto"))
        t(s, dir, "customer")
          .select(col("c_custkey"),
            element_at(m, col("c_mktsegment")).as("segment_code"))
          .filter(col("segment_code").isNotNull)
      },
      Some("""SELECT c_custkey,
        CASE c_mktsegment WHEN 'BUILDING' THEN 'bld'
          WHEN 'MACHINERY' THEN 'mch' WHEN 'AUTOMOBILE' THEN 'auto' END
          AS segment_code
        FROM customer
        WHERE c_mktsegment IN ('BUILDING','MACHINERY','AUTOMOBILE')""")),

    // ---- J-class: joins ---------------------------------------------
    // J1: broadcast dimension enrichment (fixdate-style). part/supplier
    // are dims → broadcast; lineitem never shuffles.
    "q_join_enrich" -> Entry(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val p = t(s, dir, "part")
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some(s"""SELECT p_brand,
        ${sqlMoneySum("l_extendedprice*(1-l_discount)")} AS revenue,
        count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand""")),

    // J2: override-with-coalesce (NVD override join): left join then
    // coalesce(override, original).
    "q_join_override" -> Entry(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val overrides = t(s, dir, "customer")
          .filter(col("c_acctbal") < 0)
          .select(col("c_custkey"), lit("0-OVERRIDDEN").as("ov_priority"))
        o.join(broadcast(overrides), col("o_custkey") === col("c_custkey"),
            "left")
          .select(col("o_orderkey"),
            coalesce(col("ov_priority"), col("o_orderpriority"))
              .as("priority"))
      },
      Some("""SELECT o_orderkey,
        coalesce(ov.ov_priority, o_orderpriority) AS priority
        FROM orders LEFT JOIN (
          SELECT c_custkey, '0-OVERRIDDEN' AS ov_priority FROM customer
          WHERE c_acctbal < 0) ov ON o_custkey = ov.c_custkey""")),

    // J3: equi join + non-equi (prefix) residual — the rhel CPE-prefix
    // theta join shape. Equi key carries the shuffle; the startswith
    // residual is evaluated post-match (no cross product).
    "q_join_prefix_theta" -> Entry(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        c.join(broadcast(n),
            col("c_nationkey") === col("n_nationkey") &&
              col("c_name").startsWith(
                concat(lit("Customer#0000"), col("n_regionkey").cast("string"))))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_matched"))
      },
      Some("""SELECT n_name, count(*) AS n_matched
        FROM customer JOIN nation
          ON c_nationkey = n_nationkey
         AND starts_with(c_name, 'Customer#0000' || n_regionkey)
        GROUP BY n_name""")),

    // J4: left join + ordered collect (debian DSA advisory list) —
    // deterministic via numeric sort before string_agg.
    "q_join_collect" -> Entry(
      (s, dir) => {
        val o = t(s, dir, "orders").filter(col("o_orderkey") % 100 === 0)
        // the join key equals o_orderkey, so the %100 predicate holds for
        // matching lineitems too — pre-filtering pushes it into the scan
        // (100× less data shuffled; the left-join null rows are unaffected)
        val li = t(s, dir, "lineitem").filter(col("l_orderkey") % 100 === 0)
        o.join(li, col("o_orderkey") === col("l_orderkey"), "left")
          .groupBy(col("o_orderkey"))
          .agg(
            array_join(
              transform(array_sort(collect_list(col("l_linenumber"))),
                x => x.cast("string")), ",").as("line_numbers"),
            count(col("l_linenumber")).as("n_lines"))
      },
      Some("""SELECT o_orderkey,
        coalesce(string_agg(l_linenumber, ',' ORDER BY l_linenumber), '')
          AS line_numbers,
        count(l_linenumber) AS n_lines
        FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey % 100 = 0 GROUP BY o_orderkey""")),

    // J5: left-semi (VEX overlay mark) + J7-style anti + synthesis:
    // customers with orders pass through "real"; customers without get a
    // synthesized record — anti-join → synthetic rows → union (the
    // ubuntu Pro→base inference shape).
    "q_join_anti_synthesis" -> Entry(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").select(col("o_custkey")).distinct()
        val real = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), lit("real").as("origin"))
        val synth = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), lit("synthetic").as("origin"))
        real.unionByName(synth)
      },
      Some("""SELECT c_custkey, 'real' AS origin FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        UNION ALL
        SELECT c_custkey, 'synthetic' AS origin FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""")),

    // J8: chained multiway dimension join (OVAL 4-way reference join).
    // All dims broadcast; the single shuffle is the final groupBy.
    "q_join_multiway" -> Entry(
      (s, dir) => {
        val r = t(s, dir, "region"); val n = t(s, dir, "nation")
        val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(moneySum(col("o_totalprice")).as("revenue"),
            count(lit(1)).as("n_orders"))
      },
      Some(s"""SELECT r_name, ${sqlMoneySum("o_totalprice")} AS revenue,
        count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name""")),

    // J10: change-detection full-outer compare (rhel minimal-vs-disk):
    // struct-equality of two snapshots keyed by id.
    "q_join_change_detect" -> Entry(
      (s, dir) => {
        val cur = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"))
        val cached = t(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1997-01-01"))
          .select(col("o_orderkey").as("k"),
            col("o_orderstatus").as("cached_status"))
        cur.join(cached, col("o_orderkey") === col("k"), "full_outer")
          .select(
            coalesce(col("o_orderkey"), col("k")).as("id"),
            when(col("k").isNull, "added")
              .when(col("o_orderkey").isNull, "deleted")
              .when(col("o_orderstatus") === col("cached_status"), "same")
              .otherwise("changed").as("delta"))
      },
      Some("""SELECT coalesce(cur.o_orderkey, old.k) AS id,
        CASE WHEN old.k IS NULL THEN 'added'
             WHEN cur.o_orderkey IS NULL THEN 'deleted'
             WHEN cur.o_orderstatus = old.cached_status THEN 'same'
             ELSE 'changed' END AS delta
        FROM (SELECT o_orderkey, o_orderstatus FROM orders) cur
        FULL OUTER JOIN (
          SELECT o_orderkey AS k, o_orderstatus AS cached_status FROM orders
          WHERE o_orderdate < TIMESTAMP '1997-01-01') old
        ON cur.o_orderkey = old.k""")),

    // ---- W-class: windows -------------------------------------------
    // W1: canonical newest-per-group pick with total tie order.
    "q_window_latest_per_key" -> Entry(
      (s, dir) => {
        // spreadBy(l_partkey): the window reuses the respread exchange
        // (one shuffle total) and the per-key sort+limit runs parallel
        // instead of as the single-task partial WindowGroupLimit on
        // the one-row-group scan (672 ms of the wall measured). At a
        // well-split 100 TB scan this is a no-op and the partial
        // group-limit keeps its map-side reduction.
        val li = graft.Q.spreadBy(
          t(s, dir, "lineitem").select(col("l_partkey"),
            col("l_orderkey"), col("l_linenumber"), col("l_shipdate")),
          col("l_partkey"))
        val w = Window.partitionBy(col("l_partkey"))
          .orderBy(col("l_shipdate").desc, col("l_orderkey").desc,
            col("l_linenumber").desc)
        li.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
      },
      Some("""SELECT l_partkey, l_orderkey, l_linenumber,
        strftime(cast(l_shipdate as date), '%Y-%m-%d') AS ship_date
        FROM (SELECT *, row_number() OVER (PARTITION BY l_partkey
          ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) rn
          FROM lineitem) WHERE rn = 1""")),

    // W2-analog: running/frame window (no frame windows in the
    // reference, but first-class Spark surface): cumulative revenue per
    // customer by order date.
    "q_window_running_sum" -> Entry(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, 0)
        o.select(col("o_custkey"), col("o_orderkey"),
          (sum(cents(col("o_totalprice"))).over(w) / 100.0)
            .as("running_total"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        sum(cast(floor(o_totalprice*100 + 0.5) as bigint))
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)/100.0
          AS running_total
        FROM orders""")),

    // ---- O-class: sorts / top-k -------------------------------------
    // O1-as-top-k: global top-N with deterministic tie-break (TakeOrdered
    // physical op — no full sort at scale).
    "q_topk_orders" -> Entry(
      (s, dir) => t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(25)
        .select(col("o_orderkey"),
          (cents(col("o_totalprice")) / 100.0).as("price")),
      Some("""SELECT o_orderkey,
        cast(floor(o_totalprice*100 + 0.5) as bigint)/100.0 AS price
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""")),

    // ---- T-class: set ops -------------------------------------------
    // T2: reconcile anti-join (parts never shipped).
    "q_set_except" -> Entry(
      (s, dir) => {
        val p = t(s, dir, "part")
        // "parts with no recent shipment": the date predicate pushes to
        // the lineitem scan, the distinct prunes to the join key, and
        // the anti-join side stays a fraction of the fact table.
        val li = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("2001-06-01").cast("timestamp_ntz"))
          .select(col("l_partkey")).distinct()
        p.join(li, col("p_partkey") === col("l_partkey"), "left_anti")
          .groupBy(col("p_brand")).agg(count(lit(1)).as("n_unshipped"))
      },
      Some("""SELECT p_brand, count(*) AS n_unshipped FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '2001-06-01')
        GROUP BY p_brand""")),

    // T4: legacy ∪ fresh with last-wins precedence (debian 3-way merge):
    // union + row_number over explicit precedence rank.
    "q_set_union_lastwins" -> Entry(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val legacy = o.select(col("o_orderkey"),
          col("o_orderstatus").as("status"), lit(1).as("prec"))
        val fresh = o.filter(col("o_orderstatus") === "O")
          .select(col("o_orderkey"), lit("RECHECKED").as("status"),
            lit(2).as("prec"))
        val w = Window.partitionBy(col("o_orderkey"))
          .orderBy(col("prec").desc)
        legacy.unionByName(fresh)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_orderkey"), col("status"))
      },
      Some("""SELECT o_orderkey, status FROM (
        SELECT o_orderkey, status, prec,
          row_number() OVER (PARTITION BY o_orderkey ORDER BY prec DESC) rn
        FROM (
          SELECT o_orderkey, o_orderstatus AS status, 1 AS prec FROM orders
          UNION ALL
          SELECT o_orderkey, 'RECHECKED' AS status, 2 AS prec FROM orders
          WHERE o_orderstatus = 'O'))
        WHERE rn = 1""")),
  )
}
