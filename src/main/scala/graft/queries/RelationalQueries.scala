package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Q._

/** Oracle-checked coverage of SURVEY.md §2's relational operator
  * inventory, expressed over the driver's TPC-H-ish tables.
  *
  * Each entry has a matching DuckDB oracle in [[oracles]]; column names
  * and value arithmetic are kept bit-identical between the two (see
  * [[Q]] for the decimal-sum parity strategy). The §2 row(s) each query
  * covers are noted inline (reference file:line cites live in SURVEY.md).
  */
object RelationalQueries {

  /** §2.5 A3/A4 + §2.3 P2 — the flagship scan→filter→aggregate (TPC-H Q1 shape). */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    l.where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sumMoney(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sum(dec2(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec2(col("l_quantity"))).cast("double") / count(lit(1)).cast("double")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** §2.1 S6 + §2.3 P1 — projection with predicate pushed to the scan. */
  def qScanProject(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
      .orderBy("l_orderkey", "l_linenumber")

  /** §2.3 P2/P3 — conjunctive range predicates (numeric + temporal). */
  def qFilterRange(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where(col("l_quantity").between(10, 20) &&
        col("l_shipdate").between(lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sumMoney(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag")

  /** §2.3 P5 — membership (IN-list) filter. */
  def qFilterIsin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .where(col("c_mktsegment").isin("AUTOMOBILE", "FURNITURE") && col("c_acctbal") > 0)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sumMoney(col("c_acctbal")).as("sum_bal"))
      .orderBy("c_mktsegment")

  /** §2.3 P4/P6 — null/zero drop before aggregation. */
  def qNullPositive(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .where(col("value").isNotNull && col("value") > 0)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
      .orderBy("event_type")

  /** §2.4 J1 — fact enriched by two dimension left-joins (dims broadcast). */
  def qJoinEnrich(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderstatus")
    val c = Tables.customer(s, dir).select("c_custkey", "c_name", "c_mktsegment")
    l.join(o, l("l_orderkey") === o("o_orderkey"), "left")
      .join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"),
        col("c_name"), col("c_mktsegment"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)
  }

  /** §2.4 J2 + §2.9 F9/F13 — multi-way left-join "graph" query with
    * coalesced fact and the promoted risk-score expression. */
  def qJoinGraph(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .where(col("o_orderdate").between(lit("1995-01-01").cast("timestamp"), lit("1995-03-31").cast("timestamp")))
    val c = Tables.customer(s, dir).select("c_custkey", "c_name", "c_nationkey")
    val n = Tables.nation(s, dir).select("n_nationkey", "n_name", "n_regionkey")
    val liCnt = Tables.lineitem(s, dir).groupBy("l_orderkey").agg(count(lit(1)).as("li_cnt"))
    val base = col("o_totalprice") / 2000.0 + col("n_regionkey") * 10.0
    val cnt = coalesce(col("li_cnt"), lit(0L))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
      .join(liCnt, o("o_orderkey") === liCnt("l_orderkey"), "left")
      .select(col("o_orderkey"), col("c_name"), col("n_name"), cnt.as("li_cnt"),
        when(cnt > 0, least(lit(100.0), greatest(lit(80.0), base + cnt * 5.0)))
          .otherwise(least(lit(100.0), base)).as("score"))
      .orderBy("o_orderkey")
  }

  /** §2.4 J6 — left-anti join scoped by a date range (the reference's
    * idempotent-append pattern: keys not already present in the window). */
  def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .where(col("o_orderdate").between(lit("1995-01-01").cast("timestamp"), lit("1995-12-31").cast("timestamp")))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_no_orders"))
      .orderBy("c_mktsegment")
  }

  /** §2.8 U1 + §2.5 A8 — union-all then dedup. */
  def qUnionDedup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val a = c.where(col("c_acctbal") > 9000).select("c_custkey", "c_mktsegment")
    val b = c.where(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 5000)
      .select("c_custkey", "c_mktsegment")
    a.unionByName(b).distinct().orderBy("c_custkey", "c_mktsegment")
  }

  /** §2.5 A8 — key-subset dedup. */
  def qDedupKeys(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select("o_custkey", "o_orderstatus").distinct()
      .orderBy("o_custkey", "o_orderstatus")

  /** §2.5 A2/A9 — global min/max scalar aggregate. */
  def qMinmaxDates(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).agg(
      dstr(min(col("o_orderdate"))).as("min_date"),
      dstr(max(col("o_orderdate"))).as("max_date"),
      count(lit(1)).as("n"))

  /** §2.5 A7 — grouped counts. */
  def qGroupCount(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy("user_id", "event_type")

  /** §2.5 A3 — weighted mean decomposed to Σxw/Σw (no UDAF). */
  def qWeightedMean(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where(col("l_discount") > 0)
      .groupBy("l_returnflag")
      .agg((sum(dec2(col("l_extendedprice")) * dec2(col("l_discount"))).cast("double") /
        sum(dec2(col("l_discount"))).cast("double")).as("wmean_price"))
      .orderBy("l_returnflag")

  /** §2.7 T1/T3 — top-k by dynamic sort key. */
  def qTopk(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), dstr(col("o_orderdate")).as("o_date"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15)

  /** §2.7 T3 — offset/limit pagination. */
  def qPaginate(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), dstr(col("o_orderdate")).as("o_date"), col("o_totalprice"))
      .orderBy(col("o_date"), col("o_orderkey"))
      .offset(100).limit(20)

  /** §2.7 T2 — multi-key sort over a dim join. */
  def qSortMulti(s: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
      .select(col("r_name"), col("n_name"))
      .orderBy("r_name", "n_name")
  }

  /** §2.9 F6 — date parse/parts. */
  def qDateParts(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"), sumMoney(col("o_totalprice")).as("sum_price"))
      .orderBy("y", "m")

  /** §2.9 F7/F8 — longitude wrap + trig/area math (per-row, deterministic). */
  def qMathFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .where(col("l_orderkey") < 200)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (((col("l_partkey") % 360) + 360) % 360 - 180).as("lon_wrap"),
        round(cos(radians(col("l_quantity"))), 6).as("w"),
        round(col("l_quantity") * 111.32 * 111.32 * 0.05 * 0.05 *
          cos(radians(col("l_quantity"))) * 1000.0 / 1e6, 6).as("vol"))
      .orderBy("l_orderkey", "l_linenumber")

  /** §2.9 F1/F2/F11 — text normalization chain (trim, collapse, lower). */
  def qTextNorm(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        lower(trim(regexp_replace(substring(col("text"), 1, 80), "\\s+", " "))).as("norm"))
      .orderBy("doc_id")

  /** §2.9 F4/F5 — class_to_num + avg_to_level bucket chains. */
  def qCaseBuckets(s: SparkSession, dir: String): DataFrame = {
    val v = col("value")
    val bucket = when(v >= 0 && v <= 100,
      when(v * 3 <= 100, 1).when(v * 3 <= 200, 2).otherwise(3))
      .otherwise(least(lit(3), greatest(lit(1), round(v / 100).cast("int"))))
    Tables.events(s, dir)
      .where(v.isNotNull)
      .withColumn("bucket", bucket)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), avg(col("bucket")).as("avg_bucket"))
      .withColumn("level",
        when(col("avg_bucket") <= 1.5, 1).when(col("avg_bucket") <= 2.1, 2).otherwise(3))
      .orderBy("event_type")
  }

  /** §2.4 J8 + §2.9 F9/F10 — left join with coalesce/fill of missing side. */
  def qCoalesceFill(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).groupBy("o_custkey")
      .agg(count(lit(1)).as("cnt"), max(col("o_orderdate")).as("last_dt"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"),
        coalesce(dstr(col("last_dt")), lit("none")).as("last_order"))
      .orderBy("c_custkey")
  }

  /** §2.6-adjacent — deterministic keep-first dedup via row_number (the
    * engine-internal window the reference's drop_duplicates implies). */
  def qWindowRownum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), dstr(col("o_orderdate")).as("first_date"))
      .orderBy("o_custkey")
  }

  /** JSON column extraction (events.props carries a JSON payload). */
  def qJsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k").cast("long")).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** LIKE predicate + fact⟕part join with conditional aggregation
    * (TPC-H Q14 shape: promo revenue share). */
  def qPromoRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    val revenue = dec2(col("l_extendedprice")) * (lit(1).cast(org.apache.spark.sql.types.DecimalType(18, 2)) - dec2(col("l_discount")))
    l.join(p, l("l_partkey") === p("p_partkey"))
      .groupBy(substring(col("p_type"), 1, 5).as("type_prefix"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("p_type").like("%a%"), revenue).otherwise(lit(0).cast(org.apache.spark.sql.types.DecimalType(18, 2))))
          .cast("double").as("promo_rev"),
        sum(revenue).cast("double").as("total_rev"))
      .orderBy("type_prefix")
  }

  /** Semi-join: customers having at least one high-value order. */
  def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).where(col("o_totalprice") > 100000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
  }

  /** Running total per customer (cumulative window aggregate; exact
    * decimal accumulation so the running values are order-independent
    * of partial-aggregation details). */
  def qRunningTotal(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .where(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), dstr(col("o_orderdate")).as("o_date"),
        sum(dec2(col("o_totalprice"))).over(w).cast("double").as("running_total"))
      .orderBy("o_custkey", "o_date", "o_orderkey")
  }

  /** Time-RANGE trailing window: per-user 7-day trailing event count
    * and value sum via `rangeBetween` on event-time micros — the
    * wall-clock frame `rowsBetween` can't express (all peers at equal
    * ts enter the frame together; the lookback is 7 days of TIME, not
    * N rows). The frame rides integer micros so both engines bound it
    * with exact arithmetic. */
  def qTrailingAgg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-604800000000L, 0L)
    Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .select(col("user_id"), col("ts_us"), col("value"),
        count(lit(1)).over(w).as("n_7d"),
        sum(dec2(col("value"))).over(w).cast("double").as("sum_7d"))
      .orderBy("user_id", "ts_us", "value")
  }

  /** Window navigation functions — lag/lead (adjacent-event deltas)
    * and first/last value per user — the remaining window verbs beside
    * rank/running/range frames. The window order is TOTAL
    * ((ts_us, value)) so every navigated neighbour is deterministic on
    * both engines. */
  def qWindowNav(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("value"))
    Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .select(col("user_id"), col("ts_us"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        first(col("value")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("first_value"),
        last(col("value")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("last_value"))
      .orderBy("user_id", "ts_us", "value")
  }

  /** Set operations (INTERSECT / EXCEPT — the last relational verbs
    * beside the semi/anti JOIN forms): orders carrying a high-discount
    * line vs orders carrying a high-tax line, each membership class
    * tagged. Both operators use SQL's DISTINCT set semantics (Spark
    * lowers them to left-semi/left-anti over aggregated keys); all
    * three classes are non-empty at every SF, so no branch ships
    * untested. */
  /** Edit-distance self-join on supplier names
    * ([[graft.ops.FuzzyJoin]]): the entity-resolution primitive —
    * every name pair within one edit, via rarity-ordered q-gram
    * signature candidates + levenshtein verify. The shared
    * "Supplier#0000000" prefix is the adversarial fixture: its grams
    * have df = |table| and must appear in no signature, so candidates
    * come only from the discriminating digit-tail grams. Oracle is the
    * brute n² levenshtein — green proves the filter chain COMPLETE
    * (no false dismissal), not just sound. */
  def qFuzzyJoin(s: SparkSession, dir: String): DataFrame =
    graft.ops.FuzzyJoin.selfJoin(
        Tables.supplier(s, dir)
          .select(col("s_suppkey").cast("long").as("id"), col("s_name").as("str")),
        maxDist = 1)
      .orderBy("id1", "id2")

  /** TWO-TABLE fuzzy lookup ([[graft.ops.FuzzyJoin.join]]): dirty
    * strings resolved against a canonical catalog — the scale
    * generalization of an exact-match dict lookup, which silently
    * drops misspelled keys. The dirty side is derived
    * DETERMINISTICALLY in both engines (the qC4Lines device):
    * "Supplier#" → "Supplr#" costs exactly 2 edits, so maxDist = 3
    * admits catalog names whose digit tail is within 1 edit —
    * per-probe match sets are non-trivial (same digit tail + every
    * single-digit substitution) and both the shared-prefix hot grams
    * AND the cross-side rarity order get exercised. Oracle = brute
    * |dirty|×|catalog| levenshtein — green proves the union-ordered
    * signature chain COMPLETE across tables. */
  def qFuzzyLookup(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir)
      .select(col("s_suppkey").cast("long").as("id"), col("s_name").as("str"))
    val dirty = sup.select(col("id"),
      regexp_replace(col("str"), "Supplier#", "Supplr#").as("str"))
    graft.ops.FuzzyJoin.join(dirty, sup, maxDist = 3)
      .orderBy("id1", "id2")
  }

  /** OUTPUT-BOUNDED fuzzy lookup ([[graft.ops.FuzzyJoin.joinTopK]],
    * the r18 scale-safe contract): [[qFuzzyLookup]]'s device with the
    * result capped at the k = 3 best matches per probe under the
    * total order (dist asc, id2 asc). Sequential supplier digit tails
    * are exactly the pathological adjacency whose raw match set grows
    * quadratically (the r17 10× lesson: 28 k → 2.8 M rows), so this
    * gate pins the verb a 100 TB resolution caller actually wants —
    * output ∝ |probes|, never ∝ adjacency — and its oracle replays
    * the same deterministic cut over the brute match set. */
  def qFuzzyTopk(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir)
      .select(col("s_suppkey").cast("long").as("id"), col("s_name").as("str"))
    val dirty = sup.select(col("id"),
      regexp_replace(col("str"), "Supplier#", "Supplr#").as("str"))
    graft.ops.FuzzyJoin.joinTopK(dirty, sup, maxDist = 3, k = 3)
      .orderBy("id1", "id2")
  }

  /** Conversion funnel view → click → purchase within 7 days of the
    * user's first view ([[graft.ops.Funnel]] min-chain semantics —
    * each stage's time is the earliest qualifying event strictly after
    * the previous stage). One user-keyed aggregate per step, no
    * per-user event lists. */
  def qFunnel(s: SparkSession, dir: String): DataFrame =
    graft.ops.Funnel.funnel(Tables.events(s, dir),
        userCol = "user_id", tsCol = "ts", typeCol = "event_type",
        steps = Seq("view", "click", "purchase"),
        windowUs = 7L * 86400L * 1000000L)
      .orderBy("user_id")

  def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val a = li.where(col("l_discount") > 0.08).select("l_orderkey")
    val b = li.where(col("l_tax") > 0.05).select("l_orderkey")
    a.intersect(b).withColumn("set_op", lit("both"))
      .unionByName(a.except(b).withColumn("set_op", lit("disc_only")))
      .unionByName(b.except(a).withColumn("set_op", lit("tax_only")))
      .orderBy("set_op", "l_orderkey")
  }

  /** Statistical aggregates from EXACT moments: per return flag, the
    * mean/sample-stddev of quantity and its correlation with price.
    * Spark's builtin `corr`/`stddev` stream Welford-style partial
    * states whose float results depend on partition order — never
    * bit-reproducible cross-engine. Here the five moments (Σx, Σy,
    * Σx², Σy², Σxy) accumulate as EXACT decimals (2-dp money products
    * are exact 4-dp decimals; sums of exact decimals are
    * order-independent), convert to double once, and the closed-form
    * combination runs in the SAME IEEE expression order in both
    * engines — bit-identical statistics from a parallel aggregation. */
  def qCorrStats(s: SparkSession, dir: String): DataFrame = {
    val x = dec2(col("l_quantity"))
    val y = dec2(col("l_extendedprice"))
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"),
        sum(x * y).cast("double").as("sxy"))
      .select(col("l_returnflag"), col("n"),
        round(col("sx") / col("n"), 6).as("mean_qty"),
        round(sqrt((col("n") * col("sxx") - col("sx") * col("sx")) /
          (col("n") * (col("n") - lit(1L)))), 6).as("stddev_qty"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  /** Full grouping-set lattice via CUBE — [[qRollup]]'s hierarchy plus
    * the cross subtotal (status alone), grouping_id bit-compatible with
    * DuckDB's GROUPING_ID. */
  def qCube(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        sumMoney(col("l_quantity")).as("sum_qty"))
      .orderBy(col("gid"), asc_nulls_last("l_returnflag"), asc_nulls_last("l_linestatus"))

  /** Pivot: order counts by status × year (Spark pivot ≡ conditional
    * aggregation in the oracle; fixed status values keep columns
    * deterministic). */
  def qPivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("y"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("y")

  /** Hierarchical subtotals via ROLLUP (grouping-set aggregation with
    * grouping_id, bit-compatible with DuckDB's GROUPING_ID). */
  def qRollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        sumMoney(col("l_quantity")).as("sum_qty"))
      .orderBy(col("gid"), asc_nulls_last("l_returnflag"), asc_nulls_last("l_linestatus"))

  /** HLL sketch: approx distinct users per event type. The raw HLL
    * estimate is engine-specific, so the gate emits the ORACLE-CHECKABLE
    * statement of what the sketch guarantees: per group, the exact
    * distinct count (computed in the same frame) plus a boolean
    * asserting the HLL estimate landed within ±5 % of it (rsd = 0.02;
    * 5 % ≈ 2.5σ — deterministic for a fixed dataset, verified at
    * sf0.01/sf0.1). DuckDB reproduces the exact counts and `true`
    * literals, so the row hashes match iff every group's HLL estimate
    * is in bound — the sketch still runs, and a broken sketch fails the
    * gate. Estimate-vs-exact accuracy is additionally pinned in
    * SketchSpec. */
  def qApproxDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("exact_users"), col("n"),
        (abs(col("approx_users") - col("exact_users"))
          <= col("exact_users") * 0.05).as("within_bound"))
      .orderBy("event_type")

  /** Gap-based sessionization with Spark's native session_window —
    * the oracle replays it as lag/cumsum session ids (same semantics:
    * a session breaks at gaps ≥ 30 minutes). */
  def qSessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** Streaming-shaped batch aggregate — tumbling 1h event-time window
    * (same plan Structured Streaming produces for the events stream). */
  def qWindowTumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour"))
      .agg(count(lit(1)).as("n"), sumMoney(col("value")).as("sum_value"))
      .orderBy("hour")

  val all: Map[String, Q.QueryFn] = Map(
    "q1_agg" -> (q1Agg _),
    "q_scan_project" -> (qScanProject _),
    "q_filter_range" -> (qFilterRange _),
    "q_filter_isin" -> (qFilterIsin _),
    "q_null_positive" -> (qNullPositive _),
    "q_join_enrich" -> (qJoinEnrich _),
    "q_join_graph" -> (qJoinGraph _),
    "q_anti_join" -> (qAntiJoin _),
    "q_union_dedup" -> (qUnionDedup _),
    "q_dedup_keys" -> (qDedupKeys _),
    "q_minmax_dates" -> (qMinmaxDates _),
    "q_group_count" -> (qGroupCount _),
    "q_weighted_mean" -> (qWeightedMean _),
    "q_topk" -> (qTopk _),
    "q_paginate" -> (qPaginate _),
    "q_sort_multi" -> (qSortMulti _),
    "q_date_parts" -> (qDateParts _),
    "q_math_funcs" -> (qMathFuncs _),
    "q_text_norm" -> (qTextNorm _),
    "q_case_buckets" -> (qCaseBuckets _),
    "q_coalesce_fill" -> (qCoalesceFill _),
    "q_window_rownum" -> (qWindowRownum _),
    "q_window_tumbling" -> (qWindowTumbling _),
    "q_session_window" -> (qSessionWindow _),
    "q_rollup" -> (qRollup _),
    "q_cube" -> (qCube _),
    "q_trailing_agg" -> (qTrailingAgg _),
    "q_corr_stats" -> (qCorrStats _),
    "q_set_ops" -> (qSetOps _),
    "q_fuzzy_join" -> (qFuzzyJoin _),
    "q_fuzzy_lookup" -> (qFuzzyLookup _),
    "q_fuzzy_topk" -> (qFuzzyTopk _),
    "q_funnel" -> (qFunnel _),
    "q_window_nav" -> (qWindowNav _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_json_extract" -> (qJsonExtract _),
    "q_promo_revenue" -> (qPromoRevenue _),
    "q_semi_join" -> (qSemiJoin _),
    "q_running_total" -> (qRunningTotal _),
    "q_pivot" -> (qPivot _),
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty,
        | cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_base_price,
        | cast(sum(cast(l_extendedprice as decimal(18,2)) * (cast(1 as decimal(18,2)) - cast(l_discount as decimal(18,2)))) as double) AS sum_disc_price,
        | cast(sum(cast(l_quantity as decimal(18,2))) as double) / cast(count(*) as double) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
        |WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_filter_range" ->
      """SELECT l_returnflag, count(*) AS n,
        | cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sum_price
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20
        |  AND l_shipdate BETWEEN timestamp '1996-01-01 00:00:00' AND timestamp '1996-12-31 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_filter_isin" ->
      """SELECT c_mktsegment, count(*) AS n,
        | cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS sum_bal
        |FROM customer
        |WHERE c_mktsegment IN ('AUTOMOBILE','FURNITURE') AND c_acctbal > 0
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_null_positive" ->
      """SELECT event_type, count(*) AS n,
        | cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
        |FROM events WHERE value IS NOT NULL AND value > 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_join_enrich" ->
      """SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus, c.c_name, c.c_mktsegment, l.l_extendedprice
        |FROM lineitem l
        |LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY l.l_extendedprice DESC, l.l_orderkey, l.l_linenumber LIMIT 20""".stripMargin,
    "q_join_graph" ->
      """WITH li AS (SELECT l_orderkey, count(*) AS li_cnt FROM lineitem GROUP BY l_orderkey)
        |SELECT o.o_orderkey, c.c_name, n.n_name,
        | coalesce(li.li_cnt, 0) AS li_cnt,
        | CASE WHEN coalesce(li.li_cnt, 0) > 0
        |   THEN least(100.0, greatest(80.0, o.o_totalprice/2000.0 + n.n_regionkey*10.0 + coalesce(li.li_cnt,0)*5.0))
        |   ELSE least(100.0, o.o_totalprice/2000.0 + n.n_regionkey*10.0) END AS score
        |FROM orders o
        |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |LEFT JOIN li ON o.o_orderkey = li.l_orderkey
        |WHERE o.o_orderdate BETWEEN timestamp '1995-01-01 00:00:00' AND timestamp '1995-03-31 00:00:00'
        |ORDER BY o.o_orderkey""".stripMargin,
    "q_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_no_orders FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |  AND o.o_orderdate BETWEEN timestamp '1995-01-01 00:00:00' AND timestamp '1995-12-31 00:00:00')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_union_dedup" ->
      """SELECT DISTINCT c_custkey, c_mktsegment FROM (
        | SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 9000
        | UNION ALL
        | SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000
        |) ORDER BY c_custkey, c_mktsegment""".stripMargin,
    "q_dedup_keys" ->
      "SELECT DISTINCT o_custkey, o_orderstatus FROM orders ORDER BY o_custkey, o_orderstatus",
    "q_minmax_dates" ->
      """SELECT strftime(min(o_orderdate), '%Y-%m-%d') AS min_date,
        | strftime(max(o_orderdate), '%Y-%m-%d') AS max_date, count(*) AS n FROM orders""".stripMargin,
    "q_group_count" ->
      """SELECT user_id, event_type, count(*) AS n FROM events
        |GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin,
    "q_weighted_mean" ->
      """SELECT l_returnflag,
        | cast(sum(cast(l_extendedprice as decimal(18,2)) * cast(l_discount as decimal(18,2))) as double)
        |  / cast(sum(cast(l_discount as decimal(18,2))) as double) AS wmean_price
        |FROM lineitem WHERE l_discount > 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS o_date
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin,
    "q_paginate" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice
        |FROM orders ORDER BY o_date, o_orderkey LIMIT 20 OFFSET 100""".stripMargin,
    "q_sort_multi" ->
      """SELECT r.r_name, n.n_name FROM nation n
        |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        |ORDER BY r.r_name, n.n_name""".stripMargin,
    "q_date_parts" ->
      """SELECT cast(year(o_orderdate) as int) AS y, cast(month(o_orderdate) as int) AS m,
        | count(*) AS n, cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS sum_price
        |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        | ((l_partkey % 360) + 360) % 360 - 180 AS lon_wrap,
        | round(cos(radians(l_quantity)), 6) AS w,
        | round(l_quantity * 111.32 * 111.32 * 0.05 * 0.05 * cos(radians(l_quantity)) * 1000.0 / 1e6, 6) AS vol
        |FROM lineitem WHERE l_orderkey < 200 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_text_norm" ->
      """SELECT doc_id, lower(trim(regexp_replace(substr(text, 1, 80), '\s+', ' ', 'g'))) AS norm
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_case_buckets" ->
      """WITH b AS (
        | SELECT event_type,
        |  CASE WHEN value >= 0 AND value <= 100 THEN
        |    (CASE WHEN value*3 <= 100 THEN 1 WHEN value*3 <= 200 THEN 2 ELSE 3 END)
        |  ELSE least(3, greatest(1, cast(round(value/100) as int))) END AS bucket
        | FROM events WHERE value IS NOT NULL)
        |SELECT event_type, count(*) AS n, avg(bucket) AS avg_bucket,
        | CASE WHEN avg(bucket) <= 1.5 THEN 1 WHEN avg(bucket) <= 2.1 THEN 2 ELSE 3 END AS level
        |FROM b GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_coalesce_fill" ->
      """WITH o AS (SELECT o_custkey, count(*) AS cnt, max(o_orderdate) AS last_dt
        |           FROM orders GROUP BY o_custkey)
        |SELECT c.c_custkey, coalesce(o.cnt, 0) AS n_orders,
        | coalesce(strftime(o.last_dt, '%Y-%m-%d'), 'none') AS last_order
        |FROM customer c LEFT JOIN o ON c.c_custkey = o.o_custkey
        |ORDER BY c.c_custkey""".stripMargin,
    "q_window_rownum" ->
      """SELECT o_custkey, o_orderkey, first_date FROM (
        | SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS first_date,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        | FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    // DuckDB sum(BIGINT) yields HUGEINT, which pandas reads as float64 and
    // hash-mismatches Spark's int64 — the outer cast keeps sum_k BIGINT.
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        | cast(sum(cast(json_extract_string(props, '$.k') as int)) as bigint) AS sum_k,
        | max(cast(json_extract_string(props, '$.k') as int)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_promo_revenue" ->
      """SELECT substr(p.p_type, 1, 5) AS type_prefix, count(*) AS n,
        | cast(sum(CASE WHEN p.p_type LIKE '%a%'
        |   THEN cast(l.l_extendedprice as decimal(18,2)) * (cast(1 as decimal(18,2)) - cast(l.l_discount as decimal(18,2)))
        |   ELSE cast(0 as decimal(18,2)) END) as double) AS promo_rev,
        | cast(sum(cast(l.l_extendedprice as decimal(18,2)) * (cast(1 as decimal(18,2)) - cast(l.l_discount as decimal(18,2)))) as double) AS total_rev
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY type_prefix ORDER BY type_prefix""".stripMargin,
    "q_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_running_total" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        | cast(sum(cast(o_totalprice as decimal(18,2))) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS running_total
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_date, o_orderkey""".stripMargin,
    "q_pivot" ->
      """SELECT cast(year(o_orderdate) as int) AS y,
        | count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        | count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        | count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY y ORDER BY y""".stripMargin,
    // the HLL estimate itself is engine-specific; the oracle checks the
    // bounded-error CONTRACT — exact counts must match and every group's
    // within_bound must be true (DuckDB emits literal true)
    "q_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        | count(*) AS n, true AS within_bound
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, grouping_id(l_returnflag, l_linestatus) AS gid,
        | count(*) AS n, cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, grouping_id(l_returnflag, l_linestatus) AS gid,
        | count(*) AS n, cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin,
    "q_window_nav" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, value,
        | lag(value, 1) OVER w AS prev_value,
        | lead(value, 1) OVER w AS next_value,
        | first_value(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), value
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value,
        | last_value(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), value
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), value)
        |ORDER BY user_id, ts_us, value""".stripMargin,
    // min-chain replay: per stage, the earliest qualifying event
    // strictly after the previous stage, within 7 days of t1
    "q_funnel" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
        |s1 AS (SELECT user_id, min(us) AS t1_us FROM ev WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.us) AS t2_us FROM ev e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.us > s1.t1_us
        |         AND e.us <= s1.t1_us + 604800000000 GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.us) AS t3_us
        |       FROM ev e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.us > s2.t2_us
        |         AND e.us <= s1.t1_us + 604800000000 GROUP BY 1)
        |SELECT s1.user_id AS user_id,
        |  cast(1 + (t2_us IS NOT NULL)::int + (t3_us IS NOT NULL)::int AS bigint) AS depth,
        |  t1_us, t2_us, t3_us
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,
    // brute |dirty|×|catalog| levenshtein — the two-table completeness
    // oracle (the dirty side derived by the same deterministic rewrite)
    "q_fuzzy_lookup" ->
      """WITH dirty AS (SELECT s_suppkey AS id1,
        |  replace(s_name, 'Supplier#', 'Supplr#') AS n1 FROM supplier),
        |canon AS (SELECT s_suppkey AS id2, s_name AS n2 FROM supplier)
        |SELECT id1, id2, levenshtein(n1, n2) AS dist
        |FROM dirty, canon
        |WHERE levenshtein(n1, n2) <= 3
        |ORDER BY id1, id2""".stripMargin,
    // the bounded verb's oracle: the SAME brute match set with the
    // deterministic (dist, id2) top-3 cut replayed as a window —
    // green proves the engine's rank window cuts identically
    "q_fuzzy_topk" ->
      """WITH dirty AS (SELECT s_suppkey AS id1,
        |  replace(s_name, 'Supplier#', 'Supplr#') AS n1 FROM supplier),
        |canon AS (SELECT s_suppkey AS id2, s_name AS n2 FROM supplier),
        |m AS (SELECT id1, id2, levenshtein(n1, n2) AS dist
        |      FROM dirty, canon WHERE levenshtein(n1, n2) <= 3)
        |SELECT id1, id2, dist FROM m
        |QUALIFY row_number() OVER (PARTITION BY id1 ORDER BY dist, id2) <= 3
        |ORDER BY id1, id2""".stripMargin,
    // brute n² levenshtein — the completeness oracle for the q-gram
    // signature filter chain
    "q_fuzzy_join" ->
      """SELECT a.s_suppkey AS id1, b.s_suppkey AS id2,
        | levenshtein(a.s_name, b.s_name) AS dist
        |FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
        |WHERE levenshtein(a.s_name, b.s_name) <= 1
        |ORDER BY id1, id2""".stripMargin,
    "q_set_ops" ->
      """WITH a AS (SELECT l_orderkey FROM lineitem WHERE l_discount > 0.08),
        |b AS (SELECT l_orderkey FROM lineitem WHERE l_tax > 0.05)
        |SELECT l_orderkey, set_op FROM (
        | SELECT l_orderkey, 'both' AS set_op
        |   FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        | UNION ALL SELECT l_orderkey, 'disc_only'
        |   FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        | UNION ALL SELECT l_orderkey, 'tax_only'
        |   FROM (SELECT * FROM b EXCEPT SELECT * FROM a))
        |ORDER BY set_op, l_orderkey""".stripMargin,
    // exact-moment statistics: decimal sums → ONE double conversion →
    // the identical IEEE expression tree (parens mirror the Spark side)
    "q_corr_stats" ->
      """WITH m AS (SELECT l_returnflag, count(*) AS n,
        | cast(sum(cast(l_quantity as decimal(18,2))) as double) AS sx,
        | cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS sy,
        | cast(sum(cast(l_quantity as decimal(18,2)) * cast(l_quantity as decimal(18,2))) as double) AS sxx,
        | cast(sum(cast(l_extendedprice as decimal(18,2)) * cast(l_extendedprice as decimal(18,2))) as double) AS syy,
        | cast(sum(cast(l_quantity as decimal(18,2)) * cast(l_extendedprice as decimal(18,2))) as double) AS sxy
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        | round(sx / n, 6) AS mean_qty,
        | round(sqrt(((n * sxx) - (sx * sx)) / (n * (n - 1))), 6) AS stddev_qty,
        | round(((n * sxy) - (sx * sy)) /
        |   sqrt(((n * sxx) - (sx * sx)) * ((n * syy) - (sy * sy))), 6) AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_trailing_agg" ->
      """SELECT user_id, epoch_us(ts) AS ts_us, value,
        | count(*) OVER w AS n_7d,
        | cast(sum(cast(value as decimal(18,2))) OVER w as double) AS sum_7d
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, value""".stripMargin,
    "q_session_window" ->
      """WITH p AS (SELECT user_id, ts, value,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events),
        |s AS (SELECT user_id, ts, value,
        |  sum(CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        | FROM p)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        | count(*) AS n, cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "q_window_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        | count(*) AS n, cast(sum(cast(value as decimal(18,2))) as double) AS sum_value
        |FROM events GROUP BY hour ORDER BY hour""".stripMargin,
  )
}
