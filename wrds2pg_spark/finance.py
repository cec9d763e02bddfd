"""Quantitative-research statistics — the workloads wrds2pg's own
users run downstream of the ingest the reference provides.

The reference (iangow/wrds2pg) exists to land WRDS research data
(CRSP/Compustat-shaped tables) into a warehouse precisely so that
researchers can run cross-sectional regressions, rolling betas,
portfolio sorts and Fama-MacBeth passes over it (the reference's own
README motivates the tool with this analyst workflow; it implements
none of the analytics itself).  This module supplies those
primitives — per-group OLS, rolling betas, portfolio decile sorts,
Fama-MacBeth, and event-study CARs — as first-class, oracle-checked
relational operators over the TPC-H-ish fixtures.

Exactness doctrine (the same scaled-integer contract as
functions/numeric.py): every OLS is computed from integer-scaled
moment sums (n, Σx, Σy, Σx², Σxy[, Σy²]) aggregated as BIGINT — or
DECIMAL(38,0)/HUGEINT where a square exceeds the 2^63 bound — so the
moments are associative and bit-identical on any partitioning.  The
slope/intercept/R² combinations convert each EXACT integer to double
(one deterministic round-to-nearest per term) and apply an identical
IEEE expression tree on both engines, so even the catastrophic-
cancellation cases hash-match: cancellation costs accuracy against
the infinitely-precise value, never cross-engine equality.

Scale shape: each operator is one map-side-combined aggregation over
the fact stream (plus a dimension attach for Fama-MacBeth) — no UDF,
no collect, no iteration.  The moment sums are O(groups), so at
100 TB every operator is a single fact scan + one exchange of a few
longs per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from wrds2pg_spark.functions.numeric import DAVG_SQL, davg
from wrds2pg_spark.queries import register
from wrds2pg_spark.sources.testdata import load_table

_DEC = "decimal(38,0)"

# Split-sum shift: SUM(decimal) falls out of whole-stage codegen into
# per-row BigDecimal (measured 27.5 s vs 0.7 s for the same 6M-row
# moment aggregate at sf1 — a 39x cliff), so any product whose TOTAL
# outgrows 2^63 is summed as two long sums instead: the arithmetic
# shift keeps floor-division semantics for negative products (two's
# complement: p == (p>>26)*2^26 + (p & (2^26-1)) for every int64),
# and the exact DECIMAL reconstruction hi*2^26 + lo runs once per
# GROUP, not per row.
_SPLIT = 26
_MASK = (1 << _SPLIT) - 1


def _split_sums(prod, name):
    """Two long-sum aggregate expressions whose exact recombination
    is SUM(prod), for products whose total may exceed 2^63."""
    return [
        F.sum(F.shiftright(prod, _SPLIT)).alias(f"{name}_hi"),
        F.sum(prod.bitwiseAND(F.lit(_MASK))).alias(f"{name}_lo"),
    ]


def _split_val(name):
    """Exact DECIMAL(38,0) value of a split sum — O(groups) decimal."""
    return (
        F.col(f"{name}_hi").cast(_DEC) * F.lit(1 << _SPLIT)
        + F.col(f"{name}_lo").cast(_DEC)
    )


def _slope_cols(n="n", sx="sx", sy="sy", sxx="sxx", sxy="sxy"):
    """Exact OLS numerator/denominator from integer moment columns,
    as DECIMAL(38,0) Columns.  NOTE the y-scale does NOT cancel in
    the slope: both n·Σxy and Σx·Σy carry one factor of the y-scale,
    so num ∝ scale and num/den is a slope in SCALED-y units per unit
    x — callers reporting coefficients must divide by the scale (see
    stats_ols_by_group).  The scale does cancel in R² (num² and
    den·ssy each carry scale²)."""
    nD = F.col(n).cast(_DEC)
    sxD = F.col(sx).cast(_DEC)
    num = nD * F.col(sxy).cast(_DEC) - sxD * F.col(sy).cast(_DEC)
    den = nD * F.col(sxx).cast(_DEC) - sxD * sxD
    return num, den


_SLOPE_SQL_NUM = ("(CAST({n} AS HUGEINT) * {sxy}"
                  " - CAST({sx} AS HUGEINT) * {sy})")
_SLOPE_SQL_DEN = ("(CAST({n} AS HUGEINT) * {sxx}"
                  " - CAST({sx} AS HUGEINT) * {sx})")


@register(
    "stats_ols_by_group",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               SUM(CAST(l_quantity AS BIGINT)) AS sx,
               SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sy,
               SUM(CAST(l_quantity AS BIGINT)
                   * CAST(l_quantity AS BIGINT)) AS sxx,
               SUM(CAST(l_quantity AS BIGINT)
                   * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sxy,
               SUM(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        AS HUGEINT)
                   * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS syy
        FROM lineitem GROUP BY l_returnflag),
    d AS (
        SELECT l_returnflag, n,
               CAST((CAST(n AS HUGEINT) * sxy
                     - CAST(sx AS HUGEINT) * sy) AS DOUBLE) AS numd,
               CAST((CAST(n AS HUGEINT) * sxx
                     - CAST(sx AS HUGEINT) * sx) AS DOUBLE) AS dend,
               CAST((CAST(n AS HUGEINT) * syy
                     - CAST(sy AS HUGEINT) * sy) AS DOUBLE) AS ssyd,
               CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
               CAST(n AS DOUBLE) AS nd
        FROM m)
    SELECT l_returnflag, n,
           round(numd / dend / 100.0, 6) AS slope,
           round(syd / (100.0 * nd)
                 - (numd / dend / 100.0) * (sxd / nd), 6) AS intercept,
           round((numd * numd) / (dend * ssyd), 6) AS r2
    FROM d
    """,
)
def stats_ols_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS regression (y = l_extendedprice on
    x = l_quantity, grouped by l_returnflag): slope, intercept and R²
    from exact integer moments — the cross-sectional-regression
    primitive of empirical finance, the first thing a WRDS user runs
    after the reference lands their tables.

    Units: y is aggregated cent-scaled (×100) for exactness, so the
    raw moment slope num/den is in cents per unit x; both reported
    coefficients are un-scaled back to DOLLAR units — slope =
    (num/den)/100 and intercept = Σy/(100n) − slope·Σx/n — so
    intercept is the dollar mean of y minus the dollar slope times
    mean x (the r6 form mixed the two scales; ADVICE r6).  R² is
    scale-invariant (the ×100 cancels between num² and den·ssy).

    Exactness: x is integral, y carries 2 decimals → Σx/Σx²/Σxy/Σy
    sum as BIGINT (Σxy peaks ~3e15 at sf1, inside 2^63), and Σy² —
    whose ~1e14 per-row square would overflow a BIGINT total — as a
    hi/lo SPLIT long pair (see _split_sums: the naive DECIMAL sum
    measured a 39x cliff; the DuckDB oracle just sums HUGEINT — equal
    VALUE, different mechanics, and only the value feeds the tree).
    num² for R² would overflow even 128-bit at ~4e44, so each exact
    integer converts to double FIRST (deterministic nearest-even,
    same on both engines) and the combination runs in an identical
    IEEE tree — hash-equal by construction, cancellation
    notwithstanding.

    Scale shape: ONE map-side-combined aggregate over the fact scan;
    the exchange carries 7 integers per group.  No second pass, no
    broadcast, no UDF."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    m = li.select(
        "l_returnflag", x.alias("x"), y.alias("y")
    ).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        *_split_sums(F.col("y") * F.col("y"), "syy"),
    )
    num, den = _slope_cols()
    ssy = (F.col("n").cast(_DEC) * _split_val("syy")
           - F.col("sy").cast(_DEC) * F.col("sy").cast(_DEC))
    numd, dend, ssyd = (num.cast("double"), den.cast("double"),
                        ssy.cast("double"))
    slope = numd / dend / F.lit(100.0)
    return m.select(
        "l_returnflag",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(
            F.col("sy").cast("double")
            / (F.lit(100.0) * F.col("n").cast("double"))
            - slope * (F.col("sx").cast("double")
                       / F.col("n").cast("double")),
            6,
        ).alias("intercept"),
        F.round((numd * numd) / (dend * ssyd), 6).alias("r2"),
    )


_ROLL = 20  # trailing observations per beta (the classic 20-bar frame)


@register(
    "stats_rolling_beta",
    oracle=f"""
    WITH r AS (
        SELECT event_type, event_id,
               CAST(row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY ts, event_id) AS BIGINT) AS rn,
               CAST(round(value * 100, 0) AS BIGINT) AS yv
        FROM events),
    s AS (
        SELECT event_type, event_id, rn,
               SUM(rn) OVER w AS sx,
               SUM(yv) OVER w AS sy,
               SUM(rn * rn) OVER w AS sxx,
               SUM(rn * yv) OVER w AS sxy,
               CAST(count(*) OVER w AS BIGINT) AS k
        FROM r
        WINDOW w AS (PARTITION BY event_type ORDER BY rn
                     ROWS BETWEEN {_ROLL - 1} PRECEDING AND CURRENT ROW))
    SELECT event_type, event_id,
           round(CAST(k * sxy - sx * sy AS DOUBLE)
                 / CAST(k * sxx - sx * sx AS DOUBLE), 6) AS beta
    FROM s WHERE k = {_ROLL}
    """,
)
def stats_rolling_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling regression slope over the trailing 20 observations
    per series (events partitioned by event_type, ordered by time):
    the rolling-beta / local-trend estimator of every event-study and
    risk pipeline, emitted for every full window.

    All five rolling moments ride ONE window frame over the series
    ordering (x is the within-series row index, so Σx/Σx² are frame
    sums of small integers and the 20-row Σxy peaks ~2e11 — BIGINT
    throughout, no decimal needed), and the slope combination is the
    same exact-integer-to-double IEEE tree as stats_ols_by_group.

    Scale shape: one exchange on the series key + one sort — the
    standard window plan; every moment shares the single frame
    traversal (Spark evaluates the five frame aggregates in one
    WindowExec pass).  A second chained select materializes the row
    index before the frame sums consume it (nested window
    expressions are illegal); the second window reuses the first's
    partitioning AND ordering, so no extra exchange or sort is
    paid."""
    ev = load_table(spark, sf_dir, "events")
    wo = W.partitionBy("event_type").orderBy("ts", "event_id")
    r = ev.select(
        "event_type",
        "event_id",
        "ts",
        F.row_number().over(wo).cast("long").alias("rn"),
        F.round(F.col("value") * 100, 0).cast("long").alias("yv"),
    )
    # frame ordered by the SAME (ts, event_id) keys as the row-index
    # window — rn is their rank, so the sequence is identical, and the
    # matching window spec lets one Sort serve both WindowExecs
    # (ordering by the derived rn instead planned a second sort)
    wf = (
        W.partitionBy("event_type").orderBy("ts", "event_id")
        .rowsBetween(-(_ROLL - 1), W.currentRow)
    )
    s = r.select(
        "event_type",
        "event_id",
        F.sum("rn").over(wf).alias("sx"),
        F.sum("yv").over(wf).alias("sy"),
        F.sum(F.col("rn") * F.col("rn")).over(wf).alias("sxx"),
        F.sum(F.col("rn") * F.col("yv")).over(wf).alias("sxy"),
        F.count(F.lit(1)).over(wf).cast("long").alias("k"),
    ).filter(F.col("k") == _ROLL)
    num = F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "event_type",
        "event_id",
        F.round(num.cast("double") / den.cast("double"), 6).alias("beta"),
    )


@register(
    "stats_portfolio_deciles",
    oracle=f"""
    WITH d AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               o_totalprice,
               ntile(10) OVER (PARTITION BY date_trunc('month', o_orderdate)
                               ORDER BY o_totalprice, o_orderkey) AS dec
        FROM orders),
    g AS (
        SELECT month,
               CAST(count(*) AS BIGINT) AS n_orders,
               {DAVG_SQL("CASE WHEN dec = 1 THEN o_totalprice END", 2)}
                   AS mean_bottom,
               {DAVG_SQL("CASE WHEN dec = 10 THEN o_totalprice END", 2)}
                   AS mean_top
        FROM d GROUP BY month)
    SELECT month, n_orders,
           round(mean_bottom, 4) AS mean_bottom,
           round(mean_top, 4) AS mean_top,
           round(mean_top - mean_bottom, 4) AS spread
    FROM g
    """,
)
def stats_portfolio_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly portfolio sort — the decile-spread construction behind
    every factor backtest: within each calendar month, rank orders
    into value deciles (ntile over a fully-deterministic ordering —
    the o_orderkey tiebreak makes ntile's remainder assignment
    identical on both engines) and report the bottom/top decile means
    and the top-minus-bottom spread.

    Scale shape: one exchange on the period key feeds BOTH the ntile
    sort and the re-aggregation (same clustering, so the groupBy
    after the window is exchange-free), and the conditional decile
    means are map-side-combined scaled-long sums (davg).  Periods are
    unbounded but each is independent — the canonical
    time-partitioned backtest layout at any scale."""
    o = load_table(spark, sf_dir, "orders")
    month = F.date_format(
        F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM"
    ).alias("month")
    wn = W.partitionBy("month").orderBy("o_totalprice", "o_orderkey")
    d = o.select(month, "o_totalprice", "o_orderkey").withColumn(
        "dec", F.ntile(10).over(wn)
    )
    mask = lambda k: F.when(F.col("dec") == k, F.col("o_totalprice"))  # noqa: E731
    g = d.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        davg(mask(1), 2).alias("mb"),
        davg(mask(10), 2).alias("mt"),
    )
    return g.select(
        "month",
        "n_orders",
        F.round(F.col("mb"), 4).alias("mean_bottom"),
        F.round(F.col("mt"), 4).alias("mean_top"),
        F.round(F.col("mt") - F.col("mb"), 4).alias("spread"),
    )


@register(
    "stats_fama_macbeth",
    oracle="""
    WITH j AS (
        SELECT date_trunc('month', o.o_orderdate) AS p,
               CAST(round(c.c_acctbal * 100, 0) AS BIGINT) AS x,
               CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    m AS (
        SELECT p, CAST(count(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(x AS HUGEINT) * y) AS sxy
        FROM j GROUP BY p),
    sl AS (
        SELECT p,
               round(CAST(CAST(n AS HUGEINT) * sxy
                          - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                     / CAST(CAST(n AS HUGEINT) * sxx
                            - CAST(sx AS HUGEINT) * sx AS DOUBLE), 6)
                   AS gamma
        FROM m
        WHERE (CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx) <> 0),
    t AS (
        SELECT CAST(count(*) AS BIGINT) AS n_periods,
               SUM(CAST(round(gamma * 1e6, 0) AS BIGINT)) AS s1,
               SUM(CAST(round(gamma * 1e6, 0) AS BIGINT)
                   * CAST(round(gamma * 1e6, 0) AS BIGINT)) AS s2
        FROM sl)
    SELECT n_periods,
           round(CAST(s1 AS DOUBLE) / (1e6 * CAST(n_periods AS DOUBLE)), 6)
               AS gamma_mean,
           round((CAST(s1 AS DOUBLE) / (1e6 * CAST(n_periods AS DOUBLE)))
                 / sqrt(((CAST(s2 AS DOUBLE) / 1e12
                          - (CAST(s1 AS DOUBLE) / 1e6)
                            * (CAST(s1 AS DOUBLE) / 1e6)
                            / CAST(n_periods AS DOUBLE))
                         / (CAST(n_periods AS DOUBLE) - 1.0))
                        / CAST(n_periods AS DOUBLE)), 6) AS t_stat
    FROM t
    """,
)
def stats_fama_macbeth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fama-MacBeth (1973) two-pass regression: a cross-sectional OLS
    of order value on the customer characteristic (c_acctbal) in
    EVERY month, then the time-series mean of the monthly slopes with
    its t-statistic — the standard-errors workhorse of asset-pricing
    papers, i.e. exactly what WRDS data gets pulled for.

    Pass 1 is one characteristic attach (orders⋈customer — AQE
    broadcasts the build side while it fits; no forced hint, the
    customer table is SF-scaled) and one map-side-combined moment
    aggregate per month — Σx² and Σxy ride the hi/lo split-long sums
    (_split_sums: Σxy's ~5e13 per-row product overflows a BIGINT
    total at sf1, and a DECIMAL sum is the measured 39x codegen
    cliff); the per-month slopes round to 6 dp, making them EXACT
    1e6-scaled integers.  Pass 2 then aggregates those
    integers as BIGINTs (T ~ dozens of periods — the second pass is
    O(periods), driver-free), so mean, variance and t-stat come out
    of the same deterministic IEEE tree on both engines.  Degenerate
    months (zero characteristic variance) drop via the den<>0 guard
    on BOTH sides rather than emitting engine-specific Inf."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.date_trunc("month", F.col("o_orderdate")).alias("p"),
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("x"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("y"),
    )
    m = j.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        *_split_sums(F.col("x") * F.col("x"), "sxx"),
        *_split_sums(F.col("x") * F.col("y"), "sxy"),
    )
    nD = F.col("n").cast(_DEC)
    sxD = F.col("sx").cast(_DEC)
    num = nD * _split_val("sxy") - sxD * F.col("sy").cast(_DEC)
    den = nD * _split_val("sxx") - sxD * sxD
    sl = (
        m.filter(den != F.lit(0).cast(_DEC))
        .select(F.round(num.cast("double") / den.cast("double"), 6)
                .alias("gamma"))
    )
    gi = F.round(F.col("gamma") * 1e6, 0).cast("long")
    t = sl.select(gi.alias("gi")).agg(
        F.count(F.lit(1)).cast("long").alias("n_periods"),
        F.sum("gi").alias("s1"),
        F.sum(F.col("gi") * F.col("gi")).alias("s2"),
    )
    nd = F.col("n_periods").cast("double")
    mean = F.col("s1").cast("double") / (F.lit(1e6) * nd)
    var = (
        F.col("s2").cast("double") / F.lit(1e12)
        - (F.col("s1").cast("double") / F.lit(1e6))
        * (F.col("s1").cast("double") / F.lit(1e6)) / nd
    ) / (nd - F.lit(1.0))
    return t.select(
        "n_periods",
        F.round(mean, 6).alias("gamma_mean"),
        F.round(mean / F.sqrt(var / nd), 6).alias("t_stat"),
    )


_CAR_HALF = 3  # event-window half-width (±3 surrounding events)


@register(
    "stats_event_study_car",
    oracle=f"""
    WITH mu AS (
        SELECT event_type,
               CAST(round({DAVG_SQL('value', 2)} * 100, 0) AS BIGINT)
                   AS mu100
        FROM events GROUP BY event_type),
    ab AS (
        SELECT e.event_id, e.user_id, e.ts, e.event_type,
               CAST(round(e.value * 100, 0) AS BIGINT) - m.mu100 AS ab100
        FROM events e JOIN mu m USING (event_type)),
    w AS (
        SELECT event_id, user_id, event_type,
               SUM(ab100) OVER win AS car100,
               CAST(count(*) OVER win AS BIGINT) AS n_window
        FROM ab
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {_CAR_HALF} PRECEDING
                            AND {_CAR_HALF} FOLLOWING))
    SELECT event_id, user_id, n_window,
           CAST(car100 AS DOUBLE) / 100.0 AS car
    FROM w WHERE event_type = 'purchase'
    """,
)
def stats_event_study_car(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event study — cumulative abnormal value in the ±3-event window
    around every anchor ('purchase') event, per user: THE empirical-
    finance design WRDS data feeds (MacKinlay 1997's CAR, transposed
    onto the events fixture).  Abnormal value is defined against the
    2-dp-ROUNDED per-type mean, which makes every abnormal term an
    exact scaled long and the window CAR an exact BIGINT sum — no
    floating-point accumulation order anywhere (a raw double frame
    sum would diverge between Spark's running accumulation and
    DuckDB's segment-tree windowed sums in the last ulp).

    Scale shape: the 5-row per-type mean broadcasts (bounded
    vocabulary, not SF-scaled); one user-key exchange + one sort
    serves the single frame; the anchor filter applies AFTER the
    frame sum so surrounding non-anchor events contribute.  At 100 TB
    this is one window pass over the event log — the same shape as
    stats_rolling_beta.

    Round-7 A/Bs (VERDICT item 5, sf1 min-of-6): the two fact passes
    are NOT the cost — replacing the second parquet scan with a lazy
    localCheckpoint of the projected fact measured a WASH (0.754 vs
    0.783 s; the checkpoint write costs what the saved scan earns,
    the same negative as the unigram key), and a type-partitioned
    mean window would put the whole fact in 5 unsplittable tasks
    (the bigram-c12 window negative).  Residual 2.4x vs DuckDB
    (0.75 vs 0.31 s) is the user-window exchange+sort itself — the
    rolling-beta floor argument applies."""
    ev = load_table(spark, sf_dir, "events")
    mu = ev.groupBy("event_type").agg(
        F.round(davg(F.col("value"), 2) * 100, 0).cast("long").alias("mu100")
    )
    ab = ev.join(F.broadcast(mu), "event_type").select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        (F.round(F.col("value") * 100, 0).cast("long")
         - F.col("mu100")).alias("ab100"),
    )
    win = (
        W.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-_CAR_HALF, _CAR_HALF)
    )
    w = ab.select(
        "event_id",
        "user_id",
        "event_type",
        F.sum("ab100").over(win).alias("car100"),
        F.count(F.lit(1)).over(win).cast("long").alias("n_window"),
    )
    return w.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "n_window",
        (F.col("car100").cast("double") / F.lit(100.0)).alias("car"),
    )


@register(
    "stats_herfindahl",
    oracle="""
    WITH cv AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               o_custkey,
               SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS sv
        FROM orders GROUP BY 1, 2),
    m AS (
        SELECT month,
               CAST(count(*) AS BIGINT) AS n_buyers,
               SUM(sv) AS total,
               SUM(CAST(sv AS HUGEINT) * sv) AS sq
        FROM cv GROUP BY month)
    SELECT month, n_buyers,
           round(CAST(sq AS DOUBLE)
                 / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)),
                 6) AS hhi
    FROM m
    """,
)
def stats_herfindahl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index per month: the sum of
    squared buyer market shares, the antitrust / market-structure
    statistic every industrial-organization pipeline computes from
    exactly this kind of transaction table.  HHI = Σ sv² / (Σ sv)²
    needs NO per-share division: both terms come from the same
    per-(month, buyer) cent-exact totals, so the whole statistic is
    two integers per month converted once to double — bit-identical
    cross-engine by the module's standard tree.

    Scale shape: two chained aggregations — (month, buyer) then
    month — where the second reuses the first's hash partitioning
    only if month leads the key; the sv² totals ride the hi/lo
    split-long sums (sv² ~1e16 per buyer, Σ over buyers outgrows
    2^63; same _split_sums as the OLS keys, same 39x-cliff
    avoidance).  The per-buyer grain is the only corpus-sized
    exchange; months are O(periods)."""
    o = load_table(spark, sf_dir, "orders")
    cv = (
        o.groupBy(
            F.date_format(
                F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM"
            ).alias("month"),
            "o_custkey",
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
             .alias("sv"))
    )
    m = cv.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_buyers"),
        F.sum("sv").alias("total"),
        *_split_sums(F.col("sv") * F.col("sv"), "sq"),
    )
    td = F.col("total").cast("double")
    return m.select(
        "month",
        "n_buyers",
        F.round(_split_val("sq").cast("double") / (td * td), 6).alias("hhi"),
    )


@register(
    "stats_rfm_segments",
    oracle=f"""
    WITH mx AS (SELECT max(o_orderdate) AS mxd FROM orders),
    cu AS (
        SELECT o_custkey,
               date_diff('day', max(o_orderdate),
                         (SELECT mxd FROM mx)) AS rec_days,
               CAST(count(*) AS BIGINT) AS freq,
               SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                   AS mon_cents
        FROM orders GROUP BY o_custkey),
    sc AS (
        SELECT c.c_mktsegment AS segment,
               ntile(5) OVER (PARTITION BY c.c_mktsegment
                              ORDER BY cu.rec_days DESC,
                                       cu.o_custkey) AS r,
               ntile(5) OVER (PARTITION BY c.c_mktsegment
                              ORDER BY cu.freq, cu.o_custkey) AS f,
               ntile(5) OVER (PARTITION BY c.c_mktsegment
                              ORDER BY cu.mon_cents, cu.o_custkey) AS m,
               cu.mon_cents
        FROM cu JOIN customer c ON cu.o_custkey = c.c_custkey)
    SELECT segment, CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
           CAST(m AS BIGINT) AS m,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(SUM(mon_cents) AS DOUBLE) / 100.0 AS total_monetary
    FROM sc GROUP BY segment, r, f, m
    """,
)
def stats_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the classic CRM scoring grid, computed SEGMENT-RELATIVE: each
    customer's three quintile scores rank within their market segment
    (ntile(5) with the custkey tiebreak that makes remainder
    assignment engine-identical), then the grid cells aggregate
    customer counts and cent-exact monetary totals.

    Scale note: a GLOBAL ntile would be a single-partition window —
    the exact anti-pattern the q11 fallback exists for — so the
    scoring is deliberately partitioned by segment (the form RFM
    takes in practice anyway: scores are only comparable within a
    market).  All three windows share the segment hash exchange; the
    planner runs three in-partition sorts off one shuffle.  Recency
    anchors on the dataset's own max order date (a 1-row broadcast),
    so the key is reproducible on any snapshot."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    mx = o.agg(F.max("o_orderdate").alias("mxd"))
    cu = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .alias("mon_cents"),
    )
    base = (
        cu.crossJoin(F.broadcast(mx))
        .withColumn("rec_days",
                    F.datediff(F.col("mxd"), F.col("last_order")))
        .join(c, cu.o_custkey == c.c_custkey)
        .select("o_custkey", F.col("c_mktsegment").alias("segment"),
                "rec_days", "freq", "mon_cents")
    )

    def score(order_cols):
        return F.ntile(5).over(
            W.partitionBy("segment").orderBy(*order_cols, "o_custkey")
        ).cast("long")

    sc = base.select(
        "segment",
        "mon_cents",
        score([F.col("rec_days").desc()]).alias("r"),
        score(["freq"]).alias("f"),
        score(["mon_cents"]).alias("m"),
    )
    return sc.groupBy("segment", "r", "f", "m").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        (F.sum("mon_cents").cast("double") / F.lit(100.0))
        .alias("total_monetary"),
    )


@register(
    "stats_ridge_by_group",
    oracle="""
    WITH m AS (
        SELECT l_linestatus,
               CAST(count(*) AS BIGINT) AS n,
               SUM(CAST(round(l_discount * 100, 0) AS BIGINT)) AS sx,
               SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sy,
               SUM(CAST(round(l_discount * 100, 0) AS BIGINT)
                   * CAST(round(l_discount * 100, 0) AS BIGINT)) AS sxx,
               SUM(CAST(round(l_discount * 100, 0) AS BIGINT)
                   * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sxy
        FROM lineitem GROUP BY l_linestatus),
    d AS (
        SELECT l_linestatus, n,
               CAST((CAST(n AS HUGEINT) * sxy
                     - CAST(sx AS HUGEINT) * sy) AS DOUBLE) AS numd,
               CAST((CAST(n AS HUGEINT) * sxx
                     - CAST(sx AS HUGEINT) * sx) AS DOUBLE) AS dend,
               CAST(CAST(n AS HUGEINT) * n AS DOUBLE) AS n2d
        FROM m)
    SELECT l_linestatus, n,
           round(numd / dend, 6) AS slope_ols,
           round(numd / (dend + 5000.0 * n2d), 6) AS slope_ridge,
           round(dend / (dend + 5000.0 * n2d), 6) AS shrinkage
    FROM d
    """,
)
def stats_ridge_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ridge regression (y = l_extendedprice on
    x = l_discount, grouped by l_linestatus) next to its OLS twin —
    the L2-regularized slope every cross-sectional factor model fits
    when the regressor is weak or collinear.  With centered moments,
    ridge is a closed form: slope = Sxy / (Sxx + lambda*n), which in
    the n^2-scaled integer moments reads num / (den + lambda*n^2) —
    no iteration, no matrix solve, one extra IEEE add over the OLS
    denominator.  The shrinkage factor den/(den+lambda*n^2) is the
    fraction of the OLS slope that survives (lambda=50 in x-variance
    units; x is scaled x100, so the SQL constant is 5000).

    Exactness: x (discount x100) is integral <=10, y (price x100)
    integral -> all four moments sum exactly as BIGINT (Sxy peaks
    ~6e15 at sf10, inside 2^63); num/den combine in DECIMAL(38,0) /
    HUGEINT and convert to double before the division, an identical
    IEEE tree on both engines.

    Scale shape: ONE map-side-combined aggregate over the fact scan;
    the exchange carries 5 integers per group.  No second pass, no
    broadcast, no UDF (same plan family as stats_ols_by_group)."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_discount") * 100, 0).cast("long")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    m = li.select(
        "l_linestatus", x.alias("x"), y.alias("y")
    ).groupBy("l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num, den = _slope_cols()
    numd, dend = num.cast("double"), den.cast("double")
    n2d = (F.col("n").cast(_DEC) * F.col("n").cast(_DEC)).cast("double")
    ridge_den = dend + F.lit(5000.0) * n2d
    return m.select(
        "l_linestatus",
        "n",
        F.round(numd / dend, 6).alias("slope_ols"),
        F.round(numd / ridge_den, 6).alias("slope_ridge"),
        F.round(dend / ridge_den, 6).alias("shrinkage"),
    )
