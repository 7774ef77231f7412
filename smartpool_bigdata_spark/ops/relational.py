"""Core relational operators (SURVEY.md §2.2-2.6) as composable functions.

Each function takes and returns DataFrames and stays inside the Column
expression DSL, so every operator remains visible to Catalyst (pushdown,
pruning, whole-stage codegen) — no UDFs on these paths, matching the
reference's UDF-free surface (SURVEY.md §2.8).

Scale notes are attached per operator: these run on 100 TB inputs, so each
states its shuffle behavior and the mitigation for skew.
"""

from __future__ import annotations

import decimal
from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_columns(order_by: Sequence) -> list[Column]:
    cols = []
    for o in order_by:
        cols.append(F.col(o) if isinstance(o, str) else o)
    return cols


_INTERVAL_UNIT_US = {
    "week": 7 * 86_400_000_000,
    "day": 86_400_000_000,
    "hour": 3_600_000_000,
    "minute": 60_000_000,
    "second": 1_000_000,
    "millisecond": 1_000,
    "microsecond": 1,
}


def _interval_micros(spec: str) -> int:
    """Parse an interval string like ``"1 day"`` / ``"6 hours 30 minutes"``
    into microseconds, driver-side and timezone-free. Fixed-width units
    only (week and below) — a bucketization width must be a constant
    number of microseconds, so calendar units (month/year) are rejected
    rather than silently approximated."""
    total = 0
    toks = spec.lower().replace(",", " ").split()
    if len(toks) % 2:
        raise ValueError(f"malformed interval spec: {spec!r}")
    for qty, unit in zip(toks[::2], toks[1::2]):
        unit = unit.rstrip("s")
        if unit not in _INTERVAL_UNIT_US:
            raise ValueError(
                f"unsupported bucket unit {unit!r} in {spec!r}: fixed-width "
                f"units only ({', '.join(_INTERVAL_UNIT_US)})"
            )
        try:
            n = int(qty)
        except ValueError:
            # support fractional quantities ("1.5 hours"), which the
            # pre-r8 INTERVAL-literal path accepted; anything else gets
            # a diagnostic naming the spec, not a bare int() error.
            # Decimal, not float: binary rounding would falsely reject
            # specs that are exactly whole microseconds (e.g. "0.0079
            # seconds" = 7900 us, but 0.0079*1e6 = 7899.999... as float).
            try:
                frac_us = decimal.Decimal(qty) * _INTERVAL_UNIT_US[unit]
            except decimal.InvalidOperation:
                raise ValueError(
                    f"non-numeric quantity {qty!r} in interval spec {spec!r}"
                ) from None
            if frac_us != int(frac_us):
                raise ValueError(
                    f"interval spec {spec!r} is not a whole number of "
                    f"microseconds"
                )
            total += int(frac_us)
            continue
        total += n * _INTERVAL_UNIT_US[unit]
    if total <= 0:
        raise ValueError(f"bucket width must be positive: {spec!r}")
    return total


def _helper_col(df: DataFrame, base: str) -> str:
    """Name for an internal helper column that cannot collide with input
    columns (withColumn would silently overwrite a same-named column)."""
    name = base
    while name in df.columns:
        name += "_"
    return name


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence,
) -> DataFrame:
    """Latest-version-per-key dedupe — THE core Silver operator (W1/W2).

    Reference: row_number over (partition by pk order by updated_at desc
    [, id desc]) then rn==1 — ``spark-apps/03_silver_smartpool.py:14-20``,
    tie-breaks at ``notebooks/03_silver_smartpool.ipynb:235``.

    ``order_by`` should order BEST-first (i.e. pass descending columns) and
    include a unique tie-breaker for determinism.

    Scale: one hash-shuffle on ``keys`` + per-partition sort. Equivalent to
    SQL ``QUALIFY row_number() = 1``. With AQE skew-join/partition-split
    enabled a hot key is split automatically; for pathological single-key
    skew prefer ``max_by``-style aggregation (one fewer sort).
    """
    w = Window.partitionBy(*keys).orderBy(*_order_columns(order_by))
    rn = _helper_col(df, "__rn")
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) == 1)
        .drop(rn)
    )


def top_n_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence,
    n: int,
    method: str = "row_number",
    rank_col: str | None = None,
    low_cardinality: bool = False,
) -> DataFrame:
    """Top-N per group (W3/W4), with both reference semantics:

    * ``row_number`` — exactly N rows/group, deterministic with tie-break
      (notebook top-5: ``notebooks/06_gold_electricity_enrichment.ipynb:242-249``)
    * ``dense_rank`` — ties share a rank, groups may exceed N rows
      (script top-3: ``spark-apps/06_gold_electricity_enrichment.py:51-54``)

    Scale: single shuffle on ``keys``; rank predicate is applied before any
    downstream join so only N·groups rows survive the stage.

    **Low-cardinality hazard**: with K distinct keys the window sorts the
    ENTIRE table in K partitions regardless of shuffle.partitions — at
    100× data that is K giant sorted partitions. Pass
    ``low_cardinality=True`` for a two-phase plan: a salted local top-N
    (window over (keys, input-partition id) — parallelism = full cluster)
    prunes to ≤ n·partitions·K rows, then the global window ranks that tiny
    set. Correct for all three methods: any row in the global top-N of its
    group is in the local top-N of its input partition (row_number: direct;
    rank/dense_rank: its value is among the local top-N distinct/ranked
    values, a superset).
    """
    fn = {"row_number": F.row_number, "dense_rank": F.dense_rank, "rank": F.rank}[method]
    order_cols = _order_columns(order_by)
    src = df
    if low_cardinality:
        salt = _helper_col(df, "__salt")
        local_rank = _helper_col(df, "__lrank")
        salted = df.withColumn(salt, F.spark_partition_id())
        lw = Window.partitionBy(*keys, salt).orderBy(*order_cols)
        src = (
            salted.withColumn(local_rank, fn().over(lw))
            .filter(F.col(local_rank) <= n)
            .drop(salt, local_rank)
        )
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    out_col = rank_col or _helper_col(df, "__rank")
    ranked = src.withColumn(out_col, fn().over(w))
    out = ranked.filter(F.col(out_col) <= n)
    return out if rank_col else out.drop(out_col)


def conditional_pivot(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    agg_expr: Column | None = None,
    extra_aggs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Manual pivot via conditional aggregates (A3).

    Reference: ``sum(when(type=='chlorine',1).otherwise(0))`` × 4 types
    (``notebooks/04_gold_smartpool.ipynb:222-232``). ``agg_expr`` defaults
    to counting rows (lit(1)); pass e.g. ``F.col('amount')`` to sum values.

    Scale: one hash aggregate — partial (map-side) combine keeps the shuffle
    tiny regardless of input size; preferable to ``groupBy().pivot()`` when
    the pivot domain is known, because it avoids the extra distinct-values
    job pivot() launches.
    """
    src = agg_expr if agg_expr is not None else F.lit(1)
    aggs = [
        F.sum(F.when(F.col(pivot_col) == v, src).otherwise(F.lit(0))).alias(f"{v}_count")
        for v in values
    ]
    for name, expr in (extra_aggs or {}).items():
        aggs.append(expr.alias(name))
    return df.groupBy(*keys).agg(*aggs)


def map_lookup(mapping: Mapping, key: Column, default=None) -> Column:
    """Literal-map lookup column (P8).

    Reference: ``create_map(lit(k),lit(v),…)[col]`` for intervention→kWh
    (``notebooks/06_gold_electricity_enrichment.ipynb:367-375``).
    """
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    looked = F.create_map(*pairs)[key]
    return looked if default is None else F.coalesce(looked, F.lit(default))


def case_when_chain(rules: Sequence[tuple[Column, object]], default) -> Column:
    """CASE WHEN chain (P7) — reference cost model
    ``spark-apps/04_gold_smartpool.py:40-47``."""
    expr = None
    for cond, value in rules:
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    return expr.otherwise(default) if expr is not None else F.lit(default)


def range_flags(
    df: DataFrame,
    bounds: Mapping[str, tuple[float, float]],
    prefix: str = "",
    suffix: str = "_in_range",
) -> DataFrame:
    """Per-column between-range boolean flags (P5/P6).

    Reference sensor DQ ranges ``notebooks/07_kafka_smartpool_sensors.ipynb:421-427``
    and gold alert flags ``spark-apps/07_kafka_smartpool_sensors.py:125-128``.
    """
    for col, (lo, hi) in bounds.items():
        df = df.withColumn(f"{prefix}{col}{suffix}", F.col(col).between(lo, hi))
    return df


def dedupe_exact(df: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate removal (A6): dropDuplicates / distinct.

    Scale: hash-shuffle on the dedupe key. For wide rows prefer passing the
    key columns rather than distinct() on the whole row, so the shuffle
    carries only the first row per key (Spark keeps an arbitrary winner; use
    ``latest_by_key`` when the winner must be deterministic).
    """
    return df.dropDuplicates(list(keys)) if keys else df.distinct()


def duplicate_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Duplicate detection (A5 / QA): groupBy(pk).count().filter(count>1).

    Reference ``notebooks/03_silver_smartpool.ipynb:658-659``.
    """
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def orphan_rows(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
) -> DataFrame:
    """FK orphan check (J4): left-anti join fact→dim.

    Reference ``notebooks/03_silver_smartpool.ipynb:687-690``.

    Scale: if the dim fits the broadcast threshold Catalyst plans a
    BroadcastHashJoin(LeftAnti) — no shuffle of the fact table at all.
    """
    return fact.join(dim, fact[fact_key] == dim[dim_key], "left_anti")


def with_audit_columns(
    df: DataFrame,
    source: str | None = None,
    ingest_ts: Column | None = None,
    ts_col: str = "_ingest_ts",
    date_col: str = "_ingest_date",
    source_col: str = "_source",
    file_col: str | None = None,
) -> DataFrame:
    """Standard audit columns on every layer write (P13).

    Reference: ``_ingest_ts=current_timestamp()`` + ``input_file_name()``
    audit columns (``spark-apps/05_ingest_electricity_csv.py:48-56``,
    ``spark-apps/02_ingest_smartpool.py:68``).

    ``ingest_ts`` is injectable (pass ``F.lit(...).cast('timestamp')``) so
    golden tests stay deterministic — the reference's wall-clock audit cols
    are exactly what SURVEY §7.4.6 flags as ungoldenable.
    """
    ts = ingest_ts if ingest_ts is not None else F.current_timestamp()
    out = df.withColumn(ts_col, ts).withColumn(date_col, F.col(ts_col).cast("date"))
    if source is not None:
        out = out.withColumn(source_col, F.lit(source))
    if file_col is not None:
        # provenance per row — only meaningful directly over a file scan
        # (returns '' once a shuffle separates the row from its file)
        out = out.withColumn(file_col, F.input_file_name())
    return out


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: Mapping[str, tuple[Column, Callable[[Column], Column]]],
    salt_buckets: int = 64,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-stage aggregation with explicit salting for pathological key
    skew: stage 1 aggregates on (keys, salt) — a hot key's rows spread
    over ``salt_buckets`` reducers — stage 2 merges the tiny partials on
    the true keys.

    ``partials`` maps output column → (partial_agg_expr, merge_fn), e.g.
    ``{"n": (F.count(F.lit(1)), F.sum), "mx": (F.max("v"), F.max)}`` —
    the aggregate must be algebraic (decomposable into partial + merge).

    ``salt_cols`` picks the columns hashed into the salt (default: all).
    Salting on the argument of a COUNT DISTINCT makes even distinct exact
    across buckets: each distinct value lands in exactly one (key, salt)
    bucket, so the per-bucket distinct counts sum to the global one.

    When to use: Spark's hash aggregate already does map-side partial
    combine, which absorbs most skew; AQE splits skewed JOIN partitions
    but not aggregation partitions. Reach for this only when one reducer
    key still dominates after partial combine — e.g. high-cardinality
    DISTINCT-style state per key, where map-side combine can't shrink the
    stream. Salt = hash of all columns mod buckets (deterministic, no
    rand() — keeps the plan replayable/resumable).
    """
    salt = _helper_col(df, "__salt")
    basis = list(salt_cols) if salt_cols else list(df.columns)
    salted = df.withColumn(
        salt, F.pmod(F.hash(*[F.col(c) for c in basis]), F.lit(salt_buckets))
    )
    stage1 = salted.groupBy(*keys, salt).agg(
        *[expr.alias(name) for name, (expr, _merge) in partials.items()]
    )
    stage2 = stage1.groupBy(*keys).agg(
        *[merge(F.col(name)).alias(name) for name, (_expr, merge) in partials.items()]
    )
    return stage2


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    salt_buckets: int = 8,
    salt_cols: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with explicit key salting for pathological join-key skew.

    The skewed side gets a deterministic salt in [0, salt_buckets) hashed
    from ``salt_cols`` (default: all its columns), spreading a hot key's
    rows over ``salt_buckets`` reducers; the other side is replicated
    once per salt value (explode over sequence — a row-count multiply of
    the SMALLER side only). The join runs on (keys..., salt), which is an
    exact rewrite: every (skewed row, other row) pair meets in exactly
    one salt bucket, so the result equals the unsalted join for inner and
    left joins (the skewed side must be the left/preserved side).

    When to use: two LARGE tables (neither broadcastable) whose join key
    has a dominant hot value. AQE's skew-join split handles most cases at
    runtime — prefer it; reach for explicit salting when a single key is
    so hot that even a split partition exceeds executor memory, or when
    the plan must be stable across runs (AQE decisions are data-driven).
    Deterministic hash salt, no rand(): replayable under task retries.
    """
    if how not in ("inner", "left"):
        # the rewrite is an exact equivalence ONLY when the skewed side is
        # the preserved side: a right/full/anti join over the replicated
        # side double-counts unmatched replicas — corrupt data, not an
        # optimization. Refuse loudly.
        raise ValueError(
            f"salted_join is only an exact rewrite for how='inner'/'left', got {how!r}"
        )
    # must be absent from BOTH sides: resolving against one side and then
    # extending only while it collides with the other can land back on a
    # real column of the first side (e.g. skewed has '__salt_' and other
    # has '__salt'), and withColumn would silently overwrite it
    salt = "__salt"
    while salt in skewed.columns or salt in other.columns:
        salt += "_"
    basis = list(salt_cols) if salt_cols else list(skewed.columns)
    salted = skewed.withColumn(
        salt, F.pmod(F.hash(*[F.col(c) for c in basis]), F.lit(salt_buckets))
    )
    replicated = other.withColumn(
        salt, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted.join(replicated, [*on, salt], how).drop(salt)


def global_running_sum(
    df: DataFrame,
    order_by: Sequence[str],
    value_col: str,
    partition_cols: Sequence[str] = (),
    out_col: str = "running_sum",
    num_range_partitions: int | None = None,
) -> DataFrame:
    """Cumulative sum over a GLOBAL (or per-group) ordering without a
    one-task-per-group window — the distributed prefix-sum.

    Semantically identical to
    ``sum(value) OVER (PARTITION BY groups ORDER BY order_by ROWS
    UNBOUNDED PRECEDING)``, but that window form funnels every group
    through a single reducer task — at 100 TB, "cumulative tokens over
    the English corpus" means one executor thread sorting petabytes.
    This is the classic two-phase rewrite:

    1. ``repartitionByRange(groups..., order_by...)`` — rows land in
       globally ordered, contiguous ranges (one range shuffle, the same
       exchange a global sort pays);
    2. within-range running sum via a window PARTITIONED BY the physical
       range id — every range computes in parallel;
    3. per-(range, group) totals (tiny: #ranges x #groups rows) get a
       driver-scale exclusive-prefix window and broadcast back as
       offsets; row value = within-range cumsum + range offset.

    The range-bucket id is a DETERMINISTIC COLUMN EXPRESSION, not
    ``spark_partition_id()``: approxQuantile bounds on the first order
    column are collected once (a driver-side constant, like a watermark)
    and each row's bucket = count of bounds below its key. This matters
    because the frame is consumed by two plan branches (within-bucket
    cumsum + bucket totals): a sampling-based ``repartitionByRange``
    re-executes per branch and can land boundary rows in DIFFERENT
    physical partitions each time, silently corrupting the offsets —
    caught by the equivalence test before this landed. Plan shape
    (verified via executedPlan): ONE full-data hash exchange on
    (bucket, groups) for the within-bucket window, plus two tiny ones —
    the map-side-combined bucket totals and the #buckets x #groups
    offsets window — and broadcast joins only; no sort-merge join, no
    cartesian. The bounds being approximate only skews bucket SIZES,
    never values.

    The result is deterministic as long as ``order_by`` is a TOTAL order
    per group — pass a unique tiebreaker column (ties in a rows-frame
    cumsum are order-ambiguous in any engine, this one included). The
    first ``order_by`` column must be numeric (it feeds approxQuantile);
    ties on it stay within one bucket by construction.
    """
    spark = df.sparkSession
    if num_range_partitions is None:
        num_range_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "200")
        )
    n = max(1, int(num_range_partitions))
    ocols = [F.col(c) for c in order_by]
    pid = _helper_col(df, "__bucket")
    if n > 1:
        probs = [i / n for i in range(1, n)]
        bounds = sorted(set(df.stat.approxQuantile(order_by[0], probs, 0.001)))
    else:
        bounds = []
    if bounds:
        # plain CASE-sum, deliberately lambda-free: a higher-order
        # function (aggregate/filter) whose lambda captures a data column
        # inside a groupBy key under a window trips Catalyst attribute
        # binding (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND on Spark 4.1) —
        # hit while building this; the expanded form optimizes fine
        key = f"cast({order_by[0]} as double)"
        bexpr = F.expr(
            " + ".join(f"(CASE WHEN {key} > {b!r}D THEN 1 ELSE 0 END)" for b in bounds)
        )
    else:
        bexpr = F.lit(0)
    bucketed = df.withColumn(pid, bexpr)
    w_in = (
        Window.partitionBy(pid, *partition_cols)
        .orderBy(*ocols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = bucketed.withColumn(out_col, F.sum(value_col).over(w_in))
    totals = bucketed.groupBy(pid, *partition_cols).agg(
        F.sum(value_col).alias("__ptot")
    )
    w_off = (
        Window.partitionBy(*partition_cols)
        .orderBy(pid)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        pid,
        *partition_cols,
        F.coalesce(F.sum("__ptot").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        within.join(F.broadcast(offsets), [pid, *partition_cols])
        .withColumn(out_col, F.col(out_col) + F.col("__off"))
        .drop(pid, "__off")
    )


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization: events for a key belong to one session
    while consecutive gaps stay ≤ ``gap``; a larger gap opens a new
    session. Adds ``session_id`` (0-based per key, ordered by time).

    Classic lag + running-sum window pair (the frame machinery SURVEY
    §2.5 notes the reference never needed):
    ``new_session = (ts - lag(ts)) > gap`` then
    ``session_id = sum(new_session) ROWS UNBOUNDED PRECEDING``.

    Scale: ONE shuffle on ``key_cols`` serves both window passes (same
    partitioning, same ordering — Catalyst plans a single sort). State is
    nothing: this is a batch operator; the streaming twin keeps one open
    session per key (see streaming.stateful.sessionize_stream).
    """
    gap_expr = f"INTERVAL {gap}"
    order = F.col(ts_col).asc()
    w = Window.partitionBy(*key_cols).orderBy(order)
    flag = _helper_col(df, "__new_session")
    prev = _helper_col(df, "__prev_ts")
    out = (
        df.withColumn(prev, F.lag(ts_col).over(w))
        .withColumn(
            flag,
            F.when(
                F.col(prev).isNull()
                | (F.col(ts_col) > F.expr(f"{prev} + {gap_expr}")),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_id",
            F.sum(flag).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - 1,
        )
        .drop(prev, flag)
    )
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance: str | None = None,
) -> DataFrame:
    """As-of (backward) join: each left row gets the latest right row with
    ``right_ts <= left_ts`` for the same keys. Left rows before the first
    right row keep NULL values.

    The reference approximates this with hour-bucket equi-joins (J5/J6 —
    events × hourly prices); SURVEY §2.3 flags a real as-of join as the
    missing primitive. DuckDB's native ``ASOF JOIN`` is the oracle.

    Scale: implemented as union-tag + ``last_value(ignoreNulls)`` over a
    (keys)-partitioned window ordered by (ts, side) — ONE shuffle on the
    keys, never a range-expanded join (a naive ``ON r.ts <= l.ts`` theta
    join explodes to O(|L|·|R|) per key; this stays O(|L|+|R|) with a
    per-partition sort). Right rows sort BEFORE left rows at equal ts, so
    an exactly-simultaneous right row is visible (inclusive semantics,
    matching ASOF JOIN's <=).

    Determinism: pre-aggregate the right side to ONE row per (keys, ts) —
    with duplicates the winner among equal timestamps is unspecified (in
    any engine's as-of join).

    ``tolerance`` (e.g. ``"6 hours"``) bounds staleness — the
    TimescaleDB/QuestDB ``ASOF ... TOLERANCE`` form: a match older than
    ``left_ts − tolerance`` is treated as NO match (values null), which
    is what telemetry joins want when a sensor went silent. Implemented
    by carrying the matched right timestamp through the same window fill
    — no extra shuffle.
    """
    side = _helper_col(left, "__side")
    ts = _helper_col(left, "__ts")
    value_cols = list(value_cols)
    rts_carry = None
    if tolerance is not None:
        rts_carry = _helper_col(left, "__asof_rts")
        right = right.withColumn(rts_carry, F.col(right_ts))
        value_cols = value_cols + [rts_carry]
    lcols = [c for c in left.columns]
    tagged_left = left.select(
        *lcols,
        *[F.lit(None).cast(dict(right.dtypes)[v]).alias(v) for v in value_cols],
        F.lit(1).alias(side),
        F.col(left_ts).alias(ts),
    )
    tagged_right = right.select(
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes if c not in keys],
        *[F.col(k) for k in keys],
        *[F.col(v) for v in value_cols],
        F.lit(0).alias(side),
        F.col(right_ts).alias(ts),
    ).select(*lcols, *value_cols, side, ts)
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts).asc(), F.col(side).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        side,
        *[
            F.last(F.col(v), ignorenulls=True).over(w).alias(f"__asof_{v}")
            for v in value_cols
        ],
    )
    out = filled.filter(F.col(side) == 1).drop(side)
    for v in value_cols:
        out = out.withColumn(v, F.col(f"__asof_{v}")).drop(f"__asof_{v}")
    if rts_carry is not None:
        within = F.col(rts_carry) >= (
            F.col(left_ts) - F.expr(f"INTERVAL {tolerance}")
        )
        for v in value_cols:
            if v != rts_carry:
                out = out.withColumn(v, F.when(within, F.col(v)))
        out = out.drop(rts_carry)
    return out


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str],
    aggs: Mapping[str, Column],
    window_alias: str = "window",
) -> DataFrame:
    """Tumbling event-time window aggregate (A7/T2), batch or streaming.

    Reference: per (pool_id, 1-minute window) sensor rollup
    ``spark-apps/07_kafka_smartpool_sensors.py:104-131``. The same plan
    serves batch backfill and the streaming path (streaming adds
    ``withWatermark`` upstream — see streaming.sensor_pipeline).

    Output flattens the window struct to ``window_start``/``window_end``
    (reference flattens the same way, :121-122).
    """
    agg_cols = [expr.alias(name) for name, expr in aggs.items()]
    grouped = df.groupBy(F.window(F.col(ts_col), duration).alias(window_alias), *keys)
    out = grouped.agg(*agg_cols)
    return out.select(
        F.col(f"{window_alias}.start").alias("window_start"),
        F.col(f"{window_alias}.end").alias("window_end"),
        *keys,
        *[F.col(name) for name in aggs],
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str],
    aggs: Mapping[str, Column],
    window_alias: str = "window",
) -> DataFrame:
    """Sliding (hopping) event-time window aggregate, batch or streaming —
    the overlap upgrade of ``tumbling_agg``: each row lands in
    duration/slide windows (e.g. 2h windows hopping hourly → 2), giving
    smoothed rolling metrics at window granularity. The reference's
    dashboards recompute 1-minute tumbles; the hopping form is the
    standard "last 2 hours, refreshed hourly" view.

    Scale: the groupBy expands each row to duration/slide (window, key)
    rows BEFORE the shuffle, so cost scales with that small constant;
    streaming state is one row per OPEN (window × key), and under append
    mode each window still emits exactly once when the watermark passes
    its end (same contract as the tumbling form).
    """
    agg_cols = [expr.alias(name) for name, expr in aggs.items()]
    grouped = df.groupBy(
        F.window(F.col(ts_col), duration, slide).alias(window_alias), *keys
    )
    out = grouped.agg(*agg_cols)
    return out.select(
        F.col(f"{window_alias}.start").alias("window_start"),
        F.col(f"{window_alias}.end").alias("window_end"),
        *keys,
        *[F.col(name) for name in aggs],
    )


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    keys: Sequence[str] = (),
    bucket: str = "1 day",
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval range join via time bucketization — the classic
    rewrite that turns a pure theta join (``p.ts >= i.start AND p.ts <
    i.end``) into an equi-join Spark can hash-partition.

    The reference never needs this (its price joins are hour-bucket
    equi-joins by construction, SURVEY §2.3); this is the general form a
    telemetry engine wants for maintenance windows, promo periods, and
    incident overlays where intervals have arbitrary bounds.

    Mechanics: pick a bucket width ``W``. Each POINT lands in exactly one
    bucket (``floor(ts / W)``); each INTERVAL is exploded to every bucket
    it covers (``sequence(floor(start/W), floor((end - 1µs)/W))`` —
    half-open ``[start, end)`` semantics, so an interval never claims the
    bucket that starts exactly at its end). The join is then an equi-join
    on ``(keys..., bucket)`` with the exact range predicate kept as a
    residual filter. Because a point has exactly ONE bucket, every
    matching (point, interval) pair appears exactly once — no dedup pass.

    Scale: cost is |points| + Σ ceil(len_i/W) interval replicas through
    ONE hash shuffle — never the |P|·|I| blow-up of the naive theta join
    (which Spark can only run as BroadcastNestedLoop or a range-expanded
    sort-merge). Choose ``W`` near the median interval length: too small
    explodes long intervals (replicas = len/W), too large degrades the
    residual filter's selectivity (more non-matching candidates per
    bucket). Long-tail intervals are bounded: replicas grow linearly with
    interval length, not with |points|. With ``how="left_point"`` the
    equi-join runs as a left join and unmatched points survive with null
    interval columns exactly once (the null-bucket replica can't match).

    Intervals with ``end <= start`` are dropped up front: they match no
    point under the half-open ``[start, end)`` contract, and a long
    REVERSED interval would otherwise make ``F.sequence`` generate a
    descending replica explosion (stop < start defaults to step -1)
    that the residual filter only cleans up after the join pays for it.

    The bucket width is parsed driver-side (``_interval_micros``) into a
    fixed microsecond literal — independent of the session timezone, so
    a non-UTC ``spark.sql.session.timeZone`` cannot skew bucket
    boundaries the way an epoch-literal-plus-interval expression would
    (the epoch literal parses in session time).
    """
    width = F.lit(_interval_micros(bucket))
    p_us = F.unix_micros(F.col(point_ts).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_ts).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_ts).cast("timestamp"))

    bcol = _helper_col(points, "__bucket")
    pts = points.withColumn(bcol, F.floor(p_us / width))
    ivs = intervals.where(
        F.col(end_ts).cast("timestamp") > F.col(start_ts).cast("timestamp")
    ).withColumn(
        bcol,
        F.explode(F.sequence(F.floor(s_us / width), F.floor((e_us - 1) / width))),
    )
    cond = [pts[bcol] == ivs[bcol]] + [pts[k] == ivs[k] for k in keys]
    residual = (F.col(point_ts).cast("timestamp") >= F.col(start_ts).cast("timestamp")) & (
        F.col(point_ts).cast("timestamp") < F.col(end_ts).cast("timestamp")
    )
    def _strip(joined: DataFrame) -> DataFrame:
        # the interval-side key/bucket copies are equal to the point side's
        out = joined.drop(pts[bcol]).drop(ivs[bcol])
        for k in keys:
            out = out.drop(ivs[k])
        return out

    if how == "inner":
        return _strip(pts.join(ivs, cond, "inner").where(residual))
    if how == "left_point":
        icols = [c for c in intervals.columns if c not in keys]
        matched = _strip(pts.join(ivs, cond, "inner").where(residual))
        # unmatched points: anti-join on the same equi+residual condition
        unmatched = pts.join(
            ivs, cond + [residual], "left_anti"
        ).drop(bcol)
        for c in icols:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(dict(intervals.dtypes)[c])
            )
        return matched.unionByName(unmatched)
    raise ValueError(f"unsupported how={how!r}")


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    keys: Sequence[str] = (),
) -> DataFrame:
    """2-D Pareto frontier (skyline) per key group, maximizing both
    ``x`` and ``y``: keep the rows for which no other row in the group
    has x' >= x AND y' >= y with at least one strict inequality.
    Duplicate (x, y) points do not dominate each other — all copies
    survive together.

    The multi-objective "best tradeoffs" primitive (price vs recency,
    quality vs length, cost vs throughput) that top-N ranking collapses
    incorrectly to one axis.

    Scale: never the quadratic NOT EXISTS self-join. 2-D dominance is
    monotone, so one pass over the DISTINCT x values suffices: (1) a
    hash agg to one row per (keys, x) carrying max(y); (2) a running
    strictly-preceding max of that y over x DESC — a window over the
    distinct-x frame, which is skyline-scale, not fact-scale; (3) one
    equi-join back on (keys, x). A row is dominated iff a strictly
    higher x reaches its y (hi_y >= y) or an equal-x row strictly
    beats it (eq_max_y > y). Two key shuffles + one join; the window
    frame is O(distinct x per group) — if a single group's distinct-x
    set can't fit one task, pre-thin it with the same (keys, coarse
    x-bucket) max(y) agg first (monotonicity makes that exact).
    """
    gx = _helper_col(df, "__eq_max_y")
    hi = _helper_col(df, "__hi_y")
    per_x = df.groupBy(*keys, x).agg(F.max(F.col(y)).alias(gx))
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(x).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_x = per_x.withColumn(hi, F.max(F.col(gx)).over(w))
    # no broadcast hint: per_x is O(distinct x) — near fact-sized when x
    # is high-cardinality; AQE picks broadcast itself when it shrinks
    joined = df.join(per_x, [*keys, x])
    return joined.filter(
        ~(
            F.coalesce(F.col(hi) >= F.col(y), F.lit(False))
            | (F.col(gx) > F.col(y))
        )
    ).drop(gx, hi)


def skyline_2d_banded(
    df: DataFrame,
    x: str,
    y: str,
    band_width: float = 1.0,
) -> DataFrame:
    """Global 2-D Pareto frontier MINIMIZING ``x`` and MAXIMIZING ``y``,
    with the distinct-x prefix-max parallelized over x-bands — the
    "pre-thinned" realization :func:`skyline_2d`'s docstring prescribes
    for when one group's distinct-x frame outgrows a single task.

    Semantics match skyline_2d (flipped on x): keep rows for which no
    other row has x' <= x AND y' >= y with one strict inequality;
    duplicate (x, y) points survive together.

    Three bounded frames instead of one unbounded one: (1) hash agg to
    (distinct x -> max y); (2) an IN-BAND exclusive running max
    windowed BY ``floor(x / band_width)`` — every band computes in
    parallel, frame size = distinct x per band; (3) cross-band offsets
    from a #bands-row table whose global window is driver-scale by
    construction. A row is on the frontier iff its y equals its x's
    max AND strictly exceeds every strictly-cheaper x's max (the
    null-safe ``greatest`` of the two prefixes — Spark's greatest
    ignores nulls, so the first band/first x needs no sentinel).
    Choose ``band_width`` so #bands stays driver-scale while each band
    holds many distinct x (both frames bounded); exactness never
    depends on the choice.
    """
    bw = float(band_width)
    m = _helper_col(df, "__sky_max_y")
    bandc = _helper_col(df, "__sky_band")
    pre_in = _helper_col(df, "__sky_pre_in")
    pre_band = _helper_col(df, "__sky_pre_band")
    ps = (
        df.groupBy(x)
        .agg(F.max(F.col(y)).alias(m))
        .withColumn(bandc, F.floor(F.col(x) / F.lit(bw)).cast("bigint"))
    )
    bandt = ps.groupBy(bandc).agg(F.max(F.col(m)).alias(pre_band))
    wb = Window.orderBy(bandc).rowsBetween(Window.unboundedPreceding, -1)
    band_prefix = bandt.select(
        bandc, F.max(F.col(pre_band)).over(wb).alias(pre_band)
    )
    wi = (
        Window.partitionBy(bandc)
        .orderBy(x)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        ps.withColumn(pre_in, F.max(F.col(m)).over(wi))
        .join(F.broadcast(band_prefix), bandc)
        .withColumn(pre_band, F.greatest(pre_in, pre_band))
        .where(
            F.col(pre_band).isNull() | (F.col(m) > F.col(pre_band))
        )
        .select(x, m)
    )
    # frontier is skyline-sized (tiny); the equi-join back onto the fact
    # broadcasts it
    return (
        df.join(
            F.broadcast(frontier),
            (df[x] == frontier[x]) & (df[y] == frontier[m]),
        )
        .drop(frontier[x])
        .drop(m)
    )
