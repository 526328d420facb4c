"""Point-in-time (as-of) join — the engine's namesake operator (J1).

Semantics: for every query row ``(keys, q_ts)``, attach the state row
``(keys, s_ts <= q_ts)`` with the largest ``s_ts`` — "state visible at or
before me, never ahead".  Zero temporal leakage by construction: the
reduction only ever looks backward in the sort order.  This is the
relational recast of the reference's one-sided directional scan (Sx looks
only at cells strictly behind the target along the azimuth; reference
topo.py:845, 919-923 — the mask stops lines *before* the center).

Two physical strategies:

* :func:`asof_join` — union trick: tag both sides, sort by
  ``(keys, ts, side)``, propagate the last state struct with
  ``last(..., ignorenulls=True)`` over an unbounded-preceding frame.
  ONE shuffle of (queries+state), one sort — the same cost as a
  sort-merge join, with no range-explosion.  Partition key = join keys.
* :func:`asof_join_bucketed` — the 100-TB form.  Partition key =
  ``(keys, time_bucket)``: a hot entity's timeline is split across
  buckets, so a single entity with 10^9 rows no longer pins one task.
  Per-bucket carry-in state is computed on the tiny per-bucket-last
  table (|entities|×|buckets| rows) and re-injected as synthetic rows —
  two light shuffles of the small table + one of the data.

Both produce identical results (property-tested, and checked against
DuckDB ``ASOF JOIN`` by the driver's correctness gate).

Considered and rejected: a ``cogroup().applyInPandas(pd.merge_asof)``
strategy — measured 3.7x slower than the union trick at 8M state rows
(the whole state side crosses the JVM->Arrow->Python boundary, and the
cogroup still shuffles both sides), so the JVM-side union sort-merge
wins on every axis.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from topo_descriptors_spark.functions.cols import axis_seconds


# "matched_ts" is reserved too: it is the join's OUTPUT column, and a
# query side already carrying it would make _unpack emit two columns of
# that name (Spark allows duplicate names in select) — fail fast instead.
_RESERVED = (
    "_ts", "_side", "_state", "_match", "_bucket", "_carry", "matched_ts",
    "_back", "_fwd",  # direction="nearest" intermediates
)


def _check_names(queries_df: DataFrame, value_cols: list[str]) -> None:
    clash = set(queries_df.columns) & set(value_cols)
    if clash:
        raise ValueError(
            f"query columns {sorted(clash)} collide with state value columns; "
            "rename one side before the as-of join"
        )
    reserved = set(queries_df.columns) & set(_RESERVED)
    if reserved:
        raise ValueError(f"query columns use reserved names {sorted(reserved)}")


def _prep_sides(
    queries_df: DataFrame,
    state_df: DataFrame,
    on: list[str],
    q_ts: str,
    s_ts: str,
    value_cols: list[str],
):
    q = queries_df.withColumn("_ts", F.col(q_ts)).withColumn("_side", F.lit(1))
    s = state_df.select(
        *on,
        F.col(s_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in value_cols],
    )
    # Pack the state payload into one struct so that a state row whose
    # value column is NULL still "wins" as the most recent match (the
    # struct itself is non-null); last(ignorenulls) then reproduces exact
    # ASOF-join semantics instead of skipping to an older non-null value.
    s = s.withColumn(
        "_state", F.struct(F.col("_ts").alias("matched_ts"), *value_cols)
    ).drop(*value_cols)
    return q.unionByName(s, allowMissingColumns=True)


def _unpack(
    merged: DataFrame,
    queries_df: DataFrame,
    value_cols: list[str],
    q_ts: str,
    tolerance_seconds: float | None,
    direction: str = "backward",
) -> DataFrame:
    out = merged.where(F.col("_side") == 1)
    keep = [F.col(c) for c in queries_df.columns]
    keep.append(F.col("_match.matched_ts").alias("matched_ts"))
    keep.extend(F.col(f"_match.{c}").alias(c) for c in value_cols)
    out = out.select(*keep)
    if tolerance_seconds is not None:
        age = axis_seconds(out, q_ts) - axis_seconds(out, "matched_ts")
        if direction == "forward":
            age = -age
        elif direction == "nearest":
            age = F.abs(age)
        ok = age <= F.lit(float(tolerance_seconds))
        out = out.select(
            *[F.col(c) for c in queries_df.columns],
            F.when(ok, F.col("matched_ts")).alias("matched_ts"),
            *[F.when(ok, F.col(c)).alias(c) for c in value_cols],
        )
    return out


def asof_join(
    queries_df: DataFrame,
    state_df: DataFrame,
    on: list[str] | str,
    q_ts: str = "q_ts",
    s_ts: str = "ts",
    value_cols: list[str] | None = None,
    strict: bool = False,
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join (union + last/first-ignorenulls sort-merge) in three
    directions — the full ``pandas.merge_asof`` surface, JVM-side:

    * ``direction="backward"`` (default): latest state with
      ``s_ts <= q_ts`` (``<`` when ``strict``) — zero temporal leakage,
      the training-feature form.
    * ``direction="forward"``: earliest state with ``s_ts >= q_ts``
      (``>`` when ``strict``) — label/outcome attachment ("next purchase
      after this click"), where looking ahead is the point.
    * ``direction="nearest"``: whichever of the two is closer in time;
      exact ties prefer the backward match (documented, deterministic).
      ``strict`` excludes the equal-timestamp match from both sides
      (ties between a strictly-earlier and strictly-later row at the
      same absolute gap still prefer backward).

    The tie rule at equal timestamps is enforced by the secondary sort
    key: the state row sorts on the visible side of the query row iff
    the join is inclusive.  ``tolerance_seconds`` bounds the match age
    (backward), lead (forward), or absolute gap (nearest).  If the state
    side can hold several rows per (keys, ts), deduplicate it first (the
    frame-edge one would win nondeterministically).

    Physics is direction-independent: ONE shuffle of (queries+state) on
    the join keys, one sort; nearest adds a second window function over
    the SAME sort order (single Window exchange/sort, two frames), not a
    second shuffle.  Sole exception: ``nearest + strict`` needs opposite
    equal-ts secondary sorts for its two frames — one exchange, two
    sorts (see inline comment).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    on = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in state_df.columns if c not in set(on) | {s_ts}]
    _check_names(queries_df, value_cols)

    merged = _prep_sides(queries_df, state_df, on, q_ts, s_ts, value_cols)
    # backward-inclusive: state (0) sorts before query (1) at equal ts so
    # the preceding frame sees it; forward-inclusive mirrors (query first,
    # state inside the following frame); strict flips each.
    back_side = F.col("_side").asc() if not strict else F.col("_side").desc()
    fwd_side = F.col("_side").desc() if not strict else F.col("_side").asc()

    def back_match(m: DataFrame, out: str) -> DataFrame:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts").asc(), back_side)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return m.withColumn(out, F.last(F.col("_state"), ignorenulls=True).over(w))

    def fwd_match(m: DataFrame, out: str, side_order=None) -> DataFrame:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts").asc(), side_order if side_order is not None else fwd_side)
            .rowsBetween(0, Window.unboundedFollowing)
        )
        return m.withColumn(out, F.first(F.col("_state"), ignorenulls=True).over(w))

    if direction == "backward":
        merged = back_match(merged, "_match")
    elif direction == "forward":
        merged = fwd_match(merged, "_match")
    else:  # nearest
        if not strict:
            # BOTH frames use the backward sort (ts, state-first) so
            # Spark plans ONE exchange + ONE sort with two frames.  The
            # forward frame then misses a state row at exactly q_ts (it
            # sorts before the query row) — harmless: the backward frame
            # holds that row with gap 0, and ties prefer backward, so
            # the nearest result is identical to the two-sort
            # formulation.
            merged = fwd_match(
                back_match(merged, "_back"), "_fwd", side_order=back_side
            )
        else:
            # strict excludes the equal-timestamp match from BOTH
            # sides, and the two exclusions need OPPOSITE secondary
            # sorts (backward-strict: query before equal-ts state, so
            # the preceding frame skips it; forward-strict: state
            # before query, so the following frame skips it).  One sort
            # order cannot express both, so this is the one as-of shape
            # that plans ONE exchange + TWO sorts (still a single
            # shuffle: both windows share the partitioning).
            # back_side/fwd_side are already strict-flipped above.
            merged = fwd_match(back_match(merged, "_back"), "_fwd")
        gap_b = axis_seconds(merged, "_ts") - axis_seconds(merged, "_back.matched_ts")
        gap_f = axis_seconds(merged, "_fwd.matched_ts") - axis_seconds(merged, "_ts")
        merged = merged.withColumn(
            "_match",
            F.when(F.col("_back").isNull(), F.col("_fwd"))
            .when(F.col("_fwd").isNull(), F.col("_back"))
            .when(gap_f < gap_b, F.col("_fwd"))
            .otherwise(F.col("_back")),  # tie → backward
        ).drop("_back", "_fwd")
    return _unpack(
        merged, queries_df, value_cols, q_ts, tolerance_seconds, direction
    )


def asof_join_bucketed(
    queries_df: DataFrame,
    state_df: DataFrame,
    on: list[str] | str,
    q_ts: str = "q_ts",
    s_ts: str = "ts",
    value_cols: list[str] | None = None,
    bucket_seconds: float = 86400.0,
    strict: bool = False,
) -> DataFrame:
    """Skew-proof as-of join partitioned by ``(keys, time_bucket)``.

    Plan:
      1. bucket both sides on ``floor(unix_ts / bucket_seconds)``;
      2. reduce the state side to its last row per (keys, bucket) —
         a map-side-combinable ``max(struct(ts, payload))`` aggregate;
      3. forward-fill those per-bucket lasts across the union of state
         and query buckets (window over the *small* table) and shift by
         one bucket → carry-in state at each bucket's start;
      4. union carry-in rows (+ in-bucket state + queries) and run the
         same last-ignorenulls reduction, now partitioned by
         (keys, bucket) — bounded partition sizes regardless of entity
         skew, no giant single-entity sort.
    """
    on = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in state_df.columns if c not in set(on) | {s_ts}]
    _check_names(queries_df, value_cols)

    q = (
        queries_df.withColumn("_ts", F.col(q_ts))
        .withColumn(
            "_bucket",
            F.floor(axis_seconds(queries_df, q_ts) / F.lit(float(bucket_seconds))),
        )
        .withColumn("_side", F.lit(2))
    )
    s_base = state_df.select(
        *on, F.col(s_ts).alias("_ts"), *[F.col(c) for c in value_cols]
    )
    s = (
        s_base.withColumn(
            "_bucket",
            F.floor(axis_seconds(s_base, "_ts") / F.lit(float(bucket_seconds))),
        )
        .withColumn("_side", F.lit(1))
        .withColumn(
            "_state", F.struct(F.col("_ts").alias("matched_ts"), *value_cols)
        )
        .drop(*value_cols)
    )

    # (2) last state per (keys, bucket): max over the ts-led struct is the
    # row with the largest ts — partial-aggregated map-side, tiny output.
    bucket_last = s.groupBy(*on, "_bucket").agg(F.max("_state").alias("_state"))

    # (3) carry-in over the bucket domain of BOTH sides.
    domain = (
        bucket_last.select(*on, "_bucket")
        .unionByName(q.select(*on, "_bucket"))
        .distinct()
    )
    w_carry = (
        Window.partitionBy(*on)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        domain.join(bucket_last, on + ["_bucket"], "left")
        .withColumn("_carry", F.last("_state", ignorenulls=True).over(w_carry))
        .where(F.col("_carry").isNotNull())
        .select(
            *on,
            F.col("_bucket"),
            F.col("_carry").alias("_state"),
            F.lit(0).alias("_side"),
            F.lit(None).cast(q.schema["_ts"].dataType).alias("_ts"),
        )
    )

    # (4) in-bucket reduction.  Sort: carry-in first (_ts NULL → side 0
    # with nulls-first ts), then by ts; at equal ts state-vs-query order
    # encodes the inclusive/strict tie rule.
    merged = q.unionByName(s, allowMissingColumns=True).unionByName(
        carry, allowMissingColumns=True
    )
    if strict:
        tie = F.when(F.col("_side") == 0, 0).when(F.col("_side") == 2, 1).otherwise(2)
    else:
        tie = F.col("_side")
    w = (
        Window.partitionBy(*on, "_bucket")
        .orderBy(F.col("_ts").asc_nulls_first(), tie.asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = merged.withColumn(
        "_match", F.last("_state", ignorenulls=True).over(w)
    )
    out = merged.where(F.col("_side") == 2)
    keep = [F.col(c) for c in queries_df.columns]
    keep.append(F.col("_match.matched_ts").alias("matched_ts"))
    keep.extend(F.col(f"_match.{c}").alias(c) for c in value_cols)
    return out.select(*keep)


def asof_with_frame_features(
    seq_df: DataFrame,
    queries_df: DataFrame,
    on: list[str] | str,
    pos: str = "pos",
    q_pos: str = "q_pos",
    value: str = "value",
    scales_pxl: list[int] = (9,),
) -> DataFrame:
    """Fused single-shuffle plan: frame features (TPI + rolling std per
    scale) AND the point-in-time match computed in ONE window pass.

    Trick: query rows are interleaved into the sequence with NULL values
    and a composite order key ``2*pos + side``.  RANGE frames over the
    composite key span exactly the positions ``[p-k, p+k]`` and ignore
    the null-valued query rows (SQL aggregates skip nulls), so state
    rows get bit-identical features to the two-pass plan; the as-of
    match is the usual last-state struct over an unbounded row frame.

    Each INPUT is exchanged exactly once — the computed feature table is
    never re-shuffled (the two-pass plan shuffles the sequence for the
    feature window and then moves the full feature output again for the
    as-of sort).  At cluster scale this halves the bytes on the wire of
    the dominant table.  Locally it is
    roughly cost-neutral (sliding RANGE frames evaluate slower than ROW
    frames), so the default pipelines keep the two-pass form; use this
    when the shuffle, not the CPU, is the bottleneck.  Only
    frame-aggregate features fuse — lag/lead-based features (Gaussian
    bank, Sx) would see the interleaved query rows and break.

    Requires integer positions (the composite key doubles them).
    Equivalence with the two-pass plan is pinned in tests/test_asof.py.
    """
    on = [on] if isinstance(on, str) else list(on)
    s0 = seq_df.select(
        *on, F.col(pos).alias("_p"), F.col(value).alias("_v"), F.lit(0).alias("_sd")
    )
    q0 = queries_df.select(
        *on,
        F.col(q_pos).alias("_p"),
        F.lit(None).cast("double").alias("_v"),
        F.lit(1).alias("_sd"),
    )
    u = s0.unionByName(q0).withColumn("_c", F.col("_p") * 2 + F.col("_sd"))
    order = Window.partitionBy(*on).orderBy("_c")
    feat_cols = []
    names = []
    for d in scales_pxl:
        k = int(d) // 2
        wr = order.rangeBetween(-2 * k, 2 * k)
        tpi = F.col("_v") - F.try_divide(
            F.sum("_v").over(wr) - F.col("_v"),
            F.count("_v").over(wr) - 1,  # lone-sample frame -> NULL, not ANSI error
        )
        feat_cols += [tpi.alias(f"tpi_{d}"), F.stddev_samp("_v").over(wr).alias(f"std_{d}")]
        names += [f"tpi_{d}", f"std_{d}"]
    u = u.select("*", *feat_cols)
    wl = order.rowsBetween(Window.unboundedPreceding, 0)
    state = F.when(
        F.col("_sd") == 0,
        F.struct(F.col("_p").alias("matched_ts"), *[F.col(n) for n in names]),
    )
    u = u.withColumn("_m", F.last(state, ignorenulls=True).over(wl))
    keep = [F.col(c) for c in on]
    keep.append(F.col("_p").alias(q_pos))
    keep.append(F.col("_m.matched_ts").alias("matched_ts"))
    keep.extend(F.col(f"_m.{n}").alias(n) for n in names)
    return u.where(F.col("_sd") == 1).select(*keep)


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_seconds: float = 86400.0,
    how: str = "inner",
    max_buckets_per_interval: int | None = 1000,
) -> DataFrame:
    """Interval-containment join (J2 as a first-class operator): attach
    to every event row the interval row of the same ``on`` key with
    ``start <= ts <= end`` — event-in-session attribution, validity-
    window lookups, slowly-changing-dimension reads.

    Physical strategy — bucketed equi-join, never a range cross-product:
    both sides map onto a time-bucket grid (width ``bucket_seconds``);
    each interval is replicated into every bucket it overlaps
    (``floor(start/W) .. floor(end/W)`` — bounded by interval length /
    W + 1), events land in exactly one bucket, and the join is a plain
    equi-join on ``(on, _ibucket)`` followed by the exact BETWEEN
    filter.  Catalyst/AQE handle it like any hash join; pick
    ``bucket_seconds`` near the median interval length so replication
    stays O(1) per interval.  Timestamps and numeric axes both work
    (NTZ-safe via axis_seconds).

    ``how="inner"`` drops unmatched events; ``"left"`` keeps them with
    NULL interval columns (one row per matching interval either way —
    overlapping intervals produce multiple rows by SQL semantics).

    **Replication guard.**  One open-ended interval (an ``end`` set to a
    year-9999 sentinel, a corrupt row) would silently explode into
    ~10⁸ bucket replicas and dominate the job.  Any interval spanning
    more than ``max_buckets_per_interval`` buckets RAISES at execution
    time (the engine's guard-and-raise convention — cosine exact,
    LSH/ANN caps, CC budgets); widen ``bucket_seconds``, pre-clamp
    sentinel end dates to the data's horizon, or pass ``None`` to
    disable.  Interval-side column names (other than ``on``) must not
    collide with event columns — the join would otherwise return an
    ambiguous duplicate-named schema, so collisions raise up front.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join: unsupported how={how!r}")
    for c in ("_ebucket", "_ibucket", "_ets", "_is", "_ie"):
        if c in events.columns or c in intervals.columns:
            raise ValueError(f"interval_join: reserved column name {c!r} in input")
    clash = (set(events.columns) & set(intervals.columns)) - {on}
    if clash:
        raise ValueError(
            "interval_join: interval columns collide with event columns "
            f"{sorted(clash)} — rename or drop them on one side (the output "
            "keeps all event columns plus all non-key interval columns)"
        )
    W = float(bucket_seconds)
    e = events.withColumn("_ets", axis_seconds(events, ts)).withColumn(
        "_ebucket", F.floor(F.col("_ets") / W).cast("long")
    )
    b0 = F.floor(F.col("_is") / W).cast("long")
    b1 = F.floor(F.col("_ie") / W).cast("long")
    seq = F.sequence(b0, b1)
    if max_buckets_per_interval is not None:
        lim = int(max_buckets_per_interval)
        seq = F.when(b1 - b0 < F.lit(lim), seq).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "interval_join: an interval spans more than "
                        f"max_buckets_per_interval={lim} buckets ("
                    ),
                    (b1 - b0 + 1).cast("string"),
                    F.lit(
                        f") at bucket_seconds={W:g} — open-ended/sentinel "
                        "end date? clamp it, widen bucket_seconds, or pass "
                        "max_buckets_per_interval=None"
                    ),
                )
            ).cast("array<long>")
        )
    i = (
        intervals.withColumn("_is", axis_seconds(intervals, start))
        .withColumn("_ie", axis_seconds(intervals, end))
        .withColumn("_ibucket", F.explode(seq))
    )
    cond = (
        (e[on] == i[on])
        & (e["_ebucket"] == i["_ibucket"])
        & (e["_ets"] >= i["_is"])
        & (e["_ets"] <= i["_ie"])
    )
    joined = e.join(i, cond, how)
    ival_cols = [c for c in intervals.columns if c != on]
    return joined.select(
        *[e[c] for c in events.columns],
        *[i[c] for c in ival_cols],
    )
