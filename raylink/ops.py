"""Generic relational operators, Ray-Data-first.

One function per operator family from SURVEY §2 (filters/projections §2.3-4,
grouped aggregation §2.8, sort/top-k/dedup §2.9, joins/lookups §2.7,
ordered/window ops §2.10). These back both the graph pipelines and the
driver harness ``__ray_entry__.queries()`` (each has a DuckDB oracle).

Conventions:
- hot paths are vectorized over Arrow/pandas batches; no per-row Python in
  ``map_batches`` bodies except where the unit of work is a document;
- small sides are broadcast via ``ray.put`` + per-batch lookup (no shuffle);
- float aggregate columns are rounded explicitly where results feed the
  hash-comparing oracle harness (summation-order tolerance).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


# ---------------------------------------------------------------------------
# projection / rounding helpers
# ---------------------------------------------------------------------------

def round_columns(ds: rd.Dataset, decimals: dict[str, int]) -> rd.Dataset:
    def f(batch: pa.Table) -> pa.Table:
        for col, dec in decimals.items():
            arr = pc.round(pc.cast(batch[col], pa.float64()), ndigits=dec)
            batch = batch.set_column(batch.schema.get_field_index(col), col, arr)
        return batch

    return ds.map_batches(f, batch_format="pyarrow")


def scale_columns(ds: rd.Dataset, scales: dict[str, float]) -> rd.Dataset:
    """Fixed-point conversion: col -> int64 floor(col*scale + 0.5).

    Used on float aggregate outputs compared against a SQL oracle: decimal
    ``round()`` produces engine-dependent nearest-doubles, while this exact
    IEEE multiply/add/floor sequence is bit-reproducible across engines
    (SQL twin: ``CAST(floor(x*S + 0.5) AS BIGINT)``)."""

    def f(batch: pa.Table) -> pa.Table:
        for col, s in scales.items():
            arr = pc.cast(
                pc.floor(pc.add(pc.multiply(pc.cast(batch[col], pa.float64()),
                                            pa.scalar(float(s))),
                                pa.scalar(0.5))),
                pa.int64(),
            )
            batch = batch.set_column(batch.schema.get_field_index(col), col, arr)
        return batch

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# top-k (sort + limit; SURVEY §2.9 global top-10 discords analog)
# ---------------------------------------------------------------------------

def top_k(ds: rd.Dataset, keys: Sequence[tuple[str, bool]], k: int) -> rd.Dataset:
    """keys = [(col, descending), ...]; deterministic with a full tiebreak."""
    return ds.sort(key=[c for c, _ in keys], descending=[d for _, d in keys]).limit(k)


# ---------------------------------------------------------------------------
# exact dedup / keep-first (overlap-peak reconciliation analog, §2.9)
# ---------------------------------------------------------------------------

def keep_first(ds: rd.Dataset, group_keys: list[str], order_keys: list[str]) -> rd.Dataset:
    """Hash-partition by group key, keep the first row per group under
    ``order_keys`` (deterministic richest/earliest-row dedup). Arrow-native
    (round 5): ``pc.sort_indices`` is a stable sort, so tie rows resolve by
    in-group order exactly like the previous pandas mergesort."""

    def first(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(c, "ascending") for c in order_keys])
        return g.take(idx.slice(0, 1))

    return ds.groupby(group_keys).map_groups(first, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# ordered window / lag op (§2.10 ordered pairwise comparison analog)
# ---------------------------------------------------------------------------

def lag_delta_us(events: rd.Dataset, part_col: str, ts_col: str,
                 order_cols: list[str], out_col: str) -> rd.Dataset:
    """Per-partition lag: microseconds since the previous event of the same
    ``part_col`` (ordering: ``order_cols``). First event per key -> null.

    The delta is computed in the integer-microsecond domain (no
    ``total_seconds()`` float round-trip) with a plain ``int64`` output
    column: pandas nullable ``Int64`` extension blocks canonicalize
    differently from SQL ``BIGINT NULL`` in downstream hash compares.
    Arrow-native end to end (round 5): stable ``pc.sort_indices`` replaces
    the pandas mergesort and the from_pandas round-trip disappears."""

    def f(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(c, "ascending") for c in order_cols])
        g = g.take(idx)
        t = (g.column(ts_col).combine_chunks()
             .cast(pa.timestamp("us"))
             .to_numpy(zero_copy_only=False).astype(np.int64))
        delta = np.zeros(len(t), dtype=np.int64)
        mask = np.zeros(len(t), dtype=bool)
        if len(t):
            delta[1:] = t[1:] - t[:-1]
            mask[0] = True  # first event per key -> null
        return g.append_column(out_col, pa.array(delta, pa.int64(), mask=mask))

    return events.groupby(part_col).map_groups(f, batch_format="pyarrow")


def sessionize(events: rd.Dataset, part_col: str, ts_col: str,
               order_cols: list[str], gap_us: int) -> rd.Dataset:
    """Session windows per key: a new session starts when the gap since the
    previous event exceeds ``gap_us``. Emits one row per session:
    (key, session_id, n_events, session_start). Ordering is explicit
    (``order_cols``); per-key state never crosses partitions — the
    reference's ordered-scan semantics re-expressed as a keyed group op
    (SURVEY §2.10)."""

    def f(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(c, "ascending") for c in order_cols])
        g = g.take(idx)
        ts = g.column(ts_col).combine_chunks().cast(pa.timestamp("us"))
        t = ts.to_numpy(zero_copy_only=False).astype(np.int64)
        new_s = np.r_[True, (t[1:] - t[:-1]) > gap_us]
        sid = np.cumsum(new_s)  # 1-based session ids, ascending in time
        starts = np.flatnonzero(new_s)
        n_events = np.diff(np.r_[starts, len(t)])
        key = g.column(part_col).take(
            pa.array(np.zeros(len(starts), np.int64)))
        return pa.table({
            part_col: key,
            "session_id": pa.array(sid[starts], pa.int64()),
            "n_events": pa.array(n_events, pa.int64()),
            # sorted by ts first, so each session's first row is its min
            "session_start": ts.take(pa.array(starts, pa.int64())),
        })

    return events.groupby(part_col).map_groups(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# broadcast joins (§2.7: small-side lookup, no shuffle)
# ---------------------------------------------------------------------------

def broadcast_left_join(ds: rd.Dataset, small: pd.DataFrame, on: str,
                        add_cols: list[str]) -> rd.Dataset:
    """Left join against a small dimension frame shipped once via ray.put."""
    ref = ray.put(small.set_index(on)[add_cols])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        idx = ray.get(ref)
        return batch.join(idx, on=on)

    return ds.map_batches(f, batch_format="pandas")


# ---------------------------------------------------------------------------
# grouped mode with deterministic tiebreak (§2.8 "mode / most_common")
# ---------------------------------------------------------------------------

def grouped_mode(ds: rd.Dataset, group_col: str, value_col: str,
                 out_col: str) -> rd.Dataset:
    """Most frequent value per group; ties -> minimum value. Two-level:
    vectorized per-batch (group, value) pre-count, then a grouped final
    reduce — the partial+final combine pattern."""

    def precount(batch: pa.Table) -> pa.Table:
        t = batch.group_by([group_col, value_col]).aggregate([([], "count_all")])
        return t.rename_columns([group_col, value_col, "n"])

    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(value_col, sort=True)["n"].sum()
        best = agg[agg == agg.max()].index.min()
        return pd.DataFrame({group_col: [g[group_col].iloc[0]], out_col: [best]})

    pre = ds.map_batches(precount, batch_format="pyarrow")
    return pre.groupby(group_col).map_groups(reduce_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# two-pass quantile outlier filter (§2.4 EDA drop_outliers analog)
# ---------------------------------------------------------------------------

def iqr_outliers(ds: rd.Dataset, col: str, k: float = 1.5,
                 keep_cols: list[str] | None = None) -> rd.Dataset:
    """Pass 1: EXACT global quantiles via distributed histogram bisection
    (:func:`exact_quantiles` — O(bins) driver bytes per pass, no column
    gather; linear interp == percentile_cont). Pass 2: vectorized filter
    to rows OUTSIDE [q1 - k*iqr, q3 + k*iqr]. Approximate single-pass
    twin: ``sketches.approx_iqr_outliers``."""
    q1, q3 = exact_quantiles(ds, col, [0.25, 0.75])
    lo, hi = q1 - k * (q3 - q1), q3 + k * (q3 - q1)

    def f(batch: pa.Table) -> pa.Table:
        c = batch[col]
        mask = pc.or_(pc.less(c, lo), pc.greater(c, hi))
        out = batch.filter(mask)
        return out.select(keep_cols) if keep_cols else out

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# grouped distinct count (§2.8 distinct counts)
# ---------------------------------------------------------------------------

def distinct_count(ds: rd.Dataset, group_col: str, value_col: str,
                   out_col: str) -> rd.Dataset:
    """Vectorized per-batch (group, value) dedup, shuffle only the distinct
    pairs, then count per group."""

    def pairs(batch: pa.Table) -> pa.Table:
        return batch.select([group_col, value_col]).group_by(
            [group_col, value_col]).aggregate([])

    pre = ds.map_batches(pairs, batch_format="pyarrow")

    def count_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             out_col: [g[value_col].nunique()]})

    return pre.groupby(group_col).map_groups(count_group, batch_format="pandas")


# ---------------------------------------------------------------------------
# banded range join (§2.7 proximity join analog)
# ---------------------------------------------------------------------------

def count_in_window_join(
    fact: rd.Dataset, dim: rd.Dataset, fact_key: str, dim_key: str,
    fact_ts: str, dim_ts: str, window_days: int, out_col: str,
) -> rd.Dataset:
    """For each dim row: count fact rows with matching key and
    ``dim_ts <= fact_ts < dim_ts + window``. Small-dim broadcast variant:
    the dim (key -> ts) map ships once; fact side streams, emitting partial
    counts; final tiny grouped sum is joined back to ALL dim keys (zero
    counts kept)."""
    dim_rows = pa.concat_tables(
        list(dim.select_columns([dim_key, dim_ts]).iter_batches(
            batch_format="pyarrow", batch_size=1 << 20))
    )
    key_np = dim_rows[dim_key].to_numpy(zero_copy_only=False)
    ts_np = dim_rows[dim_ts].to_numpy(zero_copy_only=False)
    ref = ray.put((key_np, ts_np))
    window = np.timedelta64(window_days, "D")

    def partial(batch: pa.Table) -> pa.Table:
        keys, tss = ray.get(ref)
        order = np.argsort(keys, kind="mergesort")
        skeys, stss = keys[order], tss[order]
        fk = batch[fact_key].to_numpy(zero_copy_only=False)
        fts = batch[fact_ts].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(skeys, fk)
        ok = (pos < len(skeys)) & (skeys[np.minimum(pos, len(skeys) - 1)] == fk)
        base = stss[np.minimum(pos, len(skeys) - 1)]
        hit = ok & (fts >= base) & (fts < base + window)
        ks, cnt = np.unique(fk[hit], return_counts=True)
        return pa.table({fact_key: pa.array(ks), "partial_n": pa.array(cnt.astype(np.int64))})

    partials = fact.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    summed = partials.groupby(fact_key).aggregate(Sum("partial_n", alias_name=out_col))
    # attach counts back to ALL dim keys (zero counts kept) with a
    # co-partitioned left join — nothing dim-sized touches the driver
    joined = hash_join(dim.select_columns([dim_key]), summed, dim_key,
                       right_on=fact_key, how="left_outer",
                       num_partitions=16)

    def fill(batch: pa.Table) -> pa.Table:
        n = pc.coalesce(batch[out_col], pa.scalar(0, pa.int64()))
        return pa.table({dim_key: batch[dim_key],
                         out_col: pc.cast(n, pa.int64())})

    return joined.map_batches(fill, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# transition graph from an ordered event log (§2.10 lag as self-join)
# ---------------------------------------------------------------------------

def _te_map_task(tabs, K: int, id_col: str, actor_col: str,
                 value_col, chunk: int):
    """Exchange map for transition_edges: route each row to range bucket
    ``id // chunk`` (chunk-boundary rows mirrored to the previous bucket
    too), partition buckets by ``bkt % K``. Returns per-part pa.Tables
    (None = empty)."""
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return [None] * K
    tab = pa.concat_tables(tabs)
    eid = tab[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    b = eid // chunk
    bound = (eid % chunk == 0) & (eid > 0)
    idx = np.arange(len(eid), dtype=np.int64)
    idx_all = np.concatenate([idx, idx[bound]])
    bkt_all = np.concatenate([b, b[bound] - 1])
    part = (bkt_all % K).astype(np.int64)
    sel = [id_col, actor_col] + ([value_col] if value_col else [])
    # mirrored rows ride as DUPLICATE row indices, so this scatters
    # (row index, part) pairs rather than table rows directly (the one
    # map helper scatter_by_part can't serve)
    order = np.argsort(part, kind="stable")
    take_idx, part_s = idx_all[order], part[order]
    bounds = np.searchsorted(part_s, np.arange(K + 1))
    sub = tab.select(sel)
    return [sub.take(pa.array(take_idx[bounds[k]: bounds[k + 1]]))
            if bounds[k + 1] > bounds[k] else None for k in range(K)]


def _te_reduce_task(k: int, slices, id_col: str, actor_col: str,
                    value_col, actor_type):
    """Exchange reduce: ordered successor pairing over this partition's
    buckets. Buckets in one partition are >= (K-1) chunks apart, so no
    (i, i+1) pair spans two of them; chunk-boundary mirror rows duplicate
    an id within the partition — deduped before pairing with a
    DETERMINISTIC (id, actor) order so the pick never depends on map
    slice order (mirror copies are identical rows; genuinely duplicated
    event ids are outside the op's contract — see transition_edges).
    Self-transitions dropped with the twin's numpy semantics (null
    actors compare as ordinary values, never crash)."""
    tabs = [s for s in slices if s is not None and s.num_rows]
    if not tabs:
        cols = {"src": pa.array([], actor_type),
                "dst": pa.array([], actor_type)}
        if value_col is not None:
            cols["w"] = pa.array([], pa.float64())
        return pa.table(cols)
    tab = pa.concat_tables(tabs)
    eid = tab[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    act_all = tab[actor_col].to_numpy(zero_copy_only=False)
    # stable sort by id; a deterministic within-id order comes from the
    # actors' own argsort rather than comparing possibly-None objects
    try:
        within = np.argsort(act_all, kind="stable")
    except TypeError:  # None alongside strings: fall back to repr order
        within = np.argsort(np.array([repr(v) for v in act_all]),
                            kind="stable")
    order = within[np.argsort(eid[within], kind="stable")]
    eid_s = eid[order]
    keep = np.r_[True, eid_s[1:] != eid_s[:-1]]
    order, eid_s = order[keep], eid_s[keep]
    act = act_all[order]
    pos = np.searchsorted(eid_s, eid_s + 1)
    safe = np.minimum(pos, len(eid_s) - 1)
    ok = (pos < len(eid_s)) & (eid_s[safe] == eid_s + 1)
    src = act[ok]
    dst = act[pos[ok]]
    m = src != dst  # numpy semantics: None != "x" keeps the pair
    cols = {"src": pa.array(src[m], actor_type),
            "dst": pa.array(dst[m], actor_type)}
    if value_col is not None:
        val = tab[value_col].to_numpy(zero_copy_only=False).astype(
            np.float64)[order]
        cols["w"] = pa.array(val[pos[ok]][m], pa.float64())
    return pa.table(cols)


def transition_edges(events: rd.Dataset, *, id_col: str = "event_id",
                     actor_col: str = "user_id",
                     chunk: int = 1 << 14,
                     distinct: bool = True,
                     value_col: str | None = None) -> rd.Dataset:
    """(actor of event i) -> (actor of event i+1): the ordered self-join on
    ``id + 1``, distributed as a range-bucketed exchange — NO driver gather,
    no dense-id assumption.

    Physical plan: every event row is routed to bucket ``id // chunk``; a
    row on a chunk boundary (``id % chunk == 0``) is mirrored to the
    previous bucket too, so each (i, i+1) pair is co-located in exactly one
    group. Within a group the successor lookup is one vectorized
    ``searchsorted``. Gaps in the id space simply yield no pair (identical
    to the SQL join on ``event_id + 1``). Self-transitions dropped; result
    deduplicated (distinct edges). PRECONDITION: ``id_col`` values are
    unique (they are event identifiers); rows sharing an id get
    unspecified pairing on BOTH physical plans (the exchange picks
    deterministically by (id, actor); the Dataset twin by bucket-local
    order).

    Default physical plan (round-5 session 3): ONE `exchange.exchange`
    raw-task round (map = bucket routing + ``bkt % K`` partition, reduce
    = per-partition searchsorted pairing) instead of the Dataset
    sort-shuffle ``groupby("bkt")``; twin kept behind
    ``RAYLINK_TRANSITION_EXCHANGE=dataset``. Non-adjacent buckets share a
    partition safely (ranges are >= (K-1) chunks apart) and mirror-row id
    duplicates within a partition are deduped before pairing.

    ``value_col``: also emit a float ``w`` column per raw edge — the
    SUCCESSOR event's value (SQL ``b.<value_col>``); feed the result to
    ``build_graph(weight_col="w")`` which sums duplicates. Requires
    ``distinct=False`` (dedup would drop the weights)."""
    if value_col is not None and distinct:
        raise ValueError("value_col requires distinct=False")

    import os as _os

    if _os.environ.get("RAYLINK_TRANSITION_EXCHANGE", "") != "dataset":
        from .exchange import arrow_col_type, exchange as _exchange
        from .graph import dedup_edges as _dedup

        sel = [id_col, actor_col] + ([value_col] if value_col else [])
        ds = events.select_columns(sel).materialize()
        actor_type = arrow_col_type(ds, actor_col)
        refs = ds.to_arrow_refs()
        K = min(32, max(1, len(refs)))
        red = _exchange(refs, K, _te_map_task, _te_reduce_task,
                        map_args=(id_col, actor_col, value_col, chunk),
                        reduce_args=(id_col, actor_col, value_col,
                                     actor_type))
        paired = rd.from_arrow_refs(red)
        return _dedup(paired) if distinct else paired

    def bucketize(batch: pa.Table) -> pa.Table:
        eid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        act = batch[actor_col].to_numpy(zero_copy_only=False)
        b = eid // chunk
        bound = (eid % chunk == 0) & (eid > 0)
        cols = {
            "bkt": pa.array(np.concatenate([b, b[bound] - 1]), pa.int64()),
            id_col: pa.array(np.concatenate([eid, eid[bound]]), pa.int64()),
            actor_col: pa.array(np.concatenate([act, act[bound]])),
        }
        if value_col is not None:
            val = batch[value_col].to_numpy(zero_copy_only=False).astype(
                np.float64)
            cols[value_col] = pa.array(
                np.concatenate([val, val[bound]]), pa.float64())
        return pa.table(cols)

    def pairs(g: pa.Table) -> pa.Table:
        eid = g[id_col].to_numpy(zero_copy_only=False)
        act = g[actor_col].to_numpy(zero_copy_only=False)
        order = np.argsort(eid, kind="stable")
        eid, act = eid[order], act[order]
        pos = np.searchsorted(eid, eid + 1)
        safe = np.minimum(pos, len(eid) - 1)
        ok = (pos < len(eid)) & (eid[safe] == eid + 1)
        src, dst = act[ok], act[pos[ok]]
        m = src != dst
        cols = {"src": pa.array(src[m]), "dst": pa.array(dst[m])}
        if value_col is not None:
            val = g[value_col].to_numpy(zero_copy_only=False)[order]
            cols["w"] = pa.array(val[pos[ok]][m], pa.float64())
        return pa.table(cols)

    from .graph import dedup_edges

    sel = [id_col, actor_col] + ([value_col] if value_col else [])
    bucketed = events.select_columns(sel).map_batches(
        bucketize, batch_format="pyarrow", zero_copy_batch=True)
    paired = bucketed.groupby("bkt").map_groups(pairs, batch_format="pyarrow")
    return dedup_edges(paired) if distinct else paired


def column_moments(ds: rd.Dataset, col: str) -> tuple[int, float, float]:
    """Global (n, mean, sample std) via MERGEABLE per-batch (n, sum, sumsq)
    partials — the driver sees O(#batches) scalars, never the column.
    (Adequate when |mean| is not >> std; a shifted two-pass variant would
    cover the pathological-cancellation case.)"""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        return pa.table({"pn": pa.array([len(x)], pa.int64()),
                         "ps": pa.array([float(x.sum())], pa.float64()),
                         "pss": pa.array([float((x * x).sum())], pa.float64())})

    tabs = list(
        ds.select_columns([col]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=1 << 20))
    if not tabs:
        return 0, float("nan"), float("nan")
    rows = pa.concat_tables(tabs)
    n = int(pc.sum(rows["pn"]).as_py() or 0)
    if n == 0:
        return 0, float("nan"), float("nan")
    s = float(pc.sum(rows["ps"]).as_py())
    ss = float(pc.sum(rows["pss"]).as_py())
    mean = s / n
    var = max(0.0, (ss - s * s / n) / max(n - 1, 1))
    return n, mean, float(np.sqrt(var))


def standard_scale(ds: rd.Dataset, col: str, out_col: str,
                   keep_cols: list[str]) -> rd.Dataset:
    """Scaler fit + broadcast transform (SURVEY §2.11 DataPrep analog):
    pass 1 is the distributed mergeable (n, sum, sumsq) aggregate
    (:func:`column_moments` — no full-column driver gather), pass 2 a
    vectorized transform. Output is fixed-point int64 (x-m)/s * 1e6."""
    _, m, s = column_moments(ds, col)

    def f(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False)
        z = np.floor((x - m) / s * 1_000_000.0 + 0.5).astype(np.int64)
        out = batch.select(keep_cols)
        return out.append_column(out_col, pa.array(z, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def circular_variance(ds: rd.Dataset, group_col: str, angle_col: str,
                      out_col: str) -> rd.Dataset:
    """Custom mergeable aggregate (SURVEY §2.8 circular variance,
    porcine/pig_extract.py:2159-2164 analog): per group,
    1 - |sum(e^{i*theta})| / n, computed as per-batch partial (sum cos,
    sum sin, n) rows then one tiny grouped sum. Fixed-point int64 output."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False)
        a = batch[angle_col].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(g, kind="stable")
        g, a = g[order], a[order]
        bounds = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        cs = np.add.reduceat(np.cos(a), bounds)
        ss = np.add.reduceat(np.sin(a), bounds)
        ns = np.diff(np.r_[bounds, len(g)])
        return pa.table({group_col: pa.array(g[bounds]),
                         "pc_": pa.array(cs), "ps_": pa.array(ss),
                         "pn_": pa.array(ns.astype(np.int64))})

    summed = ds.map_batches(partial, batch_format="pyarrow").groupby(
        group_col
    ).aggregate(Sum("pc_", alias_name="sc"), Sum("ps_", alias_name="ss"),
                Sum("pn_", alias_name="n"))

    def finish(batch: pa.Table) -> pa.Table:
        sc = batch["sc"].to_numpy(zero_copy_only=False)
        ss = batch["ss"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        cv = 1.0 - np.sqrt(sc ** 2 + ss ** 2) / n
        fixed = np.floor(cv * 1_000_000.0 + 0.5).astype(np.int64)
        return pa.table({group_col: batch[group_col],
                         out_col: pa.array(fixed, pa.int64())})

    return summed.map_batches(finish, batch_format="pyarrow")


def degree_table(edges: rd.Dataset) -> rd.Dataset:
    """(v, out_deg, in_deg) from a deduped edge table — partial counts per
    batch, then one small grouped sum (§2.8 partial+final combine)."""

    def partial(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        sv, sc = np.unique(src, return_counts=True)
        dv, dc = np.unique(dst, return_counts=True)
        return pa.table({
            "v": pa.array(np.concatenate([sv, dv])),
            "po": pa.array(np.concatenate([sc, np.zeros_like(dc)]).astype(np.int64)),
            "pi": pa.array(np.concatenate([np.zeros_like(sc), dc]).astype(np.int64)),
        })

    from ray.data.aggregate import Sum

    return (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("po", alias_name="out_deg"), Sum("pi", alias_name="in_deg"))
    )


# ---------------------------------------------------------------------------
# sliding-window kernels over ordered series (§2.3 roll_med / §2.5 discord
# analogs; VERDICT r1 missing items 1-3)
# ---------------------------------------------------------------------------

def rolling_median(ds: rd.Dataset, part_col: str, order_cols: list[str],
                   val_col: str, out_col: str, *, window: int = 5,
                   keep_cols: list[str] | None = None,
                   scale: float = 1e6) -> rd.Dataset:
    """Centered rolling median per ordered key — the reference's ``roll_med``
    smoothing kernel (utils.py:54-76) re-expressed as a keyed group op:
    series are hash-partitioned by key, each group sorts and runs one
    C-speed pandas rolling median (window truncated at the edges, matching
    SQL ``ROWS BETWEEN w PRECEDING AND w FOLLOWING``). Output fixed-point
    int64. Partitioning assumption: one key's series fits a worker (the
    same contract as sessionize/lag)."""
    w = window // 2

    def f(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(order_cols, kind="mergesort")
        med = g[val_col].rolling(window, center=True, min_periods=1).median()
        fixed = np.floor(med.to_numpy() * scale + 0.5).astype(np.int64)
        cols = keep_cols or [c for c in g.columns if c != val_col]
        tab = pa.Table.from_pandas(g[cols], preserve_index=False)
        return tab.append_column(out_col, pa.array(fixed, pa.int64()))

    return ds.groupby(part_col).map_groups(f, batch_format="pandas")


def window_anomaly_topk(ds: rd.Dataset, part_col: str, order_cols: list[str],
                        val_col: str, *, window: int = 20, k: int = 10,
                        keep_cols: list[str] | None = None,
                        scale: float = 1e4) -> rd.Dataset:
    """Global top-k windowed-anomaly rows — the matrix-profile discord
    search analog (porcine/stumpy_discord.py:423-468): per series, each
    point is scored |x - mean(prev ``window`` values)| / std(prev values)
    (z-distance to its trailing window); rows without a full window are
    skipped; the global answer is one ``sort.limit(k)`` with a full
    (score desc, key, order) tiebreak.

    Physical plan: keyed group scoring (fresh per-window sums via numpy
    sliding windows — no incremental drift), then the tiny global top-k
    shuffle. Score is fixed-point int64 at ``scale``."""

    def score(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(order_cols, kind="mergesort")
        x = g[val_col].to_numpy().astype(np.float64)
        cols = keep_cols or [c for c in g.columns if c != val_col]
        if len(x) <= window:
            return pa.Table.from_pandas(
                g[cols].iloc[:0], preserve_index=False).append_column(
                "anomaly", pa.array([], pa.int64()))
        from numpy.lib.stride_tricks import sliding_window_view

        win = sliding_window_view(x, window)[:-1]  # trailing window per row
        mu = win.mean(axis=1)
        sd = win.std(axis=1, ddof=1)
        ok = sd > 0  # constant history -> no anomaly signal (dropped,
        # matching the SQL twin's `sd > 0` guard)
        z = np.abs(x[window:][ok] - mu[ok]) / sd[ok]
        fixed = np.floor(z * scale + 0.5).astype(np.int64)
        body = g[cols].iloc[window:][ok]
        tab = pa.Table.from_pandas(body, preserve_index=False)
        return tab.append_column("anomaly", pa.array(fixed, pa.int64()))

    scored = ds.groupby(part_col).map_groups(score, batch_format="pandas")
    return scored.sort(key=["anomaly", part_col] + order_cols,
                       descending=[True] + [False] * (1 + len(order_cols))
                       ).limit(k)


# ---------------------------------------------------------------------------
# impute + power transforms (§2.11 DataPrep family;
# pig_extract.py:2409-2423, 3283-3411 analogs)
# ---------------------------------------------------------------------------

def impute(ds: rd.Dataset, col: str, *, strategy: str = "mean",
           keep_cols: list[str] | None = None,
           out_col: str | None = None) -> rd.Dataset:
    """Null imputation: fit (tiny distributed aggregate) + broadcast
    transform. ``strategy``: "mean" (column_moments over non-nulls),
    "mode" (grouped count, min-value tiebreak), "median" (mergeable
    quantile summary — approximate at 1/q rank, the sketch path)."""
    out_col = out_col or col

    def _missing(c):
        # float NaN counts as missing alongside SQL NULL (or_kleene: plain
        # or_ would propagate the null through `true OR null`)
        if pa.types.is_floating(c.type if isinstance(c, pa.ChunkedArray)
                                else c.type):
            return pc.or_kleene(pc.is_null(c), pc.is_nan(c))
        return pc.is_null(c)

    if strategy == "mean":
        def nn(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.invert(_missing(batch[col])))

        _, fill, _ = column_moments(ds.map_batches(nn, batch_format="pyarrow"), col)
    elif strategy == "mode":
        # exact mode via the Misra-Gries two-pass (sketches.mode_value):
        # candidate set + verify, O(k) driver bytes instead of the full
        # grouped count (VERDICT r2 "what's wrong" #3)
        from .sketches import mode_value

        def nn(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.invert(_missing(batch[col])))

        fill, _ = mode_value(ds.map_batches(nn, batch_format="pyarrow"), col)
    elif strategy == "median":
        from .sketches import quantile_summary, summary_quantile

        def nn(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.invert(_missing(batch[col])))

        vals, w, _ = quantile_summary(
            ds.map_batches(nn, batch_format="pyarrow"), col)
        fill = summary_quantile(vals, w, 0.5)
    else:
        raise ValueError(f"unknown impute strategy {strategy!r}")

    def f(batch: pa.Table) -> pa.Table:
        c = batch[col]
        filled = pc.if_else(_missing(c), pa.scalar(fill, batch.schema.field(col).type), c)
        out = batch.select(keep_cols) if keep_cols else batch.drop_columns([col])
        return out.append_column(out_col, filled)

    return ds.map_batches(f, batch_format="pyarrow")


def power_transform(ds: rd.Dataset, col: str, *, method: str = "log",
                    lam: float = 0.5, keep_cols: list[str] | None = None,
                    out_col: str | None = None,
                    scale: float = 1e4) -> rd.Dataset:
    """Feature transforms (log / sqrt / reciprocal / Box-Cox with FIXED
    lambda): one vectorized map, fixed-point int64 output. The reference
    fits lambda by ML (pig_extract.py:3283-3411); here lambda is a
    parameter — the fit would be one tiny aggregate pass if needed."""
    out_col = out_col or f"{col}_{method}"

    def f(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        if method == "log":
            y = np.log(1.0 + x)
        elif method == "sqrt":
            y = np.sqrt(x)
        elif method == "reciprocal":
            y = 1.0 / (1.0 + x)
        elif method == "boxcox":
            y = (np.power(x, lam) - 1.0) / lam
        else:
            raise ValueError(f"unknown transform {method!r}")
        fixed = np.floor(y * scale + 0.5).astype(np.int64)
        out = batch.select(keep_cols) if keep_cols else batch.drop_columns([col])
        return out.append_column(out_col, pa.array(fixed, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def change_segments(ds: rd.Dataset, part_col: str, order_cols: list[str],
                    val_col: str, *, threshold: float,
                    keep_cols: list[str] | None = None,
                    out_col: str = "segment") -> rd.Dataset:
    """Score-driven ordered segmentation — the regime-change (FLUSS) analog
    (porcine/stumpy_fluss_phase_angle.py:574-649): within each ordered
    series a new segment starts where |x - previous x| exceeds
    ``threshold``; emits per-row (keys, segment id). Same keyed-group
    partitioning contract as sessionize; the whole-series change-point
    scan becomes one vectorized diff + cumsum per key."""

    def f(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(order_cols, kind="mergesort")
        x = g[val_col].to_numpy().astype(np.float64)
        jump = np.abs(np.diff(x)) > threshold if len(x) > 1 else np.array([], bool)
        seg = np.concatenate([[0], np.cumsum(jump)]).astype(np.int64)
        cols = keep_cols or [c for c in g.columns if c != val_col]
        tab = pa.Table.from_pandas(g[cols], preserve_index=False)
        return tab.append_column(out_col, pa.array(seg, pa.int64()))

    return ds.groupby(part_col).map_groups(f, batch_format="pandas")


def hopping_rollup(events: rd.Dataset, ts_col: str, group_col: str,
                   val_col: str, *, length_us: int, hop_us: int,
                   scale: float = 1e4) -> rd.Dataset:
    """Hopping (sliding) event-time windows: length ``length_us``, advancing
    by ``hop_us`` — each event lands in length/hop windows. Vectorized
    expand (np.repeat of the batch into its window starts) + the same
    partial-combine grouped sum as the tumbling rollup; shuffle volume is
    (length/hop) x the pre-aggregated partials, never raw rows."""
    k = length_us // hop_us

    def expand(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        g = batch[group_col].combine_chunks()
        v = batch[val_col].to_numpy(zero_copy_only=False).astype(np.float64)
        base = (ts // hop_us) * hop_us
        idx = np.repeat(np.arange(len(ts), dtype=np.int64), k)
        offs = np.tile(np.arange(k, dtype=np.int64) * hop_us, len(ts))
        wstart = base[idx] - offs
        keep = ts[idx] < wstart + length_us  # guard first windows of time
        t = pa.table({
            group_col: g.take(pa.array(idx[keep])),
            "w_start": pa.array(wstart[keep], pa.int64()),
            "v": pa.array(v[idx[keep]], pa.float64()),
        })
        # per-batch partial combine before the shuffle
        pre = t.group_by([group_col, "w_start"]).aggregate(
            [("v", "sum"), ([], "count_all")])
        return pre.rename_columns([group_col, "w_start", "pv", "pn"])

    from ray.data.aggregate import Sum

    out = (events.select_columns([ts_col, group_col, val_col])
           .map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
           .groupby([group_col, "w_start"])
           .aggregate(Sum("pv", alias_name="sum_value"),
                      Sum("pn", alias_name="n")))
    return scale_columns(out, {"sum_value": scale})


def exact_quantiles(ds: rd.Dataset, col: str, ps: list[float], *,
                    bins: int = 512, gather_limit: int = 1 << 16,
                    max_passes: int = 6, disc: bool = False) -> list[float]:
    """EXACT global quantiles (linear interpolation == percentile_cont)
    without ever gathering the column: iterative histogram bisection.
    Each pass is one distributed scan producing a ``bins``-bucket count
    per open bracket (O(bins) driver bytes); brackets narrow ~bins x per
    pass until <= ``gather_limit`` values remain, which are fetched and
    order-selected exactly. 2-3 passes for any realistic column.

    ``disc=True``: DISCRETE quantiles (percentile_disc) — the actual
    element at sorted rank floor(p*(n-1)), no interpolation arithmetic,
    bit-reproducible across engines (DuckDB quantile_disc semantics)."""

    def moments(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        if len(x) == 0:
            return pa.table({"pn": pa.array([], pa.int64()),
                             "plo": pa.array([], pa.float64()),
                             "phi": pa.array([], pa.float64())})
        return pa.table({"pn": pa.array([len(x)], pa.int64()),
                         "plo": pa.array([float(x.min())], pa.float64()),
                         "phi": pa.array([float(x.max())], pa.float64())})

    proj = ds.select_columns([col]).materialize()
    mtabs = list(proj.map_batches(
        moments, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=1 << 20))
    if not mtabs:
        return [float("nan")] * len(ps)
    rows = pa.concat_tables(mtabs)
    n = int(pc.sum(rows["pn"]).as_py() or 0)
    if n == 0:
        return [float("nan")] * len(ps)
    gmin = float(pc.min(rows["plo"]).as_py())
    gmax = float(pc.max(rows["phi"]).as_py())

    # per-quantile state: (lo, hi, count_below_lo, count_inside, resolved?)
    states = []
    for p in ps:
        r = p * (n - 1)
        if disc:
            r = float(np.floor(r))  # rank of an actual element
        states.append({"r": r, "k0": int(np.floor(r)), "k1": int(np.ceil(r)),
                       "lo": gmin, "hi": gmax, "below": 0, "inside": n})

    def hist_pass(brackets):
        edges_list = [np.linspace(lo, hi, bins + 1) for lo, hi in brackets]

        def f(batch: pa.Table) -> pa.Table:
            x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            x = x[~np.isnan(x)]
            out_b, out_cnt = [], []
            for bi, edges in enumerate(edges_list):
                inb = x[(x >= edges[0]) & (x <= edges[-1])]
                out_b.append(bi)
                out_cnt.append(np.histogram(inb, bins=edges)[0].astype(np.int64))
            return pa.table({"b": pa.array(out_b, pa.int64()),
                             "cnt": pa.array(out_cnt, pa.list_(pa.int64()))})

        acc = [np.zeros(bins, np.int64) for _ in brackets]
        for b in proj.map_batches(f, batch_format="pyarrow",
                                  zero_copy_batch=True).iter_batches(
                batch_format="pyarrow"):
            cl = b["cnt"].combine_chunks()
            flat = cl.flatten().to_numpy(zero_copy_only=False)
            offs = cl.offsets.to_numpy(zero_copy_only=False)
            bs = b["b"].to_numpy(zero_copy_only=False)
            for i in range(b.num_rows):
                acc[bs[i]] += flat[offs[i]: offs[i + 1]]
        return acc, edges_list

    for _ in range(max_passes):
        open_idx = [i for i, s in enumerate(states)
                    if s["inside"] > gather_limit and s["lo"] < s["hi"]]
        if not open_idx:
            break
        acc, edges_list = hist_pass([(states[i]["lo"], states[i]["hi"])
                                     for i in open_idx])
        for j, i in enumerate(open_idx):
            s = states[i]
            cum = s["below"] + np.concatenate([[0], np.cumsum(acc[j])])
            # bins whose cumulative range covers ranks k0..k1
            b0 = int(np.searchsorted(cum, s["k0"] + 1) - 1)
            b1 = int(np.searchsorted(cum, s["k1"] + 1) - 1)
            b0 = min(max(b0, 0), bins - 1)
            b1 = min(max(b1, b0), bins - 1)
            new_lo = float(edges_list[j][b0])
            new_hi = float(edges_list[j][b1 + 1])
            s["below"] = int(cum[b0])
            s["inside"] = int(cum[b1 + 1] - cum[b0])
            if new_lo == s["lo"] and new_hi == s["hi"]:
                break  # cannot narrow further (degenerate float span)
            s["lo"], s["hi"] = new_lo, new_hi

    out = []
    for s in states:
        lo, hi = s["lo"], s["hi"]
        if lo == hi:
            out.append(float(lo))  # bracket collapsed to one value
            continue

        def g(batch: pa.Table, lo=lo, hi=hi) -> pa.Table:
            x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            x = x[(x >= lo) & (x <= hi)]
            return pa.table({"v": pa.array(x, pa.float64())})

        vals = np.sort(np.concatenate(
            [b["v"].to_numpy(zero_copy_only=False)
             for b in proj.map_batches(g, batch_format="pyarrow",
                                       zero_copy_batch=True).iter_batches(
                 batch_format="pyarrow", batch_size=1 << 20)] or
            [np.array([], np.float64)]))
        v0 = vals[s["k0"] - s["below"]]
        v1 = vals[s["k1"] - s["below"]]
        r = s["r"]
        out.append(float(v0 + (r - np.floor(r)) * (v1 - v0)))
    return out


def rolling_smooth(ds: rd.Dataset, part_col: str, order_cols: list[str],
                   val_col: str, out_col: str, *, window: int = 5,
                   stat: str = "mean", keep_cols: list[str] | None = None,
                   scale: float = 1e6) -> rd.Dataset:
    """Centered rolling smoothing per ordered key — mean (the
    Savitzky-Golay/smooth_signal analog at polynomial order 0,
    utils.py:203-226) or median (roll_med, utils.py:54-76). Edge windows
    truncate, matching SQL ROWS BETWEEN framing. Fixed-point int64."""

    def f(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(order_cols, kind="mergesort")
        r = g[val_col].rolling(window, center=True, min_periods=1)
        sm = r.mean() if stat == "mean" else r.median()
        fixed = np.floor(sm.to_numpy() * scale + 0.5).astype(np.int64)
        cols = keep_cols or [c for c in g.columns if c != val_col]
        tab = pa.Table.from_pandas(g[cols], preserve_index=False)
        return tab.append_column(out_col, pa.array(fixed, pa.int64()))

    return ds.groupby(part_col).map_groups(f, batch_format="pandas")


def grouped_vector_mean(ds: rd.Dataset, group_col: str, vec_col: str, *,
                        scale: float = 1e6) -> rd.Dataset:
    """Element-wise mean of a fixed-length vector column per group (the
    mean-PSD-across-beats analog, pig_extract.py:2203-2207): per-batch
    partial (group, sum-vector, n) rows, tiny grouped final combine,
    flattened to (group, pos, mean) rows (hash-friendly output). Shuffle
    volume: one vector per (group, batch)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False)
        v = batch[vec_col].combine_chunks()
        mat = v.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        dim = mat.size // max(1, len(g))
        mat = mat.reshape(len(g), dim)
        order = np.argsort(g, kind="stable")
        gs, ms = g[order], mat[order]
        bounds = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        sums = np.add.reduceat(ms, bounds, axis=0)
        ns = np.diff(np.r_[bounds, len(gs)])
        k = len(bounds)
        offs = pa.array(np.arange(k + 1, dtype=np.int32) * dim, pa.int32())
        return pa.table({
            group_col: pa.array(gs[bounds]),
            "vsum": pa.ListArray.from_arrays(
                offs, pa.array(sums.ravel(), pa.float64())),
            "pn": pa.array(ns.astype(np.int64), pa.int64()),
        })

    def combine(grp: pd.DataFrame) -> pd.DataFrame:
        acc = None
        n = 0
        for vs, pn in zip(grp["vsum"], grp["pn"]):
            arr = np.asarray(vs, dtype=np.float64)
            acc = arr if acc is None else acc + arr
            n += int(pn)
        mean = acc / n
        fixed = np.floor(mean * scale + 0.5).astype(np.int64)
        return pd.DataFrame({
            group_col: grp[group_col].iloc[0],
            "pos": np.arange(1, len(mean) + 1, dtype=np.int64),
            "mean_val": fixed,
        })

    return (ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby(group_col).map_groups(combine, batch_format="pandas"))


def histogram(ds: rd.Dataset, col: str, lo: float, hi: float,
              nbins: int) -> rd.Dataset:
    """Fixed-width histogram (bucket, n) over [lo, hi) — the reference's
    num_features hist-stats analog (ml_anom.py:183-390). Each batch
    bincounts locally (one nbins-long partial per batch); the shuffle
    moves only (bucket, n) partials. Values at/above ``hi`` clamp into the
    last bucket, below ``lo`` into bucket 0; nulls/NaN dropped — mirrored
    exactly by the SQL twin's least/greatest expression."""
    w = (hi - lo) / nbins

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        b = np.clip(np.floor((x - lo) / w), 0, nbins - 1).astype(np.int64)
        cnt = np.bincount(b, minlength=nbins)
        nz = np.flatnonzero(cnt)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "n": pa.array(cnt[nz], pa.int64())})

    from ray.data.aggregate import Sum

    def finish(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["n" if c == "sum(n)" else c for c in batch.column_names])

    return (ds.select_columns([col])
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bucket").aggregate(Sum("n"))
            .map_batches(finish, batch_format="pyarrow"))


def column_summary(ds: rd.Dataset, col: str, *,
                   scale: float = 1e6) -> rd.Dataset:
    """describe()-style one-row summary: (n, n_null, min_v, max_v, mean_fp)
    from a single mergeable partial pass (pig_extract.py:2556-2770's
    sum_stats analog). The mean is computed over PER-ROW fixed-point
    values (floor(x*scale + 0.5), summed as exact int64 — no
    engine-dependent float accumulation order), then one final rounded
    divide mirrored by the SQL twin."""

    def partial(batch: pa.Table) -> pa.Table:
        c = batch[col]
        n = len(c)
        nn = int(pc.sum(pc.cast(pc.is_null(c), pa.int64())).as_py() or 0)
        x = c.to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        fp = np.floor(x * scale + 0.5).astype(np.int64)
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "n_null": pa.array([nn], pa.int64()),
            "n_valid": pa.array([len(x)], pa.int64()),  # non-null, non-NaN
            "mn": pa.array([float(x.min()) if len(x) else np.inf]),
            "mx": pa.array([float(x.max()) if len(x) else -np.inf]),
            "s": pa.array([int(fp.sum())], pa.int64()),
        })

    rows = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    n = n_null = n_valid = s = 0
    mn, mx = np.inf, -np.inf
    for b in rows.iter_batches(batch_format="pyarrow"):
        n += int(pc.sum(b["n"]).as_py() or 0)
        n_null += int(pc.sum(b["n_null"]).as_py() or 0)
        n_valid += int(pc.sum(b["n_valid"]).as_py() or 0)
        if b.num_rows:
            mn = min(mn, pc.min(b["mn"]).as_py())
            mx = max(mx, pc.max(b["mx"]).as_py())
            s += int(pc.sum(b["s"]).as_py() or 0)
    mean_fp = int(np.floor(s / max(n_valid, 1) + 0.5))
    return rd.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "n_null": pa.array([n_null], pa.int64()),
        "min_v": pa.array([mn], pa.float64()),
        "max_v": pa.array([mx], pa.float64()),
        "mean_fp": pa.array([mean_fp], pa.int64()),
    }))


def pearson_corr(ds: rd.Dataset, x_col: str, y_col: str, *,
                 scale: float = 1e6) -> rd.Dataset:
    """Pearson correlation of two columns as ONE mergeable aggregate
    (n, sx, sy, sxx, syy, sxy partials — the corr_heatmap cell analog,
    ml_anom.py:183-390). Returns a single fixed-point row."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(x) | np.isnan(y))
        x, y = x[ok], y[ok]
        return pa.table({
            "pn": pa.array([len(x)], pa.int64()),
            "sx": pa.array([float(x.sum())], pa.float64()),
            "sy": pa.array([float(y.sum())], pa.float64()),
            "sxx": pa.array([float((x * x).sum())], pa.float64()),
            "syy": pa.array([float((y * y).sum())], pa.float64()),
            "sxy": pa.array([float((x * y).sum())], pa.float64()),
        })

    cols = [x_col] if x_col == y_col else [x_col, y_col]
    tabs = list(
        ds.select_columns(cols).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=1 << 20))
    rows = pa.concat_tables(tabs) if tabs else None
    n = float(pc.sum(rows["pn"]).as_py() or 0) if rows is not None else 0.0
    if n == 0:
        return rd.from_arrow(pa.table({"corr": pa.array([0], pa.int64())}))
    sx = float(pc.sum(rows["sx"]).as_py() or 0.0)
    sy = float(pc.sum(rows["sy"]).as_py() or 0.0)
    sxx = float(pc.sum(rows["sxx"]).as_py() or 0.0)
    syy = float(pc.sum(rows["syy"]).as_py() or 0.0)
    sxy = float(pc.sum(rows["sxy"]).as_py() or 0.0)
    num = n * sxy - sx * sy
    den = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
    r = num / den if den else float("nan")
    fixed = int(np.floor(r * scale + 0.5))
    return rd.from_arrow(pa.table({"corr": pa.array([fixed], pa.int64())}))


def hash_join(left: rd.Dataset, right: rd.Dataset, on: str, *,
              right_on: str | None = None, how: str = "inner",
              num_partitions: int = 32,
              right_suffix: str = "_r") -> rd.Dataset:
    """General distributed equi-join (SURVEY §2.7, the big-big path):
    both sides tagged and bucketed by ``hash64(key) % num_partitions``,
    ONE sort-based groupby shuffle, per-bucket Acero (``pa.Table.join``)
    probe. Deliberately avoids ``Dataset.join``: Ray 2.49's hash-join
    aggregator nondeterministically mis-plans when its internal
    schema-dedup fails ("Failed to hash the schemas"), surfacing as an
    Acero FieldRef error on identical inputs (same reason
    :func:`semi_join` / :func:`anti_join` use this pattern).

    ``how`` is ``inner``, ``left_outer`` or ``full_outer``. Right non-key
    columns that
    collide with a left column name get ``right_suffix`` appended. NULL
    join keys never match (SQL semantics); ``left_outer`` keeps unmatched
    left rows with nulls. Use :func:`broadcast_left_join` instead when one
    side is dimension-sized (no shuffle); this one shuffles both sides
    once."""
    from .graph import hash64

    r_on = right_on or on
    pa_how = {"inner": "inner", "left": "left outer",
              "left_outer": "left outer",
              "full": "full outer", "full_outer": "full outer"}[how]
    B = num_partitions

    def _arrow(ds: rd.Dataset):
        # pandas-block-backed datasets report a PandasBlockSchema; force
        # Arrow blocks so the shuffle schema is a real pa.Schema
        base = ds.schema().base_schema
        if isinstance(base, pa.Schema):
            return ds, base
        ds = ds.map_batches(lambda b: b, batch_format="pyarrow")
        return ds, ds.schema().base_schema

    left, l_schema = _arrow(left)
    right, r_schema = _arrow(right)
    l_names = [f.name for f in l_schema]
    if r_on != on and r_on in l_names:
        raise ValueError(
            f"hash_join: right key {r_on!r} collides with a left column")
    # right-side field layout in the unioned shuffle schema: the key rides
    # in the LEFT key slot when names coincide; other collisions suffix
    r_fields = []  # (orig_name, union_name, type)
    for f in r_schema:
        if f.name == r_on:
            union_name = on if r_on == on else r_on
        elif f.name in l_names:
            union_name = f.name + right_suffix
        else:
            union_name = f.name
        r_fields.append((f.name, union_name, f.type))
    key_type = l_schema.field(on).type
    union_fields = list(l_schema) + [
        pa.field(un, t) for (orig, un, t) in r_fields
        if not (un == on and r_on == on)]
    union_names = [f.name for f in union_fields]

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {f.name: batch[f.name] for f in l_schema}
        for f in union_fields[len(l_schema):]:
            cols[f.name] = pa.nulls(batch.num_rows, f.type)
        cols["__bkt"] = pa.array(
            (hash64(batch[on]) % np.uint64(B)).astype(np.int64), pa.int64())
        cols["__side"] = pa.array(
            np.zeros(batch.num_rows, np.int8), pa.int8())
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {f.name: pa.nulls(n, f.type) for f in l_schema}
        for orig, un, t in r_fields:
            col = batch[orig]
            cols[un] = pc.cast(col, key_type) if un == on else col
        cols["__bkt"] = pa.array(
            (hash64(batch[r_on]) % np.uint64(B)).astype(np.int64), pa.int64())
        cols["__side"] = pa.array(np.ones(n, np.int8), pa.int8())
        return pa.table({k: cols[k] for k in union_names
                         + ["__bkt", "__side"]})

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")
    # right-side column names as they appear in the union schema; the key
    # slot is `on` when the names coincide, `r_on` otherwise
    right_key_union = on if r_on == on else r_on
    r_union_cols = [right_key_union] + [
        un for (orig, un, t) in r_fields if un != right_key_union]

    # the sort shuffle normalizes all-null columns to null TYPE in some
    # blocks; Acero refuses null-typed non-key join fields — cast each
    # side back to its intended schema before the per-bucket probe
    l_target = pa.schema(list(l_schema))
    r_target = pa.schema(
        [pa.field(right_key_union, key_type)]
        + [pa.field(un, t) for (orig, un, t) in r_fields
           if un != right_key_union])

    def per_bucket(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        ltab = (g.filter(pa.array(side == 0))
                .select([f.name for f in l_schema]).cast(l_target))
        rtab = (g.filter(pa.array(side == 1))
                .select(r_union_cols).cast(r_target))
        return ltab.join(rtab, keys=[on], right_keys=[right_key_union],
                         join_type=pa_how)

    return lt.union(rt).groupby("__bkt").map_groups(
        per_bucket, batch_format="pyarrow")


def hash_split(ds: rd.Dataset, key_col: str,
               fractions: dict[str, float] | None = None,
               out_col: str = "split") -> rd.Dataset:
    """Deterministic, engine-independent corpus split (train/val/test).

    Assignment is a pure function of the KEY — md5 of its decimal string,
    first 4 hex digits compared against cumulative-fraction thresholds — so
    (a) re-running on any partitioning/cluster gives the same split, and
    (b) keying by a GROUP column (user, domain) keeps whole groups in one
    fold (the reference's GroupShuffleSplit discipline,
    pig_extract.py:3589-3635). SQL twin: CASE on substr(md5(CAST(key AS
    VARCHAR)),1,4). Fractions land on a 65536-bucket grid (off by < 2e-5)."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    names, bounds, cum = [], [], 0.0
    for name, frac in fractions.items():
        cum += frac
        names.append(name)
        b = int(np.floor(cum * 65536))
        # >= the full grid: close the range with a sentinel ABOVE every
        # 4-char hex prefix (format(65536,'04x') is '10000', which sorts
        # BELOW '2...' lexicographically and would misroute rows)
        bounds.append("ffffffff" if b >= 65536 else format(b, "04x"))
    bounds[-1] = "ffffffff"  # top bucket closed regardless of fp rounding

    import hashlib

    def f(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        hexes = [hashlib.md5(str(k).encode()).hexdigest()[:4] for k in keys]
        splits = []
        for h in hexes:
            for name, b in zip(names, bounds):
                if h < b:
                    splits.append(name)
                    break
        return batch.append_column(out_col, pa.array(splits, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def stratified_sample(ds: rd.Dataset, group_col: str, id_col: str,
                      n: int) -> rd.Dataset:
    """Deterministic stratified sample: the ``n`` rows per group with the
    smallest (md5(id), id) — a seed-free uniform draw that is reproducible
    across engines and cluster shapes (corpus subsampling per language /
    source / event type). ALL columns of the sampled rows are kept.
    Partial+final combine: each batch keeps at most ``n`` rows per group
    before the shuffle."""
    import hashlib

    def rank_key(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["_h"] = [hashlib.md5(str(k).encode()).hexdigest()
                     for k in out[id_col]]
        return (out.sort_values(["_h", id_col], kind="mergesort")
                .groupby(group_col, sort=False).head(n))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_h", id_col], kind="mergesort").head(n)
        return g.drop(columns=["_h"])

    return (ds.map_batches(rank_key, batch_format="pandas")
            .groupby(group_col).map_groups(final, batch_format="pandas"))


def _bloom_prefilter(left: rd.Dataset, right: rd.Dataset, on: str,
                     right_on: str, num_bits: int, num_hashes: int):
    """Split ``left`` by a Bloom filter built over ``right[right_on]``:
    returns (maybe, definitely_absent). Rows in ``definitely_absent`` have
    NO match in right (Bloom has no false negatives); ``maybe`` still needs
    the exact join. The filter bits are built with a distributed OR-reduce
    and broadcast once — only O(num_bits/8) bytes ship anywhere."""
    from .sketches import bloom_build, bloom_may_contain

    bits_ref = ray.put(bloom_build(
        right, right_on, num_bits=num_bits, num_hashes=num_hashes))

    def split(keep_maybe: bool):
        def f(batch: pa.Table) -> pa.Table:
            mask = bloom_may_contain(ray.get(bits_ref), batch[on],
                                     num_hashes=num_hashes)
            return batch.filter(pa.array(mask if keep_maybe else ~mask))
        return f

    maybe = left.map_batches(split(True), batch_format="pyarrow")
    absent = left.map_batches(split(False), batch_format="pyarrow")
    return maybe, absent


def _grouped_semi_anti(left: rd.Dataset, right: rd.Dataset, on: str,
                       r_on: str, keep_matches: bool,
                       num_partitions: int) -> rd.Dataset:
    """Exact semi/anti core on the repo's bucketed-group pattern: both
    sides tagged and bucketed by hash64(key) % B, ONE sort-based groupby
    shuffle, per-bucket vectorized isin filter. Deliberately avoids
    ``Dataset.join``: Ray 2.49's hash-join aggregator nondeterministically
    mis-plans when the two sides interact with its internal schema-dedup
    failure ("Failed to hash the schemas"), surfacing as an Acero
    FieldRef error — observed flaky on identical inputs.

    NULL semantics match SQL EXISTS/NOT EXISTS: a null left key never
    matches (semi drops it, anti keeps it); null right keys match nothing.
    """
    from .graph import hash64

    B = num_partitions
    left_schema = left.schema().base_schema  # union needs aligned schemas

    def tag_left(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "__rkey", pc.cast(batch[on], pa.string()))
        bkt = (hash64(batch[on]) % np.uint64(B)).astype(np.int64)
        batch = batch.append_column("__bkt", pa.array(bkt, pa.int64()))
        return batch.append_column(
            "__side", pa.array(np.zeros(batch.num_rows, np.int8), pa.int8()))

    def tag_right(batch: pa.Table) -> pa.Table:
        keys = batch[r_on]
        keys = keys.combine_chunks() if isinstance(
            keys, pa.ChunkedArray) else keys
        keys = keys.filter(pc.is_valid(keys))
        bkt = (hash64(keys) % np.uint64(B)).astype(np.int64)
        n = len(keys)
        cols = {f.name: pa.nulls(n, f.type) for f in left_schema}
        cols["__rkey"] = pc.cast(keys, pa.string())
        cols["__bkt"] = pa.array(bkt, pa.int64())
        cols["__side"] = pa.array(np.ones(n, np.int8), pa.int8())
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.select_columns([r_on]).map_batches(
        tag_right, batch_format="pyarrow")

    def per_bucket(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        keys = g["__rkey"].to_numpy(zero_copy_only=False)
        rset = np.unique(keys[side == 1])
        lrows = g.filter(pa.array(side == 0))
        lkeys = lrows["__rkey"].to_numpy(zero_copy_only=False)
        lvalid = lrows[on]
        lvalid = pc.is_valid(lvalid).to_numpy(zero_copy_only=False)
        hit = np.isin(lkeys, rset) & lvalid  # null keys never match
        mask = hit if keep_matches else ~hit
        return lrows.filter(pa.array(mask)).drop_columns(
            ["__rkey", "__bkt", "__side"])

    return lt.union(rt).groupby("__bkt").map_groups(
        per_bucket, batch_format="pyarrow")


def semi_join(left: rd.Dataset, right: rd.Dataset, on: str, *,
              right_on: str | None = None, num_partitions: int = 32,
              bloom_bits: int = 0, bloom_hashes: int = 5) -> rd.Dataset:
    """Distributed left semi-join (EXISTS): keep left rows with >=1 match in
    right; left columns only, no duplication (SURVEY §2.7 set-semantics
    lookups; training-data use: keep documents on an allowlist).

    ``bloom_bits > 0`` enables the scale path: a Bloom filter over the right
    keys drops definitely-absent left rows BEFORE the shuffle, so only
    plausible matches pay the exchange. The result stays exact — false
    positives just ride through to the exact probe."""
    r_on = right_on or on
    if bloom_bits:
        left, _ = _bloom_prefilter(left, right, on, r_on,
                                   bloom_bits, bloom_hashes)
    return _grouped_semi_anti(left, right, on, r_on, True, num_partitions)


def grouped_topk(ds: rd.Dataset, group_cols: list[str],
                 order_keys: Sequence[tuple[str, bool]], k: int) -> rd.Dataset:
    """Top-k rows PER GROUP (the reference's per-section top-discord,
    porcine/stumpy_discord.py:423-437, generalized from top-1). Two-level:
    each batch preselects its own per-group head(k) (one C-speed sort +
    groupby-head, so the shuffle carries at most k rows per (group, batch)),
    then the grouped final pass re-sorts and truncates. ``order_keys`` =
    [(col, descending), ...] and must totally order rows (include a
    tiebreak column) for a deterministic result. SQL twin:
    ``row_number() OVER (PARTITION BY g ORDER BY ...) <= k``."""
    cols = [c for c, _ in order_keys]
    ascending = [not d for _, d in order_keys]

    def pre(batch: pd.DataFrame) -> pd.DataFrame:
        return (batch.sort_values(cols, ascending=ascending, kind="mergesort")
                .groupby(group_cols, sort=False).head(k))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(cols, ascending=ascending,
                             kind="mergesort").head(k)

    return (ds.map_batches(pre, batch_format="pandas")
            .groupby(group_cols).map_groups(final, batch_format="pandas"))


def grouped_quantile(ds: rd.Dataset, group_col: str, val_col: str, q: float,
                     out_col: str, *, scale: float = 100.0) -> rd.Dataset:
    """Per-group DISCRETE quantile (percentile_disc): the element at sorted
    index ``floor(q*(n-1))`` of each group — an actual column value, so the
    fixed-point output is bit-reproducible across engines (no interpolation
    arithmetic to mismatch). Scale shape: each batch pre-aggregates
    (group, value) -> count (the distinct-pairs combiner), the shuffle
    moves only distinct pairs, and the final per-group pass selects by
    cumulative weight — group cardinality never matters, only distinct
    values per group. Nulls/NaN are the caller's to filter. SQL twin:
    ``quantile_disc(val, q) GROUP BY g`` (DuckDB indexes floor(q*(n-1)),
    verified)."""

    def pairs(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, val_col]).group_by(
            [group_col, val_col]).aggregate([([], "count_all")])
        return t.rename_columns([group_col, val_col, "n"])

    pre = ds.map_batches(pairs, batch_format="pyarrow")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(val_col, sort=True)["n"].sum()
        cum = agg.cumsum().to_numpy()
        n_tot = int(cum[-1])
        idx = int(np.floor(q * (n_tot - 1)))
        v = float(agg.index.to_numpy()[np.searchsorted(cum, idx + 1)])
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             out_col: [int(np.floor(v * scale + 0.5))]})

    return pre.groupby(group_col).map_groups(finish, batch_format="pandas")


def pivot_count(ds: rd.Dataset, row_col: str, col_col: str,
                categories: list[str]) -> rd.Dataset:
    """Crosstab: one output row per ``row_col`` value with an int64 count
    column per listed category (the corr-heatmap / confusion-matrix shape,
    ml_anom.py:183-390 analog). ``categories`` is explicit — a fixed output
    schema is what makes the op streamable (no schema discovery pass).
    Per-batch partial: one vectorized (row, col) count; the shuffle moves
    only per-(row, category) partial counts. Unlisted categories are
    ignored. SQL twin: SUM(CASE WHEN col = c THEN 1 ELSE 0 END) per c."""
    from ray.data.aggregate import Sum

    cat_of = {c: i for i, c in enumerate(categories)}

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([row_col, col_col]).group_by(
            [row_col, col_col]).aggregate([([], "count_all")])
        t = t.rename_columns([row_col, col_col, "n"])
        rows = {row_col: t[row_col]}
        code = np.array([cat_of.get(v, -1)
                         for v in t[col_col].to_pylist()], np.int64)
        n = t["n"].to_numpy(zero_copy_only=False)
        for c, i in cat_of.items():
            rows[f"n_{c}"] = pa.array(np.where(code == i, n, 0), pa.int64())
        return pa.table(rows)

    aggs = [Sum(f"n_{c}", alias_name=f"n_{c}") for c in categories]
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(row_col).aggregate(*aggs))


def quantile_bins(ds: rd.Dataset, col: str, k: int, out_col: str,
                  keep_cols: list[str] | None = None) -> rd.Dataset:
    """Quantile binning (the reference's np.select range-class binning,
    pig_extract.py:836-857, with data-driven thresholds): assign each row
    bucket = #(thresholds <= x), thresholds being the k-1 DISCRETE
    quantiles (actual column elements at floor(q*(n-1)) — bit-stable
    across engines, unlike interpolated cuts). Fit pass =
    :func:`exact_quantiles` histogram bisection (O(bins) driver bytes, no
    column or distinct-value gather); transform pass is a broadcast
    searchsorted. SQL twin: a sum of x >= quantile_disc(col, i/k)
    comparisons. Duplicate thresholds (skewed data) collapse, so bucket
    ids stay dense in occupancy order."""
    thresholds = np.array(sorted(set(exact_quantiles(
        ds, col, [i / k for i in range(1, k)], disc=True))))

    def assign(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False)
        b = np.searchsorted(thresholds, x, side="right").astype(np.int64)
        out = batch.select(keep_cols) if keep_cols else batch
        return out.append_column(out_col, pa.array(b, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def asof_join(left: rd.Dataset, right: rd.Dataset, on: str, *,
              left_ts: str, right_ts: str, tie_col: str,
              right_cols: dict[str, str],
              num_partitions: int = 32) -> rd.Dataset:
    """Distributed INNER as-of join (SURVEY §2.7's "join Ray Data lacks"
    family): each left row matches the LATEST right row of the same key
    with ``right_ts <= left_ts``; ties on ``right_ts`` break by max
    ``tie_col``. Unmatched left rows are dropped. ``right_cols`` maps
    right column -> output name (must not collide with left columns).

    Physical plan: both sides tagged and bucketed by
    ``hash64(key) % num_partitions`` (same one-shuffle bucketed-group
    exchange as :func:`hash_join`); within a bucket the match is one
    vectorized ``searchsorted`` over a composite (key-code, ts-rank) int64
    lattice — no per-key Python loop. Partitioning assumption: one
    bucket's rows stay below 2^31 (int32-safe composite codes); hot single
    keys co-locate, the documented skew limit (salt the key upstream if a
    single key dominates). NULL join keys are the caller's to filter
    (SQL never matches them; the numpy key-code path would coerce a
    nullable int key to NaN and match NaN==NaN). SQL twin: row_number()
    OVER (PARTITION BY left-row ORDER BY r.ts DESC, r.tie DESC) = 1 on
    the inequality join."""
    from .graph import hash64

    B = num_partitions

    def _arrow(ds: rd.Dataset):
        # pandas-block-backed datasets report a PandasBlockSchema; force
        # Arrow blocks so the tagged shuffle schema is a real pa.Schema
        base = ds.schema().base_schema
        if isinstance(base, pa.Schema):
            return ds, base
        ds = ds.map_batches(lambda b: b, batch_format="pyarrow")
        return ds, ds.schema().base_schema

    left, l_schema = _arrow(left)
    right, r_schema = _arrow(right)
    l_names = [f.name for f in l_schema]
    for out_name in right_cols.values():
        if out_name in l_names:
            raise ValueError(f"asof_join: output column {out_name!r} "
                             "collides with a left column")
    key_type = l_schema.field(on).type
    out_fields = [(rc, out_name, r_schema.field(rc).type)
                  for rc, out_name in right_cols.items()]

    def _us(col) -> np.ndarray:
        return (col.to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64))

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {f.name: batch[f.name] for f in l_schema}
        for _, out_name, t in out_fields:
            cols[out_name] = pa.nulls(batch.num_rows, t)
        cols["__ts"] = pa.array(_us(batch[left_ts]), pa.int64())
        cols["__tie"] = pa.nulls(batch.num_rows, pa.int64())
        cols["__bkt"] = pa.array(
            (hash64(batch[on]) % np.uint64(B)).astype(np.int64), pa.int64())
        cols["__side"] = pa.array(np.zeros(batch.num_rows, np.int8), pa.int8())
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {f.name: pa.nulls(n, f.type) for f in l_schema}
        cols[on] = pc.cast(batch[on], key_type)
        for rc, out_name, _ in out_fields:
            cols[out_name] = batch[rc]
        cols["__ts"] = pa.array(_us(batch[right_ts]), pa.int64())
        cols["__tie"] = pc.cast(batch[tie_col], pa.int64())
        cols["__bkt"] = pa.array(
            (hash64(batch[on]) % np.uint64(B)).astype(np.int64), pa.int64())
        cols["__side"] = pa.array(np.ones(n, np.int8), pa.int8())
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.select_columns(
        list(dict.fromkeys([on, right_ts, tie_col] + list(right_cols)))
    ).map_batches(tag_right, batch_format="pyarrow")
    out_names = l_names + [out_name for _, out_name, _ in out_fields]

    def per_bucket(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        ltab = g.filter(pa.array(side == 0))
        rtab = g.filter(pa.array(side == 1))
        empty = ltab.select(l_names).slice(0, 0)
        for _, out_name, t in out_fields:
            empty = empty.append_column(out_name, pa.array([], t))
        if ltab.num_rows == 0 or rtab.num_rows == 0:
            return empty
        lk = ltab[on].to_numpy(zero_copy_only=False)
        rk = rtab[on].to_numpy(zero_copy_only=False)
        lts = ltab["__ts"].to_numpy(zero_copy_only=False)
        rts = rtab["__ts"].to_numpy(zero_copy_only=False)
        tie = rtab["__tie"].to_numpy(zero_copy_only=False)
        assert len(lk) + len(rk) < (1 << 31), "bucket too large; raise B"
        # composite (key-code, ts-rank) lattice: codes from the union of
        # keys, ranks from the union of timestamps -> one searchsorted
        keys = np.unique(np.concatenate([lk, rk]))
        lkc = np.searchsorted(keys, lk).astype(np.int64)
        rkc = np.searchsorted(keys, rk).astype(np.int64)
        ut = np.unique(np.concatenate([lts, rts]))
        m = np.int64(len(ut) + 1)
        lrank = np.searchsorted(ut, lts).astype(np.int64)
        rrank = np.searchsorted(ut, rts).astype(np.int64)
        order = np.lexsort((tie, rrank, rkc))  # ties end with max tie_col
        comp_r = (rkc * m + rrank)[order]
        pos = np.searchsorted(comp_r, lkc * m + lrank, side="right") - 1
        safe = np.maximum(pos, 0)
        hit = (pos >= 0) & (rkc[order][safe] == lkc)
        out = ltab.select(l_names).filter(pa.array(hit))
        take = pa.array(order[safe][hit].astype(np.int64))
        for _, out_name, _ in out_fields:
            out = out.append_column(
                out_name, rtab[out_name].combine_chunks().take(take))
        return out

    return lt.union(rt).groupby("__bkt").map_groups(
        per_bucket, batch_format="pyarrow")


def anti_join(left: rd.Dataset, right: rd.Dataset, on: str, *,
              right_on: str | None = None, num_partitions: int = 32,
              bloom_bits: int = 0, bloom_hashes: int = 5) -> rd.Dataset:
    """Distributed left anti-join (NOT EXISTS): keep left rows with NO match
    in right (training-data use: blocklist / already-processed-id
    subtraction).

    With ``bloom_bits > 0``, left rows whose key misses the Bloom filter are
    emitted DIRECTLY (no false negatives -> provably unmatched, zero shuffle
    cost); only the maybe-present remainder goes through the exact probe.
    Exact either way."""
    r_on = right_on or on
    if bloom_bits:
        maybe, absent = _bloom_prefilter(left, right, on, r_on,
                                         bloom_bits, bloom_hashes)
        probed = _grouped_semi_anti(maybe, right, on, r_on, False,
                                    num_partitions)
        return absent.union(probed)
    return _grouped_semi_anti(left, right, on, r_on, False, num_partitions)


# ---------------------------------------------------------------------------
# global ordered prefix scan / sequence packing (LLM training-data op)
# ---------------------------------------------------------------------------

def _pack_map_task(tabs, K: int, id_col: str, count_col: str):
    """Exchange map for pack_sequences: partition tagged rows by their
    range bucket (the partition IS the bucket: K = num_buckets)."""
    tabs = [t for t in tabs if t.num_rows]
    if not tabs:
        return [None] * K
    from .exchange import scatter_by_part

    tab = pa.concat_tables(tabs)
    b = tab["__bkt"].to_numpy(zero_copy_only=False)
    return scatter_by_part(tab, b, K, [id_col, count_col])


def _pack_reduce_task(k: int, slices, id_col: str, count_col: str,
                      offsets: np.ndarray, budget: int):
    """Exchange reduce: in-bucket ordered prefix scan + broadcast bucket
    offset (exact int64, identical rows to the Dataset map_groups)."""
    tabs = [s for s in slices if s is not None and s.num_rows]
    if not tabs:
        return pa.table({id_col: pa.array([], pa.int64()),
                         count_col: pa.array([], pa.int64()),
                         "start_tok": pa.array([], pa.int64()),
                         "seq_id": pa.array([], pa.int64())})
    tab = pa.concat_tables(tabs)
    ids = tab[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    n = tab[count_col].to_numpy(zero_copy_only=False).astype(
        np.int64)[order]
    start = int(offsets[k]) + np.cumsum(n) - n
    return pa.table({id_col: pa.array(ids, pa.int64()),
                     count_col: pa.array(n, pa.int64()),
                     "start_tok": pa.array(start, pa.int64()),
                     "seq_id": pa.array(start // budget, pa.int64())})


def pack_sequences(ds: rd.Dataset, id_col: str, count_col: str,
                   budget: int, *, num_buckets: int = 64) -> rd.Dataset:
    """Concat-then-chunk sequence packing (GPT-style training-data prep):
    documents are conceptually concatenated in ``id_col`` order and sliced
    into ``budget``-token blocks; each row gets its global starting offset
    and the block id that offset falls in.

    Output columns: (id_col, count_col, ``start_tok``, ``seq_id``) with
    ``start_tok`` = exclusive prefix sum of ``count_col`` over the global
    ``id_col`` order and ``seq_id = start_tok // budget``.

    Distributed-scan shape (no full sort, ONE shuffle):
    1. per-batch (bucket, partial-sum) rows over order-preserving id
       ranges — tiny: <= num_buckets rows per batch to the driver;
    2. driver exclusive scan over the num_buckets totals (O(B) bytes);
    3. in-bucket sort + local cumsum + broadcast bucket offset — ONE
       `exchange.exchange` raw-task round by default (partition = range
       bucket; Dataset ``groupby(bucket).map_groups`` twin behind
       ``RAYLINK_PACK_EXCHANGE=dataset``). Skewed ids only imbalance
       bucket sizes, never correctness.
    """
    ds = ds.select_columns([id_col, count_col])

    def mm(batch: pa.Table) -> pa.Table:
        c = batch[id_col]
        return pa.table({"lo": [pc.min(c).as_py()], "hi": [pc.max(c).as_py()]})

    mm_rows = ds.map_batches(mm, batch_format="pyarrow").take_all()
    if not mm_rows:
        return ds.map_batches(
            lambda b: pa.table({id_col: pa.array([], pa.int64()),
                                count_col: pa.array([], pa.int64()),
                                "start_tok": pa.array([], pa.int64()),
                                "seq_id": pa.array([], pa.int64())}),
            batch_format="pyarrow")
    lo = min(r["lo"] for r in mm_rows)
    hi = max(r["hi"] for r in mm_rows)
    span = max(hi - lo + 1, 1)
    nb = int(num_buckets)

    def bucket_of(ids: np.ndarray) -> np.ndarray:
        return ((ids.astype(np.int64) - lo) * nb // span).clip(0, nb - 1)

    def tag(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch[id_col].to_numpy(zero_copy_only=False))
        return batch.append_column("__bkt", pa.array(b, pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    def partial(batch: pa.Table) -> pa.Table:
        b = batch["__bkt"].to_numpy(zero_copy_only=False)
        n = batch[count_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # integer accumulation: float64 bincount weights lose exactness
        # past 2^53 total tokens per bucket, shifting every downstream
        # start_tok/seq_id offset (advisor r2)
        sums = np.zeros(nb, dtype=np.int64)
        np.add.at(sums, b, n)
        return pa.table({"b": pa.array(np.arange(nb, dtype=np.int64)),
                         "s": pa.array(sums, pa.int64())})

    totals = np.zeros(nb, dtype=np.int64)
    for row in tagged.map_batches(partial, batch_format="pyarrow").take_all():
        totals[row["b"]] += row["s"]
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]]).astype(np.int64)

    import os as _os

    if _os.environ.get("RAYLINK_PACK_EXCHANGE", "") != "dataset":
        # bucket scan as ONE raw-task exchange round (same shape as the
        # graph-build / chunk-dedup rewrites); Dataset twin below
        from .exchange import exchange as _exchange

        red = _exchange(tagged.to_arrow_refs(), nb, _pack_map_task,
                        _pack_reduce_task,
                        map_args=(id_col, count_col),
                        reduce_args=(id_col, count_col, offsets,
                                     int(budget)))
        return rd.from_arrow_refs(red)

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        n = g[count_col].to_numpy().astype(np.int64)
        start = int(offsets[int(g["__bkt"].iloc[0])]) + np.cumsum(n) - n
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            count_col: n,
            "start_tok": start,
            "seq_id": start // int(budget),
        })

    return tagged.groupby("__bkt").map_groups(scan, batch_format="pandas")


def global_rank(ds: rd.Dataset, value_col: str, id_col: str, *,
                num_buckets: int = 64, out_col: str = "rank") -> rd.Dataset:
    """Exact global rank (1-based ``row_number() OVER (ORDER BY value,
    id)``) without a full sort: the same distributed-scan shape as
    :func:`pack_sequences` —

    1. order-preserving uniform VALUE buckets (equal values co-bucket, so
       the (value, id) tie-break stays local);
    2. per-bucket counts -> O(B) driver exclusive scan;
    3. one bucket shuffle, per-bucket vectorized lexsort + offset.

    Skewed value distributions imbalance bucket sizes (perf), never
    correctness. Feature-engineering use: percentile/rank transforms over
    a corpus-sized column with no all-to-all sort."""
    ds = ds.select_columns([id_col, value_col])

    def mm(batch: pa.Table) -> pa.Table:
        c = batch[value_col]
        return pa.table({"lo": [pc.min(c).as_py()],
                         "hi": [pc.max(c).as_py()]})

    mm_rows = ds.map_batches(mm, batch_format="pyarrow").take_all()
    if not mm_rows:
        return ds.map_batches(
            lambda b: pa.table({id_col: pa.array([], pa.int64()),
                                value_col: pa.array([], pa.float64()),
                                out_col: pa.array([], pa.int64())}),
            batch_format="pyarrow")
    lo = min(float(r["lo"]) for r in mm_rows)
    hi = max(float(r["hi"]) for r in mm_rows)
    span = (hi - lo) or 1.0
    nb = int(num_buckets)

    def tag(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        b = np.clip(((v - lo) / span * nb).astype(np.int64), 0, nb - 1)
        return batch.append_column("__bkt", pa.array(b, pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    def partial(batch: pa.Table) -> pa.Table:
        b = batch["__bkt"].to_numpy(zero_copy_only=False)
        return pa.table({"b": pa.array(np.arange(nb, dtype=np.int64)),
                         "c": pa.array(np.bincount(b, minlength=nb)
                                       .astype(np.int64), pa.int64())})

    counts = np.zeros(nb, dtype=np.int64)
    for row in tagged.map_batches(partial, batch_format="pyarrow").take_all():
        counts[row["b"]] += row["c"]
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g[id_col].to_numpy(), g[value_col].to_numpy()))
        g = g.iloc[order]
        base = int(offsets[int(g["__bkt"].iloc[0])])
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            value_col: g[value_col].to_numpy(),
            out_col: base + 1 + np.arange(len(g), dtype=np.int64),
        })

    return tagged.groupby("__bkt").map_groups(rank_bucket,
                                              batch_format="pandas")


def weighted_resample(ds: rd.Dataset, key_col: str, group_col: str,
                      weights: dict[str, float], *, default: float = 1.0,
                      out_col: str = "copy") -> rd.Dataset:
    """Deterministic weighted corpus resampling (training-mix shape: "use
    source A at 2.5x, source B at 0.25x"): every row is emitted
    floor(w) times plus one more when md5(key)'s first 4 hex digits fall
    below frac(w) of the 65536-grid — a pure function of (key, group), so
    any partitioning/cluster reproduces the same multiset (same md5 grid
    discipline as :func:`hash_split`). Shuffle-free: one map_batches.

    Output = input columns + ``out_col`` (0-based copy index)."""
    import hashlib

    bases = {g: int(np.floor(w)) for g, w in weights.items()}
    thrs = {g: format(int(np.floor((w - np.floor(w)) * 65536)), "04x")
            for g, w in weights.items()}
    dbase = int(np.floor(default))
    dthr = format(int(np.floor((default - np.floor(default)) * 65536)),
                  "04x")

    def f(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_pylist()
        grps = batch[group_col].to_pylist()
        n = np.empty(len(keys), dtype=np.int64)
        for i, (k, g) in enumerate(zip(keys, grps)):
            h = hashlib.md5(str(k).encode()).hexdigest()[:4]
            n[i] = (bases.get(g, dbase)
                    + (1 if h < thrs.get(g, dthr) else 0))
        take = np.repeat(np.arange(len(keys), dtype=np.int64), n)
        out = batch.take(pa.array(take, pa.int64()))
        starts = np.repeat(np.cumsum(n) - n, n)
        copy = np.arange(len(take), dtype=np.int64) - starts
        return out.append_column(out_col, pa.array(copy, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def funnel(events: rd.Dataset, user_col: str, ts_col: str, type_col: str,
           steps: Sequence[str]) -> rd.Dataset:
    """Sequential funnel depth per user (ordered pattern matching, the
    product-analytics / session-mining shape): depth = length of the
    longest prefix of ``steps`` completable with strictly increasing
    timestamps. Greedy earliest-match per step is provably optimal for
    subsequence existence, so the result is exact and deterministic.

    Scale shape: rows are pre-filtered to the step types BEFORE the one
    groupby(user) shuffle (map-side combiner keeps only per-(user, step)
    candidate timestamps); per-group work is a vectorized searchsorted
    chain. Every user keeps a row (depth 0 included)."""
    step_list = list(steps)
    step_set = set(step_list)

    def prefilter(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[type_col],
                        value_set=pa.array(sorted(step_set)))
        kept = batch.filter(mask)
        return pa.table({
            user_col: kept[user_col].cast(pa.int64()),
            "t": kept[ts_col],
            "s": kept[type_col],
        })

    # all users (depth-0 rows come from here, no outer join needed)
    def users(batch: pa.Table) -> pa.Table:
        import pandas as _pd

        u = np.unique(batch[user_col].to_numpy(zero_copy_only=False))
        return pa.table({user_col: pa.array(u.astype(np.int64)),
                         "t": pa.nulls(len(u), batch[ts_col].type),
                         "s": pa.array(["\0marker"] * len(u), pa.string())})

    rows = events.select_columns([user_col, ts_col, type_col]).map_batches(
        prefilter, batch_format="pyarrow")
    marks = events.select_columns([user_col, ts_col, type_col]).map_batches(
        users, batch_format="pyarrow")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        uid = np.int64(g[user_col].iloc[0])
        real = g[g["s"] != "\0marker"]
        by_step = {s: np.sort(real.loc[real["s"] == s, "t"].to_numpy())
                   for s in step_list}
        t = None
        depth = 0
        for s in step_list:
            arr = by_step[s]
            pos = 0 if t is None else int(np.searchsorted(arr, t, "right"))
            if pos >= len(arr):
                break
            t = arr[pos]
            depth += 1
        return pd.DataFrame({user_col: [uid],
                             "depth": np.array([depth], np.int64)})

    return rows.union(marks).groupby(user_col).map_groups(
        per_user, batch_format="pandas")


# ---------------------------------------------------------------------------
# grouping-sets / ROLLUP aggregate (§2.8 grouped stats, subtotal family)
# ---------------------------------------------------------------------------

def grouping_sets_sum(ds: rd.Dataset, group_cols: list[str],
                      sets: list[tuple[str, ...]], value_col: str,
                      out_col: str = "total") -> rd.Dataset:
    """SUM at arbitrary GROUPING SETS over ``group_cols`` — the SQL
    ``GROUP BY GROUPING SETS ((a,b), (a), ())`` shape (reference parity:
    the per-section grouped stats re-aggregated to per-record and global
    summaries, peak_detect_v4.py:1571-1659 -> support.py:328-329).
    ROLLUP and CUBE are the prefix / power-set instances (see
    :func:`rollup_sum` / :func:`cube_sum`).

    Scale shape: exactly ONE shuffle over the raw data — a per-batch
    partial pre-aggregation on the finest key set feeds one distributed
    ``groupby(group_cols)``; every requested set is derived by
    re-aggregating the (already tiny, one row per distinct key combo)
    finest aggregate, so subtotals never touch the raw table again.
    ``value_col`` must be integer (int64 fixed-point upstream) so sums are
    exact and order-free at any parallelism."""
    from ray.data.aggregate import Sum

    if not group_cols:
        raise ValueError("grouping_sets_sum needs at least one group column")
    norm_sets = []
    for s in sets:
        s = tuple(s)
        if any(c not in group_cols for c in s):
            raise ValueError(f"grouping set {s} not within {group_cols}")
        norm_sets.append(s)
    if not norm_sets:
        raise ValueError("grouping_sets_sum needs at least one set")

    # capture the group-key arrow types for typed nulls in coarser levels
    key_types = {f.name: f.type for f in ds.schema().base_schema
                 if f.name in group_cols}

    def partial(batch: pa.Table) -> pa.Table:
        # Arrow group-by-hash (null keys form their own group, matching
        # SQL GROUP BY) — zero-copy, no pandas round-trip (round 4)
        agg = (batch.select(group_cols + [value_col])
               .group_by(group_cols).aggregate([(value_col, "sum")]))
        return (agg.select(group_cols + [value_col + "_sum"])
                .rename_columns(group_cols + [out_col]))

    finest = (ds.select_columns(group_cols + [value_col])
              .map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby(group_cols)
              .aggregate(Sum(out_col, alias_name=out_col))
              .materialize())

    levels = []
    for s in norm_sets:
        keep = [c for c in group_cols if c in s]  # canonical column order
        nulled = tuple(c for c in group_cols if c not in s)

        def add_nulls(batch: pa.Table, nulled=nulled) -> pa.Table:
            cols = {}
            for c in group_cols:
                if c in nulled:
                    cols[c] = pa.nulls(len(batch), key_types[c])
                else:
                    cols[c] = batch[c]
            cols[out_col] = batch[out_col]
            return pa.table(cols)

        if len(keep) == len(group_cols):
            levels.append(finest)
            continue
        if keep:
            lvl = finest.groupby(keep).aggregate(
                Sum(out_col, alias_name=out_col))
        else:
            total = 0
            for b in finest.select_columns([out_col]).iter_batches(
                    batch_format="pyarrow"):
                total += int(pc.sum(b[out_col]).as_py() or 0)
            lvl = rd.from_arrow(pa.table({out_col: pa.array([total],
                                                            pa.int64())}))
        levels.append(lvl.map_batches(add_nulls, batch_format="pyarrow"))

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)
    return out


def rollup_sum(ds: rd.Dataset, group_cols: list[str], value_col: str,
               out_col: str = "total") -> rd.Dataset:
    """``GROUP BY ROLLUP(a, b, ...)``: every key prefix plus the grand
    total. One raw-data shuffle (see :func:`grouping_sets_sum`)."""
    sets = [tuple(group_cols[:j]) for j in range(len(group_cols), -1, -1)]
    return grouping_sets_sum(ds, group_cols, sets, value_col, out_col)


def cube_sum(ds: rd.Dataset, group_cols: list[str], value_col: str,
             out_col: str = "total") -> rd.Dataset:
    """``GROUP BY CUBE(a, b, ...)``: every subset of the keys. One
    raw-data shuffle (see :func:`grouping_sets_sum`); 2^k derived levels,
    each re-aggregated from the finest result."""
    from itertools import combinations

    sets: list[tuple[str, ...]] = []
    for r in range(len(group_cols), -1, -1):
        sets.extend(combinations(group_cols, r))
    return grouping_sets_sum(ds, group_cols, sets, value_col, out_col)


# ---------------------------------------------------------------------------
# fuzzy broadcast lookup (§2.7 channel fuzzy lookup analog)
# ---------------------------------------------------------------------------

def _levenshtein_matrix(values: np.ndarray, lengths: np.ndarray,
                        cand: str) -> np.ndarray:
    """Edit distance from every row of a padded uint8 char matrix to one
    candidate string, vectorized across rows (DP loops run over the two
    *string lengths* only — N-row work is numpy)."""
    n, width = values.shape
    m = len(cand)
    cb = np.frombuffer(cand.encode("utf-8"), dtype=np.uint8)
    if len(cb) != m:  # non-ascii candidate: fall back to code points
        cb = np.array([ord(ch) for ch in cand], dtype=np.uint32)
    prev = np.tile(np.arange(width + 1, dtype=np.int64), (n, 1))
    cur = np.empty_like(prev)
    for i in range(1, m + 1):
        cur[:, 0] = i
        ci = cb[i - 1]
        sub_cost = (values != ci).astype(np.int64)  # (n, width)
        for j in range(1, width + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + sub_cost[:, j - 1])
        prev, cur = cur, prev
    return prev[np.arange(n), lengths]


def fuzzy_lookup(ds: rd.Dataset, col: str, candidates: list[str],
                 *, match_col: str = "best_match",
                 dist_col: str = "dist") -> rd.Dataset:
    """Nearest-candidate Levenshtein lookup against a tiny broadcast list
    (reference parity: fuzzy channel-name resolution,
    porcine/pig_extract.py:1425-1532). Ties break on the lexicographically
    smallest candidate, matching a ``row_number() OVER (ORDER BY dist, c)``
    SQL twin.

    Scale shape: the candidate list rides the task closure (broadcast
    small side, §2.7); per batch the DP is vectorized across rows and only
    computed once per *distinct* value (dictionary-encode first), so the
    hot loop is O(|cand| x len^2) numpy passes, not per-row Python."""
    cands = sorted(candidates)
    if not cands:
        raise ValueError("fuzzy_lookup needs at least one candidate")

    def f(batch: pa.Table) -> pa.Table:
        col_arr = batch[col].combine_chunks()
        enc = pc.dictionary_encode(col_arr)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        uniq = enc.dictionary.to_pylist()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        if len(uniq) == 0:
            out = batch.append_column(match_col, pa.array([], pa.string()))
            return out.append_column(dist_col, pa.array([], pa.int64()))
        bs = [(u or "").encode("utf-8") for u in uniq]
        # non-ascii values: fall back to code-point arrays for exactness
        if any(len(b) != len(u or "") for b, u in zip(bs, uniq)):
            lens = np.array([len(u or "") for u in uniq], np.int64)
            width = max(1, int(lens.max()))
            mat = np.zeros((len(uniq), width), np.uint32)
            for r, u in enumerate(uniq):
                for q, ch in enumerate(u or ""):
                    mat[r, q] = ord(ch)
        else:
            lens = np.array([len(b) for b in bs], np.int64)
            width = max(1, int(lens.max()))
            mat = np.zeros((len(bs), width), np.uint8)
            for r, b in enumerate(bs):
                mat[r, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        best_d = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        best_i = np.zeros(len(uniq), np.int64)
        for idx, cand in enumerate(cands):
            d = _levenshtein_matrix(mat, lens, cand)
            better = d < best_d  # cands sorted asc -> first win = tie rule
            best_d = np.where(better, d, best_d)
            best_i = np.where(better, idx, best_i)
        cand_arr = np.array(cands, dtype=object)
        out = batch.append_column(
            match_col, pa.array(cand_arr[best_i[codes]], pa.string()))
        return out.append_column(
            dist_col, pa.array(best_d[codes], pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# per-group running total (ordered window aggregate, §2.10)
# ---------------------------------------------------------------------------

def running_total(ds: rd.Dataset, part_col: str, order_cols: list[str],
                  value_col: str, out_col: str = "running") -> rd.Dataset:
    """Cumulative SUM per partition in ``order_cols`` order — the SQL
    ``SUM(v) OVER (PARTITION BY p ORDER BY o ROWS UNBOUNDED PRECEDING)``
    window shape (reference parity: the carried per-section accumulators of
    the ordered extraction loop, peak_detect_v4.py:1664-1671, re-expressed
    as an order-explicit grouped scan).

    ``value_col`` must be integer (fixed-point upstream): int64 cumsum is
    exact and independent of partition placement. One groupby shuffle;
    per-group work is a vectorized sort + cumsum (groups = one key's rows,
    the same partitioning assumption as sessionize/lag)."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        vals = g[value_col].to_numpy()
        if not np.issubdtype(vals.dtype, np.integer):
            raise TypeError(
                f"running_total needs an integer value column, got "
                f"{vals.dtype}: convert to fixed-point first")
        g = g.copy()
        g[out_col] = np.cumsum(vals.astype(np.int64))
        return g

    return ds.groupby(part_col).map_groups(f, batch_format="pandas")


def grouped_rank(ds: rd.Dataset, group_col: str, value_col: str, *,
                 descending: bool = True, out_col: str = "rank") -> rd.Dataset:
    """SQL ``RANK() OVER (PARTITION BY g ORDER BY v [DESC])``: ties share
    the min rank, gaps follow (pandas method="min"). Complements
    ``global_rank`` (whole-table value-bucket scan) with the per-partition
    window shape; one groupby shuffle, vectorized per-group rank."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g[out_col] = g[value_col].rank(
            method="min", ascending=not descending).astype(np.int64)
        return g

    return ds.groupby(group_col).map_groups(f, batch_format="pandas")


def grouped_entropy(ds: rd.Dataset, group_col: str, value_col: str, *,
                    out_col: str = "entropy_fp") -> rd.Dataset:
    """Shannon entropy of each group's value distribution, in 1e-6
    fixed-point nats: H = ln(n) - (sum c_i*ln(c_i))/n over the value
    counts c_i (the category-diversity / data-mix-balance signal).

    Scale shape: per-batch (group, value) pre-count is the map-side
    combiner; one ``groupby([group, value])`` reduces to distinct pair
    counts; the per-group combine sums floor(c*ln(c)*1e9 + 0.5) as int64
    — per-term fixed point, so the reduction is order-free and the SQL
    twin (same expression) matches exactly; only the final two-scalar
    formula runs in floats, from identical integer inputs on both sides."""
    from ray.data.aggregate import Sum

    def pair_counts(batch: pa.Table) -> pa.Table:
        # Arrow group-by-hash count (null keys kept) — no pandas (round 4)
        agg = (batch.select([group_col, value_col])
               .group_by([group_col, value_col])
               .aggregate([([], "count_all")]))
        return (agg.select([group_col, value_col, "count_all"])
                .rename_columns([group_col, value_col, "c"]))

    pairs = (ds.select_columns([group_col, value_col])
             .map_batches(pair_counts, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby([group_col, value_col])
             .aggregate(Sum("c", alias_name="c")))

    def partial(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.floor(c * np.log(c) * 1e9 + 0.5).astype(np.int64)
        return pa.table({group_col: batch[group_col],
                         "n": batch["c"],
                         "s": pa.array(s, pa.int64())})

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch["s"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = np.log(n) - (s / 1e9) / n
        return pa.table({
            group_col: batch[group_col],
            "n_rows": batch["n"].cast(pa.int64()),
            out_col: pa.array(np.floor(h * 1e6 + 0.5).astype(np.int64),
                              pa.int64()),
        })

    agg = (pairs.map_batches(partial, batch_format="pyarrow")
           .groupby(group_col)
           .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s")))
    return agg.map_batches(finish, batch_format="pyarrow")


def cooccurrence(ds: rd.Dataset, group_col: str, item_col: str, *,
                 min_count: int = 1) -> rd.Dataset:
    """Pairwise item co-occurrence counts: for every unordered item pair
    (a < b), in how many groups do both appear — the market-basket /
    association-mining shape (and the PMI numerator of corpus statistics).

    Scale shape: per-batch distinct (group, item) is the map-side
    combiner; one ``groupby(group)`` co-locates each group's distinct
    items (bounded by the item-vocabulary size, NOT the group's row
    count); per-group pair expansion is a vectorized triangular index;
    the final pair count is a second groupby over (a, b) rows whose
    volume is sum C(k_g, 2) <= groups * C(|vocab|, 2)."""
    from ray.data.aggregate import Sum

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        # Arrow group-by distinct — no pandas round-trip (round 4)
        return (batch.select([group_col, item_col])
                .group_by([group_col, item_col]).aggregate([]))

    per_group = (ds.select_columns([group_col, item_col])
                 .map_batches(distinct_pairs, batch_format="pyarrow",
                              zero_copy_batch=True)
                 .groupby(group_col))

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        items = np.unique(g[item_col].to_numpy())
        k = len(items)
        if k < 2:
            return pd.DataFrame({"a": items[:0], "b": items[:0],
                                 "n": np.array([], np.int64)})
        iu = np.triu_indices(k, 1)
        return pd.DataFrame({"a": items[iu[0]], "b": items[iu[1]],
                             "n": np.ones(len(iu[0]), np.int64)})

    pairs = per_group.map_groups(expand, batch_format="pandas")
    agg = pairs.groupby(["a", "b"]).aggregate(Sum("n", alias_name="n"))
    if min_count > 1:
        agg = agg.map_batches(
            lambda b: b.filter(pc.greater_equal(b["n"],
                                                pa.scalar(min_count))),
            batch_format="pyarrow")
    return agg


def cooccurrence_pmi(ds: rd.Dataset, group_col: str, item_col: str, *,
                     min_count: int = 1) -> rd.Dataset:
    """Co-occurrence pairs scored by pointwise mutual information:
    PMI(a,b) = ln(n_ab * N / (n_a * n_b)) over group-level presence
    counts (N = total groups, n_x = groups containing x) — the
    association-strength signal on top of :func:`cooccurrence`.

    The per-item counts and N are tiny aggregates (bounded by the item
    vocabulary); they attach to the pair table via an in-task broadcast
    dict. All inputs to the float formula are exact integers, and the
    expression is mirrored verbatim by the SQL twin, so fixed-point
    output matches bit-for-bit."""
    pairs = cooccurrence(ds, group_col, item_col, min_count=min_count)

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        # Arrow group-by distinct — no pandas round-trip (round 4)
        return (batch.select([group_col, item_col])
                .group_by([group_col, item_col]).aggregate([]))

    gi = (ds.select_columns([group_col, item_col])
          .map_batches(distinct_pairs, batch_format="pyarrow",
                       zero_copy_batch=True)
          .groupby(group_col).map_groups(
              lambda g: g.drop_duplicates(), batch_format="pandas")
          .materialize())
    # per-item presence counts: a vocabulary-sized aggregate (broadcast
    # small side); distinct-group total: a distributed count, scalar only
    item_counts = {r[item_col]: int(r["count()"])
                   for b in gi.groupby(item_col).count().iter_batches(
                       batch_format="pyarrow") for r in b.to_pylist()}
    n_groups = gi.groupby(group_col).count().count()

    def score(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_pylist()
        bb = batch["b"].to_pylist()
        n_ab = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = np.array([item_counts[x] for x in a], np.float64)
        nb = np.array([item_counts[x] for x in bb], np.float64)
        pmi = np.log(n_ab * float(n_groups) / (na * nb))
        return pa.table({
            "a": batch["a"], "b": batch["b"], "n": batch["n"],
            "pmi_fp": pa.array(np.floor(pmi * 1e6 + 0.5).astype(np.int64),
                               pa.int64()),
        })

    return pairs.map_batches(score, batch_format="pyarrow")


def sliding_count(events: rd.Dataset, part_col: str, ts_col: str, *,
                  window_us: int, id_col: str = "event_id",
                  out_col: str = "n_window") -> rd.Dataset:
    """Per-row count of same-partition rows in the trailing time window
    [ts - window, ts] — the SQL ``COUNT(*) OVER (... ORDER BY ts RANGE
    BETWEEN <window> PRECEDING AND CURRENT ROW)`` value-based frame (rate
    limiting / burst detection). Value-based on BOTH ends (all ts ties
    count), so the result is row-order independent. One groupby shuffle;
    per group two vectorized searchsorted passes."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        order = np.argsort(ts, kind="mergesort")
        srt = ts[order]
        hi = np.searchsorted(srt, ts, side="right")
        lo = np.searchsorted(srt, ts - np.int64(window_us), side="left")
        g = g.copy()
        g[out_col] = (hi - lo).astype(np.int64)
        return g

    return (events.select_columns([part_col, ts_col, id_col])
            .groupby(part_col)
            .map_groups(f, batch_format="pandas"))


def grouped_mad(ds: rd.Dataset, group_col: str, value_col: str, *,
                out_col: str = "mad_x4") -> rd.Dataset:
    """Median absolute deviation per group, exactly: ``value_col`` must be
    integer (fixed-point upstream), so the continuous median lies on the
    1/2 grid, absolute deviations on the 1/2 grid, and their median on the
    1/4 grid — the output is 4x the MAD as an exact int64, mirroring the
    SQL ``CAST(4*mad(x) AS BIGINT)`` twin with no float drift. One groupby
    shuffle; per-group numpy medians."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        vals = g[value_col].to_numpy()
        if not np.issubdtype(vals.dtype, np.integer):
            raise TypeError("grouped_mad needs an integer value column: "
                            "convert to fixed-point first")
        med = np.median(vals)  # exact on the .5 grid
        mad = np.median(np.abs(vals - med))
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             out_col: np.array([int(round(mad * 4))],
                                               np.int64)})

    return ds.groupby(group_col).map_groups(f, batch_format="pandas")


def grouped_percent_rank(ds: rd.Dataset, group_col: str, value_col: str, *,
                         out_col: str = "prank_fp") -> rd.Dataset:
    """SQL ``percent_rank() OVER (PARTITION BY g ORDER BY v)`` in 1e-6
    fixed point: (rank-1)/(n-1) from exact integer rank and count (0 for
    single-row groups), so the float division matches the SQL twin
    bit-for-bit. One groupby shuffle, vectorized per-group rank."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        r = g[value_col].rank(method="min", ascending=True).to_numpy()
        n = len(g)
        pr = (r - 1.0) / (n - 1.0) if n > 1 else np.zeros(n)
        g[out_col] = np.floor(pr * 1e6 + 0.5).astype(np.int64)
        return g

    return ds.groupby(group_col).map_groups(f, batch_format="pandas")


def resample_regrid(ds: rd.Dataset, key_col: str, t_col: str, v_col: str, *,
                    step: int, scale: float = 1000.0) -> rd.Dataset:
    """Per-key index re-grid + linear interpolation — the clock-drift
    resample/correction shape (reference parity: lib_ebm/tools.py:105-195,
    lib_ebm/correct_rpeak.py:51-102 re-grid each ECG block onto a
    corrected sample index and interpolate; here per-key event series onto
    a global regular lattice).

    Semantics (exactly mirrored by the SQL oracle, integer lattice):
    timestamps become int64 microseconds ``t``; values become fixed-point
    ``vf = floor(v*scale + 0.5)``; duplicate (key, t) samples collapse to
    ``max(vf)``.  Grid points are the multiples of ``step`` inside
    [min(t), max(t)] per key (epoch-aligned — a shared clock across keys,
    not per-key phase).  Interpolation between the bracketing samples is
    exact integer arithmetic::

        v_fp = (vf_lo*(t_hi - tg) + vf_hi*(tg - t_lo)) // (t_hi - t_lo)

    with ``v_fp = vf`` when the grid point hits a sample.  Requires
    ``vf >= 0`` (raises otherwise: DuckDB's ``//`` truncates toward zero
    while numpy floors — identical only for non-negative numerators) and
    guards the int64 product ``max(vf) * max_gap`` against overflow.

    Shape: one groupby(key) shuffle, vectorized searchsorted per group —
    no driver state, no per-row Python. Keys with a single sample emit
    only grid points that coincide with it."""
    step = int(step)
    if step <= 0:
        raise ValueError("step must be a positive integer (microseconds)")

    def regrid(g: pd.DataFrame) -> pd.DataFrame:
        key = g[key_col].iloc[0]
        tv = g[t_col]
        if str(tv.dtype).startswith("datetime64"):
            # normalize to int64 MICROSECONDS whatever the pandas unit
            t = tv.to_numpy().astype("datetime64[us]").astype(np.int64)
        else:
            t = tv.to_numpy().astype(np.int64)
        vf = np.floor(g[v_col].to_numpy(dtype=np.float64) * scale
                      + 0.5).astype(np.int64)
        if len(vf) and vf.min() < 0:
            raise ValueError("resample_regrid requires non-negative "
                             "fixed-point values (got negative)")
        order = np.lexsort((vf, t))
        t, vf = t[order], vf[order]
        last = np.r_[t[1:] != t[:-1], True]  # max(vf) per duplicate t
        t, vf = t[last], vf[last]
        lo = -(-t[0] // step) * step
        hi = t[-1] // step * step
        empty = pd.DataFrame({key_col: pd.Series([], dtype=g[key_col].dtype),
                              "t_grid": pd.Series([], dtype=np.int64),
                              "v_fp": pd.Series([], dtype=np.int64)})
        if hi < lo:
            return empty
        tg = np.arange(lo, hi + 1, step, dtype=np.int64)
        j = np.searchsorted(t, tg, side="left")    # first t >= tg
        jr = np.searchsorted(t, tg, side="right")  # last t <= tg is jr-1
        thi, vhi = t[j], vf[j]
        tlo, vlo = t[jr - 1], vf[jr - 1]
        gap = thi - tlo
        if len(gap) and int(vf.max()) * int(gap.max() or 1) >= (1 << 62):
            raise OverflowError("resample_regrid interpolation product "
                                "would overflow int64; lower scale")
        exact = gap == 0
        den = np.where(exact, 1, gap)
        num = vlo * (thi - tg) + vhi * (tg - tlo)
        out = np.where(exact, vlo, np.floor_divide(num, den))
        return pd.DataFrame({key_col: np.repeat(key, len(tg)),
                             "t_grid": tg, "v_fp": out.astype(np.int64)})

    return (ds.select_columns([key_col, t_col, v_col])
            .groupby(key_col).map_groups(regrid, batch_format="pandas"))


def _mp_overflow_check(v: np.ndarray, n: int, m: int) -> None:
    """Exactness guard for the integer matrix-profile lattice. Two bounds
    (r4 advisor fix — the old max^2*max(n,m) bound missed the products):
    cumsums of v^2 / v_i*v_j grow as max^2 * n, while the correlation
    numerator terms m*QT and S_i*S_j grow as (max * m)^2."""
    if not n:
        return
    amax = int(np.abs(v).max())
    if amax * amax * n >= (1 << 62) or (amax * m) ** 2 >= (1 << 62):
        raise OverflowError("matrix profile fixed-point values too large "
                            "for exact int64 window sums; lower scale")


def _mp_best_corr(v: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Self-join matrix profile over one fixed-point int series ``v``:
    for every window start i, the BEST z-normalized correlation to any
    non-overlapping window (|j - i| >= m) — max corr == nearest-neighbor
    z-distance, the stumpy.stump discord primitive
    (porcine/stumpy_discord.py:204-238, peak_detect_v4.py:251 analog).

    Exactness discipline (same as the Katz/entropy lattices): window sums
    S = sum(v), Q = sum(v^2) and diagonal products QT = sum(v_i v_j) are
    EXACT int64 (order-independent), and the only float step is the one
    mirrored expression

        corr = (m*QT - S_i*S_j) / (sqrt(m*Q_i - S_i^2) * sqrt(m*Q_j - S_j^2))

    whose inputs are identical integers in numpy and SQL — IEEE division/
    sqrt are correctly rounded, so fixed-point floors match bit-for-bit.
    Windows with zero variance (m*Q - S^2 <= 0, an integer test) pair with
    nobody. Returns (best corr float64, has_valid_partner) per window;
    O(n) vectorized work per diagonal, O(n^2/2) total."""
    n = len(v)
    nw = n - m + 1
    if nw < 1 or n < 2 * m:
        return np.zeros(0), np.zeros(0, bool)
    _mp_overflow_check(v, n, m)
    cs = np.concatenate([[0], np.cumsum(v, dtype=np.int64)])
    cq = np.concatenate([[0], np.cumsum(v * v, dtype=np.int64)])
    S = cs[m:] - cs[:-m]          # (nw,)
    Q = cq[m:] - cq[:-m]
    var = m * Q - S * S           # exact integer variance test
    valid = var > 0
    sig = np.sqrt(var.astype(np.float64))
    best = np.full(nw, -np.inf)
    has = np.zeros(nw, bool)
    for d in range(m, nw):
        p = v[:n - d] * v[d:]
        cp = np.concatenate([[0], np.cumsum(p, dtype=np.int64)])
        nq = len(p) - m + 1       # windows on this diagonal
        if nq < 1:
            break
        QT = cp[m:] - cp[:-m]     # QT(i, i+d), i in [0, nq)
        i = np.arange(nq)
        j = i + d
        ok = valid[i] & valid[j]
        if not ok.any():
            continue
        corr = np.where(
            ok,
            (m * QT - S[i] * S[j]).astype(np.float64) / (sig[i] * sig[j]),
            -np.inf)
        np.maximum.at(best, i, corr)
        np.maximum.at(best, j, corr)
        has[i[ok]] = True
        has[j[ok]] = True
    return best, has


def series_discords(ds: rd.Dataset, key_col: str, v_col: str,
                    order_cols: list[str], *, m: int = 8, k: int = 10,
                    scale: float = 100.0) -> rd.Dataset:
    """Top-k DISCORDS across per-key series: the k windows whose
    z-normalized nearest-neighbor correlation is SMALLEST (largest NN
    distance — stumpy discord semantics). One groupby(key) shuffle, the
    exact integer-lattice matrix profile per group, then a tiny global
    sort+limit. Output (key, pos, mp_corr_fp) with pos the window start
    in (order_cols) order and mp_corr_fp = floor(best_corr*1e9 + 0.5).

    For ONE ultra-long series use :func:`matrix_profile_discords_single`
    (halo-sharded actor tasks over a broadcast series)."""

    def f(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        v = np.floor(g[v_col].to_numpy(dtype=np.float64) * scale
                     + 0.5).astype(np.int64)
        best, has = _mp_best_corr(v, m)
        keep = np.flatnonzero(has)
        return pd.DataFrame({
            key_col: np.repeat(g[key_col].iloc[0], len(keep)),
            "pos": keep.astype(np.int64),
            "mp_corr_fp": np.floor(best[keep] * 1e9 + 0.5).astype(np.int64),
        })

    prof = ds.groupby(key_col).map_groups(f, batch_format="pandas")
    return prof.sort(["mp_corr_fp", key_col, "pos"]).limit(k)


def matrix_profile_discords_single(
        values: np.ndarray, *, m: int, k: int = 10,
        n_shards: int = 32) -> "pa.Table":
    """Halo-sharded discord search over ONE long series (SURVEY §2.6
    mapping of the stumpy self-join): the fixed-point series is broadcast
    once (``ray.put``), each shard task computes the exact integer-lattice
    best-corr for its query range against the WHOLE series (the diagonal
    recurrence restricted to rows intersecting the shard), and per-shard
    top-k rows reduce to a global top-k. Same arithmetic as
    :func:`_mp_best_corr` — a pytest asserts bit-equality."""
    import ray

    v = np.asarray(values, dtype=np.int64)
    n = len(v)
    nw = n - m + 1
    if nw < 1 or n < 2 * m:
        return pa.table({"pos": pa.array([], pa.int64()),
                         "mp_corr_fp": pa.array([], pa.int64())})
    _mp_overflow_check(v, n, m)
    v_ref = ray.put(v)

    @ray.remote
    def shard_best(lo: int, hi: int):
        vv = ray.get(v_ref)
        nn = len(vv)
        cs = np.concatenate([[0], np.cumsum(vv, dtype=np.int64)])
        cq = np.concatenate([[0], np.cumsum(vv * vv, dtype=np.int64)])
        S = cs[m:] - cs[:-m]
        Q = cq[m:] - cq[:-m]
        var = m * Q - S * S
        valid = var > 0
        sig = np.sqrt(var.astype(np.float64))
        n_w = nn - m + 1
        best = np.full(hi - lo, -np.inf)
        has = np.zeros(hi - lo, bool)
        for d in range(m, n_w):
            # rows i of this diagonal with i in [lo,hi) OR i+d in [lo,hi)
            nq = nn - d - m + 1
            if nq < 1:
                break
            for a, b, qside in (
                    (max(lo, 0), min(hi, nq), 0),          # i in shard
                    (max(lo - d, 0), min(hi - d, nq), 1)):  # j in shard
                if a >= b:
                    continue
                i = np.arange(a, b)
                j = i + d
                ok = valid[i] & valid[j]
                if not ok.any():
                    continue
                p = vv[i[0]:i[-1] + m] * vv[j[0]:j[-1] + m]
                cp = np.concatenate([[0], np.cumsum(p, dtype=np.int64)])
                QT = cp[m:m + len(i)] - cp[:len(i)]
                corr = np.where(
                    ok,
                    (m * QT - S[i] * S[j]).astype(np.float64)
                    / (sig[i] * sig[j]),
                    -np.inf)
                tgt = (i if qside == 0 else j) - lo
                np.maximum.at(best, tgt, corr)
                has[tgt[ok]] = True
        keep = np.flatnonzero(has)
        return (keep + lo).astype(np.int64), best[keep]

    bounds = np.linspace(0, nw, n_shards + 1).astype(int)
    outs = ray.get([shard_best.remote(int(a), int(b))
                    for a, b in zip(bounds[:-1], bounds[1:]) if b > a])
    pos = np.concatenate([o[0] for o in outs]) if outs else np.array([], np.int64)
    best = np.concatenate([o[1] for o in outs]) if outs else np.array([])
    fp = np.floor(best * 1e9 + 0.5).astype(np.int64)
    order = np.lexsort((pos, fp))[:k]
    return pa.table({"pos": pa.array(pos[order], pa.int64()),
                     "mp_corr_fp": pa.array(fp[order], pa.int64())})
