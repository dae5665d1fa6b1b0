"""Generic, reusable Ray Data operators.

These are the engine's relational building blocks, used both by the
image-dedup pipeline (SURVEY.md §2: A1-A7, J3, S5 semantics) and by the
SQL-checkable query surface in ``__ray_entry__``. All operate on lazy
``ray.data.Dataset``s and keep execution streaming.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def available_cpus(default: int = 4) -> int:
    try:
        return max(1, int(ray.cluster_resources().get("CPU", default)))
    except Exception:
        return default


# ---------------------------------------------------------------------------
# joins


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str | list[str],
    how: str = "inner",
    suffix: str = "_r",
) -> rd.Dataset:
    """Distributed hash join via a single co-grouping shuffle.

    Both sides are tagged, unioned, and co-grouped on the key; each
    group joins locally with pandas. One all-to-all exchange, no
    driver materialization — the portable pattern recommended for Ray
    Data versions without a native ``Dataset.join``. Skewed keys cost
    one oversized group; callers with a known-small side should prefer
    ``broadcast_semi_join`` / ``broadcast_lookup`` instead (A6 analog,
    app/Commands.java:290-299).
    """
    keys = [on] if isinstance(on, str) else list(on)
    lschema, rschema = left.schema(), right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    lcols = list(lschema.names)
    overlap = (set(lcols) & set(rschema.names)) - set(keys)
    rname = {c: (c + suffix if c in overlap else c) for c in rschema.names}
    rcols = [rname[c] for c in rschema.names]
    rtypes = {rname[c]: t for c, t in rtypes.items()}
    # unified schema: left cols, then right-only cols, then the side tag
    all_cols = lcols + [c for c in rcols if c not in lcols]
    all_types = {**rtypes, **ltypes}

    def _pad(side: int, renames: dict[str, str] | None):
        def fn(t: pa.Table) -> pa.Table:
            if renames:
                t = t.rename_columns([renames[c] for c in t.column_names])
            cols = {c: t[c] if c in t.column_names else pa.nulls(len(t), all_types[c]) for c in all_cols}
            cols["__side"] = pa.array(np.full(len(t), side, dtype=np.int8))
            return pa.table(cols)

        return fn

    tagged = left.map_batches(_pad(0, None), batch_format="pyarrow").union(
        right.map_batches(_pad(1, rname), batch_format="pyarrow")
    )

    def _merge(t: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        lg = t.filter(pc.equal(t["__side"], 0)).select(lcols).to_pandas()
        rg = t.filter(pc.equal(t["__side"], 1)).select(rcols).to_pandas()
        return lg.merge(rg, on=keys, how=how)

    return tagged.groupby(keys).map_groups(_merge, batch_format="pyarrow")


def broadcast_lookup(
    ds: rd.Dataset,
    key: str,
    mapping: dict,
    out_col: str,
    default=None,
) -> rd.Dataset:
    """Map-side join against a small dict shipped once via ``ray.put``."""
    ref = ray.put(mapping)

    class _Lookup:
        def __init__(self):
            self.m = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df[out_col] = df[key].map(self.m).where(df[key].isin(self.m), default)
            return df

    return ds.map_batches(_Lookup, batch_format="pandas", concurrency=(1, available_cpus()))


def broadcast_semi_join(ds: rd.Dataset, key: str, values, negate: bool = False) -> rd.Dataset:
    """Semi/anti join against a small key set (``ray.put`` once, filter
    per batch). The scale path for a large filter side is the bucketed
    ``hash_join``; this is the A6-style broadcast (SURVEY §2.4)."""
    ref = ray.put(frozenset(values) if not isinstance(values, ray.ObjectRef) else values)

    class _Filter:
        def __init__(self):
            got = ray.get(ref)
            self.keys = got if isinstance(got, frozenset) else frozenset(got)

        def __call__(self, t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.is_in(t[key], value_set=pa.array(list(self.keys)))
            if negate:
                mask = pc.invert(pc.fill_null(mask, False))
            else:
                mask = pc.fill_null(mask, False)
            return t.filter(mask)

    return ds.map_batches(_Filter, batch_format="pyarrow", concurrency=(1, available_cpus()))


# ---------------------------------------------------------------------------
# grouped operators


def elect_top1(
    ds: rd.Dataset,
    group_key: str,
    sort_cols: Iterable[str],
    ascending: Iterable[bool],
    rank_col: str = "__rank",
) -> rd.Dataset:
    """Top-1-per-group with a deterministic comparator — the keeper
    election shape (A3, app/Commands.java:203-234). Emits every row with
    ``rank_col`` (0 = elected) so callers can split KEEP/DELETE."""
    sort_cols = list(sort_cols)
    ascending = list(ascending)

    def _elect(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, ascending=ascending, kind="mergesort")
        g[rank_col] = np.arange(len(g), dtype=np.int64)
        return g

    return ds.groupby(group_key).map_groups(_elect, batch_format="pandas")


def filter_min_group_size(ds: rd.Dataset, group_key: str, min_size: int = 2) -> rd.Dataset:
    """Keep only rows whose group has >= min_size members (A2 — the
    singleton-cluster drop, app/Commands.java:147-155)."""

    def _f(g: pd.DataFrame) -> pd.DataFrame:
        return g if len(g) >= min_size else g.iloc[0:0]

    return ds.groupby(group_key).map_groups(_f, batch_format="pandas")


def exact_dedup(ds: rd.Dataset, key: str, order_col: str) -> rd.Dataset:
    """One row per distinct ``key``, deterministically the min
    ``order_col`` — hash-partitioned grouped head (exact dedup)."""

    def _first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_col, kind="mergesort").head(1)

    return ds.groupby(key).map_groups(_first, batch_format="pandas")


def count_by(ds: rd.Dataset, key: str | list[str], alias: str = "n") -> rd.Dataset:
    from ray.data.aggregate import Count

    return ds.groupby(key).aggregate(Count(alias_name=alias))
