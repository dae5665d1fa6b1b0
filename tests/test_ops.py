import numpy as np
import pandas as pd
import pytest

import ray
import ray.data as rd

from idf.ops import (
    broadcast_lookup,
    broadcast_semi_join,
    bucketed_aggregate,
    bucketed_apply,
    bucketed_group_apply,
    count_by,
    elect_top1,
    exact_dedup,
    filter_min_group_size,
    hash_join,
)


@pytest.fixture(scope="module")
def tables(ray_session, rng):
    n = 2000
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 300, n),
            "v": rng.normal(size=n),
            "tag": rng.choice(list("abc"), n),
        }
    )
    right = pd.DataFrame(
        {
            "k": np.arange(300),
            "name": [f"n{i}" for i in range(300)],
            "v": rng.normal(size=300),  # overlapping non-key column
        }
    )
    return left, right


def test_hash_join_inner_matches_pandas(tables):
    left, right = tables
    got = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k")
        .to_pandas()
        .sort_values(["k", "v", "name"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, on="k", how="inner", suffixes=("", "_r"))
        .sort_values(["k", "v", "name"])
        .reset_index(drop=True)
    )
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_like=True
    )


def test_hash_join_left(tables):
    left, right = tables
    small_right = right[right["k"] < 100]
    got = hash_join(rd.from_pandas(left), rd.from_pandas(small_right), on="k", how="left").to_pandas()
    want = left.merge(small_right, on="k", how="left", suffixes=("", "_r"))
    assert len(got) == len(want)
    assert got["name"].isna().sum() == want["name"].isna().sum()


def test_broadcast_lookup_and_semi_join(tables, ray_session):
    left, _ = tables
    ds = rd.from_pandas(left)
    mapping = {i: f"m{i}" for i in range(0, 300, 2)}
    out = broadcast_lookup(ds, "k", mapping, "mapped").to_pandas()
    assert (out["mapped"].notna() == out["k"].isin(mapping)).all()

    keys = set(range(0, 300, 3))
    semi = broadcast_semi_join(ds, "k", keys).to_pandas()
    anti = broadcast_semi_join(ds, "k", keys, negate=True).to_pandas()
    assert set(semi["k"]) <= keys
    assert not (set(anti["k"]) & keys)
    assert len(semi) + len(anti) == len(left)


def test_broadcast_semi_join_empty_values(tables, ray_session):
    # zero DELETE ids must not crash the apply stage (ADVICE r1: null-typed
    # value_set raised ArrowTypeError inside pc.is_in)
    left, _ = tables
    ds = rd.from_pandas(left)
    assert len(broadcast_semi_join(ds, "k", set()).to_pandas()) == 0
    assert len(broadcast_semi_join(ds, "k", set(), negate=True).to_pandas()) == len(left)


def test_elect_top1(tables):
    left, _ = tables
    ranked = elect_top1(rd.from_pandas(left), "k", ["v", "tag"], [False, True]).to_pandas()
    top = ranked[ranked["__rank"] == 0]
    want = left.sort_values(["v", "tag"], ascending=[False, True]).groupby("k").head(1)
    got_map = dict(zip(top["k"], top["v"]))
    want_map = dict(zip(want["k"], want["v"]))
    assert got_map == want_map


def test_filter_min_group_size(tables):
    left, _ = tables
    out = filter_min_group_size(rd.from_pandas(left), "k", 10).to_pandas()
    sizes = left.groupby("k").size()
    keep = set(sizes[sizes >= 10].index)
    assert set(out["k"]) == keep
    assert len(out) == int(sizes[sizes >= 10].sum())


def test_exact_dedup(tables):
    left, _ = tables
    left = left.assign(rowid=np.arange(len(left)))
    out = exact_dedup(rd.from_pandas(left), key="k", order_col="rowid").to_pandas()
    want = left.sort_values("rowid").groupby("k").head(1)
    assert sorted(out["rowid"]) == sorted(want["rowid"])


def test_count_by(tables):
    left, _ = tables
    out = count_by(rd.from_pandas(left), "tag").to_pandas().set_index("tag")["n"]
    want = left.groupby("tag").size()
    assert dict(out) == dict(want)


def test_bucketed_aggregate_matches_pandas(tables):
    left, _ = tables
    out = (
        bucketed_aggregate(
            rd.from_pandas(left), ["k", "tag"], {"s": ("v", "sum"), "m": ("v", "min")}
        )
        .to_pandas()
        .sort_values(["k", "tag"])
        .reset_index(drop=True)
    )
    want = (
        left.groupby(["k", "tag"])["v"]
        .agg(s="sum", m="min")
        .reset_index()
        .sort_values(["k", "tag"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[["k", "tag", "s", "m"]], want)


def test_bucketed_apply_covers_all_keys(tables):
    left, _ = tables

    def bucket_fn(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", sort=False).size().reset_index(name="n")

    out = bucketed_apply(rd.from_pandas(left), "k", bucket_fn).to_pandas()
    want = left.groupby("k").size()
    assert dict(zip(out["k"], out["n"])) == dict(want)


def test_bucketed_group_apply_per_group(tables):
    left, _ = tables

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [g["k"].iloc[0]], "vmax": [g["v"].max()]})

    out = bucketed_group_apply(rd.from_pandas(left), "k", per_group).to_pandas()
    want = left.groupby("k")["v"].max()
    assert dict(zip(out["k"], out["vmax"])) == pytest.approx(dict(want))


def test_polars_sort_flag_scoped_to_graph(tables, ray_session, tmp_path):
    """r2 regression: a polars_sort=True helper must not leak the flag
    into later-constructed roots (a leaked True made ivf_pairs panic
    inside polars' from_arrow on the pickled embedding column), and a
    helper passed False must win even when the root inherited True
    from the ambient context."""
    import numpy as np
    from ray.data import DataContext

    left, _ = tables
    ambient = DataContext.get_current()
    assert not getattr(ambient, "use_polars_sort", False)

    # polars_sort=True is applied to the graph, not the ambient context
    ds = rd.from_pandas(left)
    bucketed_apply(ds, "k", lambda g: g, polars_sort=True, exchange=False).materialize()
    assert ds.context.use_polars_sort
    assert not getattr(DataContext.get_current(), "use_polars_sort", False)

    # a root that inherited True still executes object-column shuffles
    # safely once a polars_sort=False helper scopes it back
    ambient.use_polars_sort = True
    try:
        df = pd.DataFrame(
            {
                "k": np.arange(64) % 7,
                "emb": [np.random.default_rng(i).random(4) for i in range(64)],
            }
        )
        p = tmp_path / "emb.parquet"
        df.to_parquet(p)
        root = rd.read_parquet(str(p))
        assert root.context.use_polars_sort
        out = bucketed_apply(
            root, "k", lambda g: g.head(1), polars_sort=False, exchange=False
        ).to_pandas()
        assert set(out["k"]) == set(range(7))
    finally:
        ambient.use_polars_sort = False


def test_exchange_apply_matches_sort_path(ray_session, rng):
    """The raw-task hash exchange co-locates keys exactly like the
    sort-based bucketed_apply: a per-key aggregate computed through
    either engine is identical."""
    n = 20_000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 997, n),
            "v": rng.integers(0, 1000, n).astype(np.int64),
        }
    )

    def per_key_sum(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {"k": pd.Series([], dtype=np.int64), "s": pd.Series([], dtype=np.int64)}
            )
        return g.groupby("k", sort=False)["v"].sum().reset_index(name="s")

    got_sort = (
        bucketed_apply(rd.from_pandas(df), "k", per_key_sum, exchange=False)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    from idf.ops import exchange_apply

    got_exch = (
        exchange_apply(rd.from_pandas(df), "k", per_key_sum)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_sort, got_exch)
    want = df.groupby("k")["v"].sum().reset_index(name="s")
    pd.testing.assert_frame_equal(got_exch, want, check_dtype=False)


def test_exchange_apply_hot_key_skew(ray_session, rng):
    """A single hot key (60% of rows) lands wholly in one partition and
    still aggregates exactly — the skew contract of the exchange."""
    n = 30_000
    k = rng.integers(0, 500, n)
    k[: int(n * 0.6)] = 7  # hot key
    df = pd.DataFrame({"k": k, "v": np.ones(n, dtype=np.int64)})
    from idf.ops import exchange_apply

    got = (
        exchange_apply(
            rd.from_pandas(df),
            "k",
            lambda g: g.groupby("k", sort=False)["v"].sum().reset_index(name="s"),
            n_parts=16,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = df.groupby("k")["v"].sum().reset_index(name="s")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_cluster_size_histogram(ray_session):
    import pandas as pd
    import ray.data as rd

    from idf.stages.cc import cluster_size_histogram

    pdf = pd.DataFrame(
        {
            "cluster_id": ["a", "a", "b", "b", "b", "c", "c", "c"],
            "image_id": [f"i{k}" for k in range(8)],
        }
    )
    got = cluster_size_histogram(rd.from_pandas(pdf), n_buckets=3)
    want = pd.DataFrame({"cluster_size": [2, 3], "n_clusters": [1, 2]})
    pd.testing.assert_frame_equal(got, want.astype({"cluster_size": "int64", "n_clusters": "int64"}))


def test_pair_distance_histogram(ray_session):
    """(a,b)/(b,a) and cross-source repeats collapse to one pair; the
    distance is Long.bitCount(a ^ b) on the int64 bit pattern."""
    import pandas as pd
    import ray.data as rd

    from idf.stages.candidates import pair_distance_histogram

    pdf = pd.DataFrame(
        {
            "phash_a": [0b1011, 0b0011, 5, -1, 7],
            "phash_b": [0b0011, 0b1011, 5 ^ 0b111, 0, 7 ^ (1 << 62)],
        }
    )
    got = pair_distance_histogram(rd.from_pandas(pdf).repartition(3), n_buckets=3)
    # pairs: {3,11} d=1 (deduped from two orderings); {5,2} d=3;
    # {-1,0} d=64; {7, 7^2^62} d=1
    want = pd.DataFrame({"hamming_dist": [1, 3, 64], "n_pairs": [2, 1, 1]})
    pd.testing.assert_frame_equal(
        got, want.astype({"hamming_dist": "int64", "n_pairs": "int64"})
    )


def test_img_caption_exact_groups(ray_session):
    """Caption exact-dup groups: canonical = lexicographic min id;
    singletons drop; null captions group with empty string."""
    import pandas as pd
    import ray.data as rd

    import __ray_entry__  # noqa: F401 — pattern under test lives there
    from idf.ops import bucketed_apply

    imgs = pd.DataFrame(
        {
            "image_id": ["b", "a", "c", "d", "e"],
            "caption": ["same cap", "same cap", "unique", None, ""],
        }
    )

    def fp(df):
        import hashlib

        return pd.DataFrame(
            {
                "image_id": df["image_id"],
                "cap_fp": df["caption"].fillna("").map(
                    lambda s: hashlib.md5(s.encode()).hexdigest()
                ),
            }
        )

    def grp(g):
        sizes = g.groupby("cap_fp")["image_id"].transform("size")
        canon = g.groupby("cap_fp")["image_id"].transform("min")
        out = g.assign(caption_group=canon)[sizes >= 2]
        return out[["caption_group", "image_id"]]

    got = (
        bucketed_apply(rd.from_pandas(imgs).map_batches(fp, batch_format="pandas"),
                       "cap_fp", grp, 3)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    # groups: {a,b} canon 'a'; {d(null), e('')} canon 'd'; 'c' singleton drops
    assert list(got["image_id"]) == ["a", "b", "d", "e"]
    assert list(got["caption_group"]) == ["a", "a", "d", "d"]
