"""Large-side code paths of the size-adaptive operators, forced by
zeroed thresholds (r1 verdict #8: the auto-switches need tests)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from idf.ops import set_membership_join


def test_set_membership_join(ray_session, rng):
    left = pd.DataFrame({"k": rng.integers(0, 500, 3000), "v": rng.normal(size=3000)})
    keys = pd.DataFrame({"k": np.arange(0, 500, 3)})
    semi = set_membership_join(rd.from_pandas(left), "k", rd.from_pandas(keys)).to_pandas()
    anti = set_membership_join(
        rd.from_pandas(left), "k", rd.from_pandas(keys), negate=True
    ).to_pandas()
    kset = set(keys["k"])
    assert set(semi["k"]) <= kset
    assert not (set(anti["k"]) & kset)
    assert len(semi) + len(anti) == len(left)
    assert sorted(semi.columns) == ["k", "v"]


def test_apply_stage_distributed_path(ray_session):
    from idf.stages.apply import apply_stage

    images = pa.table(
        {
            "image_id": [f"i{i}" for i in range(40)],
            "bytes": pa.array([b"x"] * 40, pa.binary()),
        }
    )
    plan = pa.table(
        {
            "image_id": [f"i{i}" for i in range(40)],
            "action": ["DELETE" if i % 3 == 0 else "KEEP" for i in range(40)],
        }
    )
    # broadcast_max_ids=0 forces the set_membership_join path
    kept, quar = apply_stage(rd.from_arrow(images), rd.from_arrow(plan), broadcast_max_ids=0)
    kept_ids = set(kept.to_pandas()["image_id"])
    quar_ids = set(quar.to_pandas()["image_id"])
    want_del = {f"i{i}" for i in range(40) if i % 3 == 0}
    assert quar_ids == want_del
    assert kept_ids == {f"i{i}" for i in range(40)} - want_del


def test_ngram_join_sizes_path(ray_session):
    from idf.functions.text_dedup import ngram_jaccard_pairs

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy cat",
                "completely different words here entirely now",
                "another unrelated document with other content",
                "the quick brown fox jumps over the lazy dog",
                "words that do not match anything else at all",
            ],
        }
    )
    ds = rd.from_pandas(docs)
    small = ngram_jaccard_pairs(ds, tau=0.5).to_pandas()
    # driver_agg_max_partials=0 forces the distributed pair-sum path;
    # broadcast_max_docs=0 additionally forces the hash_join sizes path
    mid = ngram_jaccard_pairs(ds, tau=0.5, driver_agg_max_partials=0).to_pandas()
    big = ngram_jaccard_pairs(
        ds, tau=0.5, driver_agg_max_partials=0, broadcast_max_docs=0
    ).to_pandas()
    key = lambda df: sorted(zip(df["doc_id_a"], df["doc_id_b"], df["jaccard"].round(9)))
    assert key(small) == key(mid) == key(big)
    assert len(small) > 0


def test_plan_distributed_path(ray_session):
    from idf.stages.plan import plan_stage

    clusters = pa.table(
        {
            "cluster_id": ["c1"] * 3 + ["c2"] * 2,
            "image_id": ["a", "b", "c", "d", "e"],
        }
    )
    meta = pa.table(
        {
            "image_id": ["a", "b", "c", "d", "e"],
            "pixels": pa.array([100, 200, 150, 50, 50], pa.int64()),
            "size": pa.array([10, 20, 15, 9, 5], pa.int64()),
        }
    )
    # broadcast_max_rows=0 forces the hash_join path
    got = (
        plan_stage(rd.from_arrow(clusters), rd.from_arrow(meta), broadcast_max_rows=0)
        .to_pandas()
        .set_index("image_id")
    )
    assert got.loc["b", "action"] == "KEEP" and got.loc["a", "action"] == "DELETE"
    assert got.loc["d", "action"] == "KEEP" and got.loc["e", "action"] == "DELETE"
