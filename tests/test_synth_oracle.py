import numpy as np
import pyarrow.parquet as pq
import pytest

from idf.oracle import (
    clusters_table,
    dup_pairs,
    oracle_components,
    oracle_end_to_end,
    oracle_hash_stage,
    oracle_plan,
    verify_phash_column,
)
from idf.synth import SCHEMA, generate_images_table, i64_to_u64, u64_to_i64


@pytest.fixture(scope="module")
def table():
    return generate_images_table(n_families=12, seed=7)


def test_schema_and_determinism(table):
    assert table.schema.equals(SCHEMA)
    again = generate_images_table(n_families=12, seed=7)
    assert table.equals(again)
    other = generate_images_table(n_families=12, seed=8)
    assert not table.equals(other)


def test_u64_roundtrip():
    vals = [0, 1, 2**63, 2**64 - 1, 1234567890123456789]
    for v in vals:
        assert i64_to_u64(u64_to_i64(v)) == v


def test_phash_column_matches_recomputation(table):
    assert verify_phash_column(table) > 5


def test_hash_stage_skips(table):
    oh = oracle_hash_stage(table)
    ids = set(table["image_id"].to_pylist())
    assert set(oh.id2hash) | set(oh.skipped) == ids
    # non-image formats and corrupt rows must be skipped
    for sid in oh.skipped:
        assert sid.endswith(("-txt", "-gif", "-corrupt"))


def test_components_semantics():
    # ported from cluster/ClustererTest.java: transitive chaining + separation
    id2hash = {"a": 0b0000, "b": 0b0001, "c": 0b0011, "z": 0xFFFF00000000}
    comps = oracle_components(id2hash, radius=1)
    part = {frozenset(c) for c in comps}
    assert frozenset({"a", "b", "c"}) in part  # a-b (1), b-c (1) chain, a-c dist 2
    assert frozenset({"z"}) in part
    comps0 = oracle_components(id2hash, radius=0)
    assert all(len(c) == 1 for c in comps0)


def test_components_inclusive_radius():
    # BKTreeIndexTest boundary: distance == radius is IN (BKTreeIndex.java:43)
    id2hash = {"a": 0, "b": 0b111}
    assert len(oracle_components(id2hash, radius=3)) == 1
    assert len(oracle_components(id2hash, radius=2)) == 2


def test_cluster_families(table):
    """Duplicate families cluster; rotations and unrelated bases do not merge."""
    oh, comps, plan = oracle_end_to_end(table, radius=10)
    bymember = {m: c for c in comps for m in c}
    fams: dict[str, list[str]] = {}
    for i in oh.id2hash:
        fams.setdefault(i.rsplit("-", 1)[0], []).append(i)
    for fam, members in fams.items():
        close = [m for m in members if m.rsplit("-", 1)[1] in ("base", "q90", "png", "dup")]
        if len(close) >= 2:
            assert len({id(bymember[m]) for m in close}) == 1, f"{fam} close variants split"
        for m in members:
            if m.endswith("-rot"):
                assert bymember[m] is not bymember.get(fam + "-base", None), f"{fam} rot merged"


def test_clusters_table_drops_singletons():
    comps = [frozenset({"a", "b"}), frozenset({"c"})]
    rows = clusters_table(comps)
    assert rows == [("a", "a"), ("a", "b")]


def test_plan_comparator():
    # CommandsTest.java:161-176 analog: 400x400 beats 200x200 beats 100x100
    comps = [frozenset({"x-100", "x-400", "x-200"})]
    meta = {"x-100": (100 * 100, 500), "x-400": (400 * 400, 5000), "x-200": (200 * 200, 900)}
    plan = oracle_plan(comps, meta)
    keep = [r for r in plan if r[1] == "KEEP"]
    assert keep == [("x-100", "KEEP", "x-400", "keeper(pixels=160000,size=5000)")]
    assert len([r for r in plan if r[1] == "DELETE"]) == 2


def test_plan_tiebreaks():
    # same pixels -> size desc; same both -> id asc; unreadable penalized last
    comps = [frozenset({"a", "b", "c", "bad"})]
    meta = {"a": (64, 100), "b": (64, 200), "c": (64, 200)}
    plan = oracle_plan(comps, meta)
    order = [r[2] for r in sorted(plan, key=lambda r: (r[1] != "KEEP", r[2]))]
    keeper = [r[2] for r in plan if r[1] == "KEEP"][0]
    assert keeper == "b"  # size 200 beats 100; 'b' < 'c'
    assert ("a", "DELETE", "bad", "dupe(pixels=-1,size=-1)") in plan


def test_dup_pairs():
    comps = [frozenset({"a", "b", "c"}), frozenset({"d"})]
    assert dup_pairs(comps) == {("a", "b"), ("a", "c"), ("b", "c")}


def test_write_read_roundtrip(tmp_path, table):
    p = tmp_path / "imgs.parquet"
    pq.write_table(table, p)
    back = pq.read_table(p)
    assert back.equals(table)
