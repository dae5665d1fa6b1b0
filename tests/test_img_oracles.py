"""img_* DuckDB oracles (r1 verdict #3): run the engine pipeline at
sf0.001 and check the recursive-CTE / window / anti-join SQL re-derives
clusters, plan and apply exactly (the driver repeats this at sf0.01)."""

import duckdb
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def run(ray_session):
    import __ray_entry__ as e

    sf_dir = "/root/testdata/sf0.001"
    # materialize all stages incl. apply
    e.queries()["img_apply"](sf_dir).count()
    return e


def _cmp(ray_df: pd.DataFrame, sql_df: pd.DataFrame):
    cols = sorted(ray_df.columns)
    assert sorted(sql_df.columns) == cols
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = sql_df[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.parametrize("name", ["img_clusters", "img_plan", "img_apply"])
def test_img_oracle(run, name):
    import __ray_entry__ as e

    sql = e.img_oracle_sql("0.001")[name]
    got = e.queries()[name]("/root/testdata/sf0.001").to_pandas()
    want = duckdb.connect().execute(sql).df()
    _cmp(got, want)


def test_img_thumbs_geometry_oracle(run):
    """r4 verdict #8: the thumbnail op's geometry projection
    (image_id, w, h, status) is hash-checkable in SQL — resize
    arithmetic via round_even (banker's rounding, matching Python
    round()), decode success via the synth table's real decoded w/h."""
    import __ray_entry__ as e

    sql = e.img_oracle_sql("0.001")["img_thumbs"]
    got = e.queries()["img_thumbs"]("/root/testdata/sf0.001").to_pandas()
    want = duckdb.connect().execute(sql).df()
    assert (got["status"] == "ok").any() and (got["status"] == "skip").any()
    _cmp(got, want)
