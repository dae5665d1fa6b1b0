"""Engine-vs-DuckDB parity on edge whitespace (ADVICE r1).

DuckDB's trim() strips spaces only; the engine must agree on documents
with leading/trailing \\n or \\t, which the driver testdata doesn't
exercise.
"""

import duckdb
import pandas as pd
import pytest
import ray.data as rd

EDGE_DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "\nthe cat sat on the mat\n",
            "\thello world\t",
            "  spaces only  ",
            "mixed \n inner\nnewlines here",
            "",
        ],
    }
)


@pytest.fixture()
def con():
    c = duckdb.connect()
    c.register("documents", EDGE_DOCS)
    return c


def _oracle(con, name):
    import __ray_entry__

    return con.execute(__ray_entry__.oracle_sql()[name]).df()


def _compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame):
    cols = sorted(ray_df.columns)
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = sql_df[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_token_count_edge_ws(ray_session, con):
    from idf.functions.text import token_count

    got = token_count(rd.from_pandas(EDGE_DOCS)).to_pandas()
    _compare(got, _oracle(con, "doc_token_count"))


def test_quality_edge_ws(ray_session, con):
    from idf.functions.text import quality_components

    got = quality_components(rd.from_pandas(EDGE_DOCS)).to_pandas()
    _compare(got, _oracle(con, "doc_quality"))


def test_fingerprint_edge_ws(ray_session, con):
    from idf.functions.text import fingerprint_md5

    got = fingerprint_md5(rd.from_pandas(EDGE_DOCS)).to_pandas()
    _compare(got, _oracle(con, "doc_fingerprint"))


def test_ngram_short_docs_match_oracle(ray_session, con):
    """Docs with <k tokens emit no shingles — identical short docs must
    NOT pair, matching the trigram oracle (ADVICE r1)."""
    from idf.functions.text_dedup import ngram_jaccard_pairs

    short = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["two words", "two words", "a much longer document with many words", ""],
        }
    )
    c = duckdb.connect()
    c.register("documents", short)
    got = ngram_jaccard_pairs(rd.from_pandas(short), tau=0.6).to_pandas()
    want = _oracle_con(c, "doc_ngram_pairs")
    assert len(got) == len(want) == 0


def _oracle_con(con, name):
    import __ray_entry__

    return con.execute(__ray_entry__.oracle_sql()[name]).df()
