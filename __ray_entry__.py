"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship near-dup pipeline on a deterministic
synthetic images table derived from sf0.001; ``queries()`` exposes one
callable per implemented operator/pipeline (SURVEY.md §2 + the
training-data extras); ``oracle_sql()`` gives DuckDB equivalents for
every SQL-expressible query with matching column names. Ray is
initialised by the caller — nothing here calls ray.init/shutdown.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

_STOPWORD_SQL = None  # filled lazily from idf.functions.text


# ---------------------------------------------------------------------------
# image pipeline plumbing (synthetic corpus per sf, cached + resumable)


def _img_run(sf_dir: str) -> str:
    """Generate (once) the synthetic images table for this sf and run the
    dedup pipeline (once, manifest-resumable). Returns the run dir."""
    from idf.config import DedupConfig
    from idf.pipelines.dedup import run_dedup
    from idf.synth import CACHE_TAG, ensure_images_cache, sf_from_dir

    images = ensure_images_cache(sf_dir)
    run_dir = f"/tmp/idf_cache/run_{CACHE_TAG}_sf{sf_from_dir(sf_dir)}"
    run_dedup(images, run_dir, DedupConfig(), resume=True)
    return run_dir


def _stage(sf_dir: str, name: str):
    from idf.pipelines.dedup import read_stage

    return read_stage(_img_run(sf_dir), name)


def entry() -> Any:
    """Flagship: full dedup pipeline at sf0.001; returns the plan table."""
    return _stage("/root/testdata/sf0.001", "plan")


# ---------------------------------------------------------------------------


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def queries() -> dict[str, Callable[[str], Any]]:
    import pyarrow.dataset as pads
    import ray.data as rd

    from idf.functions.ann import cosine_pairs, cosine_topk, ivf_pairs, ivf_topk
    from idf.functions.text import (
        fingerprint_md5,
        lang_id,
        quality_components,
        token_count,
        winnow_fingerprints,
    )
    from idf.functions.text_dedup import (
        exact_dedup_docs,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_docs,
        simhash_pairs,
    )
    from idf.ops import count_by, elect_top1, filter_min_group_size, hash_join

    # -- image dedup pipeline. img_clusters/img_plan/img_apply have
    #    DuckDB oracles over engine-written stage parquet (see
    #    img_oracle_sql); img_hashes stays rows-only (DCT pHash is not
    #    SQL-expressible) and is gated by the pytest kernel oracle.
    def img_hashes(sf):
        return _stage(sf, "hashes")

    def img_clusters(sf):
        return _stage(sf, "clusters")

    def img_plan(sf):
        return _stage(sf, "plan")

    def img_apply(sf):
        import pyarrow as pa

        keep = _stage(sf, "apply_keep").select_columns(["image_id"]).map_batches(
            lambda t: t.append_column("action", pa.array(["KEEP"] * len(t))),
            batch_format="pyarrow",
        )
        quar = _stage(sf, "apply_quarantine").select_columns(["image_id"]).map_batches(
            lambda t: t.append_column("action", pa.array(["DELETE"] * len(t))),
            batch_format="pyarrow",
        )
        return keep.union(quar)

    # -- relational parity ops on the driver tables (SQL-checkable)
    def orders_top1_per_cust(sf):
        orders = rd.read_parquet(
            os.path.join(sf, "orders.parquet"),
            columns=["o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"],
        )
        ranked = elect_top1(
            orders,
            "o_custkey",
            ["o_totalprice", "o_orderdate", "o_orderkey"],
            [False, True, True],
        )
        return ranked.filter(expr="__rank == 0").select_columns(
            ["o_custkey", "o_orderkey", "o_totalprice"]
        )

    def orders_min_group_size(sf):
        orders = rd.read_parquet(
            os.path.join(sf, "orders.parquet"), columns=["o_custkey", "o_orderkey"]
        )
        return filter_min_group_size(orders, "o_custkey", 8)

    def cust_orders_by_nation(sf):
        cust = rd.read_parquet(
            os.path.join(sf, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
        )
        orders = rd.read_parquet(os.path.join(sf, "orders.parquet"), columns=["o_custkey"])
        joined = hash_join(
            orders.map_batches(
                lambda t: t.rename_columns(["c_custkey"]), batch_format="pyarrow"
            ),
            cust,
            on="c_custkey",
        )
        return count_by(joined, "c_nationkey", alias="n_orders")

    def events_by_type(sf):
        ev = rd.read_parquet(os.path.join(sf, "events.parquet"), columns=["event_type"])
        return count_by(ev, "event_type", alias="n")

    # -- text analysis / dedup over documents
    q = {
        "img_hashes": img_hashes,
        "img_clusters": img_clusters,
        "img_plan": img_plan,
        "img_apply": img_apply,
        "orders_top1_per_cust": orders_top1_per_cust,
        "orders_min_group_size": orders_min_group_size,
        "cust_orders_by_nation": cust_orders_by_nation,
        "events_by_type": events_by_type,
        "doc_token_count": lambda sf: token_count(_docs(sf)),
        "doc_quality": lambda sf: quality_components(_docs(sf)),
        "doc_exact_dedup": lambda sf: exact_dedup_docs(_docs(sf)),
        "doc_fingerprint": lambda sf: fingerprint_md5(_docs(sf)),
        "doc_ngram_pairs": lambda sf: ngram_jaccard_pairs(_docs(sf), tau=0.6),
        "doc_minhash_pairs": lambda sf: minhash_lsh_pairs(_docs(sf), tau=0.8).select_columns(
            ["doc_id_a", "doc_id_b"]
        ),
        "doc_simhash": lambda sf: simhash_docs(_docs(sf)),
        "doc_simhash_pairs": lambda sf: simhash_pairs(_docs(sf), radius=8).select_columns(
            ["doc_id_a", "doc_id_b"]
        ),
        "doc_lang_id": lambda sf: lang_id(_docs(sf)),
        "doc_winnow_fp": lambda sf: winnow_fingerprints(_docs(sf)),
        "emb_cosine_topk": lambda sf: cosine_topk(_emb(sf), list(range(8)), k=5).select_columns(
            ["vec_id", "neighbor_id", "rank"]
        ),
        # tau sized to the synthetic embedding sim distribution (max ~0.5)
        # so the operator emits real pairs at every sf
        "emb_cosine_pairs": lambda sf: cosine_pairs(_emb(sf), tau=0.4).select_columns(
            ["vec_id_a", "vec_id_b"]
        ),
        "emb_ann_ivf": lambda sf: ivf_topk(_emb(sf), list(range(8)), k=5).select_columns(
            ["vec_id", "neighbor_id", "rank"]
        ),
        # sub-quadratic approximate near-dup pairs (probabilistic recall
        # -> rows-only check; exact counterpart is emb_cosine_pairs)
        "emb_ivf_pairs": lambda sf: ivf_pairs(_emb(sf), tau=0.4).select_columns(
            ["vec_id_a", "vec_id_b"]
        ),
    }
    return q


def img_oracle_sql(sf: str) -> dict[str, str]:
    """DuckDB oracles for the image stages (r1 verdict fix #3).

    The driver compares Ray vs SQL at sf=0.01. The image pipeline's
    inputs are the deterministic synthetic corpus (not a driver view),
    so these re-derive each stage INDEPENDENTLY in SQL (recursive-CTE
    connected components, window-function election, anti-join apply)
    from the engine-written parquet of the UPSTREAM stages — the same
    engine-vs-oracle layering the pytest suite uses. ``queries()`` runs
    first and populates the run dir via ``_img_run``."""
    from idf.synth import CACHE_TAG

    run = f"/tmp/idf_cache/run_{CACHE_TAG}_sf{sf}"
    imgs = f"/tmp/idf_cache/images_{CACHE_TAG}_sf{sf}"
    band_files = ", ".join(
        f"'{run}/{d}/*.parquet'" for d in ("edges_band", "edges_caption")
    )
    link_files = ", ".join(
        f"'{run}/{d}/*.parquet'" for d in ("collapse_local", "collapse_global")
    )
    # dist-0 link edges live in the collapse stages as kind=1 rows
    edges_cte = f"""e AS (
              SELECT id_a, id_b FROM read_parquet([{band_files}])
              UNION ALL
              SELECT id_a, id_b FROM read_parquet([{link_files}]) WHERE kind = 1
            )"""
    return {
        "img_clusters": f"""
            WITH RECURSIVE {edges_cte},
            und AS (
              SELECT id_a AS src, id_b AS dst FROM e
              UNION
              SELECT id_b, id_a FROM e
            ),
            reach(src, dst) AS (
              SELECT DISTINCT src, src AS dst FROM und
              UNION
              SELECT r.src, u.dst FROM reach r JOIN und u ON u.src = r.dst
            )
            SELECT min(dst) AS cluster_id, src AS image_id FROM reach GROUP BY src
        """,
        "img_plan": f"""
            WITH j AS (
              SELECT c.cluster_id, c.image_id, m.pixels, m."size" AS size
              FROM read_parquet('{run}/clusters/*.parquet') c
              JOIN read_parquet('{run}/hashes/*.parquet') m USING (image_id)
            ),
            r AS (
              SELECT *, row_number() OVER (
                PARTITION BY cluster_id
                ORDER BY pixels DESC, size DESC, lower(image_id) ASC, image_id ASC
              ) AS rn FROM j
            )
            SELECT cluster_id,
                   CASE WHEN rn = 1 THEN 'KEEP' ELSE 'DELETE' END AS action,
                   image_id,
                   (CASE WHEN rn = 1 THEN 'keeper' ELSE 'dupe' END)
                     || '(pixels=' || pixels || ',size=' || size || ')' AS reason,
                   pixels, size
            FROM r
        """,
        "img_apply": f"""
            SELECT i.image_id,
                   CASE WHEN d.image_id IS NULL THEN 'KEEP' ELSE 'DELETE' END AS action
            FROM read_parquet('{imgs}/*.parquet') i
            LEFT JOIN (
              SELECT image_id FROM read_parquet('{run}/plan/*.parquet')
              WHERE action = 'DELETE'
            ) d USING (image_id)
        """,
    }


def oracle_sql() -> dict[str, str]:
    from idf.functions.text import _STOPWORDS

    stop_list = ", ".join(f"'{w}'" for w in _STOPWORDS)
    return {
        **img_oracle_sql("0.01"),
        "orders_top1_per_cust": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
              SELECT o_custkey, o_orderkey, o_totalprice,
                     row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
                     ) AS rn
              FROM orders
            ) WHERE rn = 1
        """,
        "orders_min_group_size": """
            SELECT o_custkey, o_orderkey FROM orders
            QUALIFY count(*) OVER (PARTITION BY o_custkey) >= 8
        """,
        "cust_orders_by_nation": """
            SELECT c_nationkey, count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey
        """,
        "events_by_type": "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
        "doc_token_count": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
            FROM documents
        """,
        "doc_quality": f"""
            SELECT doc_id,
                   length(trim(text)) AS n_chars_trim,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                   length(regexp_replace(text, '\\s+', '', 'g')) AS tot_token_len,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE length(list_filter(
                               regexp_split_to_array(lower(trim(text)), '\\s+'),
                               x -> x IN ({stop_list}))) END AS n_stop
            FROM documents
        """,
        "doc_exact_dedup": "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text",
        "doc_fingerprint": "SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents",
        "doc_ngram_pairs": """
            WITH toks AS (
              SELECT doc_id, w, i
              FROM (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w,
                       generate_subscripts(regexp_split_to_array(lower(trim(text)), '\\s+'), 1) AS i
                FROM documents
              )
            ),
            tri AS (
              SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
              FROM toks a
              JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
              JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM tri GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS c
              FROM tri x JOIN tri y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            )
            SELECT a AS doc_id_a, b AS doc_id_b,
                   c * 1.0 / (sa.n + sb.n - c) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = a
            JOIN sizes sb ON sb.doc_id = b
            WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.6
        """,
        "emb_cosine_topk": """
            WITH q AS (
              SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
              FROM embeddings WHERE vec_id < 8
            ),
            s AS (
              SELECT qid, e.vec_id AS nid,
                     list_cosine_similarity(qe, CAST(e.embedding AS DOUBLE[])) AS sim
              FROM q, embeddings e WHERE e.vec_id <> qid
            )
            SELECT qid AS vec_id, nid AS neighbor_id, rank FROM (
              SELECT qid, nid,
                     row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rank
              FROM s
            ) WHERE rank <= 5
        """,
        "emb_cosine_pairs": """
            SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.4
        """,
    }
