"""Benchmark harness (driver contract: prints ONE JSON line).

Headline: wall time of the full image near-dup pipeline
(decode -> pHash -> exact-collapse -> banding + caption-LSH -> verify ->
connected components -> plan) over the deterministic synthetic images
table for $GRAFT_SF_DIR (default sf0.1, ~10k images), at
num_cpus=$RAY_GRAFT_CPUS (default 32). Corpus generation is one-time
corpus prep and is NOT timed (cached under /tmp/idf_cache).

``--scaling`` reruns the plain bench in fresh subprocesses at 8 and 32
CPUs on the same input and reports both throughputs + scaling
efficiency (the sandbox adaptation of the north rule's N vs 4N nodes).

``--family`` benches the doc/embedding query family at TWO widths
(8 and 32 CPUs) with >=2 fresh-process reps per width (r3 verdict #6 —
single-shot single-width timings nearly hid a 2.3x regression).

``--mix`` runs the image pipeline on both real-JPEG corpus mixes
(default ~2% and heavy ~20% real JFIF rows; r3 verdict #8).

Env knobs: GRAFT_BENCH_ONLY=docs skips the image pipeline;
GRAFT_JFIF_P=1.0 selects the heavy-JFIF corpus (separate cache key).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from idf.config import DedupConfig
    from idf.functions.ann import cosine_topk
    from idf.functions.text_dedup import minhash_lsh_pairs, ngram_jaccard_pairs
    from idf.pipelines.dedup import run_dedup
    from idf.synth import ensure_images_cache, sf_from_dir

    sf = sf_from_dir(sf_dir)
    jfif_p = float(os.environ.get("GRAFT_JFIF_P", "0.12"))
    docs_only = os.environ.get("GRAFT_BENCH_ONLY", "") == "docs"

    queries: dict[str, float] = {}
    n_images, pipeline_sec = 0, 0.0
    if not docs_only:
        images = ensure_images_cache(sf_dir, jfif_p=jfif_p)  # untimed corpus prep (cached)
        # warm the OS page cache with one full untimed pass over the bytes
        # column so the timed runs measure compute + shuffle, not first-read
        # disk throughput (guide: measure the two parallelism levels fairly)
        import pyarrow as pa

        n_images = (
            rd.read_parquet(images, columns=["image_id", "bytes"])
            .map_batches(lambda t: pa.table({"n": [len(t)]}), batch_format="pyarrow")
            .sum("n")
        )

        # headline = BEST-OF-N full-decode pipeline wall (r4 verdict #2:
        # one unambiguous headline — single-shot walls on this shared
        # VM moved up to 40% between identical runs, so BENCH_rN and
        # STAGES.md could drift in opposite directions). All rep walls
        # are reported for transparency. Full decode is PINNED (r5): the
        # config default is now 'auto' (precomputed when the table ships
        # phash), which would silently change what images_per_sec
        # measures; trust-but-verify walls live in BENCH/STAGES.md.
        reps = int(os.environ.get("GRAFT_BENCH_REPS", "2"))
        pipeline_reps: list[float] = []
        for rep in range(max(reps, 1)):
            run_dir = f"/tmp/idf_bench/run_sf{sf}_cpus{num_cpus}"
            shutil.rmtree(run_dir, ignore_errors=True)
            t0 = time.time()
            run_dedup(
                images,
                run_dir,
                DedupConfig(use_precomputed_phash=False),
                resume=False,
                do_apply=False,
            )
            pipeline_reps.append(round(time.time() - t0, 3))
        pipeline_sec = min(pipeline_reps)
        queries["img_dedup_pipeline"] = round(pipeline_sec, 3)
    else:
        # docs-only child (--family mode): the image pipeline normally
        # absorbs Ray worker-pool spin-up before any doc query is timed.
        # Without it the FIRST doc query pays ~2 s of worker startup at
        # 32 CPUs and the two-width comparison reads backwards (observed
        # r4: doc_minhash 3.9 s at 32 vs 1.5 s at 8). Warm the pool with
        # one untimed task per CPU slot + page-cache the input tables.
        import pyarrow as pa

        rd.range(num_cpus * 2, override_num_blocks=num_cpus * 2).map_batches(
            lambda t: t, batch_format="pyarrow"
        ).count()
        for tbl in ("documents.parquet", "embeddings.parquet", "events.parquet"):
            rd.read_parquet(os.path.join(sf_dir, tbl)).map_batches(
                lambda t: pa.table({"n": [len(t)]}), batch_format="pyarrow"
            ).sum("n")

    from idf.functions.ann import dedup_embeddings_map, lsh_pairs
    from idf.functions.relational import (
        events_asof_orders,
        funnel,
        grouped_quantiles,
        retention,
        sessionize,
        top_paths,
    )
    from idf.functions.text import contamination, tfidf_topk
    from idf.functions.text_dedup import dedup_docs_map, substring_dup_spans

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ev = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id", "ts"]
    )
    od = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    ev_typed = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts", "event_type"]
    )
    ev_paths = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_extendedprice"],
    )
    from idf.functions.membership import bloom_semi_join_keys

    cu = rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )
    named = [
        ("doc_minhash_pairs", lambda: minhash_lsh_pairs(docs, tau=0.8).count()),
        (
            "cust_bloom_members",
            lambda: bloom_semi_join_keys(
                od.select_columns(["o_custkey"]), "o_custkey", cu, "c_custkey", mode="fast"
            ).count(),
        ),
        ("doc_ngram_pairs", lambda: ngram_jaccard_pairs(docs, tau=0.6).count()),
        ("doc_substring_spans", lambda: substring_dup_spans(docs, min_len=30).count()),
        ("doc_dedup_map", lambda: dedup_docs_map(docs, tau=0.8).count()),
        ("emb_cosine_topk", lambda: cosine_topk(emb, list(range(64)), k=10).count()),
        ("emb_lsh_pairs", lambda: lsh_pairs(emb, tau=0.4, n_bits=8, n_tables=4).count()),
        (
            "emb_dedup_map",
            lambda: dedup_embeddings_map(emb, tau=0.4, n_bits=8, n_tables=4).count(),
        ),
        ("events_asof_orders", lambda: events_asof_orders(ev, od).count()),
        ("events_sessions", lambda: sessionize(ev).count()),
        ("doc_tfidf_topk", lambda: tfidf_topk(docs, k=5).count()),
        ("doc_contamination", lambda: contamination(docs).count()),
        ("events_funnel", lambda: len(funnel(ev_typed))),
        ("events_top_paths", lambda: len(top_paths(ev_paths))),
        ("events_retention", lambda: len(retention(ev_typed))),
        ("lineitem_price_quantiles", lambda: len(grouped_quantiles(li))),
    ]
    # best-of-N per query, same protocol as the headline
    q_reps = int(os.environ.get("GRAFT_BENCH_REPS", "2"))
    for _ in range(max(q_reps, 1)):
        for name, thunk in named:
            t0 = time.time()
            thunk()
            dt = round(time.time() - t0, 3)
            queries[name] = min(queries.get(name, dt), dt)

    result = {
        "metric": "img_dedup_pipeline_wall_sec",
        "value": round(pipeline_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": num_cpus,
        "n_images": n_images,
        "images_per_sec": round(n_images / pipeline_sec, 2) if pipeline_sec else 0.0,
        "headline_mode": f"best_of_{max(int(os.environ.get('GRAFT_BENCH_REPS', '2')), 1)}",
    }
    if not docs_only:
        result["pipeline_reps_sec"] = pipeline_reps
    if jfif_p != 0.12:
        result["jfif_p"] = jfif_p
    ray.shutdown()
    return result


def _run_child(n_cpus: int, **extra_env: str) -> dict:
    # children of --scaling/--family/--mix implement their own rep
    # protocol (interleaved fresh processes); the in-process best-of-N
    # would just double every leg's cost
    extra_env.setdefault("GRAFT_BENCH_REPS", "1")
    env = dict(os.environ, RAY_GRAFT_CPUS=str(n_cpus), **extra_env)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:] + "\n" + proc.stderr[-8000:])
        raise RuntimeError(f"bench child at {n_cpus} cpus failed (rc={proc.returncode})")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def run_scaling() -> dict:
    """8-vs-32-CPU scaling efficiency, best-of-N per leg.

    The sandbox VM sits on a noisy hypervisor: CPU-steal / page-fault
    storms intermittently slow ANY run 2-10x for minutes (observed via
    vmstat steal% and first-touch fault microbenchmarks). A single
    back-to-back pair routinely has one leg inside a storm, so each
    leg runs ``GRAFT_SCALING_REPS`` times INTERLEAVED (lo, hi, lo, hi,
    ...) with a settle gap, and the per-leg BEST throughput — the
    standard noisy-neighbor protocol — feeds the efficiency ratio.
    All rep timings are reported for transparency.
    """
    pair = os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(",")
    lo_cpus, hi_cpus = int(pair[0]), int(pair[1])
    reps = int(os.environ.get("GRAFT_SCALING_REPS", "3"))
    settle = int(os.environ.get("GRAFT_SCALING_SETTLE_SEC", "30"))
    runs: dict[int, list[dict]] = {lo_cpus: [], hi_cpus: []}
    for r in range(reps):
        for n in (lo_cpus, hi_cpus):
            runs[n].append(_run_child(n))
            time.sleep(settle)
    best = {n: max(rs, key=lambda d: d["images_per_sec"]) for n, rs in runs.items()}
    rate_lo = best[lo_cpus]["images_per_sec"]
    rate_hi = best[hi_cpus]["images_per_sec"]
    eff = (rate_hi / rate_lo) / (hi_cpus / lo_cpus)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo_cpus,
        "cpus_hi": hi_cpus,
        "reps": reps,
        "sec_lo": best[lo_cpus]["value"],
        "sec_hi": best[hi_cpus]["value"],
        "images_per_sec_lo": rate_lo,
        "images_per_sec_hi": rate_hi,
        "all_sec": {str(n): [d["value"] for d in rs] for n, rs in runs.items()},
        "all_images_per_sec": {
            str(n): [d["images_per_sec"] for d in rs] for n, rs in runs.items()
        },
        "sf": best[hi_cpus]["sf"],
    }


def run_family() -> dict:
    """Doc/embedding family at two widths, >=2 fresh-process reps each
    (r3 verdict #6): per-query wall at 8 and 32 CPUs with per-rep
    spreads, so a one-off regression can't hide as noise."""
    widths = [int(w) for w in os.environ.get("GRAFT_FAMILY_CPUS", "8,32").split(",")]
    reps = int(os.environ.get("GRAFT_FAMILY_REPS", "2"))
    runs: dict[int, list[dict]] = {w: [] for w in widths}
    for _ in range(reps):
        for w in widths:  # interleaved like --scaling (noisy-neighbor protocol)
            runs[w].append(_run_child(w, GRAFT_BENCH_ONLY="docs"))
    qnames = sorted(runs[widths[0]][0]["queries"])
    per_query = {
        q: {
            str(w): {
                "reps_sec": [r["queries"][q] for r in rs],
                "best_sec": min(r["queries"][q] for r in rs),
                "spread": round(
                    (max(r["queries"][q] for r in rs) - min(r["queries"][q] for r in rs))
                    / max(min(r["queries"][q] for r in rs), 1e-9),
                    3,
                ),
            }
            for w, rs in runs.items()
        }
        for q in qnames
    }
    return {
        "metric": "doc_emb_family_two_width",
        "unit": "sec",
        "widths": widths,
        "reps": reps,
        "queries": per_query,
        "sf": runs[widths[0]][0]["sf"],
    }


def run_mix() -> dict:
    """Image pipeline on both corpus mixes (~2% vs ~20% real JFIF rows;
    r3 verdict #8). Same width, fresh process per mix."""
    n = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("GRAFT_MIX_REPS", "1"))
    out: dict[str, list[dict]] = {"default": [], "heavy": []}
    for _ in range(reps):
        out["default"].append(_run_child(n))
        out["heavy"].append(_run_child(n, GRAFT_JFIF_P="1.0"))
    best = {k: max(rs, key=lambda d: d["images_per_sec"]) for k, rs in out.items()}
    return {
        "metric": "img_pipeline_corpus_mix",
        "unit": "sec",
        "num_cpus": n,
        "default_mix": {k: best["default"][k] for k in ("value", "n_images", "images_per_sec")},
        "heavy_mix": {k: best["heavy"][k] for k in ("value", "n_images", "images_per_sec")},
        "all_sec": {k: [d["value"] for d in rs] for k, rs in out.items()},
        "sf": best["default"]["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--family" in sys.argv:
        print(json.dumps(run_family()))
    elif "--mix" in sys.argv:
        print(json.dumps(run_mix()))
    else:
        print(json.dumps(run_bench()))
