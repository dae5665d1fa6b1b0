"""idf — a Ray-Data-native near-duplicate image detection + clustering engine.

From-scratch re-expression of the capabilities of Besnn/ImageDuplicateFinder
(reference at /root/reference, Java; see SURVEY.md) as streaming
``ray.data.Dataset`` pipelines over Arrow-backed tables of
(image_id, bytes, w, h, fmt, caption, phash) rows.

Layout:
  codecs/     pure-numpy image encode/decode (PNG, BMP, deterministic lossy stand-in)
  kernels/    batch-shaped numpy kernels: gray, resize, aHash/dHash/pHash, hamming, minhash
  stages/     Ray Data stages: decode+hash, candidate generation (banding/LSH), CC, plan, apply
  pipelines/  end-to-end dedup pipeline with checkpoint manifest
  state/      run manifest: per-stage commit, per-partition lineage + metrics, resume
  functions/  training-data-pipeline extras: text dedup family, ANN, text quality
  oracle.py   sequential pure-Python reference-equivalent implementation (conformance yardstick)
  synth.py    deterministic synthetic images-table generator (no external data)
"""

__version__ = "0.1.0"


def _patch_ray_http_fs_probe() -> None:
    """Guard a Ray path-resolution race exposed by concurrent stages.

    ``ray.data.datasource.path_util._is_http_filesystem`` attempts
    ``from fsspec.implementations.http import HTTPFileSystem`` on EVERY
    path resolution and catches only ModuleNotFoundError. In this
    container aiohttp is absent, so that import always fails and is
    never cached; when two Datasets resolve paths concurrently (e.g.
    independent stages running in threads), the loser of the import
    race gets a plain ImportError ("cannot import name ...") which
    escapes the except and kills the stage. Local filesystems can never
    be fsspec-HTTP anyway, so short-circuit non-PyFileSystem cases and
    treat ImportError as "not HTTP"."""
    try:
        import ray.data.datasource.path_util as _pu
        from pyarrow.fs import PyFileSystem

        _orig = _pu._is_http_filesystem

        def _safe_is_http_filesystem(fs):
            f = fs
            try:
                if isinstance(f, _pu.RetryingPyFileSystem):
                    f = f.unwrap()
                if not isinstance(f, PyFileSystem):
                    return False
                return _orig(fs)
            except ImportError:
                return False

        _pu._is_http_filesystem = _safe_is_http_filesystem
    except Exception:
        pass  # future Ray versions without this helper need no patch


_patch_ray_http_fs_probe()
