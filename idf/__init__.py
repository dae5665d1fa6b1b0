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
