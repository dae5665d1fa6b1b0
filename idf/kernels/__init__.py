from idf.kernels.hamming import hamming_distance, pairwise_hamming, popcount64
from idf.kernels.hashes import HASHERS, ahash64, dhash64, hash_image, phash64, preprocess
from idf.kernels.preprocess import bilinear_resize, luma601_u8

__all__ = [
    "HASHERS",
    "ahash64",
    "dhash64",
    "phash64",
    "hash_image",
    "preprocess",
    "bilinear_resize",
    "luma601_u8",
    "hamming_distance",
    "pairwise_hamming",
    "popcount64",
]
