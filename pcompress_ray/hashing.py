"""Deterministic vectorized hashing primitives.

The reference leans on XXH32/64 (utils/xxhash*.c) and SHA-256
(crypto/sha2/, dispatched via crypto/crypto_utils.c:105) for chunk identity
and sketch keys. Here every hot hash is a vectorized numpy kernel over
uint64 lanes; SHA-256 (hashlib, C speed) is used only for per-chunk content
identity where a cryptographic digest is the semantic requirement (M3).

Everything is seed-stable across processes — no reliance on PYTHONHASHSEED.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

U64 = np.uint64
_SPLITMIX_GAMMA = U64(0x9E3779B97F4A7C15)
_MIX1 = U64(0xBF58476D1CE4E5B9)
_MIX2 = U64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer. x: uint64 array → uint64 array."""
    z = x + _SPLITMIX_GAMMA
    z = (z ^ (z >> U64(30))) * _MIX1
    z = (z ^ (z >> U64(27))) * _MIX2
    return z ^ (z >> U64(31))


def hash_strings(values, seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit hash of an array-like of strings (vectorized C path).

    Uses pandas' SipHash-based ``hash_array`` (fixed default key — stable
    across processes/machines), then splitmix with the seed folded in.
    """
    arr = np.asarray(values, dtype=object)
    h = pd.util.hash_array(arr, categorize=False).astype(U64, copy=False)
    if seed:
        h = splitmix64(h ^ U64(seed & 0xFFFFFFFFFFFFFFFF))
    return h


def combine_rows(mat: np.ndarray, seed: int = 0) -> np.ndarray:
    """Hash each row of a (n, k) uint64 matrix to one uint64 (order-sensitive).

    Used for LSH band hashes: band_hash = combine_rows(signature[:, band_slice]).
    """
    acc = np.full(mat.shape[0], U64(seed & 0xFFFFFFFFFFFFFFFF) ^ _SPLITMIX_GAMMA, dtype=U64)
    for j in range(mat.shape[1]):
        acc = splitmix64(acc ^ mat[:, j])
    return acc


def shingle_hashes(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """All k-gram shingle hashes of a token-hash sequence (vectorized).

    Rolling combine: s[i] = mix over (t[i..i+k-1]) with position weights —
    the document-level analog of the reference's rolling polynomial over
    bytes (rabin/rabin_dedup.c:616-714), applied to tokens.
    Returns empty array when len(token_hashes) < k.
    """
    n = token_hashes.shape[0]
    if n < k:
        return np.empty(0, dtype=U64)
    out = np.zeros(n - k + 1, dtype=U64)
    # position-weighted mix so shingles are order-sensitive
    for j in range(k):
        out = splitmix64(out ^ token_hashes[j : n - k + 1 + j])
    return out


def sha256_u64(data: bytes) -> int:
    """First 8 bytes of SHA-256 as uint64 (chunk identity key, M3 analog)."""
    return int.from_bytes(hashlib.sha256(data).digest()[:8], "little")


def md5_hex(data: bytes) -> str:
    """MD5 hex digest — matches DuckDB's md5() for oracle parity."""
    return hashlib.md5(data).hexdigest()


def minhash_params(num_perm: int, seed: int):
    """Deterministic (a, b) parameter vectors for num_perm affine permutations."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 63, size=num_perm, dtype=np.uint64) * U64(2) + U64(1)  # odd
    b = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray,
                      chunk: int = 16384) -> np.ndarray:
    """128-perm MinHash of a uint64 shingle-hash set.

    Document-level reimplementation of the reference's K-min-values sketch
    (heap_nsmallest + XXH32, rabin/rabin_dedup.c:684-706, 973-994) in its
    standard MinHash form: sig[p] = min over shingles of (a[p]*x + b[p]) mod 2^64.
    Processes shingles in chunks so memory stays at num_perm × chunk × 8 bytes.

    Empty input → all-ones signature (matches no non-empty doc).
    """
    num_perm = a.shape[0]
    if shingles.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=U64)
    sig = np.full(num_perm, np.iinfo(np.uint64).max, dtype=U64)
    for s in range(0, shingles.size, chunk):
        block = shingles[s : s + chunk]
        # (P, C) = a[:,None] * block[None,:] + b[:,None]  (mod 2^64 wraparound)
        vals = a[:, None] * block[None, :] + b[:, None]
        np.minimum(sig, vals.min(axis=1), out=sig)
    return sig


def simhash(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash over token hashes (vectorized bit unpack + weighted vote)."""
    if token_hashes.size == 0:
        return 0
    bits = np.unpackbits(token_hashes.view(np.uint8).reshape(-1, 8), axis=1,
                         bitorder="little").astype(np.int64)  # (n, 64)
    if weights is None:
        votes = bits.sum(axis=0) * 2 - token_hashes.size
    else:
        w = weights.astype(np.int64)
        votes = (bits * w[:, None]).sum(axis=0) * 2 - w.sum()
    out = np.uint64(0)
    set_bits = np.flatnonzero(votes > 0)
    for i in set_bits:
        out |= U64(1) << U64(i)
    return int(out)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a, b)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
