"""Per-chunk compression wrappers + adaptive codec selection (M10 / M11).

The reference exposes a uniform ``*_compress/_decompress`` vtable over its
codec zoo (pcompress.h:126-314) and an adaptive selector that routes each
chunk by the analyzer's content type — PPMD for text, Zstd/LZMA/Bzip2 for
binary, LZ4 for incompressible data (adaptive_compress.c:324-430). This
module reimplements that pattern over the stdlib codecs available here:

    lzma  — the PPMD/LZMA slot (strong, text)
    bz2   — available as an explicit choice
    zlib  — the Zstd slot (fast, binary)
    none  — the incompressible slot: a chunk whose compressed form is not
            strictly smaller is stored raw. This is also the per-chunk
            dedupe/compress gain gate (A3 analog,
            rabin/rabin_dedup.c:1250-1257): never spend bytes to save none.

Chunk-level routing uses the analyzer's 30%-significance byte-histogram rule
(filters/analyzer/analyzer.c:81-92): BINARY iff (#bytes>127 + #bytes<32)
exceeds 30% of the chunk, else TEXT.

The per-chunk Python loop is deliberate: each iteration is one C-level codec
call on a 1-64 KiB payload (the useful work); there is nothing to vectorize
above it, and the stage parallelizes across batches/actors in Ray.
"""

from __future__ import annotations

import bz2
import lzma
import zlib

import numpy as np

_MAGIC_BY_CODEC = {"none", "zlib", "bz2", "lzma"}


def compress_chunk(data: bytes, codec: str, preset: int = 1) -> bytes:
    """M10-style uniform wrapper: codec name → compressed payload."""
    if codec == "none":
        return data
    if codec == "zlib":
        return zlib.compress(data, 6)
    if codec == "bz2":
        return bz2.compress(data, 1)
    if codec == "lzma":
        return lzma.compress(data, preset=preset)
    raise ValueError(f"unknown codec {codec!r}")


def decompress_chunk(data: bytes, codec: str) -> bytes:
    if codec == "none":
        return data
    if codec == "zlib":
        return zlib.decompress(data)
    if codec == "bz2":
        return bz2.decompress(data)
    if codec == "lzma":
        return lzma.decompress(data)
    raise ValueError(f"unknown codec {codec!r}")


def is_text_chunk(data: bytes) -> bool:
    """Analyzer btype_30 rule on one chunk (analyzer.c:81-92)."""
    if not data:
        return True
    b = np.frombuffer(data, dtype=np.uint8)
    tot8b = int((b > 127).sum()) + int((b < 32).sum())
    return tot8b * 10 <= b.size * 3


def select_and_compress(data: bytes, codec_text: str, codec_binary: str,
                        preset: int = 1) -> tuple[str, bytes]:
    """Adaptive route-then-gate for one chunk (adaptive_compress.c:324-430).

    Returns (codec, payload); codec == "none" when compression would not
    shrink the chunk (incompressible slot + A3 gain gate).
    """
    codec = codec_text if is_text_chunk(data) else codec_binary
    payload = compress_chunk(data, codec, preset=preset)
    if len(payload) >= len(data):
        return "none", data
    return codec, payload
