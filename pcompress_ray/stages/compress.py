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

# pcompress.h:126-314 parity: the reference's vtable also carries
# zstd/lz4 slots. Those wheels are NOT stdlib — probe-guard them so the
# registry is honest about what this host can actually run (entries
# appear iff the wheel imports; absent here, present on capable hosts).
try:
    import zstandard as _zstd
except ImportError:                                    # pragma: no cover
    _zstd = None
try:
    import lz4.frame as _lz4f
except ImportError:                                    # pragma: no cover
    _lz4f = None

#: codec names whose wheel imported on THIS host (() in the test container)
OPTIONAL_CODECS = tuple(
    n for n, m in (("zstd", _zstd), ("lz4", _lz4f)) if m is not None)

import numpy as np

_MAGIC_BY_CODEC = {"none", "zlib", "bz2", "lzma"}


def compress_chunk(data: bytes, codec: str, preset: int = 1) -> bytes:
    """M10-style uniform wrapper: codec name → compressed payload.

    Codec names compose with the preprocessing filters as
    "<filter>+<codec>" (e.g. "delta2+zlib") — the reference's level>4
    filter-then-compress chain (pcompress.c:3698-3741); the filter name is
    recorded in the chunk's codec tag so restore needs no side channel."""
    if "+" in codec:
        from pcompress_ray.stages.filters import delta2_encode, lzp_encode

        fname, codec = codec.split("+", 1)
        data = {"delta2": delta2_encode, "lzp": lzp_encode}[fname](data)
        if data is None:
            raise ValueError(
                f"{fname} filter found no gain on this chunk; use "
                "select_and_compress, which gates filters per chunk")
    if codec == "none":
        return data
    if codec == "zlib":
        return zlib.compress(data, 6)
    if codec == "bz2":
        return bz2.compress(data, 1)
    if codec == "lzma":
        return lzma.compress(data, preset=preset)
    if codec == "zstd":
        if _zstd is None:
            raise ValueError("zstd codec unavailable on this host "
                             "(zstandard wheel not installed)")
        return _zstd.ZstdCompressor(level=3).compress(data)
    if codec == "lz4":
        if _lz4f is None:
            raise ValueError("lz4 codec unavailable on this host "
                             "(lz4 wheel not installed)")
        return _lz4f.compress(data)
    raise ValueError(f"unknown codec {codec!r}")


def decompress_chunk(data: bytes, codec: str) -> bytes:
    if "+" in codec:
        from pcompress_ray.stages.filters import delta2_decode, lzp_decode

        fname, codec = codec.split("+", 1)
        return {"delta2": delta2_decode, "lzp": lzp_decode}[fname](
            decompress_chunk(data, codec))
    if codec == "none":
        return data
    if codec == "zlib":
        return zlib.decompress(data)
    if codec == "bz2":
        return bz2.decompress(data)
    if codec == "lzma":
        return lzma.decompress(data)
    if codec == "zstd":
        if _zstd is None:
            raise ValueError("zstd codec unavailable on this host "
                             "(zstandard wheel not installed)")
        return _zstd.ZstdDecompressor().decompress(data)
    if codec == "lz4":
        if _lz4f is None:
            raise ValueError("lz4 codec unavailable on this host "
                             "(lz4 wheel not installed)")
        return _lz4f.decompress(data)
    raise ValueError(f"unknown codec {codec!r}")


def is_text_chunk(data: bytes) -> bool:
    """Analyzer btype_30 rule on one chunk (analyzer.c:81-92)."""
    if not data:
        return True
    b = np.frombuffer(data, dtype=np.uint8)
    tot8b = int((b > 127).sum()) + int((b < 32).sum())
    return tot8b * 10 <= b.size * 3


def select_and_compress(data: bytes, codec_text: str, codec_binary: str,
                        preset: int = 1,
                        filters: tuple = ()) -> tuple[str, bytes]:
    """Adaptive route-then-gate for one chunk (adaptive_compress.c:324-430).

    Returns (codec, payload); codec == "none" when compression would not
    shrink the chunk (incompressible slot + A3 gain gate). With
    ``filters=("delta2",)`` BINARY chunks additionally try the Delta2
    strided-RLE prefilter (the reference's level>4 auto-enable,
    pcompress.c:3698-3741 — text chunks skip it, as there) and keep the
    filtered encoding only when the final payload is strictly smaller;
    "lzp" does the same for TEXT chunks (default-off: per-byte Python).
    """
    text = is_text_chunk(data)
    codec = codec_text if text else codec_binary
    payload = compress_chunk(data, codec, preset=preset)
    best_codec, best = codec, payload
    if "delta2" in filters and not text:
        from pcompress_ray.stages.filters import delta2_encode

        pre = delta2_encode(data)
        if pre is not None:
            fp = compress_chunk(pre, codec, preset=preset)
            if len(fp) < len(best):
                best_codec, best = f"delta2+{codec}", fp
    if "lzp" in filters and text:
        from pcompress_ray.stages.filters import lzp_encode

        pre = lzp_encode(data)
        if pre is not None:
            fp = compress_chunk(pre, codec, preset=preset)
            if len(fp) < len(best):
                best_codec, best = f"lzp+{codec}", fp
    if len(best) >= len(data):
        return "none", data
    return best_codec, best
