"""Pluggable stage registry — the user-extension surface (SURVEY §2.10).

The reference exposes a six-function-pointer plugin interface per codec
(pcompress.c:2993-3127 ``init_algo``, docs/ADDING_ALGORITHMS.md) and a
per-subtype archive-filter table (archive/pc_arc_filter.c:71-125). The Ray
analog: named slots for the swappable pipeline roles — ``chunker``,
``signature``, ``verifier``, ``components`` — each mapping a name to a
factory ``(cfg: PipelineConfig) -> stage callable``. Users register their
own with ``@register("chunker", "mychunker")`` and select by name in config
or at pipeline call time.

Registration is process-local; pipelines resolve names lazily at build time
(the factory and its module travel to workers by value via runtime.py).
"""

from __future__ import annotations

from collections.abc import Callable

_SLOTS = ("chunker", "signature", "verifier", "components", "codec")
_REGISTRY: dict[str, dict[str, Callable]] = {s: {} for s in _SLOTS}


def register(slot: str, name: str):
    """Decorator: register a stage factory under (slot, name)."""
    if slot not in _SLOTS:
        raise KeyError(f"unknown slot {slot!r}; have {_SLOTS}")

    def deco(factory: Callable) -> Callable:
        _REGISTRY[slot][name] = factory
        return factory

    return deco


def resolve(slot: str, name: str) -> Callable:
    try:
        return _REGISTRY[slot][name]
    except KeyError:
        raise KeyError(
            f"no {slot!r} stage named {name!r}; registered: "
            f"{sorted(_REGISTRY.get(slot, {}))}") from None


def names(slot: str) -> list[str]:
    return sorted(_REGISTRY[slot])


# ---- built-ins -----------------------------------------------------------

@register("chunker", "rabin")
def _rabin_chunker(cfg):
    from pcompress_ray.stages.cdc import CDCChunker

    return CDCChunker(cfg, text_col="text_norm", mode="rabin")


@register("chunker", "fixed")
def _fixed_chunker(cfg):
    from pcompress_ray.stages.cdc import CDCChunker

    return CDCChunker(cfg, text_col="text_norm", mode="fixed")


@register("signature", "minhash")
def _minhash_signature(cfg):
    from pcompress_ray.stages.signatures import SignatureStage

    return SignatureStage(cfg)


@register("verifier", "kmv")
def _kmv_verifier(cfg):
    from pcompress_ray.stages.verify import verify_candidates

    return verify_candidates


@register("components", "min_label")
def _min_label_components(cfg):
    from pcompress_ray.pipelines.dedup import resolve_components

    return resolve_components


def _codec_factory(name):
    def factory(cfg):
        from pcompress_ray.stages.compress import compress_chunk, decompress_chunk

        preset = cfg.archive_lzma_preset

        def pair():
            return (lambda d: compress_chunk(d, name, preset=preset),
                    lambda d: decompress_chunk(d, name))

        return pair()

    return factory


# M10 analog: one uniform (compress, decompress) pair per codec name
# (pcompress.h:126-314's *_compress/_decompress vtable). zstd/lz4 are
# probe-guarded: registered iff their wheel imports on this host, so
# names("codec") honestly reflects what a pipeline here can run.
from pcompress_ray.stages.compress import OPTIONAL_CODECS as _OPT  # noqa: E402

for _name in ("none", "zlib", "bz2", "lzma") + _OPT:
    register("codec", _name)(_codec_factory(_name))
