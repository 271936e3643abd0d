"""Runtime plumbing: make the (uninstalled) package usable by Ray workers.

The package lives in a plain repo directory, not site-packages. Ray worker
processes deserialize `map_batches` callables by module reference, which
fails when the module isn't importable on the worker. The public, documented
fix (Ray serialization guide) is ``ray.cloudpickle.register_pickle_by_value``:
functions/classes from registered modules are serialized by VALUE (code +
referenced globals travel inside the task spec), so workers need nothing on
their import path.

Cost: a few tens of KB per task-spec (the CDC byte tables and code objects) —
amortized across all batches a task/actor processes; negligible vs data
movement. On a real cluster with the package properly installed via
``runtime_env={"py_modules": [...]}`` or an image, ``register()`` is a no-op
semantically (by-value just becomes redundant).
"""

from __future__ import annotations

import importlib
import sys

_REGISTERED = False

_SUBMODULES = [
    "pcompress_ray.config",
    "pcompress_ray.hashing",
    "pcompress_ray.registry",
    "pcompress_ray.runtime",
    "pcompress_ray.stages.cdc",
    "pcompress_ray.stages.extract",
    "pcompress_ray.stages.signatures",
    "pcompress_ray.stages.exact",
    "pcompress_ray.stages.candidates",
    "pcompress_ray.stages.verify",
    "pcompress_ray.stages.components",
    "pcompress_ray.stages.textstats",
    "pcompress_ray.stages.ann",
    "pcompress_ray.stages.multimodal",
    "pcompress_ray.stages.suffix",
    "pcompress_ray.stages.locality",
    "pcompress_ray.sources.corpus",
    "pcompress_ray.functions.ops",
    "pcompress_ray.functions.bloom",
    "pcompress_ray.pipelines.dedup",
    "pcompress_ray.pipelines.incremental",
    "pcompress_ray.pipelines.checkpoint",
]


def register() -> None:
    """Idempotently register every package module for pickle-by-value."""
    global _REGISTERED
    if _REGISTERED:
        return
    from ray import cloudpickle

    import pcompress_ray

    mods = [pcompress_ray]
    for name in _SUBMODULES:
        try:
            mods.append(importlib.import_module(name))
        except ImportError:
            continue  # module not written yet / optional
    for m in mods:
        try:
            cloudpickle.register_pickle_by_value(m)
        except Exception:
            pass
    _REGISTERED = True


def repo_root() -> str:
    import os

    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ensure_path() -> None:
    r = repo_root()
    if r not in sys.path:
        sys.path.insert(0, r)
