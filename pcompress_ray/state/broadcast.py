"""Broadcast state helpers: put once, read per actor (never per batch).

The reference shares state through an in-process hashtable guarded by a
semaphore ring (T1/T5). With Ray the equivalent read-mostly state (a label
map, a query matrix, a vocabulary) is ``ray.put`` ONCE on the driver and
``ray.get`` once per actor in ``__init__`` — zero-copy for numpy payloads.
"""

from __future__ import annotations


def put_once(obj):
    import ray

    return ray.put(obj)


class BroadcastReader:
    """Mixin: resolve an ObjectRef once per actor."""

    def __init__(self, ref):
        import ray

        self.value = ray.get(ref)
