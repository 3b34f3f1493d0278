"""Session-scoped reuse of SparkContext broadcasts with LRU eviction.

Operators that ship sizeable read-only payloads to executors (Bloom
filter bit arrays, quantized query matrices, codebooks) previously
called ``SparkContext.broadcast`` on every invocation and never
unpersisted, so a long-lived session running many gate queries
accumulated dead broadcast blocks on the driver and executors
indefinitely (ADVICE r05).  This registry keys each broadcast by a
content digest: repeated calls with an identical payload — the common
case, since gate queries are re-run many times per session — reuse
ONE broadcast, and when the registry overflows its capacity the
least-recently-used entry is ``unpersist()``-ed (non-destructive:
Spark re-ships a broadcast from the driver if a task reads it again
after unpersist, so evicting an entry still referenced by a lazy,
un-executed DataFrame is safe — it costs a re-transfer, never an
error; ``destroy()`` would not be safe here and is never used).

Capacity 32 bounds executor-side residency to ~32 payloads per
session regardless of how many thousands of operator calls are made.
"""

from __future__ import annotations

import hashlib
import threading
from collections import OrderedDict
from typing import Any, Callable

from pyspark.sql import SparkSession

_CAPACITY = 32
# (applicationId, digest) -> Broadcast; guarded by _LOCK — concurrent
# driver threads (a common Spark pattern) would otherwise race a get
# against another thread's LRU eviction (r6 review)
_REGISTRY: OrderedDict[tuple[str, str], Any] = OrderedDict()
_LOCK = threading.Lock()


def payload_digest(*chunks: bytes) -> str:
    """Stable content key for a broadcast payload."""
    h = hashlib.sha256()
    for c in chunks:
        h.update(len(c).to_bytes(8, "little"))
        h.update(c)
    return h.hexdigest()


def shared_broadcast(
    spark: SparkSession, digest: str, factory: Callable[[], Any]
):
    """Return a Broadcast of ``factory()``, reusing a live broadcast
    when one with the same content digest already exists in this
    Spark application.  LRU-evicts (and unpersists) beyond capacity."""
    sc = spark.sparkContext
    key = (sc.applicationId, digest)
    with _LOCK:
        bc = _REGISTRY.get(key)
        if bc is not None:
            _REGISTRY.move_to_end(key)
            return bc
    payload = factory()  # build outside the lock — may be expensive
    with _LOCK:
        bc = _REGISTRY.get(key)  # another thread may have won the race
        if bc is not None:
            _REGISTRY.move_to_end(key)
            return bc
        bc = sc.broadcast(payload)
        _REGISTRY[key] = bc
        evicted = []
        while len(_REGISTRY) > _CAPACITY:
            evicted.append(_REGISTRY.popitem(last=False)[1])
    for old in evicted:
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # app shutting down / broadcast already cleaned
    return bc


def registry_size() -> int:
    with _LOCK:
        return len(_REGISTRY)
