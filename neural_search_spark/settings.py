"""Cluster-settings surface (``settings/NeuralSearchSettings.java:21-42``
analog): one process-wide, validated, dynamically-updatable config dict
plumbed into the engine limits that were previously module constants.

The reference registers typed ``Setting`` objects (node/index scope,
dynamic) with defaults; the Spark restatement is a flat registry keyed by
the reference's setting names where they exist, plus the engine's own
Spark-shaped limits (documented per entry). ``override()`` is the test /
per-job analog of a transient cluster-settings update.

On a real cluster these would be ``spark.neural_search.*`` conf entries
read once per driver; a process-local dict is the faithful single-
coordinator equivalent (settings are consulted at plan time, which happens
on the driver).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Any, Callable, Iterator

_LOCK = threading.Lock()


def _positive_int(v: Any) -> int:
    i = int(v)
    if i <= 0:
        raise ValueError("must be a positive integer")
    return i


def _bool(v: Any) -> bool:
    if isinstance(v, bool):
        return v
    raise ValueError("must be a boolean")


def _bounded_int(lo: int, hi: int) -> Callable[[Any], int]:
    def check(v: Any) -> int:
        i = int(v)
        if not (lo <= i <= hi):
            raise ValueError(f"must be an integer in [{lo}, {hi}]")
        return i

    return check


#: name -> (default, validator). Names mirror NeuralSearchSettings.java
#: where a reference setting exists; engine-limit entries are the Spark
#: analogs of Lucene-side constants (documented inline).
_REGISTRY: dict[str, tuple[Any, Callable[[Any], Any]]] = {
    # NeuralSearchSettings.java: plugins.neural_search.reranker_max_document_fields (default 50)
    "reranker_max_document_fields": (50, _positive_int),
    # NeuralSearchSettings.java: plugins.neural_search.stats_enabled
    # (default FALSE — stats calls 403 and event increments no-op when off)
    "stats_enabled": (False, _bool),
    # NeuralSearchSettings.java: index.neural_search.semantic_ingest_batch_size
    # (intSetting default 10, min 1, max 100) — consumed by the ingest
    # inference path (pipeline/multimodal.py) as the model micro-batch size.
    "semantic_ingest_batch_size": (10, _bounded_int(1, 100)),
    # Spark analog of BooleanQuery.maxClauseCount: the cap on BROADCASTING
    # a multi-term expansion before the semi-join falls back to a shuffle
    # (search/bm25.py MAX_BROADCAST_EXPANSION).
    "max_broadcast_expansion": (65536, _positive_int),
    # HybridQueryBuilder.java:67 MAX_NUMBER_OF_SUB_QUERIES
    "hybrid_max_sub_queries": (5, _positive_int),
}

_VALUES: dict[str, Any] = {}


def get(name: str) -> Any:
    """Current value (override if set, else the registered default)."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown setting {name!r}")
    with _LOCK:
        if name in _VALUES:
            return _VALUES[name]
    return _REGISTRY[name][0]


def put(name: str, value: Any) -> None:
    """Dynamic update (cluster-settings PUT analog); validated."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown setting {name!r}")
    v = _REGISTRY[name][1](value)
    with _LOCK:
        _VALUES[name] = v


def reset(name: str | None = None) -> None:
    """Drop overrides (one setting, or all) back to defaults."""
    with _LOCK:
        if name is None:
            _VALUES.clear()
        else:
            _VALUES.pop(name, None)


def as_dict() -> dict[str, Any]:
    """Snapshot of every setting's effective value."""
    return {n: get(n) for n in _REGISTRY}


@contextmanager
def override(**kwargs: Any) -> Iterator[None]:
    """Scoped settings override (transient cluster-settings update).

    All values are validated BEFORE any is applied, so a failed override
    leaves no partial state (the reference's cluster-settings update is
    likewise all-or-nothing per request).
    """
    validated: dict[str, Any] = {}
    for n, v in kwargs.items():
        if n not in _REGISTRY:
            raise KeyError(f"unknown setting {n!r}")
        validated[n] = _REGISTRY[n][1](v)
    saved: dict[str, tuple[bool, Any]] = {}
    try:
        for n, v in validated.items():
            with _LOCK:
                saved[n] = (n in _VALUES, _VALUES.get(n))
                _VALUES[n] = v
        yield
    finally:
        with _LOCK:
            for n, (had, old) in saved.items():
                if had:
                    _VALUES[n] = old
                else:
                    _VALUES.pop(n, None)
