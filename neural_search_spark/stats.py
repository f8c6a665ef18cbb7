"""Engine stats: event counters + build metrics (the Stats API analog).

The reference exposes ``GET /_plugins/_neural/stats`` — per-node event
counters (processor executions, technique executions, query counts;
``stats/events/EventStatName.java``, fan-out
``NeuralStatsTransportAction``) — plus info stats. The Spark restatement:

- **event counters**: a process-local registry incremented by the query
  layer (technique executions, query counts). On a cluster the driver is
  the single coordinator for query planning, so driver-side counting is
  the faithful equivalent of the reference's coordinator counters.
- **build metrics**: per-partition lineage rows from the index manifest
  (rows, wall_s, derived throughput) — the north rule's
  "per-partition lineage + postings-throughput metrics".

``snapshot()`` returns one JSON-able dict; ``reset()`` zeroes events
(mirrors the stats API's since-start semantics).
"""

from __future__ import annotations

import threading
from collections import Counter

_LOCK = threading.Lock()
_EVENTS: Counter[str] = Counter()


def record_event(name: str, n: int = 1) -> None:
    """Increment an event counter (EventStatsManager.increment analog).
    A no-op while the ``stats_enabled`` setting is off
    (``NeuralSearchSettings.java`` NEURAL_STATS_ENABLED, default false:
    "Event stat increment calls are also treated as no-ops")."""
    from neural_search_spark import settings

    if not settings.get("stats_enabled"):
        return
    with _LOCK:
        _EVENTS[name] += n


def reset() -> None:
    with _LOCK:
        _EVENTS.clear()


def event_counts() -> dict[str, int]:
    with _LOCK:
        return dict(_EVENTS)


def build_metrics(index_dir: str) -> dict:
    """Throughput/lineage metrics from an index manifest."""
    from neural_search_spark.index.builder import read_manifest

    entries = read_manifest(index_dir)
    raw = [e for e in entries if e["stage"] == "raw"]
    enc = [e for e in entries if e["stage"] == "postings"]
    upd = [e for e in entries if e["stage"] == "update"]
    raw_rows = sum(e.get("rows", 0) for e in raw)
    raw_wall = sum(e.get("wall_s", 0.0) for e in raw)
    enc_rows = sum(e.get("rows", 0) for e in enc)
    enc_wall = sum(e.get("wall_s", 0.0) for e in enc)
    return {
        "lineage_entries": len(entries),
        "raw_rows": raw_rows,
        "raw_wall_s": round(raw_wall, 3),
        "raw_rows_per_sec": round(raw_rows / raw_wall, 1) if raw_wall else None,
        "encoded_postings": enc_rows,
        "encode_wall_s": round(enc_wall, 3),
        "encode_rows_per_sec": round(enc_rows / enc_wall, 1) if enc_wall else None,
        "updates": len(upd),
    }


def snapshot(index_dir: str | None = None) -> dict:
    """Stats API response analog; refuses (the API's 403) while the
    ``stats_enabled`` setting is off."""
    from neural_search_spark import settings

    if not settings.get("stats_enabled"):
        raise PermissionError(
            "stats API is disabled (settings put('stats_enabled', True) to enable)"
        )
    out: dict = {"events": event_counts()}
    if index_dir is not None:
        out["build"] = build_metrics(index_dir)
    return out
