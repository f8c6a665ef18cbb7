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

#: Typed event catalog — name → dotted path, mirroring the reference's
#: ``stats/events/EventStatName.java`` (all 33 entries, verbatim names and
#: paths), plus engine-extension counters for the OpenSearch-CORE query
#: kinds this engine also scores (the plugin's catalog only covers its own
#: surfaces; core kinds like ``match``/``term`` are counted by core, so
#: their Spark analogs live here under the ``query.core`` path and are
#: marked as extensions in the snapshot).
EVENT_CATALOG: dict[str, str] = {
    # --- EventStatName.java verbatim (name -> path) ---
    "text_embedding_executions": "processors.ingest",
    "skip_existing_executions": "processors.ingest",
    "text_chunking_executions": "processors.ingest",
    "text_chunking_fixed_token_length_executions": "processors.ingest",
    "text_chunking_delimiter_executions": "processors.ingest",
    "text_chunking_fixed_char_length_executions": "processors.ingest",
    "semantic_field_executions": "processors.ingest",
    "semantic_field_chunking_executions": "processors.ingest",
    "semantic_highlighting_request_count": "semantic_highlighting",
    "normalization_processor_executions": "processors.search.hybrid",
    "norm_l2_executions": "processors.search.hybrid",
    "norm_minmax_executions": "processors.search.hybrid",
    "norm_zscore_executions": "processors.search.hybrid",
    "comb_arithmetic_executions": "processors.search.hybrid",
    "comb_geometric_executions": "processors.search.hybrid",
    "comb_harmonic_executions": "processors.search.hybrid",
    "rank_based_normalization_processor_executions": "processors.search.hybrid",
    "comb_rrf_executions": "processors.search.hybrid",
    "hybrid_query_requests": "query.hybrid",
    "hybrid_query_with_inner_hits_requests": "query.hybrid",
    "hybrid_query_with_filter_requests": "query.hybrid",
    "hybrid_query_with_pagination_requests": "query.hybrid",
    "neural_query_requests": "query.neural",
    "neural_query_against_knn_requests": "query.neural",
    "neural_query_against_semantic_dense_requests": "query.neural",
    "neural_query_against_semantic_sparse_requests": "query.neural",
    "neural_sparse_query_requests": "query.neural_sparse",
    "text_image_embedding_executions": "processors.ingest",
    "sparse_encoding_executions": "processors.ingest",
    "neural_query_enricher_executions": "processors.search",
    "neural_sparse_two_phase_executions": "processors.search",
    "rerank_by_field_executions": "processors.search",
    "rerank_ml_executions": "processors.search",
    # --- engine extensions: OpenSearch-core query kinds (query.core.*) ---
    "match_query_requests": "query.core",
    "term_query_requests": "query.core",
    "match_phrase_query_requests": "query.core",
    "match_bool_prefix_query_requests": "query.core",
    "prefix_query_requests": "query.core",
    "terms_query_requests": "query.core",
    "fuzzy_query_requests": "query.core",
    "match_all_query_requests": "query.core",
    "ids_query_requests": "query.core",
    "wildcard_query_requests": "query.core",
    "range_query_requests": "query.core",
    "regexp_query_requests": "query.core",
    "mlt_query_requests": "query.core",
    "term_suggest_requests": "query.core",
}

_EXTENSION_PATHS = {"query.core"}


#: Info stat catalog — name → (path, type), mirroring the reference's
#: ``stats/info/InfoStatName.java`` verbatim (all 21 entries). Unlike the
#: event counters these are not incremented at run time: they are COMPUTED
#: from pipeline CONFIGURATIONS on demand (``InfoStatsManager`` scans the
#: cluster's ingest/search pipeline configs; :func:`info_stats` scans the
#: config dicts it is given).
INFO_CATALOG: dict[str, tuple[str, str]] = {
    "cluster_version": ("", "string"),
    "text_embedding_processors_in_pipelines": ("processors.ingest", "counter"),
    "skip_existing_processors": ("processors.ingest", "counter"),
    "text_chunking_processors": ("processors.ingest", "counter"),
    "text_chunking_delimiter_processors": ("processors.ingest", "counter"),
    "text_chunking_fixed_token_length_processors": ("processors.ingest", "counter"),
    "text_chunking_fixed_char_length_processors": ("processors.ingest", "counter"),
    "normalization_processors": ("processors.search.hybrid", "counter"),
    "norm_l2_processors": ("processors.search.hybrid", "counter"),
    "norm_minmax_processors": ("processors.search.hybrid", "counter"),
    "norm_zscore_processors": ("processors.search.hybrid", "counter"),
    "comb_arithmetic_processors": ("processors.search.hybrid", "counter"),
    "comb_geometric_processors": ("processors.search.hybrid", "counter"),
    "comb_harmonic_processors": ("processors.search.hybrid", "counter"),
    "rank_based_normalization_processors": ("processors.search.hybrid", "counter"),
    "comb_rrf_processors": ("processors.search.hybrid", "counter"),
    "text_image_embedding_processors": ("processors.ingest", "counter"),
    "sparse_encoding_processors": ("processors.ingest", "counter"),
    "neural_query_enricher_processors": ("processors.search", "counter"),
    "neural_sparse_two_phase_processors": ("processors.search", "counter"),
    "rerank_by_field_processors": ("processors.search", "counter"),
    "rerank_ml_processors": ("processors.search", "counter"),
}

_NORM_TECHNIQUE_STATS = {
    "l2": "norm_l2_processors",
    "min_max": "norm_minmax_processors",
    "z_score": "norm_zscore_processors",
}
_COMB_TECHNIQUE_STATS = {
    "arithmetic_mean": "comb_arithmetic_processors",
    "geometric_mean": "comb_geometric_processors",
    "harmonic_mean": "comb_harmonic_processors",
    "rrf": "comb_rrf_processors",
}
_CHUNK_ALGORITHM_STATS = {
    "delimiter": "text_chunking_delimiter_processors",
    "fixed_token_length": "text_chunking_fixed_token_length_processors",
    "fixed_char_length": "text_chunking_fixed_char_length_processors",
}
#: ingest processors whose ``skip_existing: true`` config counts toward
#: skip_existing_processors (InfoStatsManager.java:262,278,294)
_SKIP_EXISTING_TYPES = ("text_embedding", "text_image_embedding", "sparse_encoding")


def info_stats(
    ingest_pipelines: list[dict] | None = None,
    search_pipelines: list[dict] | None = None,
) -> dict[str, object]:
    """Info stats computed from pipeline configs (``InfoStatsManager``
    analog): counters over CONFIGURED processors — how many pipelines
    declare a text_embedding / chunking / normalization / rerank
    processor — as opposed to the event counters' executions.

    ``ingest_pipelines``: configs shaped ``{"processors": [{type: cfg}]}``;
    ``search_pipelines``: ``{"request_processors": [...],
    "phase_results_processors": [...], "response_processors": [...]}`` —
    the exact pipeline-JSON shapes the reference scans. Counting rules
    mirror ``InfoStatsManager.java``: chunking with an unrecognized or
    absent algorithm counts as fixed_token_length (the default case, line
    313-316); normalization/RRF processors also count their declared
    technique (missing technique counts nothing extra); a rerank processor
    counts by whichever of ``ml_opensearch`` / ``by_field`` it configures;
    ``skip_existing: true`` on the three embedding ingest types counts
    toward ``skip_existing_processors``. ``cluster_version`` is the engine
    version string (the settable INFO_STRING stat)."""
    from neural_search_spark import __version__

    out: dict[str, object] = {
        name: 0 for name, (_p, t) in INFO_CATALOG.items() if t == "counter"
    }
    out["cluster_version"] = __version__

    def _inc(name: str) -> None:
        out[name] += 1  # type: ignore[operator]

    for pipe in ingest_pipelines or []:
        for proc in pipe.get("processors") or []:
            for ptype, cfg in proc.items():
                cfg = cfg or {}
                if ptype == "text_embedding":
                    _inc("text_embedding_processors_in_pipelines")
                elif ptype == "text_image_embedding":
                    _inc("text_image_embedding_processors")
                elif ptype == "sparse_encoding":
                    _inc("sparse_encoding_processors")
                elif ptype == "text_chunking":
                    _inc("text_chunking_processors")
                    alg = cfg.get("algorithm") or {}
                    key = next(iter(alg), None)
                    _inc(_CHUNK_ALGORITHM_STATS.get(
                        key, "text_chunking_fixed_token_length_processors"
                    ))
                if ptype in _SKIP_EXISTING_TYPES and cfg.get("skip_existing") is True:
                    _inc("skip_existing_processors")
    for pipe in search_pipelines or []:
        for proc in pipe.get("request_processors") or []:
            for ptype in proc:
                if ptype == "neural_query_enricher":
                    _inc("neural_query_enricher_processors")
                elif ptype == "neural_sparse_two_phase_processor":
                    _inc("neural_sparse_two_phase_processors")
        for proc in pipe.get("phase_results_processors") or []:
            for ptype, cfg in proc.items():
                cfg = cfg or {}
                comb = (cfg.get("combination") or {}).get("technique")
                if ptype == "normalization-processor":
                    _inc("normalization_processors")
                    norm = (cfg.get("normalization") or {}).get("technique")
                    if norm in _NORM_TECHNIQUE_STATS:
                        _inc(_NORM_TECHNIQUE_STATS[norm])
                    if comb in _COMB_TECHNIQUE_STATS:
                        _inc(_COMB_TECHNIQUE_STATS[comb])
                elif ptype == "score-ranker-processor":
                    _inc("rank_based_normalization_processors")
                    if comb in _COMB_TECHNIQUE_STATS:
                        _inc(_COMB_TECHNIQUE_STATS[comb])
        for proc in pipe.get("response_processors") or []:
            for ptype, cfg in proc.items():
                if ptype == "rerank":
                    cfg = cfg or {}
                    if "ml_opensearch" in cfg:
                        _inc("rerank_ml_processors")
                    elif "by_field" in cfg:
                        _inc("rerank_by_field_processors")
    return out


def info_stats_by_path(
    ingest_pipelines: list[dict] | None = None,
    search_pipelines: list[dict] | None = None,
) -> dict[str, dict[str, object]]:
    """Info stats nested under their catalog paths (the stats API response
    shape; the root-path ``cluster_version`` sits under ``""``)."""
    flat = info_stats(ingest_pipelines, search_pipelines)
    out: dict[str, dict[str, object]] = {}
    for name, v in flat.items():
        out.setdefault(INFO_CATALOG[name][0], {})[name] = v
    return out


def record_event(name: str, n: int = 1) -> None:
    """Increment an event counter (EventStatsManager.increment analog).
    A no-op while the ``stats_enabled`` setting is off
    (``NeuralSearchSettings.java`` NEURAL_STATS_ENABLED, default false:
    "Event stat increment calls are also treated as no-ops"). Unknown
    names are rejected like ``EventStatName.from`` ("Event stat not
    found") — the catalog is typed, not free-form."""
    from neural_search_spark import settings

    if name not in EVENT_CATALOG:
        raise ValueError(f"Event stat not found: {name}")
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


def event_counts_by_path() -> dict[str, dict[str, int]]:
    """Counters grouped under their catalog path — the response shape of
    the stats API (``EventStatName.getFullPath`` nests each counter under
    its dotted path)."""
    out: dict[str, dict[str, int]] = {}
    for name, n in event_counts().items():
        out.setdefault(EVENT_CATALOG[name], {})[name] = n
    return out


def snapshot(
    index_dir: str | None = None,
    ingest_pipelines: list[dict] | None = None,
    search_pipelines: list[dict] | None = None,
) -> dict:
    """Stats API response analog; refuses (the API's 403) while the
    ``stats_enabled`` setting is off. ``events`` is the flat counter map;
    ``events_by_path`` nests counters under their EventStatName path, with
    engine-extension families flagged. ``info`` carries the InfoStatName
    families — always present like the reference's response (zeroed
    counters + cluster_version when no pipeline configs are registered),
    computed from the given pipeline config dicts."""
    from neural_search_spark import settings

    if not settings.get("stats_enabled"):
        raise PermissionError(
            "stats API is disabled (settings put('stats_enabled', True) to enable)"
        )
    out: dict = {
        "events": event_counts(),
        "events_by_path": event_counts_by_path(),
        "extension_paths": sorted(_EXTENSION_PATHS),
        "info": info_stats_by_path(ingest_pipelines, search_pipelines),
    }
    if index_dir is not None:
        out["build"] = build_metrics(index_dir)
    return out
