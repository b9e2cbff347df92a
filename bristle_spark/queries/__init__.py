"""Query modules; importing this package populates the registry.

Modules are imported defensively so a single broken optional dependency
doesn't take down the whole declared-query surface.
"""

from importlib import import_module

_MODULES = (
    "relational",
    "analytic",
    "stats_q",
    "stats_tests",
    "transcode_q",
    "llm",
    "dedup",
    "textops",
    "corpus",
    "similarity",
    "geo",
    "graph",
    "streaming_q",
    "multimodal_q",
)

for _m in _MODULES:
    try:
        import_module(f"bristle_spark.queries.{_m}")
    except ModuleNotFoundError as exc:
        if f"bristle_spark.queries.{_m}" not in str(exc):
            raise
