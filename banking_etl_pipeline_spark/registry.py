"""Central query registry: key → QuerySpec(spark builder, duckdb oracle SQL).

Aggregates every operator module's QUERIES dict. `__spark_entry__.py` exposes
this to the driver; tests/test_oracle_parity.py runs the same comparison
locally at sf0.001.
"""

from __future__ import annotations

from .operators import (
    analytics,
    etl,
    layout,
    quality,
    relational,
    sampling,
    skew,
    windows,
)
from .sources import scan_queries
from .spec import QuerySpec

_MODULES = [relational, windows, quality, scan_queries, etl, analytics, skew,
            sampling, layout]

try:  # extension operators land incrementally; keep the registry importable
    from .operators import dedup as _dedup

    _MODULES.append(_dedup)
except ImportError:  # pragma: no cover
    pass
try:
    from .operators import corpus as _corpus

    _MODULES.append(_corpus)
except ImportError:  # pragma: no cover
    pass
try:
    from .operators import similarity as _similarity

    _MODULES.append(_similarity)
except ImportError:  # pragma: no cover
    pass
try:
    from .operators import text as _text

    _MODULES.append(_text)
except ImportError:  # pragma: no cover
    pass
try:
    from .operators import multimodal as _multimodal

    _MODULES.append(_multimodal)
except ImportError:  # pragma: no cover
    pass
try:
    from .streaming import windows as _stream_windows

    _MODULES.append(_stream_windows)
except ImportError:  # pragma: no cover
    pass
try:
    from .streaming import stateful as _stream_stateful

    _MODULES.append(_stream_stateful)
except ImportError:  # pragma: no cover
    pass


def all_queries() -> dict[str, QuerySpec]:
    out: dict[str, QuerySpec] = {}
    for mod in _MODULES:
        for key, spec in mod.QUERIES.items():
            if key in out:
                raise ValueError(f"duplicate query key {key!r}")
            out[key] = spec
    return out
