#!/usr/bin/env python
"""Regenerate OPERATORS.md — the auto-generated index of every registered
query: key, defining module, one-line description, and driver-verification
status (green row in a past CORRECTNESS_r*.json vs local-parity-only).

Usage: python scripts/dump_operator_index.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from banking_etl_pipeline_spark.registry import (  # noqa: E402
    _MODULES,
    _driver_verified_keys,
    all_queries,
)


def main() -> None:
    verified = _driver_verified_keys()
    key_module: dict[str, str] = {}
    for mod in _MODULES:
        name = mod.__name__.split("banking_etl_pipeline_spark.")[-1]
        for key in mod.QUERIES:
            key_module[key] = name
    queries = all_queries()
    lines = [
        "# OPERATORS — registered query index (auto-generated)",
        "",
        f"{len(queries)} queries, every one with a DuckDB oracle "
        "(hash-compared at sf0.01 by the driver, sf0.001 locally).",
        "'driver-green' = fully-green row in a past CORRECTNESS_r*.json; "
        "'local' = oracle-parity green in tests/driver_sim only (the "
        "registry emits these FIRST so the driver's ~50-entry window "
        "rotates through them).",
        "",
        "Regenerate with `python scripts/dump_operator_index.py`.",
        "",
        "| # | key | module | verified | description |",
        "|---|-----|--------|----------|-------------|",
    ]
    for i, (key, spec) in enumerate(queries.items(), 1):
        status = "driver-green" if key in verified else "local"
        desc = (spec.doc or "").replace("|", "\\|")
        lines.append(
            f"| {i} | `{key}` | {key_module.get(key, '?')} | {status} "
            f"| {desc} |"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "OPERATORS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"OPERATORS.md regenerated: {len(queries)} queries "
          f"({sum(1 for k in queries if k in verified)} driver-green)")


if __name__ == "__main__":
    main()
