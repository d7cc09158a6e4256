#!/usr/bin/env python
"""Fresh-process driver simulation: run the __spark_entry__ contract exactly
as the external verify driver does (entry smoke at sf0.001, queries vs DuckDB
oracle at sf0.01). Used by .claude/skills/verify; not a pytest module."""

from __future__ import annotations

import importlib.util
import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from banking_etl_pipeline_spark.session import get_spark  # noqa: E402
from tests.oracle_compare import _norm, duck_connection  # noqa: E402


def main() -> int:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = get_spark(app_name="driver-sim")

    rows = mod.entry(spark).collect()
    print(f"entry: {len(rows)} rows")
    assert len(rows) > 0, "entry smoke failed"

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
    con = duck_connection(sf)
    q, osql = mod.queries(), mod.oracle_sql()
    if os.environ.get("SPARK_GRAFT_INCLUDE_DEFERRED"):
        # r05 registration rehearsal: run the registration-deferred tiers
        # through the EXACT same comparison as the registered surface.
        from banking_etl_pipeline_spark.registry import (  # noqa: E402
            deferred_queries,
        )

        for key, spec in deferred_queries().items():
            assert key not in q, f"deferred key collides: {key}"
            q[key] = spec.build
            osql[key] = spec.oracle
    bad = []
    for key, fn in q.items():
        sdf = fn(spark, sf)
        srows = [
            tuple(_norm(r[c]) for c in sorted(r.asDict())) for r in sdf.collect()
        ]
        if key not in osql:
            print(f"{key}: rows-only ({len(srows)} rows)")
            continue
        cur = con.execute(osql[key])
        names = [d[0] for d in cur.description]
        cols = sorted(names)
        drows = [
            tuple(_norm(dict(zip(names, row))[c]) for c in cols)
            for row in cur.fetchall()
        ]
        ok = Counter(srows) == Counter(drows) and sorted(sdf.columns) == cols
        print(f"{key}: {'OK' if ok else 'MISMATCH'} ({len(srows)} rows)")
        if not ok:
            bad.append(key)
    print(f"summary: {len(q) - len(bad)}/{len(q)} ok; mismatched: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
