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
from tests.oracle_compare import (  # noqa: E402
    _norm,
    duck_connection,
    oracle_type_offenders,
)


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
    # SPARK_GRAFT_ONLY_KEYS=a,b,c restricts the comparison to those keys
    # (debug / resume-after-crash runs); the pending-sha snapshot below is
    # skipped for partial runs so a subset can never masquerade as a full
    # verification.
    only = os.environ.get("SPARK_GRAFT_ONLY_KEYS")
    partial = False
    if only:
        wanted = {k.strip() for k in only.split(",") if k.strip()}
        unknown = wanted - set(q)
        if unknown:
            # a typo'd key list must not print "0/0 ok" and exit 0 — that
            # reads as success on a debug/resume run (ADVICE r6)
            raise SystemExit(
                f"SPARK_GRAFT_ONLY_KEYS names unknown keys: {sorted(unknown)}"
            )
        q = {k: v for k, v in q.items() if k in wanted}
        partial = True
    from pyspark.sql.types import ArrayType, MapType

    bad = []
    for key, fn in q.items():
        sdf = fn(spark, sf)
        # driver-fidelity guard: the driver pandas-sorts result columns and
        # crashes on unhashable cells — a top-level array/map column is an
        # error here even though tuple-ized rows would compare fine locally
        arr_cols = [f.name for f in sdf.schema.fields
                    if isinstance(f.dataType, (ArrayType, MapType))]
        if arr_cols:
            print(f"{key}: ERR array/map output columns {arr_cols}")
            bad.append(key)
            continue
        srows = [
            tuple(_norm(r[c]) for c in sorted(r.asDict())) for r in sdf.collect()
        ]
        if key not in osql:
            print(f"{key}: rows-only ({len(srows)} rows)")
            continue
        # driver-fidelity guard 2: the driver pandas-converts the oracle
        # result, where HUGEINT/DECIMAL(38) become float64/object vs Spark
        # bigint — fetchall() compares exact ints so only DESCRIBE sees it
        bad_types = oracle_type_offenders(con, osql[key])
        if bad_types:
            print(f"{key}: ERR oracle HUGEINT/DECIMAL38 columns {bad_types}")
            bad.append(key)
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
    if not bad and not partial:
        # snapshot each key's oracle sha AT VERIFICATION TIME: the index
        # refresh after the next driver round stamps newly-green keys from
        # this file instead of the then-current SQL, so an oracle edit made
        # between round-landing and the refresh re-queues (safe) instead of
        # being silently certified (scripts/dump_operator_index.py).
        import hashlib
        import json

        shas = {
            k: hashlib.sha256(osql[k].encode()).hexdigest()[:16]
            for k in q if k in osql
        }
        with open(os.path.join(REPO, "ORACLE_SHAS_PENDING.json"), "w") as f:
            json.dump(dict(sorted(shas.items())), f, indent=1)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
