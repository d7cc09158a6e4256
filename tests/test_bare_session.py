"""Driver-session robustness: the external verify driver builds its OWN
SparkSession (not our get_spark), with none of our configs. Run the most
session-config-sensitive queries (timestamp semantics, streaming source) in a
fresh subprocess whose session is a bare `SparkSession.builder.getOrCreate()`
and oracle-compare — proving the catalog's self-healing (UTC pin, nanos
flag) is sufficient without session.py."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys
sys.path.insert(0, "@REPO@")
from pyspark.sql import SparkSession

# bare session: ONLY what a generic driver would set
spark = (SparkSession.builder.appName("bare").master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())

from banking_etl_pipeline_spark.registry import all_queries
from tests.oracle_compare import compare, duck_connection

sf = "@SF@"
con = duck_connection(sf)
qs = all_queries()
failures = []
for key in ["window_lag", "window_range_30d", "streaming_hourly_counts",
            "date_parts", "scd2_intervals"]:
    spec = qs[key]
    res = compare(spec.build(spark, sf), con, spec.oracle)
    ok = res["row_count_match"] and res["columns_match"] and res["values_match"]
    print(key, "OK" if ok else f"FAIL {res['detail'][:200]}")
    if not ok:
        failures.append(key)
sys.exit(1 if failures else 0)
"""


def test_timestamp_queries_survive_a_bare_driver_session():
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, "-c",
         _SCRIPT.replace("@REPO@", REPO).replace("@SF@", sf)],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr(tail):\n{proc.stderr[-2000:]}"
