"""Driver-visible queries for the ETL surface: the staged-upsert merge
(K3, `readshift_loader.py:68-149`) expressed as a pure oracled query, and the
full banking transaction transform chain (clean→enrich→metrics→anomalies,
`transaction_transform.py:22-179`) over the deterministic distributed seed as
a rows-only check (its input is generated, not a driver table, so there is no
SQL oracle for it — correctness is covered by tests/test_banking_pipeline.py's
hand-computed expectations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..domain.seed import seed_all
from ..domain.transactions import transform_transactions
from ..sinks.writers import merge_upsert as _merge
from ..spec import QuerySpec


def merge_upsert_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert an 'updates' slice of customer into a 'target' slice: matched
    keys take the update row, unmatched target rows survive."""
    c = table(spark, sf_dir, "customer")
    target = c.filter(F.col("c_custkey") <= 1000).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    updates = c.filter(F.col("c_custkey").between(500, 1500)).select(
        "c_custkey",
        "c_name",
        (F.col("c_acctbal") + 100).alias("c_acctbal"),
    )
    return _merge(target, updates, ["c_custkey"])


MERGE_UPSERT_SQL = """
WITH target AS (
  SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey <= 1000
),
updates AS (
  SELECT c_custkey, c_name, c_acctbal + 100 AS c_acctbal
  FROM customer WHERE c_custkey BETWEEN 500 AND 1500
)
SELECT * FROM updates
UNION ALL
SELECT t.*
FROM target t LEFT JOIN updates u ON t.c_custkey = u.c_custkey
WHERE u.c_custkey IS NULL
"""


def banking_txn_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed (deterministic, distributed) → full transaction transform chain."""
    data = seed_all(spark, num_customers=200, num_accounts=300,
                    num_transactions=3000)
    return transform_transactions(data["transactions"])


QUERIES: dict[str, QuerySpec] = {
    "merge_upsert": QuerySpec(
        merge_upsert_query, MERGE_UPSERT_SQL,
        "staged-upsert MERGE semantics as a pure anti-join + union",
    ),
    "banking_txn_pipeline": QuerySpec(
        banking_txn_pipeline, None,
        "full clean/enrich/metrics/anomaly chain on seeded banking data",
    ),
}
