"""Account transforms — RECONSTRUCTED surface.

The reference orchestrator live-calls ``AccountTransformer.clean_account_data``
/ ``enrich_account_data`` (`/root/reference/src/orchestration/main.py:237-238`)
but no such module exists in the snapshot. Reconstruction is bounded by the
seed schema (`src/seed/data_seed.py:30-42`), the data dictionary
(`docs/account_data.txt`: statuses active/closed/suspended, close_date only
for closed), and the DQ config (`config/config.json:48-61`: required
account_id/customer_id/account_type/open_date, balance ∈ [0, 10M],
interest_rate ∈ [0, 30]).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .seed import AS_OF

DORMANT_AFTER_DAYS = 90


def clean_accounts(df: DataFrame) -> DataFrame:
    """Drop rows missing PK/FK, dedupe on PK, canonicalize enums; a
    close_date on a non-closed account is contradictory → nulled."""
    return (
        df.filter(F.col("account_id").isNotNull()
                  & F.col("customer_id").isNotNull())
        .dropDuplicates(["account_id"])
        .withColumn("account_type", F.lower(F.trim(F.col("account_type"))))
        .withColumn("account_status", F.lower(F.trim(F.col("account_status"))))
        .withColumn("currency", F.upper(F.trim(F.col("currency"))))
        .withColumn(
            "close_date",
            F.when(F.col("account_status") == "closed", F.col("close_date")),
        )
    )


def enrich_accounts(df: DataFrame, as_of: dt.date = AS_OF) -> DataFrame:
    """Account age, activity recency, and a lifecycle stage derived from
    status + activity (closed/suspended pass through; an 'active' account
    with no activity for 90+ days is 'dormant')."""
    days_inactive = F.datediff(F.lit(as_of), F.col("last_activity_date"))
    return df.select(
        "*",
        F.datediff(F.lit(as_of), F.col("open_date")).alias("account_age_days"),
        days_inactive.alias("days_since_activity"),
        (F.col("account_status") == "active").alias("is_active"),
        F.when(F.col("account_status") != "active", F.col("account_status"))
        .when(days_inactive >= DORMANT_AFTER_DAYS, "dormant")
        .otherwise("active")
        .alias("lifecycle_stage"),
    )


def transform_accounts(df: DataFrame, as_of: dt.date = AS_OF) -> DataFrame:
    return enrich_accounts(clean_accounts(df), as_of)
