"""Credit-card transforms — RECONSTRUCTED surface.

The reference documents the entity in full (`docs/credit_card_data.txt:1-14`:
card_type visa/mastercard/amex, card_status active/blocked/expired,
limit/balance/available_credit money columns) but ships no transformer —
`README.md` lists no module and `main.py` never touches cards. Reconstruction
applies the same clean/enrich conventions the reference establishes for the
other entities (canonicalized enums, contradictory fields nulled or
recomputed, derived age/flag columns): everything here is bounded by the data
dictionary, nothing invented beyond it.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schemas import MONEY
from .seed import AS_OF

HIGH_UTILIZATION = 0.80  # share of limit in use that flags a card


def clean_credit_cards(df: DataFrame) -> DataFrame:
    """Drop rows missing PK/FKs, dedupe on PK, canonicalize enums, and
    recompute available_credit — the documented identity
    available_credit = credit_limit − current_balance is restored wherever
    the raw value is missing or inconsistent (decimal math, no doubles)."""
    derived = (F.col("credit_limit") - F.col("current_balance")).cast(MONEY)
    return (
        df.filter(
            F.col("card_id").isNotNull()
            & F.col("customer_id").isNotNull()
            & F.col("account_id").isNotNull()
        )
        .dropDuplicates(["card_id"])
        .withColumn("card_type", F.lower(F.trim(F.col("card_type"))))
        .withColumn("card_status", F.lower(F.trim(F.col("card_status"))))
        .withColumn(
            "available_credit",
            F.when(F.col("available_credit") == derived,
                   F.col("available_credit")).otherwise(derived),
        )
    )


def enrich_credit_cards(df: DataFrame, as_of: dt.date = AS_OF) -> DataFrame:
    """Card age, expiry status, utilization, payment recency, reward tier.

    `status_effective` reconciles the status enum with the expiry date the
    same way accounts reconcile close_date with status: a card past its
    expiry_date is 'expired' regardless of the stored enum."""
    util = F.when(
        F.col("credit_limit") > 0,
        (F.col("current_balance").cast("double")
         / F.col("credit_limit").cast("double")),
    )
    return df.select(
        "*",
        F.datediff(F.lit(as_of), F.col("issue_date")).alias("card_age_days"),
        (F.col("expiry_date") < F.lit(as_of)).alias("is_expired"),
        F.when(F.col("expiry_date") < F.lit(as_of), "expired")
        .otherwise(F.col("card_status"))
        .alias("status_effective"),
        util.alias("utilization"),
        (util >= F.lit(HIGH_UTILIZATION)).alias("is_high_utilization"),
        F.datediff(F.lit(as_of), F.col("last_payment_date")).alias(
            "days_since_payment"
        ),
        F.when(F.col("reward_points") >= 75_000, "platinum")
        .when(F.col("reward_points") >= 25_000, "gold")
        .otherwise("standard")
        .alias("reward_tier"),
    )


def transform_credit_cards(df: DataFrame, as_of: dt.date = AS_OF) -> DataFrame:
    return enrich_credit_cards(clean_credit_cards(df), as_of)
