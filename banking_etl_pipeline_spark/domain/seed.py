"""Deterministic, fully-distributed synthetic banking data.

Capability parity with the reference seeder
(`/root/reference/src/seed/data_seed.py:63-232`), re-architected Spark-first:
the reference builds Python lists on the driver and ships them via
``createDataFrame`` (with ``collect()`` round-trips for FK sampling and an
unseeded ``random`` + ``datetime.now()``, so it is neither scalable nor
reproducible). Here every entity is ``spark.range(n)`` plus pure column
expressions — hash-derived pseudo-randomness, a fixed ``as_of`` clock, and FK
sampling via an equi-join against a row-numbered key table. Generating 10^9
rows is the same plan as 10^4, sharded across executors.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long
from .schemas import MONEY

AS_OF = dt.date(2025, 6, 29)  # reference snapshot date; fixed clock
SEED = 42

FIRST_NAMES = ["James", "Mary", "John", "Patricia", "Robert",
               "Jennifer", "Michael", "Linda", "William", "Elizabeth"]
LAST_NAMES = ["Smith", "Johnson", "Williams", "Jones", "Brown",
              "Davis", "Miller", "Wilson", "Moore", "Taylor"]
STATES = ["CA", "NY", "TX", "FL", "IL", "PA", "OH", "GA", "NC", "MI"]
CITIES = ["Los Angeles", "New York", "Houston", "Miami", "Chicago",
          "Philadelphia", "Columbus", "Atlanta", "Charlotte", "Detroit"]
RISK_SEGMENTS = ["Low", "Medium", "High"]
ACCOUNT_TYPES = ["checking", "savings", "investment"]
ACCOUNT_STATUSES = ["active", "closed", "suspended"]
CURRENCIES = ["USD", "EUR", "GBP"]
# mixed-case on purpose: the raw zone carries unstandardized type strings,
# which clean_transactions canonicalizes (transaction_transform.py:45-50)
TRANSACTION_TYPES = ["deposit", "DEPOSIT", "Deposit", "withdrawal",
                     "WITHDRAWAL", "Withdrawal", "transfer", "Transfer",
                     "payment", "PAYMENT", "Payment"]
MERCHANT_CATEGORIES = ["grocery", "restaurant", "retail",
                       "travel", "utility", "entertainment"]
TRANSACTION_STATUSES = ["completed", "pending", "failed", "reversed"]
CHANNELS = ["online", "mobile", "branch", "atm"]
LOCATIONS = ["USA", "Canada", "UK", "France", "Germany",
             "Japan", "Australia", "Brazil", "Mexico", "China"]


def _u(entity: str, field: str, n: int | Column) -> Column:
    """Deterministic uniform int in [0, n) from (SEED, entity, field, id)."""
    h = md5_long(F.format_string(f"{SEED}:{entity}:{field}:%d", F.col("id")))
    return h % (F.lit(n) if isinstance(n, int) else n)


def _pick(entity: str, field: str, values: list[str]) -> Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_u(entity, field, len(values)) + 1).cast("int"))


def _money(entity: str, field: str, lo: float, hi: float) -> Column:
    cents = _u(entity, field, int((hi - lo) * 100))
    return (F.lit(lo) + cents / F.lit(100.0)).cast(MONEY)


def _days_ago(entity: str, field: str, max_days: int) -> Column:
    return F.date_sub(F.lit(AS_OF), _u(entity, field, max_days + 1).cast("int"))


def seed_customers(spark: SparkSession, n: int = 1000) -> DataFrame:
    """≅ generate_customers (data_seed.py:63-106), distributed."""
    e = "cust"
    first = _pick(e, "first", FIRST_NAMES)
    last = _pick(e, "last", LAST_NAMES)
    age_days = (_u(e, "age_y", 60) + 21) * 365 + _u(e, "age_d", 365)
    return spark.range(n).select(
        F.format_string("CUST%06d", F.col("id")).alias("customer_id"),
        first.alias("first_name"),
        last.alias("last_name"),
        F.date_sub(F.lit(AS_OF), age_days.cast("int")).alias("date_of_birth"),
        F.concat(F.lower(first), F.lit("."), F.lower(last),
                 F.lit("@example.com")).alias("email"),
        F.format_string(
            "555-%03d-%04d",
            (_u(e, "ph1", 900) + 100).cast("int"),
            (_u(e, "ph2", 9000) + 1000).cast("int"),
        ).alias("phone_number"),
        F.format_string("%d Main St",
                        (_u(e, "addr", 9900) + 100).cast("int")).alias("address"),
        _pick(e, "city", CITIES).alias("city"),
        _pick(e, "state", STATES).alias("state"),
        F.format_string("%05d",
                        (_u(e, "zip", 90000) + 10000).cast("int")).alias("zip_code"),
        F.lit("USA").alias("country"),
        _days_ago(e, "since", 10 * 365).alias("customer_since"),
        (_u(e, "score", 551) + 300).cast("int").alias("credit_score"),
        _pick(e, "risk", RISK_SEGMENTS).alias("risk_segment"),
    )


def seed_accounts(spark: SparkSession, n: int = 1500,
                  num_customers: int = 1000) -> DataFrame:
    """≅ generate_accounts (data_seed.py:111-155). FK sampling is a hash mod
    over the dense customer-id domain instead of a driver collect()."""
    e = "acct"
    status = _pick(e, "status", ACCOUNT_STATUSES)
    return spark.range(n).select(
        F.format_string("ACC%08d", F.col("id")).alias("account_id"),
        F.format_string("CUST%06d",
                        _u(e, "cust_fk", num_customers)).alias("customer_id"),
        _pick(e, "type", ACCOUNT_TYPES).alias("account_type"),
        status.alias("account_status"),
        _days_ago(e, "open", 5 * 365).alias("open_date"),
        F.when(status == "closed",
               _days_ago(e, "close", 365)).alias("close_date"),
        _pick(e, "ccy", CURRENCIES).alias("currency"),
        F.format_string("BR%03d",
                        (_u(e, "branch", 900) + 100).cast("int")).alias("branch_id"),
        (F.lit(0.01) + _u(e, "rate", 499_000) / F.lit(100_000.0)).alias("interest_rate"),
        _money(e, "bal", 0.0, 100_000.0).alias("balance"),
        _days_ago(e, "activity", 30).alias("last_activity_date"),
    )


def seed_transactions(spark: SparkSession, accounts: DataFrame,
                      n: int = 10_000) -> DataFrame:
    """≅ generate_transactions (data_seed.py:160-232).

    The reference collects active account ids to the driver and samples with
    ``random.choice`` (data_seed.py:171-176). Distributed form: row-number the
    active accounts into a dense [0, n_active) index and equi-join generated
    transactions on a hashed index — broadcast-able dim join, no collect.
    """
    e = "txn"
    active = (
        accounts.filter(F.col("account_status") == "active")
        .select("account_id")
        .withColumn(
            "_idx",
            F.row_number().over(Window.orderBy("account_id")) - 1,
        )
    )
    n_active = active.count()
    secs_ago = (
        _u(e, "days", 91) * 86_400 + _u(e, "hours", 25) * 3_600
        + _u(e, "mins", 60) * 60 + _u(e, "secs", 60)
    )
    epoch_as_of = int(
        dt.datetime.combine(AS_OF, dt.time(12, 0), dt.timezone.utc).timestamp()
    )
    location = _pick(e, "loc", LOCATIONS)
    base = spark.range(n).select(
        F.concat(F.lit("TXN-"), F.md5(F.format_string(f"{SEED}:txn:%d", F.col("id"))))
        .alias("transaction_id"),
        _u(e, "acct_fk", n_active).cast("int").alias("_idx"),
        F.timestamp_seconds(F.lit(epoch_as_of) - secs_ago).alias("transaction_date"),
        _pick(e, "type", TRANSACTION_TYPES).alias("transaction_type"),
        _money(e, "amount", 10.0, 5_000.0).alias("amount"),
        _pick(e, "ccy", CURRENCIES).alias("currency"),
        F.when(_u(e, "desc_null", 20) > 0,
               F.format_string("purchase %d", F.col("id"))).alias("description"),
        F.when(_u(e, "merch_null", 20) > 0,
               F.format_string("Merchant %03d", _u(e, "merch", 500))).alias("merchant_name"),
        _pick(e, "mcat", MERCHANT_CATEGORIES).alias("merchant_category"),
        _pick(e, "status", TRANSACTION_STATUSES).alias("transaction_status"),
        _pick(e, "channel", CHANNELS).alias("channel"),
        location.alias("location"),
        (location != "USA").alias("is_international"),
    )
    return base.join(F.broadcast(active), "_idx").drop("_idx").select(
        "transaction_id", "account_id", "transaction_date", "transaction_type",
        "amount", "currency", "description", "merchant_name",
        "merchant_category", "transaction_status", "channel", "location",
        "is_international",
    )


CARD_TYPES = ["visa", "VISA", "Visa", "mastercard", "Mastercard", "amex"]
CARD_STATUSES = ["active", "blocked", "expired"]


def seed_credit_cards(spark: SparkSession, n: int = 800,
                      num_customers: int = 1000,
                      num_accounts: int = 1500) -> DataFrame:
    """Credit cards — the reference documents this entity
    (`docs/credit_card_data.txt:1-14`) but ships no generator or transform;
    volumes and the mixed-case raw-zone convention follow the other seeds.
    available_credit is deliberately left inconsistent on ~1/3 of rows
    (null) so the transform's recompute path is exercised."""
    e = "card"
    limit = _money(e, "limit", 1_000.0, 50_000.0)
    balance = _money(e, "bal", 0.0, 20_000.0)
    issue = _days_ago(e, "issue", 6 * 365)
    return spark.range(n).select(
        F.format_string("CARD%08d", F.col("id")).alias("card_id"),
        F.format_string("CUST%06d",
                        _u(e, "cust_fk", num_customers)).alias("customer_id"),
        F.format_string("ACC%08d",
                        _u(e, "acct_fk", num_accounts)).alias("account_id"),
        _pick(e, "type", CARD_TYPES).alias("card_type"),
        _pick(e, "status", CARD_STATUSES).alias("card_status"),
        issue.alias("issue_date"),
        F.date_add(issue, (_u(e, "life_y", 3) * 365 + 1095).cast("int"))
        .alias("expiry_date"),
        limit.alias("credit_limit"),
        balance.alias("current_balance"),
        F.when(_u(e, "avail_null", 3) > 0,
               (limit - balance).cast(MONEY)).alias("available_credit"),
        _days_ago(e, "pay", 60).alias("last_payment_date"),
        _money(e, "pay_amt", 10.0, 3_000.0).alias("last_payment_amount"),
        (F.lit(9.99) + _u(e, "rate", 2_000) / F.lit(100.0)).alias("interest_rate"),
        (_u(e, "points", 100_000)).cast("int").alias("reward_points"),
    )


def seed_all(spark: SparkSession, num_customers: int = 1000,
             num_accounts: int = 1500,
             num_transactions: int = 10_000,
             num_cards: int = 800) -> dict[str, DataFrame]:
    """≅ data_seed.py:236-238 volumes (+ documented-only credit cards)."""
    customers = seed_customers(spark, num_customers)
    accounts = seed_accounts(spark, num_accounts, num_customers)
    transactions = seed_transactions(spark, accounts, num_transactions)
    cards = seed_credit_cards(spark, num_cards, num_customers, num_accounts)
    return {"customers": customers, "accounts": accounts,
            "transactions": transactions, "credit_cards": cards}
