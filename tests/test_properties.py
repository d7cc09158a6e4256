"""Property-based invariants (SURVEY.md §5.4) — hypothesis generates the
row data, Spark evaluates, the invariant must hold for ALL generated inputs:

- running balance telescopes: last running_balance == sum of signed amounts;
- currency conversion is monotone: amount_usd >= amount for EUR/GBP, == USD;
- exact dedup is idempotent: dedup(dedup(x)) == dedup(x) keepers;
- merge_upsert is idempotent and right-biased.

Spark-session-per-example would be prohibitive, so examples are small row
lists evaluated on the shared session with deadline disabled.
"""

from __future__ import annotations

import datetime as dt
import decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from banking_etl_pipeline_spark.domain.schemas import TRANSACTION_SCHEMA
from banking_etl_pipeline_spark.domain.transactions import (
    clean_transactions,
    enrich_transactions,
    transaction_metrics,
)
from banking_etl_pipeline_spark.sinks.writers import merge_upsert

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

amounts = st.decimals(min_value=decimal.Decimal("0.01"),
                      max_value=decimal.Decimal("5000.00"), places=2)
currencies = st.sampled_from(["USD", "EUR", "GBP"])
types = st.sampled_from(["deposit", "withdrawal", "payment", "transfer"])
offsets = st.integers(min_value=0, max_value=10_000_000)

txn_rows = st.lists(
    st.tuples(amounts, currencies, types, offsets),
    min_size=1, max_size=25, unique_by=lambda t: t[3],
)


def _df(spark, rows):
    base = dt.datetime(2025, 1, 1)
    data = [
        (f"T{i}", "ACC1", base + dt.timedelta(seconds=off), ttype, amt, ccy,
         "d", "m", "retail", "completed", "online", "USA", False)
        for i, (amt, ccy, ttype, off) in enumerate(rows)
    ]
    return spark.createDataFrame(data, TRANSACTION_SCHEMA)


@given(rows=txn_rows)
@settings(**SETTINGS)
def test_running_balance_telescopes(spark, rows):
    out = transaction_metrics(enrich_transactions(clean_transactions(
        _df(spark, rows))))
    rows_out = out.orderBy("transaction_date", "transaction_id").collect()
    total = sum(float(r.amount_signed) for r in rows_out)
    assert abs(float(rows_out[-1].running_balance) - total) < 1e-6


@given(rows=txn_rows)
@settings(**SETTINGS)
def test_fx_conversion_monotone(spark, rows):
    out = enrich_transactions(clean_transactions(_df(spark, rows))).collect()
    for r in out:
        usd, amt = float(r.amount_usd), float(r.amount)
        if r.currency == "USD":
            assert usd == amt
        else:
            assert usd >= amt  # EUR ×1.1, GBP ×1.3


@given(texts=st.lists(st.text(
    alphabet=st.characters(codec="ascii", categories=("L", "N")),
    min_size=0, max_size=12), min_size=1, max_size=20))
@settings(**SETTINGS)
def test_exact_dedup_idempotent(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    once = df.withColumn("k", F.md5("text")).dropDuplicates(["k"])
    twice = once.dropDuplicates(["k"])
    assert sorted(r.doc_id for r in once.collect()) == \
        sorted(r.doc_id for r in twice.collect())


kv_rows = st.lists(st.tuples(st.integers(0, 20), st.integers(-100, 100)),
                   min_size=0, max_size=20, unique_by=lambda t: t[0])


@given(target=kv_rows, updates=kv_rows)
@settings(**SETTINGS)
def test_merge_upsert_idempotent_and_right_biased(spark, target, updates):
    t = spark.createDataFrame(target, "k int, v int") if target else \
        spark.createDataFrame([], "k int, v int")
    u = spark.createDataFrame(updates, "k int, v int") if updates else \
        spark.createDataFrame([], "k int, v int")
    merged = {r.k: r.v for r in merge_upsert(t, u, ["k"]).collect()}
    again = {r.k: r.v for r in
             merge_upsert(merge_upsert(t, u, ["k"]), u, ["k"]).collect()}
    assert merged == again  # idempotent
    for k, v in updates:
        assert merged[k] == v  # update side wins
    tkeys = dict(target)
    ukeys = dict(updates)
    for k, v in target:
        if k not in ukeys:
            assert merged[k] == v  # unmatched target survives
    assert set(merged) == set(tkeys) | set(ukeys)


# ---------------------------------------------------------------------------
# label propagation matches a pure-Python k-hop min-label model
# ---------------------------------------------------------------------------

edge_lists = st.lists(
    st.tuples(st.integers(min_value=0, max_value=12),
              st.integers(min_value=0, max_value=12)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1, max_size=20,
)


def _model_propagate(edges, iterations):
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {v: v for v in adj}
    for _ in range(iterations):
        labels = {
            v: min([labels[v]] + [labels[u] for u in adj[v]]) for v in adj
        }
    return labels


@given(edges=edge_lists, iterations=st.integers(min_value=1, max_value=4))
@settings(**SETTINGS)
def test_propagate_min_labels_matches_model(spark, edges, iterations):
    from banking_etl_pipeline_spark.operators.corpus import (
        propagate_min_labels,
    )

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["v"]: r["label"]
        for r in propagate_min_labels(df, iterations).collect()
    }
    assert got == _model_propagate(edges, iterations)
