"""Local verification for the registration-deferred privacy tier
(operators/privacy.py): seeded-Laplace DP release, l-diversity audit,
generalization-lattice release decision, masked-extract digest.  Same
policy as the reports/tokenizer deferred suites — complete builder +
oracle, exercised with the exact driver comparison, registered once the
driver-verification backlog drains (append to registry._MODULES).
"""

from __future__ import annotations

import pytest

from banking_etl_pipeline_spark.operators.privacy import (
    DP_EPSILON,
    K_RELEASE,
    queries as privacy_queries,
)
from banking_etl_pipeline_spark.plans import plan_of
from tests.oracle_compare import compare, duck_connection


@pytest.fixture(scope="module")
def priv():
    return privacy_queries()


@pytest.mark.parametrize(
    "key",
    ["dp_count_release", "l_diversity_audit", "generalization_ladder",
     "pii_redact_digest"],
)
def test_privacy_oracle_parity(key, spark, sf_dir, priv):
    spec = priv[key]
    res = compare(spec.build(spark, sf_dir), duck_connection(sf_dir),
                  spec.oracle)
    assert res["row_count_match"] and res["columns_match"] \
        and res["values_match"], f"{key}: {res['detail']}"


def test_privacy_plans_scale_sane(spark, sf_dir, priv):
    for key, spec in priv.items():
        p = plan_of(spec.build(spark, sf_dir))
        assert "CartesianProduct" not in p, f"{key}: cartesian"
        for marker in ("BatchEvalPython", "ArrowEvalPython"):
            assert marker not in p, f"{key}: python eval"


def test_dp_noise_is_laplace_shaped(spark, sf_dir, priv):
    rows = priv["dp_count_release"].build(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # released = exact + noise (6-dp truncation applied to both)
        assert abs(r["released_n"] - (r["exact_n"] + r["noise"])) < 2e-6
    # the seeded draw must actually spread: not all noises equal, both
    # signs present at 25 nations (prob of one-sided ~2^-25)
    noises = [r["noise"] for r in rows]
    assert len(set(noises)) > 1
    if len(noises) >= 20:
        assert any(n < 0 for n in noises) and any(n > 0 for n in noises)


def test_dp_release_deterministic_replay(spark, sf_dir, priv):
    a = priv["dp_count_release"].build(spark, sf_dir).collect()
    b = priv["dp_count_release"].build(spark, sf_dir).collect()
    assert a == b
    assert DP_EPSILON == 1.0


def test_generalization_ladder_decision(spark, sf_dir, priv):
    rows = priv["generalization_ladder"].build(spark, sf_dir).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    chosen = [r for r in rows if r["chosen"]]
    passing = [r for r in rows if r["min_group_size"] >= K_RELEASE]
    if passing:
        # chosen = the most specific passing level
        assert len(chosen) == 1
        assert chosen[0]["rank"] == min(r["rank"] for r in passing)
    else:
        assert chosen == []
    # generalizing can only shrink the group count
    assert rows[0]["n_groups"] >= rows[1]["n_groups"] >= rows[2]["n_groups"]


def test_l_diversity_bounds(spark, sf_dir, priv):
    r = priv["l_diversity_audit"].build(spark, sf_dir).collect()[0]
    assert 1 <= r["min_l"] <= r["max_l"]
    assert 0 <= r["n_under_diverse"] <= r["n_groups"]


def test_privacy_empty_universe(spark, sf_dir, priv):
    from tests.conftest import build_empty_universe

    empty = build_empty_universe(spark, sf_dir)
    for key, spec in priv.items():
        df = spec.build(spark, empty)
        assert len(df.schema) > 0, key
        assert df.count() >= 0, key


def test_privacy_hot_key(spark, sf_dir, priv):
    from tests.conftest import build_skewed_universe

    skew = build_skewed_universe(spark, sf_dir)
    for key, spec in priv.items():
        assert spec.build(spark, skew).count() >= 0, key


def test_privacy_repeat_deterministic(spark, sf_dir, priv):
    from collections import Counter

    from tests.oracle_compare import _norm

    for key, spec in priv.items():
        sets = []
        for _ in range(2):
            rows = spec.build(spark, sf_dir).collect()
            sets.append(Counter(
                tuple(_norm(r[c]) for c in sorted(r.asDict())) for r in rows
            ))
        assert sets[0] == sets[1], f"{key}: nondeterministic across builds"
