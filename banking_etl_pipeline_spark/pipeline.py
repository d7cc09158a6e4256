"""Config-driven pipeline orchestration (SURVEY.md §2.8, O1-O3).

≅ ``BankingETLPipeline`` (`/root/reference/src/orchestration/main.py:23-302`)
re-expressed as typed specs instead of nested dicts:

- ``PipelineSpec`` ≅ one entry of `config/config.json:23-86` (source, target,
  keys, quality config, fail-open/closed);
- ``run_pipeline`` is extract → transform → single-pass DQ gate → load. Every
  stage composes lazily; Spark actions fire only at the gate aggregate and
  the sink write (the reference fires O(checks) extra jobs in its gate —
  SURVEY.md §3);
- entity transforms are looked up from the domain layer: transaction
  (`domain/transactions.py`), customer and account (reconstructed,
  `domain/customers.py` / `domain/accounts.py`);
- the customer pipeline in the reference would crash (its transformer is
  never initialized, main.py:71 vs :113); here all three entities run.

``load_config`` accepts the reference's config.json shape directly so an
existing deployment's config ports without edits.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from .domain.accounts import transform_accounts
from .domain.customers import transform_customers
from .domain.transactions import transform_transactions
from .operators.quality import (
    QualityChecker,
    QualityConfig,
    RangeRule,
    apply_quality_gate,
)
from .sinks.writers import ParquetWarehouse, write_partitioned
from .sources.readers import read_csv, read_jdbc, read_parquet

TRANSFORMS: dict[str, Callable[[DataFrame], DataFrame]] = {
    "customer": transform_customers,
    "account": transform_accounts,
    "transaction": transform_transactions,
}


@dataclass
class SourceSpec:
    """≅ source_type/source_path/source_table of config.json."""

    kind: str  # csv | parquet | jdbc | dataframe
    path: str | None = None
    table: str | None = None
    jdbc_url: str | None = None
    dataframe: DataFrame | None = None  # test/in-memory injection

    def read(self, spark: SparkSession) -> DataFrame:
        if self.kind == "dataframe":
            assert self.dataframe is not None
            return self.dataframe
        if self.kind == "csv":
            # reference semantics: raw-zone CSV infers types on ingest
            # (s3_connector.py:23,41); costs one extra sampling scan —
            # production should hand SourceSpec an explicit schema instead
            return read_csv(spark, self.path, infer_schema=True)
        if self.kind == "parquet":
            return read_parquet(spark, self.path)
        if self.kind in ("jdbc", "rds"):
            return read_jdbc(spark, self.jdbc_url, self.table)
        raise ValueError(f"Unsupported source type: {self.kind}")


@dataclass
class TargetSpec:
    """≅ target_type/target_table/target_path + write options."""

    kind: str  # warehouse | partitioned | none
    table: str | None = None
    path: str | None = None
    mode: str = "append"
    partition_cols: Sequence[str] = ()

    def write(self, df: DataFrame, warehouse: ParquetWarehouse | None,
              key_columns: Sequence[str]) -> None:
        if self.kind == "none":
            return
        if self.kind == "warehouse":
            assert warehouse is not None and self.table
            warehouse.load_with_staging(df, self.table, key_columns)
            return
        if self.kind == "partitioned":
            assert self.path
            write_partitioned(df, self.path, self.mode, self.partition_cols)
            return
        raise ValueError(f"Unsupported target type: {self.kind}")


@dataclass
class PipelineSpec:
    entity: str
    source: SourceSpec
    target: TargetSpec
    key_columns: list[str] = field(default_factory=list)
    quality: QualityConfig = field(default_factory=QualityConfig)


@dataclass
class PipelineResult:
    entity: str
    quality: dict[str, Any]
    output: DataFrame


def run_pipeline(spark: SparkSession, spec: PipelineSpec,
                 warehouse: ParquetWarehouse | None = None) -> PipelineResult:
    """One entity: extract → transform → DQ gate → load (main.py:92-275)."""
    raw = spec.source.read(spark)
    transform = TRANSFORMS.get(spec.entity)
    if transform is None:
        raise ValueError(f"No transform registered for entity {spec.entity!r}")
    transformed = transform(raw)
    result = QualityChecker().run_all_checks(transformed, spec.quality)
    apply_quality_gate(result, spec.quality.fail_on_quality_check)
    spec.target.write(transformed, warehouse, spec.key_columns)
    return PipelineResult(spec.entity, result, transformed)


def run_all(spark: SparkSession, specs: Sequence[PipelineSpec],
            warehouse: ParquetWarehouse | None = None,
            pipelines_to_run: Sequence[str] | None = None
            ) -> dict[str, PipelineResult]:
    """≅ run_pipeline dispatch loop (main.py:277-302, config `pipelines_to_run`)."""
    wanted = set(pipelines_to_run) if pipelines_to_run is not None else None
    out: dict[str, PipelineResult] = {}
    for spec in specs:
        if wanted is None or spec.entity in wanted:
            out[spec.entity] = run_pipeline(spark, spec, warehouse)
    return out


def _quality_from_config(block: dict[str, Any], fail: bool) -> QualityConfig:
    return QualityConfig(
        required_columns=list(block.get("required_columns", [])),
        key_columns=list(block.get("key_columns", [])),
        range_rules=[
            RangeRule(col, lo, hi)
            for col, (lo, hi) in block.get("range_checks", {}).items()
        ],
        fail_on_quality_check=fail,
    )


def load_config(path_or_dict: str | dict[str, Any]) -> list[PipelineSpec]:
    """Parse the reference's config.json shape (config/config.json:23-86)
    into specs. S3/Redshift/RDS endpoints map to their engine-local
    equivalents: s3 csv → csv path, redshift → warehouse table, s3 delta
    append → partitioned columnar path."""
    cfg = (json.load(open(path_or_dict)) if isinstance(path_or_dict, str)
           else path_or_dict)
    specs = []
    for entity, block in cfg.get("pipelines", {}).items():
        src_kind = block.get("source_type", "csv")
        source = SourceSpec(
            kind={"s3": "csv", "rds": "jdbc"}.get(src_kind, src_kind),
            path=block.get("source_path"),
            table=block.get("source_table"),
            jdbc_url=cfg.get("rds", {}).get("jdbc_url"),
        )
        if block.get("target_type") == "redshift":
            target = TargetSpec(kind="warehouse", table=block.get("target_table"))
        elif block.get("target_type") in ("s3", "parquet", "delta"):
            target = TargetSpec(
                kind="partitioned",
                path=block.get("target_path"),
                mode=block.get("write_mode", "overwrite"),
                partition_cols=block.get("partition_cols", []),
            )
        else:
            target = TargetSpec(kind="none")
        specs.append(
            PipelineSpec(
                entity=entity,
                source=source,
                target=target,
                key_columns=list(block.get("key_columns", [])),
                quality=_quality_from_config(
                    block.get("data_quality", {}),
                    block.get("fail_on_quality_check", True),
                ),
            )
        )
    return specs
