"""Pipeline configuration — parity with `conf/pipeline.yml` (reference):
a small typed config loaded from YAML with defaults, covering the knobs
the reference exposes (shuffle partitions, blend α, backtest span,
rolling window size)."""

from __future__ import annotations

from dataclasses import dataclass, field

import yaml


@dataclass(frozen=True)
class PipelineConfig:
    sf_dir: str = "/root/testdata/sf0.001"
    shuffle_partitions: int = 32
    rolling_last_n: int = 10
    elo_k: float = 20.0
    elo_base: float = 1500.0
    blend_alpha: float = 0.65
    backtest_min_year: int = 1996
    feature_cols: tuple[str, ...] = (
        "n_items",
        "sum_qty",
        "avg_price",
        "avg_discount",
        "o_totalprice",
    )
    extras: dict = field(default_factory=dict)

    @classmethod
    def from_yaml(cls, path: str) -> PipelineConfig:
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        known = {k: raw.pop(k) for k in list(raw) if k in cls.__dataclass_fields__}
        if "feature_cols" in known:
            known["feature_cols"] = tuple(known["feature_cols"])
        return cls(**known, extras=raw)
