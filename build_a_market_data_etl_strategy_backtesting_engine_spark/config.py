"""YAML config with dot-notation access + typed defaults.

Reference: ``/root/reference/etl/config.py:8-119`` (dot get/set :39-59,
typed properties :101-119) and ``config/settings.yaml``. Same surface plus a
``spark_conf`` section passed through to the session builder.
"""

from __future__ import annotations

from typing import Any

DEFAULTS: dict[str, Any] = {
    "etl": {"queue_size": 10000, "batch_size": 100},
    "database": {"batch_size": 1000, "pool_size": 10},
    "data_processing": {"chunk_size": 100000, "outlier_k": 3.0,
                        "min_price": 0.01},
    "backtesting": {"initial_cash": 1_000_000.0, "commission": 0.001,
                    "slippage": 0.0005, "risk_free_rate": 0.02,
                    "periods_per_year": 252},
    "streaming": {"trigger_seconds": 5, "watermark": "10 minutes",
                  "checkpoint_dir": "/tmp/mdetl_checkpoints"},
    "spark_conf": {},
}


def _deep_merge(base: dict, extra: dict) -> dict:
    out = dict(base)
    for k, v in extra.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


class Config:
    def __init__(self, data: dict | None = None):
        self._data = _deep_merge(DEFAULTS, data or {})

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        try:
            import yaml  # optional dependency, gated per environment rules

            with open(path) as f:
                return cls(yaml.safe_load(f) or {})
        except ImportError:
            import json

            with open(path) as f:
                return cls(json.load(f))

    def get(self, dotted: str, default: Any = None) -> Any:
        """``config.get("backtesting.commission")`` (etl/config.py:39-49)."""
        cur: Any = self._data
        for part in dotted.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return default
            cur = cur[part]
        return cur

    def set(self, dotted: str, value: Any) -> None:
        parts = dotted.split(".")
        cur = self._data
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = value

    # typed properties mirroring etl/config.py:101-119
    @property
    def commission(self) -> float:
        return float(self.get("backtesting.commission"))

    @property
    def slippage(self) -> float:
        return float(self.get("backtesting.slippage"))

    @property
    def initial_cash(self) -> float:
        return float(self.get("backtesting.initial_cash"))

    @property
    def risk_free_rate(self) -> float:
        return float(self.get("backtesting.risk_free_rate"))

    @property
    def spark_conf(self) -> dict[str, str]:
        return {str(k): str(v) for k, v in self.get("spark_conf", {}).items()}
