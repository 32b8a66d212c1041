"""Physical-plan inspection: the ``.explain`` feedback loop as code.

The engine's performance contract at 100TB is structural, not incidental:
filters reach the parquet scan (PushedFilters), projections prune columns
(ReadSchema), dimension joins broadcast, shuffle count matches the algebraic
minimum, and expression pipelines stay inside whole-stage codegen. These
helpers turn each property into an assertion so tests/CI pin the plan shape,
not just the answer. (SURVEY §4 — what Catalyst gives us must stay given.)
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the plan."""
    txt = explain_str(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", txt):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each parquet scan (pruning check)."""
    txt = explain_str(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", txt):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange operators (shuffles) in the physical plan.
    AQE may later coalesce them, but the count is the structural cost."""
    txt = explain_str(df, "simple")
    return len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|"
                          r"RoundRobinPartitioning|SinglePartition)", txt))


def wholestage_codegen_count(df: DataFrame) -> int:
    return len(re.findall(r"\*\(\d+\)", explain_str(df, "simple")))


# ------------------------------------------------------------- assertions

def assert_pushed_filters(df: DataFrame, expect_any: list[str]) -> None:
    """Assert at least one pushed filter mentions each expected column."""
    pf = " ".join(pushed_filters(df))
    missing = [c for c in expect_any if c not in pf]
    if missing:
        raise AssertionError(
            f"filters not pushed for {missing}; pushed: {pf!r}")


def assert_broadcast_join(df: DataFrame) -> None:
    if not has_broadcast_join(df):
        raise AssertionError("expected a BroadcastHashJoin in:\n"
                             + explain_str(df, "simple"))


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    got = count_shuffles(df)
    if got > n:
        raise AssertionError(
            f"plan has {got} shuffles, expected <= {n}:\n"
            + explain_str(df, "simple"))
