"""Filter operators: OPL ``where`` and the collector-style filter processor.

Reference analogs:

* OPL ``where`` → selection-vector filter with id-bitmap cascade to child
  attr batches (query-engine/src/pipeline/filter.rs:35;
  pdata/src/otap/filter.rs). In our denormalized layout the cascade is
  free: one ``df.filter``. For exploded attribute tables the cascade is a
  left-semi join (provided below).
* collector filter processor → include/exclude rule sets with Strict or
  Regexp match over severity texts / bodies / names
  (processors/filter_processor/mod.rs:1, config.rs:12;
  MatchType pdata/src/otap/filter.rs:412-423).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class MatchRules:
    """One include- or exclude-rule set (filter_processor config analog)."""

    match_type: str  # "strict" | "regexp"
    values: list[str]

    def condition(self, col: str | Column) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        if self.match_type == "strict":
            return c.isin(self.values)
        if self.match_type == "regexp":
            cond = F.lit(False)
            for pat in self.values:
                cond = cond | c.rlike(pat)
            return cond
        raise ValueError(f"unknown match_type: {self.match_type!r}")


def filter_processor(
    df: DataFrame,
    col: str,
    include: MatchRules | None = None,
    exclude: MatchRules | None = None,
) -> DataFrame:
    """include ∧ ¬exclude composition (filter_processor/mod.rs semantics:
    a row passes if it matches include (when set) and not exclude)."""
    cond = F.lit(True)
    if include is not None:
        cond = cond & include.condition(col)
    if exclude is not None:
        cond = cond & ~F.coalesce(exclude.condition(col), F.lit(False))
    return df.filter(cond)


def cascade_filter(
    root: DataFrame, child: DataFrame, predicate: Column, root_id: str = "id",
    child_parent_id: str = "parent_id",
) -> tuple[DataFrame, DataFrame]:
    """Filter a root table and cascade the selection to a child attrs table.

    The exploded-attributes analog of the reference's id-bitmap cascade
    (pipeline/id_mask.rs:4-8; filter_otap_batch): surviving root ids
    left-semi-join the child. Returns (filtered_root, filtered_child).
    """
    kept = root.filter(predicate)
    kept_child = child.join(
        kept.select(F.col(root_id).alias(child_parent_id)).distinct(),
        on=child_parent_id,
        how="left_semi",
    )
    return kept, kept_child
