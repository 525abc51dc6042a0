"""Catalog-wide physical-plan lint: EVERY queries() entry is planned at
sf0.001 and checked for the three scale-killers —

- ``CartesianProduct``: an unkeyed join that is quadratic in data volume;
- ``BroadcastNestedLoopJoin``: the non-equi fallback, quadratic per
  broadcast batch (every banded/bucketed formulation in this repo exists
  precisely to avoid it);
- ``BatchEvalPython``: a row-at-a-time Python UDF in the plan (only
  Arrow-batched ``ArrowEvalPython``/``MapInPandas`` are acceptable Python).

PERF.md documents per-entry plan audits; this test makes the *global*
claim a regression gate: a future entry (or a refactor of a shared helper)
that silently de-optimizes into any of these shapes fails here by name.

Note: building a plan does not execute it, but streaming entries run their
(tiny) availableNow stream inside the callable, and tree-backed entries
materialize their build-once fixtures — so this lint doubles as a cheap
whole-catalog constructibility check.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_catalog_plan_has_no_scale_killers(name, spark):
    fn = entry_mod.queries()[name]
    # entries that materialize a bounded result driver-side (to release
    # corpus-scale caches per call) return a LocalTableScan — lint the REAL
    # corpus plan they expose via `lint_target` instead, or the gate would
    # go blind to a de-optimized scoring join behind the materialization
    df = getattr(fn, "lint_target", fn)(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = [m for m in FORBIDDEN if m in plan]
    assert not hits, f"{name}: plan contains {hits}\n{plan[:2000]}"


def test_materialized_entries_declare_lint_targets():
    """The driver-materialized LM entries (LocalTableScan results) must
    carry the lint_target hook exposing their real distributed plan."""
    for name in (
        "q_doc_perplexity",
        "q_perplexity_buckets",
        "q_doc_bigram_perplexity",
        "q_image_augment",
        "q_video_augment",
    ):
        assert getattr(entry_mod.queries()[name], "lint_target", None) is not None
