"""Unit pins for bench.py's calibration protocol (pure functions, no
Spark): host classification from probe floors, family normalization, and
the plan-node -> entry-class mapping. These encode BASELINE.md's
host-calibration table contract — a silent change here would corrupt
every cross-round PERF.md comparison downstream."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _cal(jf, nf, jl, nl):
    return {
        "first": {"jvm_sec": jf, "numpy_sec": nf},
        "last": {"jvm_sec": jl, "numpy_sec": nl},
    }


def test_host_class_uses_min_of_endpoints_per_kernel():
    f = bench._PROBE_FLOOR
    # at the floors exactly: calm
    assert bench._host_class(_cal(f["jvm_sec"], f["numpy_sec"], f["jvm_sec"], f["numpy_sec"])) == "calm"
    # one endpoint inflated, the other at floor: the MIN decides (still calm)
    assert bench._host_class(_cal(f["jvm_sec"] * 9, f["numpy_sec"] * 9, f["jvm_sec"], f["numpy_sec"])) == "calm"
    # both endpoints of ONE kernel past 1.5x: loaded; past 3x: hot
    assert bench._host_class(_cal(f["jvm_sec"] * 2, f["numpy_sec"], f["jvm_sec"] * 2, f["numpy_sec"])) == "loaded"
    assert bench._host_class(_cal(f["jvm_sec"], f["numpy_sec"] * 4, f["jvm_sec"], f["numpy_sec"] * 3.5)) == "hot"
    # the WORSE kernel wins the label
    assert bench._host_class(_cal(f["jvm_sec"], f["numpy_sec"] * 2, f["jvm_sec"], f["numpy_sec"] * 2)) == "loaded"
    # a missing kernel is unknown, never silently calm
    assert bench._host_class({"first": {}, "last": {}}) == "unknown"


def test_family_normalized_divides_by_bounding_probe_min():
    cal = _cal(0.5, 2.0, 0.4, 4.0)
    timings = {"a": 4.0, "b": 6.0, "c": 8.0, "d": float("nan")}
    classes = {"a": "jvm", "b": "numpy", "c": "stream", "d": "jvm"}
    out = bench._family_normalized(timings, classes, cal)
    # jvm: 4.0 / min(0.5, 0.4); NaN entry counted in n but not in total
    assert out["jvm"] == {"total_sec": 4.0, "n": 2, "normalized": 10.0}
    # numpy: 6.0 / min(2.0, 4.0)
    assert out["numpy"] == {"total_sec": 6.0, "n": 1, "normalized": 3.0}
    # stream normalizes by the JVM probe
    assert out["stream"] == {"total_sec": 8.0, "n": 1, "normalized": 20.0}


def test_entry_class_stream_prefix_and_plan_nodes():
    class FakeDF:
        def __init__(self, plan):
            self._plan = plan
            outer = self

            class QE:
                def executedPlan(self):
                    class P:
                        def toString(self):
                            return outer._plan

                    return P()

            class JDF:
                def queryExecution(self):
                    return QE()

            self._jdf = JDF()

    assert bench._entry_class("q_stream_anything", FakeDF("ArrowEvalPython")) == "stream"
    assert bench._entry_class("q_x", FakeDF("... FlatMapGroupsInPandas ...")) == "numpy"
    assert bench._entry_class("q_x", FakeDF("HashAggregate\nExchange")) == "jvm"
    # a plan that cannot be built must not break the bench
    class Broken:
        @property
        def _jdf(self):
            raise RuntimeError("no plan")

    assert bench._entry_class("q_x", Broken()) == "jvm"


def test_entry_order_is_seeded_permutation():
    """The bench runs entries in a seeded random permutation (r13 verdict:
    alphabetical order let a minutes-long host window wipe out one adjacent
    family per run). Same seed -> same order, exactly reproducible; None
    keeps legacy alphabetical; every name appears exactly once."""
    names = {f"q_{c}": None for c in "abcdefghij"}
    assert bench._entry_order(names, None) == sorted(names)
    a = bench._entry_order(names, 1234)
    b = bench._entry_order(names, 1234)
    assert a == b
    assert sorted(a) == sorted(names)
    assert bench._entry_order(names, 1234) != bench._entry_order(names, 99) or len(names) < 2
    # some seed must actually permute (shuffle is not the identity for all)
    assert any(bench._entry_order(names, s) != sorted(names) for s in range(5))
