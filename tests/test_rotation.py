"""Driver-rotation invariants (__spark_entry__._rotation_order).

Round-11 verdict: 10 never-verified entries preempted the whole window and
left ``q_stream_video_decode`` at driver-freshness r7 for two extra rounds.
The rotation now caps never-verified entries at ``_NEW_ENTRY_SLOT_CAP`` per
window so the globally-oldest verified entry is always checked THIS round.
These tests pin that contract against both the live registry and synthetic
catalogs, without touching Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod


def _oldest_verified(names, last):
    verified = [n for n in names if n in last]
    return min(verified, key=lambda n: (last[n], names.index(n)))


def test_oldest_verified_entry_always_in_window_live_registry():
    queries = entry_mod.queries()
    names = list(queries)
    last = entry_mod._last_verified_round(set(entry_mod.oracle_sql()))
    window = names[: entry_mod._DRIVER_WINDOW]
    oldest = _oldest_verified(names, last)
    assert oldest in window, (
        f"globally-oldest verified entry {oldest!r} (round {last[oldest]}) "
        f"fell outside the driver's first-{entry_mod._DRIVER_WINDOW} window"
    )


def test_new_entry_burst_cannot_evict_oldest():
    # 3x the window of brand-new entries — worse than any real round.
    base = [f"q_old_{i}" for i in range(120)]
    last = {n: 5 + (i % 4) for i, n in enumerate(base)}
    burst = [f"q_new_{i}" for i in range(150)]
    ordered = entry_mod._rotation_order(base + burst, last)
    window = ordered[: entry_mod._DRIVER_WINDOW]

    new_in_window = sum(1 for n in window if n.startswith("q_new_"))
    assert new_in_window == entry_mod._NEW_ENTRY_SLOT_CAP

    oldest = _oldest_verified(base, last)
    assert oldest in window
    # The reserved slots hold the 40 globally-oldest verified entries.
    expected_verified = sorted(base, key=lambda n: (last[n], base.index(n)))[
        : entry_mod._DRIVER_WINDOW - entry_mod._NEW_ENTRY_SLOT_CAP
    ]
    assert set(expected_verified) <= set(window)


def test_overflow_new_entries_queue_right_after_window():
    base = [f"q_old_{i}" for i in range(100)]
    last = {n: 3 for n in base}
    burst = [f"q_new_{i}" for i in range(25)]
    ordered = entry_mod._rotation_order(base + burst, last)
    cap = entry_mod._NEW_ENTRY_SLOT_CAP
    win = entry_mod._DRIVER_WINDOW
    assert ordered[:cap] == burst[:cap]
    assert ordered[win : win + (25 - cap)] == burst[cap:]
    # Every registry name appears exactly once.
    assert sorted(ordered) == sorted(base + burst)


def test_small_catalog_is_plain_oldest_first():
    names = [f"q_{i}" for i in range(8)]
    last = {n: 10 - i for i, n in enumerate(names[:6])}  # q_0 newest, q_5 oldest
    ordered = entry_mod._rotation_order(names, last)
    assert ordered[:2] == ["q_6", "q_7"]  # never-verified lead (under cap)
    assert ordered[2:] == ["q_5", "q_4", "q_3", "q_2", "q_1", "q_0"]
