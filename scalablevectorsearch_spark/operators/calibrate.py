"""Recall-targeted calibration — binary-search the search window size
to hit a target recall at minimal cost.

Parity: /root/reference/include/svs/index/vamana/calibrate.h:91
(CalibrationParameters), :249 (optimize_search_buffer = binary search
over search_window_size against a groundtruth + target recall),
orchestrators/vamana.h:211-246 (experimental_calibrate surface).

Spark shape: a driver loop that re-runs the search job at candidate
window sizes and evaluates recall with the §2.4 aggregate. Each probe
is one Spark job; the loop is O(log window_range) jobs. Works over any
index family exposing a (queries, k, window) search callable."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame

from scalablevectorsearch_spark.operators.recall import k_recall_at


@dataclass
class CalibrationResult:
    search_window_size: int
    recall: float
    target_recall: float
    probes: list[tuple[int, float]]  # (window, recall) evaluations


def _recall_of(groundtruth: DataFrame, results: DataFrame, k: int) -> float:
    row = k_recall_at(groundtruth, results, k).collect()[0]
    return float(row["recall"]) if row["recall"] is not None else 0.0


def calibrate_window(
    search_fn: Callable[[int], DataFrame],
    groundtruth: DataFrame,
    k: int,
    target_recall: float = 0.9,
    min_window: int = 1,
    max_window: int = 256,
) -> CalibrationResult:
    """Smallest window in [min_window, max_window] whose recall >=
    target (recall is monotone-ish in window size, calibrate.h's working
    assumption). ``search_fn(window)`` must return the engine's standard
    (qid, rank, neighbor_id, ...) result frame.

    Returns the best window found; if even max_window misses the target,
    returns max_window with its achieved recall (the reference reports
    the same 'best effort')."""
    probes: list[tuple[int, float]] = []

    def probe(w: int) -> float:
        r = _recall_of(groundtruth, search_fn(w), k)
        probes.append((w, r))
        return r

    lo, hi = min_window, max_window
    r_hi = probe(hi)
    if r_hi < target_recall:
        return CalibrationResult(hi, r_hi, target_recall, probes)
    best_w, best_r = hi, r_hi
    while lo < hi:
        mid = (lo + hi) // 2
        r = probe(mid)
        if r >= target_recall:
            best_w, best_r = mid, r
            hi = mid
        else:
            lo = mid + 1
    return CalibrationResult(best_w, best_r, target_recall, probes)
