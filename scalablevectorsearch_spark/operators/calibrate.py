"""Recall-targeted calibration — binary-search the search window size
(and optionally the split-buffer capacity) to hit a target recall at
minimal cost.

Parity: /root/reference/include/svs/index/vamana/calibrate.h:91
(CalibrationParameters), :249 (optimize_search_buffer = binary search
over search_window_size against a groundtruth + target recall),
:152/:171 (optimize_split_buffer_using_binary_search /
optimize_split_buffer = shrink the exploration window below the
capacity when a wider result buffer alone preserves recall at lower
traversal cost), orchestrators/vamana.h:211-246
(experimental_calibrate surface).

Spark shape: a driver loop that re-runs the search job at candidate
(window, capacity) points and evaluates recall with the §2.4 aggregate.
Each probe is one Spark job; the loops are O(log range) jobs. Works
over any index family exposing a (queries, k, window[, capacity])
search callable."""

from __future__ import annotations

import math
import time
import warnings
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


@dataclass
class ProbeBudgetResult:
    probe_budget: float
    recall: float
    target_recall: float
    probes: list[tuple[float, float]]  # (budget, recall) evaluations


def margined_target(
    target_recall: float,
    margin: float | str | None,
    k: int,
    n_calibration: int,
    z: float = 1.6449,
    cap: float = 0.999,
) -> float:
    """Sampling-aware calibration target.

    A budget fitted to hit ``target_recall`` exactly on an n-query
    calibration sample is an unbiased but NOISY estimate of the
    population operating point: the sample recall is a mean of
    ``n_calibration * k`` Bernoulli trials, so its standard error is
    sqrt(t(1-t) / (n*k)) — ~1.7pp at t=0.90 with the default 32-query,
    k=10 sample. A 1-2 sigma unlucky sample then under-delivers on the
    full population by the same amount (measured: the 1e8-row IVF tier
    fitted exactly 0.90 on 32 qids and served 0.8712 on the 500-query
    population; the 5e7 tier's sample landed on 0.9016).

    ``margin="ci"`` fits at the one-sided upper confidence bound
    (default z=1.6449, ~95%), so the population recall clears the
    user's target with that confidence instead of a coin flip; a float
    adds that fixed margin; ``None`` keeps the exact-fit behavior.
    The widened target is capped at ``cap`` so a high user target
    still admits a feasible budget — but never below the user's own
    target (a margin must not WEAKEN the fit relative to margin=None,
    e.g. target_recall=0.9995 with the default cap)."""
    if margin is None:
        return target_recall
    cap = max(cap, target_recall)
    if margin == "ci":
        n_trials = max(1, int(n_calibration) * int(k))
        sigma = math.sqrt(target_recall * (1.0 - target_recall) / n_trials)
        return min(cap, target_recall + z * sigma)
    if isinstance(margin, (int, float)) and not isinstance(margin, bool):
        if margin < 0:
            raise ValueError("calibration_margin must be >= 0")
        return min(cap, target_recall + float(margin))
    raise ValueError(
        "calibration_margin must be None, 'ci', or a non-negative float"
    )


def validate_budget(
    search_fn: Callable[[float], DataFrame],
    groundtruth: DataFrame,
    k: int,
    target_recall: float,
    budget: float,
    max_budget: float,
    widen: float = 1.5,
    max_rounds: int = 3,
    stats: dict | None = None,
) -> float:
    """Held-out validation of a sample-fitted budget.

    A budget fitted on n calibration qids is graded here against a
    DISJOINT validation qid set: a fit sample whose draw is
    systematically easier than the population passes its own fit yet
    under-delivers in production (measured at 1e8 rows: a 32-qid exact
    fit of 0.90 served 0.8712 on the 500-query population — the sample
    was ~3.5pp easier, a bias no within-sample CI margin can remove).
    When the validation recall misses ``target_recall``, the budget is
    widened multiplicatively (recall is monotone-ish in budget, the
    same working assumption as the fit's grid search) and re-validated,
    up to ``max_rounds`` widenings or ``max_budget``. Returns the
    validated (possibly widened) budget; records the
    (budget, validation recall) trail in ``stats['validation']``, the
    final recall in ``stats['validated_recall']``, and whether that
    final recall actually cleared the target in ``stats['validated']``
    — when max_rounds/max_budget are exhausted short of the target the
    last widened budget is still returned (best-effort, the fit's same
    contract) but ``validated`` is False and a UserWarning is emitted,
    so a caller claiming a delivered-recall contract can assert instead
    of silently serving a miss."""
    if stats is None:
        stats = {}
    trail: list[tuple[float, float]] = []
    stats["validation"] = trail
    b = float(budget)
    for _ in range(max(1, max_rounds) + 1):
        r = _recall_of(groundtruth, search_fn(b), k)
        trail.append((b, r))
        if r >= target_recall or b >= max_budget:
            break
        b = min(float(max_budget), b * widen)
    stats["validated_recall"] = trail[-1][1]
    stats["validated"] = trail[-1][1] >= target_recall
    if not stats["validated"]:
        warnings.warn(
            f"validate_budget exhausted max_rounds/max_budget at recall "
            f"{trail[-1][1]:.4f} < target {target_recall:.4f}; serving "
            f"best-effort budget {trail[-1][0]}",
            UserWarning,
            stacklevel=2,
        )
    return trail[-1][0]


def calibration_sample_size(
    target_recall: float,
    k: int,
    epsilon: float | None = None,
    z: float = 1.6449,
    n_min: int = 16,
    n_max: int = 512,
) -> tuple[int, int]:
    """Derive (n_fit, n_val) calibration split sizes from the CI
    half-width the margin formula already computes, instead of
    hand-picked constants: solve ``z * sqrt(t(1-t) / (n*k)) <= epsilon``
    for n, i.e. n = ceil(z^2 * t(1-t) / (epsilon^2 * k)) — the smallest
    fit sample whose one-sided CI margin (see :func:`margined_target`)
    is at most ``epsilon`` wide at the user's target. ``epsilon``
    defaults to ``max(0.005, (1 - target)/5)``: a fifth of the recall
    headroom, so a 0.90 target fits at +-2pp (n_fit=61 at k=10 —
    bracketing the 64 the 1e8 tier validated) and tighter targets get
    proportionally larger samples. n_val is half the fit sample (the
    held-out grading needs power, not precision — it detects a biased
    DRAW, a ~whole-margin effect, not a fraction of it). Both clamp to
    [n_min, n_max] (n_val to [n_min//2, n_max//2])."""
    if not 0.0 < target_recall < 1.0:
        raise ValueError("target_recall must be in (0, 1) for auto-sizing")
    if epsilon is None:
        epsilon = max(0.005, (1.0 - target_recall) / 5.0)
    t = target_recall
    n = math.ceil(z * z * t * (1.0 - t) / (epsilon * epsilon * max(1, int(k))))
    n_fit = int(min(max(n, n_min), n_max))
    n_val = int(min(max(n_fit // 2, n_min // 2), n_max // 2))
    return n_fit, n_val


def calibrate_probe_budget(
    search_fn: Callable[[float], DataFrame],
    groundtruth: DataFrame,
    k: int,
    target_recall: float = 0.9,
    min_budget: float = 1.0,
    max_budget: float | None = None,
    resolution: float = 0.25,
    hint: float | None = None,
) -> ProbeBudgetResult:
    """Smallest probe budget in [min_budget, max_budget] whose recall
    >= target — the reference's recall-targeted auto-tuning
    (calibrate.h:249 optimize_search_buffer's binary search against a
    groundtruth + target recall) applied to the routed/IVF probe-cost
    axis instead of the window axis. Replaces hand-picked budgets
    (e.g. the n_shards/2 routed default) with a budget fitted to the
    actual data geometry: clustered data hits the target at a small
    budget, signal-free data honestly reports what full fan-out buys.

    ``search_fn(budget)`` runs the search at that ``probe_budget`` and
    returns the engine's standard (qid, rank, neighbor_id, ...) frame.
    Budgets are quantized to ``resolution`` steps and binary-searched
    over the integer step grid, so the chosen operating point is
    exactly reproducible (recall is monotone-ish in budget — more
    probes never remove candidates; the same working assumption as
    calibrate.h's window search). O(log range) search jobs.

    ``hint``: a warm-start budget (e.g. the previous tier's fitted
    budget scaled by sqrt(N ratio) — the scaling visible across the
    recorded stress tiers). The search probes the hint FIRST and
    gallops (doubling) toward whichever side the target lies, then
    binary-searches the bracketed gap — a good hint replaces the
    opening full-fan-out probe (the single most expensive eval: a
    budget=max probe scans the entire base) with evals near the true
    operating point, cutting total probed-scan cost ~linearly in
    hint/max. A bad hint only costs the gallop steps; the result is
    the same grid point the cold search finds (same grid, same
    monotone assumption).

    If even ``max_budget`` misses the target, returns max_budget with
    its achieved recall (the reference's same best-effort report)."""
    if max_budget is None:
        raise ValueError("max_budget is required (e.g. the shard/cluster count)")
    if resolution <= 0:
        raise ValueError("resolution must be > 0")
    # ceil, not round: round() can place the lowest grid point BELOW
    # min_budget (min_budget=1.0, resolution=0.3 -> step 3 = 0.9) and
    # the search kernels reject probe_budget < 1 mid-calibration. The
    # 1e-9 slack keeps exact divisions (1.0/0.25 -> 4) from ceiling up
    # on float error.
    lo = max(1, math.ceil(min_budget / resolution - 1e-9))
    hi = max(lo, int(round(max_budget / resolution)))
    probes: list[tuple[float, float]] = []

    def probe(step: int) -> float:
        b = step * resolution
        r = _recall_of(groundtruth, search_fn(b), k)
        probes.append((b, r))
        return r

    best_s = best_r = None
    if hint is not None and lo < hi:
        h = min(max(int(round(float(hint) / resolution)), lo), hi)
        r_h = probe(h)
        if r_h >= target_recall:
            # hint passes: the answer is at or below it — binary search
            # [lo, h] without ever paying the full-fan-out probe
            best_s, best_r, hi = h, r_h, h
        elif h == hi:
            # hint already at max fan-out and still short: best-effort
            return ProbeBudgetResult(hi * resolution, r_h, target_recall, probes)
        else:
            # hint fails: gallop upward to bracket the crossing
            lo, step = h + 1, h
            while lo <= hi:
                step = min(step * 2, hi)
                r = probe(step)
                if r >= target_recall:
                    best_s, best_r, hi = step, r, step
                    break
                if step == hi:
                    return ProbeBudgetResult(
                        hi * resolution, r, target_recall, probes
                    )
                lo = step + 1
    if best_s is None:
        r_hi = probe(hi)
        if r_hi < target_recall:
            return ProbeBudgetResult(hi * resolution, r_hi, target_recall, probes)
        best_s, best_r = hi, r_hi
    while lo < hi:
        mid = (lo + hi) // 2
        r = probe(mid)
        if r >= target_recall:
            best_s, best_r = mid, r
            hi = mid
        else:
            lo = mid + 1
    return ProbeBudgetResult(best_s * resolution, best_r, target_recall, probes)


@dataclass
class ClosureResult:
    amplification: float
    recall: float
    target_recall: float
    probes: list[tuple[float, float]]  # (amplification, recall)


def calibrate_closure_amplification(
    build_search_fn: Callable[[float], DataFrame],
    groundtruth: DataFrame,
    k: int,
    target_recall: float = 0.9,
    ladder: tuple[float, ...] = (1.0, 1.25, 1.5, 2.0, 3.0),
) -> ClosureResult:
    """Smallest closure storage amplification on ``ladder`` whose
    recall >= target. Closure replication (SPANN closure assignment,
    operators/vamana.py closure_bp) is a LAYOUT property:
    ``build_search_fn(amplification)`` must rebuild the index at that
    target amplification (fit via ivf.fit_closure_bp) and return the
    search result frame — each probe is a build, so the search space is
    a small explicit ladder, binary-searched by index (recall is
    monotone in amplification: replicas only add reachable candidates).
    Same best-effort contract as :func:`calibrate_probe_budget`."""
    if not ladder or list(ladder) != sorted(ladder):
        raise ValueError("ladder must be a non-empty ascending sequence")
    probes: list[tuple[float, float]] = []

    def probe(i: int) -> float:
        r = _recall_of(groundtruth, build_search_fn(ladder[i]), k)
        probes.append((ladder[i], r))
        return r

    lo, hi = 0, len(ladder) - 1
    r_hi = probe(hi)
    if r_hi < target_recall:
        return ClosureResult(ladder[hi], r_hi, target_recall, probes)
    best_i, best_r = hi, r_hi
    while lo < hi:
        mid = (lo + hi) // 2
        r = probe(mid)
        if r >= target_recall:
            best_i, best_r = mid, r
            hi = mid
        else:
            lo = mid + 1
    return ClosureResult(ladder[best_i], best_r, target_recall, probes)


@dataclass
class SplitBufferResult:
    search_window_size: int
    buffer_capacity: int
    recall: float
    target_recall: float
    cost: float
    probes: list[tuple[int, int, float]]  # (window, capacity, recall)


def calibrate_split_buffer(
    search_fn: Callable[[int, int], DataFrame],
    groundtruth: DataFrame,
    k: int,
    target_recall: float,
    window: int,
    capacity_upper: int | None = None,
    cost_fn: Callable[[int, int], float] | None = None,
    timing_reps: int = 1,
) -> SplitBufferResult:
    """Split-buffer optimization (calibrate.h:171 optimize_split_buffer):
    starting from the uniform buffer ``(window, window)`` — normally the
    output of :func:`calibrate_window` — decrement the exploration
    window; a smaller window that holds the target recall with SOME
    capacity <= ``capacity_upper`` gets its minimal such capacity via
    binary search (lower-bounded by max(window, k), calibrate.h:221),
    and the cheapest passing configuration wins. If a window fails even
    at the max capacity, smaller windows cannot do better and the loop
    terminates (calibrate.h:206-210).

    ``search_fn(window, capacity)`` returns the standard result frame.
    ``cost_fn(window, capacity)`` scores a configuration; default =
    measured wall time of the search job (min over ``timing_reps``
    runs, the reference's get_search_time). Tests inject a
    deterministic model to sidestep host noise."""
    capacity_upper = capacity_upper or 4 * window
    probes: list[tuple[int, int, float]] = []

    def probe(w: int, cap: int) -> float:
        r = _recall_of(groundtruth, search_fn(w, cap), k)
        probes.append((w, cap, r))
        return r

    def cost_of(w: int, cap: int) -> float:
        if cost_fn is not None:
            return cost_fn(w, cap)
        best = float("inf")
        for _ in range(max(1, timing_reps)):
            t0 = time.perf_counter()
            search_fn(w, cap).count()
            best = min(best, time.perf_counter() - t0)
        return best

    # the uniform baseline's EFFECTIVE capacity is max(window, k) — every
    # search buffer holds at least k results (search_buffer.h invariant)
    best = SplitBufferResult(
        window, max(window, k), probe(window, window), target_recall,
        cost_of(window, window), probes,
    )
    sws = window
    while sws > 1:
        sws -= 1
        if probe(sws, capacity_upper) < target_recall:
            break  # shrinking further cannot recover recall
        # smallest capacity in [max(sws, k), capacity_upper] that holds
        lo, hi = max(sws, k), capacity_upper
        best_cap, best_r = hi, None
        while lo < hi:
            mid = (lo + hi) // 2
            r = probe(sws, mid)
            if r >= target_recall:
                best_cap, best_r = mid, r
                hi = mid
            else:
                lo = mid + 1
        if best_r is None:
            best_r = _recall_of(groundtruth, search_fn(sws, best_cap), k)
        c = cost_of(sws, best_cap)
        if c < best.cost:
            best = SplitBufferResult(
                sws, best_cap, best_r, target_recall, c, probes
            )
    return best
