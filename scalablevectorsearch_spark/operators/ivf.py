"""IVF (inverted-file) index — k-means clustered layout + n_probes search.

Parity: /root/reference/include/svs/index/ivf/index.h:77-111 (two-level
search), /root/reference/include/svs/index/ivf/common.h:151-166
(IVFSearchParameters: n_probes_, k_reorder_),
/root/reference/include/svs/index/ivf/kmeans.h:47-123 (build).

Spark plan (scale-first):
 - BUILD: k-means (operators.kmeans, one scan per Lloyd iteration) then
   ONE more scan stamping every base row with its cluster_id — the base
   is never shuffled. For persistent layouts, ``save_clustered`` writes
   the stamped table partitioned by a bounded ``cluster_bucket`` so a
   search's probed-cluster filter becomes Parquet partition pruning.
 - SEARCH: centroid argmin runs driver-side on the broadcast-small
   centroid table (Q x k_clusters), exactly the reference's outer level;
   the probed (cluster -> queries) map ships with the query matrix in one
   broadcast. A single ``mapInArrow`` pass scans only rows whose
   cluster_id was probed by someone (`isin` filter -> pushdown/pruning),
   computes distances cluster-by-cluster against just the probing
   queries, and keeps per-partition running top-k — the same
   O(Q·k·P)-row merge shuffle as the flat operator. n_probes bounds the
   scanned fraction to ~n_probes/n_clusters of the base.
 - k_reorder (common.h:156): optional second stage re-ranking the top
   k_reorder approximate candidates with exact full-precision distances
   (meaningful over quantized storage — see operators.sq).

Determinism: clusters from operators.kmeans's oracle protocol; probe
ranking and result ranking both on the e4 key floor(d*1e4+0.5) with
cluster-id / neighbor-id tie-breaks — reproduced verbatim by the DuckDB
oracle (oracles.ivf_knn_sql).
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from scalablevectorsearch_spark.functions.distances import is_similarity, pairwise_distances
from scalablevectorsearch_spark.operators.flat import RESULT_SCHEMA, _ID_SENTINEL, _merge_topk
from scalablevectorsearch_spark.operators.kmeans import KMeansModel, train_kmeans
from scalablevectorsearch_spark.operators.topk import merge_partitions, topk_per_group


@dataclass
class IVFIndex:
    """clustered = base columns + cluster_id INT; model = trained k-means."""

    clustered: DataFrame
    model: KMeansModel
    id_col: str = "id"
    vec_col: str = "vector"
    #: calibration-sample groundtruth cache (the index analog of a gt
    #: file beside the manifest): keyed by everything the exact scan
    #: depends on, so a re-calibration on the same index (new target,
    #: new budget grid) skips the one full-base flat scan — at 1e8 rows
    #: that scan dominated calibration cost (r8: 1355.6s total vs 92.0s
    #: plain search)
    cal_cache: dict = field(default_factory=dict)

    @property
    def n_clusters(self) -> int:
        return self.model.centroids.shape[0]


def ivf_build(
    base: DataFrame,
    n_clusters: int,
    n_iters: int = 2,
    id_col: str = "id",
    vec_col: str = "vector",
    stamp_via: str = "auto",
    model: KMeansModel | None = None,
) -> IVFIndex:
    """Train k-means and stamp each row with its cluster id (one extra
    scan, no shuffle — the stamp is computed in the map side).

    ``stamp_via``: ``"flat"`` = one BLAS argmin over all C centroids
    per row (O(N*C) — the measured wall that forced the r8 1e8 tier
    down to 64k-row cells), ``"hierarchical"`` = grouped
    triangle-pruned stamp (~O(N*sqrt(C)), EXACT same assignments, see
    kmeans.group_centroids), ``"auto"`` = hierarchical at >=
    kmeans.HIERARCHICAL_STAMP_THRESHOLD centroids. ``model``: skip the
    (deterministic) retrain with a pre-trained KMeansModel — e.g. a
    prefix-sample-trained model at the 1e8 tier."""
    from scalablevectorsearch_spark.functions.arrowio import map_stamp
    from scalablevectorsearch_spark.operators.kmeans import make_stamp_fn

    if model is None:
        model = train_kmeans(base, n_clusters, n_iters, id_col, vec_col)
    elif model.centroids.shape[0] != n_clusters:
        raise ValueError(
            f"model has {model.centroids.shape[0]} centroids, "
            f"expected n_clusters={n_clusters}"
        )
    sc = base.sparkSession.sparkContext
    clustered = map_stamp(
        base, vec_col, "cluster_id", make_stamp_fn(sc, model.centroids, stamp_via)
    )
    return IVFIndex(clustered=clustered, model=model, id_col=id_col, vec_col=vec_col)


def probe_clusters_epsilon(
    Q: np.ndarray,
    centroids: np.ndarray,
    epsilon_bp: int,
    max_probes: int | None = None,
    distance: str = "l2",
    min_probes: int | None = None,
) -> list[np.ndarray]:
    """Two-level Inverted cluster selection (memory_based.h:407-460,
    :508 refinement_epsilon_): probe every cluster whose e4 centroid
    key is within (1 + epsilon) of the best, epsilon expressed in basis
    points so the cutoff is exact integer arithmetic in both engines:
    probe c iff key_c * 10000 <= key_best * 10000 + |key_best| * epsilon_bp.
    The additive |key_best| slack equals the reference's multiplicative
    (1 + epsilon) rule for non-negative keys (the L2 case the oracle
    gates) and stays sign-correct when the best key is negative (negated
    similarity keys): a pure multiplicative cutoff would shrink BELOW
    the best key there and probe nothing. The argmin cluster always
    satisfies the cutoff (slack >= 0).

    ``min_probes`` is the per-query probe FLOOR: when the cutoff
    selects fewer clusters, the selection is extended to the
    min_probes nearest by (key, cluster_id) — the same deterministic
    lexsort order the ``max_probes`` cap uses. Rationale (measured,
    tools/probe_alloc_exp.py): a budget-fitted global epsilon yields a
    long-tailed per-query probe distribution; recall is concave in
    probes, so the under-probing tail costs more recall than the
    over-probing tail buys. Clamping to [~3/4 budget, 2x budget]
    matches fixed-fan-out coverage on uniform (signal-free) data and
    beats BOTH fixed and unclamped epsilon on mixed-difficulty
    clustered data.
    Returns one variable-length cluster-id array per query."""
    D = pairwise_distances(Q, centroids, distance)
    key = np.floor(D * 1e4 + 0.5).astype(np.int64)
    if is_similarity(distance):
        key = -key
    out: list[np.ndarray] = []
    for qi in range(key.shape[0]):
        k_best = int(key[qi].min())
        cut = k_best * 10000 + abs(k_best) * epsilon_bp
        sel = np.nonzero(key[qi] * 10000 <= cut)[0]
        if max_probes is not None and len(sel) > max_probes:
            order = np.lexsort((sel, key[qi, sel]))[:max_probes]
            sel = sel[order]
        if min_probes is not None and len(sel) < min_probes:
            m = min(min_probes, key.shape[1])
            allc = np.arange(key.shape[1])
            sel = allc[np.lexsort((allc, key[qi]))[:m]]
        out.append(sel.astype(np.int32))
    return out


def probe_clusters_epsilon_routed(
    Q: np.ndarray,
    centroids: np.ndarray,
    router,
    epsilon_bp: int,
    n_candidates: int | None = None,
    max_probes: int | None = None,
    distance: str = "l2",
    min_probes: int | None = None,
) -> list[np.ndarray]:
    """Two-level probe selection, composed exactly as the reference's
    Inverted index does it (memory_based.h:577-586 route through the
    primary index, :508 refine with epsilon): the centroid ROUTER
    (a Vamana over the centroids, operators.router) proposes
    ``n_candidates`` clusters per query sublinearly, then the epsilon
    cutoff keeps every candidate within (1 + epsilon_bp/1e4) of the
    best candidate. Exact distances are computed only for the proposed
    candidates — O(n_candidates · d) per query instead of O(C · d) —
    which is the path that stays cheap at C ~ 10^6 cells (100 TB).

    ``n_candidates`` defaults to 4x the max_probes cap (or 32). The
    cutoff's ``best`` is the best ROUTED candidate; like the reference,
    recall depends on the router's own recall for the top cluster."""
    from scalablevectorsearch_spark.operators.router import route

    if n_candidates is None:
        n_candidates = 4 * max_probes if max_probes else 32
    n_candidates = min(n_candidates, centroids.shape[0])
    cand = route(router, Q, n_candidates)
    out: list[np.ndarray] = []
    for qi in range(Q.shape[0]):
        cids = np.asarray(sorted({int(c) for c in cand[qi] if c >= 0}), dtype=np.int64)
        D = pairwise_distances(Q[qi : qi + 1], centroids[cids], distance)[0]
        key = np.floor(D * 1e4 + 0.5).astype(np.int64)
        if is_similarity(distance):
            key = -key
        k_best = int(key.min())
        cut = k_best * 10000 + abs(k_best) * epsilon_bp
        keep = key * 10000 <= cut
        sel, skey = cids[keep], key[keep]
        if max_probes is not None and len(sel) > max_probes:
            order = np.lexsort((sel, skey))[:max_probes]
            sel = sel[order]
        if min_probes is not None and len(sel) < min_probes:
            # probe floor among the ROUTED candidates (the router's
            # proposal set bounds what the floor can reach — same
            # contract as the cutoff itself)
            m = min(min_probes, len(cids))
            sel = cids[np.lexsort((cids, key))[:m]]
        out.append(sel.astype(np.int32))
    return out


def budget_probe_clamp(
    probe_budget: float, n_cells: int, max_probes: int | None = None
) -> tuple[int, int]:
    """Per-query probe clamp ``[floor, cap]`` for budget-invariant
    adaptive probing (``probe_budget`` on :func:`ivf_search` /
    ``vamana_search``): floor ~ 3/4 of the budget, cap 2x the budget,
    both bounded by the cell count and an explicit user ``max_probes``
    (a user cap below the floor wins — the floor is a quality default,
    the cap is a hard cost bound).

    The floor is kept STRICTLY below the budget (``ceil(0.75*B)``,
    additionally capped at ``ceil(B) - 1``): if floor >= budget then
    ``clip(raw, floor, cap).mean() >= budget`` already at bp=0, the
    binary search in :func:`fit_epsilon_bp` returns bp=1, and
    "adaptive" probing silently collapses to fixed floor probing.
    The ``ceil(B) - 1`` cap bites exactly at the small budgets (2, 3)
    where ``ceil(0.75*B) == B``; everywhere else the floor is the r6
    ``ceil(0.75*B)`` value — ``int()`` truncation would lower the floor
    by 1 for EVERY fractional ``0.75*B`` (budget 5: 3 vs 4; budget 7:
    5 vs 6), widening the under-probing tail that the clamp exists to
    cut (recall is concave in probes; the under-probing tail costs more
    than the over-probing tail buys). probe_budget=1 is the one
    unavoidable degenerate point (probes >= 1 always); there the clamp
    is [1, 2] and only the over-probing side adapts."""
    import math as _math

    floor = max(
        1,
        min(_math.ceil(0.75 * probe_budget - 1e-9), _math.ceil(probe_budget) - 1),
    )
    floor = min(n_cells, floor)
    cap = min(n_cells, max(floor, int(_math.ceil(2.0 * probe_budget))))
    if max_probes is not None:
        cap = min(max_probes, cap)
    floor = min(floor, cap)
    return floor, cap


def fit_epsilon_bp(
    Q: np.ndarray,
    centroids: np.ndarray,
    target_mean_probes: float,
    distance: str = "l2",
    min_probes: int | None = None,
    max_probes: int | None = None,
) -> int:
    """Choose ``epsilon_bp`` so that epsilon-cutoff probing
    (:func:`probe_clusters_epsilon`) probes ~``target_mean_probes``
    cells per query ON THIS GEOMETRY — the probe budget is the
    invariant, the basis points are derived. On clustered data the same
    budget yields a small epsilon (cells are well separated); on
    uniform data (concentrated centroid distances) it yields a tiny
    epsilon, where a hand-picked constant would silently degrade to a
    full fan-out. This is the calibration philosophy of the reference's
    auto-tuner (calibrate.h) applied to the Inverted index's
    refinement_epsilon (memory_based.h:508).

    Driver-side over a query SAMPLE (same contract as the reference's
    numpy query batches). Binary-searches integer basis points so the
    chosen value is exactly reproducible.

    When the probe selection will be clamped (``min_probes`` /
    ``max_probes`` on :func:`probe_clusters_epsilon`), pass the SAME
    clamps here so the fitted mean accounts for them — otherwise the
    floor inflates the realized mean above the budget."""
    D = pairwise_distances(Q, centroids, distance)
    key = np.floor(D * 1e4 + 0.5).astype(np.int64)
    if is_similarity(distance):
        key = -key
    best = key.min(axis=1, keepdims=True)
    # mean probes for a given bp = mean count of key*1e4 <= best*1e4+|best|*bp
    lo_c = min_probes if min_probes is not None else 0
    hi_c = max_probes if max_probes is not None else key.shape[1]
    lo, hi = 0, 10_000_000
    while lo < hi:
        mid = (lo + hi) // 2
        raw = (key * 10000 <= best * 10000 + np.abs(best) * mid).sum(axis=1)
        cnt = np.clip(raw, lo_c, hi_c).mean()
        if cnt < target_mean_probes:
            lo = mid + 1
        else:
            hi = mid
    return max(1, lo)


def fit_closure_bp(
    X_sample: np.ndarray,
    centroids: np.ndarray,
    target_amplification: float,
) -> int:
    """Choose ``closure_bp`` (SPANN closure replication) so the layout
    grows by ~``target_amplification``x on this geometry: amplification
    is the mean number of cells within (1 + bp/1e4) of each row's
    nearest centroid. Storage budget is the invariant; basis points are
    derived — a constant bp that is safe on clustered data can
    replicate into EVERY cell on uniform data (distance concentration).
    Driver-side over a row sample; exact integer binary search."""
    if target_amplification < 1.0:
        raise ValueError("target_amplification must be >= 1")
    D = pairwise_distances(X_sample, centroids, "l2")
    key = np.floor(D * 1e4 + 0.5).astype(np.int64)
    best = key.min(axis=1, keepdims=True)
    lo, hi = 1, 10_000_000
    while lo < hi:
        mid = (lo + hi) // 2
        amp = (key * 10000 <= best * 10000 + np.abs(best) * mid).sum(axis=1).mean()
        if amp <= target_amplification:
            lo = mid + 1
        else:
            hi = mid
    return max(1, lo - 1)


def probe_clusters(
    Q: np.ndarray, centroids: np.ndarray, n_probes: int, distance: str = "l2"
) -> np.ndarray:
    """(nq, n_probes) probed cluster ids, ranked by e4-rounded centroid
    distance with ascending-cluster-id tie-break (the oracle's ORDER BY).

    Driver-side: centroids are the small side. For very large Q this same
    kernel runs distributed (map the queries table with broadcast
    centroids); the gate contract keeps queries driver-resident like the
    reference's numpy query batches."""
    D = pairwise_distances(Q, centroids, distance)
    key = np.floor(D * 1e4 + 0.5).astype(np.int64)
    if is_similarity(distance):
        key = -key
    cids = np.broadcast_to(np.arange(centroids.shape[0], dtype=np.int64), key.shape)
    order = np.lexsort((cids, key), axis=1)[:, :n_probes]
    return order.astype(np.int32)


def _fit_budget_for_target(
    index: IVFIndex,
    queries: DataFrame,
    k: int,
    target_recall: float,
    distance: str,
    qid_col: str,
    qvec_col: str,
    calibration_queries: int,
    groundtruth: DataFrame | None,
    router,
    router_candidates: int | None,
    where,
    max_probes: int | None = None,
    k_reorder: int | None = None,
    rerank_base: DataFrame | None = None,
    rerank_queries: DataFrame | None = None,
    stats: dict | None = None,
    calibration_margin: float | str | None = "ci",
    calibration_validation_queries: int = 0,
    budget_hint: float | None = None,
) -> float:
    """Fit a probe budget hitting ``target_recall`` on a deterministic
    query sample (ivf_search's target_recall= path). The sample is the
    ``calibration_queries`` smallest qids — reproducible, no RNG.
    Groundtruth defaults to one exact flat scan of the clustered base
    restricted to the sample (a bounded cost: |sample| driver-resident
    queries x one base scan, the same shape as any gated flat_knn).
    The budget search itself is O(log n_clusters/0.25) sampled
    ivf_search jobs, each scanning ~budget/n_clusters of the base.

    The calibration searches run with the SAME ``max_probes`` /
    ``k_reorder`` / rerank arguments as the final search, so the fitted
    budget reflects the operating point the caller will actually run —
    a user ``max_probes`` below the budget clamp's cap lowers the
    calibration recall too, and the fit honestly widens the budget (or
    reports best-effort at max) instead of silently handing back a
    budget whose clamp the final search then cuts. When ``rerank_base``
    is provided, the internal groundtruth is the exact scan of the
    RE-RANK (full-precision) vectors, matching what the re-ranked
    search is graded against.

    The CI margin is sized from the ACTUAL effective sample — the
    fitted qid count, further bounded by the supplied groundtruth's
    distinct qids when the caller passed one with fewer queries than
    requested (recall joins inner on qid, so the effective Bernoulli n
    is the intersection).

    ``calibration_validation_queries`` > 0 holds out that many
    ADDITIONAL qids (the next-smallest after the fit sample, disjoint)
    and grades the fitted budget on them before serving, widening the
    budget until the held-out recall clears the target (see
    calibrate.validate_budget — a within-sample margin cannot remove a
    BIASED draw; the held-out check can detect it).

    ``calibration_queries="auto"`` derives the fit-sample size from the
    CI half-width at (target, k) — calibrate.calibration_sample_size —
    and, when no explicit validation count was given, a held-out split
    of half that, so ``target_recall=`` carries its statistical
    guarantee at any k/target without the caller hand-picking ns.
    ``budget_hint`` warm-starts the budget grid search (e.g. a smaller
    tier's fitted budget scaled by sqrt(N ratio)) — see
    calibrate.calibrate_probe_budget(hint=)."""
    from scalablevectorsearch_spark.operators.calibrate import (
        calibrate_probe_budget,
        calibration_sample_size,
        margined_target,
        validate_budget,
    )
    from scalablevectorsearch_spark.operators.flat import flat_knn

    import time as _time

    if stats is None:
        stats = {}
    if calibration_queries == "auto":
        auto_fit, auto_val = calibration_sample_size(target_recall, k)
        calibration_queries = auto_fit
        if int(calibration_validation_queries) == 0:
            calibration_validation_queries = auto_val
        stats["auto_sized"] = (auto_fit, auto_val)
    calibration_queries = int(calibration_queries)
    qlong = F.col(qid_col).cast("long")
    n_val = max(0, int(calibration_validation_queries))
    all_qids = [
        int(r[0])
        for r in queries.select(qlong.alias("q"))
        .orderBy("q")
        .limit(int(calibration_queries) + n_val)
        .collect()
    ]
    fit_qids = all_qids[:calibration_queries]
    val_qids = all_qids[calibration_queries:]
    sample_q = queries.filter(qlong.isin(fit_qids))

    def restrict_rerank(qids):
        # each calibration step broadcasts |sample| full-precision
        # rerank rows, not the full query set
        if rerank_queries is None:
            return None
        return rerank_queries.filter(qlong.isin(qids))

    def exact_gt(sq, rq, qids_key):
        """Exact groundtruth for one qid sample; cached on the index
        (the gt-beside-the-manifest analog — the exact scan is the
        dominant one-time cost at scale) except on the rerank path,
        whose base identity cannot be keyed. Returns (gt, was_cached)."""
        if rerank_base is not None:
            base = rerank_base
            gt_q = rq if rq is not None else sq
            if where is not None:
                # the predicate may reference metadata columns present on
                # the clustered frame but not on rerank_base — restrict by
                # id via semi-join instead of filtering rerank_base
                passing = index.clustered.filter(where).select(index.id_col)
                base = base.join(passing, on=index.id_col, how="semi")
            return (
                flat_knn(
                    base, gt_q, k=k, distance=distance, qid_col=qid_col,
                    qvec_col=qvec_col, id_col=index.id_col,
                    vec_col=index.vec_col, round_to=4,
                ),
                False,
            )
        gt_key = ("gt", k, distance, tuple(qids_key), str(where))
        cached = index.cal_cache.get(gt_key)
        if cached is not None:
            return index.clustered.sparkSession.createDataFrame(cached), True
        base = index.clustered.select(F.col(index.id_col), F.col(index.vec_col))
        if where is not None:
            base = base.filter(where)
        gt = flat_knn(
            base, sq, k=k, distance=distance, qid_col=qid_col,
            qvec_col=qvec_col, id_col=index.id_col, vec_col=index.vec_col,
            round_to=4,
        )
        # materialize once (|sample| x k rows — driver-small), so gt_sec
        # is an honest split and the cached copy never re-runs the scan
        pdf = gt.toPandas()
        index.cal_cache[gt_key] = pdf
        return index.clustered.sparkSession.createDataFrame(pdf), False

    t_gt = _time.perf_counter()
    n_fit = max(1, len(fit_qids))
    supplied_gt = groundtruth
    if groundtruth is not None:
        # the effective Bernoulli n is the qids the recall join keeps
        n_fit = min(
            n_fit, max(1, groundtruth.select(qid_col).distinct().count())
        )
        stats["gt_cached"] = False
    else:
        groundtruth, stats["gt_cached"] = exact_gt(
            sample_q, restrict_rerank(fit_qids), fit_qids
        )
    stats["gt_sec"] = _time.perf_counter() - t_gt

    def gt_for_validation(vq, vqids):
        # a supplied groundtruth that already covers the held-out qids
        # (e.g. a generator's full-query-set gt) is reused — the
        # internal exact scan is only paid when it must be
        if supplied_gt is not None:
            vgt = supplied_gt.filter(
                F.col(qid_col).cast("long").isin(vqids)
            )
            if vgt.select(qid_col).distinct().count() == len(vqids):
                return vgt
        return exact_gt(vq, restrict_rerank(vqids), vqids)[0]
    stats["n_fit_qids"] = n_fit
    fit_target = margined_target(target_recall, calibration_margin, k, n_fit)
    stats["fit_target"] = fit_target
    t_fit = _time.perf_counter()

    def search_at(b, q, rq):
        return ivf_search(
            index, q, k, distance=distance, qid_col=qid_col,
            qvec_col=qvec_col, round_to=4, probe_budget=b, router=router,
            router_candidates=router_candidates, where=where,
            max_probes=max_probes, k_reorder=k_reorder,
            rerank_base=rerank_base, rerank_queries=rq,
        )

    rq_fit = restrict_rerank(fit_qids)
    if budget_hint is not None:
        stats["budget_hint"] = float(budget_hint)
    cal = calibrate_probe_budget(
        lambda b: search_at(b, sample_q, rq_fit),
        groundtruth, k, target_recall=fit_target,
        max_budget=float(index.n_clusters), hint=budget_hint,
    )
    stats["fit_sec"] = _time.perf_counter() - t_fit
    stats["fit_evals"] = len(cal.probes)
    stats["fitted_budget"] = cal.probe_budget
    stats["fit_recall"] = cal.recall
    budget = cal.probe_budget
    if val_qids:
        t_val = _time.perf_counter()
        val_q = queries.filter(qlong.isin(val_qids))
        rq_val = restrict_rerank(val_qids)
        val_gt = gt_for_validation(val_q, val_qids)
        stats["n_val_qids"] = len(val_qids)
        budget = validate_budget(
            lambda b: search_at(b, val_q, rq_val),
            val_gt, k, target_recall, budget,
            max_budget=float(index.n_clusters), stats=stats,
        )
        stats["val_sec"] = _time.perf_counter() - t_val
        stats["validated_budget"] = budget
    return budget


def _ivf_kernel(
    bc, distance: str, k: int, round_to: int | None, deadline: float | None = None
):
    from scalablevectorsearch_spark.functions.distances import resolve_kernel

    scale = None if round_to is None else float(10**round_to)
    maximize = is_similarity(distance)
    kernel = resolve_kernel(distance)  # bound driver-side

    def fn(batches):
        import time as _time

        import pyarrow as pa

        qids, Q, probe_of = bc.value  # probe_of: dict cluster_id -> query positions
        nqt, d = Q.shape
        if scale is None:
            best_key = np.full((nqt, k), np.inf, dtype=np.float64)
        else:
            best_key = np.full((nqt, k), np.iinfo(np.int64).max, dtype=np.int64)
        best_id = np.full((nqt, k), _ID_SENTINEL, dtype=np.int64)
        seen = False
        for rb in batches:
            if deadline is not None and _time.time() > deadline:
                # per-batch cancel predicate (flat.h:344-346 parity)
                raise TimeoutError(
                    f"search deadline exceeded mid-partition (deadline={deadline})"
                )
            n = rb.num_rows
            if n == 0:
                continue
            seen = True
            ids = rb.column(0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            vec = rb.column(1)
            flat = vec.flatten().to_numpy(zero_copy_only=False)
            if vec.null_count or len(flat) != n * d:
                raise ValueError(f"vector column must be non-null uniform dim {d}")
            V = flat.reshape(n, d)
            cl = rb.column(2).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            for cid in np.unique(cl):
                qidx = probe_of.get(int(cid))
                if qidx is None:
                    continue
                rows = cl == cid
                B = V[rows]
                bid = ids[rows]
                D = kernel(Q[qidx], B)
                if scale is not None:
                    key = np.floor(D * scale + 0.5).astype(np.int64)
                else:
                    key = D
                if maximize:
                    key = -key
                idmat = np.broadcast_to(bid, key.shape).astype(np.int64, copy=False)
                bk, bi = _merge_topk(best_key[qidx], best_id[qidx], key, idmat, k)
                best_key[qidx], best_id[qidx] = bk, bi
        if not seen:
            return
        mask = best_id.reshape(-1) != _ID_SENTINEL
        key_flat = best_key.reshape(-1).astype(np.float64)
        if maximize:
            key_flat = -key_flat
        dist = key_flat if scale is None else key_flat / scale
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.repeat(qids, k)[mask], type=pa.int64()),
                pa.array(best_id.reshape(-1)[mask], type=pa.int64()),
                pa.array(dist[mask], type=pa.float64()),
            ],
            names=["qid", "neighbor_id", "distance"],
        )

    return fn


def ivf_search(
    index: IVFIndex,
    queries: DataFrame,
    k: int,
    n_probes: int = 8,
    distance: str = "l2",
    qid_col: str = "qid",
    qvec_col: str | None = None,
    round_to: int | None = 4,
    epsilon_bp: int | None = None,
    max_probes: int | None = None,
    probe_budget: float | None = None,
    k_reorder: int | None = None,
    rerank_base: DataFrame | None = None,
    rerank_queries: DataFrame | None = None,
    where=None,
    router=None,
    router_candidates: int | None = None,
    max_query_block: int | None = None,
    deadline: float | None = None,
    target_recall: float | None = None,
    calibration_queries: int | str = 32,
    calibration_groundtruth: DataFrame | None = None,
    calibration_stats: dict | None = None,
    calibration_margin: float | str | None = "ci",
    calibration_validation_queries: int = 0,
    calibration_budget_hint: float | None = None,
) -> DataFrame:
    """Approximate k-NN probing clusters per query.

    Cluster selection: fixed ``n_probes`` nearest centroids (IVF,
    common.h:151-166) or, when ``epsilon_bp`` is set, every cluster
    within (1 + epsilon) of the best centroid distance (the two-level
    Inverted index's cutoff rule, memory_based.h:407-460).
    ``probe_budget`` fits ``epsilon_bp`` per query block so the mean
    probes/query is ~budget, with per-query counts clamped to
    [~3/4·budget (strictly < budget), 2·budget] (same contract as
    vamana_search(probe_budget=...); see probe_clusters_epsilon for
    the clamp rationale). Mutually exclusive with explicit
    ``n_probes``/``epsilon_bp``. Passing a
    ``router`` (operators.router.CentroidRouter over this index's
    centroids) replaces the exact O(C·d)-per-query centroid argmin with
    a sublinear graph traversal — the two-level Inverted "primary
    index" design (clustering.h:786-809), for large cluster counts.

    ``k_reorder`` (common.h:156): first retrieve k_reorder candidates
    with the index's stored vectors, then re-rank them EXACTLY against
    ``rerank_base`` (full-precision vectors; required with k_reorder) —
    meaningful when the clustered storage is quantized. When the search
    queries themselves are compressed, pass the ORIGINAL query batch as
    ``rerank_queries`` so the exact stage uses full-precision queries.

    ``where``: hybrid filtered search (flat.h:290-295 predicate
    semantics over the clustered layout) — the predicate lands on the
    member scan BEFORE the kernel, composing with the probed-cluster
    filter for combined cluster + predicate pushdown.

    Returns (qid, rank, neighbor_id, distance) like flat_knn; recall < 1
    exactly when true neighbors live outside probed clusters.

    ``max_query_block``: for query tables too large for the driver —
    iterate hash-partitioned blocks, one probe+scan pass per block,
    each block's result materialized before the next is fetched (see
    flat_knn); incompatible with ``k_reorder``.

    ``target_recall``: recall-targeted probing — the reference's
    auto-tuning philosophy (calibrate.h:249) applied to the probe-cost
    axis. Fits ``probe_budget`` internally with
    :func:`operators.calibrate.calibrate_probe_budget` against exact
    groundtruth on a deterministic calibration sample (the
    ``calibration_queries`` smallest qids; pass
    ``calibration_groundtruth`` — standard (qid, rank, neighbor_id)
    exact results covering those qids — to skip the internal flat
    scan), then runs the full search at the fitted budget. At a fixed
    default ``n_probes`` the realized recall silently tracks the data
    distribution; with a target it tracks the TARGET and the probe
    cost adapts (fixed-probe IVF at 10M recalled 0.830 where
    epsilon probing bought 0.964 at comparable cost). Sample-fitted:
    full-population recall can sit slightly below the target (the
    sample's confidence interval). Mutually exclusive with explicit
    ``epsilon_bp``/``probe_budget``; ignores ``n_probes``.
    ``calibration_stats``: pass a dict to receive the calibration cost
    split — {gt_sec, gt_cached, fit_sec, fit_evals, fitted_budget,
    fit_recall} — so one-time groundtruth+fit cost is never conflated
    with per-query serve cost. The sample groundtruth is cached on the
    index (``index.cal_cache``); a second target_recall search on the
    same index skips the exact scan (gt_cached=True).
    ``calibration_margin``: sampling-aware fit target — ``"ci"``
    (the default) fits at the one-sided 95% upper confidence bound of
    the sample recall (see calibrate.margined_target: a 32-query/k=10
    exact fit is a coin flip on whether the POPULATION clears the
    target; measured 0.8712 at 1e8 rows), a float adds a fixed margin,
    None keeps the exact fit.
    ``calibration_validation_queries``: > 0 holds out that many
    ADDITIONAL disjoint qids and grades the fitted budget on them
    before serving, widening the budget until the held-out recall
    clears the target (calibrate.validate_budget) — catches a fit
    sample whose draw is systematically easier than the population,
    which no within-sample margin can.
    ``calibration_queries="auto"`` sizes the fit/validation split from
    the CI half-width at (target, k) (calibrate.calibration_sample_size)
    instead of hand-picked constants.
    ``calibration_budget_hint``: warm-start for the budget grid search
    — e.g. a smaller tier's fitted budget scaled by sqrt(N ratio); a
    good hint replaces the opening full-fan-out calibration probe with
    evals near the true operating point (calibrate_probe_budget(hint=));
    a bad one costs only the gallop steps."""
    if target_recall is not None:
        if epsilon_bp is not None or probe_budget is not None:
            raise ValueError(
                "target_recall is mutually exclusive with epsilon_bp/probe_budget"
            )
        if not 0.0 < target_recall <= 1.0:
            raise ValueError("target_recall must be in (0, 1]")
        budget = _fit_budget_for_target(
            index, queries, k, target_recall, distance, qid_col,
            qvec_col or index.vec_col, calibration_queries,
            calibration_groundtruth, router, router_candidates, where,
            max_probes=max_probes, k_reorder=k_reorder,
            rerank_base=rerank_base, rerank_queries=rerank_queries,
            stats=calibration_stats, calibration_margin=calibration_margin,
            calibration_validation_queries=calibration_validation_queries,
            budget_hint=calibration_budget_hint,
        )
        return ivf_search(
            index, queries, k, distance=distance, qid_col=qid_col,
            qvec_col=qvec_col, round_to=round_to, max_probes=max_probes,
            probe_budget=budget, k_reorder=k_reorder,
            rerank_base=rerank_base, rerank_queries=rerank_queries,
            where=where, router=router, router_candidates=router_candidates,
            max_query_block=max_query_block, deadline=deadline,
        )
    if probe_budget is not None:
        if epsilon_bp is not None:
            raise ValueError("probe_budget is mutually exclusive with epsilon_bp")
        if probe_budget < 1:
            raise ValueError("probe_budget must be >= 1")
    qvec_col = qvec_col or index.vec_col
    if max_query_block is None:
        qp = queries.select(
            F.col(qid_col).cast("long").alias("qid"), F.col(qvec_col).alias("qv")
        ).toPandas()
        blocks = iter([qp])
    else:
        if k_reorder is not None:
            raise ValueError("max_query_block does not compose with k_reorder")
        from scalablevectorsearch_spark.operators.flat import query_blocks

        blocks = query_blocks(queries, qid_col, qvec_col, max_query_block)

    parts: list[DataFrame] = []
    for qp in blocks:
        if len(qp) == 0:
            continue
        part, bc = _ivf_search_block(
            index, qp, k, n_probes, distance, round_to, epsilon_bp,
            max_probes, k_reorder, where, router, deadline,
            router_candidates=router_candidates, probe_budget=probe_budget,
        )
        if max_query_block is not None:
            part = part.persist()
            part.count()
            bc.unpersist()
        parts.append(part)
    if not parts:
        raise ValueError("empty query batch")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if k_reorder is None:
        return out.select("qid", "rank", "neighbor_id", "distance")
    if rerank_base is None:
        raise ValueError("k_reorder requires rerank_base (full-precision vectors)")
    sc = queries.sparkSession.sparkContext
    qids = qp["qid"].to_numpy(dtype=np.int64)
    Q = np.stack(qp["qv"].to_numpy()).astype(np.float64)
    if rerank_queries is not None:
        rq = rerank_queries.select(
            F.col(qid_col).cast("long").alias("qid"), F.col(qvec_col).alias("qv")
        ).toPandas()
        rqids = rq["qid"].to_numpy(dtype=np.int64)
        rQ = np.stack(rq["qv"].to_numpy()).astype(np.float64)
    else:
        rqids, rQ = qids, Q
    return _rerank_exact(
        out, rerank_base, sc.broadcast((rqids, rQ)), k, distance, round_to,
        id_col=index.id_col, vec_col=index.vec_col,
    )


def _ivf_search_block(
    index: IVFIndex,
    qp,
    k: int,
    n_probes: int,
    distance: str,
    round_to: int | None,
    epsilon_bp: int | None,
    max_probes: int | None,
    k_reorder: int | None,
    where,
    router,
    deadline: float | None = None,
    router_candidates: int | None = None,
    probe_budget: float | None = None,
) -> tuple[DataFrame, object]:
    """One query block's probe + member scan + merge; returns the
    ranked candidates (inner_k deep when re-ranking) and the block's
    broadcast."""
    qids = qp["qid"].to_numpy(dtype=np.int64)
    Q = np.stack(qp["qv"].to_numpy()).astype(np.float64)

    min_probes: int | None = None
    if probe_budget is not None:
        # budget-invariant adaptive probing with the clamped fit (same
        # contract and rationale as vamana_search's probe_budget path);
        # the floor stays strictly below the budget so small budgets
        # don't degenerate to fixed probing (budget_probe_clamp)
        n_cl = index.model.centroids.shape[0]
        min_probes, max_probes = budget_probe_clamp(probe_budget, n_cl, max_probes)
        epsilon_bp = fit_epsilon_bp(
            Q, index.model.centroids, float(probe_budget), distance,
            min_probes=min_probes, max_probes=max_probes,
        )
    probe_of: dict[int, np.ndarray] = {}
    if epsilon_bp is not None:
        # epsilon probing is uncapped by default ("every cluster within
        # (1+epsilon)", memory_based.h:508); the fixed n_probes budget
        # does NOT apply here — cap only via the explicit max_probes.
        # With a router, the primary index proposes candidates
        # sublinearly and epsilon refines them (the full two-level
        # composition, memory_based.h:577-586 + :508).
        if router is not None:
            sel = probe_clusters_epsilon_routed(
                Q, index.model.centroids, router, epsilon_bp,
                n_candidates=router_candidates, max_probes=max_probes,
                distance=distance, min_probes=min_probes,
            )
        else:
            sel = probe_clusters_epsilon(
                Q, index.model.centroids, epsilon_bp, max_probes=max_probes,
                min_probes=min_probes,
                distance=distance,
            )
        for qi, cids in enumerate(sel):
            for c in cids:
                probe_of.setdefault(int(c), []).append(qi)
        probe_of = {c: np.asarray(v, dtype=np.int64) for c, v in probe_of.items()}
    elif router is not None:
        from scalablevectorsearch_spark.operators.router import route

        probes = route(router, Q, min(n_probes, index.n_clusters))
        for c in np.unique(probes):
            if c >= 0:
                probe_of[int(c)] = np.nonzero((probes == c).any(axis=1))[0]
    else:
        n_probes = min(n_probes, index.n_clusters)
        probes = probe_clusters(Q, index.model.centroids, n_probes, distance)
        for c in np.unique(probes):
            probe_of[int(c)] = np.nonzero((probes == c).any(axis=1))[0]

    inner_k = k if k_reorder is None else max(k_reorder, k)

    probed_union = [int(c) for c in sorted(probe_of)]
    clustered = index.clustered
    if where is not None:
        clustered = clustered.filter(where)
    scan = (
        clustered
        # probed-cluster filter FIRST: becomes partition pruning on a
        # cluster-partitioned layout, row-group skipping otherwise
        .filter(F.col("cluster_id").isin(probed_union))
        .select(
            F.col(index.id_col).cast("long").alias("__id"),
            F.col(index.vec_col).alias("__vec"),
            F.col("cluster_id").alias("__cid"),
        )
    )

    sc = index.clustered.sparkSession.sparkContext
    bc = sc.broadcast((qids, Q, probe_of))
    cand = scan.mapInArrow(
        _ivf_kernel(bc, distance, inner_k, round_to, deadline), RESULT_SCHEMA
    )
    out = topk_per_group(
        cand,
        group_col="qid",
        order_col="distance",
        k=inner_k,
        ascending=not is_similarity(distance),
        tie_col="neighbor_id",
        num_partitions=merge_partitions(
            len(qids), inner_k, index.clustered.sparkSession
        ),
    )
    return out, bc


def _rerank_exact(
    candidates: DataFrame,
    base: DataFrame,
    bc_queries,
    k: int,
    distance: str,
    round_to: int | None,
    id_col: str = "id",
    vec_col: str = "vector",
) -> DataFrame:
    """Exact re-rank stage (k_reorder, common.h:156): the Q x k_reorder
    candidate set is broadcast against the full-precision base (the base
    is scanned once, filtered by the broadcast semi side), distances
    recomputed in float64, then the final per-query top-k."""
    from collections.abc import Iterator

    scale = None if round_to is None else float(10**round_to)
    maximize = is_similarity(distance)
    pairs = candidates.select("qid", "neighbor_id")
    vecs = base.select(
        F.col(id_col).cast("long").alias("neighbor_id"), F.col(vec_col).alias("__vec")
    )
    joined = vecs.join(F.broadcast(pairs), "neighbor_id").select(
        "qid", "neighbor_id", "__vec"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids, Q = bc_queries.value
        pos = {int(q): i for i, q in enumerate(qids)}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["__vec"].to_numpy()).astype(np.float64)
            qi = np.asarray([pos[int(q)] for q in pdf["qid"]], dtype=np.int64)
            d = np.empty(len(pdf), dtype=np.float64)
            for u in np.unique(qi):
                rows = qi == u
                d[rows] = pairwise_distances(Q[u : u + 1], V[rows], distance)[0]
            if scale is not None:
                d = np.floor(d * scale + 0.5) / scale
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].to_numpy(dtype=np.int64),
                    "neighbor_id": pdf["neighbor_id"].to_numpy(dtype=np.int64),
                    "distance": d,
                }
            )

    exact = joined.mapInPandas(fn, RESULT_SCHEMA)
    out = topk_per_group(
        exact,
        group_col="qid",
        order_col="distance",
        k=k,
        ascending=not maximize,
        tie_col="neighbor_id",
        num_partitions=merge_partitions(
            len(bc_queries.value[0]), k, base.sparkSession
        ),
    )
    return out.select("qid", "rank", "neighbor_id", "distance")


def save_clustered(index: IVFIndex, path: str, n_buckets: int = 256) -> None:
    """Persist the clustered layout partitioned by a bounded bucket of
    cluster_id, so probed-cluster filters prune whole partitions at scale
    (32k clusters -> 256 dirs, not 32k)."""
    (
        index.clustered.withColumn(
            "cluster_bucket", F.pmod(F.col("cluster_id"), F.lit(n_buckets))
        )
        .repartition("cluster_bucket")
        .write.mode("overwrite")
        .partitionBy("cluster_bucket")
        .parquet(path)
    )
