"""DuckDB oracle SQL generators for the driver's correctness gate.

Every compared numeric that is *computed* (distances, recalls) is emitted
as a scaled BIGINT (``floor(x*10000 + 0.5)`` -> ``*_e4``) in BOTH
engines, so the driver's value-hash never depends on float formatting or
1-ULP rounding differences between Spark and DuckDB. Raw stored values
(ids, ranks, counts) pass through unscaled.

Ranking happens ON the e4 key (not the raw float): the engine's kernels
select per-query top-k on ``floor(d*1e4 + 0.5)`` with an ascending-id
tie-break, and the oracle's ``row_number`` ORDER BY uses the identical
expression — near-ties inside the ~1e-13 kernel-vs-sequential-fold
discrepancy therefore resolve identically in both engines. The floor
form is round-half-up in numpy, Spark, and DuckDB alike (no banker's
rounding divergence).

The SQL mirrors the engine's semantics exactly: float64 math, L2 is
squared-Euclidean minimized, IP/cosine maximized, ties broken by
ascending id (reference: include/svs/lib/neighbor.h id-ordered
comparators).
"""

from __future__ import annotations

_DIST_SQL = {
    "l2": "list_sum(list_transform(range(1, len(qv)+1), i -> (qv[i]-bv[i])*(qv[i]-bv[i])))",
    "ip": "list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*bv[i]))",
    "cosine": (
        "list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*bv[i])) / "
        "(sqrt(list_sum(list_transform(qv, x -> x*x))) * "
        "sqrt(list_sum(list_transform(bv, x -> x*x))))"
    ),
}

_ORDER = {"l2": "ASC", "ip": "DESC", "cosine": "DESC"}

E4 = "CAST(floor({expr} * 10000 + 0.5) AS BIGINT)"


def knn_cte(distance: str, n_queries: int, where: str = "") -> str:
    """CTE body producing r(qid, id, dist_e4, rnk) for flat k-NN on the
    embeddings table with queries = vec_id < n_queries. Ranking is on the
    e4 key with ascending-id tie-break — identical to the engine kernel."""
    where_clause = f"WHERE {where}" if where else ""
    e4 = E4.format(expr="dist")
    return f"""
q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < {n_queries}),
b AS (SELECT vec_id AS id, label, embedding::DOUBLE[] AS bv
      FROM embeddings {where_clause}),
d AS (SELECT qid, id, label, {_DIST_SQL[distance]} AS dist FROM q CROSS JOIN b),
r AS (SELECT qid, id, label, {e4} AS dist_e4,
             row_number() OVER (PARTITION BY qid ORDER BY {e4} {_ORDER[distance]}, id ASC) AS rnk
      FROM d)
""".strip()


def flat_knn_sql(distance: str, k: int, n_queries: int, where: str = "") -> str:
    return f"""
WITH {knn_cte(distance, n_queries, where)}
SELECT qid, rnk AS rank, id AS neighbor_id, dist_e4 AS distance_e4
FROM r WHERE rnk <= {k}
""".strip()


def multivector_knn_sql(distance: str, k: int, k_inner: int, n_queries: int) -> str:
    return f"""
WITH {knn_cte(distance, n_queries)},
inner_k AS (SELECT qid, id, label, dist_e4 FROM r WHERE rnk <= {k_inner}),
per_label AS (
  SELECT qid, id, label, dist_e4,
         row_number() OVER (PARTITION BY qid, label ORDER BY dist_e4 {_ORDER[distance]}, id ASC) AS lr
  FROM inner_k),
best AS (SELECT qid, id, label, dist_e4 FROM per_label WHERE lr = 1),
ranked AS (
  SELECT qid, label, id, dist_e4,
         row_number() OVER (PARTITION BY qid ORDER BY dist_e4 {_ORDER[distance]}, id ASC) AS rnk
  FROM best)
SELECT qid, rnk AS rank, label, id AS neighbor_id, dist_e4 AS distance_e4
FROM ranked WHERE rnk <= {k}
""".strip()


def recall_sql(k: int, n_queries: int) -> str:
    e4_l2 = E4.format(expr="dist_l2")
    e4_ip = E4.format(expr="dist_ip")
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {n_queries}),
b AS (SELECT vec_id AS id, embedding::DOUBLE[] AS bv FROM embeddings),
d AS (SELECT qid, id,
             {_DIST_SQL["l2"]} AS dist_l2,
             {_DIST_SQL["ip"]} AS dist_ip
      FROM q CROSS JOIN b),
r AS (SELECT qid, id,
             row_number() OVER (PARTITION BY qid ORDER BY {e4_l2} ASC, id ASC) AS rnk_l2,
             row_number() OVER (PARTITION BY qid ORDER BY {e4_ip} DESC, id ASC) AS rnk_ip
      FROM d),
gt AS (SELECT qid, id FROM r WHERE rnk_l2 <= {k}),
res AS (SELECT qid, id FROM r WHERE rnk_ip <= {k})
SELECT
  (SELECT count(*) FROM res WHERE EXISTS
     (SELECT 1 FROM gt WHERE gt.qid = res.qid AND gt.id = res.id)) AS matched,
  (SELECT count(DISTINCT qid) FROM res) AS n_queries
""".strip()


def medioid_sql() -> str:
    return """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
comp AS (
  SELECT pos, avg(x) AS m
  FROM (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e) u
  GROUP BY pos),
mean AS (SELECT list(m ORDER BY pos) AS mv FROM comp),
d AS (SELECT vec_id,
             list_sum(list_transform(range(1, len(v)+1), i -> (v[i]-mv[i])*(v[i]-mv[i]))) AS dist
      FROM e CROSS JOIN mean)
SELECT vec_id AS entry_id FROM d ORDER BY dist ASC, vec_id ASC LIMIT 1
""".strip()


def _dist_vc(v: str = "v", c: str = "cv") -> str:
    return f"list_sum(list_transform(range(1, len({v})+1), i -> ({v}[i]-{c}[i])*({v}[i]-{c}[i])))"


def kmeans_ctes(k: int, iters: int) -> tuple[str, str]:
    """Unrolled deterministic Lloyd loop over the embeddings table,
    mirroring operators.kmeans exactly: init = vectors of the k smallest
    ids; argmin ties to the smallest cluster id; centroid components
    re-rounded via floor(x*1e6+0.5)/1e6 each iteration; empty clusters
    keep the previous centroid. Returns (cte_sql, final_centroid_cte)."""
    parts = [
        "e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY id ASC) - 1 AS INT) AS cid,
         list_transform(v, x -> floor(x * 1000000 + 0.5) / 1000000) AS cv
  FROM (SELECT id, v FROM e ORDER BY id ASC LIMIT {k}) init)""",
    ]
    for t in range(1, iters + 1):
        prev = f"c{t-1}"
        parts.append(
            f"""a{t} AS (
  SELECT id, cid FROM (
    SELECT e.id, c.cid,
           row_number() OVER (PARTITION BY e.id ORDER BY {_dist_vc('e.v', 'c.cv')} ASC, c.cid ASC) AS rn
    FROM e CROSS JOIN {prev} c
  ) ranked WHERE rn = 1)"""
        )
        parts.append(
            f"""m{t} AS (
  SELECT cid, list(floor(m * 1000000 + 0.5) / 1000000 ORDER BY pos) AS cv
  FROM (
    SELECT cid, pos, avg(x) AS m
    FROM (
      SELECT a.cid AS cid, unnest(e.v) AS x, generate_subscripts(e.v, 1) AS pos
      FROM e JOIN a{t} a USING (id)
    ) ux
    GROUP BY cid, pos
  ) mm GROUP BY cid)"""
        )
        parts.append(
            f"""c{t} AS (
  SELECT p.cid, COALESCE(m.cv, p.cv) AS cv
  FROM {prev} p LEFT JOIN m{t} m USING (cid))"""
        )
    return ",\n".join(parts), f"c{iters}"


def kmeans_assign_sql(k: int, iters: int) -> str:
    ctes, cfinal = kmeans_ctes(k, iters)
    return f"""
WITH {ctes}
SELECT id, cid AS cluster_id FROM (
  SELECT e.id, c.cid,
         row_number() OVER (PARTITION BY e.id ORDER BY {_dist_vc('e.v', 'c.cv')} ASC, c.cid ASC) AS rn
  FROM e CROSS JOIN {cfinal} c
) ranked WHERE rn = 1
""".strip()


def ivf_knn_sql(k: int, n_clusters: int, kmeans_iters: int, n_probes: int, n_queries: int) -> str:
    """Full IVF search (L2): probe the n_probes nearest final centroids
    per query (e4-key ranked, cid tie-break), scan members of probed
    clusters, top-k on the e4 key with id tie-break."""
    ctes, cfinal = kmeans_ctes(n_clusters, kmeans_iters)
    e4p = E4.format(expr="dist")
    return f"""
WITH {ctes},
af AS (
  SELECT id, cid FROM (
    SELECT e.id, c.cid,
           row_number() OVER (PARTITION BY e.id ORDER BY {_dist_vc('e.v', 'c.cv')} ASC, c.cid ASC) AS rn
    FROM e CROSS JOIN {cfinal} c
  ) ranked WHERE rn = 1),
qs AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
       FROM embeddings WHERE vec_id < {n_queries}),
pd AS (SELECT qid, cid, {_dist_vc('qv', 'c.cv')} AS dist FROM qs CROSS JOIN {cfinal} c),
probe AS (SELECT qid, cid FROM (
    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY {e4p} ASC, cid ASC) AS pr
    FROM pd) pp WHERE pr <= {n_probes}),
cd AS (
  SELECT p.qid, a.id, {_dist_vc('q.qv', 'e.v')} AS dist
  FROM probe p
  JOIN af a ON p.cid = a.cid
  JOIN e ON a.id = e.id
  JOIN qs q ON p.qid = q.qid),
r AS (SELECT qid, id, {e4p} AS dist_e4,
             row_number() OVER (PARTITION BY qid ORDER BY {e4p} ASC, id ASC) AS rnk
      FROM cd)
SELECT qid, rnk AS rank, id AS neighbor_id, dist_e4 AS distance_e4
FROM r WHERE rnk <= {k}
""".strip()


def ivf_recall_sql(k: int, n_clusters: int, kmeans_iters: int, n_probes: int, n_queries: int) -> str:
    """matched / n_queries of IVF top-k vs exact flat top-k (both L2,
    both e4-key ranked) — the recall numerator is deterministic because
    both engines compute identical IVF and flat result sets."""
    ivf = ivf_knn_sql(k, n_clusters, kmeans_iters, n_probes, n_queries)
    flat = flat_knn_sql("l2", k, n_queries)
    return f"""
WITH ivf_res AS ({ivf}),
flat_res AS ({flat})
SELECT
  (SELECT count(*) FROM ivf_res i WHERE EXISTS
     (SELECT 1 FROM flat_res f WHERE f.qid = i.qid AND f.neighbor_id = i.neighbor_id)) AS matched,
  (SELECT count(DISTINCT qid) FROM ivf_res) AS n_queries
""".strip()


_SQ_PROLOGUE = """
mm AS (SELECT min(list_min(embedding))::DOUBLE AS gmin,
              max(list_max(embedding))::DOUBLE AS gmax
       FROM embeddings),
pp AS (SELECT gmin, gmax,
              (gmax - gmin) / 255.0 AS scale,
              gmin + 128.0 * ((gmax - gmin) / 255.0) AS bias
       FROM mm)
""".strip()

_SQ_COMPRESS = (
    "list_transform({col}, x -> greatest(-128.0, least(127.0, "
    "floor((x::DOUBLE - bias) / scale + 0.5))))"
)


def sq_minmax_sql() -> str:
    return f"""
WITH {_SQ_PROLOGUE}
SELECT {E4.format(expr='gmin')} AS gmin_e4, {E4.format(expr='gmax')} AS gmax_e4,
       CAST(floor(scale * 1000000000 + 0.5) AS BIGINT) AS scale_e9,
       CAST(floor(bias * 1000000000 + 0.5) AS BIGINT) AS bias_e9
FROM pp
""".strip()


def sq_roundtrip_sql(n_ids: int) -> str:
    """compress -> decompress -> exploded (id, pos, val_e4)."""
    comp = _SQ_COMPRESS.format(col="embedding")
    return f"""
WITH {_SQ_PROLOGUE},
cb AS (SELECT vec_id AS id, {comp} AS qv, scale, bias
       FROM embeddings CROSS JOIN pp WHERE vec_id < {n_ids}),
dec AS (SELECT id, list_transform(qv, c -> scale * c + bias) AS v FROM cb)
SELECT id, pos - 1 AS pos, {E4.format(expr='x')} AS val_e4
FROM (SELECT id, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM dec) u
""".strip()


def sq_knn_sql(distance: str, k: int, n_queries: int) -> str:
    """k-NN over int8-quantized storage with corrected distance emission
    (scalar.h compute() semantics; see operators/sq.py)."""
    comp_b = _SQ_COMPRESS.format(col="embedding")
    if distance == "l2":
        # query compressed too; rank on the exact integer-domain distance,
        # emit (dint * scale) * scale
        return f"""
WITH {_SQ_PROLOGUE},
cb AS (SELECT vec_id AS id, {comp_b} AS bv FROM embeddings CROSS JOIN pp),
cq AS (SELECT vec_id AS qid, {comp_b} AS qv FROM embeddings CROSS JOIN pp
       WHERE vec_id < {n_queries}),
d AS (SELECT qid, id, {_DIST_SQL["l2"]} AS dist FROM cq CROSS JOIN cb),
r AS (SELECT qid, id, dist,
             row_number() OVER (PARTITION BY qid ORDER BY {E4.format(expr='dist')} ASC, id ASC) AS rnk
      FROM d)
SELECT qid, rnk AS rank, id AS neighbor_id,
       {E4.format(expr='(dist * scale) * scale')} AS distance_e4
FROM r CROSS JOIN pp WHERE rnk <= {k}
""".strip()
    if distance == "ip":
        # query stays full precision; corrected = scale*d + bias*sum(q),
        # with d the e4-rounded raw inner product (what the kernel emits)
        return f"""
WITH {_SQ_PROLOGUE},
cb AS (SELECT vec_id AS id, {comp_b} AS bv FROM embeddings CROSS JOIN pp),
cq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv,
              list_sum(embedding::DOUBLE[]) AS qsum
       FROM embeddings WHERE vec_id < {n_queries}),
d AS (SELECT qid, id, qsum, {_DIST_SQL["ip"]} AS dist FROM cq CROSS JOIN cb),
r AS (SELECT qid, id, qsum,
             floor(dist * 10000 + 0.5) / 10000.0 AS dr,
             row_number() OVER (PARTITION BY qid ORDER BY {E4.format(expr='dist')} DESC, id ASC) AS rnk
      FROM d)
SELECT qid, rnk AS rank, id AS neighbor_id,
       {E4.format(expr='(scale * dr + bias * qsum)')} AS distance_e4
FROM r CROSS JOIN pp WHERE rnk <= {k}
""".strip()
    raise ValueError(f"unsupported sq oracle distance {distance!r}")


def dynamic_flat_knn_sql(
    k: int, n_queries: int, n_added: int, add_offset: int, del_lo: int, del_hi: int
) -> str:
    """Flat L2 k-NN over (base + copies of vec_id < n_added shifted by
    add_offset - rows with del_lo <= vec_id < del_hi) — the dynamic-flat
    mutation surface as pure SQL."""
    e4 = E4.format(expr="dist")
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {n_queries}),
b AS (
  SELECT vec_id AS id, embedding::DOUBLE[] AS bv FROM embeddings
  WHERE vec_id NOT BETWEEN {del_lo} AND {del_hi - 1}
  UNION ALL
  SELECT vec_id + {add_offset} AS id, embedding::DOUBLE[] AS bv FROM embeddings
  WHERE vec_id < {n_added}),
d AS (SELECT qid, id, {_DIST_SQL["l2"]} AS dist FROM q CROSS JOIN b),
r AS (SELECT qid, id, {e4} AS dist_e4,
             row_number() OVER (PARTITION BY qid ORDER BY {e4} ASC, id ASC) AS rnk
      FROM d)
SELECT qid, rnk AS rank, id AS neighbor_id, dist_e4 AS distance_e4
FROM r WHERE rnk <= {k}
""".strip()


def reconstruct_sql(n_ids: int) -> str:
    """Exploded (id, pos, val_e4) — arrays are unhashable in the driver's
    canonicalizer, so both engines emit one row per component. pos is
    0-based (Spark posexplode convention)."""
    val_e4 = E4.format(expr="x::DOUBLE")
    return f"""
SELECT vec_id AS id, pos - 1 AS pos, {val_e4} AS val_e4
FROM (SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS pos
      FROM embeddings WHERE vec_id < {n_ids}) u
""".strip()
