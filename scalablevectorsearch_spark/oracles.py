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


def dynamic_multivector_knn_sql(
    k: int,
    k_inner: int,
    n_queries: int,
    n_added: int,
    add_offset: int,
    label_offset: int,
    del_labels: tuple,
) -> str:
    """Label-deduped k-NN over the MUTATED multi-vector table: base
    plus copies of vec_id < n_added (shifted ids, shifted labels) minus
    EVERY row carrying a deleted label — the MultiMutableVamanaIndex
    surface (multi.h:155) as pure SQL."""
    e4 = E4.format(expr="dist")
    labs = ", ".join(str(int(l)) for l in del_labels)
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {n_queries}),
b0 AS (SELECT vec_id AS id, label, embedding::DOUBLE[] AS bv FROM embeddings
       UNION ALL
       SELECT vec_id + {add_offset} AS id, label + {label_offset} AS label,
              embedding::DOUBLE[] AS bv
       FROM embeddings WHERE vec_id < {n_added}),
b AS (SELECT * FROM b0 WHERE label NOT IN ({labs})),
d AS (SELECT qid, id, label, {_DIST_SQL["l2"]} AS dist FROM q CROSS JOIN b),
r AS (SELECT qid, id, label, {e4} AS dist_e4,
             row_number() OVER (PARTITION BY qid ORDER BY {e4} ASC, id ASC) AS rnk
      FROM d),
inner_k AS (SELECT qid, id, label, dist_e4 FROM r WHERE rnk <= {k_inner}),
per_label AS (
  SELECT qid, id, label, dist_e4,
         row_number() OVER (PARTITION BY qid, label ORDER BY dist_e4 ASC, id ASC) AS lr
  FROM inner_k),
best AS (SELECT qid, id, label, dist_e4 FROM per_label WHERE lr = 1),
ranked AS (
  SELECT qid, label, id, dist_e4,
         row_number() OVER (PARTITION BY qid ORDER BY dist_e4 ASC, id ASC) AS rnk
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


def kmeans_ctes(
    k: int,
    iters: int,
    e_cte: str = "SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings",
) -> tuple[str, str]:
    """Unrolled deterministic Lloyd loop over ``e_cte`` (default: the
    embeddings table), mirroring operators.kmeans exactly: init = vectors
    of the k smallest ids; argmin ties to the smallest cluster id;
    centroid components re-rounded via floor(x*1e6+0.5)/1e6 each
    iteration; empty clusters keep the previous centroid. Returns
    (cte_sql, final_centroid_cte)."""
    parts = [
        f"e AS ({e_cte})",
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


def hierarchical_kmeans_assign_sql(
    n_parents: int, n_children: int, iters: int
) -> str:
    """Two-level Lloyd unrolled: parent loop (kmeans_ctes) -> parent
    assignment -> per-parent child Lloyd (init = n_children smallest ids
    within the parent, same rounding protocol) -> final (id, parent_cid,
    child_cid)."""
    ctes, cfinal = kmeans_ctes(n_parents, iters)
    parts = [
        f"""af AS (
  SELECT id, cid AS pcid FROM (
    SELECT e.id, c.cid,
           row_number() OVER (PARTITION BY e.id ORDER BY {_dist_vc('e.v', 'c.cv')} ASC, c.cid ASC) AS rn
    FROM e CROSS JOIN {cfinal} c
  ) ranked WHERE rn = 1)""",
        "mem AS (SELECT e.id, e.v, a.pcid FROM e JOIN af a USING (id))",
        f"""h0 AS (
  SELECT pcid, CAST(rn - 1 AS INT) AS ccid,
         list_transform(v, x -> floor(x * 1000000 + 0.5) / 1000000) AS cv
  FROM (SELECT pcid, id, v,
               row_number() OVER (PARTITION BY pcid ORDER BY id ASC) AS rn
        FROM mem) s
  WHERE rn <= {n_children})""",
    ]
    for t in range(1, iters + 1):
        prev = f"h{t-1}"
        parts.append(
            f"""ha{t} AS (
  SELECT id, pcid, ccid FROM (
    SELECT m.id, m.pcid, c.ccid,
           row_number() OVER (PARTITION BY m.id ORDER BY {_dist_vc('m.v', 'c.cv')} ASC, c.ccid ASC) AS rn
    FROM mem m JOIN {prev} c ON m.pcid = c.pcid
  ) r WHERE rn = 1)"""
        )
        parts.append(
            f"""hm{t} AS (
  SELECT pcid, ccid, list(floor(m * 1000000 + 0.5) / 1000000 ORDER BY pos) AS cv
  FROM (
    SELECT pcid, ccid, pos, avg(x) AS m
    FROM (
      SELECT a.pcid AS pcid, a.ccid AS ccid, unnest(e.v) AS x,
             generate_subscripts(e.v, 1) AS pos
      FROM e JOIN ha{t} a USING (id)
    ) ux GROUP BY pcid, ccid, pos
  ) mm GROUP BY pcid, ccid)"""
        )
        parts.append(
            f"""h{t} AS (
  SELECT p.pcid, p.ccid, COALESCE(m.cv, p.cv) AS cv
  FROM {prev} p LEFT JOIN hm{t} m ON p.pcid = m.pcid AND p.ccid = m.ccid)"""
        )
    body = ",\n".join(parts)
    return f"""
WITH {ctes},
{body}
SELECT id, pcid AS parent_cid, ccid AS child_cid FROM (
  SELECT m.id, m.pcid, c.ccid,
         row_number() OVER (PARTITION BY m.id ORDER BY {_dist_vc('m.v', 'c.cv')} ASC, c.ccid ASC) AS rn
  FROM mem m JOIN h{iters} c ON m.pcid = c.pcid
) r WHERE rn = 1
""".strip()


def ivf_knn_sql(
    k: int,
    n_clusters: int,
    kmeans_iters: int,
    n_probes: int,
    n_queries: int,
    epsilon_bp: int | None = None,
    member_where: str | None = None,
    e_cte: str = "SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings",
) -> str:
    """Full IVF search (L2): probe the n_probes nearest final centroids
    per query (e4-key ranked, cid tie-break), scan members of probed
    clusters, top-k on the e4 key with id tie-break. With ``epsilon_bp``
    the probe rule becomes the two-level Inverted cutoff: probe every
    cluster with key*10000 <= best_key*(10000+epsilon_bp).
    ``member_where``: hybrid-search predicate over the member scan,
    written against the alias ``emf`` (the embeddings row of the
    candidate member), e.g. ``emf.label = 3``.
    ``e_cte``: the (id, v) base-table SQL — override with a mutated
    base (union of adds, anti-join of deletes) for the dynamic-IVF
    gate, where post-recluster search must equal a fresh build over
    the mutated rows."""
    ctes, cfinal = kmeans_ctes(n_clusters, kmeans_iters, e_cte=e_cte)
    e4p = E4.format(expr="dist")
    if epsilon_bp is None:
        probe_cte = f"""probe AS (SELECT qid, cid FROM (
    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY {e4p} ASC, cid ASC) AS pr
    FROM pd) pp WHERE pr <= {n_probes})"""
    else:
        probe_cte = f"""probe AS (SELECT qid, cid FROM (
    SELECT qid, cid, {e4p} AS e4key,
           min({e4p}) OVER (PARTITION BY qid) AS best
    FROM pd) pp WHERE e4key * 10000 <= best * (10000 + {epsilon_bp}))"""
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
{probe_cte},
cd AS (
  SELECT p.qid, a.id, {_dist_vc('q.qv', 'e.v')} AS dist
  FROM probe p
  JOIN af a ON p.cid = a.cid
  JOIN e ON a.id = e.id
  JOIN qs q ON p.qid = q.qid
  {"JOIN embeddings emf ON a.id = emf.vec_id WHERE " + member_where if member_where else ""}),
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
    if distance == "cosine":
        # CosineCompressed: decompress the datum (scale*c + bias),
        # full-precision query, plain cosine ranked DESC on the e4 key
        dvec = (
            "list_transform(" + _SQ_COMPRESS.format(col="embedding")
            + ", c -> scale * c + bias)"
        )
        return f"""
WITH {_SQ_PROLOGUE},
cb AS (SELECT vec_id AS id, {dvec} AS bv FROM embeddings CROSS JOIN pp),
cq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
       FROM embeddings WHERE vec_id < {n_queries}),
d AS (SELECT qid, id, {_DIST_SQL["cosine"]} AS dist FROM cq CROSS JOIN cb),
r AS (SELECT qid, id, {E4.format(expr='dist')} AS dist_e4,
             row_number() OVER (PARTITION BY qid ORDER BY {E4.format(expr='dist')} DESC, id ASC) AS rnk
      FROM d)
SELECT qid, rnk AS rank, id AS neighbor_id, dist_e4 AS distance_e4
FROM r WHERE rnk <= {k}
""".strip()
    raise ValueError(f"unsupported sq oracle distance {distance!r}")


def dynamic_ivf_knn_sql(
    k: int,
    n_clusters: int,
    kmeans_iters: int,
    n_probes: int,
    n_queries: int,
    n_added: int,
    add_offset: int,
    del_lo: int,
    del_hi: int,
) -> str:
    """Dynamic IVF cycle: after append + tombstone + RECLUSTER the index
    is definitionally a fresh deterministic build over the mutated base,
    so the oracle is the full unrolled-Lloyd IVF search with the base
    CTE swapped for (base - deletes + shifted adds)."""
    e_cte = (
        f"SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings "
        f"WHERE vec_id NOT BETWEEN {del_lo} AND {del_hi - 1} "
        f"UNION ALL "
        f"SELECT vec_id + {add_offset} AS id, embedding::DOUBLE[] AS v "
        f"FROM embeddings WHERE vec_id < {n_added}"
    )
    return ivf_knn_sql(
        k, n_clusters, kmeans_iters, n_probes, n_queries, e_cte=e_cte
    )


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


def compact_knn_sql(k: int, n_queries: int, del_lo: int, del_hi: int) -> str:
    """Post-compact exhaustive-window search oracle: delete a range,
    compact to dense ids (new_id = rank of old id in ascending order,
    dynamic_index.h:791-810), then exact flat k-NN whose neighbor ids
    are the REMAPPED dense ids. The old->new mapping is monotonic, so
    the ascending-id tie-break is preserved across the remap and the
    ranking matches the engine's post-compact search exactly."""
    e4 = E4.format(expr="dist")
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {n_queries}),
live AS (SELECT vec_id AS id, embedding::DOUBLE[] AS bv FROM embeddings
         WHERE vec_id NOT BETWEEN {del_lo} AND {del_hi - 1}),
m AS (SELECT id AS old_id, row_number() OVER (ORDER BY id) - 1 AS new_id FROM live),
d AS (SELECT qid, id, {_DIST_SQL["l2"]} AS dist FROM q CROSS JOIN live),
r AS (SELECT qid, id, {e4} AS dist_e4,
             row_number() OVER (PARTITION BY qid ORDER BY {e4} ASC, id ASC) AS rnk
      FROM d)
SELECT r.qid, r.rnk AS rank, m.new_id AS neighbor_id, r.dist_e4 AS distance_e4
FROM r JOIN m ON r.id = m.old_id WHERE r.rnk <= {k}
""".strip()


def recall_at_sql(k: int, n: int, n_queries: int) -> str:
    """k_recall_at(groundtruth=l2 top-k, results=ip top-n) as a 1-row
    (recall_e4, n_queries) — the §2.4 recall aggregate gate-visible."""
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
res AS (SELECT qid, id FROM r WHERE rnk_ip <= {n}),
per AS (
  SELECT gt.qid,
         count(res.id)::DOUBLE / {k}.0 AS q_recall
  FROM gt LEFT JOIN res ON gt.qid = res.qid AND gt.id = res.id
  GROUP BY gt.qid)
SELECT {E4.format(expr='avg(q_recall)')} AS recall_e4,
       count(*) AS n_queries
FROM per
""".strip()


# ------------------------------------------------------------ text pipeline


def _sql_str_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def token_vocabulary_sql(top_n: int, min_count: int = 1) -> str:
    """Top-n token counts over documents, ties broken by token asc —
    mirrors pipeline/text.py:token_vocabulary."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents),
per_doc AS (
  SELECT token, doc_id, count(*) AS c FROM toks GROUP BY token, doc_id),
counts AS (
  SELECT token, sum(c) AS n_occurrences, count(*) AS n_docs
  FROM per_doc GROUP BY token
  HAVING sum(c) >= {min_count}),
ranked AS (
  SELECT token, n_occurrences::BIGINT AS n_occurrences,
         n_docs::BIGINT AS n_docs,
         row_number() OVER (ORDER BY n_occurrences DESC, token ASC) AS rank
  FROM counts)
SELECT token, n_occurrences, n_docs, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {top_n}
""".strip()


def pack_sequences_sql(token_budget: int) -> str:
    """Greedy sequential token-budget packing in doc_id order — mirrors
    pipeline/pack.py:pack_sequences (distributed prefix sum) with a
    plain ordered-window cumsum."""
    return f"""
WITH t AS (
  SELECT doc_id, len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS tokens_before
  FROM t)
SELECT doc_id, n_tokens, tokens_before,
       (tokens_before // {token_budget})::BIGINT AS bin_id
FROM c
""".strip()


def text_stats_sql() -> str:
    from scalablevectorsearch_spark.pipeline.text import BPE_PATTERN, STOPWORDS

    en = _sql_str_list(STOPWORDS["en"])
    return f"""
WITH t AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents),
s AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_uniq_tokens,
         length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct,
         len(regexp_extract_all(lower(text), '{BPE_PATTERN}')) AS n_bpe_tokens,
         len(list_filter(toks, x -> x IN ({en}))) AS n_stop,
         list_sum(list_transform(toks, x -> length(x))) AS tok_len_sum
  FROM t)
SELECT doc_id, n_chars, n_tokens, n_uniq_tokens, n_punct, n_bpe_tokens,
       {E4.format(expr='(n_stop::DOUBLE / n_tokens::DOUBLE)')} AS stopword_ratio_e4,
       {E4.format(expr='(tok_len_sum::DOUBLE / n_tokens::DOUBLE)')} AS avg_token_len_e4,
       {E4.format(expr='''(least(1.0, n_tokens::DOUBLE / 64.0)
         * (1.0 - least(0.5, n_punct::DOUBLE / greatest(n_chars, 1)::DOUBLE))
         * (0.25 + 0.75 * (n_uniq_tokens::DOUBLE / n_tokens::DOUBLE)))''')} AS quality_score_e4
FROM s
""".strip()


def lang_id_sql() -> str:
    from scalablevectorsearch_spark.pipeline.text import STOPWORDS

    cols = ",\n         ".join(
        f"len(list_filter(toks, x -> x IN ({_sql_str_list(w)}))) AS c_{lang}"
        for lang, w in STOPWORDS.items()
    )
    return f"""
WITH t AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents),
s AS (
  SELECT doc_id,
         length(regexp_replace(text, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) AS cjk,
         {cols}
  FROM t)
SELECT doc_id,
       CASE WHEN cjk > 0 THEN 'zh'
            WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
            WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
            WHEN c_fr >= c_es THEN 'fr'
            ELSE 'es' END AS pred_lang
FROM s
""".strip()


def doc_fingerprints_sql(k: int = 16, w: int = 8) -> str:
    return f"""
WITH h AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(text) - {k} + 1, 1) + 1),
                        i -> ('0x' || substr(md5(substr(text, i, {k})), 1, 15))::BIGINT) AS hs
  FROM documents),
f AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(hs) - {w} + 1, 1) + 1),
                                      i -> list_min(list_slice(hs, i, i + {w} - 1)))) AS fps
  FROM h)
SELECT doc_id, unnest(fps) AS fp FROM f
""".strip()


# ------------------------------------------------------------ dedup family

_MD5I_SQL = "('0x' || substr(md5({s}), 1, 15))::BIGINT"


def dedup_exact_sql(n_dups: int, dup_offset: int) -> str:
    """Exact dedup over documents + synthesized copies (doc_id < n_dups
    re-inserted at +dup_offset) so the gate exercises real duplicates."""
    return f"""
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {dup_offset} AS doc_id, text FROM documents WHERE doc_id < {n_dups})
SELECT doc_id, md5(text) AS content_hash,
       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
       doc_id != min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
FROM d
""".strip()


def dedup_minhash_sql(
    n_shingle: int = 3, n_perm: int = 16, n_bands: int = 4, threshold: float = 0.5
) -> str:
    from scalablevectorsearch_spark.pipeline.dedup import MERSENNE, perm_coeffs

    r = n_perm // n_bands
    md5i = _MD5I_SQL.format(
        s=f"array_to_string(list_slice(toks, i, i + {n_shingle} - 1), ' ')"
    )
    mins = ", ".join(
        f"list_min(list_transform(shingles, h -> ({a} * (h % {MERSENNE}) + {b}) % {MERSENNE}))"
        for a, b in perm_coeffs(n_perm)
    )
    return f"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(toks) - {n_shingle} + 1, 1) + 1),
                                      i -> {md5i})) AS shingles
  FROM t),
sg AS (SELECT doc_id, shingles, [{mins}] AS sig FROM sh),
bands AS (
  SELECT doc_id, b AS band_id,
         array_to_string(list_slice(sig, b * {r} + 1, b * {r} + {r}), ':') AS band_key
  FROM sg CROSS JOIN (SELECT unnest(range(0, {n_bands})) AS b) bb),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
ver AS (
  SELECT doc_a, doc_b,
         len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
           / len(list_distinct(list_concat(sa.shingles, sb.shingles)))::DOUBLE AS jac
  FROM pairs
  JOIN sh sa ON doc_a = sa.doc_id
  JOIN sh sb ON doc_b = sb.doc_id)
SELECT doc_a, doc_b, {E4.format(expr='jac')} AS jaccard_e4
FROM ver WHERE jac >= {threshold}
""".strip()


def decontaminate_sql(
    probe_mod: int,
    probe_offset: int,
    n_shingle: int = 3,
    n_perm: int = 16,
    n_bands: int = 4,
    threshold: float = 0.5,
) -> str:
    """Cross-corpus banded-MinHash contamination: probes are SHIFTED
    copies of every doc with doc_id % probe_mod = 0 (planted
    contamination — each probe's source doc must surface), corpus is the
    full documents table. Mirrors pipeline/dedup.py:decontaminate."""
    from scalablevectorsearch_spark.pipeline.dedup import MERSENNE, perm_coeffs

    r = n_perm // n_bands
    md5i = _MD5I_SQL.format(
        s=f"array_to_string(list_slice(toks, i, i + {n_shingle} - 1), ' ')"
    )
    mins = ", ".join(
        f"list_min(list_transform(shingles, h -> ({a} * (h % {MERSENNE}) + {b}) % {MERSENNE}))"
        for a, b in perm_coeffs(n_perm)
    )
    return f"""
WITH tc AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
tp AS (SELECT doc_id + {probe_offset} AS doc_id,
              string_split_regex(trim(text), '\\s+') AS toks
       FROM documents WHERE doc_id % {probe_mod} = 0),
shc AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(toks) - {n_shingle} + 1, 1) + 1),
                                      i -> {md5i})) AS shingles
  FROM tc),
shp AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(toks) - {n_shingle} + 1, 1) + 1),
                                      i -> {md5i})) AS shingles
  FROM tp),
sgc AS (SELECT doc_id, shingles, [{mins}] AS sig FROM shc),
sgp AS (SELECT doc_id, shingles, [{mins}] AS sig FROM shp),
bc AS (
  SELECT doc_id, b AS band_id,
         array_to_string(list_slice(sig, b * {r} + 1, b * {r} + {r}), ':') AS band_key
  FROM sgc CROSS JOIN (SELECT unnest(range(0, {n_bands})) AS b) bb),
bp AS (
  SELECT doc_id AS probe_id, b AS band_id,
         array_to_string(list_slice(sig, b * {r} + 1, b * {r} + {r}), ':') AS band_key
  FROM sgp CROSS JOIN (SELECT unnest(range(0, {n_bands})) AS b) bb),
pairs AS (
  SELECT DISTINCT bp.probe_id, bc.doc_id
  FROM bc JOIN bp ON bc.band_id = bp.band_id AND bc.band_key = bp.band_key),
ver AS (
  SELECT p.probe_id, p.doc_id,
         len(list_intersect(sc.shingles, sp.shingles))::DOUBLE
           / len(list_distinct(list_concat(sc.shingles, sp.shingles)))::DOUBLE AS jac
  FROM pairs p
  JOIN shc sc ON p.doc_id = sc.doc_id
  JOIN shp sp ON p.probe_id = sp.doc_id)
SELECT probe_id, doc_id, {E4.format(expr='jac')} AS jaccard_e4
FROM ver WHERE jac >= {threshold}
""".strip()


def dedup_components_sql(
    n_shingle: int = 3, n_perm: int = 16, n_bands: int = 4, threshold: float = 0.5
) -> str:
    """Connected components over the minhash pair graph as a recursive
    CTE: reach(node, rid) enumerates every id reachable from node, the
    canonical is min(rid). Mirrors pipeline/dedup.py:dedup_components'
    min-label fixpoint exactly (both compute min over the transitive
    closure of the undirected pair graph)."""
    inner = dedup_minhash_sql(n_shingle, n_perm, n_bands, threshold)
    return f"""
WITH RECURSIVE mh AS (
{inner}
),
e AS (SELECT doc_a AS s, doc_b AS d FROM mh
      UNION SELECT doc_b AS s, doc_a AS d FROM mh),
nodes AS (SELECT DISTINCT s AS node FROM e),
reach(node, rid) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.s, r.rid FROM e JOIN reach r ON e.d = r.node
)
SELECT node AS doc_id, min(rid) AS canonical_id FROM reach GROUP BY node
""".strip()


def simhash_sql(n_bits: int = 32) -> str:
    md5i = _MD5I_SQL.format(s="t")
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> "
        f"CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(n_bits)
    )
    return f"""
WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
h AS (SELECT doc_id, list_transform(toks, t -> {md5i}) AS hs FROM t)
SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash FROM h
""".strip()


def simhash_neardup_sql(
    n_copies: int,
    offset: int,
    n_bits: int = 32,
    n_bands: int = 4,
    max_hamming: int = 3,
) -> str:
    """Banded SimHash near-dup join over documents + planted copies of
    doc_id < n_copies (shifted ids, text perturbed by one appended
    token). Mirrors pipeline/dedup.py:simhash_neardup."""
    w = n_bits // n_bands
    mask = (1 << w) - 1
    md5i = _MD5I_SQL.format(s="t")
    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> "
        f"CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(n_bits)
    )
    return f"""
WITH t0 AS (SELECT doc_id, trim(text) AS text FROM documents
            UNION ALL
            SELECT doc_id + {offset} AS doc_id, trim(text) || ' zzz' AS text
            FROM documents WHERE doc_id < {n_copies}),
t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM t0),
h AS (SELECT doc_id, list_transform(toks, t -> {md5i}) AS hs FROM t),
fp AS (SELECT doc_id, CAST({bit_terms} AS BIGINT) AS simhash FROM h),
bands AS (
  SELECT doc_id, simhash, b AS band_id, (simhash >> (b * {w})) & {mask} AS band_bits
  FROM fp CROSS JOIN (SELECT unnest(range(0, {n_bands})) AS b) bb),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS ha, b.simhash AS hb
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_bits = b.band_bits
   AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= {max_hamming}
""".strip()


# ------------------------------------------------------------ embedding near-dup

_COS_SQL = (
    "list_sum(list_transform(range(1, len({a})+1), i -> {a}[i]*{b}[i])) / "
    "(sqrt(list_sum(list_transform({a}, x -> x*x))) * "
    "sqrt(list_sum(list_transform({b}, x -> x*x))))"
)


def neardup_e_cte(n_copies: int, offset: int) -> str:
    """Embeddings (as DOUBLE[]) + near-dup copies: vec_id < n_copies
    re-inserted at +offset with the first component shifted by +0.05."""
    return f"""
SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings
UNION ALL
SELECT vec_id + {offset} AS id,
       list_concat([embedding[1]::DOUBLE + 0.05],
                   (embedding::DOUBLE[])[2:len(embedding)]) AS v
FROM embeddings WHERE vec_id < {n_copies}
""".strip()


def embedding_neardup_sql(threshold: float, n_copies: int, offset: int) -> str:
    t_e4 = int(threshold * 10000)
    cos = _COS_SQL.format(a="a.v", b="b.v")
    e4 = E4.format(expr="cos")
    return f"""
WITH e AS ({neardup_e_cte(n_copies, offset)}),
p AS (SELECT a.id AS id_a, b.id AS id_b, {cos} AS cos
      FROM e a JOIN e b ON a.id < b.id)
SELECT id_a, id_b, {e4} AS cosine_e4 FROM p WHERE {e4} >= {t_e4}
""".strip()


def embedding_neardup_clustered_sql(
    threshold: float, n_clusters: int, kmeans_iters: int, n_copies: int, offset: int
) -> str:
    t_e4 = int(threshold * 10000)
    ctes, cfinal = kmeans_ctes(n_clusters, kmeans_iters, neardup_e_cte(n_copies, offset))
    cos = _COS_SQL.format(a="ea.v", b="eb.v")
    e4 = E4.format(expr="cos")
    return f"""
WITH {ctes},
af AS (
  SELECT id, cid FROM (
    SELECT e.id, c.cid,
           row_number() OVER (PARTITION BY e.id ORDER BY {_dist_vc('e.v', 'c.cv')} ASC, c.cid ASC) AS rn
    FROM e CROSS JOIN {cfinal} c
  ) ranked WHERE rn = 1),
p AS (SELECT a.id AS id_a, b.id AS id_b, {cos} AS cos
      FROM af a JOIN af b ON a.id < b.id AND a.cid = b.cid
      JOIN e ea ON a.id = ea.id
      JOIN e eb ON b.id = eb.id)
SELECT id_a, id_b, {e4} AS cosine_e4 FROM p WHERE {e4} >= {t_e4}
""".strip()


def normalize_text_sql() -> str:
    """Same passes, same order as pipeline/text.py:NORMALIZE_PASSES.
    DuckDB regexp_replace needs the 'g' flag (Spark replaces all
    matches by default); the gate compares (doc_id, clean_n_chars,
    clean_hash) so row size stays bounded."""
    from scalablevectorsearch_spark.pipeline.text import NORMALIZE_PASSES

    expr = "text"
    for pat, rep in NORMALIZE_PASSES:
        sql_pat = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pat}', '{rep}', 'g')"
    expr = f"lower(trim({expr}))"
    md5i = _MD5I_SQL.format(s="clean_text")
    return f"""
WITH c AS (SELECT doc_id, {expr} AS clean_text FROM documents)
SELECT doc_id, length(clean_text) AS clean_n_chars, {md5i} AS clean_hash
FROM c
""".strip()


def media_features_sql() -> str:
    """Byte-exact replica of the fake-decode feature kernel
    (pipeline/multimodal.py): width=height=8 makes the resize an
    identity, so feature[pos] = mean of tiled payload bytes
    [8*pos .. 8*pos+7] (index mod n_bytes). Bytes are addressed by
    slicing the hex dump (DuckDB has no BLOB substring); the mean is
    one sum + one division in both engines, then the shared E4 key."""
    e4 = E4.format(expr="(sum(v)::DOUBLE / 8.0)")
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS L
  FROM documents
),
px AS (
  SELECT media_id, L, j.pos, i.k,
         CASE WHEN L = 0 THEN 0
              ELSE ('0x' || substring(hx, ((j.pos * 8 + i.k) % L) * 2 + 1, 2))::BIGINT
         END AS v
  FROM m, range(8) j(pos), range(8) i(k)
)
SELECT media_id, L AS n_bytes, pos, {e4} AS feature_e4
FROM px GROUP BY media_id, L, pos
""".strip()


def media_stats_sql() -> str:
    """Byte-level media stats over the synthesized media table (payload
    = UTF-8 bytes of documents.text)."""
    return """
SELECT doc_id AS media_id, 'image' AS kind,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS checksum
FROM documents
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


# ---------------------------------------------------------------------------
# Invariant-verdict oracles: for operators whose VALUES are not
# SQL-expressible (iterative graph builds, binary-search calibration),
# the Spark query emits deterministic PASS/FAIL verdicts on invariants
# the result must satisfy, and the oracle is the constant all-true
# table — so the driver's value hash bites on the verdicts. This is the
# reference's golden-gating style (vamana_reference.toml:26-59: recall
# floors + structural expectations, not exact neighbor lists).


def recall_verdict_sql(floor_e4: int, n_queries: int) -> str:
    """ok = (matched/(k*n_queries) >= floor) as 1/0; the oracle asserts
    the floor holds and pins the floor + query count as values."""
    return (
        f"SELECT CAST(1 AS BIGINT) AS ok, CAST({floor_e4} AS BIGINT) AS floor_e4, "
        f"CAST({n_queries} AS BIGINT) AS n_queries"
    )


def knn_invariant_verdict_sql(k: int, n_queries: int) -> str:
    """One verdict row per expected (qid, rank): the Spark side checks
    rank ordering, distance monotonicity, per-query neighbor
    distinctness and base membership; row count doubles as a
    completeness check (every query returns exactly k results)."""
    return (
        f"SELECT q.qid, r.r AS rank, CAST(1 AS BIGINT) AS ok\n"
        f"FROM range(0, {n_queries}) q(qid) CROSS JOIN range(1, {k} + 1) r(r)"
    )


def degree_stats_verdict_sql() -> str:
    """n_nodes is data-dependent (the graph must cover every base row —
    count(*) FROM embeddings); degree bounds are constant verdicts."""
    return (
        "SELECT CAST(count(*) AS BIGINT) AS n_nodes, "
        "CAST(1 AS BIGINT) AS ok_max_degree, CAST(1 AS BIGINT) AS ok_min_degree "
        "FROM embeddings"
    )


def calibrate_verdict_sql(target_e4: int, max_window: int) -> str:
    return (
        f"SELECT CAST(1 AS BIGINT) AS ok_recall, CAST(1 AS BIGINT) AS ok_window, "
        f"CAST(1 AS BIGINT) AS ok_split, "
        f"CAST({target_e4} AS BIGINT) AS target_e4, "
        f"CAST({max_window} AS BIGINT) AS max_window"
    )


# ---------------------------------------------------------------------------
# Round-4 gates: io round-trip, streaming equivalence, iterator paging,
# IVF k_reorder.


def vecs_roundtrip_sql(n_ids: int) -> str:
    """Identity oracle for the *vecs / native-V1 round-trip gate
    (vecs.h:103-137, native.h:310-344): the Spark side writes the first
    n_ids embedding vectors to fvecs, a V1 native file, a binary
    matrix file (io/binary.h:84-169), and npy, reads all four back,
    and explodes to (fmt, id, pos, val_e4); a lossless round-trip must
    equal the original table verbatim (every format stores exact
    float32)."""
    val_e4 = E4.format(expr="x::DOUBLE")
    return f"""
WITH ex AS (
  SELECT vec_id AS id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS pos
  FROM embeddings WHERE vec_id < {n_ids})
SELECT f.fmt, ex.id, ex.pos - 1 AS pos, {val_e4} AS val_e4
FROM ex CROSS JOIN (SELECT unnest(['fvecs', 'svs', 'binary', 'npy']) AS fmt) f
""".strip()


def streaming_dedup_sql(n_dups: int, dup_offset: int) -> str:
    """Cross-batch stateful dedup equivalence: after draining the whole
    stream, the keyed-state result must equal the batch answer —
    canonical = smallest doc_id ever seen per content hash (the operator
    sorts within a micro-batch and earlier batches hold smaller ids, so
    first-seen == min). The stream is documents + shifted duplicate
    copies of doc_id < n_dups."""
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {dup_offset} AS doc_id, text FROM documents WHERE doc_id < {n_dups}),
h AS (SELECT md5(text) AS content_hash, doc_id FROM docs),
c AS (SELECT content_hash, doc_id,
             min(doc_id) OVER (PARTITION BY content_hash) AS canonical_id
      FROM h)
SELECT content_hash, doc_id, canonical_id,
       CAST(doc_id <> canonical_id AS BIGINT) AS is_dup
FROM c
""".strip()


def ivf_reorder_sql(
    k: int,
    k_reorder: int,
    n_clusters: int,
    kmeans_iters: int,
    n_probes: int,
    n_queries: int,
) -> str:
    """IVF + k_reorder (ivf/common.h:156): the index stores SQ
    round-tripped (decompressed int8-domain) vectors — clusters,
    probes, and the k_reorder candidate ranking all run in the
    quantized domain — then the top k_reorder candidates are re-ranked
    EXACTLY against the full-precision embeddings and full-precision
    queries. Emitted distances come from the exact stage."""
    dvec = (
        "list_transform(" + _SQ_COMPRESS.format(col="embedding")
        + ", c -> scale * c + bias)"
    )
    e_cte = f"SELECT vec_id AS id, {dvec} AS v FROM embeddings CROSS JOIN pp"
    ctes, cfinal = kmeans_ctes(n_clusters, kmeans_iters, e_cte=e_cte)
    e4p = E4.format(expr="dist")
    l2 = _DIST_SQL["l2"]
    return f"""
WITH {_SQ_PROLOGUE},
{ctes},
af AS (
  SELECT id, cid FROM (
    SELECT e.id, c.cid,
           row_number() OVER (PARTITION BY e.id ORDER BY {_dist_vc('e.v', 'c.cv')} ASC, c.cid ASC) AS rn
    FROM e CROSS JOIN {cfinal} c
  ) ranked WHERE rn = 1),
qs AS (SELECT vec_id AS qid, {dvec} AS qv
       FROM embeddings CROSS JOIN pp WHERE vec_id < {n_queries}),
pd AS (SELECT qid, cid, {_dist_vc('qv', 'c.cv')} AS dist FROM qs CROSS JOIN {cfinal} c),
probe AS (SELECT qid, cid FROM (
    SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY {e4p} ASC, cid ASC) AS pr
    FROM pd) pp2 WHERE pr <= {n_probes}),
cd AS (
  SELECT p.qid, a.id, {l2.replace('qv[i]', 'q.qv[i]').replace('bv[i]', 'e.v[i]').replace('len(qv)', 'len(q.qv)')} AS dist
  FROM probe p
  JOIN af a ON p.cid = a.cid
  JOIN e ON a.id = e.id
  JOIN qs q ON p.qid = q.qid),
cand AS (SELECT qid, id FROM (
    SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY {e4p} ASC, id ASC) AS rnk
    FROM cd) cc WHERE rnk <= {k_reorder}),
fq AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < {n_queries}),
fb AS (SELECT vec_id AS id, embedding::DOUBLE[] AS bv FROM embeddings),
ex AS (SELECT c.qid, c.id, {l2} AS dist
       FROM cand c JOIN fq ON c.qid = fq.qid JOIN fb ON c.id = fb.id),
r AS (SELECT qid, id, {e4p} AS dist_e4,
             row_number() OVER (PARTITION BY qid ORDER BY {e4p} ASC, id ASC) AS rnk
      FROM ex)
SELECT qid, rnk AS rank, id AS neighbor_id, dist_e4 AS distance_e4
FROM r WHERE rnk <= {k}
""".strip()


def streaming_window_sql() -> str:
    """Event-time tumbling-window aggregation equivalence: the drained
    streaming aggregation (1-minute windows, 2-minute watermark,
    availableNow) must equal the batch GROUP BY over the same events.
    Watermarking only drops rows LATER than the watermark as of their
    arrival; a drain of a static source emits every window, so the
    batch answer is the exact oracle."""
    return f"""
SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS window_epoch,
       event_type,
       count(*) AS n_events,
       {E4.format(expr='sum(value)')} AS sum_value_e4
FROM events
GROUP BY 1, 2
""".strip()


def streaming_upsert_sql(n_ids: int, n_upd: int, del_lo: int, del_hi: int, upd_src_offset: int) -> str:
    """Upsert-log compaction equivalence (latest_view): after streaming
    originals then a wave of updates (ids < n_upd get the vector of
    id + upd_src_offset) and deletes ([del_lo, del_hi)), the compacted
    view must equal the mutated table exactly."""
    val_e4 = E4.format(expr="x::DOUBLE")
    return f"""
WITH fin AS (
  SELECT e.vec_id AS id,
         CASE WHEN e.vec_id < {n_upd}
              THEN (SELECT e2.embedding FROM embeddings e2
                    WHERE e2.vec_id = e.vec_id + {upd_src_offset})
              ELSE e.embedding END AS v
  FROM embeddings e
  WHERE e.vec_id < {n_ids}
    AND NOT (e.vec_id >= {del_lo} AND e.vec_id < {del_hi}))
SELECT id, pos - 1 AS pos, {val_e4} AS val_e4
FROM (SELECT id, unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM fin) u
""".strip()


def cancel_verdict_sql() -> str:
    """Search cancellation verdicts (flat.h:344-346 cancel predicate /
    the job-group timeout): a generous deadline must complete, an
    expired deadline must raise mid-scan, and the job-group timeout
    wrapper must cancel a slow action. Constant-truth oracle."""
    return (
        "SELECT CAST(1 AS BIGINT) AS ok_completes, "
        "CAST(1 AS BIGINT) AS ok_deadline_raises, "
        "CAST(1 AS BIGINT) AS ok_group_cancels"
    )


def mixed_precision_verdict_sql(floor_e4: int) -> str:
    """Verdicts for the 16-bit packed storage path (float16.h /
    bfloat16.h; euclidean.h:320-430 mixed-pair widening): per-element
    round-trip error within the format's representable bound
    (f16: 2^-11 relative, bf16: 2^-8), pack∘unpack idempotence (16-bit
    values are exactly representable, so a second round-trip is the
    identity), and mixed-precision k-NN recall vs the exact scan >= the
    floor. n_rows pins coverage to the whole table."""
    return (
        f"SELECT CAST(1 AS BIGINT) AS ok_f16_bound, "
        f"CAST(1 AS BIGINT) AS ok_bf16_bound, "
        f"CAST(1 AS BIGINT) AS ok_idempotent, "
        f"CAST(1 AS BIGINT) AS ok_recall, "
        f"CAST({floor_e4} AS BIGINT) AS floor_e4, "
        f"CAST(count(*) AS BIGINT) AS n_rows FROM embeddings"
    )


def testdata_generator_verdict_sql(n_pairs: int) -> str:
    """Verdict for generate_test_dataset (common.py:214-265): the
    generator's driver-side brute-force groundtruth must exactly equal
    the engine's distributed flat k-NN over the generated tables."""
    return (
        f"SELECT CAST(1 AS BIGINT) AS ok_groundtruth, "
        f"CAST({n_pairs} AS BIGINT) AS n_pairs"
    )


def custom_distance_sql(k: int, n_queries: int) -> str:
    """L1 (Manhattan) k-NN oracle for the runtime distance plug-in gate
    (§2.12): ascending e4-key ranking with ascending-id tie-break, same
    protocol as the built-in distances."""
    l1 = "list_sum(list_transform(range(1, len(qv)+1), i -> abs(qv[i]-bv[i])))"
    e4 = E4.format(expr="dist")
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {n_queries}),
b AS (SELECT vec_id AS id, embedding::DOUBLE[] AS bv FROM embeddings),
d AS (SELECT qid, id, {l1} AS dist FROM q CROSS JOIN b),
r AS (SELECT qid, id, {e4} AS dist_e4,
             row_number() OVER (PARTITION BY qid ORDER BY {e4} ASC, id ASC) AS rnk
      FROM d)
SELECT qid, rnk AS rank, id AS neighbor_id, dist_e4 AS distance_e4
FROM r WHERE rnk <= {k}
""".strip()


def schema_validation_sql() -> str:
    """Oracle for the VectorDataLoader / check_dims gate (simple.h:44-51,
    core.cpp:48-88): the accepted table's dimensionality and row count
    are data-derived (so the hash bites on real values), the rejection
    verdicts are constant-truth — the Spark side must have raised
    SchemaError for each malformed variant to emit 1."""
    return (
        "SELECT CAST(min(len(embedding)) AS BIGINT) AS dims, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(1 AS BIGINT) AS ok_rejects_ragged, "
        "CAST(1 AS BIGINT) AS ok_rejects_null, "
        "CAST(1 AS BIGINT) AS ok_rejects_dup, "
        "CAST(1 AS BIGINT) AS ok_rejects_missing, "
        "CAST(1 AS BIGINT) AS ok_rejects_dtype "
        "FROM embeddings"
    )


def graph_loader_verdict_sql() -> str:
    """Oracle for the GraphLoader gate (graph/simple.h save/load +
    VamanaBuildParameters persistence, vamana/index.h save): a built,
    saved, reloaded graph must cover every base row (n_nodes ≡
    count(*) — data-derived), keep every adjacency edge inside the node
    set, respect the degree bound, carry at least one entry point per
    shard, and round-trip the build parameters + distance through the
    manifest unchanged."""
    return (
        "SELECT CAST(count(*) AS BIGINT) AS n_nodes, "
        "CAST(1 AS BIGINT) AS ok_edges_in_base, "
        "CAST(1 AS BIGINT) AS ok_degree_bound, "
        "CAST(1 AS BIGINT) AS ok_entry_per_shard, "
        "CAST(1 AS BIGINT) AS ok_params_roundtrip "
        "FROM embeddings"
    )


def query_norm_fix_sql(n_queries: int) -> str:
    """Oracle for maybe_fix_argument / fix_queries (concepts/distance.h;
    cosine.h:102 caches the query norm): the precomputed per-query
    invariants are plain data values — squared norm (l2 fix) and norm
    (cosine fix) per query, e4-scaled; ok_fix_identical asserts the
    fixed and unfixed kernels produce bit-identical distance matrices."""
    e4n = E4.format(expr="sqrt(list_sum(list_transform(qv, x -> x*x)))")
    e4s = E4.format(expr="list_sum(list_transform(qv, x -> x*x))")
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < {n_queries})
SELECT qid, {e4s} AS normsq_e4, {e4n} AS norm_e4,
       CAST(1 AS BIGINT) AS ok_fix_identical
FROM q
""".strip()


def alpha_prune_verdict_sql(n_nodes: int, alpha_e4: int, max_degree: int) -> str:
    """Oracle for heuristic_prune_neighbors (prune.h:92-172). The
    MRNG-style state machine is not SQL-expressible, so the gate
    verifies its defining invariants per pruned node: the result is a
    subset of the pool with no self-edge and no duplicates, respects
    max_degree, always keeps the nearest candidate, every discarded
    candidate is dominated by a kept neighbor strictly closer to it
    than the node is (current_alpha >= 1 makes domination imply plain
    d(r,c) < d(node,c)) unless the result hit capacity, and two runs
    are identical. alpha/max_degree are pinned as values."""
    return f"""
SELECT n.node, CAST(1 AS BIGINT) AS ok_subset,
       CAST(1 AS BIGINT) AS ok_degree,
       CAST(1 AS BIGINT) AS ok_keeps_nearest,
       CAST(1 AS BIGINT) AS ok_dominated,
       CAST(1 AS BIGINT) AS ok_deterministic,
       CAST({alpha_e4} AS BIGINT) AS alpha_e4,
       CAST({max_degree} AS BIGINT) AS max_degree
FROM range(0, {n_nodes}) n(node)
""".strip()


def _lvq_prologue(primary_bits: int, residual_bits: int = 0) -> str:
    """Shared LVQ CTE chain (see operators/lvq.py for the scheme and
    determinism protocol): canonical 1e-6-rounded mean, per-vector
    lo/step, clamped round-half-up codes, primary reconstruction r1;
    with residual_bits, the residual codes and reconstruction r2."""
    l1 = float((1 << primary_bits) - 1)
    body = f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
mu0 AS (SELECT pos, floor(avg(x) * 1000000.0 + 0.5) / 1000000.0 AS m
        FROM (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e) u
        GROUP BY pos),
mu AS (SELECT list(m ORDER BY pos) AS mv FROM mu0),
cx AS (SELECT vec_id, v,
              list_transform(range(1, len(v)+1), i -> v[i] - mv[i]) AS xp, mv
       FROM e CROSS JOIN mu),
pr AS (SELECT vec_id, v, xp, mv, list_min(xp) AS lo,
              (list_max(xp) - list_min(xp)) / {l1} AS step
       FROM cx),
l1c AS (SELECT vec_id, v, xp, mv, lo, step,
               list_transform(xp, x -> CASE WHEN step = 0 THEN 0.0
                 ELSE greatest(0.0, least({l1}, floor((x - lo) / step + 0.5))) END) AS c1
        FROM pr),
rec1 AS (SELECT vec_id, v, xp, mv, lo, step, c1,
                list_transform(range(1, len(c1)+1),
                               i -> (mv[i] + lo) + step * c1[i]) AS r1
         FROM l1c)"""
    if residual_bits:
        l2 = float((1 << residual_bits) - 1)
        body += f""",
resid AS (SELECT vec_id, v, mv, lo, step, c1, r1, step / {l2} AS step2,
                 list_transform(range(1, len(c1)+1),
                                i -> xp[i] - (lo + step * c1[i])) AS rr
          FROM rec1),
l2c AS (SELECT vec_id, v, r1, step, step2,
               list_transform(rr, ri -> CASE WHEN step = 0 THEN 0.0
                 ELSE greatest(0.0, least({l2}, floor((ri + step / 2.0) / step2 + 0.5))) END) AS c2
        FROM resid),
rec2 AS (SELECT vec_id, v, r1, step, step2, c2,
                list_transform(range(1, len(c2)+1),
                               i -> r1[i] + (step2 * c2[i] - step / 2.0)) AS r2
         FROM l2c)"""
    return body.strip()


def lvq_roundtrip_sql(n_ids: int, primary_bits: int, residual_bits: int) -> str:
    """compress -> decompress at both levels -> exploded
    (id, pos, r1_e4, r2_e4)."""
    return f"""
WITH {_lvq_prologue(primary_bits, residual_bits)},
sel AS (SELECT vec_id, r1, r2 FROM rec2 WHERE vec_id < {n_ids})
SELECT vec_id AS id, pos - 1 AS pos,
       {E4.format(expr='x1')} AS r1_e4, {E4.format(expr='x2')} AS r2_e4
FROM (SELECT vec_id, unnest(r1) AS x1, unnest(r2) AS x2,
             generate_subscripts(r1, 1) AS pos
      FROM sel) u
""".strip()


def lvq_knn_sql(
    distance: str,
    k: int,
    n_queries: int,
    primary_bits: int,
    residual_bits: int = 0,
    k_reorder: int | None = None,
) -> str:
    """k-NN over LVQ storage: asymmetric (full-precision query vs the
    primary reconstruction); with k_reorder + residual_bits, the top
    k_reorder primary candidates re-rank on the two-level
    reconstruction and the refined e4 distance is emitted."""
    rec = "rec2" if residual_bits else "rec1"
    e4 = E4.format(expr="dist")
    primary = f"""
WITH {_lvq_prologue(primary_bits, residual_bits)},
q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < {n_queries}),
b AS (SELECT vec_id AS id, r1 AS bv FROM {rec}),
d AS (SELECT qid, id, {_DIST_SQL[distance]} AS dist FROM q CROSS JOIN b),
r AS (SELECT qid, id, {e4} AS dist_e4,
             row_number() OVER (PARTITION BY qid ORDER BY {e4} {_ORDER[distance]}, id ASC) AS rnk
      FROM d)"""
    if k_reorder is None or not residual_bits:
        return f"""{primary}
SELECT qid, rnk AS rank, id AS neighbor_id, dist_e4 AS distance_e4
FROM r WHERE rnk <= {k}
""".strip()
    return f"""{primary},
cand AS (SELECT qid, id FROM r WHERE rnk <= {k_reorder}),
b2 AS (SELECT vec_id AS id, r2 AS bv FROM rec2),
d2 AS (SELECT q.qid, b2.id, {_DIST_SQL[distance]} AS dist
       FROM cand JOIN b2 ON cand.id = b2.id JOIN q ON q.qid = cand.qid),
r2r AS (SELECT qid, id, {e4} AS dist_e4,
              row_number() OVER (PARTITION BY qid ORDER BY {e4} {_ORDER[distance]}, id ASC) AS rnk
       FROM d2)
SELECT qid, rnk AS rank, id AS neighbor_id, dist_e4 AS distance_e4
FROM r2r WHERE rnk <= {k}
""".strip()


def leanvec_knn_sql(k: int, k_reorder: int, leanvec_dims: int, n_queries: int) -> str:
    """LeanVec two-stage k-NN with the deterministic truncation
    projection (P = I[:, :m] over the centered data — the reference's
    external-matrices path, training.h:28-71): primary candidates
    ranked on the first m centered coordinates, top k_reorder re-ranked
    with exact full-dimension L2. Gates projection apply, primary
    search, and the re-rank stage end to end (see operators/leanvec.py
    for why the numpy matmul is bit-exact under truncation)."""
    e4 = E4.format(expr="dist")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
mu0 AS (SELECT pos, floor(avg(x) * 1000000.0 + 0.5) / 1000000.0 AS m
        FROM (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e) u
        GROUP BY pos),
mu AS (SELECT list(m ORDER BY pos) AS mv FROM mu0),
pb AS (SELECT vec_id AS id,
              list_transform(range(1, {leanvec_dims + 1}), i -> v[i] - mv[i]) AS bv
       FROM e CROSS JOIN mu),
pq AS (SELECT vec_id AS qid,
              list_transform(range(1, {leanvec_dims + 1}), i -> v[i] - mv[i]) AS qv
       FROM e CROSS JOIN mu WHERE vec_id < {n_queries}),
d1 AS (SELECT qid, id, {_DIST_SQL["l2"]} AS dist FROM pq CROSS JOIN pb),
r1 AS (SELECT qid, id,
              row_number() OVER (PARTITION BY qid ORDER BY {e4} ASC, id ASC) AS rnk
       FROM d1),
cand AS (SELECT qid, id FROM r1 WHERE rnk <= {k_reorder}),
fq AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {n_queries}),
fb AS (SELECT vec_id AS id, v AS bv FROM e),
d2 AS (SELECT fq.qid, fb.id, {_DIST_SQL["l2"]} AS dist
       FROM cand JOIN fb ON cand.id = fb.id JOIN fq ON fq.qid = cand.qid),
r2 AS (SELECT qid, id, {e4} AS dist_e4,
              row_number() OVER (PARTITION BY qid ORDER BY {e4} ASC, id ASC) AS rnk
       FROM d2)
SELECT qid, rnk AS rank, id AS neighbor_id, dist_e4 AS distance_e4
FROM r2 WHERE rnk <= {k}
""".strip()


def leanvec_knn_cosine_sql(
    k: int, k_reorder: int, leanvec_dims: int, n_queries: int
) -> str:
    """Cosine LeanVec two-stage k-NN (truncation projection): the
    primary ranks by INNER PRODUCT over the first m centered coordinates
    of the UNIT-NORMALIZED data (cosine == IP over x/|x|, query scale
    rank-invariant; query uncentered — the ip convention), and the top
    k_reorder candidates re-rank with exact full-dimension cosine.
    Mirrors operators/leanvec.py's normalize-then-IP reduction of the
    reference's generic distance dispatch (distance/cosine.h:102)."""
    e4 = E4.format(expr="dist")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ne AS (SELECT vec_id,
              list_transform(v, x -> x / sqrt(list_sum(list_transform(v, y -> y*y)))) AS v
       FROM e),
mu0 AS (SELECT pos, floor(avg(x) * 1000000.0 + 0.5) / 1000000.0 AS m
        FROM (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM ne) u
        GROUP BY pos),
mu AS (SELECT list(m ORDER BY pos) AS mv FROM mu0),
pb AS (SELECT vec_id AS id,
              list_transform(range(1, {leanvec_dims + 1}), i -> v[i] - mv[i]) AS bv
       FROM ne CROSS JOIN mu),
pq AS (SELECT vec_id AS qid,
              list_transform(range(1, {leanvec_dims + 1}), i -> v[i]) AS qv
       FROM e WHERE vec_id < {n_queries}),
d1 AS (SELECT qid, id, {_DIST_SQL["ip"]} AS dist FROM pq CROSS JOIN pb),
r1 AS (SELECT qid, id,
              row_number() OVER (PARTITION BY qid ORDER BY {e4} DESC, id ASC) AS rnk
       FROM d1),
cand AS (SELECT qid, id FROM r1 WHERE rnk <= {k_reorder}),
fq AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {n_queries}),
fb AS (SELECT vec_id AS id, v AS bv FROM e),
d2 AS (SELECT fq.qid, fb.id, {_DIST_SQL["cosine"]} AS dist
       FROM cand JOIN fb ON cand.id = fb.id JOIN fq ON fq.qid = cand.qid),
r2 AS (SELECT qid, id, {e4} AS dist_e4,
              row_number() OVER (PARTITION BY qid ORDER BY {e4} DESC, id ASC) AS rnk
       FROM d2)
SELECT qid, rnk AS rank, id AS neighbor_id, dist_e4 AS distance_e4
FROM r2 WHERE rnk <= {k}
""".strip()


def repetition_stats_sql(n: int = 2) -> str:
    """Gopher-style word-n-gram repetition over documents — mirrors
    pipeline/curate.py:repetition_stats (left join keeps short docs
    at zero, matching Spark's explode_outer)."""
    return f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents),
g AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(toks) - {n - 1}),
                        i -> array_to_string(toks[i:i+{n - 1}], ' ')) AS grams
  FROM t),
e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
pg AS (SELECT doc_id, gram, count(*) AS c FROM e GROUP BY doc_id, gram),
pd AS (
  SELECT doc_id, sum(c) AS n_ngrams, max(c) AS top,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup
  FROM pg GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(pd.n_ngrams, 0)::BIGINT AS n_ngrams,
       {E4.format(expr="(coalesce(pd.top, 0)::DOUBLE / greatest(coalesce(pd.n_ngrams, 0), 1)::DOUBLE)")} AS top_ngram_frac_e4,
       {E4.format(expr="(coalesce(pd.dup, 0)::DOUBLE / greatest(coalesce(pd.n_ngrams, 0), 1)::DOUBLE)")} AS dup_ngram_frac_e4
FROM t LEFT JOIN pd ON t.doc_id = pd.doc_id
""".strip()


def dataset_split_sql(
    names: list[str], bounds: list[str], salt: str = "", digits: int = 4
) -> str:
    """Deterministic md5 split — mirrors pipeline/curate.py:
    dataset_split (identical boundary literals, lexicographic hex
    comparison; no hex->int conversion in either engine)."""
    case = f"'{names[-1]}'"
    for name, b in zip(reversed(names[:-1]), reversed(bounds)):
        case = f"CASE WHEN substr(md5('{salt}:' || doc_id::VARCHAR), 1, {digits}) < '{b}' THEN '{name}' ELSE {case} END"
    return f"SELECT doc_id, {case} AS split FROM documents".strip()


def stratified_sample_sql(
    fractions: dict[str, float],
    key_col: str = "source",
    salt: str = "",
    digits: int = 4,
    default_fraction: float = 0.0,
) -> str:
    """Deterministic per-stratum sampling — mirrors pipeline/curate.py:
    stratified_sample (identical hex boundary literals, lexicographic
    comparison, sorted-key CASE order)."""
    from scalablevectorsearch_spark.pipeline.curate import fraction_bound

    h = f"substr(md5('{salt}:' || {key_col} || ':' || doc_id::VARCHAR), 1, {digits})"

    def keep_for(frac: float) -> str:
        if frac <= 0.0:
            return "FALSE"
        if frac >= 1.0:
            return "TRUE"
        return f"({h} < '{fraction_bound(frac, digits)}')"

    case = keep_for(default_fraction)
    for key in sorted(fractions, reverse=True):
        case = f"CASE WHEN {key_col} = '{key}' THEN {keep_for(fractions[key])} ELSE {case} END"
    return f"SELECT doc_id, {key_col}, ({case})::BIGINT AS kept FROM documents".strip()


def ngram_jaccard_sql(
    n_shingle: int = 3,
    threshold: float = 0.5,
    fp_k: int = 16,
    fp_w: int = 8,
) -> str:
    """Winnowing-blocked exact n-gram Jaccard — mirrors pipeline/
    dedup.py:ngram_jaccard_neardup (same md5-derived gram hashes and
    winnowing windows as doc_fingerprints_sql, same shingle/verify
    CTEs as dedup_minhash_sql)."""
    md5i = _MD5I_SQL.format(
        s=f"array_to_string(list_slice(toks, i, i + {n_shingle} - 1), ' ')"
    )
    return f"""
WITH h AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(text) - {fp_k} + 1, 1) + 1),
                        i -> ('0x' || substr(md5(substr(text, i, {fp_k})), 1, 15))::BIGINT) AS hs
  FROM documents),
f AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(hs) - {fp_w} + 1, 1) + 1),
                                      i -> list_min(list_slice(hs, i, i + {fp_w} - 1)))) AS fps
  FROM h),
fps AS (SELECT doc_id, unnest(fps) AS fp FROM f),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id),
t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(toks) - {n_shingle} + 1, 1) + 1),
                                      i -> {md5i})) AS shingles
  FROM t),
ver AS (
  SELECT doc_a, doc_b,
         len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
           / len(list_distinct(list_concat(sa.shingles, sb.shingles)))::DOUBLE AS jac
  FROM pairs
  JOIN sh sa ON doc_a = sa.doc_id
  JOIN sh sb ON doc_b = sb.doc_id)
SELECT doc_a, doc_b, {E4.format(expr='jac')} AS jaccard_e4
FROM ver WHERE jac >= {threshold}
""".strip()


def duplicate_spans_sql(
    span_len: int = 40, stride: int = 1, min_count: int = 2
) -> str:
    """Exact duplicated-substring spans — mirrors pipeline/dedup.py:
    duplicate_spans (same md5-derived gram hash, same run-merge rule;
    the two unnest lists are equal-length so they zip in lockstep)."""
    md5i = _MD5I_SQL.format(s=f"substr(text, i, {span_len})")
    return f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= {span_len}),
g AS (
  SELECT doc_id,
         unnest(range(1, length(text) - {span_len} + 2, {stride})) AS pos,
         unnest(list_transform(range(1, length(text) - {span_len} + 2, {stride}),
                               i -> {md5i})) AS h
  FROM d),
hot AS (SELECT h FROM g GROUP BY h HAVING count(*) >= {min_count}),
dp AS (SELECT g.doc_id, g.pos FROM g JOIN hot USING (h)),
r AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= {stride}
              THEN 0 ELSE 1 END AS brk
  FROM dp),
runs AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
  FROM r)
SELECT doc_id, min(pos) AS span_start, max(pos) + {span_len} - 1 AS span_end,
       count(*) AS n_dup_grams
FROM runs GROUP BY doc_id, run_id
""".strip()


#: boilerplate planted by the spans-removal gate (shared verbatim with
#: __spark_entry__; SQL-literal-safe — no quotes)
SPAN_BOILER = "SUBSCRIBE TO OUR NEWSLETTER TODAY FOR EXCLUSIVE DAILY UPDATES"


def spans_removal_sql(
    span_len: int = 40,
    stride: int = 1,
    min_count: int = 2,
    boiler_mod: int = 7,
) -> str:
    """Substring-dedup application — duplicate_spans(keep_first=True)
    composed with remove_spans over documents carrying planted
    boilerplate (every ``boiler_mod``-th doc gets SPAN_BOILER appended,
    so duplicated regions exist by construction). Keep-first exempts
    each gram's minimal (doc_id, pos) occurrence; spans are cut as
    their union (ends are monotone in starts, so lag(span_end) is the
    running frontier)."""
    md5i = _MD5I_SQL.format(s=f"substr(text, i, {span_len})")
    return f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % {boiler_mod} = 0 THEN text || ' {SPAN_BOILER}'
              ELSE text END AS text
  FROM documents),
dd AS (SELECT doc_id, text FROM d WHERE length(text) >= {span_len}),
g AS (
  SELECT doc_id,
         unnest(range(1, length(text) - {span_len} + 2, {stride})) AS pos,
         unnest(list_transform(range(1, length(text) - {span_len} + 2, {stride}),
                               i -> {md5i})) AS h
  FROM dd),
hot AS (SELECT h FROM g GROUP BY h HAVING count(*) >= {min_count}),
ranked AS (
  SELECT g.doc_id, g.pos,
         row_number() OVER (PARTITION BY g.h ORDER BY g.doc_id, g.pos) AS rn
  FROM g JOIN hot USING (h)),
dp AS (SELECT doc_id, pos FROM ranked WHERE rn > 1),
r AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= {stride}
              THEN 0 ELSE 1 END AS brk
  FROM dp),
runs AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
  FROM r),
spans AS (
  SELECT doc_id, min(pos) AS span_start, max(pos) + {span_len} - 1 AS span_end
  FROM runs GROUP BY doc_id, run_id),
seg AS (
  SELECT doc_id, span_start,
         coalesce(lag(span_end) OVER (PARTITION BY doc_id ORDER BY span_start), 0)
           AS prev
  FROM spans),
body AS (
  SELECT seg.doc_id, seg.span_start AS ord,
         substr(d.text, (seg.prev + 1)::BIGINT,
                greatest(seg.span_start - 1 - seg.prev, 0)::BIGINT) AS piece
  FROM seg JOIN d USING (doc_id)
  UNION ALL
  SELECT m.doc_id, 9223372036854775807 AS ord,
         substr(d.text, (m.e + 1)::BIGINT) AS piece
  FROM (SELECT doc_id, max(span_end) AS e FROM spans GROUP BY doc_id) m
  JOIN d USING (doc_id)),
cleaned AS (
  SELECT doc_id, string_agg(piece, '' ORDER BY ord) AS ctext
  FROM body GROUP BY doc_id)
SELECT d.doc_id, coalesce(c.ctext, d.text) AS text,
       (length(d.text) - length(coalesce(c.ctext, d.text)))::BIGINT
         AS n_removed_chars
FROM d LEFT JOIN cleaned c USING (doc_id)
""".strip()


def decontaminate_exact_sql(
    probe_mod: int, probe_offset: int, n: int = 13, min_hits: int = 1
) -> str:
    """Exact word-n-gram decontamination (GPT-3 appendix-C policy):
    probes are copies of every doc with doc_id % probe_mod = 0 (planted
    exact contamination — each probe must flag its source doc); counts
    are over DISTINCT shared grams. Mirrors
    pipeline/dedup.py:decontaminate_exact (same token split, same
    short-doc full-run fallback, same md5-derived gram hash)."""
    md5i = _MD5I_SQL.format(
        s=f"array_to_string(list_slice(toks, i, i + {n} - 1), ' ')"
    )
    grams = (
        f"list_distinct(list_transform("
        f"range(1, greatest(len(toks) - {n} + 1, 1) + 1), i -> {md5i}))"
    )
    return f"""
WITH tc AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
tp AS (SELECT doc_id + {probe_offset} AS probe_id,
              string_split_regex(trim(text), '\\s+') AS toks
       FROM documents WHERE doc_id % {probe_mod} = 0),
gc AS (SELECT doc_id, unnest({grams}) AS h FROM tc),
gp AS (SELECT probe_id, unnest({grams}) AS h FROM tp)
SELECT probe_id, doc_id, count(*)::BIGINT AS n_shared_grams
FROM gc JOIN gp USING (h)
GROUP BY probe_id, doc_id
HAVING count(*) >= {min_hits}
""".strip()


def dedup_lines_sql(
    chunk: int, n_dups: int, dup_offset: int, min_len: int = 1
) -> str:
    """Corpus-global line dedup (C4 rule): documents are re-lined into
    fixed ``chunk``-char lines (the synthetic corpus is single-line)
    and docs with doc_id < n_dups are re-inserted at +dup_offset so
    whole documents' worth of duplicate lines exist. Keep-first =
    row_number over the exact line ordered by (doc_id, line_no);
    trimmed lines shorter than min_len are exempt. Mirrors
    pipeline/dedup.py:dedup_lines (docs losing every line drop out)."""
    relined = (
        f"array_to_string(list_transform("
        f"range(1, greatest(ceil(length(text) / {chunk}.0), 1)::BIGINT + 1),"
        f" i -> substr(text, ({chunk} * (i - 1))::BIGINT + 1, {chunk})), chr(10))"
    )
    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {dup_offset} AS doc_id, text FROM documents
  WHERE doc_id < {n_dups}),
d AS (SELECT doc_id, {relined} AS text FROM base),
l AS (
  SELECT doc_id,
         unnest(range(0, len(string_split(text, chr(10))))) AS line_no,
         unnest(string_split(text, chr(10))) AS line
  FROM d),
f AS (
  SELECT doc_id, line_no, line,
         (length(trim(line)) < {min_len})
         OR row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, line_no) = 1
           AS keep
  FROM l),
stats AS (
  SELECT doc_id, count(*)::BIGINT AS n_lines,
         sum(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT AS n_removed
  FROM f GROUP BY doc_id),
reb AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY line_no) AS text
  FROM f WHERE keep GROUP BY doc_id)
SELECT r.doc_id, r.text, s.n_lines, s.n_removed
FROM reb r JOIN stats s USING (doc_id)
""".strip()


def pii_redact_sql() -> str:
    """Sequential PII scrub over documents with deterministically
    injected synthetic PII (the corpus itself is clean word-salad) —
    mirrors pipeline/curate.py:pii_redact and the injection in
    __spark_entry__._pii_redact_query stage for stage."""
    from scalablevectorsearch_spark.pipeline.curate import PII_PATTERNS

    inject = """text
    || CASE WHEN doc_id % 2 = 0 THEN ' mail bob' || (doc_id % 100)::VARCHAR || '@mail.com' ELSE '' END
    || CASE WHEN doc_id % 3 = 0 THEN ' from 10.0.' || (doc_id % 256)::VARCHAR || '.7' ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' ssn 123-45-6789' ELSE '' END
    || CASE WHEN doc_id % 7 = 0 THEN ' call 555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-0199' ELSE '' END"""
    stages, prev = [f"s0 AS (SELECT doc_id, {inject} AS t FROM documents)"], "s0"
    for i, (name, pat, token) in enumerate(PII_PATTERNS, start=1):
        carried = ", ".join(f"n_{pname}" for pname, _, _ in PII_PATTERNS[: i - 1])
        carried = carried + ", " if carried else ""
        stages.append(
            f"s{i} AS (SELECT doc_id, {carried}"
            f"len(regexp_extract_all(t, '{pat}')) AS n_{name}, "
            f"regexp_replace(t, '{pat}', '{token}', 'g') AS t FROM {prev})"
        )
        prev = f"s{i}"
    counts = ", ".join(f"n_{name}" for name, _, _ in PII_PATTERNS)
    return (
        "WITH " + ",\n".join(stages)
        + f"\nSELECT doc_id, {counts}, t AS clean_text FROM {prev}"
    ).strip()


def quality_filter_sql(
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    max_top_ngram_e4: int = 2000,
    max_dup_ngram_e4: int = 1200,
    min_quality_e4: int = 3500,
    langs: list[str] | None = None,
) -> str:
    """Gopher/C4 filter decision — mirrors pipeline/curate.py:
    quality_filter by composing the three metadata oracles as nested
    CTEs (same e4 fixed-point thresholds, same first-fail rule order)."""
    langs = langs or ["en"]
    lang_list = _sql_str_list(langs)
    return f"""
WITH ts AS ({text_stats_sql()}),
rs AS ({repetition_stats_sql(2)}),
lg AS ({lang_id_sql()}),
j AS (
  SELECT ts.doc_id, ts.n_tokens, ts.quality_score_e4 AS q,
         rs.top_ngram_frac_e4 AS topf, rs.dup_ngram_frac_e4 AS dupf,
         lg.pred_lang
  FROM ts JOIN rs ON ts.doc_id = rs.doc_id JOIN lg ON ts.doc_id = lg.doc_id),
r AS (
  SELECT doc_id,
         CASE WHEN n_tokens < {min_tokens} THEN 'too_short'
              WHEN n_tokens > {max_tokens} THEN 'too_long'
              WHEN topf > {max_top_ngram_e4} THEN 'top_ngram_repetition'
              WHEN dupf > {max_dup_ngram_e4} THEN 'dup_ngram_repetition'
              WHEN q < {min_quality_e4} THEN 'low_quality'
              WHEN pred_lang NOT IN ({lang_list}) THEN 'bad_lang'
              ELSE 'ok' END AS reason
  FROM j)
SELECT doc_id, reason, (reason = 'ok')::BIGINT AS keep FROM r
""".strip()
