"""Similarity search over embedding columns (``array<float>``).

Extensions for training-data pipelines (SURVEY.md §7 step 6): cosine
top-k and cosine near-dup pairs, with two physical strategies:

- **brute force** — exact: cross-product + vectorized dot product in
  JVM expressions (zip_with/aggregate fold: sequential, so the fold
  order — and therefore the float result — is identical in the DuckDB
  oracle). Right for one query vector against N rows (top-k scans N),
  wrong for all-pairs at scale.
- **random-hyperplane LSH** — the scale path for all-pairs: sign-bit
  sketch of each vector against ``num_planes`` deterministic
  pseudo-random hyperplanes (components ±1 derived from md5 bits — no
  RNG state, reproducible in SQL), grouped into ``bands`` bands of
  ``num_planes/bands`` planes each (OR-of-ANDs, the same banding shape
  as dedup.lsh_bucket_candidates): candidates are pairs equal in ANY
  band. One band of many planes collapses recall; enough planes per
  band keeps per-band buckets FINE enough (many small buckets) that
  intra-bucket joins stay sub-quadratic, while the OR across bands
  restores the recall those fine buckets give up — the tunable
  (bands, planes_per_band) knob a 100 TB corpus needs.

All math accumulates in double regardless of the float storage type.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


from pagerank_mapreduce_implementation_spark.util import (
    persistent_rdd_ids as _persistent_rdd_ids,
)
from pagerank_mapreduce_implementation_spark.util import (
    release_persistent_rdds_since as _release_persistent_rdds_since,
)


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (order-deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    as_string: bool = False,
) -> DataFrame:
    """Symmetric per-vector INT8 quantization — the storage-shrink pass
    an embedding corpus takes before ANN serving (4x smaller than
    float32; dequantize with one scalar multiply per vector):
    ``(vec_id, scale, qvec)`` with ``scale = max|v| / 127`` and
    ``qvec[i] = round(v[i] / max|v| * 127)`` as ints in [-127, 127].
    Zero vectors quantize to all-zero with scale 0.

    Pure per-row array math (all-double, float->double lossless), zero
    shuffle — scan speed at any corpus size. Deterministic: both
    engines round half-away-from-zero, so the SQL oracle is bit-exact.
    ``as_string=True`` returns ``qvec`` comma-joined (the hash-gate
    form: a sortable scalar column); default is ``array<int>`` for
    downstream math.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = emb.select(F.col(id_col).alias("vec_id"), v.alias("__v")).withColumn(
        "__mx", F.array_max(F.transform(F.col("__v"), lambda x: F.abs(x)))
    )
    q = F.when(
        F.col("__mx") > 0,
        F.transform(
            F.col("__v"),
            lambda x: F.round(x / F.col("__mx") * 127, 0).cast("int"),
        ),
    ).otherwise(F.transform(F.col("__v"), lambda x: F.lit(0)))
    out = staged.select(
        "vec_id",
        F.round(F.col("__mx") / 127, 9).alias("scale"),
        q.alias("qvec"),
    )
    if as_string:
        out = out.select(
            "vec_id",
            "scale",
            F.array_join(
                F.transform(F.col("qvec"), lambda x: x.cast("string")), ","
            ).alias("qvec"),
        )
    return out


def cosine_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k for one stored query vector:
    ``(vec_id, cos)``, query row excluded, ties broken by vec_id.

    The 1-row query side is broadcast with its norm precomputed (the
    norm fold would otherwise re-run per scanned row — it doubles the
    per-row work); the scan stays narrow (no shuffle until the final
    TakeOrderedAndProject).
    """
    q = emb.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qvec"), _norm(F.col(vec_col)).alias("qnorm")
    )
    return (
        emb.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(
                _dot(F.col(vec_col), F.col("qvec"))
                / (_norm(F.col(vec_col)) * F.col("qnorm")),
                6,
            ).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_pairs_brute(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine >= threshold: ``(vec_a, vec_b, cos)``.

    O(N^2) — correct baseline and fine to ~10^4 rows; use
    cosine_pairs_lsh at scale.
    """
    a = emb.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    b = emb.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias(
                "cos"
            ),
        )
        .filter(F.col("cos") >= threshold)
    )


def _plane_sign(p: int, d: int) -> float:
    """±1 component of hyperplane ``p`` at dimension ``d``: +1 iff bit0
    of the first md5 hex digit of 'p:d' — reproducible anywhere md5
    exists (the SQL oracle evaluates the identical construction)."""
    return (
        1.0
        if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16) & 1
        else -1.0
    )


def _plane_dot(vec_col: str, p: int, dims: int) -> Column:
    """v · plane_p with the signs folded to ±1 LITERALS at plan-build
    time — they depend only on (p, d); evaluating md5 per row x plane x
    dimension put ~512 hash calls on every scanned row."""
    return F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.array(*[F.lit(_plane_sign(p, d)) for d in range(dims)]),
            lambda x, s: x.cast("double") * s,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _vec_dims(emb: DataFrame, vec_col: str) -> int | None:
    """Dimensionality from one driver-side peek at a single row (a
    scalar, like the reference's page count N); None on empty input."""
    first = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    return None if first is None else first["d"]


def hyperplane_sketch(
    emb: DataFrame,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Full sign sketch against deterministic ±1 hyperplanes:
    ``(vec_id, sketch)`` with sketch bit p = (v·plane_p >= 0).

    This is the single-integer sketch (useful as a compact signature
    column); candidate generation for pair search goes through
    ``hyperplane_band_buckets`` instead — equality on the FULL sketch
    is a single band of ``num_planes`` planes, whose recall collapses
    as planes grow.
    """
    dims = _vec_dims(emb, vec_col)
    if dims is None:  # empty input: preserve the output schema
        return emb.select(F.col(id_col).alias("vec_id"), F.lit(0).alias("sketch"))
    sketch = sum(
        [
            F.when(_plane_dot(vec_col, p, dims) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
            for p in range(num_planes)
        ],
        F.lit(0),
    )
    return emb.select(F.col(id_col).alias("vec_id"), sketch.alias("sketch"))


def hyperplane_band_buckets(
    emb: DataFrame,
    num_planes: int = 8,
    bands: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
    keep_vec: bool = False,
) -> DataFrame:
    """Banded hyperplane buckets: ``(vec_id, band, key)``, one row per
    band, key = the integer of that band's ``r = num_planes/bands``
    sign bits (plane index p = band*r + j — the same global plane
    construction as hyperplane_sketch, so tuning bands re-slices the
    identical sketch bits).

    This is the OR-of-ANDs banding shape of dedup.lsh_bucket_candidates
    applied to hyperplane signatures: a pair is a candidate iff ALL r
    bits agree in SOME band (P[candidate] = 1-(1-(1-θ/π)^r)^b). ONE
    narrow pass — the per-band structs are built in a single select and
    exploded; no per-band re-scan of the vectors.

    ``dims`` skips the one-row driver-side peek when the caller already
    knows the dimensionality — REQUIRED on a streaming frame, where
    ``.first()`` is illegal (streaming_cosine_probe passes the static
    store's dims). ``keep_vec`` carries the vector through the bucket
    rows (duplicated x bands in flight) so a streaming caller never
    needs to join the buckets back to their source — a stream-stream
    join.
    """
    if bands <= 0 or num_planes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must evenly divide num_planes ({num_planes}); "
            "a remainder would silently drop sign bits from banding"
        )
    r = num_planes // bands
    if dims is None:
        dims = _vec_dims(emb, vec_col)
    if dims is None:  # empty input: preserve the output schema
        out = emb.select(
            F.col(id_col).alias("vec_id"),
            F.lit(0).alias("band"),
            F.lit(0).alias("key"),
            *([F.col(vec_col).alias("vec")] if keep_vec else []),
        ).filter(F.lit(False))
        return out
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                sum(
                    [
                        F.when(
                            _plane_dot(vec_col, b * r + j, dims) >= 0, F.lit(1 << j)
                        ).otherwise(F.lit(0))
                        for j in range(r)
                    ],
                    F.lit(0),
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    return emb.select(
        F.col(id_col).alias("vec_id"),
        *([F.col(vec_col).alias("vec")] if keep_vec else []),
        F.explode(band_structs).alias("bb"),
    ).select(
        "vec_id",
        F.col("bb.band").alias("band"),
        F.col("bb.key").alias("key"),
        *(["vec"] if keep_vec else []),
    )


def cosine_pairs_lsh(
    emb: DataFrame,
    threshold: float,
    num_planes: int = 8,
    bands: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = False,
) -> DataFrame:
    """All-pairs cosine >= threshold, candidates from banded hyperplane
    buckets (OR-of-ANDs): ``(vec_a, vec_b, cos)``.

    Physical shape: one narrow pass builds ``bands`` bucket rows per
    vector; the self-join shuffles on (band, key) so only same-bucket
    vectors ever pair up; pairs colliding in several bands are
    de-duplicated BEFORE the exact cosine (the verify cost is paid once
    per pair); then one join back to the vectors scores the survivors.
    Never an N^2 product. Recall is band-limited like every LSH —
    P[candidate] = 1-(1-(1-θ/π)^r)^b with r = num_planes/bands — and
    the (bands, num_planes) knobs trade candidate volume for recall:
    more, smaller bands -> higher recall AND coarser per-band buckets
    (the thing a single wide band gets wrong at corpus scale).

    ``materialize=False`` (default — the op's historical shape):
    fully lazy, nothing pinned; each action computes the sketch once
    per join side (audited round 8: 3 scans of the embedding source).
    ``materialize=True`` is the dedup-module cadence: the bucket table
    — both sides of the self-join — is persisted so the sketch fold
    runs over the vectors ONCE (the thing that matters when the
    vector scan dominates), and the (small) verified pair set returns
    as an eager checkpoint; release with ``util.release_result`` when
    done (only id/band/key rows are pinned, never the vectors).
    A/B at sf0.1: the one-shot lazy query is faster (the checkpoint
    job + block writes outweigh the saved sketch pass at small scan
    cost), while consumers that reuse the pairs or anti-join them
    (``embedding_near_dup_survivors``) measure faster materialized —
    pick per call shape; at vector-scan-bound scale True saves a full
    corpus pass.
    """
    buckets = hyperplane_band_buckets(emb, num_planes, bands, id_col, vec_col)
    if materialize:
        buckets = buckets.persist()
    try:
        cand = (
            buckets.withColumnRenamed("vec_id", "vec_a")
            .join(buckets.select(F.col("vec_id").alias("vec_b"), "band", "key"), ["band", "key"])
            .filter(F.col("vec_a") < F.col("vec_b"))
            .select("vec_a", "vec_b")
            .distinct()
        )
        base = emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("vec"),
            _norm(F.col(vec_col)).alias("nrm"),
        )
        a = base.select(
            F.col("vec_id").alias("vec_a"), F.col("vec").alias("va"), F.col("nrm").alias("na")
        )
        b = base.select(
            F.col("vec_id").alias("vec_b"), F.col("vec").alias("vb"), F.col("nrm").alias("nb")
        )
        out = (
            cand.join(a, "vec_a")
            .join(b, "vec_b")
            .select(
                "vec_a",
                "vec_b",
                F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias(
                    "cos"
                ),
            )
            .filter(F.col("cos") >= threshold)
        )
        return out.localCheckpoint(eager=True) if materialize else out
    finally:
        if materialize:
            buckets.unpersist()


def cosine_matches_ab(
    emb_a: DataFrame,
    emb_b: DataFrame,
    threshold: float,
    num_planes: int = 8,
    bands: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """CROSS-corpus cosine matches: ``(id_a, id_b, cos)`` with cos >=
    threshold between two DIFFERENT embedding tables — the
    embedding-space decontamination / cross-corpus linkage shape
    ("which training docs are near any eval doc"), where the all-pairs
    product |A|x|B| must never materialize.

    Both sides are sketched with the SAME deterministic hyperplanes
    (md5-derived, no RNG state — the property that makes cross-table
    bucket keys comparable), so candidates are exactly the pairs that
    collide in some band; the exact cosine verifies survivors once per
    distinct pair. Same (bands, planes) recall knobs as
    cosine_pairs_lsh; no ``a < b`` ordering filter because the id
    spaces are unrelated.
    """
    ba = hyperplane_band_buckets(emb_a, num_planes, bands, id_col, vec_col).select(
        F.col("vec_id").alias("id_a"), "band", "key"
    )
    bb = hyperplane_band_buckets(emb_b, num_planes, bands, id_col, vec_col).select(
        F.col("vec_id").alias("id_b"), "band", "key"
    )
    cand = ba.join(bb, ["band", "key"]).select("id_a", "id_b").distinct()
    base_a = emb_a.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    base_b = emb_b.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    return (
        cand.join(base_a, "id_a")
        .join(base_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


# --- IVF (inverted-file) ANN ------------------------------------------------


def _seed_centroids(
    emb: DataFrame, n_cells: int, id_col: str, vec_col: str
) -> list[list[float]]:
    """First ``n_cells`` vectors by id — the deterministic no-RNG seed
    (a small dim table pulled to the driver, the same move as
    broadcasting it)."""
    rows = (
        emb.orderBy(id_col)
        .limit(n_cells)
        .select(F.col(vec_col).alias("cvec"))
        .collect()
    )
    return [[float(x) for x in r["cvec"]] for r in rows]


def _with_cnorms(cents_1row: DataFrame) -> DataFrame:
    """Attach ``cnorm`` to each struct of a 1-row
    ``cents array<struct<cell_id,cvec>>`` DataFrame (sequential fold,
    same math as ``_norm``)."""
    return cents_1row.select(
        F.transform(
            "cents",
            lambda c: F.struct(
                c["cell_id"].alias("cell_id"),
                c["cvec"].alias("cvec"),
                F.sqrt(
                    F.aggregate(
                        c["cvec"], F.lit(0.0), lambda a, x: a + x * x
                    )
                ).alias("cnorm"),
            ),
        ).alias("cents")
    )


def lloyd_centroids(
    emb: DataFrame,
    n_cells: int = 16,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_mean: bool = False,
) -> list[list[float]]:
    """K-means (Lloyd) centroid refinement as DataFrame ops — the
    production-recall upgrade over the first-n seed (which ivf_assign
    documents as a stand-in).

    The centroid state lives as a 1-row ``array<struct>`` DataFrame for
    the WHOLE refinement — re-broadcast into each iteration's
    assignment and updated by DataFrame ops, with a single collect at
    the very end. No driver round-trip inside the loop (round-3 verdict
    item: the old version collected the means every iteration and
    re-shipped them as literals — wrong shape at 4k cells).

    Practical ceiling: the broadcast payload is ``n_cells * dims``
    doubles (plus norms) — ~80 MB at 10^4 cells x 10^3 dims, far under
    Spark's 8 GB broadcast cap, so the shape holds through any sane IVF
    configuration; past that, a coarse quantizer tree (IVF-HNSW-style)
    is the right escalation, not a bigger broadcast.
    ``tests/test_plans.py::test_ivf_assignment_exchange_free_at_256_cells``
    pins the invariant that matters as cells grow: assignment stays a
    narrow fold with zero shuffle exchanges.

    Each iteration: (1) assign every vector to its nearest centroid via
    the SAME narrow broadcast-fold ivf_assign uses (no shuffle), then
    (2) average member vectors per cell with ONE groupBy over ``dims``
    scalar columns — no posexplode row blow-up (an explode would
    shuffle N x dims rows; this shuffles N rows once, with map-side
    partial aggregation), then (3) fold the per-cell means back into
    the 1-row centroid array (collect_list of ≤n_cells tiny rows —
    executor-side, the same "small dim table" shape as the broadcast).
    Deterministic seed, no RNG; empty cells keep their previous
    centroid (the coalesce against the prior array). Lineage is cut
    each iteration with a lazy localCheckpoint so the final job does
    not replay every earlier assignment pass; after the final collect,
    every RDD the checkpoints pinned is released at the RDD layer
    (round-5 advice: ``DataFrame.unpersist()`` is a NO-OP on
    localCheckpoint'ed frames — the checkpoint persists the underlying
    RDD outside the cache manager, so the release must diff
    ``getPersistentRDDs`` before/after and unpersist the new entries
    directly; ``tests/test_extensions.py`` asserts storage is clean
    via ``getRDDStorageInfo``).

    ``exact_mean=True`` switches step (2) to a BIT-DETERMINISTIC mean:
    per cell, members are collected sorted by id and summed as one
    sequential left fold (0.0 + v1 + v2 + ...), so the centroids are
    independent of partitioning and row arrival order — the mode the
    ``ivf_topk_lloyd`` driver query uses so its DuckDB oracle (the same
    fold as ``list_reduce`` over ``list(... ORDER BY id)``) matches
    hash-exactly. Cost: the per-cell member list materializes in one
    task (cell_size x dims doubles), so it is the audit/oracle
    configuration; the default ``F.avg`` path scales to arbitrary cell
    sizes and differs only by float addition order (~1e-15 noise that
    clustering does not care about).
    """
    spark = emb.sparkSession
    first = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:  # empty input: nothing to refine
        return []
    dims = int(first["d"])

    # Seed: first n_cells vectors by id, as ONE row of array<struct>.
    # The collect_list runs on a single tiny partition (post-limit),
    # sort_array orders structs by cell_id (first field).
    seed = (
        emb.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).cast("array<double>").alias("cvec"),
        )
    )
    from pyspark.sql.window import Window

    seed = seed.select(
        F.row_number().over(Window.orderBy("_id")).alias("cell_id"), "cvec"
    )
    cur = _with_cnorms(
        seed.agg(
            F.sort_array(F.collect_list(F.struct("cell_id", "cvec"))).alias("cents")
        )
    )

    rdds_before = _persistent_rdd_ids(spark)
    for _ in range(n_iters):
        staged = emb.crossJoin(F.broadcast(cur)).select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("vec"),
            _norm(F.col(vec_col)).alias("vnorm"),
            F.col("cents"),
        )
        scores = F.transform(
            F.col("cents"),
            lambda c: F.struct(
                (_dot(F.col("vec"), c["cvec"]) / (F.col("vnorm") * c["cnorm"])).alias(
                    "ccos"
                ),
                c["cell_id"].alias("cell_id"),
            ),
        )
        best = F.aggregate(
            scores,
            F.struct(F.lit(-2.0).alias("ccos"), F.lit(0).alias("cell_id")),
            lambda b, s: F.when(s["ccos"] > b["ccos"], s).otherwise(b),
        )
        assign = staged.select("__id", "vec", best["cell_id"].alias("cell_id"))
        if exact_mean:
            # deterministic mean: id-sorted member list, ONE sequential
            # elementwise fold (0.0 + v1 + v2 + ...) — identical to the
            # oracle's list_reduce over list(vec ORDER BY id)
            mem = assign.groupBy("cell_id").agg(
                F.sort_array(
                    F.collect_list(F.struct(F.col("__id"), F.col("vec")))
                ).alias("ms")
            )
            mvec = F.transform(
                F.aggregate(
                    F.col("ms"),
                    F.array_repeat(F.lit(0.0), dims),
                    lambda acc, m: F.zip_with(acc, m["vec"], lambda a, b: a + b),
                ),
                lambda s: s / F.size(F.col("ms")),
            )
            means_1row = mem.select("cell_id", mvec.alias("mvec")).agg(
                F.collect_list(F.struct("cell_id", "mvec")).alias("m")
            )
        else:
            means_1row = (
                assign.groupBy("cell_id")
                .agg(*[F.avg(F.col("vec")[i]).alias(f"c{i}") for i in range(dims)])
                .select(
                    "cell_id",
                    F.array(*[F.col(f"c{i}") for i in range(dims)]).alias("mvec"),
                )
                .agg(F.collect_list(F.struct("cell_id", "mvec")).alias("m"))
            )
        # merge: each cell takes its new mean, or keeps its previous
        # centroid when no vector landed in it this round
        cur = _with_cnorms(
            cur.crossJoin(means_1row).select(
                F.transform(
                    "cents",
                    lambda c: F.struct(
                        c["cell_id"].alias("cell_id"),
                        F.coalesce(
                            F.get(
                                F.filter(
                                    F.col("m"),
                                    lambda s: s["cell_id"] == c["cell_id"],
                                ),
                                F.lit(0),
                            )["mvec"],
                            c["cvec"],
                        ).alias("cvec"),
                    ),
                ).alias("cents")
            )
        )
        cur = cur.localCheckpoint(eager=False)

    row = cur.select("cents").first()
    cents = row["cents"] if row is not None else []
    _release_persistent_rdds_since(spark, rdds_before)
    return [[float(x) for x in c["cvec"]] for c in cents]


def ivf_assign(
    emb: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """IVF-flat coarse quantizer: returns (centroids, assignments).

    Default centroids are the first ``n_cells`` vectors by id
    (deterministic, no RNG — the partitioned-scan structure, not
    centroid quality, is the scale mechanism; pass
    ``centroids=lloyd_centroids(emb, ...)`` for production recall).
    Assignment = argmax cosine, ties to the lowest cell id.

    Scale shape: the ``n_cells`` centroid vectors live on the driver
    (a small dim table — the same move as broadcasting it) and ship as
    a 1-row array<struct> broadcast with norms pre-folded, so
    assignment is ONE narrow pass over the data: a per-row fold over
    the broadcast centroid array, no N x n_cells row blow-up, no window
    shuffle. The fold's float ops match the SQL oracle's sequential
    folds exactly (strict ``>`` keeps the lowest cell on ties; cells
    iterate in id order).
    """
    cent_vecs = (
        [[float(x) for x in v] for v in centroids]
        if centroids is not None
        else _seed_centroids(emb, n_cells, id_col, vec_col)
    )

    def seq_norm(v: list[float]) -> float:
        acc = 0.0
        for x in v:  # sequential fold — bit-identical to _norm/the oracle
            acc += x * x
        return math.sqrt(acc)

    spark = emb.sparkSession
    cents = spark.createDataFrame(
        [(i + 1, v, seq_norm(v)) for i, v in enumerate(cent_vecs)],
        "cell_id int, cvec array<double>, cnorm double",
    )
    # ONE row holding the whole centroid table as array<struct>: the
    # broadcast cross join adds no rows, and the per-row fold below
    # references a column — embedding 16 x dims literals instead blows
    # the generated code up (measured ~8x slower from janino
    # compilation per action).
    cents_1row = spark.createDataFrame(
        [([(i + 1, v, seq_norm(v)) for i, v in enumerate(cent_vecs)],)],
        "cents array<struct<cell_id:int,cvec:array<double>,cnorm:double>>",
    )
    staged = emb.crossJoin(F.broadcast(cents_1row)).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        _norm(F.col(vec_col)).alias("vnorm"),
        F.col("cents"),
    )
    scores = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            (_dot(F.col("vec"), c["cvec"]) / (F.col("vnorm") * c["cnorm"])).alias(
                "ccos"
            ),
            c["cell_id"].alias("cell_id"),
        ),
    )
    best = F.aggregate(
        scores,
        F.struct(F.lit(-2.0).alias("ccos"), F.lit(0).alias("cell_id")),
        lambda b, s: F.when(s["ccos"] > b["ccos"], s).otherwise(b),
    )
    assign = staged.select("vec_id", "vec", best["cell_id"].alias("cell_id"))
    return cents, assign


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN top-k for one stored query vector: ``(vec_id, cos)``.

    Probes the ``n_probe`` cells whose centroids are nearest the query
    and scans ONLY those cells' vectors — at scale the index lives as a
    cell_id-partitioned table and each query touches n_probe/n_cells of
    the data. Recall is probe-limited (standard IVF tradeoff vs the
    exact cosine_topk baseline); pass ``centroids=lloyd_centroids(...)``
    to trade a few index-build passes for better cell quality.
    """
    cents, assign = ivf_assign(emb, n_cells, id_col, vec_col, centroids=centroids)
    q = emb.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qvec"), _norm(F.col(vec_col)).alias("qnorm")
    )
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "cell_id",
            (
                _dot(F.col("cvec"), F.col("qvec"))
                / (F.col("cnorm") * F.col("qnorm"))
            ).alias("qcos"),
        )
        .orderBy(F.desc("qcos"), F.asc("cell_id"))
        .limit(n_probe)
        .select("cell_id")
    )
    return (
        assign.join(F.broadcast(probe), "cell_id")
        .filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("vec"), F.col("qvec"))
                / (_norm(F.col("vec")) * F.col("qnorm")),
                6,
            ).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_topk_batch(
    emb: DataFrame,
    query_vec_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN top-k for MANY stored query vectors in ONE pass over the
    index: ``(query_id, vec_id, cos)`` — the batch-serving shape
    (ivf_topk × q queries would scan the assignments q times; this
    scans them once).

    Shape at scale: queries × centroids is a tiny broadcast cross
    (q·n_cells rows) from which a per-query row_number picks the
    ``n_probe`` probe cells; the (cell_id, query) probe table — q·n_probe
    rows carrying the query vectors — broadcasts into ONE join against
    the cell assignments, so each query only ever meets vectors in its
    probed cells; the per-query top-k is a row_number window that
    Catalyst prunes with WindowGroupLimit before the shuffle. Same
    deterministic ties (strict rank, lowest id) and the same sequential
    fold float math as ivf_topk/the SQL oracle.
    """
    from pyspark.sql.window import Window

    cents, assign = ivf_assign(emb, n_cells, id_col, vec_col, centroids=centroids)
    qs = emb.filter(F.col(id_col).isin(list(query_vec_ids))).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    scored_cells = cents.crossJoin(F.broadcast(qs)).select(
        "query_id",
        "cell_id",
        "qvec",
        "qnorm",
        (_dot(F.col("cvec"), F.col("qvec")) / (F.col("cnorm") * F.col("qnorm"))).alias(
            "qcos"
        ),
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("cell_id"))
    probes = (
        scored_cells.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "cell_id", "qvec", "qnorm")
    )
    scored = (
        assign.join(F.broadcast(probes), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("vec"), F.col("qvec"))
                / (_norm(F.col("vec")) * F.col("qnorm")),
                6,
            ).alias("cos"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(wk))
        .filter(F.col("__rn") <= k)
        .select("query_id", "vec_id", "cos")
    )


# --- product quantization (PQ) ----------------------------------------------


def _sq_l2(a: Column, b: Column) -> Column:
    """Squared L2 distance as ONE sequential left fold over the zipped
    difference squares — bit-identical to the oracle's list_sum over
    the same per-index terms (the exact_mean convention)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def pq_train(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jegou et al. 2011): split each
    vector into ``m`` equal subspaces and Lloyd-refine ``k`` codewords
    per subspace — the 4x-beyond-int8 memory shrink (``m`` bytes per
    vector vs ``dims*4``) that IVF-PQ serving at 100 TB rides.

    Returns ``m`` codebooks of ``k`` codewords each, BIT-DETERMINISTIC
    so a SQL oracle can retrain to identical floats: the seed for
    subspace ``s`` is the s-th subvector of the first ``k`` vectors by
    id; assignment is argmin squared-L2 with ties to the lowest code;
    means are id-ordered sequential elementwise folds (the
    ``lloyd_centroids(exact_mean=True)`` convention).

    Scale shape — the lloyd_centroids loop generalized to subspaces:
    ALL ``m`` codebooks train in one loop over a single exploded
    ``(id, s, subvec)`` table (m x N narrow rows, never collected);
    the whole codebook state is ONE broadcast row of ``m*k`` structs
    (~``m*k*dims/m`` doubles — KB at any sane config), assignment is
    a zero-shuffle broadcast fold, and each iteration shuffles only
    the ``(s, code)`` partial means. Lineage is cut per iteration with
    a lazy localCheckpoint and released at the RDD layer after the
    final collect (the lloyd_centroids contract).
    """
    if m < 1 or k < 1:
        raise ValueError(f"m ({m}) and k ({k}) must be >= 1")
    spark = emb.sparkSession
    first = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        return []
    dims = int(first["d"])
    if dims % m != 0:
        raise ValueError(f"dims ({dims}) not divisible by m ({m})")
    sd = dims // m

    # exploded (id, s, subvec) once — narrow, reused every iteration
    sub = emb.select(
        F.col(id_col).alias("__id"),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).select(
        "__id",
        "s",
        F.slice(
            "v", F.col("s") * sd + 1, F.lit(sd)
        ).alias("subvec"),
    )

    # seed: subspace s's codeword c = subvector s of the c-th vector
    # by id (one tiny post-limit partition, like _seed_centroids)
    from pyspark.sql.window import Window

    seedv = emb.orderBy(id_col).limit(k).select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    seedv = seedv.select(
        F.row_number().over(Window.orderBy("__id")).alias("code"), "v"
    )
    seed = seedv.select(
        "code",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        "v",
    ).select(
        "s", "code", F.slice("v", F.col("s") * sd + 1, F.lit(sd)).alias("cvec")
    )
    cur = seed.agg(
        F.sort_array(F.collect_list(F.struct("s", "code", "cvec"))).alias("cb")
    )

    rdds_before = _persistent_rdd_ids(spark)
    for _ in range(n_iters):
        staged = sub.crossJoin(F.broadcast(cur))
        cands = F.filter(F.col("cb"), lambda e: e["s"] == F.col("s"))
        best = F.aggregate(
            F.transform(
                cands,
                lambda e: F.struct(
                    _sq_l2(F.col("subvec"), e["cvec"]).alias("d2"),
                    e["code"].alias("code"),
                ),
            ),
            F.struct(
                F.lit(float("inf")).alias("d2"), F.lit(0).alias("code")
            ),
            # strict < keeps the FIRST (lowest code) on ties — the
            # array is sorted by (s, code)
            lambda b, s: F.when(s["d2"] < b["d2"], s).otherwise(b),
        )
        assign = staged.select(
            "__id", "s", "subvec", best["code"].alias("code")
        )
        mem = assign.groupBy("s", "code").agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__id"), F.col("subvec")))
            ).alias("ms")
        )
        mvec = F.transform(
            F.aggregate(
                F.col("ms"),
                F.array_repeat(F.lit(0.0), sd),
                lambda acc, e: F.zip_with(acc, e["subvec"], lambda a, b: a + b),
            ),
            lambda x: x / F.size(F.col("ms")),
        )
        means_1row = mem.select("s", "code", mvec.alias("mvec")).agg(
            F.collect_list(F.struct("s", "code", "mvec")).alias("mn")
        )
        cur = cur.crossJoin(means_1row).select(
            F.transform(
                "cb",
                lambda e: F.struct(
                    e["s"].alias("s"),
                    e["code"].alias("code"),
                    F.coalesce(
                        F.get(
                            F.filter(
                                F.col("mn"),
                                lambda x: (x["s"] == e["s"])
                                & (x["code"] == e["code"]),
                            ),
                            F.lit(0),
                        )["mvec"],
                        e["cvec"],
                    ).alias("cvec"),
                ),
            ).alias("cb")
        )
        cur = cur.localCheckpoint(eager=False)

    row = cur.select("cb").first()
    _release_persistent_rdds_since(spark, rdds_before)
    if row is None:
        return []
    books: list[list[list[float]]] = [
        [[0.0] * sd for _ in range(k)] for _ in range(m)
    ]
    for e in row["cb"]:
        books[e["s"]][e["code"] - 1] = [float(x) for x in e["cvec"]]
    return books


def _pq_codes_col(
    vec: Column, codebooks: list[list[list[float]]]
) -> Column:
    """``array<int>`` of per-subspace argmin codes against LITERAL
    codebooks (plan-time constants, the plane-literal convention) —
    zero shuffle, ties to the lowest code via strict <."""
    sd = len(codebooks[0][0])
    codes = []
    for s, book in enumerate(codebooks):
        subv = F.slice(vec, s * sd + 1, sd)
        cands = F.array(
            *[
                F.struct(
                    _sq_l2(
                        subv, F.array(*[F.lit(float(x)) for x in cw])
                    ).alias("d2"),
                    F.lit(c + 1).alias("code"),
                )
                for c, cw in enumerate(book)
            ]
        )
        best = F.aggregate(
            cands,
            F.struct(F.lit(float("inf")).alias("d2"), F.lit(0).alias("code")),
            lambda b, s_: F.when(s_["d2"] < b["d2"], s_).otherwise(b),
        )
        codes.append(best["code"])
    return F.array(*codes)


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector to its ``m`` PQ codes: ``(vec_id, codes)``
    with ``codes`` the comma-joined per-subspace codeword ids (a
    string so the cross-engine hash sees identical values). The
    ``m``-bytes-per-vector store this emits is what PQ serving scans
    instead of the raw floats. Zero shuffles — literal-codebook
    argmin folds only."""
    vec = F.col(vec_col).cast("array<double>")
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.array_join(_pq_codes_col(vec, codebooks), ",").alias("codes"),
    )


def pq_topk(
    emb: DataFrame,
    query_vec_id: int,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query stays
    a full-precision vector, each candidate is scored from its codes
    through a per-subspace distance TABLE (``m x k`` floats, computed
    once driver-side from the codebooks and folded in as literals) —
    the memory-bound serving scan of Jegou et al. 2011. Returns
    ``(vec_id, adist)`` ascending, ties to the lower id.

    Scale shape: scoring is a per-row encode (literal argmin folds) +
    ``m`` literal table lookups summed left-to-right — zero shuffle,
    zero Python — then TakeOrderedAndProject for the top-k; the plan
    never materializes a global sort. At 100 TB the encode would read
    a pre-materialized ``pq_encode`` store instead of re-deriving
    codes; both paths share the same plan tail.
    """
    qrow = (
        emb.filter(F.col(id_col) == query_vec_id)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .first()
    )
    if qrow is None:
        raise ValueError(f"query vec_id {query_vec_id} not found")
    q = [float(x) for x in qrow["v"]]
    sd = len(codebooks[0][0])
    # dt[s][c]: sequential Python float fold — same IEEE doubles as
    # the oracle's list_sum over the identical terms
    dt = [
        [
            sum((q[s * sd + i] - cw[i]) * (q[s * sd + i] - cw[i]) for i in range(sd))
            for cw in book
        ]
        for s, book in enumerate(codebooks)
    ]
    vec = F.col(vec_col).cast("array<double>")
    codes = _pq_codes_col(vec, codebooks)
    score: Column = F.lit(0.0)
    for s, table in enumerate(dt):
        score = score + F.element_at(
            F.array(*[F.lit(float(d)) for d in table]), codes[s]
        )
    return (
        emb.filter(F.col(id_col) != query_vec_id)
        .select(
            F.col(id_col).alias("vec_id"), F.round(score, 6).alias("adist")
        )
        .orderBy(F.col("adist").asc(), F.col("vec_id").asc())
        .limit(k)
    )


def ivf_pq_topk(
    emb: DataFrame,
    query_vec_id: int,
    codebooks: list[list[list[float]]],
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVFADC (Jegou et al. 2011, the FAISS `IVFx,PQy` serving path):
    the IVF coarse quantizer prunes the scan to ``n_probe`` cells,
    then candidates are scored by PQ asymmetric distance — codes and
    a literal ``m x k`` table, never their floats. ``(vec_id, adist)``
    ascending, ties to the lower id.

    Scale shape: both prunings compose — the scan touches
    ``n_probe/n_cells`` of the corpus (cell-partitioned at scale) and
    reads ``m`` bytes per surviving candidate; plan = the ivf_topk
    probe (two broadcast dims, no corpus shuffle) + pq_topk's literal
    fold scoring + TakeOrderedAndProject."""
    cents, assign = ivf_assign(
        emb, n_cells, id_col, vec_col, centroids=centroids
    )
    q = emb.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qvec"), _norm(F.col(vec_col)).alias("qnorm")
    )
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "cell_id",
            (
                _dot(F.col("cvec"), F.col("qvec"))
                / (F.col("cnorm") * F.col("qnorm"))
            ).alias("qcos"),
        )
        .orderBy(F.desc("qcos"), F.asc("cell_id"))
        .limit(n_probe)
        .select("cell_id")
    )
    qrow = (
        emb.filter(F.col(id_col) == query_vec_id)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .first()
    )
    if qrow is None:
        raise ValueError(f"query vec_id {query_vec_id} not found")
    qv = [float(x) for x in qrow["v"]]
    sd = len(codebooks[0][0])
    dt = [
        [
            sum(
                (qv[s * sd + i] - cw[i]) * (qv[s * sd + i] - cw[i])
                for i in range(sd)
            )
            for cw in book
        ]
        for s, book in enumerate(codebooks)
    ]
    codes = _pq_codes_col(F.col("vec").cast("array<double>"), codebooks)
    score: Column = F.lit(0.0)
    for s, table in enumerate(dt):
        score = score + F.element_at(
            F.array(*[F.lit(float(d)) for d in table]), codes[s]
        )
    return (
        assign.join(F.broadcast(probe), "cell_id")
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", F.round(score, 6).alias("adist"))
        .orderBy(F.col("adist").asc(), F.col("vec_id").asc())
        .limit(k)
    )


def ann_recall_report(
    emb: DataFrame,
    query_vec_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Recall@k of the IVF index against the exact brute-force ground
    truth, per query — ``(query_id, n_truth, hits, recall)``: the ANN
    quality gauge a pipeline reads before trusting an index
    configuration (raise ``n_probe``/``n_cells`` until recall holds).
    ``hits`` counts ground-truth neighbors the index returned,
    ``recall = hits / n_truth`` with ``n_truth = min(k, corpus - 1)``.

    Both sides use the identical rounded-cosine (desc, vec_id asc)
    strict ranking — the ``ivf_topk_batch`` convention — so the
    intersection is a set equality, not a fuzzy overlap, and the
    DuckDB oracle replays it exactly.

    Scale shape: the index side is ``ivf_topk_batch`` (one
    probe-bounded pass); the TRUTH side is inherently a full scan per
    query — q × N cosines — which is why this is an EVALUATION
    operator: run it on a SAMPLED query set (tens to hundreds of
    pivots, the Eppstein-Wang move ``source_centrality`` makes for
    graphs), never per serving query. One window top-k per side
    (WindowGroupLimit prunes before the shuffle), one broadcast-sized
    join on (query, neighbor), one q-bounded aggregate.
    """
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError(f"k ({k}) must be >= 1")
    if not query_vec_ids:
        raise ValueError("query_vec_ids must be non-empty")
    ann = ivf_topk_batch(
        emb, query_vec_ids, k, n_cells, n_probe, id_col, vec_col, centroids
    )
    qs = emb.filter(F.col(id_col).isin(list(query_vec_ids))).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    scored = (
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__v"))
        .crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("__v"), F.col("qvec"))
                / (_norm(F.col("__v")) * F.col("qnorm")),
                6,
            ).alias("cos"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    truth = (
        scored.withColumn("__rn", F.row_number().over(wk))
        .filter(F.col("__rn") <= k)
        .select("query_id", "vec_id")
    )
    joined = truth.join(
        ann.select("query_id", "vec_id", F.lit(1).alias("__hit")),
        ["query_id", "vec_id"],
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("hits"),
    ).select(
        "query_id",
        "n_truth",
        "hits",
        F.round(F.col("hits") / F.col("n_truth"), 6).alias("recall"),
    )


def margin_matches_ab(
    emb_a: DataFrame,
    emb_b: DataFrame,
    k: int = 4,
    margin_threshold: float = 1.0,
    num_planes: int = 8,
    bands: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = True,
) -> DataFrame:
    """Margin-criterion cross-corpus mining (Artetxe & Schwenk 2019,
    the CCMatrix/LASER bitext scorer): ``(id_a, id_b, cos, margin)``
    with ``margin = cos(x,y) / ((avg_kNN_cos(x) + avg_kNN_cos(y)) /
    2)`` kept when ``>= margin_threshold`` — an absolute cosine cutoff
    can't separate "genuinely matched pair" from "x is close to
    EVERYTHING" (hubness), so the score is RELATIVE to each side's own
    neighborhood density; ratio margin > 1 means the pair stands out
    above both neighborhoods.

    Candidates and neighborhoods come from the same deterministic
    banded hyperplane LSH as ``cosine_matches_ab`` (md5 planes, no RNG
    state, both corpora sketched identically); each side's avg-top-k
    runs over its CANDIDATE neighborhood — the standard ANN-margin
    practice (the paper's FAISS retrieval is the same approximation).

    Cross-engine exactness: the round-6 cosine is scaled to an exact
    BIGINT (``round(cos6 * 1e6)``), so the top-k sums are
    order-independent integer adds and every double after that is a
    fixed chain of single IEEE ops (two divisions, one add, one
    halving, one division, round 6) — the SQL oracle replays the
    margin bit-for-bit. Non-positive neighborhood averages (possible
    with negative cosines) are excluded — the ratio is undefined there.

    Scale shape: candidate volume is band-bounded exactly as in
    ``cosine_matches_ab`` (never |A|x|B|); the two row_number windows
    partition by one vector's id over its HIT-SIZED candidate list;
    the denominator tables are id-keyed aggregates joined back on the
    candidate set. Raise ``bands`` for recall, ``k`` for neighborhood
    smoothing; both knobs are mirrored in the oracle.
    ``materialize=False`` skips the eager final checkpoint and returns
    the lazy composable plan (streaming/pushdown callers — the
    ``bipartite_projection`` escape hatch); the scored-candidate
    persist stays, cache lifetime owned by the caller — release with
    ``util.release_plan_caches(plan)`` when done (uncaches exactly
    what this plan pins; never ``clearCache()``). If plan ASSEMBLY
    raises before the handoff, the persist is released internally.
    """
    if k < 1:
        raise ValueError(f"k ({k}) must be >= 1")
    from pyspark.sql.window import Window

    ba = hyperplane_band_buckets(emb_a, num_planes, bands, id_col, vec_col).select(
        F.col("vec_id").alias("id_a"), "band", "key"
    )
    bb = hyperplane_band_buckets(emb_b, num_planes, bands, id_col, vec_col).select(
        F.col("vec_id").alias("id_b"), "band", "key"
    )
    cand = ba.join(bb, ["band", "key"]).select("id_a", "id_b").distinct()
    base_a = emb_a.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    base_b = emb_b.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    co6 = F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    # PERSIST the scored candidate set: it feeds three subtrees (both
    # rank windows' aggregates and the final margin join), and Spark
    # clones each into its own plan — without the cache the cosine
    # fold over every candidate runs three times (A/B at sf0.1:
    # 2.5 -> 2.3 s here; at scale the fold IS the cost). Only
    # (id, id, double, long) rows are pinned, never vectors; the
    # (small, thresholded) output returns as an eager checkpoint so
    # the cache can drop before returning.
    sc = (
        cand.join(base_a, "id_a")
        .join(base_b, "id_b")
        .select(
            "id_a",
            "id_b",
            co6.alias("cos"),
            F.round(co6 * 1000000, 0).cast("long").alias("__ci"),
        )
        .persist()
    )
    # r14 advisory (+ r15 review): with materialize=False the caller
    # owns the persist lifetime ONLY once the lazy plan is successfully
    # returned — an exception ANYWHERE in plan assembly (the window/
    # groupBy transforms analyze eagerly on the JVM) must still release
    # the cache, so the try opens immediately after the persist and a
    # handoff flag (not the materialize flag) keys the finally.
    handed_off = False
    try:
        ranked = sc.withColumn(
            "__ra",
            F.row_number().over(
                Window.partitionBy("id_a").orderBy(F.desc("__ci"), F.asc("id_b"))
            ),
        ).withColumn(
            "__rb",
            F.row_number().over(
                Window.partitionBy("id_b").orderBy(F.desc("__ci"), F.asc("id_a"))
            ),
        )
        da = (
            ranked.filter(F.col("__ra") <= k)
            .groupBy("id_a")
            .agg(F.sum("__ci").alias("__sa"), F.count(F.lit(1)).alias("__ka"))
        )
        db = (
            ranked.filter(F.col("__rb") <= k)
            .groupBy("id_b")
            .agg(F.sum("__ci").alias("__sb"), F.count(F.lit(1)).alias("__kb"))
        )
        denom = (
            F.col("__sa") / F.col("__ka") + F.col("__sb") / F.col("__kb")
        ) / F.lit(2.0)
        out = (
            sc.join(da, "id_a")
            .join(db, "id_b")
            .withColumn("__den", denom)
            .filter(F.col("__den") > 0)
            .select(
                "id_a",
                "id_b",
                "cos",
                F.round(F.col("__ci").cast("double") / F.col("__den"), 6).alias(
                    "margin"
                ),
            )
            .filter(F.col("margin") >= margin_threshold)
        )
        if not materialize:
            handed_off = True
            return out
        return out.localCheckpoint(eager=True)
    finally:
        if not handed_off:
            sc.unpersist()


def hybrid_rrf_search(
    docs: DataFrame,
    emb: DataFrame,
    terms: list,
    query_vec_id: int,
    n: int = 50,
    k: int = 10,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    total_docs: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al.,
    SIGIR 2009): fuse a LEXICAL branch (BM25 over the documents table,
    operators/text.py:bm25_search) with a SEMANTIC branch (exact cosine
    top-n for a stored query vector, cosine_topk) into one ranked list

        rrf(d) = sum_branches 1 / (rrf_k + rank_branch(d))

    → ``(doc_id, rrf, lex_rank, sem_rank)`` top-``k`` by fused score,
    ``doc_id`` tiebreak; a doc absent from one branch's top-``n``
    contributes 0 for that branch and reports a NULL rank. The engine
    extension the reference's Search/Rank pipeline (Search$Map @89,
    SURVEY.md §2.2) grows into once an embedding column exists: RRF is
    the standard score-free fusion — no cross-branch score calibration,
    which is exactly why it is the robust default at corpus scale.

    Scale shape: each branch is already scale-safe on its own (BM25 =
    one corpus tokenize + one pivoted shuffle; cosine = narrow scan +
    broadcast 1-row query) and ends in a TakeOrderedAndProject of
    ``n`` rows — the ONLY post-branch work (rank assignment windows,
    the full-outer fuse join, the final top-k) runs on <= 2n rows, so
    fusion cost is independent of corpus size. The rank windows are
    deliberately assigned AFTER the top-n cut: a global row_number
    over the un-cut scored frame would single-partition the corpus.

    Determinism: both branches rank over their ROUND(6)-certified
    scores (the same rounding their registered standalone queries
    hash-exact against DuckDB on) with id tiebreaks, so ranks — and
    the fused 1/(rrf_k+rank) sums, added lex-then-sem in fixed order —
    are reproducible across engines bit-exactly.
    """
    from pyspark.sql.window import Window

    from pagerank_mapreduce_implementation_spark.operators.text import bm25_search

    if n < 1 or k < 1:
        raise ValueError("hybrid_rrf_search needs n >= 1 and k >= 1")
    if rrf_k < 1:
        raise ValueError("rrf_k must be >= 1 (RRF denominator offset)")

    lex_top = (
        bm25_search(docs, terms, k1=k1, b=b, total_docs=total_docs)
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(n)
    )
    lex = lex_top.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .cast("long")
        .alias("lex_rank"),
    )
    sem_top = cosine_topk(
        emb, query_vec_id, k=n, id_col=id_col, vec_col=vec_col
    )
    sem = sem_top.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.desc("cos"), F.asc("vec_id")))
        .cast("long")
        .alias("sem_rank"),
    )
    part = lambda r: F.when(  # noqa: E731 — 1/(K+rank), 0 when absent
        r.isNotNull(), F.lit(1.0) / (F.lit(float(rrf_k)) + r)
    ).otherwise(F.lit(0.0))
    return (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(part(F.col("lex_rank")) + part(F.col("sem_rank")), 6).alias(
                "rrf"
            ),
            "lex_rank",
            "sem_rank",
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(k)
    )
