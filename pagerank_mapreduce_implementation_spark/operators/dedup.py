"""Deduplication operators for large-scale training-data pipelines.

Extensions beyond the reference surface (SURVEY.md §7 step 6): exact
dedup, MinHash+LSH near-dup, SimHash near-dup, n-gram Jaccard
verification, and embedding-cosine near-dup (see similarity.py).

Everything is pure DataFrame column expressions — deterministic,
DuckDB-oracle-reproducible (hashes are md5-based: identical hex output
in Spark and DuckDB), and shuffle-frugal:

- exact: one groupBy on a 128-bit fingerprint.
- MinHash+LSH: shingle explode (narrow) → per-doc signature agg (one
  shuffle) → band buckets (narrow) → bucket self-join (shuffle on
  bucket key — the LSH point: only colliding docs meet) → Jaccard
  verification join over shingle sets restricted to candidates.
  At 100 TB: no all-pairs product ever materializes; the bucket join's
  fan-out is controlled by band/row tuning, and AQE splits skewed
  buckets (a stop-shingle bucket is the classic skew case).
- SimHash: token-hash bit-vote as ONE wide aggregation (60 sum columns
  in a single shuffle — not a x60 row explode, and not a Pandas UDF
  that would ship every token to Python) → 15-bit chunk bands
  (pigeonhole: hamming<=3 pairs share a chunk) → verified hamming
  distance.
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SIMHASH_BITS = 60  # 15 hex digits of md5 -> fits signed 64-bit exactly


def normalize_text(col: Column) -> Column:
    """Canonical text form for exact dedup: lowercase, collapsed
    whitespace, trimmed."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def tokens_null_safe(col: Column) -> Column:
    """Whitespace token array with the library-wide NULL-text-as-empty
    convention: NULL coalesces to '' BEFORE the split, so consumers see
    an empty array (Spark's size(split(NULL)) is -1 and DuckDB sums
    skip NULLs — the cross-engine divergence this single home
    prevents). The one tokenizer expression behind source_manifest,
    blocklist_hits, and streaming_contamination_probe; SQL mirrors
    spell it list_filter(regexp_split_to_array(coalesce(text, ''),
    '[[:space:]]+'), w -> w <> '')."""
    return F.filter(
        F.split(F.coalesce(col, F.lit("")), r"\s+"), lambda w: w != ""
    )


def exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    skew_safe: bool = False,
) -> DataFrame:
    """Exact dedup by content fingerprint.

    Returns every doc with its group fingerprint, the group's keeper
    (min doc id — the row a dedup pass would retain) and an is_dup
    flag. One hash-groupBy shuffle; the window over fp reuses it.

    Skew bound: the window partitions ALL duplicates of one fingerprint
    into a single task, so the hottest fingerprint's duplicate count is
    the straggler bound — fine on real corpora (the hot key is
    boilerplate, still a small fraction of rows), pathological if
    billions of rows share one fingerprint. ``skew_safe=True`` switches
    to a groupBy(min)+join plan with identical output: the partial
    (map-side) aggregation collapses each hot key to one row per input
    partition BEFORE the shuffle, and the keeper join back is a plain
    equi-join that AQE's skew-join splitting can handle — the shape to
    pick for adversarial corpora, at the cost of a second shuffle.
    """
    from pyspark.sql.window import Window

    fp = F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    base = docs.select(F.col(doc_col).alias("doc_id"), fp)
    if skew_safe:
        keepers = base.groupBy("fingerprint").agg(F.min("doc_id").alias("keeper"))
        return base.join(keepers, "fingerprint").select(
            "doc_id",
            "fingerprint",
            "keeper",
            (F.col("doc_id") != F.col("keeper")).cast("int").alias("is_dup"),
        )
    w = Window.partitionBy("fingerprint")
    return (
        base.withColumn("keeper", F.min("doc_id").over(w))
        .withColumn("is_dup", (F.col("doc_id") != F.col("keeper")).cast("int"))
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    seen_fingerprints: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    bloom_prefilter: DataFrame | None = None,
    bloom_n_bits: int = 1 << 16,
    bloom_n_hashes: int = 4,
    bloom_salt: str = "bloom:",
) -> DataFrame:
    """Incremental ingestion dedup: survivors of a NEW batch against an
    existing corpus fingerprint store (``seen_fingerprints``: one
    ``fingerprint`` column, the store a previous ``exact_dedup`` pass
    materialized).

    Two stages, both standard at 100 TB:
    1. in-batch: keep the min-doc_id row per fingerprint (same rule as
       exact_dedup) — one window over the batch, which is small
       relative to the corpus;
    2. cross-batch: anti-join the batch survivors against the seen
       store on fingerprint. The store is huge but the join is equi on
       the hash — at scale the store lives as a parquet table bucketed
       by fingerprint so the anti-join co-locates without a shuffle of
       the store.

    ``bloom_prefilter`` (a ``sketches.bloom_filter_table`` built over
    the SAME store's fingerprints, persisted alongside it) splits
    stage 2: docs the filter clears (``maybe_member = false``, which a
    Bloom filter guarantees correct) skip the anti-join entirely via a
    stateless broadcast probe, and only the maybe_member sliver pays
    the store join. Results are IDENTICAL with or without the
    prefilter — it is purely a physical rewrite (property-tested) —
    but on a mostly-novel ingest the store-sized join shrinks to the
    duplicate+false-positive fraction: a multi-billion-row store scan
    becomes a few-MB broadcast for ~99% of the batch. The filter's
    ``n_bits``/``n_hashes``/``salt`` must match how it was built.

    Returns the caller's schema plus ``fingerprint`` (append it to the
    store for the next batch; OR the batch's bits into the Bloom store
    cell-wise — ``bloom_filter_table`` outputs merge by
    ``groupBy(word).bit_or(bits)``). The corpus-wide pass stays
    ``exact_dedup``; this is the per-increment path that avoids
    re-reading the whole corpus every ingest.
    """
    from pyspark.sql.window import Window

    fp = F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    w = Window.partitionBy("fingerprint")
    in_batch = (
        new_docs.select("*", fp)
        .withColumn("__keeper", F.min(doc_col).over(w))
        .filter(F.col(doc_col) == F.col("__keeper"))
        .drop("__keeper")
    )
    if bloom_prefilter is None:
        return in_batch.join(
            seen_fingerprints.select("fingerprint"), "fingerprint", "left_anti"
        )
    from pagerank_mapreduce_implementation_spark.operators.sketches import (
        bloom_membership_rowwise,
    )

    probed = bloom_membership_rowwise(
        in_batch,
        bloom_prefilter,
        "fingerprint",
        n_bits=bloom_n_bits,
        n_hashes=bloom_n_hashes,
        salt=bloom_salt,
    )
    cleared = probed.filter(~F.col("maybe_member")).drop("maybe_member")
    sliver = (
        probed.filter(F.col("maybe_member"))
        .drop("maybe_member")
        .join(
            seen_fingerprints.select("fingerprint"), "fingerprint", "left_anti"
        )
    )
    return cleared.unionByName(sliver)


def shingles(
    docs: DataFrame,
    n: int = 1,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Distinct word n-gram shingles per doc: ``(doc_id, shingle)``.

    n=1 is word-set semantics; n>=2 are classic shingles. Narrow
    (explode) except the final distinct.
    """
    if n == 1:
        # post-explode filter keeps the hot path in codegen
        return (
            docs.select(
                F.col(doc_col).alias("doc_id"),
                F.explode(F.split(F.col(text_col), r"\s+")).alias("shingle"),
            )
            .filter(F.col("shingle") != "")
            .distinct()
        )
    # Materialize the token array as a named column FIRST: referencing
    # the filter(split(...)) expression from inside the transform lambda
    # re-evaluates it per window position (no CSE across higher-order
    # functions — measured 4x slower when inlined).
    arr = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    toks = docs.select(F.col(doc_col).alias("doc_id"), arr.alias("toks"))
    # slice is 1-based; sequence end is inclusive -> size-n+1 starts
    sh = F.when(
        F.size("toks") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - n + 1),
            lambda i: F.array_join(F.slice("toks", i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toks.select("doc_id", F.explode(sh).alias("shingle")).distinct()


def df_capped_shingles(sh: DataFrame, max_df: int) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``max_df`` from a
    ``(doc_id, shingle)`` shingle table — the stop-shingle skew cap for
    the exact-recall pair scorers.

    One groupBy(shingle) + one equi-join back, both on the shingle key
    (AQE handles residual skew in the count itself — a count is cheap
    even for the hottest key; it is the PAIR join downstream that a hot
    shingle makes quadratic, and that join only ever sees df <= max_df
    keys after this filter)."""
    if max_df < 1:
        raise ValueError(f"max_df ({max_df}) must be >= 1")
    keep = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= max_df)
        .select("shingle")
    )
    return sh.join(keep, "shingle").select("doc_id", "shingle")


MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)


def _minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash coefficients (a_i, b_i), derived
    from md5 so the SQL oracle generator (same Python) embeds identical
    constants."""
    import hashlib

    def h28(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)

    return [
        (h28(f"a{i}") % (MINHASH_P - 1) + 1, h28(f"b{i}") % MINHASH_P)
        for i in range(num_hashes)
    ]


def minhash_signatures(sh: DataFrame, num_hashes: int = 16) -> DataFrame:
    """MinHash signature per doc via universal hashing over ONE md5
    base hash: h_i(s) = (a_i * base(s) + b_i) mod P, base = first 15
    md5 hex digits mod P. One shuffle; one hash evaluation per shingle
    (k salted md5s would cost k full hashes per shingle) and the
    signature mins aggregate 8-byte longs, not 32-char strings.
    a_i < 2^28, base < 2^31, so products stay far below 2^63 — the
    arithmetic is overflow-exact in both Spark and the SQL oracle.
    """
    if num_hashes < 1:
        raise ValueError(f"num_hashes ({num_hashes}) must be >= 1")
    base = F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10).cast(
        "long"
    ) % F.lit(MINHASH_P)
    staged = sh.select("doc_id", base.alias("hb"))
    aggs = [
        F.min((F.lit(a) * F.col("hb") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"h{i}")
        for i, (a, b) in enumerate(_minhash_coeffs(num_hashes))
    ]
    return staged.groupBy("doc_id").agg(*aggs)


def rowwise_minhash_signatures(
    docs: DataFrame,
    ngram: int = 5,
    num_hashes: int = 16,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """The SAME MinHash signature as ``minhash_signatures`` computed as
    PURE per-row column expressions — no explode, no groupBy, no
    shuffle: shingle array -> base-hash array -> ``array_min`` per
    coefficient. ``min`` is duplicate-insensitive, so skipping the
    shingle DISTINCT changes nothing; docs with zero shingles emit no
    row (matching the shuffle path, where they produce no shingle rows
    to aggregate).

    Exists for the STREAMING probe (streaming_minhash_probe): a
    stateless signature makes cross-batch near-dup detection a
    stream-static broadcast join with ZERO streaming state — the
    batch path keeps the explode+groupBy form because map-side partial
    aggregation beats per-row array passes when the corpus is already
    being shuffled anyway.
    """
    arr = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    toks = docs.select(F.col(doc_col).alias("doc_id"), arr.alias("__toks"))
    if ngram == 1:
        sh = F.col("__toks")
    else:
        sh = F.when(
            F.size("__toks") >= ngram,
            F.transform(
                F.sequence(F.lit(1), F.size("__toks") - ngram + 1),
                lambda i: F.array_join(F.slice("__toks", i, ngram), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
    base = F.transform(
        sh,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % F.lit(MINHASH_P),
    )
    # name the base array so the per-coefficient mins don't re-derive
    # the md5s num_hashes times (no CSE across higher-order functions)
    staged = toks.select("doc_id", base.alias("__hb")).filter(
        F.size("__hb") > 0
    )
    return staged.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(
                    F.col("__hb"),
                    lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P),
                )
            ).alias(f"h{i}")
            for i, (a, b) in enumerate(_minhash_coeffs(num_hashes))
        ],
    )


def band_buckets(
    sig: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """LSH band buckets of a signature table: ``(doc_id, band, bucket)``
    — one pass over the signatures via an inline (band, bucket) struct
    array explode (a bands-way union would recompute the signature
    aggregation per band). The bucket key is the plain joined row
    string — equality is all a bucket needs, no re-hash. Shared by the
    corpus-wide candidate join AND the incremental batch-vs-store path.
    """
    if bands <= 0 or num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must evenly divide num_hashes ({num_hashes}); "
            "a remainder would silently drop signature rows from banding"
        )
    r = num_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",", *[F.col(f"h{b * r + j}") for j in range(r)]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def lsh_bucket_candidates(
    sig: DataFrame, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Candidate pairs sharing >= 1 LSH band bucket: ``(doc_a, doc_b)``.

    With k=16, b=4 (r=4) the collision threshold is ~(1/4)^(1/4)=0.71.
    The self-join shuffles on the bucket md5 — only docs in the same
    bucket ever pair up.
    """
    buckets = band_buckets(sig, num_hashes, bands)
    other = buckets.select(
        F.col("doc_id").alias("doc_b"), "band", "bucket"
    )
    return (
        buckets.withColumnRenamed("doc_id", "doc_a")
        .join(other, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame, sh: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard over shingle sets, restricted to candidate pairs:
    ``(doc_a, doc_b, jaccard)`` with jaccard >= threshold, rounded 6.
    """
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        candidates.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_near_dups(
    docs: DataFrame,
    threshold: float = 0.5,
    ngram: int = 1,
    num_hashes: int = 16,
    bands: int = 4,
    text_col: str = "text",
    doc_col: str = "doc_id",
    materialize: bool = True,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with exact Jaccard verification.

    Recall is band-limited (standard LSH tradeoff): pairs whose
    signatures never collide in any band are not candidates. Tune
    (num_hashes, bands) to the target threshold.

    ``materialize=True`` (default) returns an eager ``localCheckpoint``
    — the shingle table is persisted for the build and released before
    returning, so repeated actions on the result never recompute the
    pipeline. The checkpoint pins executor storage that
    ``DataFrame.unpersist()`` CANNOT free; when done, call
    ``util.release_result(result)`` (after which the result is dead).
    ``materialize=False`` returns the lazy plan instead — nothing
    pinned, nothing to release, but every action replays the full
    pipeline (shingles included): the right mode when the result feeds
    exactly one write.
    """
    sh = shingles(docs, ngram, text_col, doc_col)
    if not materialize:
        sig = minhash_signatures(sh, num_hashes)
        return jaccard_verify(
            lsh_bucket_candidates(sig, num_hashes, bands), sh, threshold
        )
    sh = sh.persist()
    try:
        sig = minhash_signatures(sh, num_hashes)
        cand = lsh_bucket_candidates(sig, num_hashes, bands)
        return jaccard_verify(cand, sh, threshold).localCheckpoint(eager=True)
    finally:
        sh.unpersist()


def _shingle_pair_scores(
    docs: DataFrame,
    threshold: float,
    ngram: int,
    text_col: str,
    doc_col: str,
    score_name: str,
    score_expr,
    max_shingle_df: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Shared exact-recall pair scorer over shingle sets: candidates =
    pairs sharing at least one shingle, scored by ``score_expr(i, na,
    nb)`` (columns: intersection size and both set sizes), kept at or
    above ``threshold``. Backs both the symmetric Jaccard and the
    asymmetric containment operators so their physical shape can never
    diverge.

    Shingles are distinct per doc, so the self-join emits each
    (doc_a, doc_b) pair exactly once per shared shingle — the group
    count IS |A ∩ B|. One shingle-keyed shuffle + one pair aggregation,
    vs. the LSH path's candidates->re-join->count (which is only needed
    when candidates come from elsewhere).

    ``max_shingle_df`` is the skew cap: shingles appearing in more than
    that many documents are dropped from the shingle sets BEFORE the
    self-join — candidate volume per shingle is then bounded by
    C(max_shingle_df, 2), so one ubiquitous boilerplate shingle can no
    longer pair the whole corpus quadratically (the classic stop-shingle
    blow-up; without a cap, the self-join's hottest key is the corpus'
    hottest shingle). The cap changes SEMANTICS deterministically:
    scores become Jaccard/containment over the df-capped shingle sets
    (sizes na/nb count capped sets too), which is the standard df-cap
    approximation — a shingle shared by more than max_shingle_df docs
    carries no near-dup signal anyway. ``None`` keeps the exact
    uncapped semantics (fine when a profile shows no heavy shingles).
    """
    sh = shingles(docs, ngram, text_col, doc_col)
    if max_shingle_df is not None:
        sh = df_capped_shingles(sh, max_shingle_df)
    if materialize:
        sh = sh.persist()
    try:
        a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (
            a.join(b, "shingle")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("i"))
        )
        # sizes is one row per doc — small here, but at scale it is NOT
        # broadcastable (a row per document); AQE picks broadcast vs
        # shuffle from the measured size.
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
        nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
        score = F.round(
            score_expr(F.col("i").cast("double"), F.col("na"), F.col("nb")), 6
        )
        out = (
            inter.join(na, "doc_a")
            .join(nb, "doc_b")
            .select("doc_a", "doc_b", score.alias(score_name))
            .filter(F.col(score_name) >= threshold)
        )
        return out.localCheckpoint(eager=True) if materialize else out
    finally:
        if materialize:
            sh.unpersist()


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    ngram: int = 3,
    text_col: str = "text",
    doc_col: str = "doc_id",
    max_shingle_df: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """n-gram Jaccard dedup WITHOUT LSH: candidates = pairs sharing at
    least one shingle — exact recall for threshold > 0 when
    ``max_shingle_df`` is None. At scale pass ``max_shingle_df`` (the
    stop-shingle skew cap, see ``_shingle_pair_scores``) or use
    minhash_near_dups: an uncapped ubiquitous shingle pairs its whole
    doc list quadratically in the self-join.

    ``materialize``: see ``minhash_near_dups`` — True returns an eager
    checkpoint (release with ``util.release_result`` when done); False
    returns the lazy plan (nothing pinned, recomputes per action).
    """
    return _shingle_pair_scores(
        docs,
        threshold,
        ngram,
        text_col,
        doc_col,
        "jaccard",
        lambda i, na, nb: i / (na + nb - i),
        max_shingle_df=max_shingle_df,
        materialize=materialize,
    )


def ngram_jaccard_prefix_pairs(
    docs: DataFrame,
    threshold: float,
    ngram: int = 3,
    text_col: str = "text",
    doc_col: str = "doc_id",
    materialize: bool = True,
) -> DataFrame:
    """EXACT-recall n-gram Jaccard pairs via PREFIX FILTERING (the
    set-similarity-join literature's answer to the stop-shingle
    blow-up; cf. Bayardo et al. WWW'07 / Chaudhuri et al. ICDE'06):
    identical OUTPUT to the naive ``ngram_jaccard_pairs`` (same oracle
    SQL), but candidates come from joining only each doc's PREFIX —
    its rarest ``n - ceil(t*n) + 1`` shingles in global
    (document-frequency, shingle) order — against the full shingle
    table.

    Why recall is exact: J(A,B) >= t implies |A∩B| >= ceil(t*|A|); if
    B missed ALL of A's first ``|A| - ceil(t*|A|) + 1`` shingles, the
    intersection would fit inside A's remaining ``ceil(t*|A|) - 1`` —
    contradiction. So for every qualifying pair, EACH side's prefix
    intersects the other's full shingle set — the prefix-vs-full join
    finds the pair from both directions, and the least/greatest
    normalization collapses them to one row.

    Why it scales where the naive join explodes: prefixes hold each
    doc's RAREST shingles — a corpus-wide boilerplate shingle is
    (almost) never in any sizable doc's prefix, so the join key
    distribution is capped by rare-shingle dfs instead of the hottest
    shingle's C(df,2). Unlike ``max_shingle_df`` this changes NO
    semantics — it is the production default; the df cap remains the
    blunt fallback for adversarial inputs where even prefixes skew.

    ``ceil(t*n)`` is computed as ``ceil(t*n - 1e-9)``: float noise may
    only LENGTHEN the prefix (more candidates, same answer), never
    shorten it (which could drop pairs).
    """
    from pyspark.sql.window import Window

    sh = shingles(docs, ngram, text_col, doc_col)
    if materialize:
        sh = sh.persist()
    try:
        dfq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
        w_doc = Window.partitionBy("doc_id").orderBy("__df", "shingle")
        ranked = (
            sh.join(dfq, "shingle")
            .withColumn("__r", F.row_number().over(w_doc))
            .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
        )
        overlap_min = F.ceil(F.lit(threshold) * F.col("__n") - F.lit(1e-9))
        prefix = ranked.filter(
            F.col("__r") <= F.col("__n") - overlap_min + 1
        ).select(F.col("doc_id").alias("doc_p"), "shingle")
        other = sh.select(F.col("doc_id").alias("doc_o"), "shingle")
        cand = (
            prefix.join(other, "shingle")
            .filter(F.col("doc_p") != F.col("doc_o"))
            .select(
                F.least("doc_p", "doc_o").alias("doc_a"),
                F.greatest("doc_p", "doc_o").alias("doc_b"),
            )
            .distinct()
        )
        verified = jaccard_verify(cand, sh, threshold)
        return verified.localCheckpoint(eager=True) if materialize else verified
    finally:
        if materialize:
            sh.unpersist()


def ngram_containment_pairs(
    docs: DataFrame,
    threshold: float,
    ngram: int = 3,
    text_col: str = "text",
    doc_col: str = "doc_id",
    max_shingle_df: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """ASYMMETRIC near-dup: shingle containment ``|A∩B| / min(|A|,|B|)``
    — catches a small doc embedded in a big one (boilerplate templates,
    quote-heavy pages, page-plus-navigation wrappers), which symmetric
    Jaccard misses: a 50-shingle doc inside a 5000-shingle page has
    Jaccard ~0.01 but containment 1.0.

    Same exact-recall physical shape as ngram_jaccard_pairs (both are
    the shared ``_shingle_pair_scores`` plan; only the score expression
    differs — and both take the same ``max_shingle_df`` stop-shingle
    skew cap). Emits ``(doc_a, doc_b, containment)`` for pairs at or
    above ``threshold``, with both directional ratios folded into the
    max-containment (min-denominator) form.
    """
    return _shingle_pair_scores(
        docs,
        threshold,
        ngram,
        text_col,
        doc_col,
        "containment",
        lambda i, na, nb: i / F.least(na, nb),
        max_shingle_df=max_shingle_df,
        materialize=materialize,
    )


def incremental_minhash_dedup(
    new_docs: DataFrame,
    seen_sigs: DataFrame,
    threshold: float = 0.5,
    ngram: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    text_col: str = "text",
    doc_col: str = "doc_id",
    seen_bands: DataFrame | None = None,
    validate_bands: bool = True,
    materialize: bool = True,
) -> DataFrame:
    """Incremental NEAR-dup ingestion: a new batch against a MinHash
    SIGNATURE store — the production shape at 100 TB, where the corpus
    persists ``minhash_signatures`` output (num_hashes longs per doc),
    never shingle sets (unbounded strings per doc). The near-dup
    sibling of ``incremental_exact_dedup``. ``seen_bands`` optionally
    supplies the store's PRECOMPUTED band index (``band_buckets``
    columns ``doc_id, band, bucket`` — the layout
    ``programs.clean_corpus`` persists alongside the signatures);
    when omitted it is derived from ``seen_sigs`` on the fly. A
    persisted index keeps the probe from re-banding the whole store
    every batch — at scale it lives partitioned by (band, bucket) so
    the probe join co-locates.

    Verification is the signature Jaccard ESTIMATE — the fraction of
    equal minhash components, compared as an integer count against
    ``ceil(threshold * num_hashes)`` (pure integer logic: bit-exact in
    the SQL oracle, no float folds). Exact shingle Jaccard is
    impossible here by design: the store has no shingles, and that is
    the point — estimate-based verify is what signature stores buy.

    Returns one row per batch doc: ``(doc_id, dup_of_store,
    dup_of_batch, keep)``. A doc is ``dup_of_store`` if it shares an
    LSH band bucket with ANY stored signature and the estimate clears
    the threshold; ``dup_of_batch`` if the same holds against a
    SMALLER-id batch doc (the keep-first rule, regardless of that doc's
    own fate — it stands in for whatever it duplicates). ``keep`` =
    neither. Append the kept docs' signatures to the store for the
    next batch.

    Shuffles: one signature aggregation over the (small) batch, a band
    join against the store — bucketed on (band, bucket), so at scale
    the store lives banded on disk and the probe co-locates — and one
    component-compare join per candidate set. The store side is never
    scanned beyond its band index + the candidate signatures.

    ``validate_bands=True`` (default) guards the silent-miss failure
    mode of a supplied ``seen_bands``: an index built under DIFFERENT
    ``num_hashes``/``bands`` produces bucket strings that never equal
    this probe's, so every store candidate silently vanishes. The
    check samples ONE store doc, recomputes its ``band_buckets`` rows
    under this call's parameters (bucket = the comma-joined signature
    chunk, so it is reproducible from ``seen_sigs`` alone), and raises
    ``ValueError`` on any mismatch. Cost: two driver-side lookups of
    <= ``bands`` rows — noise next to the probe itself. This catches
    parameter drift deterministically; a TORN store commit (some docs
    signed but unbanded) only shows if the sample lands on a torn doc
    — full sigs<->bands coverage is the caller's store-integrity
    check, which ``programs.clean_corpus`` runs (and repairs) before
    every probe.

    ``materialize``: see ``minhash_near_dups`` — True (default)
    returns an eager checkpoint; release with ``util.release_result``
    when done. False returns the lazy plan (nothing pinned; each
    action recomputes the batch signatures).
    """
    import math

    if validate_bands and seen_bands is not None:
        if bands <= 0 or num_hashes % bands != 0:
            # the band_buckets divisibility error, raised HERE first:
            # a truncated r would build a wrong expected-bucket set and
            # report a misleading 'mismatched index' instead
            raise ValueError(
                f"bands ({bands}) must evenly divide num_hashes "
                f"({num_hashes}); a remainder would silently drop "
                "signature rows from banding"
            )
        r = num_hashes // bands
        sample = seen_sigs.limit(1).collect()
        if sample:
            srow = sample[0]
            expected = {
                (b, ",".join(str(srow[f"h{b * r + j}"]) for j in range(r)))
                for b in range(bands)
            }
            got = {
                (row["band"], row["bucket"])
                for row in seen_bands.filter(
                    F.col("doc_id") == srow["doc_id"]
                ).collect()
            }
            if got != expected:
                raise ValueError(
                    "seen_bands is not the band_buckets index of seen_sigs "
                    f"under num_hashes={num_hashes}, bands={bands}: sampled "
                    f"doc {srow['doc_id']!r} has index rows {sorted(got)} "
                    f"but its signature bands to {sorted(expected)}. A "
                    "mismatched index silently drops every store candidate; "
                    "rebuild it with band_buckets(seen_sigs, num_hashes, "
                    "bands) or pass seen_bands=None to derive it on the fly."
                )

    min_matches = math.ceil(num_hashes * threshold)
    sig_b = minhash_signatures(
        shingles(new_docs, ngram, text_col, doc_col), num_hashes
    ).persist()
    try:
        bb_batch = band_buckets(sig_b, num_hashes, bands)
        bb_store = (
            seen_bands
            if seen_bands is not None
            else band_buckets(seen_sigs, num_hashes, bands)
        )
        n_eq = sum(
            [
                F.when(F.col(f"h{i}") == F.col(f"s{i}"), 1).otherwise(0)
                for i in range(num_hashes)
            ],
            F.lit(0),
        )
        store_sigs = seen_sigs.select(
            F.col("doc_id").alias("store_id"),
            *[F.col(f"h{i}").alias(f"s{i}") for i in range(num_hashes)],
        )
        cand_store = (
            bb_batch.join(
                bb_store.select(
                    F.col("doc_id").alias("store_id"), "band", "bucket"
                ),
                ["band", "bucket"],
            )
            .select("doc_id", "store_id")
            .distinct()
        )
        dup_store = (
            cand_store.join(sig_b, "doc_id")
            .join(store_sigs, "store_id")
            .filter(n_eq >= min_matches)
            .select("doc_id")
            .distinct()
            .withColumn("dup_of_store", F.lit(1))
        )
        cand_batch = (
            bb_batch.join(
                bb_batch.select(
                    F.col("doc_id").alias("store_id"), "band", "bucket"
                ),
                ["band", "bucket"],
            )
            .filter(F.col("store_id") < F.col("doc_id"))
            .select("doc_id", "store_id")
            .distinct()
        )
        batch_sigs = sig_b.select(
            F.col("doc_id").alias("store_id"),
            *[F.col(f"h{i}").alias(f"s{i}") for i in range(num_hashes)],
        )
        dup_batch = (
            cand_batch.join(sig_b, "doc_id")
            .join(batch_sigs, "store_id")
            .filter(n_eq >= min_matches)
            .select("doc_id")
            .distinct()
            .withColumn("dup_of_batch", F.lit(1))
        )
        out = (
            sig_b.select("doc_id")
            .join(dup_store, "doc_id", "left")
            .join(dup_batch, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("dup_of_store", F.lit(0)).alias("dup_of_store"),
                F.coalesce("dup_of_batch", F.lit(0)).alias("dup_of_batch"),
            )
            .withColumn(
                "keep",
                (
                    (F.col("dup_of_store") == 0) & (F.col("dup_of_batch") == 0)
                ).cast("int"),
            )
        )
        return out.localCheckpoint(eager=True) if materialize else out
    finally:
        sig_b.unpersist()


def incremental_embedding_dedup(
    new_emb: DataFrame,
    seen_emb: DataFrame,
    threshold: float = 0.25,
    num_planes: int = 8,
    bands: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental SEMANTIC-dup ingestion: a new embedding batch
    against the persisted survivors' vector store —
    ``incremental_minhash_dedup``'s embedding-space sibling, closing
    the incremental family (exact fingerprints, minhash signatures,
    simhash/phash hamming stores, and now cosine). The store is the
    raw vectors (what a SemDeDup pipeline persists anyway); the probe
    sketches BOTH sides with the same deterministic md5-derived
    hyperplanes (``similarity.cosine_matches_ab`` — the property that
    makes store and batch bucket keys comparable across runs), so no
    index beyond the vectors themselves needs maintaining.

    Returns one row per batch vector, the minhash contract:
    ``(vec_id, dup_of_store, dup_of_batch, keep)`` — ``dup_of_store``
    if cosine >= ``threshold`` with ANY stored vector (banded-bucket
    candidates, exact verify), ``dup_of_batch`` if the same holds
    against a SMALLER-id batch vector (keep-first), ``keep`` =
    neither. Append the kept vectors to the store for the next batch.

    Recall is band-limited like the ops it composes (documented in
    cosine_pairs_lsh); scale shape: two banded joins, both bounded by
    realized bucket collisions, never |store| x |batch|.
    """
    from pagerank_mapreduce_implementation_spark.operators.similarity import (
        cosine_matches_ab,
        cosine_pairs_lsh,
    )

    store_hits = (
        cosine_matches_ab(
            seen_emb, new_emb, threshold, num_planes, bands, id_col, vec_col
        )
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("dup_of_store", F.lit(1))
    )
    batch_hits = (
        cosine_pairs_lsh(
            new_emb, threshold, num_planes, bands, id_col, vec_col
        )
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("dup_of_batch", F.lit(1))
    )
    return (
        new_emb.select(F.col(id_col).alias("vec_id"))
        .join(store_hits, "vec_id", "left")
        .join(batch_hits, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("dup_of_store", F.lit(0)).alias("dup_of_store"),
            F.coalesce("dup_of_batch", F.lit(0)).alias("dup_of_batch"),
        )
        .withColumn(
            "keep",
            (
                (F.col("dup_of_store") == 0) & (F.col("dup_of_batch") == 0)
            ).cast("int"),
        )
    )


# --- SimHash ----------------------------------------------------------------


def _word_hash60(col: Column) -> Column:
    """First 15 md5 hex digits as a 60-bit non-negative long — identical
    to the oracle's ``('0x' || substr(md5(w),1,15))::UBIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash(
    docs: DataFrame, text_col: str = "text", doc_col: str = "doc_id"
) -> DataFrame:
    """60-bit SimHash fingerprint per doc: ``(doc_id, simhash)``.

    Classic bit-vote: each token's hash votes +count/-count per bit
    position; bit b of the fingerprint is set iff the vote sum >= 0.
    """
    # post-explode filter (not an array-lambda): stays in codegen
    tokens = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    # Vote +/-1 per token OCCURRENCE — algebraically identical to the
    # classic +/-count per distinct word (sum of +/-1 over occurrences
    # == +/-cnt), so the (doc, word) pre-count shuffle is unnecessary.
    hashed = tokens.select("doc_id", _word_hash60(F.col("word")).alias("h"))
    # One wide aggregation (60 sum columns) instead of exploding 60 rows
    # per token — ONE shuffle total, with map-side partial aggregation
    # compacting to a row per doc per partition.
    vote_cols = [
        F.sum(
            F.when(
                F.expr(f"shiftright(h, {b})").bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1))
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    votes = hashed.groupBy("doc_id").agg(*vote_cols)
    fingerprint = sum(
        [
            F.when(F.col(f"v{b}") >= 0, F.lit(1 << b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            for b in range(SIMHASH_BITS)
        ],
        F.lit(0).cast("long"),
    )
    return votes.select("doc_id", fingerprint.alias("simhash"))


def hamming_band_pairs(
    fp: DataFrame,
    fp_col: str,
    max_hamming: int,
    chunks: int = 4,
    bits: int = SIMHASH_BITS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Hamming-banded near-dup pairs over ANY integer fingerprint
    column (SimHash text prints, perceptual image hashes, …):
    ``(doc_a, doc_b, hamming)`` for pairs at distance <= ``max_hamming``.

    Candidates come from equal ``bits/chunks``-bit chunks (pigeonhole:
    any pair with hamming <= chunks-1 shares a chunk; larger
    max_hamming trades recall, like all LSH — the SQL oracle mirrors
    the identical bucketing so parity is exact by design). Verified
    with ``bit_count(xor)``. The chunk self-join shuffles on
    (chunk, key) — never the all-pairs product; a hot bucket (many
    identical fingerprints) is AQE's skew-join case.
    """
    bits_per = bits // chunks
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.expr(f"shiftright({fp_col}, {c * bits_per})")
                .bitwiseAND(F.lit((1 << bits_per) - 1))
                .alias("key"),
            )
            for c in range(chunks)
        ]
    )
    buckets = fp.select(
        F.col(id_col).alias("doc_id"), F.col(fp_col).alias("__fp"), F.explode(chunk_structs).alias("cc")
    ).select(
        "doc_id", "__fp", F.col("cc.chunk").alias("chunk"), F.col("cc.key").alias("key")
    )
    other = buckets.select(
        F.col("doc_id").alias("doc_b"),
        F.col("__fp").alias("fp_b"),
        "chunk",
        "key",
    )
    cand = (
        buckets.select(
            F.col("doc_id").alias("doc_a"),
            F.col("__fp").alias("fp_a"),
            "chunk",
            "key",
        )
        .join(other, ["chunk", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "fp_a", "fp_b")
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def hamming_store_probe(
    fp: DataFrame,
    store_fp: DataFrame,
    fp_col: str = "phash",
    max_hamming: int = 10,
    chunks: int = 4,
    bits: int = SIMHASH_BITS,
    broadcast_store: bool = True,
) -> DataFrame:
    """Cross-probe of a batch fingerprint table against a persisted
    STORE of fingerprints — the incremental/streaming twin of
    ``hamming_band_pairs``'s self-join, factored out so the streaming
    image probe and the batch media-store program share one
    implementation. Both inputs carry ``(doc_id, <fp_col>)``; emits one
    row per batch doc with a verified match: ``(doc_id, dup_store_id,
    min_hamming)`` — the smallest matching store doc and the closest
    distance.

    Candidates come from equal ``bits/chunks``-bit chunks on BOTH
    sides (same pigeonhole recall as the self-join: any pair within
    chunks-1 Hamming is guaranteed a shared chunk), verified with
    ``bit_count(xor)``. The store's chunk index is broadcast under
    ``broadcast_store``. The store is fingerprints-only (~8 bytes +
    ids per doc, ×``chunks`` exploded), so the default holds to
    roughly the 100M-fingerprint mark under an 8 GB
    ``spark.sql.maxBroadcastTableSize``-era budget — comfortably every
    per-tenant or per-day store, but NOT a billion-doc corpus index:
    past the broadcast cap set ``broadcast_store=False`` to shuffle
    against a store bucketed on (chunk, key) instead (same plan the
    self-join uses). Stateless row-wise expressions throughout,
    which is what lets Structured Streaming run it per micro-batch
    with no state beyond the caller's final aggregation.
    """
    bits_per = bits // chunks

    def chunked(frame: DataFrame, idc: str, fpc: str, out_id: str, out_fp: str):
        structs = F.array(
            *[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.expr(f"shiftright({fpc}, {c * bits_per})")
                    .bitwiseAND(F.lit((1 << bits_per) - 1))
                    .alias("key"),
                )
                for c in range(chunks)
            ]
        )
        return frame.select(
            F.col(idc).alias(out_id),
            F.col(fpc).alias(out_fp),
            F.explode(structs).alias("cc"),
        ).select(
            out_id,
            out_fp,
            F.col("cc.chunk").alias("chunk"),
            F.col("cc.key").alias("key"),
        )

    stream_chunks = chunked(fp, "doc_id", fp_col, "doc_id", "__fp")
    store_chunks = chunked(store_fp, "doc_id", fp_col, "store_id", "fp_s")
    if broadcast_store:
        store_chunks = F.broadcast(store_chunks)
    hamming = F.bit_count(F.col("__fp").bitwiseXOR(F.col("fp_s")))
    return (
        stream_chunks.join(store_chunks, ["chunk", "key"])
        .filter(hamming <= max_hamming)
        .select("doc_id", "store_id", hamming.alias("hamming"))
        .groupBy("doc_id")
        .agg(
            F.min("store_id").alias("dup_store_id"),
            F.min("hamming").alias("min_hamming"),
        )
    )


def simhash_near_dups(
    docs: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
    text_col: str = "text",
    doc_col: str = "doc_id",
    materialize: bool = True,
) -> DataFrame:
    """SimHash near-dup pairs: ``(doc_a, doc_b, hamming)``.

    Candidates come from equal 15-bit chunks (pigeonhole: any pair with
    hamming <= chunks-1 shares a chunk; larger max_hamming trades
    recall, like all LSH). Verified with bit_count(xor) — the shared
    ``hamming_band_pairs`` machinery.

    ``materialize``: see ``minhash_near_dups`` — True (default)
    persists the fingerprint table for the band self-join and returns
    an eager checkpoint (release with ``util.release_result``); False
    returns the lazy plan, recomputing the fingerprints per action.
    """
    fp = simhash(docs, text_col, doc_col)
    if not materialize:
        return hamming_band_pairs(fp, "simhash", max_hamming, chunks, SIMHASH_BITS)
    fp = fp.persist()
    try:
        out = hamming_band_pairs(fp, "simhash", max_hamming, chunks, SIMHASH_BITS)
        return out.localCheckpoint(eager=True)
    finally:
        fp.unpersist()


def embedding_near_dup_survivors(
    docs: DataFrame,
    emb: DataFrame,
    threshold: float = 0.25,
    num_planes: int = 8,
    bands: int = 2,
    doc_col: str = "doc_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pass: drop every document whose
    embedding has cosine >= ``threshold`` with a SMALLER-id document
    (the keep-first rule of ``exact_dedup``), candidates restricted to
    banded hyperplane buckets (similarity.cosine_pairs_lsh — the
    OR-of-ANDs LSH band join, never the N^2 product).

    Returns the surviving docs rows (caller's schema preserved). The
    drop set is ONE anti-join against the distinct higher-id member of
    each near-dup pair; at 100 TB this is the standard semantic-dedup
    shape: sketch shuffle + per-bucket verify + broadcast-able drop
    list (near-dup sets are tiny relative to the corpus).

    Recall matches the LSH pass it is built on: pairs in different
    buckets are missed (documented in cosine_pairs_lsh); the SQL
    oracle mirrors the identical sketch construction, so parity is
    exact by design.

    The pair set materializes eagerly inside (cosine_pairs_lsh's
    default cadence — the sketch fold runs over the vectors once), so
    the returned survivors frame references a pinned checkpoint:
    release with ``util.release_result(survivors)`` when done (it
    walks composite plans), or let ``programs.clean_corpus``'s
    RDD-layer release handle it.
    """
    from pagerank_mapreduce_implementation_spark.operators.similarity import cosine_pairs_lsh

    pairs = cosine_pairs_lsh(
        emb,
        threshold,
        num_planes,
        bands,
        id_col=id_col,
        vec_col=vec_col,
        materialize=True,
    )
    dropped = pairs.select(F.col("vec_b").alias(doc_col)).distinct()
    # survivors keep the caller's own columns — projecting a fixed
    # schema here would break any docs frame that lacks it
    return docs.join(dropped, doc_col, "left_anti")


# --- Exact-substring (suffix-array style) runs ------------------------------


def substring_runs(
    docs: DataFrame,
    k: int = 8,
    min_len: int = 12,
    max_gram_df: int | None = None,
    text_col: str = "text",
    doc_col: str = "doc_id",
    materialize: bool = False,
) -> DataFrame:
    """Exact-substring dedup (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better"): maximal verbatim token runs of
    length >= ``min_len`` shared between document PAIRS — the dedup
    mode document-granularity fingerprints (exact_dedup), MinHash,
    SimHash, and Jaccard all miss: a 50-token boilerplate passage
    embedded in two otherwise-different documents.

    Returns ``(doc_a, doc_b, a_start, b_start, match_len)`` with
    ``doc_a < doc_b``, 0-based token starts in each doc, and
    ``match_len`` in tokens. One row per MAXIMAL run (a shared 20-token
    passage emits one length-20 row, not 13 overlapping k-gram rows).
    CAVEAT under ``max_gram_df``: the cap drops hot grams BEFORE
    pairing, so a capped gram in the middle of a shared passage splits
    that maximal run at the gram's position — the two flanks come back
    as separate (shorter) rows, and a flank that falls below
    ``min_len`` is dropped entirely. Maximality is therefore exact only
    over the df-capped gram sets (the standard stop-gram trade, same as
    ``max_shingle_df``); ``tests/test_dedup.py`` pins the split
    behavior so it stays deliberate.

    Algorithm — the distributed equivalent of the suffix-array scan,
    built from the engine's existing k-gram machinery instead of a
    monolithic suffix array (which is a single-machine data structure;
    the ES/Lee implementation shards it, this expresses the same
    semantics as three key-bounded shuffles):

    1. every doc emits its k-gram positions ``(doc_id, pos,
       md5(gram))`` — narrow explode, same shape as ``shingles``;
    2. grams meeting in a hash bucket pair up (``doc_a < doc_b``) —
       the ONE corpus-sized shuffle, keyed on the gram hash exactly
       like the shingle self-join, with the same stop-gram df cap
       (``max_gram_df``: grams in more than that many docs are dropped
       BEFORE pairing — boilerplate k-grams are the quadratic skew
       key at 100 TB, the ``max_shingle_df`` rail);
    3. adjacent hits merge into maximal runs: hits of one pair on one
       DIAGONAL (``ia - ib`` constant) at consecutive ``ia`` are the
       same underlying substring, so gaps-and-islands over
       ``(doc_a, doc_b, diag)`` — a window partitioned by pair+diag,
       candidate-volume-sized, never corpus-sized — turns each island
       of ``c`` consecutive k-grams into one run of ``c + k - 1``
       tokens.

    md5 gram hashes make step 2's key 128-bit (collisions negligible
    AND mirrored: the SQL oracle joins the identical md5, so even a
    collision would agree). ``min_len >= k`` required: runs shorter
    than k are invisible to a k-gram scan by construction.

    ``materialize=True`` persists the GRAM table for its three
    consumers (the df-cap count and both self-join sides — Catalyst
    clones equi-join diamonds into different pruned subtrees, so
    lazily the corpus is tokenized+hashed three times) and returns the
    (small) run report as a releasable eager checkpoint
    (``util.release_result``); measured 2.8 s -> 1.8 s at sf0.1. The
    default stays lazy — the one-job shape with nothing pinned; at
    memory-tight extremes the persisted gram table (tens of bytes per
    token, MEMORY_AND_DISK) is the documented trade against three
    tokenize passes.
    """
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError(f"k ({k}) must be >= 1")
    if min_len < k:
        raise ValueError(
            f"min_len ({min_len}) must be >= k ({k}): a {k}-gram scan "
            f"cannot see shared runs shorter than {k} tokens"
        )
    # named token-array column first: no CSE across higher-order
    # functions (same measured pitfall as shingles)
    arr = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    toks = docs.select(F.col(doc_col).alias("doc_id"), arr.alias("toks")).filter(
        F.size("toks") >= k
    )
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - k),
                lambda i: F.md5(F.array_join(F.slice("toks", i + 1, k), " ")),
            )
        ).alias("pos", "gh"),
    )
    if materialize:
        grams = grams.persist()
    try:
        capped = grams
        if max_gram_df is not None:
            if max_gram_df < 1:
                raise ValueError(f"max_gram_df ({max_gram_df}) must be >= 1")
            # df counts DOCS per gram (a gram repeated within one doc is
            # one df), so the cap bounds pair fan-out per gram at C(df, 2)
            hot = (
                grams.select("doc_id", "gh")
                .distinct()
                .groupBy("gh")
                .agg(F.count(F.lit(1)).alias("__df"))
                .filter(F.col("__df") > max_gram_df)
                .select("gh")
            )
            capped = grams.join(hot, "gh", "left_anti")
        hits = (
            capped.select(
                F.col("doc_id").alias("doc_a"), F.col("pos").alias("ia"), "gh"
            )
            .join(
                capped.select(
                    F.col("doc_id").alias("doc_b"), F.col("pos").alias("ib"), "gh"
                ),
                "gh",
            )
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "ia", "ib")
        )
        diag = (F.col("ia") - F.col("ib")).alias("__diag")
        w = Window.partitionBy(
            "doc_a", "doc_b", F.col("ia") - F.col("ib")
        ).orderBy("ia")
        islands = hits.select(
            "doc_a",
            "doc_b",
            diag,
            "ia",
            (F.col("ia") - F.row_number().over(w)).alias("__grp"),
        )
        runs = (
            islands.groupBy("doc_a", "doc_b", "__diag", "__grp")
            .agg(
                F.min("ia").alias("a_start"),
                (F.count(F.lit(1)) + F.lit(k - 1)).alias("match_len"),
            )
            .filter(F.col("match_len") >= min_len)
        )
        out = runs.select(
            "doc_a",
            "doc_b",
            "a_start",
            (F.col("a_start") - F.col("__diag")).alias("b_start"),
            "match_len",
        )
        return out.localCheckpoint(eager=True) if materialize else out
    finally:
        if materialize:
            grams.unpersist()


def strip_substring_runs(
    docs: DataFrame,
    k: int = 8,
    min_len: int = 12,
    max_gram_df: int | None = None,
    text_col: str = "text",
    doc_col: str = "doc_id",
    runs: DataFrame | None = None,
    materialize_runs: bool = True,
) -> DataFrame:
    """The REMOVAL step ``substring_runs`` reports for (Lee et al.
    2022 end their pipeline in deletion, not a report): cut every
    shared run's token span out of the HIGHER-id document of each pair
    (the keep-first rule every dedup operator here uses — the lower-id
    doc keeps the passage, so exactly one verbatim copy survives any
    duplicate chain a<b<c).

    Returns ``docs`` with ``text_col`` rebuilt minus the stripped
    spans plus an ``n_stripped`` token count. Documents with no spans
    pass through BYTE-identical (no whitespace canonicalization);
    stripped documents are rebuilt by single-space-joining their
    surviving tokens, in original order — the tokenized-rebuild
    convention (``substring_runs`` positions are token indices, so
    original inter-token whitespace inside a stripped doc is not
    recoverable, and normalizing it is what every public
    implementation of the paper does). Other columns ride through
    untouched — metadata like a precomputed ``n_chars`` is NOT
    recomputed.

    Overlapping spans (one doc victim to several pairs, or several
    runs on different diagonals) need no merge pass: a token is kept
    iff NO span covers it — set-union semantics via ``exists`` over
    the doc's span array, evaluated per token in one narrow pass.

    Scale shape: ``substring_runs``'s bounded shuffles + ONE span
    aggregation keyed by victim doc (candidate-volume-sized) + a
    broadcast-or-shuffle join back to the corpus; the rebuild is pure
    column expressions (filter-with-index + array_join), zero Python.
    Pass a precomputed ``runs`` frame to reuse a report you already
    paid for; it must carry this function's (k, min_len) semantics.

    ``materialize_runs`` (default True) computes the internal run
    report with ``substring_runs(materialize=True)`` — the gram table
    persists for its three consumers and the report pins as an eager
    checkpoint that the RETURNED frame references; release it with the
    surrounding program scope (``util.release_result`` on any consumer
    of this output, or ``release_persistent_rdds_since`` as
    ``clean_corpus`` does). Ignored when ``runs`` is supplied.
    """
    if runs is None:
        runs = substring_runs(
            docs,
            k,
            min_len,
            max_gram_df,
            text_col,
            doc_col,
            materialize=materialize_runs,
        )
    spans = (
        runs.select(
            F.col("doc_b").alias(doc_col),
            F.struct(
                F.col("b_start").alias("s"),
                (F.col("b_start") + F.col("match_len")).alias("e"),
            ).alias("sp"),
        )
        .groupBy(doc_col)
        .agg(F.collect_list("sp").alias("__spans"))
    )
    arr = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    staged = docs.join(spans, doc_col, "left").withColumn("__toks", arr)
    kept = F.filter(
        F.col("__toks"),
        lambda w, i: ~F.exists(
            F.col("__spans"), lambda sp: (sp["s"] <= i) & (i < sp["e"])
        ),
    )
    new_text = F.when(F.col("__spans").isNull(), F.col(text_col)).otherwise(
        F.array_join(kept, " ")
    )
    n_stripped = F.when(F.col("__spans").isNull(), F.lit(0)).otherwise(
        F.size("__toks") - F.size(kept)
    )
    out_cols = [
        new_text.alias(text_col) if c == text_col else F.col(c)
        for c in docs.columns
    ]
    return staged.select(*out_cols, n_stripped.alias("n_stripped"))


def line_dedup(
    docs: DataFrame,
    sep: str = "\n",
    min_line_chars: int = 1,
    text_col: str = "text",
    doc_col: str = "doc_id",
    key: "Callable[[Column], Column] | None" = None,
) -> DataFrame:
    """Corpus-wide repeated-LINE removal, keep-first (the CCNet /
    MassiveText boilerplate pass — Wenzek et al. 2020 deduplicate
    normalized paragraph hashes across shards to strip cookie
    banners, nav bars, and license boilerplate that whole-document
    dedup can never see).

    Splits ``text_col`` on the LITERAL separator ``sep``, keys each
    line (default: ``md5(lower(trim(line)))`` — CCNet's
    case-insensitive normalization without its digit-stripping,
    documented deviation), and keeps only the FIRST occurrence of
    each key corpus-wide, ordered by ``(doc_id, line_idx)``. Lines
    whose trimmed length is < ``min_line_chars`` are exempt: blank
    separators never collapse across the corpus. Duplicates WITHIN
    one document count too (second copy drops), matching CCNet's
    shard-global behavior.

    Returns ``docs`` with ``text_col`` rebuilt (surviving lines
    re-joined with ``sep``, original order) plus ``n_dropped_lines``.
    Documents losing no lines pass through BYTE-identical — the
    rebuild only touches victims.

    Scale shape (the ``strip_substring_runs`` contract): explode is
    narrow; ONE corpus-sized groupBy on the line key computes
    (df, first-owner) with map-side partial aggregation — skew-safe
    where a window over the key would serialize a billion-row
    boilerplate line into one task; the key join back is
    candidate-volume-bounded by AQE; per-victim drop indices
    aggregate in a second (victim-sized) shuffle; the corpus join +
    filter-with-index rebuild is pure column expressions, zero
    Python.
    """
    import re as _re

    if min_line_chars < 1:
        # 0 would admit the empty string as a dedup key: every blank
        # line in the corpus collapses into one, silently rewriting
        # documents that share no content
        raise ValueError(f"min_line_chars ({min_line_chars}) must be >= 1")
    keyfn = key or (lambda c: F.md5(F.lower(F.trim(c))))
    pat = _re.escape(sep)

    lines = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), pat)).alias("idx", "line"),
    ).filter(F.length(F.trim("line")) >= min_line_chars)
    keyed = lines.select("doc_id", "idx", keyfn(F.col("line")).alias("k"))
    # one shuffle: (df, first-owner) per key — min(struct) orders by
    # (doc_id, idx) lexicographically = the keep-first rule
    stats = keyed.groupBy("k").agg(
        F.count(F.lit(1)).alias("__df"),
        F.min(F.struct("doc_id", "idx")).alias("__first"),
    )
    dropped = (
        keyed.join(stats.filter(F.col("__df") > 1), "k")
        .filter(
            (F.col("doc_id") != F.col("__first.doc_id"))
            | (F.col("idx") != F.col("__first.idx"))
        )
        .groupBy("doc_id")
        .agg(F.collect_list("idx").alias("__drops"))
    )
    staged = docs.join(
        dropped.withColumnRenamed("doc_id", doc_col), doc_col, "left"
    ).withColumn("__lines", F.split(F.col(text_col), pat))
    kept = F.filter(
        F.col("__lines"),
        lambda ln, i: ~F.array_contains(F.col("__drops"), i),
    )
    new_text = F.when(F.col("__drops").isNull(), F.col(text_col)).otherwise(
        F.array_join(kept, sep)
    )
    n_dropped = F.when(F.col("__drops").isNull(), F.lit(0)).otherwise(
        F.size("__drops")
    )
    out_cols = [
        new_text.alias(text_col) if c == text_col else F.col(c)
        for c in docs.columns
    ]
    return staged.select(*out_cols, n_dropped.alias("n_dropped_lines"))


def intra_doc_line_dedup(
    docs: DataFrame,
    sep: str = "\n",
    min_line_chars: int = 1,
    text_col: str = "text",
    doc_col: str = "doc_id",
    key: "Callable[[Column], Column] | None" = None,
) -> DataFrame:
    """WITHIN-document repeated-line removal, keep-first —
    ``line_dedup``'s intra-doc sibling (the RefinedWeb / C4 pass that
    strips a page's own repeated nav rows, chorus lines, and
    copy-pasted paragraphs WITHOUT consulting the rest of the corpus;
    Penedo et al. 2023 run exactly this before any corpus-global
    pass). Same key convention (``md5(lower(trim(line)))``), same
    ``min_line_chars`` exemption (blank separators never collapse),
    same contract: ``docs`` with ``text_col`` rebuilt (surviving
    lines re-joined with ``sep``, original order — documents losing
    no lines pass through BYTE-identical) plus ``n_dropped_lines``.

    Scale shape — the whole point of having it beside ``line_dedup``:
    **zero shuffle**. The dedup decision needs only the document's own
    lines, so the entire pass is higher-order array expressions
    (split -> per-line keys -> keep iff ``array_position`` of my key
    is my own index) inside one narrow projection; at 100 TB this is
    a map-only scan while ``line_dedup`` pays a corpus-sized groupBy.
    Keys exist only inside the per-row expression — no exploded
    intermediate, no Python.
    """
    import re as _re

    if min_line_chars < 1:
        # 0 would admit the empty string as a dedup key: every run of
        # consecutive blank lines would silently collapse to one
        raise ValueError(f"min_line_chars ({min_line_chars}) must be >= 1")
    keyfn = key or (lambda c: F.md5(F.lower(F.trim(c))))
    pat = _re.escape(sep)

    lines = F.split(F.col(text_col), pat, -1)
    staged = docs.withColumn("__lines", lines).withColumn(
        "__keys",
        F.transform(
            F.col("__lines"),
            lambda ln: F.when(
                F.length(F.trim(ln)) >= min_line_chars, keyfn(ln)
            ),
        ),
    )
    # keep line i iff exempt (null key) or the FIRST occurrence of its
    # key is i itself (array_position is 1-based and skips nulls)
    kept = F.filter(
        F.col("__lines"),
        lambda ln, i: F.get(F.col("__keys"), i).isNull()
        | (
            F.array_position(F.col("__keys"), F.get(F.col("__keys"), i))
            == i + 1
        ),
    )
    n_dropped = F.size("__lines") - F.size(kept)
    new_text = F.when(n_dropped == 0, F.col(text_col)).otherwise(
        F.array_join(kept, sep)
    )
    out_cols = [
        new_text.alias(text_col) if c == text_col else F.col(c)
        for c in docs.columns
    ]
    return staged.select(*out_cols, n_dropped.alias("n_dropped_lines"))


def semdedup(
    docs: DataFrame,
    emb: DataFrame,
    n_cells: int = 8,
    threshold: float = 0.95,
    n_iters: int = 2,
    keep_rule: str = "min_id",
    doc_col: str = "doc_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup by k-means-cluster-
    bounded cosine comparison. Cluster the embeddings (Lloyd,
    bit-deterministic ``exact_mean`` centroids), compare vectors only
    WITHIN their cluster, and drop one member of every pair with
    cosine >= ``threshold``:

    - ``keep_rule="min_id"`` (default): the higher id drops — the
      keep-first rule every dedup operator here uses.
    - ``keep_rule="centroid_far"``: the member CLOSER to its centroid
      drops (ties: higher id) — the paper's rule; keeping low-
      centroid-similarity examples preserves cluster-edge diversity.

    Returns the surviving ``docs`` rows, caller's schema preserved
    (the ``embedding_near_dup_survivors`` contract — ids in ``emb``'s
    ``id_col`` name ``docs``' ``doc_col``).

    Scale shape — the paper's point re-expressed in Spark terms:
    clustering REPLACES the quadratic all-pairs product with per-cell
    products of ~(N/n_cells)^2 / 2 candidates, tuned by ``n_cells``
    (their 100M-scale runs use k=50k; cells just need to fit a task).
    Centroids are a driver-side dim table broadcast into ONE narrow
    assignment fold (``ivf_assign`` — no shuffle); the only shuffle is
    the cell-keyed self-join, AQE-split when a cell skews; the drop
    set is distinct victim ids — tiny, broadcast into the final
    anti-join. Recall caveat (documented, inherent to the method): a
    pair STRADDLING two cells is never compared; raise ``n_iters`` /
    choose ``n_cells`` by corpus geometry to taste.

    Wide embeddings (1k+ dims): compose with
    ``embeddings.pca_project`` / ``embeddings.truncate_embeddings``
    first (rename ``proj`` to the ``vec_col`` name) — every per-cell
    cosine and the assignment fold shrink by dims/d while SemDeDup's
    cluster geometry is preserved by construction.
    """
    from pagerank_mapreduce_implementation_spark.operators.similarity import (
        _dot,
        _norm,
        ivf_assign,
        lloyd_centroids,
    )

    if keep_rule not in ("min_id", "centroid_far"):
        raise ValueError(
            f"unknown keep_rule {keep_rule!r}: expected min_id or centroid_far"
        )
    if not (0.0 < threshold <= 1.0):
        # <=0 admits every within-cell pair: the anti-join then drops
        # all but one doc per cell — a corpus wipe, not a dedup
        raise ValueError(f"threshold ({threshold}) must be in (0, 1]")

    cents = lloyd_centroids(
        emb, n_cells, n_iters, id_col, vec_col, exact_mean=True
    )
    cents_df, assign = ivf_assign(emb, n_cells, id_col, vec_col, centroids=cents)
    side = assign.select(
        "vec_id", "cell_id", "vec", _norm(F.col("vec")).alias("vnorm")
    )
    if keep_rule == "centroid_far":
        # each row's cosine to its OWN centroid (broadcast dim join)
        side = side.join(F.broadcast(cents_df), "cell_id").select(
            "vec_id",
            "cell_id",
            "vec",
            "vnorm",
            (
                _dot(F.col("vec"), F.col("cvec"))
                / (F.col("vnorm") * F.col("cnorm"))
            ).alias("ccos"),
        )
    side = side.persist()
    try:
        a = side.select(
            F.col("cell_id"),
            F.col("vec_id").alias("id_a"),
            F.col("vec").alias("va"),
            F.col("vnorm").alias("na"),
            *([F.col("ccos").alias("ccos_a")] if keep_rule == "centroid_far" else []),
        )
        b = side.select(
            F.col("cell_id"),
            F.col("vec_id").alias("id_b"),
            F.col("vec").alias("vb"),
            F.col("vnorm").alias("nb"),
            *([F.col("ccos").alias("ccos_b")] if keep_rule == "centroid_far" else []),
        )
        pairs = (
            a.join(b, "cell_id")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn(
                "cos", _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            )
            .filter(F.col("cos") >= threshold)
        )
        if keep_rule == "centroid_far":
            victim = (
                F.when(F.col("ccos_a") > F.col("ccos_b"), F.col("id_a"))
                .when(F.col("ccos_b") > F.col("ccos_a"), F.col("id_b"))
                .otherwise(F.greatest("id_a", "id_b"))
            )
        else:
            victim = F.col("id_b")
        dropped = (
            pairs.select(victim.alias(doc_col))
            .distinct()
            .localCheckpoint(eager=True)
        )
    finally:
        side.unpersist()
    return docs.join(F.broadcast(dropped), doc_col, "left_anti")


# --- content-defined chunking (CDC) ----------------------------------------

CDC_POLY_BASE = 8191
CDC_POLY_MOD = 1_000_000_007


def cdc_chunks(
    docs: DataFrame,
    window: int = 3,
    divisor: int = 16,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking at token granularity — the LBFS/Rabin
    split (Muthitacharoen et al. 2001) that storage dedup and
    incremental-crawl pipelines use: ``(doc_id, chunk_idx, chunk_hash,
    n_tokens)``.

    A position ``p`` (1-based, ``p >= window``) is a cut point iff the
    polynomial rolling hash of the ``window`` tokens ending at ``p`` —
    ``(sum_j th[p-j] * BASE^j) mod M``, ``th`` the md5 60-bit word hash
    mod M — is divisible by ``divisor``; the document end is always a
    boundary. Chunks are the token runs between consecutive
    boundaries, hashed by ``md5`` of their space-joined tokens.
    Because a cut depends only on the ``window`` tokens ending at it
    (the pure CDC form, no min/max clamp), an insertion or deletion
    re-chunks only its neighborhood — the boundary-shift immunity
    fixed-size blocks lack, and the reason chunk-level dedup of an
    incremental crawl stays incremental. Expected chunk length is
    ``divisor`` tokens; production CDC adds min/max clamps, which
    serialize the cut decision (each cut depends on the previous one)
    — the documented escalation, not the default.

    Scale shape: per-doc array expressions only — tokenize, one
    ``transform`` for token hashes, one ``filter`` over positions for
    cut points, one indexed ``transform`` for chunk spans, then a
    narrow ``explode``. ZERO shuffles in this operator; downstream
    dup-counting (``cdc_dup_stats``) adds the one chunk-key shuffle
    that is the point of chunking. The token-hash array is staged in
    its own projection so the position lambda indexes a materialized
    array instead of re-evaluating the hash subtree per element (the
    HOF re-evaluation pitfall measured on gopher_repetition).
    """
    if window < 1:
        raise ValueError(f"window ({window}) must be >= 1")
    if divisor < 1:
        raise ValueError(f"divisor ({divisor}) must be >= 1")
    B, M = CDC_POLY_BASE, CDC_POLY_MOD

    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    t = docs.select(
        F.col(doc_col).alias("doc_id"), toks.alias("toks")
    ).filter(F.size("toks") > 0)
    t = t.select(
        "doc_id",
        "toks",
        F.size("toks").alias("n"),
        F.transform("toks", lambda x: _word_hash60(x) % M).alias("th"),
    )

    def rolling(p: Column) -> Column:
        # (sum_{j<window} th[p-j] * B^j) mod M; each term is bounded by
        # (M-1)*B^(window-1) so the BIGINT sum never overflows for
        # window <= 3 at these constants
        acc = F.lit(0).cast("long")
        for j in range(window):
            acc = acc + F.element_at(F.col("th"), p - j) * F.lit(B**j)
        return acc % M

    cuts = F.when(
        F.col("n") >= window,
        F.filter(
            F.sequence(F.lit(window), F.col("n")),
            lambda p: rolling(p) % divisor == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    # cuts are ascending and n is the maximum, so distinct keeps order
    bounds = F.array_distinct(F.concat(cuts, F.array(F.col("n"))))
    t = t.select("doc_id", "toks", bounds.alias("bounds"))

    def span(b: Column, j: Column) -> Column:
        start = F.when(j == 0, F.lit(1)).otherwise(
            F.element_at(F.col("bounds"), j) + 1
        )
        piece = F.slice(F.col("toks"), start, b - start + 1)
        return F.struct(
            (j + 1).alias("chunk_idx"),
            F.md5(F.array_join(piece, " ")).alias("chunk_hash"),
            (b - start + 1).cast("long").alias("n_tokens"),
        )

    return t.select(
        "doc_id", F.explode(F.transform("bounds", span)).alias("c")
    ).select("doc_id", "c.chunk_idx", "c.chunk_hash", "c.n_tokens")


def cdc_dup_stats(
    docs: DataFrame,
    window: int = 3,
    divisor: int = 16,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Per-document chunk-level duplication profile over the CDC
    split: ``(doc_id, n_chunks, n_tokens, dup_chunks, dup_tokens,
    dup_token_frac)`` — ``dup_*`` counting chunks whose content hash
    occurs more than once corpus-wide (either in another document or
    repeated within this one). The chunk-mass fraction is the
    incremental-crawl read: how much of this document's content the
    corpus already stores under CDC.

    Two shuffles, both key-bounded: one groupBy on ``chunk_hash``
    (map-side partial agg — skew-safe where a window over the hash
    would serialize a boilerplate mega-chunk into one task), whose
    occurrence counts join back candidate-bounded under AQE, then the
    per-doc rollup on ``doc_id``.
    """
    ch = cdc_chunks(
        docs,
        window=window,
        divisor=divisor,
        text_col=text_col,
        doc_col=doc_col,
    )
    occ = ch.groupBy("chunk_hash").agg(F.count(F.lit(1)).alias("occ"))
    dup = F.col("occ") > 1
    return (
        ch.join(occ, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum(F.when(dup, 1).otherwise(0)).alias("dup_chunks"),
            F.sum(F.when(dup, F.col("n_tokens")).otherwise(0)).alias(
                "dup_tokens"
            ),
            F.round(
                F.sum(F.when(dup, F.col("n_tokens")).otherwise(0))
                / F.sum("n_tokens").cast("double"),
                6,
            ).alias("dup_token_frac"),
        )
    )


def cluster_winners(members: DataFrame) -> DataFrame:
    """Quality-argmax per cluster → ``(cluster_id, __keeper)`` from a
    ``(doc_id, cluster_id, quality)`` membership frame — the ONE
    definition of the survivor rule (highest quality, ties to the
    smallest doc_id) shared by ``cluster_survivors`` and
    ``programs.clean_corpus(survivor_policy="quality")``. ``min_by``
    over the ``(-quality, doc_id)`` struct: no window, so a
    mega-cluster's members never serialize through one task's sort."""
    return members.groupBy("cluster_id").agg(
        F.min_by(
            "doc_id", F.struct((-F.col("quality")).alias("nq"), "doc_id")
        ).alias("__keeper")
    )


def cluster_survivors(
    docs: DataFrame,
    threshold: float = 0.5,
    ngram: int = 5,
    doc_col: str = "doc_id",
) -> DataFrame:
    """The dedup DECISION table — per document: which near-dup cluster
    it belongs to, which cluster member survives, and whether this row
    is the survivor → ``(doc_id, cluster_id, survivor_id, keep)``.

    Pipeline: MinHash+LSH near-dup pairs (``minhash_near_dups``) →
    transitive closure into clusters (``connected_components``,
    alternating large/small-star — O(log^2 n) rounds regardless of
    cluster diameter) → survivor = the member with the highest
    ``textstats.quality_scores`` quality, ties to the smallest doc_id
    (a total order, so the choice is reproducible and cross-engine
    exact). Deduplication keeps the BEST copy, not an arbitrary one —
    near-dup clusters mix clean originals with boilerplate-wrapped
    mirrors, and survivor policy is where that quality is won or lost
    (Lee et al. 2022 "Deduplicating Training Data Makes Language
    Models Better" leaves survivor choice open; quality-argmax is the
    production default). Singleton documents cluster with themselves
    and survive.

    Scale shape: pairs/CC are the audited ``dedup_clusters`` plan;
    the survivor step adds one doc-bounded quality pass (zero-shuffle
    column exprs), one doc-bounded left join onto the cluster map,
    and one cluster-keyed ``min_by`` argmax with map-side partial
    aggregation — no window, so a mega-cluster's members never
    serialize through a single task's sort.
    """
    from pagerank_mapreduce_implementation_spark.operators import graph as _graph
    from pagerank_mapreduce_implementation_spark.operators import textstats as _ts

    pairs = minhash_near_dups(
        docs, threshold=threshold, ngram=ngram, doc_col=doc_col
    ).select("doc_a", "doc_b")
    comp = _graph.connected_components(pairs, "doc_a", "doc_b", algorithm="star")
    quality = _ts.quality_scores(docs, doc_col=doc_col, score_only=True).select(
        F.col("doc_id"), F.col("quality")
    )
    membered = (
        docs.select(F.col(doc_col).alias("doc_id"))
        .join(comp.withColumnRenamed("vertex", "doc_id"), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("component", F.col("doc_id")).alias("cluster_id")
        )
        .join(quality, "doc_id")
    )
    winners = cluster_winners(membered).withColumnRenamed(
        "__keeper", "survivor_id"
    )
    return (
        membered.join(winners, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "survivor_id",
            (F.col("doc_id") == F.col("survivor_id")).alias("keep"),
        )
    )


def edit_verified_dups(
    docs: DataFrame,
    max_dist: int = 20,
    threshold: float = 0.5,
    ngram: int = 5,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Edit-distance-VERIFIED near-duplicates → ``(doc_a, doc_b,
    edit_dist)``: MinHash+LSH candidate pairs re-checked with the
    exact Levenshtein distance, keeping pairs within ``max_dist``
    edits. The candidate/verify split of a production fuzzy-dedup
    pass: the sketch (Jaccard over shingles) is cheap but
    order-insensitive — two docs built from the same sentences in a
    different order pass it — while edit distance certifies
    character-level SEQUENCE similarity; running it only on the
    LSH-bounded candidate list is what makes the O(len_a·len_b)
    kernel affordable.

    Scale shape: candidates are the audited ``minhash_near_dups``
    banded plan (never all-pairs); the verify step is two doc-bounded
    joins to fetch texts plus a per-pair compute with NO further
    shuffle. The ``max_dist`` bound is pushed INTO the kernel
    (``levenshtein(a, b, threshold)`` — Ukkonen banding, O(max_dist ·
    len) instead of O(len^2), returning -1 past the bound), so a
    mismatched candidate pair costs the band, not the full matrix.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist ({max_dist}) must be non-negative")
    pairs = minhash_near_dups(
        docs, threshold=threshold, ngram=ngram, text_col=text_col, doc_col=doc_col
    ).select("doc_a", "doc_b")
    texts = docs.select(
        F.col(doc_col).alias("doc_id"), F.col(text_col).alias("__t")
    )
    return (
        pairs.join(
            texts.select(
                F.col("doc_id").alias("doc_a"), F.col("__t").alias("__ta")
            ),
            "doc_a",
        )
        .join(
            texts.select(
                F.col("doc_id").alias("doc_b"), F.col("__t").alias("__tb")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("__ta", "__tb", threshold=int(max_dist)).alias(
                "edit_dist"
            ),
        )
        .filter(F.col("edit_dist") >= 0)
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer-Wilkerson-Aiken 2003,
    the MOSS scheme) — ``(doc_id, pos, fp)``: over the lowercased,
    whitespace-stripped text, hash every character ``k``-gram (the
    shared 60-bit md5 convention — first 15 hex chars — so the DuckDB
    oracle is bit-exact), slide a window of ``w`` consecutive hashes,
    keep the RIGHTMOST minimal hash of each window (simple winnowing),
    and emit the distinct selected (position, hash) pairs. The
    guarantee that makes it the classic partial-overlap detector: any
    shared substring of length ``k + w - 1`` or more yields at least
    one shared fingerprint, while only ~2/(w+1) of all grams are kept.
    Docs shorter than ``k + w - 1`` characters emit nothing (no full
    window).

    ONE Arrow-batched ``mapInPandas`` pass, zero shuffle — the
    justified-Python case (the BPE-piece precedent): the selection is
    expressible as nested higher-order column functions, but lambdas
    never enter codegen and the interpreter costs ~2 us per elementary
    step — measured 11-17 s for 5k docs at sf0.1 across three
    expression formulations (per-window struct folds, native
    array_min/array_position over slices, one streaming aggregate),
    with the optimizer additionally DISSOLVING lambda-variable
    bindings of the hash array (``transform(array(X), H -> ...)[0]``
    inlines X into every reference — the md5 transform appeared 3x in
    the optimized plan, turning the pass O(chars x w) hashes). The
    Arrow pass computes the identical md5 ints in hashlib and the
    window argmins vectorized in numpy (~10x the best expression
    form). Round 12 batched the kernel itself (r11 verdict item 5):
    md5 runs once per DISTINCT gram in the Arrow batch (np.unique over
    void-viewed byte windows + a cross-batch digest cache — natural
    text repeats k-grams ~200x at k=5) and the window argmin/dedupe
    sweep runs ONCE per batch over a sentinel-separated hash stream
    instead of once per doc — measured 2.1-3.3x on the sf0.1 corpus
    (2.29 s -> 0.70 s warm kernel; A/B in BASELINE.md), bit-identical
    output. Selections are deduped by position adjacency — the
    selected position is non-decreasing across windows (window j+1
    starts one later, so its rightmost minimum never sits left of
    window j's), so equal selections are always contiguous.
    """
    if k < 1 or w < 1:
        raise ValueError(f"k ({k}) and w ({w}) must be >= 1")
    id_type = docs.schema[doc_col].dataType.simpleString()

    def _select(batches):
        import hashlib
        import re as _re

        import numpy as np
        import pandas as pd
        from numpy.lib.stride_tricks import sliding_window_view

        # ASCII \s, matching the Java-regex/RE2 whitespace convention
        # the engine's expression ops and the DuckDB oracle use — the
        # default Unicode-aware \s would strip NBSP/U+2028-style chars
        # only on this side, silently breaking the bit-exact oracle
        # contract on non-ASCII corpora (round-11 advice)
        ws_re = _re.compile(r"\s+", _re.ASCII)
        # gram-digest cache, shared across the whole Arrow batch
        # stream: natural text repeats k-grams heavily (~2-10x at k=5),
        # so hashing each DISTINCT gram once replaces the dominant
        # per-position md5 with a dict hit (A/B in BASELINE.md).
        # Size-capped (round-12 advice): the ~200x repeat ratio is
        # corpus-specific — a high-entropy partition (random-ish text)
        # grows the dict with every distinct gram, so past the cap the
        # cache resets rather than OOM the Python worker; the per-batch
        # np.unique dedup below already carries most of the win.
        cache: dict = {}
        _CACHE_CAP = 2_000_000  # ~(k+~80B)/entry -> low hundreds of MB

        def _fp(gb: bytes) -> int:
            v = cache.get(gb)
            if v is None:
                if len(cache) >= _CACHE_CAP:
                    cache.clear()
                v = int.from_bytes(hashlib.md5(gb).digest()[:8], "big") >> 4
                cache[gb] = v
            return v

        empty = pd.DataFrame(
            {"doc_id": [], "pos": [], "fp": []},
            columns=["doc_id", "pos", "fp"],
        ).astype({"pos": "int64", "fp": "int64"})

        for pdf in batches:
            # pass 1 (the only per-doc Python): strip/lower/encode and
            # stage each doc's gram windows as a C-contiguous void view
            dids: list = []
            ms: list = []
            grams: list = []
            slow_h: dict = {}
            for did, txt in zip(pdf["doc_id"], pdf["__t"]):
                ch = ws_re.sub("", txt or "").lower()
                m = len(ch) - k + 1
                if m < w:
                    continue
                b = ch.encode("utf-8")
                if len(b) == len(ch):
                    # ASCII: byte k-grams == char k-grams
                    win8 = sliding_window_view(
                        np.frombuffer(b, dtype=np.uint8), k
                    )
                    grams.append(
                        np.ascontiguousarray(win8)
                        .view(np.dtype((np.void, k)))
                        .ravel()
                    )
                else:
                    # multi-byte chars: byte windows would split code
                    # points — char-slice per position; the gram cache
                    # still collapses repeats
                    slow_h[len(dids)] = np.fromiter(
                        (_fp(ch[i : i + k].encode("utf-8")) for i in range(m)),
                        dtype=np.int64,
                        count=m,
                    )
                    grams.append(None)
                dids.append(did)
                ms.append(m)
            if not dids:
                yield empty
                continue
            # pass 2: ONE np.unique over every ASCII gram in the batch
            # dedupes before hashing (k-grams of natural text repeat
            # ~200x at k=5 on the sf0.1 corpus: 1.2M grams, 5.5k
            # distinct), so md5 runs per DISTINCT gram; inverse indices
            # restore the per-position hash stream bit-identically
            fast = [g for g in grams if g is not None]
            if fast:
                uniq, inv = np.unique(np.concatenate(fast), return_inverse=True)
                vals = np.fromiter(
                    (_fp(u.tobytes()) for u in uniq),
                    dtype=np.int64,
                    count=len(uniq),
                )
                allh = vals[inv]
            # pass 3: winnow EVERY doc in one numpy sweep — docs are
            # concatenated with w-1 sentinel hashes of -1 between them;
            # -1 always wins the window min (real hashes are 60-bit
            # non-negative), so a window is intra-doc iff its min >= 0
            marr = np.asarray(ms, dtype=np.int64)
            seg = marr + (w - 1)
            stream = np.full(int(seg.sum()), -1, dtype=np.int64)
            starts = np.concatenate(([0], np.cumsum(seg)[:-1]))
            off = 0
            for i in range(len(dids)):
                m = int(marr[i])
                if grams[i] is None:
                    stream[starts[i] : starts[i] + m] = slow_h[i]
                else:
                    stream[starts[i] : starts[i] + m] = allh[off : off + m]
                    off += m
            win = sliding_window_view(stream, w)
            mins = win.min(axis=1)
            valid = mins >= 0
            # rightmost minimum: first hit in the reversed window
            right = (w - 1) - np.argmax(win[:, ::-1] == mins[:, None], axis=1)
            gpos = np.arange(len(mins), dtype=np.int64) + right
            widx = np.flatnonzero(valid)
            dofw = np.searchsorted(starts, widx, side="right") - 1
            pos = gpos[valid] - starts[dofw]
            fpv = mins[valid]
            # adjacent dedupe: the selected position is non-decreasing
            # within a doc, so equal selections are contiguous
            keep = np.empty(len(pos), dtype=bool)
            if len(pos):
                keep[0] = True
                keep[1:] = (pos[1:] != pos[:-1]) | (dofw[1:] != dofw[:-1])
            sel = dofw[keep]
            # doc_id keeps the caller's id values untouched — its Arrow
            # type comes from the schema string below, so string/int ids
            # both work (round-11 advice: the int64 coercion here made
            # this the one id-type-bound dedup operator)
            dindex = np.asarray(dids, dtype=object)
            yield pd.DataFrame(
                {
                    "doc_id": dindex[sel],
                    "pos": pos[keep],
                    "fp": fpv[keep],
                },
                columns=["doc_id", "pos", "fp"],
            ).astype({"pos": "int64", "fp": "int64"})

    staged = docs.select(F.col(doc_col).alias("doc_id"), F.col(text_col).alias("__t"))
    return staged.mapInPandas(_select, f"doc_id {id_type}, pos long, fp long")


def winnow_matches(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_fp_df: int | None = None,
    text_col: str = "text",
    doc_col: str = "doc_id",
    normalize: bool = False,
) -> DataFrame:
    """Document pairs sharing winnowing fingerprints —
    ``(doc_a, doc_b, shared)`` with ``shared >= min_shared`` distinct
    common fingerprints: the MOSS partial-overlap report (catches a
    copied PASSAGE inside otherwise different docs, which whole-doc
    similarity dilutes away). ``max_fp_df`` drops fingerprints
    appearing in more than that many docs BEFORE pairing — the
    stop-gram cap, same contract as ``substring_runs``'s
    ``max_gram_df``/``video_near_dups``'s ``max_frame_df``.

    Scale shape: the proven shared-hash-set plan (ngram-jaccard /
    video frame silhouette) — fingerprint inventory is zero-shuffle,
    the self-join is keyed on ``fp`` with per-fp candidates bounded by
    C(df_cap, 2), and the pair count is one groupBy with map-side
    partials. ``normalize=True`` adds the MOSS report's percent
    overlap per side — ``sim_x = shared / |fingerprints(doc_x)|``
    (rounded 6) over the same df-capped sets the join used — via two
    doc-bounded total joins.
    """
    if min_shared < 1:
        raise ValueError(f"min_shared ({min_shared}) must be >= 1")
    fps = (
        winnow_fingerprints(docs, k=k, w=w, text_col=text_col, doc_col=doc_col)
        .select("doc_id", "fp")
        .distinct()
    )
    if max_fp_df is not None:
        if max_fp_df < 2:
            raise ValueError(f"max_fp_df ({max_fp_df}) must be >= 2")
        dfc = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__df"))
        fps = fps.join(
            dfc.filter(F.col("__df") <= max_fp_df).select("fp"), "fp"
        )
    a = fps.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fps.select(F.col("doc_id").alias("doc_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    if not normalize:
        return pairs
    # MOSS-style percent overlap: shared / |fingerprints(doc)| per
    # side, over the SAME (possibly df-capped) fingerprint sets the
    # join used — doc-bounded totals, one broadcastable join per side
    tot = fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("__tot"))
    return (
        pairs.join(tot.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("__tot", "__ta")
        .join(tot.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared",
            F.round(F.col("shared") / F.col("__ta"), 6).alias("sim_a"),
            F.round(F.col("shared") / F.col("__tot"), 6).alias("sim_b"),
        )
    )


def dedup_report(
    docs: DataFrame,
    threshold: float = 0.5,
    ngram: int = 5,
    group_col: str = "source",
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-source mass accounting of the dedup DECISION —
    ``(source, n_docs, n_kept, tokens_total, tokens_kept, drop_rate)``:
    what ``cluster_survivors``' keep/drop verdict actually costs each
    source, in documents and in whitespace tokens. This is the report
    a pipeline reads after a dedup pass and before re-balancing the
    mixture (a source that lost 40% of its tokens to near-dup clusters
    no longer matches its mixing weight — Lee et al. 2022's
    train-side effect surfaced as an explicit number).

    Composition, not new machinery: the verdict is the registered
    ``cluster_survivors`` plan verbatim; this adds one doc-bounded
    join (verdict is (doc_id, keep) — two narrow columns) and one
    group-keyed aggregate with map-side partials. Token counts are
    integers and ``drop_rate`` a single rounded division, so the
    oracle composes the survivors SQL with a plain GROUP BY.
    """
    verdict = cluster_survivors(docs, threshold, ngram, doc_col).select(
        F.col("doc_id"), "keep"
    )
    toks = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    ).cast("long")
    staged = docs.select(
        F.col(doc_col).alias("doc_id"), F.col(group_col), toks.alias("__nt")
    ).join(verdict, "doc_id")
    agged = staged.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
        F.sum("__nt").cast("long").alias("tokens_total"),
        F.sum(F.when(F.col("keep"), F.col("__nt")).otherwise(F.lit(0)))
        .cast("long")
        .alias("tokens_kept"),
    )
    return agged.select(
        group_col,
        "n_docs",
        "n_kept",
        "tokens_total",
        "tokens_kept",
        F.round(
            F.lit(1.0) - F.col("n_kept") / F.col("n_docs"), 6
        ).alias("drop_rate"),
    )


def _planted_twin_corpus(
    docs: DataFrame,
    drop_rate: float,
    sample_mod: int,
    salt: str,
    twin_offset: int,
    text_col: str,
    doc_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Shared truth-planting stage of the recall audits
    (``minhash_recall_report`` / ``simhash_recall_report``): every
    ``sample_mod``-th doc gets a deterministically perturbed twin
    (each word dropped on a 52-bit md5 coin keyed (salt, doc,
    position) — the ``weighted_sample`` IEEE-exact construction).
    Returns ``(planted_ids, corpus)``: the sampled originals'
    ``doc_id`` frame, and corpus + twins as ``(doc_id, __text)`` with
    twin ids shifted by ``twin_offset``."""
    if not (0.0 <= drop_rate < 1.0):
        raise ValueError(f"drop_rate ({drop_rate}) must be in [0, 1)")
    if sample_mod < 1:
        raise ValueError(f"sample_mod ({sample_mod}) must be >= 1")
    if twin_offset < 1:
        raise ValueError(f"twin_offset ({twin_offset}) must be positive")
    key = F.col(doc_col).cast("long")
    arr = F.filter(F.split(F.col(text_col), r"\s+"), lambda w: w != "")
    staged = docs.filter(key % sample_mod == 0).select(
        key.alias("doc_id"), arr.alias("__toks")
    )

    def coin(i: Column) -> Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(salt),
                            F.col("doc_id").cast("string"),
                            F.lit(":"),
                            i.cast("string"),
                        )
                    ),
                    1,
                    13,
                ),
                16,
                10,
            )
            .cast("long")
            .cast("double")
            / F.lit(float(1 << 52))
        )

    kept = F.filter(
        F.col("__toks"), lambda x, i: coin(i) >= F.lit(float(drop_rate))
    )
    # the offset lands in a SECOND select: aliasing doc_id + offset AS
    # doc_id in the same projection that evaluates the coin makes the
    # coin key on the SHIFTED id (measured — the same lateral-alias
    # hazard DuckDB has; both sides therefore shift in an outer step)
    twins = staged.select(
        "doc_id", F.array_join(kept, " ").alias("__text")
    ).select(
        (F.col("doc_id") + F.lit(int(twin_offset))).alias("doc_id"), "__text"
    )
    corpus = docs.select(key.alias("doc_id"), F.col(text_col).alias("__text")).unionAll(
        twins
    )
    return staged.select("doc_id"), corpus


def minhash_recall_report(
    docs: DataFrame,
    drop_rate: float = 0.15,
    sample_mod: int = 10,
    threshold: float = 0.3,
    ngram: int = 2,
    num_hashes: int = 16,
    bands: int = 4,
    text_col: str = "text",
    doc_col: str = "doc_id",
    salt: str = "mhrecall:",
    twin_offset: int = 1 << 40,
) -> DataFrame:
    """Recall audit of the MinHash+LSH banding — ONE row ``(n_planted,
    n_qualifying, hits, recall)`` — the ``ann_recall_report`` move for
    dedup: LSH recall is band-limited by construction, so a (bands,
    num_hashes, threshold) configuration is UNAUDITED until something
    measures how many true near-dups its bands actually surface.
    This plants the truth: every ``sample_mod``-th doc gets a
    deterministically perturbed twin (each word dropped on a 52-bit
    md5 coin at ``drop_rate`` — the ``weighted_sample`` IEEE-exact
    construction keyed on (salt, doc, position)), the full corpus +
    twins run through the EXACT registered minhash pipeline, and
    recall = found qualifying planted pairs / all qualifying planted
    pairs, where "qualifying" = planted pairs whose exact shingle
    Jaccard clears ``threshold`` (the verify stage keeps them iff the
    bands surface them — so misses are purely banding misses).

    Determinism end to end (perturbation coins, universal-hash
    signatures, band buckets, round-6 Jaccard) means the DuckDB oracle
    replays the whole audit bit-for-bit. ``doc_col`` values must be
    unique, non-negative and < ``twin_offset`` (twin ids are
    ``doc_id + twin_offset``).

    Scale shape: an EVALUATION operator — run on a sampled plant set
    (``sample_mod``), cost = one extra minhash pass over corpus +
    twins with the same banded/bucketed bounds as the production
    dedup; the shingle table is persisted once and shared by the found
    and qualifying sides, and the 1-row report comes from three tiny
    broadcast-crossed aggregates.
    """
    planted_ids, corpus = _planted_twin_corpus(
        docs, drop_rate, sample_mod, salt, twin_offset, text_col, doc_col
    )
    sh = shingles(corpus, ngram, "__text", "doc_id").persist()
    try:
        sig = minhash_signatures(sh, num_hashes)
        found = jaccard_verify(
            lsh_bucket_candidates(sig, num_hashes, bands), sh, threshold
        ).select("doc_a", "doc_b")
        planted = planted_ids.select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + F.lit(int(twin_offset))).alias("doc_b"),
        )
        qual = jaccard_verify(planted, sh, threshold).select("doc_a", "doc_b")
        hits = qual.join(found, ["doc_a", "doc_b"])
        rep = (
            planted.agg(F.count(F.lit(1)).alias("n_planted"))
            .crossJoin(
                F.broadcast(qual.agg(F.count(F.lit(1)).alias("n_qualifying")))
            )
            .crossJoin(F.broadcast(hits.agg(F.count(F.lit(1)).alias("hits"))))
            .select(
                "n_planted",
                "n_qualifying",
                "hits",
                F.when(
                    F.col("n_qualifying") > 0,
                    F.round(
                        F.col("hits").cast("double") / F.col("n_qualifying"), 6
                    ),
                )
                .otherwise(F.lit(None).cast("double"))
                .alias("recall"),
            )
        )
        return rep.localCheckpoint(eager=True)
    finally:
        sh.unpersist()


def simhash_recall_report(
    docs: DataFrame,
    drop_rate: float = 0.3,
    sample_mod: int = 10,
    max_hamming: int = 8,
    chunks: int = 4,
    text_col: str = "text",
    doc_col: str = "doc_id",
    salt: str = "shrecall:",
    twin_offset: int = 1 << 40,
) -> DataFrame:
    """Recall audit of the SimHash chunk banding — ONE row
    ``(n_planted, n_qualifying, hits, recall)`` — the
    ``minhash_recall_report`` twin for the hamming side of the dedup
    stack. The pigeonhole guarantee is exact only up to ``chunks - 1``
    differing bits; every production run at ``max_hamming >= chunks``
    (the documented "larger max_hamming trades recall" regime of
    ``simhash_near_dups``) is UNAUDITED until something measures how
    many true close pairs the equal-chunk candidates actually surface.
    This plants them: every ``sample_mod``-th doc gets the same
    deterministic word-drop twin as the minhash audit (shared
    ``_planted_twin_corpus`` construction, its own salt), corpus +
    twins run through the EXACT registered fingerprint + banding
    pipeline, and recall = found qualifying planted pairs / all
    qualifying planted pairs, where "qualifying" = planted pairs whose
    exact fingerprint hamming distance is <= ``max_hamming`` — so
    misses are purely banding misses. A twin perturbed to emptiness
    has no tokens, hence no fingerprint row, and drops out of the
    qualifying side (same contract as the minhash audit's empty-twin
    shingles).

    Determinism end to end (drop coins, md5 token hashes, integer
    votes, integer hamming) — the DuckDB oracle replays the audit
    bit-for-bit with no float anywhere. Scale shape: one extra simhash
    pass over corpus + twins (the fingerprint table is persisted and
    shared by the found and qualifying sides), banding bounded exactly
    as production, and the 1-row report from three tiny
    broadcast-crossed aggregates.
    """
    if max_hamming < 0:
        raise ValueError(f"max_hamming ({max_hamming}) must be >= 0")
    planted_ids, corpus = _planted_twin_corpus(
        docs, drop_rate, sample_mod, salt, twin_offset, text_col, doc_col
    )
    fp = simhash(corpus, "__text", "doc_id").persist()
    try:
        found = hamming_band_pairs(
            fp, "simhash", max_hamming, chunks, SIMHASH_BITS
        ).select("doc_a", "doc_b")
        planted = planted_ids.select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + F.lit(int(twin_offset))).alias("doc_b"),
        )
        qual = (
            planted.join(
                fp.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("simhash").alias("__sa"),
                ),
                "doc_a",
            )
            .join(
                fp.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("simhash").alias("__sb"),
                ),
                "doc_b",
            )
            .filter(
                F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
                <= max_hamming
            )
            .select("doc_a", "doc_b")
        )
        hits = qual.join(found, ["doc_a", "doc_b"])
        rep = (
            planted.agg(F.count(F.lit(1)).alias("n_planted"))
            .crossJoin(
                F.broadcast(qual.agg(F.count(F.lit(1)).alias("n_qualifying")))
            )
            .crossJoin(F.broadcast(hits.agg(F.count(F.lit(1)).alias("hits"))))
            .select(
                "n_planted",
                "n_qualifying",
                "hits",
                F.when(
                    F.col("n_qualifying") > 0,
                    F.round(
                        F.col("hits").cast("double") / F.col("n_qualifying"), 6
                    ),
                )
                .otherwise(F.lit(None).cast("double"))
                .alias("recall"),
            )
        )
        return rep.localCheckpoint(eager=True)
    finally:
        fp.unpersist()


def lsh_expected_recall(
    docs: DataFrame,
    configs: tuple = ((8, 2), (16, 4), (32, 8)),
    threshold: float = 0.3,
    drop_rate: float = 0.15,
    sample_mod: int = 10,
    ngram: int = 2,
    text_col: str = "text",
    doc_col: str = "doc_id",
    salt: str = "mhrecall:",
    twin_offset: int = 1 << 40,
) -> DataFrame:
    """The LSH S-curve read BEFORE committing to a banding config —
    one row per ``(num_hashes, bands)`` candidate: ``(num_hashes,
    bands, rows_per_band, n_qualifying, expected_recall,
    s50_similarity)``. ``minhash_recall_report`` measures the recall
    a config REALIZED; this predicts what each candidate config WOULD
    realize on the same planted truth, analytically — a pair with
    exact Jaccard ``s`` collides in a band of ``r`` rows with
    probability ``s^r`` and in at least one of ``b`` bands with
    ``1 - (1 - s^r)^b`` (the standard LSH amplification identity,
    Leskovec/Rajaraman/Ullman ch. 3) — so sweeping configs costs ONE
    shingle pass total, not one banding run per config.

    ``expected_recall`` = mean of that detection probability over the
    qualifying planted pairs (exact Jaccard >= ``threshold``; the same
    word-drop planting as the audits, shared ``_planted_twin_corpus``
    with the minhash salt so predicted and realized numbers describe
    the SAME truth set). ``s50_similarity`` = ``(1/b)^(1/r)``, the
    config's S-curve midpoint — where detection crosses 50%.

    Cross-engine exactness: ``s`` is the round-6 Jaccard; powers are
    UNROLLED left-associated multiplication chains (never libm pow —
    its last bit is engine-dependent); each per-pair probability is
    rounded 6 and scaled to an exact BIGINT before the mean (the
    margin_matches integer-sum trick), and ``s50`` enters both plans
    as a Python-computed literal. Scale: one shingle pass + one
    planted-pair Jaccard, then len(configs) tiny aggregates over the
    persisted sample-sized pair table.
    """
    if not configs:
        raise ValueError("configs must be non-empty")
    for nh, b in configs:
        if b < 1 or nh < 1 or nh % b != 0:
            raise ValueError(
                f"config ({nh}, {b}): bands must divide num_hashes, both >= 1"
            )
        if nh // b > 64:
            raise ValueError(
                f"config ({nh}, {b}): rows_per_band {nh // b} > 64 — the "
                "unrolled power chain is capped"
            )
    planted_ids, corpus = _planted_twin_corpus(
        docs, drop_rate, sample_mod, salt, twin_offset, text_col, doc_col
    )
    sh = shingles(corpus, ngram, "__text", "doc_id").persist()
    try:
        planted = planted_ids.select(
            F.col("doc_id").alias("doc_a"),
            (F.col("doc_id") + F.lit(int(twin_offset))).alias("doc_b"),
        )
        qual = jaccard_verify(planted, sh, threshold).persist()
        try:
            parts = []
            for nh, b in configs:
                r = nh // b
                s = F.col("jaccard")
                sr = s
                for _ in range(r - 1):
                    sr = sr * s
                miss = F.lit(1.0) - sr
                missb = miss
                for _ in range(b - 1):
                    missb = missb * miss
                p6 = F.round(F.lit(1.0) - missb, 6)
                pi = F.round(p6 * 1000000, 0).cast("long")
                s50 = round((1.0 / b) ** (1.0 / r), 6)
                parts.append(
                    qual.select(pi.alias("__pi"))
                    .agg(
                        F.count(F.lit(1)).alias("__n"),
                        F.sum("__pi").alias("__s"),
                    )
                    .select(
                        F.lit(int(nh)).alias("num_hashes"),
                        F.lit(int(b)).alias("bands"),
                        F.lit(int(r)).alias("rows_per_band"),
                        F.col("__n").cast("long").alias("n_qualifying"),
                        F.round(
                            F.try_divide(
                                F.col("__s").cast("double"),
                                F.col("__n").cast("double") * 1000000,
                            ),
                            6,
                        ).alias("expected_recall"),
                        F.lit(float(s50)).alias("s50_similarity"),
                    )
                )
            out = parts[0]
            for p in parts[1:]:
                out = out.unionAll(p)
            return out.localCheckpoint(eager=True)
        finally:
            qual.unpersist()
    finally:
        sh.unpersist()


def source_overlap(
    docs: DataFrame,
    min_shared: int = 1,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Cross-source MIRROR audit — one row per source pair sharing at
    least ``min_shared`` exact-duplicate documents: ``(source_a,
    source_b, n_shared, n_fp_a, n_fp_b, jaccard, containment_a,
    containment_b)`` with ``source_a < source_b``. Two crawls of the
    same site, a re-packaged dump, or a mirror in the source mix show
    up as a pair with high containment long before doc-level dedup
    explains WHERE the duplicate mass comes from; the source-pair view
    is what a mixture designer acts on (drop/merge a source), the
    sibling of ``zipf_fit``'s single-source health check.

    Semantics: documents are reduced to the ``exact_dedup``
    fingerprint (md5 of lowercased, whitespace-collapsed, trimmed
    text), DISTINCT per source — counts are set sizes, so
    ``jaccard = shared / (a + b - shared)`` and ``containment_x =
    shared / n_fp_x`` (the fraction of x's distinct content also in
    the other source), both rounded 6 from exact integer counts.

    Scale shape — the ``bipartite_projection`` silhouette with the
    fingerprint as the right vertex: one distinct shuffle to the
    (source, fingerprint) set, a self-join keyed on the FINGERPRINT
    whose per-key fan-out is bounded by C(|sources|, 2) — sources are
    tens, never corpus-scale, so no df cap is needed — and a
    pair-keyed count with map-side partials; the per-source totals
    join back broadcast (|sources| rows). Nothing downstream of the
    distinct scales with corpus size.
    """
    if min_shared < 1:
        raise ValueError(f"min_shared ({min_shared}) must be >= 1")
    fp = F.md5(normalize_text(F.col(text_col)))
    sfp = (
        docs.select(F.col(group_col).alias("__s"), fp.alias("__fp"))
        .distinct()
    )
    a = sfp.select(F.col("__s").alias("source_a"), "__fp")
    b = sfp.select(F.col("__s").alias("source_b"), "__fp")
    shared = (
        a.join(b, "__fp")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    cnt = sfp.groupBy("__s").agg(F.count(F.lit(1)).alias("__n"))
    ca = F.broadcast(
        cnt.select(F.col("__s").alias("source_a"), F.col("__n").alias("n_fp_a"))
    )
    cb = F.broadcast(
        cnt.select(F.col("__s").alias("source_b"), F.col("__n").alias("n_fp_b"))
    )
    sh = F.col("n_shared").cast("double")
    return (
        shared.join(ca, "source_a")
        .join(cb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_fp_a",
            "n_fp_b",
            F.round(
                sh / (F.col("n_fp_a") + F.col("n_fp_b") - F.col("n_shared")), 6
            ).alias("jaccard"),
            F.round(sh / F.col("n_fp_a"), 6).alias("containment_a"),
            F.round(sh / F.col("n_fp_b"), 6).alias("containment_b"),
        )
    )


def ngram_source_overlap(
    docs: DataFrame,
    ngram: int = 5,
    min_jaccard: float = 0.0,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """NEAR-duplicate cross-source overlap — ``source_overlap``'s
    shingle-level sibling: one row per source pair whose DISTINCT
    word-``ngram`` shingle sets overlap at all (and clear
    ``min_jaccard``): ``(source_a, source_b, n_shared, n_sh_a,
    n_sh_b, jaccard, containment_a, containment_b)``. Where the exact
    audit needs byte-identical documents, this catches partial
    mirrors — the same articles wrapped in different boilerplate, a
    re-crawl with edited headers — as a high-containment pair whose
    exact-fingerprint overlap is zero.

    Semantics: each source is reduced to its SET of distinct shingles
    (``shingles(ngram)``, whitespace-token n-grams); counts are set
    sizes, jaccard/containment the exact integer-set arithmetic of
    ``source_overlap``, rounded 6.

    Scale shape: identical to ``source_overlap`` with the shingle as
    the join key — distinct (source, shingle) is one shuffle bounded
    by |sources| x vocabulary (NOT corpus rows); the self-join's
    per-key fan-out is bounded by C(|sources|, 2) because the key's
    value set IS the source list, so the stop-shingle df cap the
    doc-level operators need does not apply; totals join back
    broadcast. At 100 TB the distinct is the operator.
    """
    if not 0.0 <= min_jaccard <= 1.0:
        raise ValueError(f"min_jaccard ({min_jaccard}) must be in [0, 1]")
    if int(ngram) < 1:
        # ngram=0 would shingle every doc into the empty string (all
        # pairs report jaccard ~1.0, silently) and negatives only blow
        # up inside the slice arithmetic — fail loud like min_jaccard
        raise ValueError(f"ngram ({ngram}) must be >= 1")
    # shingles() keys by its doc_col — keying it by the SOURCE gives
    # the per-source distinct shingle set directly (its final distinct
    # is exactly the set semantics this operator defines)
    sh = shingles(
        docs.select(F.col(group_col).alias("doc_id"), text_col), ngram
    ).select(F.col("doc_id").alias("__s"), "shingle")
    a = sh.select(F.col("__s").alias("source_a"), "shingle")
    b = sh.select(F.col("__s").alias("source_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    cnt = sh.groupBy("__s").agg(F.count(F.lit(1)).alias("__n"))
    ca = F.broadcast(
        cnt.select(F.col("__s").alias("source_a"), F.col("__n").alias("n_sh_a"))
    )
    cb = F.broadcast(
        cnt.select(F.col("__s").alias("source_b"), F.col("__n").alias("n_sh_b"))
    )
    num = F.col("n_shared").cast("double")
    return (
        shared.join(ca, "source_a")
        .join(cb, "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_sh_a",
            "n_sh_b",
            F.round(
                num / (F.col("n_sh_a") + F.col("n_sh_b") - F.col("n_shared")), 6
            ).alias("jaccard"),
            F.round(num / F.col("n_sh_a"), 6).alias("containment_a"),
            F.round(num / F.col("n_sh_b"), 6).alias("containment_b"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def source_manifest(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Per-source dataset manifest — the content-versioning primitive a
    training pipeline records beside every shard build (data cards,
    cache keys, "did anything change since the last snapshot?"):
    ``(source, n_docs, n_tokens, n_chars, content_hash, min_doc_id,
    max_doc_id)``.

    ``content_hash`` is an ORDER-INDEPENDENT multiset hash: the sum,
    mod 2^60, of each doc's 60-bit content fingerprint (first 15 md5
    hex digits of the ``normalize_text`` canonical form — the exact
    same fingerprint convention ``exact_dedup`` keys on, so two
    corpora agree on the manifest iff they agree doc-for-doc under
    exact dedup's definition of "same content"). Additive mod-2^60
    rather than a sorted concatenation because that is the 100 TB
    shape: a per-source sorted collect would single-partition each
    source's gigabytes through one string build, while the additive
    form is one map-side-combined groupBy whose partial sums are
    exact in decimal(38,0) (long would overflow at 8 docs x 2^60;
    HUGEINT on the DuckDB side) — same hash from any row order, any
    partitioning, any engine. The tradeoff is the usual multiset-hash
    one: adversarial collisions are easier than for a Merkle chain,
    fine for drift DETECTION, wrong for tamper PROOF.

    NULL text counts as the empty string (doc still counted, zero
    tokens/chars, the empty-string fingerprint in the hash) — the one
    convention that keeps both engines' aggregates identical (Spark's
    size/length would otherwise feed -1/NULL where DuckDB's sum skips
    NULLs).

    One shuffle (the groupBy), scan-bound otherwise; every per-row
    expression is JVM-side. Every aggregate is a commutative monoid,
    which is what makes ``streaming_source_manifest`` the same
    builder run in complete mode — the mod projects AFTER the agg on
    both paths (Spark cannot fold a mod into an incremental
    aggregate, and batch keeps the identical plan so the twins cannot
    drift).
    """
    return _manifest_aggregate(docs, group_col, text_col, doc_col)


def _manifest_aggregate(
    docs: DataFrame, group_col: str, text_col: str, doc_col: str
) -> DataFrame:
    """Shared body of source_manifest and its streaming twin: staged
    per-row fingerprint/counts, monoid-only groupBy, post-agg mod."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    fp60 = _word_hash60(normalize_text(txt))
    toks = tokens_null_safe(F.col(text_col))
    staged = docs.select(
        F.col(group_col).alias("source"),
        F.col(doc_col).alias("doc_id"),
        fp60.alias("_fp"),
        F.size(toks).alias("_nt"),
        F.length(txt).alias("_nc"),
    )
    return (
        staged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").cast("long").alias("n_tokens"),
            F.sum("_nc").cast("long").alias("n_chars"),
            F.sum(F.col("_fp").cast("decimal(38,0)")).alias("_hsum"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_chars",
            (F.col("_hsum") % F.lit(2**60)).cast("long").alias("content_hash"),
            "min_doc_id",
            "max_doc_id",
        )
    )


def manifest_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Snapshot comparison over two ``source_manifest`` frames — the
    consumer query the manifest exists for ("what changed since the
    last recorded snapshot?"): ``(source, status, n_docs_old,
    n_docs_new, docs_delta, tokens_delta, hash_changed)`` with
    ``status`` one of ``added`` / ``removed`` / ``changed`` /
    ``unchanged`` (changed = same source present in both whose
    content_hash moved — the multiset hash makes that the exact
    "any doc's canonical content differs or counts shifted" signal,
    up to hash collision).

    A full-outer join of two |sources|-row frames: trivially
    broadcastable at any corpus size, since the manifests are already
    the aggregated artifact. All-integer outputs — cross-engine exact
    with no rounding points.
    """
    o = old.select(
        "source",
        F.col("n_docs").alias("_do"),
        F.col("n_tokens").alias("_to"),
        F.col("content_hash").alias("_ho"),
    )
    n = new.select(
        "source",
        F.col("n_docs").alias("_dn"),
        F.col("n_tokens").alias("_tn"),
        F.col("content_hash").alias("_hn"),
    )
    j = o.join(n, "source", "full_outer")
    status = (
        F.when(F.col("_do").isNull(), F.lit("added"))
        .when(F.col("_dn").isNull(), F.lit("removed"))
        .when(F.col("_ho") != F.col("_hn"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        "source",
        status.alias("status"),
        F.col("_do").alias("n_docs_old"),
        F.col("_dn").alias("n_docs_new"),
        (F.coalesce(F.col("_dn"), F.lit(0)) - F.coalesce(F.col("_do"), F.lit(0)))
        .cast("long")
        .alias("docs_delta"),
        (F.coalesce(F.col("_tn"), F.lit(0)) - F.coalesce(F.col("_to"), F.lit(0)))
        .cast("long")
        .alias("tokens_delta"),
        F.coalesce(F.col("_ho") != F.col("_hn"), F.lit(True)).alias(
            "hash_changed"
        ),
    )
