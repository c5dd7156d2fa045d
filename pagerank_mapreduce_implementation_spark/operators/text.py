"""Text/IR pipeline: tokenize → word count → TF → TF-IDF → search → rank.

Re-expresses the reference jar's ``org.myorg.*`` pipelines (SURVEY.md
§2.2, semantics recovered by javap disassembly) as pure DataFrame
column expressions — no UDFs, fully inside WholeStageCodegen:

- O23 tokenize: the jar splits lines on ``\\s*\\b\\s*`` word boundaries
  (pagerank.jar!org/myorg/WordCount$Map.class @11). Engine default is
  whitespace splitting (equivalent on the engine's corpus and identical
  between Spark and the DuckDB oracle); ``pattern=TOKEN_BOUNDARY_RE``
  gives exact reference behavior (punctuation runs become tokens).
- O24 word count (WordCount$Map/$Reduce; the compiled map appends a
  stray " bla" dev artifact — canonical semantics are plain counts).
- O25 per-document word count, lowercased composite key
  (DocWordCount$Map.class @59-98: getInputSplit→filename, toLowerCase,
  ``word#####filename`` — here a real 2-column groupBy).
- O26 log-scaled term frequency ``1 + log10(cnt)``
  (TermFrequency$Reduce.class @48-55).
- O27 TF-IDF: ``df = #docs containing word``; ``idf = log10(1 +
  total_docs/df)``; score ``tf*idf`` (TFIDF$Reduce.class @68-210).
  ``total_docs`` is the document count (the jar used the input FILE
  count, TFIDF.class run() @37-55 — one doc per file).
- O29 search: keep tf-idf rows whose word matches a query term, sum
  scores per doc (Search$Map.class @32-89, Search$Reduce.class @28-57).
- O30 rank: descending score sort (Rank$DescendingComparator.class);
  with k, Catalyst plans TakeOrderedAndProject (no global sort).

Scale notes (100 TB posture):
- tokenize is explode(split(...)): narrow, no shuffle; codegen'd.
- the only shuffles are the groupBys on (doc_id, word) and (word); both
  get map-side partial aggregation automatically.
- the df-per-word table is tiny relative to the corpus → Catalyst/AQE
  broadcasts it into the tf join (no shuffle of the big side).
- search terms are a literal IN-list (semi-join semantics), pushed into
  the scan when reading a materialized tf-idf table.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Exact reference tokenizer (Java regex, WordCount$Map.class @11):
#: splits on word boundaries, so punctuation runs survive as tokens.
TOKEN_BOUNDARY_RE = r"\s*\b\s*"
#: Engine default: whitespace tokens (identical to the reference on
#: space-separated corpora; identical semantics in the DuckDB oracle).
TOKEN_WS_RE = r"\s+"


def tokenize(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    pattern: str = TOKEN_WS_RE,
    lowercase: bool = False,
) -> DataFrame:
    """O23: one row per token occurrence: ``(doc_id, word)``."""
    word = F.explode(F.split(F.col(text_col), pattern)).alias("word")
    out = docs.select(F.col(doc_col).alias("doc_id"), word).filter(F.col("word") != "")
    if lowercase:
        out = out.select("doc_id", F.lower("word").alias("word"))
    return out


def word_count(docs: DataFrame, **tok_kwargs) -> DataFrame:
    """O24: corpus-wide word count → ``(word, cnt)``."""
    return tokenize(docs, **tok_kwargs).groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def doc_word_count(docs: DataFrame, **tok_kwargs) -> DataFrame:
    """O25: per-document lowercased word count → ``(doc_id, word, cnt)``.

    The reference packs ``lower(word)#####filename`` into one key
    (DocWordCount$Map.class @96); the engine groups by two real columns.
    """
    tok_kwargs.setdefault("lowercase", True)
    return (
        tokenize(docs, **tok_kwargs)
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def term_frequency(docs: DataFrame, **tok_kwargs) -> DataFrame:
    """O26: log-scaled TF ``wf = 1 + log10(cnt)`` → ``(doc_id, word, tf)``."""
    return doc_word_count(docs, **tok_kwargs).select(
        "doc_id", "word", (F.lit(1.0) + F.log10("cnt")).alias("tf")
    )


def tf_idf(docs: DataFrame, total_docs: int | None = None, **tok_kwargs) -> DataFrame:
    """O27: ``tfidf = tf * log10(1 + total_docs/df)`` → ``(doc_id, word, tfidf)``.

    ``df`` counts documents containing the word; since TF rows are
    unique per (doc, word), ``count(*)`` over TF grouped by word IS the
    document frequency (same trick as TFIDF$Reduce.class @68).
    The df-per-word side gets NO broadcast hint: vocabulary is
    unbounded at corpus scale (a forced broadcast of a 100M-word table
    is a driver OOM), and AQE already broadcasts it from its measured
    size when it is small — the decision belongs to the runtime stats,
    not the operator (tests/test_plans.py pins the broadcast at test
    scale without the hint).

    Known plan shape (audited round 8): the tf and df branches each
    scan+tokenize the corpus — Catalyst column-prunes the df branch's
    aggregate (it needs only distinct (doc, word), not the count), so
    the two exchanges canonicalize DIFFERENTLY and exchange reuse
    cannot merge them. This is the deliberate trade: the single-scan
    alternatives all concentrate a hot word's full postings in one
    task (df via a window over word = no partial aggregation; df via
    collect_list = a multi-GB row for a stopword), which at 100 TB is
    a straggler/OOM, not a win — the second scan is columnar,
    pruned, and embarrassingly parallel. bm25_search avoids the
    rescan only because its term list is finite (pivoted columns);
    an unbounded vocabulary has no such pivot. Callers who amortize
    (run many searches over one corpus) should materialize this
    table once — ``search`` over a parquet-backed tf-idf pushes the
    IN-list to the scan.
    """
    return _tf_idf_with_df(docs, total_docs, **tok_kwargs).drop("df")


def _tf_idf_with_df(
    docs: DataFrame, total_docs: int | None = None, **tok_kwargs
) -> DataFrame:
    """tf_idf keeping the document-frequency column → ``(doc_id, word,
    tfidf, df)`` — consumers that cap or weight by df (tfidf_doc_pairs)
    read it off the join tf_idf already performs instead of paying a
    second token-volume groupBy to rebuild it. ``tf_idf`` is this with
    ``df`` dropped (column-pruned to the identical plan)."""
    if total_docs is None:
        total_docs = docs.count()
    tf = term_frequency(docs, **tok_kwargs)
    df_counts = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    return tf.join(df_counts, "word").select(
        "doc_id",
        "word",
        (F.col("tf") * F.log10(F.lit(1.0) + F.lit(float(total_docs)) / F.col("df"))).alias(
            "tfidf"
        ),
        "df",
    )


def search(tfidf_df: DataFrame, terms: list[str]) -> DataFrame:
    """O29: per-document summed tf-idf over matched query terms
    → ``(doc_id, score)``. Terms are exact-match (Search$Map @89 uses
    ``String.equals``); the IN-list filter pushes down to the scan when
    the tf-idf table is materialized."""
    return (
        tfidf_df.filter(F.col("word").isin([t for t in terms]))
        .groupBy("doc_id")
        .agg(F.sum("tfidf").alias("score"))
    )


def ranked(scored: DataFrame, k: int | None = None, score_col: str = "score") -> DataFrame:
    """O30: global descending score sort; deterministic ``doc_id`` tiebreak
    (the jar's Rank is only totally ordered with 1 reducer — Spark
    range-partitions instead; with ``k`` this is TakeOrderedAndProject)."""
    out = scored.orderBy(F.desc(score_col), F.asc("doc_id"))
    if k is not None:
        out = out.limit(k)
    return out


def search_ranked(
    docs: DataFrame,
    terms: list[str],
    k: int | None = None,
    total_docs: int | None = None,
    **tok_kwargs,
) -> DataFrame:
    """O28 job-chain composition: TF → TF-IDF → search → rank as one
    lazy lineage (the jar materializes text files between each job;
    the engine materializes nothing)."""
    return ranked(search(tf_idf(docs, total_docs, **tok_kwargs), terms), k)


def bm25_search(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    total_docs: int | None = None,
    **tok_kwargs,
) -> DataFrame:
    """BM25 retrieval scoring (Robertson et al., Okapi at TREC-3) —
    what a real retrieval user reaches for where ``search`` reproduces
    the jar's plain tf-idf sum (Search$Map @89): raw-count term
    frequency saturated by ``k1`` and normalized by document length
    against the corpus mean (``b``), summed over matched query terms:

        score(d) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*|d|/avgdl))
        idf(t)   = log10(1 + (N - df + 0.5)/(df + 0.5))   (Lucene form,
                                                           never negative)

    Returns ``(doc_id, score)`` for docs matching >= 1 term. Lowercased
    tokens by default (the doc-pipeline convention of doc_word_count).

    Scale shape — ONE corpus tokenize pass, ONE corpus shuffle: the
    per-doc frequencies of the (few) query terms are PIVOTED into
    columns of the same per-doc aggregation that counts document
    length, so ``(doc_id, dl, tf_0..tf_k)`` rides a single map-side
    combined shuffle (the round-7 formulation scanned the corpus once
    per branch — lengths, tf, df, avgdl — because Catalyst's exchange
    reuse does not merge the cloned self-join branches; the pivot
    removes the branches instead of hoping). avgdl and every term's df
    then fall out of ONE 1-row aggregate of that frame (broadcast,
    never a collect), and the score is a pure column expression — no
    joins at all after the agg. ``tests/test_plans.py`` pins the
    executed shape: one Generate(explode) in the final adaptive plan,
    no SortMergeJoin. The pivot bounds the agg width at 2 + |terms|
    columns: right for query-shaped term lists (tens), not for
    hundred-term batches (wide rows beat a second scan well past that,
    but revisit the row form if terms outgrow a broadcast row).

    The score sums parts in ``terms``-list order as one left-to-right
    column expression — DETERMINISTIC float addition (the round-7 form
    summed via groupBy, exposing the 6-digit gate to partial-agg
    association order), and each part's operand order matches the SQL
    oracle exactly, so the remaining cross-engine risk is log10/divide
    ulp only.
    """
    if total_docs is None:
        total_docs = docs.count()
    tok_kwargs.setdefault("lowercase", True)
    # dedupe while preserving order: a repeated query term must not
    # double-count its part
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("bm25_search needs at least one query term")
    tok = tokenize(docs, **tok_kwargs)
    agg = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("word") == t, 1).otherwise(0)).alias(f"__tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = agg.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("int")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )
    n = F.lit(float(total_docs))

    def part(i: int):
        dfq = F.col(f"__df{i}")
        tf = F.col(f"__tf{i}")
        idf = F.log10(F.lit(1.0) + (n - dfq + F.lit(0.5)) / (dfq + F.lit(0.5)))
        denom = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("__avgdl")
        )
        return F.when(
            tf > 0, idf * (tf * F.lit(k1 + 1.0)) / denom
        ).otherwise(F.lit(0.0))

    score = part(0)
    for i in range(1, len(terms)):
        score = score + part(i)
    matched = functools.reduce(
        lambda a, b: a | b, [F.col(f"__tf{i}") > 0 for i in range(len(terms))]
    )
    return (
        agg.filter(matched)
        .crossJoin(F.broadcast(stats))
        .select("doc_id", score.alias("score"))
    )


def chunk_documents(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token windows per document — the pretraining
    chunk/pack step: ``(doc_id, chunk_id, chunk, n_tokens)``.

    Chunk ``i`` covers whitespace tokens ``[i*stride, i*stride+window)``;
    the chunk count is ``min(1 + ceil(max(0, n-window)/stride),
    1 + floor((n-1)/stride))`` — the first term stops once a chunk
    reaches the final token, the second clamps every chunk START below
    ``n`` (without it, ``stride > window`` emitted an empty trailing
    chunk: n=3, window=1, stride=10 produced a chunk at start 10 —
    round-4 advice). Every chunk is non-empty, the final chunk may be
    short, and with ``stride <= window`` every token lands in at least
    one chunk (``stride > window`` leaves inter-chunk gaps by
    construction — that is what a strided sample asks for). Zero-token
    docs emit no chunks.

    Scale shape: one narrow pass — split, a plan-time arithmetic chunk
    count, ``transform(sequence(...))`` + explode; no shuffle, no
    Python, no per-token row blow-up before the explode (the explode
    emits chunk ROWS, not token rows). Integer ceil is the
    ``(a+b-1)/b`` form evaluated in exact double range — identical in
    the DuckDB oracle.
    """
    if window <= 0 or stride <= 0:
        raise ValueError(f"window ({window}) and stride ({stride}) must be positive")
    toks = F.filter(
        F.split(F.col(text_col), TOKEN_WS_RE), lambda x: x != ""
    )
    staged = docs.select(F.col(doc_col).alias("doc_id"), toks.alias("__toks"))
    return _window_token_arrays(staged, window, stride)


def _window_token_arrays(staged: DataFrame, window: int, stride: int) -> DataFrame:
    """Shared windowing core for the chunkers: ``(doc_id, __toks)`` ->
    ``(doc_id, chunk_id, chunk, n_tokens)`` chunk rows. Pure column
    expressions (the count formula and clamp are documented on
    chunk_documents); token-array PRODUCTION is the caller's business —
    whitespace split stays fully in codegen, the BPE variant pays one
    Arrow pass for the array and re-enters codegen here."""
    staged = staged.withColumn("__n", F.size("__toks"))
    n_chunks = F.least(
        F.lit(1)
        + F.floor(
            (F.greatest(F.col("__n") - window, F.lit(0)) + F.lit(stride - 1))
            / F.lit(stride)
        ),
        F.lit(1) + F.floor((F.col("__n") - 1) / F.lit(stride)),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.slice(F.col("__toks"), i * stride + 1, window).alias("__ctoks"),
        ),
    )
    return (
        staged.filter(F.col("__n") > 0)
        .select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.array_join(F.col("c.__ctoks"), " ").alias("chunk"),
            F.size(F.col("c.__ctoks")).alias("n_tokens"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    doc_col: str = "doc_id",
    bucket_size: int = 4096,
    tokenizer: str = "ws",
) -> DataFrame:
    """GPT-style sequence packing layout: concatenate every document's
    tokens in ``doc_col`` order into one virtual token stream and cut
    it into fixed ``budget``-token bins — the step that turns a cleaned
    corpus into fully-packed training sequences (no padding waste;
    documents may straddle a bin boundary, exactly like production
    packing).

    Returns one row per document: ``(doc_id, n_tokens, global_start,
    bin_id, bin_offset)`` where ``global_start`` is the document's
    first-token position in the stream, ``bin_id = global_start //
    budget`` (the bin its first token lands in) and ``bin_offset =
    global_start % budget``. All-integer arithmetic — bit-exact in the
    SQL oracle by construction, no float ordering concerns.

    Scale shape — a DISTRIBUTED PREFIX SUM, not one global window:
    a single ``Window.orderBy(doc_id)`` would drag the whole corpus
    into one task. Instead (1) docs land in deterministic contiguous
    id-range buckets (``doc_id // bucket_size``), (2) the running sum
    within each bucket is a per-bucket window (parallel across
    buckets), (3) bucket totals — one row per bucket, corpus-size /
    bucket_size rows — get their own tiny running sum and broadcast-
    join back as each bucket's global offset. Two narrow windows + one
    broadcast join instead of a serialized global sort; the classic
    two-phase scan/prefix pattern. ``doc_col`` must be numeric and
    unique (the corpus contract; hash ids first if not).

    ``tokenizer``: ``"ws"`` budgets whitespace tokens (pure codegen);
    ``"bpe"`` budgets SUBWORD pieces via the vendored deterministic BPE
    (``functions/bpe.py``) — the real packing contract: training bins
    are sized in subword tokens, and a whitespace count under-fills
    them on morpheme-rich text (round-5 verdict item 6). The BPE path
    pays exactly ONE Arrow-batched Python pass for the per-doc piece
    COUNT; all prefix-sum arithmetic stays in codegen either way.
    """
    from pyspark.sql.window import Window

    if budget <= 0:
        raise ValueError(f"budget ({budget}) must be positive")
    if bucket_size <= 0:
        raise ValueError(f"bucket_size ({bucket_size}) must be positive")
    if tokenizer == "ws":
        toks = F.size(F.filter(F.split(F.col(text_col), TOKEN_WS_RE), lambda x: x != ""))
    elif tokenizer == "bpe":
        from pagerank_mapreduce_implementation_spark.functions.bpe import bpe_pieces_udf

        toks = F.size(bpe_pieces_udf()(F.col(text_col)))
    else:
        raise ValueError(f"tokenizer must be 'ws' or 'bpe', got {tokenizer!r}")
    staged = docs.select(
        F.col(doc_col).alias("doc_id"),
        toks.cast("long").alias("n_tokens"),
        # integral division (not a double floor): exact for any id range
        F.expr(f"{doc_col} div {int(bucket_size)}").alias("__bucket"),
    )
    in_bucket = Window.partitionBy("__bucket").orderBy("doc_id")
    staged = staged.withColumn(
        "__cum", F.sum("n_tokens").over(in_bucket)
    )
    # bucket totals: tiny (one row per id-range bucket); their running
    # sum is a window over that tiny set, then a broadcast join back.
    # The totals branch re-derives from the token-count scan (two
    # column-pruned scans total — cheap on columnar storage; a caller
    # packing a 100 TB corpus persists `docs`' token counts first and
    # both branches then read the cache).
    btot = staged.groupBy("__bucket").agg(F.max("__cum").alias("__btot"))
    bprefix = btot.withColumn(
        "__prefix",
        F.coalesce(
            F.sum("__btot").over(
                Window.orderBy("__bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("__bucket", "__prefix")
    return (
        staged.join(F.broadcast(bprefix), "__bucket")
        .withColumn(
            "global_start", F.col("__prefix") + F.col("__cum") - F.col("n_tokens")
        )
        .select(
            "doc_id",
            "n_tokens",
            "global_start",
            # integral division, exact at any stream length
            F.expr(f"global_start div {int(budget)}").alias("bin_id"),
            (F.col("global_start") % budget).alias("bin_offset"),
        )
    )


def pack_bins(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    doc_col: str = "doc_id",
    bucket_size: int = 4096,
    tokenizer: str = "ws",
    with_doc_spans: bool = False,
) -> DataFrame:
    """MATERIALIZE the packed training bins that ``pack_sequences``
    lays out: one row per ``budget``-token bin — ``(bin_id, n_tokens,
    n_docs, text)`` with ``text`` the bin's tokens in stream order
    (documents straddle boundaries exactly as production packing cuts
    them; the final bin may be short).

    Scale shape: the layout IS pack_sequences' two-phase distributed
    prefix sum, computed INLINE with the token arrays riding along —
    per-bucket running sums (parallel) + a broadcast of the tiny
    bucket-totals prefix — so there is NO corpus-wide doc_id self-join
    to fetch global_start back (an earlier version joined the layout
    to the docs by id: broadcastable at test scale, a sort-merge of
    the whole corpus against itself at 100 TB). Materialization is
    then ONE token-level shuffle keyed on bin_id: posexplode to
    (global position, token), integral div/mod to (bin, offset),
    groupBy bin with a sort_array over the bounded (<= budget rows)
    per-bin struct list. That token shuffle is inherent — the output
    IS a reordered copy of the corpus — and each bin's state is
    bounded by ``budget`` tokens, so no group can outgrow a task at
    any corpus size. At 100 TB you'd write bins range-partitioned by
    bin_id; the per-bin math is unchanged.

    ``tokenizer`` as in ``pack_sequences`` (``"ws"`` / ``"bpe"``);
    token COUNTS and bin cuts agree with the layout op by construction
    (same split expression, same window arithmetic).

    ``with_doc_spans`` adds ``doc_spans`` — the per-bin document
    boundary map a trainer needs to build the block-diagonal attention
    mask and reset position ids over a packed sequence (tokens from
    different documents must not attend to each other): the canonical
    string ``"off:doc_id;off:doc_id;..."``, one entry per document
    segment starting in the bin, ascending offset; a doc straddling in from
    the previous bin contributes its ``0:`` entry. Encoded as ONE
    string (not array<struct>) so the cross-engine value hash is
    stable. Costs a doc_id ridden only on the one-per-(doc,bin) head
    tokens through the inherent shuffle — everything else unchanged.
    """
    from pyspark.sql.window import Window

    if budget <= 0:
        raise ValueError(f"budget ({budget}) must be positive")
    if bucket_size <= 0:
        raise ValueError(f"bucket_size ({bucket_size}) must be positive")
    if tokenizer == "ws":
        toks = F.filter(F.split(F.col(text_col), TOKEN_WS_RE), lambda x: x != "")
    elif tokenizer == "bpe":
        from pagerank_mapreduce_implementation_spark.functions.bpe import bpe_pieces_udf

        toks = bpe_pieces_udf()(F.col(text_col))
    else:
        raise ValueError(f"tokenizer must be 'ws' or 'bpe', got {tokenizer!r}")
    # pack_sequences' prefix-sum layout, with __toks carried through
    # the per-bucket window (the totals branch prunes it away)
    staged = docs.select(
        F.col(doc_col).alias("doc_id"),
        toks.alias("__toks"),
        F.expr(f"{doc_col} div {int(bucket_size)}").alias("__bucket"),
    ).withColumn("__nt", F.size("__toks").cast("long"))
    in_bucket = Window.partitionBy("__bucket").orderBy("doc_id")
    staged = staged.withColumn("__cum", F.sum("__nt").over(in_bucket))
    btot = staged.groupBy("__bucket").agg(F.max("__cum").alias("__btot"))
    bprefix = btot.withColumn(
        "__prefix",
        F.coalesce(
            F.sum("__btot").over(
                Window.orderBy("__bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("__bucket", "__prefix")
    token_rows = (
        staged.join(F.broadcast(bprefix), "__bucket")
        .withColumn(
            "global_start", F.col("__prefix") + F.col("__cum") - F.col("__nt")
        )
        .select("doc_id", "global_start", F.posexplode("__toks").alias("pos", "tok"))
        .select(
            *(["doc_id"] if with_doc_spans else []),
            "global_start",
            "tok",
            (F.col("global_start") + F.col("pos")).alias("__gpos"),
        )
        .select(
            "tok",
            F.expr(f"__gpos div {int(budget)}").alias("bin_id"),
            (F.col("__gpos") % budget).alias("__off"),
            # a doc's FIRST token within this bin sits at
            # max(its global_start, the bin start) — exactly one such
            # token per (doc, bin), so summing the flag counts distinct
            # contributing docs WITHOUT a countDistinct (whose Expand
            # would double the token shuffle — the plan's largest)
            (
                F.col("__gpos")
                == F.greatest(
                    F.col("global_start"),
                    F.expr(f"__gpos div {int(budget)}") * budget,
                )
            )
            .cast("long")
            .alias("__doc_head"),
            # doc_id only on the one-per-(doc,bin) head tokens — the
            # shuffle payload stays token-sized, not token+id-sized
            *(
                [
                    F.when(
                        F.col("__gpos")
                        == F.greatest(
                            F.col("global_start"),
                            F.expr(f"__gpos div {int(budget)}") * budget,
                        ),
                        F.col("doc_id"),
                    ).alias("__head_doc")
                ]
                if with_doc_spans
                else []
            ),
        )
    )
    aggs = [
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("__doc_head").alias("n_docs"),
        F.array_sort(
            F.collect_list(F.struct(F.col("__off"), F.col("tok")))
        ).alias("__cells"),
    ]
    if with_doc_spans:
        # collect_list skips the NULL non-head rows; sort ascending on
        # the in-bin offset gives the trainer's boundary order
        aggs.append(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("__head_doc").isNotNull(),
                        F.struct(F.col("__off"), F.col("__head_doc")),
                    )
                )
            ).alias("__spans")
        )
    out_cols = [
        "bin_id",
        "n_tokens",
        "n_docs",
        F.array_join(
            F.transform(F.col("__cells"), lambda c: c["tok"]), " "
        ).alias("text"),
    ]
    if with_doc_spans:
        out_cols.append(
            F.array_join(
                F.transform(
                    F.col("__spans"),
                    lambda s: F.concat_ws(
                        ":",
                        s["__off"].cast("string"),
                        s["__head_doc"].cast("string"),
                    ),
                ),
                ";",
            ).alias("doc_spans")
        )
    return token_rows.groupBy("bin_id").agg(*aggs).select(*out_cols)


def chunk_documents_bpe(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """``chunk_documents`` over SUBWORD (BPE) tokens instead of
    whitespace words — the real chunk/pack contract: training packs are
    sized in subword tokens, and a whitespace count under-fills them on
    morpheme-rich text (round-4 verdict item 6).

    Tokenization is the vendored deterministic BPE
    (``functions/bpe.py``): lowercase whitespace words, each encoded to
    merge-table pieces. ``chunk`` joins the window's pieces with
    spaces; ``n_tokens`` counts pieces. Window semantics, the clamp,
    and the output schema are IDENTICAL to chunk_documents (shared
    ``_window_token_arrays`` core).

    Scale shape: exactly ONE Arrow-batched Python pass (the piece
    array), then codegen'd windowing — the pandas UDF is the documented
    slow-path exception, paid only where a built-in cannot express the
    semantics (merge-loop tokenization).
    """
    from pagerank_mapreduce_implementation_spark.functions.bpe import bpe_pieces_udf

    if window <= 0 or stride <= 0:
        raise ValueError(f"window ({window}) and stride ({stride}) must be positive")
    staged = docs.select(
        F.col(doc_col).alias("doc_id"),
        bpe_pieces_udf()(F.col(text_col)).alias("__toks"),
    )
    return _window_token_arrays(staged, window, stride)


def bpe_train(
    docs: DataFrame,
    num_merges: int = 16,
    text_col: str = "text",
    pattern: str = TOKEN_WS_RE,
    lowercase: bool = False,
    materialize_every: int = 4,
) -> DataFrame:
    """Learn a BPE merge table from the corpus (Sennrich et al. 2016)
    → ``(rank, lhs, rhs, merged)``, one row per learned merge in
    order.

    The training counterpart of the vendored BPE *encoder*
    (``functions/bpe.py``): where the encoder applies a fixed merge
    table, this learns one. Classic algorithm: build the word
    vocabulary with counts, represent each word as a symbol sequence
    (characters + a trailing ``</w>`` end-of-word marker), then
    ``num_merges`` times (a) count adjacent symbol pairs weighted by
    word count — overlapping occurrences each count, per the reference
    algorithm's ``get_stats`` — (b) take the argmax pair with the
    deterministic tie-break ``(count DESC, lhs ASC, rhs ASC)``, and
    (c) merge that pair left-to-right in every word (after a merge the
    scan resumes AFTER the merged token, so it is never the left
    element of another merge in the same pass).

    Scale shape: the corpus is touched ONCE (the word-count shuffle);
    every iteration then runs on the word-vocabulary table, which is
    Heaps-law bounded (tens of millions of rows for a 100 TB corpus,
    not TB). Per merge: one tiny groupBy over the vocab, a bounded
    1-row ``collect()`` (the argmax IS the model parameter — same
    driver-scalar pattern as the PageRank dangling-mass fold), and a
    pure-Catalyst ``aggregate`` fold that rewrites the symbol arrays
    JVM-side (struct accumulator ``(out, pend)``; the pending slot
    reproduces the resume-after-merge scan exactly — no Python in the
    loop). States persist LAZILY and materialize as a side effect of
    the next argmax job (an eager per-iteration checkpoint measured
    2x the loop's wall clock); a lazy ``localCheckpoint`` every
    ``materialize_every`` merges keeps the plan depth flat and the
    predecessor unpersists once its successor is live.

    The returned merge table is built driver-side from the collected
    argmax rows — legitimate: ``num_merges`` rows IS the learned
    model, not data.
    """
    if num_merges <= 0:
        raise ValueError(f"num_merges ({num_merges}) must be positive")
    spark = docs.sparkSession
    word = F.explode(F.split(F.col(text_col), pattern)).alias("word")
    words = docs.select(word).filter(F.col("word") != "")
    if lowercase:
        words = words.select(F.lower("word").alias("word"))
    vocab = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "word",
            "cnt",
            F.concat(
                F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
                F.array(F.lit("</w>")),
            ).alias("symbols"),
        )
    )

    merges: list[tuple[int, str, str, str]] = []
    pair_struct = F.expr(
        "transform(slice(symbols, 1, size(symbols) - 1),"
        " (s, i) -> struct(s AS l, symbols[i + 1] AS r))"
    )

    def _apply_merge(df: DataFrame, lhs: str, rhs: str) -> DataFrame:
        merged_lit = F.lit(lhs + rhs)
        nul = F.lit(None).cast("string")

        def step(acc, x):
            out, pend = acc["out"], acc["pend"]
            return (
                F.when(
                    pend.eqNullSafe(F.lit(lhs)) & (x == F.lit(rhs)),
                    F.struct(
                        F.concat(out, F.array(merged_lit)).alias("out"),
                        nul.alias("pend"),
                    ),
                )
                .when(pend.isNull(), F.struct(out.alias("out"), x.alias("pend")))
                .otherwise(
                    F.struct(
                        F.concat(out, F.array(pend)).alias("out"), x.alias("pend")
                    )
                )
            )

        folded = F.aggregate(
            "symbols",
            F.struct(
                F.array().cast("array<string>").alias("out"), nul.alias("pend")
            ),
            step,
            lambda acc: F.when(acc["pend"].isNull(), acc["out"]).otherwise(
                F.concat(acc["out"], F.array(acc["pend"]))
            ),
        )
        return df.select("word", "cnt", folded.alias("symbols"))

    # GraphX-style iteration bookkeeping: every state is persisted
    # LAZILY and materialized as a side effect of the next argmax job
    # (zero extra jobs — an eager per-iteration localCheckpoint was
    # measured at 2x the whole loop's wall clock at sf0.1); the
    # predecessor is unpersisted once its successor is materialized,
    # and a LAZY localCheckpoint every ``materialize_every`` merges
    # truncates the logical plan so analysis cost stays flat.
    # Release discipline: a plain CACHE is an optimization — if its
    # blocks evict, lineage recomputes from the newest checkpoint
    # below it — so a cached predecessor releases as soon as its
    # successor is live. A local CHECKPOINT is a recovery ROOT: its
    # blocks cannot be rebuilt, so it must stay until a NEWER
    # checkpoint is materialized (after which no live lineage can
    # reach it).
    state, state_is_ckpt = vocab.persist(), False
    prev: DataFrame | None = None
    prev_is_ckpt = False
    old_ckpt: DataFrame | None = None
    every = max(1, materialize_every)
    for rank in range(1, num_merges + 1):
        best = (
            state.select(F.col("cnt"), F.explode(pair_struct).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        # `state` is materialized now; its cached predecessor is
        # redundant, and if `state` itself is a checkpoint the one
        # before it has just become unreachable
        if prev is not None:
            if prev_is_ckpt:
                old_ckpt = prev
            else:
                prev.unpersist()
        if state_is_ckpt and old_ckpt is not None and old_ckpt is not state:
            old_ckpt.unpersist()
            old_ckpt = None
        if not best:
            break
        lhs, rhs = best[0]["l"], best[0]["r"]
        merges.append((rank, lhs, rhs, lhs + rhs))
        prev, prev_is_ckpt = state, state_is_ckpt
        state = _apply_merge(state, lhs, rhs)
        if rank % every == 0:
            # lazy checkpoint doubles as the cache — persisting the
            # checkpointed frame again would double-store it
            state = state.localCheckpoint(eager=False)
            state_is_ckpt = True
        else:
            state = state.persist()
            state_is_ckpt = False
    # nothing downstream survives the loop (the merge table was
    # collected driver-side), so every remaining block can go
    for df in (state, prev, old_ckpt):
        if df is not None:
            df.unpersist()

    return spark.createDataFrame(
        merges, schema="rank INT, lhs STRING, rhs STRING, merged STRING"
    )


def build_inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    pattern: str = TOKEN_WS_RE,
    shard_size: int | None = None,
) -> DataFrame:
    """Positional inverted index → ``(word, df, shard, postings)`` —
    the materialized artifact behind O29's search and bm25 (the
    reference greps a tf-idf text dump per query; a real IR stack
    serves from this).

    ``postings`` is a deterministic STRING encoding
    ``doc:pos,pos;doc:pos`` — documents ascending, positions
    ascending, positions 0-based over the raw token split (empty
    tokens dropped but their slots counted, so offsets are stable
    under re-tokenization). A string, not a nested array, so the
    cross-engine hash gate sees byte-identical values.

    Scale shape: one narrow ``posexplode`` (no shuffle), ONE
    (doc, word) shuffle to fold per-doc position runs, ONE word
    shuffle to assemble posting lists (both with map-side partial
    aggregation). The stopword problem — a hot word's posting list
    is the whole corpus in one row/task — is handled by
    ``shard_size``: per-doc entries hash into
    ``ceil(df/shard_size)`` deterministic shards (md5-uniform on
    doc_id, shard-local ordering preserved), so no single task ever
    assembles more than ~``shard_size`` entries; readers union
    shards (set membership and scoring are shard-associative).
    ``shard_size=None`` keeps one shard per word (shard column 0)."""
    toks = docs.select(
        F.col(doc_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), pattern)).alias("pos", "word"),
    ).filter(F.col("word") != "")
    per_doc = toks.groupBy("word", "doc_id").agg(
        F.array_join(F.array_sort(F.collect_list("pos")), ",").alias("pl")
    )
    if shard_size is not None:
        if shard_size <= 0:
            raise ValueError(f"shard_size ({shard_size}) must be positive")
        df_counts = per_doc.groupBy("word").agg(
            F.count(F.lit(1)).alias("word_df")
        )
        per_doc = per_doc.join(df_counts, "word").select(
            "word",
            "doc_id",
            "pl",
            "word_df",
            (
                F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
                .cast("long")
                % F.ceil(F.col("word_df") / F.lit(shard_size)).cast("long")
            ).alias("shard"),
        )
        grouped = per_doc.groupBy("word", "shard")
        df_col = F.max("word_df").alias("df")
    else:
        grouped = per_doc.withColumn("shard", F.lit(0)).groupBy("word", "shard")
        df_col = F.count(F.lit(1)).alias("df")
    return grouped.agg(
        df_col,
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "pl"))),
                lambda e: F.concat_ws(
                    ":", e["doc_id"].cast("string"), e["pl"]
                ),
            ),
            ";",
        ).alias("postings"),
    ).select("word", "df", "shard", "postings")


def tfidf_doc_pairs(
    docs: DataFrame,
    max_df: int = 64,
    threshold: float = 0.3,
    total_docs: int | None = None,
    round_digits: int = 6,
    **tok_kwargs,
) -> DataFrame:
    """Sparse-vector document similarity → ``(doc_a, doc_b, cosine)``
    for pairs with tf-idf cosine >= ``threshold``, computed in the
    df-capped term subspace: terms appearing in more than ``max_df``
    documents are dropped from vectors AND norms before pairing (the
    lexical sibling of embedding ``cosine_pairs``; the cap is the same
    stop-term move as ``ngram_jaccard``'s ``max_shingle_df`` — a term
    shared by the whole corpus carries no similarity signal but would
    fan out C(df, 2) candidate pairs).

    Scale shape: candidate pairs come from an inverted-index self-join
    on the term — per term at most C(max_df, 2) pairs, so candidate
    volume is bounded by vocab x C(max_df, 2), never |docs|^2. Two
    token-volume shuffles total (the tf build whose df join already
    carries the cap column, and the term self-join); the norm join is
    doc-bounded. At 100 TB raise ``threshold``/lower
    ``max_df`` — precision of the cap is a corpus-frequency statement,
    independent of corpus size.

    Cross-engine determinism: per-term products and squared weights
    are computed in IEEE double from identical inputs, then cast to
    ``decimal(18,6)`` so the SUMS are order-independent (the
    ``relational.dsum`` convention); only the final cosine divides as
    double, rounded ``round_digits``.
    """
    if max_df < 2:
        raise ValueError(f"max_df ({max_df}) must be >= 2 to form any pair")
    dec = "decimal(18,6)"
    kept = (
        _tf_idf_with_df(docs, total_docs, **tok_kwargs)
        .filter(F.col("df") <= max_df)
        .select("doc_id", "word", "tfidf")
    )
    norms = kept.groupBy("doc_id").agg(
        F.sqrt(
            F.sum((F.col("tfidf") * F.col("tfidf")).cast(dec)).cast("double")
        ).alias("norm")
    )
    a = kept.select(
        F.col("doc_id").alias("doc_a"), "word", F.col("tfidf").alias("w_a")
    )
    b = kept.select(
        F.col("doc_id").alias("doc_b"), "word", F.col("tfidf").alias("w_b")
    )
    dots = (
        a.join(b, "word")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum((F.col("w_a") * F.col("w_b")).cast(dec)).cast("double").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("norm").alias("norm_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("norm").alias("norm_b"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("dot") / (F.col("norm_a") * F.col("norm_b")), round_digits
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def bpe_fertility(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    round_digits: int = 6,
) -> DataFrame:
    """Tokenizer fertility report per source → ``(source, n_docs,
    n_words, n_pieces, n_chars, fertility, chars_per_piece)``:
    ``fertility`` = BPE pieces per whitespace word — THE
    tokenizer-quality number a multilingual/multi-domain corpus is
    audited by (UniMax and the mT5 tokenizer papers report exactly
    this; fertility ~1 means the vocab fits the domain, >>1 means the
    domain fragments into byte-crumbs and its EFFECTIVE token budget
    silently shrinks by that factor) — and ``chars_per_piece``, the
    compression read of the same story. Ratios of exact integer sums,
    computed in IEEE double and rounded ``round_digits`` — cross-
    engine exact.

    Scale shape: ONE Arrow-batched pass for per-doc piece counts (the
    vendored deterministic BPE — the only Python), every other column
    a codegen expression on the same row, then one source-keyed
    aggregation with map-side partials. No joins, no second scan.
    """
    from pagerank_mapreduce_implementation_spark.functions.bpe import bpe_pieces_udf

    words = F.size(
        F.filter(F.split(F.col(text_col), TOKEN_WS_RE), lambda x: x != "")
    )
    staged = docs.select(
        F.col(group_col).alias("source"),
        words.cast("long").alias("__w"),
        F.size(bpe_pieces_udf()(F.col(text_col))).cast("long").alias("__p"),
        F.length(text_col).cast("long").alias("__c"),
    )
    return (
        staged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__w").alias("n_words"),
            F.sum("__p").alias("n_pieces"),
            F.sum("__c").alias("n_chars"),
        )
        .select(
            "source",
            "n_docs",
            "n_words",
            "n_pieces",
            "n_chars",
            F.round(
                F.when(
                    F.col("n_words") > 0,
                    F.col("n_pieces").cast("double") / F.col("n_words"),
                ).otherwise(F.lit(0.0)),
                round_digits,
            ).alias("fertility"),
            F.round(
                F.when(
                    F.col("n_pieces") > 0,
                    F.col("n_chars").cast("double") / F.col("n_pieces"),
                ).otherwise(F.lit(0.0)),
                round_digits,
            ).alias("chars_per_piece"),
        )
    )


#: sentence boundary: terminal punctuation run + whitespace. The
#: delimiter is CONSUMED (no lookbehind: DuckDB's RE2 oracle has none),
#: so interior sentences lose their terminal punctuation and the final
#: sentence keeps its own — the cross-engine-exact heuristic split.
SENTENCE_SPLIT_RE = r"[.!?]+\s+"


def chunk_sentences(
    docs: DataFrame,
    window: int = 5,
    stride: int = 4,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Overlapping SENTENCE windows per document — retrieval-passage
    chunking (the RAG twin of ``chunk_documents``' token windows):
    ``(doc_id, chunk_id, chunk, n_sentences)`` where chunk ``i`` covers
    sentences ``[i*stride, i*stride+window)`` joined by single spaces.
    Sentences come from the heuristic ``SENTENCE_SPLIT_RE`` split
    (punctuation-consuming — see its note; abbreviation-aware
    segmentation needs a model, not an engine). Window/stride/clamp
    semantics, including the trailing-chunk rules, are EXACTLY
    ``chunk_documents``' — both run through the same windowing core.

    Scale shape: identical to ``chunk_documents`` — one narrow pass,
    plan-time count arithmetic, explode emits chunk rows; no shuffle,
    no Python.
    """
    if window <= 0 or stride <= 0:
        raise ValueError(f"window ({window}) and stride ({stride}) must be positive")
    sents = F.filter(
        F.split(F.col(text_col), SENTENCE_SPLIT_RE), lambda x: x != ""
    )
    staged = docs.select(F.col(doc_col).alias("doc_id"), sents.alias("__toks"))
    return _window_token_arrays(staged, window, stride).withColumnRenamed(
        "n_tokens", "n_sentences"
    )


def packing_report(
    docs: DataFrame,
    budget: int,
    text_col: str = "text",
    doc_col: str = "doc_id",
    bucket_size: int = 4096,
    tokenizer: str = "ws",
) -> DataFrame:
    """The "should we pack at this sequence length" audit — ONE row
    comparing the two batching modes a trainer chooses between at a
    given token ``budget``:

    - packed (GPT-style, ``pack_sequences``): zero padding, but
      documents straddle bin boundaries — ``n_split_docs`` /
      ``cross_segments`` count the fragmentation the attention mask
      must then block, ``tail_waste`` is the final short bin.
    - padded (SFT-style): every document chunked to ``ceil(n/budget)``
      sequences, last one padded — ``pad_tokens`` is the compute burnt
      on padding.

    Output: ``(budget, n_docs, total_tokens, n_bins, n_split_docs,
    cross_segments, tail_waste, pack_waste_rate, padded_seqs,
    pad_tokens, pad_waste_rate, split_frac)``; rates round(6), all
    else exact BIGINT arithmetic over ``pack_sequences``' layout (its
    two-phase distributed prefix sum — no global window), so the SQL
    oracle replays every value bit-exactly. The report itself is one
    map-side-partial aggregate: scan-bound at 100 TB.
    """
    b = int(budget)
    layout = pack_sequences(docs, b, text_col, doc_col, bucket_size, tokenizer)
    nz = F.col("n_tokens") > 0
    last_bin = F.expr(f"(global_start + n_tokens - 1) div {b}")
    segs = F.when(nz, last_bin - F.col("bin_id") + 1).otherwise(F.lit(0))
    per = layout.select(
        "n_tokens",
        segs.alias("__segs"),
        F.expr(f"(n_tokens + {b - 1}) div {b}").alias("__pseqs"),
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("total_tokens"),
        F.coalesce(
            F.sum(F.when(F.col("__segs") > 1, F.lit(1)).otherwise(F.lit(0))),
            F.lit(0),
        ).alias("n_split_docs"),
        F.coalesce(
            F.sum(
                F.when(F.col("__segs") > 0, F.col("__segs") - 1).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).alias("cross_segments"),
        F.coalesce(F.sum("__pseqs"), F.lit(0)).alias("padded_seqs"),
    )
    n_bins = F.expr(f"(total_tokens + {b - 1}) div {b}")
    staged = agg.select(
        F.lit(b).cast("long").alias("budget"),
        "n_docs",
        "total_tokens",
        n_bins.alias("n_bins"),
        "n_split_docs",
        "cross_segments",
        "padded_seqs",
    ).select(
        "budget",
        "n_docs",
        "total_tokens",
        "n_bins",
        "n_split_docs",
        "cross_segments",
        (F.col("n_bins") * b - F.col("total_tokens")).alias("tail_waste"),
        "padded_seqs",
        (F.col("padded_seqs") * b - F.col("total_tokens")).alias("pad_tokens"),
    )
    rate = lambda num, den: F.when(  # noqa: E731
        den > 0, F.round(num.cast("double") / (den * b), 6)
    ).otherwise(F.lit(0.0))
    return staged.select(
        "budget",
        "n_docs",
        "total_tokens",
        "n_bins",
        "n_split_docs",
        "cross_segments",
        "tail_waste",
        rate(F.col("tail_waste"), F.col("n_bins")).alias("pack_waste_rate"),
        "padded_seqs",
        "pad_tokens",
        rate(F.col("pad_tokens"), F.col("padded_seqs")).alias("pad_waste_rate"),
        F.when(
            F.col("n_docs") > 0,
            F.round(F.col("n_split_docs").cast("double") / F.col("n_docs"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("split_frac"),
    )
