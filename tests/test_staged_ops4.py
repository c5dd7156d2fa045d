"""STAGED operators queued for a later driver window — the round-14
cohort (readability_scores, oov_stats, simhash_recall_report,
lsh_expected_recall) REGISTERED in round 16; the round-15 additions
(zipf_fit, source_overlap, ngram_source_overlap) and the round-16
intra_doc_line_dedup target r17's free slots. Until registered this
file is their correctness gate: DuckDB parity through the registry
harness's normalize/compare, plus semantics on hand-checkable
fixtures and plan-shape asserts (registered entries keep their tests
here as the local regression gate)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

# slow tier (r17): excluded from the driver's default fast run -- see pytest.ini
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from pagerank_mapreduce_implementation_spark import oracles
from pagerank_mapreduce_implementation_spark.operators import textstats
from pagerank_mapreduce_implementation_spark.sources.catalog import Catalog

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def check(spark_df, duck_con, oracle_sql):
    got = normalize(spark_df.toPandas())
    want = normalize(duck_con.sql(oracle_sql).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    for col in got.columns:
        gk, wk = got[col].dtype.kind, want[col].dtype.kind
        assert not ((gk in "iu" and wk == "f") or (gk == "f" and wk in "iu")), (
            f"{col}: integer-vs-float divergence ({got[col].dtype} vs {want[col].dtype})"
        )


# --- readability (Flesch / Flesch-Kincaid) ---------------------------------


def test_readability_parity(spark, sf_dir, duck):
    got = textstats.readability_scores(Catalog(spark, sf_dir).documents)
    assert got.count() > 0
    check(got, duck, oracles.readability_sql())


def test_readability_semantics(spark):
    """Hand-checked counts and the textbook formula values: sentence
    runs collapse (``?!`` is one boundary), a doc with words but no
    terminal punctuation is ONE sentence, vowel GROUPS count (not
    vowels), empty docs report zero counts and NULL scores."""
    docs = spark.createDataFrame(
        [
            (1, "The cat sat. It was happy?! Yes."),
            (2, ""),
            (3, "no terminal punctuation here"),
            (4, "zzz bcdfg."),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textstats.readability_scores(docs).collect()}
    r1 = rows[1]
    # "happy?!" -> one [.!?]+ run; 3 sentences, 7 whitespace words
    assert r1["n_sentences"] == 3 and r1["n_words"] == 7
    # vowel groups: the(e) cat(a) sat(a) it(i) was(a) happy(a, y)
    # yes(e) -> 8
    assert r1["n_syllables"] == 8
    wps, spw = 7 / 3, 8 / 7
    assert r1["words_per_sentence"] == round(wps, 6)
    assert r1["flesch_reading_ease"] == round(206.835 - 1.015 * wps - 84.6 * spw, 6)
    assert r1["fk_grade"] == round(0.39 * wps + 11.8 * spw - 15.59, 6)
    r2 = rows[2]
    assert r2["n_sentences"] == 0 and r2["n_words"] == 0
    assert r2["flesch_reading_ease"] is None and r2["fk_grade"] is None
    r3 = rows[3]
    assert r3["n_sentences"] == 1  # prose without terminal punctuation
    r4 = rows[4]
    assert r4["n_syllables"] == 0 and r4["syllables_per_word"] == 0.0


def test_readability_zero_shuffle_plan(spark, sf_dir):
    """Pure per-row column math: no exchange of any kind, no Python,
    and the scan prunes to (doc_id, text)."""
    import re as _re

    df = textstats.readability_scores(Catalog(spark, sf_dir).documents)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "Python" not in p
    scan_cols = _re.search(r"FileScan parquet \[([^\]]*)\]", p)
    assert scan_cols is not None
    assert len(scan_cols.group(1).split(",")) <= 2


# --- OOV / rare-token ratio ------------------------------------------------


def test_oov_stats_parity(spark, sf_dir, duck):
    got = textstats.oov_stats(Catalog(spark, sf_dir).documents, top_k=10)
    rows = got.collect()
    assert any(r["n_oov"] > 0 for r in rows), (
        "vacuous: top-10 covers all (corpus vocab is ~31 words)"
    )
    check(got, duck, oracles.oov_stats_sql(top_k=10))


def test_oov_stats_semantics(spark):
    """Hand-checked head vocabulary: ties at the top_k boundary break
    by word ascending; membership is case-folded; empty docs report
    (0, 0, 0.0)."""
    docs = spark.createDataFrame(
        [(1, "a A b c"), (2, "a rare"), (3, "")],
        "doc_id long, text string",
    )
    # counts: a=3 (case-folded), b=1, c=1, rare=1 -> top_2 = {a, b}
    # (count desc, then word asc: b < c < rare)
    rows = {r["doc_id"]: r for r in textstats.oov_stats(docs, top_k=2).collect()}
    assert rows[1]["n_tokens"] == 4 and rows[1]["n_oov"] == 1  # c
    assert rows[1]["oov_ratio"] == 0.25
    assert rows[2]["n_oov"] == 1 and rows[2]["oov_ratio"] == 0.5  # rare
    assert rows[3]["n_tokens"] == 0 and rows[3]["oov_ratio"] == 0.0
    with pytest.raises(ValueError):
        textstats.oov_stats(docs, top_k=0)


def test_oov_stats_vocab_broadcast_plan(spark, sf_dir):
    """The vocabulary prunes via TakeOrderedAndProject (distributed
    partial top-k, never a single-task global window) and joins back
    as a BROADCAST — no shuffle join anywhere."""
    df = textstats.oov_stats(Catalog(spark, sf_dir).documents, top_k=10)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p
    assert "SortMergeJoin" not in p
    assert "ShuffledHashJoin" not in p
    assert "BroadcastHashJoin" in p


# --- python-reference fuzz (the luhn/domain-argmax convention) --------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_PROP = dict(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
_WORDS = ["the", "cat", "zzz", "a", "Xy", "bcd", "queue", "rhythm", "io."]
_PUNCT = [".", "!", "?", "?!", "...", ""]


@settings(**_PROP)
@given(
    docs=st.lists(
        st.lists(
            st.tuples(st.sampled_from(_WORDS), st.sampled_from(_PUNCT)),
            max_size=8,
        ),
        min_size=1,
        max_size=5,
    )
)
def test_readability_matches_python(spark, docs):
    """Engine counts == a direct python re replay of the pinned
    conventions on randomized word+punctuation streams."""
    import re as _re

    rows = [
        (i, " ".join(w + p for w, p in words))
        for i, words in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in textstats.readability_scores(df).collect()
    }
    for i, text in rows:
        n_words = len([w for w in _re.split(r"\s+", text) if w])
        runs = len(_re.findall(r"[.!?]+", text))
        n_syll = len(_re.findall(r"[aeiouy]+", text.lower()))
        n_sent = max(runs, 1) if n_words else 0
        r = got[i]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (
            n_words, n_sent, n_syll,
        ), text
        if n_words:
            wps, spw = n_words / n_sent, n_syll / n_words
            assert r["flesch_reading_ease"] == round(
                206.835 - 1.015 * wps - 84.6 * spw, 6
            )
        else:
            assert r["flesch_reading_ease"] is None


@settings(**_PROP)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "A", "b", "c", "dd", "ee", "ff"]), max_size=8
        ),
        min_size=1,
        max_size=5,
    ),
    k=st.integers(min_value=1, max_value=4),
)
def test_oov_stats_matches_python(spark, docs, k):
    """Engine OOV counts == a python replay of the deterministic
    (count desc, word asc) head-vocabulary cut."""
    from collections import Counter

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts = Counter(w.lower() for _, ws in enumerate(docs) for w in docs[_])
    vocab = {
        w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    }
    got = {r["doc_id"]: r for r in textstats.oov_stats(df, top_k=k).collect()}
    for i, words in enumerate(docs):
        low = [w.lower() for w in words]
        oov = sum(1 for w in low if w not in vocab)
        r = got[i]
        assert (r["n_tokens"], r["n_oov"]) == (len(low), oov), (i, words)
        want_ratio = round(oov / len(low), 6) if low else 0.0
        assert r["oov_ratio"] == want_ratio


def test_clean_corpus_readability_and_oov_stages(spark, tmp_path):
    """clean_corpus(min_flesch=..., max_oov_ratio=...): the readability
    band drops the 40-word-sentence wall and the wordless doc; the OOV
    cap drops the gibberish doc whose tokens sit outside the surviving
    corpus' own head vocabulary; passthrough columns survive."""
    from pagerank_mapreduce_implementation_spark.programs import clean_corpus

    easy = "The cat sat here. " * 5                     # short sentences
    wall = " ".join(["word"] * 60) + "."                # one 60-word sentence
    gib = "qzx vbnk wpl zzk qqj mmv " * 4               # off-vocab tokens
    docs = spark.createDataFrame(
        [
            (1, easy, "web"),
            (2, wall, "web"),
            (3, "", "web"),
            (4, (easy + " ") * 2 + gib, "web"),
        ],
        "doc_id long, text string, source string",
    )
    src = str(tmp_path / "in.parquet")
    docs.write.parquet(src)
    # flesch(easy) ~ 97 (wps 4, spw 1.25); flesch(wall) ~ 61 (wps 60,
    # spw 1.0) -> a 70 floor keeps the prose and drops the wall
    surv = clean_corpus(
        spark, src, str(tmp_path / "out_rd"), min_flesch=70.0
    )
    ids = sorted(r["doc_id"] for r in surv.collect())
    assert 2 not in ids and 3 not in ids and 1 in ids
    # OOV cap: vocab is dominated by the repeated easy words; doc 4's
    # gibberish tokens spike its ratio past 0.2
    surv2 = clean_corpus(
        spark, src, str(tmp_path / "out_oov"),
        max_oov_ratio=0.2, oov_top_k=6,
    )
    rows = {r["doc_id"]: r for r in surv2.collect()}
    assert 4 not in rows and 1 in rows
    assert rows[1]["source"] == "web"  # passthrough intact


# --- simhash banding recall audit -------------------------------------------


def test_simhash_recall_parity(spark, sf_dir, duck):
    from pagerank_mapreduce_implementation_spark.operators import dedup

    got = dedup.simhash_recall_report(Catalog(spark, sf_dir).documents)
    row = got.collect()[0]
    assert row["n_planted"] > 0 and row["n_qualifying"] > 0
    # the default config audits the beyond-pigeonhole regime
    # (max_hamming 8 > chunks-1 = 3), where banding CAN miss — a
    # recall pinned at 1.0 would mean the audit tests nothing here
    assert row["recall"] is not None and 0.0 < row["recall"] <= 1.0
    check(got, duck, oracles.simhash_recall_report_sql())


def test_simhash_recall_extremes(spark):
    """drop_rate=0 plants verbatim twins (hamming 0 — found by every
    chunk, recall 1.0); inside the pigeonhole guarantee
    (max_hamming <= chunks-1) recall is provably 1.0 on whatever
    qualifies; bad max_hamming fails loud."""
    from pagerank_mapreduce_implementation_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"tok{i}_{j}" for j in range(12)))
            for i in range(8)
        ],
        "doc_id long, text string",
    )
    r = dedup.simhash_recall_report(
        docs, drop_rate=0.0, sample_mod=2, max_hamming=8
    ).collect()[0]
    assert r["n_planted"] == 4 and r["n_qualifying"] == 4
    assert r["hits"] == 4 and r["recall"] == 1.0
    r2 = dedup.simhash_recall_report(
        docs, drop_rate=0.4, sample_mod=2, max_hamming=3, chunks=4
    ).collect()[0]
    # pigeonhole: any pair within hamming 3 shares one of 4 chunks
    assert r2["n_planted"] == 4
    if r2["n_qualifying"] > 0:
        assert r2["recall"] == 1.0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.simhash_recall_report(docs, max_hamming=-1)


# --- analytic LSH config sweep ----------------------------------------------


def test_lsh_expected_recall_parity(spark, sf_dir, duck):
    from pagerank_mapreduce_implementation_spark.operators import dedup

    got = dedup.lsh_expected_recall(Catalog(spark, sf_dir).documents)
    rows = {(r["num_hashes"], r["bands"]): r for r in got.collect()}
    assert all(r["n_qualifying"] > 0 for r in rows.values())
    check(got, duck, oracles.lsh_expected_recall_sql())


def test_lsh_expected_recall_semantics(spark):
    """Verbatim twins (s = 1) predict recall 1.0 under every config;
    at fixed rows_per_band more bands can only help; s50 is the
    textbook (1/b)^(1/r) midpoint; invalid configs fail loud."""
    from pagerank_mapreduce_implementation_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{i}_{j}" for j in range(12))) for i in range(8)],
        "doc_id long, text string",
    )
    rows = {
        (r["num_hashes"], r["bands"]): r
        for r in dedup.lsh_expected_recall(
            docs, drop_rate=0.0, sample_mod=2, threshold=0.5
        ).collect()
    }
    for (nh, b), r in rows.items():
        assert r["expected_recall"] == 1.0 and r["n_qualifying"] == 4
        assert r["s50_similarity"] == round((1.0 / b) ** (b / nh), 6)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup.lsh_expected_recall(docs, configs=((16, 3),))  # 3 ∤ 16
    with _pytest.raises(ValueError):
        dedup.lsh_expected_recall(docs, configs=())


def test_lsh_expected_recall_validates_against_realized_audit(spark, sf_dir):
    """The analytic prediction must track what the deterministic
    pipeline actually realizes: at the audits' shared (16, 4) config
    and planting, |predicted - realized| stays within sampling noise
    (~sqrt(sum p(1-p))/n of the 50 planted Bernoullis), and more
    bands predict monotonically more recall at fixed rows_per_band."""
    from pagerank_mapreduce_implementation_spark.operators import dedup

    docs = Catalog(spark, sf_dir).documents
    realized = dedup.minhash_recall_report(
        docs, drop_rate=0.15, sample_mod=10, threshold=0.3, ngram=2
    ).collect()[0]
    pred = {
        (r["num_hashes"], r["bands"]): r["expected_recall"]
        for r in dedup.lsh_expected_recall(docs).collect()
    }
    assert abs(pred[(16, 4)] - realized["recall"]) <= 0.2
    assert pred[(8, 2)] < pred[(16, 4)] < pred[(32, 8)]


# --- round-15 staged (r17 candidate): Zipf rank-frequency audit -------------


def test_zipf_fit_parity(spark, sf_dir, duck):
    got = textstats.zipf_fit(Catalog(spark, sf_dir).documents, top_k=100)
    n_groups = got.count()
    assert n_groups >= 2, "vacuous: fewer than two sources"
    assert got.filter(F.col("zipf_slope").isNotNull()).count() == n_groups
    check(got, duck, oracles.zipf_fit_sql(100))


def test_zipf_fit_semantics(spark):
    """Hand-checkable groups: a two-point group fits exactly (slope -2,
    intercept log10(8), r2 = 1); an all-hapax group is a flat line with
    undefined r2 (vary = 0); a single-type group has no line at all
    (varx = 0 -> NULL slope/intercept/r2)."""
    docs = spark.createDataFrame(
        [
            ("g1", " ".join(["aa"] * 8 + ["bb"] * 2)),
            ("g2", "x y z"),
            ("g3", "solo solo solo"),
        ],
        "source string, text string",
    )
    rows = {
        r["source"]: r for r in textstats.zipf_fit(docs, top_k=10).collect()
    }
    g1 = rows["g1"]
    assert g1["n_tokens"] == 10 and g1["n_types"] == 2
    assert g1["hapax_ratio"] == 0.0
    assert g1["zipf_slope"] == pytest.approx(-2.0, abs=1e-6)
    assert g1["zipf_intercept"] == pytest.approx(0.903090, abs=1e-6)
    assert g1["zipf_r2"] == pytest.approx(1.0, abs=1e-6)
    g2 = rows["g2"]
    assert g2["n_types"] == 3 and g2["hapax_ratio"] == 1.0
    assert g2["zipf_slope"] == 0.0 and g2["zipf_intercept"] == 0.0
    assert g2["zipf_r2"] is None  # all counts equal: vary = 0
    g3 = rows["g3"]
    assert g3["n_tokens"] == 3 and g3["n_types"] == 1
    assert g3["zipf_slope"] is None and g3["zipf_intercept"] is None
    assert g3["zipf_r2"] is None  # one rank: varx = 0
    with pytest.raises(ValueError, match=">= 2"):
        textstats.zipf_fit(docs, top_k=1)


def test_zipf_fit_head_prunes_before_window(spark, sf_dir):
    """The rank filter must plan WindowGroupLimit (per-partition top_k
    prune BEFORE the window shuffle), the OLS join must broadcast, and
    no Python appears anywhere."""
    df = textstats.zipf_fit(Catalog(spark, sf_dir).documents, top_k=100)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in p
    assert "SortMergeJoin" not in p
    assert "Python" not in p


def test_clean_corpus_zipf_bands_drop_whole_source(spark, tmp_path):
    """clean_corpus(zipf_bands=...): a natural-ish source (distinct
    word frequencies, negative slope) survives; a template-farm source
    (every doc the same few words at equal counts -> flat line, NULL or
    ~0 r2) drops AS A WHOLE; unknown band keys raise."""
    from pagerank_mapreduce_implementation_spark.programs import clean_corpus

    natural = [
        "the the the the cat cat sat on a mat today quietly",
        "the the cat ran far away from the big dog yesterday",
    ]
    template = ["buy now click here"] * 3
    rows = (
        [(i, t, "web") for i, t in enumerate(natural)]
        + [(10 + i, t, "farm") for i, t in enumerate(template)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    src = str(tmp_path / "in.parquet")
    docs.write.parquet(src)
    surv = clean_corpus(
        spark, src, str(tmp_path / "out_zipf"),
        zipf_bands={"max_slope": -0.1, "top_k": 20},
    )
    out = {r["doc_id"]: r["source"] for r in surv.collect()}
    assert set(out.values()) == {"web"}, out      # farm dropped wholesale
    assert set(out) == {0, 1}
    with pytest.raises(ValueError, match="unknown keys"):
        clean_corpus(
            spark, src, str(tmp_path / "out_bad"),
            zipf_bands={"slope_min": -1.0},
        )
    # r15 advice: bands are native Column comparisons, so inf is a
    # legal (vacuous) threshold rather than an unparsable SQL string
    surv_inf = clean_corpus(
        spark, src, str(tmp_path / "out_inf"),
        zipf_bands={"max_slope": float("inf"), "top_k": 20},
    )
    # slope <= inf is vacuous, so BOTH sources survive the band; the
    # pipeline's standing exact-dedup still collapses the 3 identical
    # template docs to one survivor: web(2) + farm(1)
    out_inf = [r["source"] for r in surv_inf.collect()]
    assert sorted(out_inf) == ["farm", "web", "web"]


# --- round-15 staged (r17 candidate): cross-source mirror audit -------------


def test_source_overlap_parity_with_planted_mirror(spark, sf_dir, duck):
    """The synthetic corpus has no cross-source exact dups, so the
    parity run PLANTS a mirror: every doc_id % 7 == 0 re-labeled as
    source 'mirrorX' and unioned in (the recall-report convention —
    the oracle replays the identical plant), guaranteeing non-vacuous
    shared mass between the mirror and every real source it copies."""
    from pagerank_mapreduce_implementation_spark.operators import dedup

    docs = Catalog(spark, sf_dir).documents
    planted = docs.unionByName(
        docs.filter(F.col("doc_id") % 7 == 0).withColumn(
            "source", F.lit("mirrorX")
        )
    )
    got = dedup.source_overlap(planted, min_shared=1)
    assert got.count() > 0, "vacuous: plant produced no shared pairs"
    # 'mirrorX' < 'srcN' lexicographically, so the plant lands on the
    # source_a side of every pair it joins
    assert got.filter(F.col("source_a") == "mirrorX").count() > 0
    oracle = oracles.source_overlap_sql(min_shared=1).replace(
        "FROM documents",
        "FROM (SELECT * FROM documents UNION ALL "
        "SELECT * REPLACE ('mirrorX' AS source) FROM documents "
        "WHERE doc_id % 7 = 0)",
    )
    check(got, duck, oracle)


def test_source_overlap_semantics(spark):
    """Hand-built sets: A={t1,t2,t3}, B={t2,t3,t4} (shared 2,
    jaccard 0.5, containments 2/3), C={t9} disjoint (no row);
    fingerprints are whitespace/case-insensitive so 'T1' and ' t1 '
    collapse; min_shared=3 empties the report; min_shared=0 raises."""
    from pagerank_mapreduce_implementation_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "t1", "A"), (2, "t2", "A"), (3, "t3", "A"),
            (4, "T1  ", "A"),          # same fingerprint as doc 1
            (5, "t2", "B"), (6, "t3", "B"), (7, "t4", "B"),
            (8, "t9", "C"),
        ],
        "doc_id long, text string, source string",
    )
    rows = dedup.source_overlap(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_a"], r["source_b"]) == ("A", "B")
    assert r["n_shared"] == 2 and r["n_fp_a"] == 3 and r["n_fp_b"] == 3
    assert r["jaccard"] == 0.5
    assert r["containment_a"] == round(2 / 3, 6) == r["containment_b"]
    assert dedup.source_overlap(docs, min_shared=3).count() == 0
    with pytest.raises(ValueError, match=">= 1"):
        dedup.source_overlap(docs, min_shared=0)


def test_source_overlap_broadcasts_totals(spark, sf_dir):
    """The per-source totals join back as broadcasts (|sources| rows);
    the only corpus-scale shuffles are the distinct and the
    fingerprint-keyed self-join — no sort-merge join, no Python."""
    from pagerank_mapreduce_implementation_spark.operators import dedup

    df = dedup.source_overlap(Catalog(spark, sf_dir).documents)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in p
    assert "Python" not in p
    assert p.count("BroadcastHashJoin") >= 2


def test_ngram_source_overlap_parity(spark, sf_dir, duck):
    from pagerank_mapreduce_implementation_spark.operators import dedup

    got = dedup.ngram_source_overlap(Catalog(spark, sf_dir).documents, ngram=5)
    assert got.count() > 0, "vacuous: no source pair shares a shingle"
    check(got, duck, oracles.ngram_source_overlap_sql(5))


def test_ngram_source_overlap_semantics(spark):
    """Partial mirror: B carries A's exact sentence inside different
    boilerplate — ZERO exact-fingerprint overlap but high shingle
    containment; C is disjoint; min_jaccard filters; bad args raise."""
    from pagerank_mapreduce_implementation_spark.operators import dedup

    core = "one two three four five six"          # 2 distinct 5-grams
    docs = spark.createDataFrame(
        [
            (1, core, "A"),
            (2, "intro words here then " + core + " outro tail words", "B"),
            (3, "totally different words in every position here", "C"),
        ],
        "doc_id long, text string, source string",
    )
    assert dedup.source_overlap(docs).count() == 0  # exact audit is blind
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in dedup.ngram_source_overlap(docs, ngram=5).collect()
    }
    r = rows[("A", "B")]
    assert r["n_shared"] == 2 and r["n_sh_a"] == 2     # A is fully contained
    assert r["containment_a"] == 1.0
    assert ("A", "C") not in rows and ("B", "C") not in rows
    assert (
        dedup.ngram_source_overlap(docs, ngram=5, min_jaccard=0.9).count() == 0
    )
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        dedup.ngram_source_overlap(docs, min_jaccard=1.5)
    # ngram=0 would shingle everything to '' (all pairs ~1.0, silently)
    with pytest.raises(ValueError, match="ngram"):
        dedup.ngram_source_overlap(docs, ngram=0)
    with pytest.raises(ValueError, match="ngram"):
        oracles.ngram_source_overlap_sql(ngram=-1)


def test_ngram_source_overlap_broadcasts_totals(spark, sf_dir):
    from pagerank_mapreduce_implementation_spark.operators import dedup

    df = dedup.ngram_source_overlap(Catalog(spark, sf_dir).documents, ngram=5)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in p
    assert "Python" not in p
    assert p.count("BroadcastHashJoin") >= 2


# --- round-16 staged (r17 candidate): within-doc keep-first dedup -----------


def test_intra_doc_line_dedup_parity(spark, sf_dir, duck):
    """The registered form (sep=' ': the flat corpus' actual separator,
    so 'lines' are words and repeats are plentiful) vs the list-lambda
    SQL replay — text behind md5 so the byte-exact rebuild is what the
    hash certifies."""
    from pagerank_mapreduce_implementation_spark.operators import dedup

    out = dedup.intra_doc_line_dedup(
        Catalog(spark, sf_dir).documents, sep=" "
    )
    got = out.select(
        "doc_id", F.md5("text").alias("text_md5"), "n_dropped_lines"
    )
    assert got.filter(F.col("n_dropped_lines") > 0).count() > 0  # non-vacuous
    check(got, duck, oracles.intra_doc_line_dedup_sql(sep=" "))


def test_intra_doc_line_dedup_semantics(spark):
    """Hand-checked: the page's own repeated nav line drops (second
    copy), blank-line runs survive (exempt), clean docs pass through
    BYTE-identical, the corpus-global twin would have dropped MORE
    (doc 2's line matches doc 1's — intra-doc keeps it), bad args
    raise."""
    from pagerank_mapreduce_implementation_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "nav bar\ncontent one\nnav bar\n\n\ncontent two", "web"),
            (2, "nav bar\nits own content", "web"),
            (3, "clean doc", "web"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r["doc_id"]: r for r in dedup.intra_doc_line_dedup(docs).collect()}
    assert rows[1]["text"] == "nav bar\ncontent one\n\n\ncontent two"
    assert rows[1]["n_dropped_lines"] == 1
    # intra-doc scope: doc 2 KEEPS its nav bar (doc 1 owns a copy, but
    # no corpus-global key table exists here — that's line_dedup's job)
    assert rows[2]["text"] == "nav bar\nits own content"
    assert rows[2]["n_dropped_lines"] == 0
    assert rows[3]["text"] == "clean doc" and rows[3]["n_dropped_lines"] == 0
    # key normalization: case-insensitive, trim-insensitive
    fold = dedup.intra_doc_line_dedup(
        spark.createDataFrame(
            [(1, "The Nav\n the nav \nbody", "web")],
            "doc_id long, text string, source string",
        )
    ).collect()[0]
    assert fold["text"] == "The Nav\nbody" and fold["n_dropped_lines"] == 1
    with pytest.raises(ValueError, match="min_line_chars"):
        dedup.intra_doc_line_dedup(docs, min_line_chars=0)
    with pytest.raises(ValueError, match="min_line_chars"):
        oracles.intra_doc_line_dedup_sql(min_line_chars=0)


def test_intra_doc_line_dedup_zero_shuffle_plan(spark, sf_dir):
    """The reason it exists beside line_dedup: the whole pass is one
    narrow projection — no Exchange of any kind, no Python, scan
    pruned to the used columns."""
    from pagerank_mapreduce_implementation_spark.operators import dedup

    df = dedup.intra_doc_line_dedup(Catalog(spark, sf_dir).documents, sep=" ")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "Python" not in p


def test_clean_corpus_intra_line_dedup_stage(spark, tmp_path):
    """clean_corpus(intra_line_dedup=...): the within-doc pass strips a
    doc's OWN repeated line before anything corpus-global runs — doc 1
    loses its duplicate chorus but survives; doc 2's single copy of the
    same line is untouched (intra-doc scope); the rebuilt text is what
    lands in the output parquet."""
    from pagerank_mapreduce_implementation_spark.programs import clean_corpus

    rows = [
        (1, "chorus line\nverse one\nchorus line\nverse two", "en", "web", 44),
        (2, "chorus line\nits own verse", "en", "web", 25),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    src = str(tmp_path / "in.parquet")
    docs.write.parquet(src)
    surv = clean_corpus(
        spark, src, str(tmp_path / "out"),
        intra_line_dedup={"sep": "\n"},
    )
    out = {r["doc_id"]: r["text"] for r in surv.collect()}
    assert out[1] == "chorus line\nverse one\nverse two"
    assert out[2] == "chorus line\nits own verse"


# --- round-16 staged (r17 candidate): source distribution divergence --------


def test_source_unigram_divergence_parity(spark, sf_dir, duck):
    got = textstats.source_unigram_divergence(Catalog(spark, sf_dir).documents)
    rows = got.collect()
    assert len(rows) > 0
    assert all(0.0 <= r["jsd"] <= 1.0 for r in rows)
    # the synthetic sources draw from one vocabulary: distributions
    # must be CLOSE but not identical (0 would mean a vacuous gate)
    assert all(0.0 < r["jsd"] < 0.5 for r in rows)
    check(got, duck, oracles.source_unigram_divergence_sql())


def test_source_unigram_divergence_semantics(spark):
    """Hand-checked JSD on two tiny distributions (A: a a b, B: a c —
    shared mass via 'a' only, exclusive words contribute their own
    probability), identical sources land at exactly 0.0 (and +0.0, not
    -0.0), disjoint-vocabulary pairs are NOT emitted (the
    source_overlap convention), case folds."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "a A b", "X"),
            (2, "a c", "Y"),
            (3, "a a b", "X2"),
            (4, "A a b", "X3"),
            (5, "zz qq", "Z"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in textstats.source_unigram_divergence(docs).collect()
    }
    pa, qa = 2 / 3, 1 / 2
    m = pa + qa
    term = pa * math.log2(2 * pa / m) + qa * math.log2(2 * qa / m)
    want = round((term + (1 - pa) + (1 - qa)) / 2, 6)
    r = rows[("X", "Y")]
    assert r["jsd"] == pytest.approx(want, abs=2e-6)
    assert r["shared_types"] == 1
    assert (r["n_types_a"], r["n_types_b"]) == (2, 2)
    # identical distributions: exactly zero, positive zero
    assert rows[("X", "X2")]["jsd"] == 0.0
    assert math.copysign(1.0, rows[("X", "X2")]["jsd"]) == 1.0
    assert rows[("X2", "X3")]["jsd"] == 0.0
    # Z shares no type with anyone: absent from the emission
    assert not any("Z" in k for k in rows)


def test_source_unigram_divergence_plan(spark, sf_dir):
    """Scale claims on the executed plan: per-group totals join back
    as BROADCAST (never a shuffle join on the word-keyed frame), and
    the word self-join is the only sort-merge exchange pair."""
    df = textstats.source_unigram_divergence(Catalog(spark, sf_dir).documents)
    df.collect()
    p = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("+- == Initial Plan ==")[0]
    )
    assert "BroadcastHashJoin" in p


# --- round-16 staged (r17 candidate): leakage-safe splits --------------------


def test_cluster_safe_split_parity(spark, sf_dir, duck):
    """The registered form: minhash near-dup pairs (the dedup_clusters
    input) -> star-CC cluster representatives -> hash_split on the
    representative — vs the recursive-CTE + identical md5 arithmetic
    replay."""
    from pagerank_mapreduce_implementation_spark.operators import dedup
    from pagerank_mapreduce_implementation_spark.operators.sampling import (
        cluster_safe_split,
    )

    docs = Catalog(spark, sf_dir).documents
    pairs = dedup.minhash_near_dups(docs, threshold=0.5, ngram=5)
    got = cluster_safe_split(docs, pairs)
    rows = got.collect()
    assert len(rows) == docs.count()
    # non-vacuous: at least one doc is keyed by a DIFFERENT id (its
    # cluster representative), i.e. the guard actually re-keyed docs
    assert any(r["doc_id"] != r["split_key"] for r in rows)
    check(
        got,
        duck,
        oracles.cluster_safe_split_sql(
            "SELECT doc_a, doc_b FROM ("
            + oracles.minhash_near_dups_sql(0.5, ngram=5)
            + ")"
        ),
    )


def test_cluster_safe_split_semantics(spark):
    """The leakage guarantee, hand-checked: a 3-doc chain cluster
    {1,2,3} (transitive through 2 — pairwise minhash would never put
    1-3 in a pair) lands in ONE split keyed by min id 1; singleton 4
    splits exactly as plain hash_split(salt) would; same-cluster docs
    NEVER straddle the boundary regardless of their own ids' buckets."""
    from pagerank_mapreduce_implementation_spark.operators.sampling import (
        cluster_safe_split,
        hash_split,
    )

    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    rows = {r["doc_id"]: r for r in cluster_safe_split(docs, pairs).collect()}
    assert {rows[i]["split_key"] for i in (1, 2, 3)} == {1}
    assert len({rows[i]["split"] for i in (1, 2, 3)}) == 1
    assert len({rows[i]["bucket"] for i in (1, 2, 3)}) == 1
    assert rows[4]["split_key"] == 4
    plain = {
        r["doc_id"]: r
        for r in hash_split(docs, "doc_id").collect()
    }
    # singleton inherits the exact plain assignment; the cluster
    # inherits the REPRESENTATIVE's
    assert rows[4]["bucket"] == plain[4]["bucket"]
    assert rows[1]["bucket"] == plain[1]["bucket"]
    assert rows[3]["bucket"] == plain[1]["bucket"]


# --- retirement twins (README §Registry capacity, endgame rule 4) ------------


def test_word_count_boundary_jar_exact_tokenizer(spark):
    """Pytest twin pinning word_count_boundary's certified semantics
    (retirement precondition: a registered query may only be retired
    once a local test freezes what its driver gate certified): the
    jar-exact ``\\s*\\b\\s*`` split keeps punctuation RUNS as tokens
    (',' and '!!' count), never glues them to words, and drops
    empties."""
    from pagerank_mapreduce_implementation_spark.operators import text

    docs = spark.createDataFrame(
        [(1, "a, b!! c"), (2, "x,y")], "doc_id long, text string"
    )
    rows = {
        (r["word"], r["cnt"])
        for r in text.word_count(docs, pattern=text.TOKEN_BOUNDARY_RE).collect()
    }
    assert rows == {
        ("a", 1), (",", 2), ("b", 1), ("!!", 1), ("c", 1), ("x", 1), ("y", 1)
    }


# --- round-16 staged (r17 candidate): incremental embedding dedup -----------


def test_incremental_embedding_dedup_parity(spark, sf_dir, duck):
    """The registered form: store = vec_id % 3 == 0, batch = the rest;
    banded hyperplane candidates + exact cosine verify on both the
    store probe and the in-batch keep-first pass, vs the same-planes
    SQL replay."""
    from pagerank_mapreduce_implementation_spark.operators import dedup

    emb = Catalog(spark, sf_dir).embeddings
    seen = emb.filter(F.col("vec_id") % 3 == 0)
    new = emb.filter(F.col("vec_id") % 3 != 0)
    got = dedup.incremental_embedding_dedup(new, seen, threshold=0.25)
    rows = got.collect()
    assert len(rows) == new.count()
    # non-vacuous on every axis the gate certifies
    assert any(r["dup_of_store"] == 1 for r in rows)
    assert any(r["dup_of_batch"] == 1 for r in rows)
    assert any(r["keep"] == 1 for r in rows)
    check(
        got,
        duck,
        oracles.incremental_embedding_dedup_sql(
            "vec_id % 3 = 0", "vec_id % 3 <> 0", threshold=0.25
        ),
    )


def test_incremental_embedding_dedup_semantics(spark):
    """Hand-checked flags: a batch vector aligned with a stored one is
    dup_of_store; two aligned batch vectors flag only the HIGHER id as
    dup_of_batch (keep-first — the lower id stands in); an orthogonal
    vector keeps; flags compose (a vector can be both)."""
    from pagerank_mapreduce_implementation_spark.operators import dedup

    seen = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    new = spark.createDataFrame(
        [
            (10, [2.0, 0.0, 0.0, 0.0]),   # parallel to store 1 AND to 11
            (11, [1.0, 0.0, 0.0, 0.0]),   # parallel to store 1 and batch 10
            (12, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to everything
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {
        r["vec_id"]: r
        for r in dedup.incremental_embedding_dedup(
            new, seen, threshold=0.9
        ).collect()
    }
    assert rows[10]["dup_of_store"] == 1 and rows[10]["dup_of_batch"] == 0
    assert rows[11]["dup_of_store"] == 1 and rows[11]["dup_of_batch"] == 1
    assert rows[12]["dup_of_store"] == 0 and rows[12]["dup_of_batch"] == 0
    assert (rows[10]["keep"], rows[11]["keep"], rows[12]["keep"]) == (0, 0, 1)


# --- round-16 staged (r17 candidate): streaming cosine probe -----------------


def test_streaming_cosine_probe_parity_and_batch_twin(spark, sf_dir, duck):
    """The streaming semantic probe (embeddings stream vec_id % 3 != 0
    vs the static store of the rest) is row-identical to the batch
    store verdict AND to the DuckDB min-per-vector replay of the
    same-planes cross-table match — the minhash-probe certification
    pattern."""
    from pagerank_mapreduce_implementation_spark import streaming as strm
    from pagerank_mapreduce_implementation_spark.operators import similarity

    emb_stream = strm.read_table_stream(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 3 != 0
    )
    seen = Catalog(spark, sf_dir).embeddings.filter(F.col("vec_id") % 3 == 0)
    out = strm.queries.streaming_cosine_probe(
        emb_stream, seen, threshold=0.25
    )
    strm.run_to_memory(out, "_test_cos_probe", state_partitions=8)
    got = spark.table("_test_cos_probe")
    assert got.count() > 0  # non-vacuous at this threshold
    # batch twin: min store match per stream vector via the same op
    # family the probe composes
    batch = (
        similarity.cosine_matches_ab(
            seen,
            Catalog(spark, sf_dir).embeddings.filter(F.col("vec_id") % 3 != 0),
            0.25,
        )
        .groupBy(F.col("id_b").alias("vec_id"))
        .agg(F.min("id_a").alias("dup_store_id"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, batch.collect())
    )
    check(
        got,
        duck,
        "SELECT id_b AS vec_id, min(id_a) AS dup_store_id FROM ("
        + oracles.cosine_matches_ab_sql(
            "vec_id % 3 = 0", "vec_id % 3 <> 0", 0.25
        )
        + ") GROUP BY 1",
    )
    spark.catalog.dropTempView("_test_cos_probe")


def test_streaming_cosine_probe_semantics(spark, tmp_path):
    """Hand-checked: a streamed vector parallel to a stored one reports
    the SMALLEST matching store id; an orthogonal one is absent."""
    from pagerank_mapreduce_implementation_spark import streaming as strm

    seen = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "stream_emb")
    spark.createDataFrame(
        [(10, [2.0, 0.0]), (11, [0.0, -3.0])],
        "vec_id long, embedding array<double>",
    ).write.parquet(path)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<double>"
    ).parquet(path)
    out = strm.queries.streaming_cosine_probe(stream, seen, threshold=0.9)
    strm.run_to_memory(out, "_test_cos_sem", state_partitions=4)
    rows = {r["vec_id"]: r["dup_store_id"] for r in spark.table("_test_cos_sem").collect()}
    assert rows == {10: 1}  # min of stores {1, 2}; 11 anti-parallel to 3
    spark.catalog.dropTempView("_test_cos_sem")
