"""Perceptual-hash goldens + recall checks (round-7 verdict item 2c):
PIL-free — the PPM codec chain is vendored, so these run everywhere
(unlike test_multimodal_injection.py, which needs Pillow)."""

from __future__ import annotations

from pagerank_mapreduce_implementation_spark.operators import multimodal as mm


def test_ppm_ahash_golden_gray_ramp():
    """Hand-computable golden for the average hash: an 8x8 gray ramp
    0..63 (r=g=b) has mean 31.5, so exactly bits 32..59 of the 60-bit
    hash are set — no resampling involved at grid size."""
    import numpy as np

    ramp = np.arange(64, dtype=np.uint8).reshape(8, 8)
    img = mm.ppm_encode(np.stack([ramp] * 3, axis=2))
    assert mm.ppm_ahash(img) == (1 << 60) - (1 << 32)


def test_ppm_ahash_matches_analytic_formula_through_resample():
    """The 16x16 test image is 2x2-constant cells, so the nearest-
    neighbor resample must read back exactly the 8x8 cell bytes: the
    hash equals the analytic mean-threshold over the md5 cell values —
    the same formula the driver oracle reconstructs in SQL."""
    import hashlib

    for doc_id in (0, 1, 5, 42):
        g, r = doc_id // 4, doc_id % 4
        v = []
        for j in range(64):
            byte = int(hashlib.md5(f"{g}:{j}".encode()).hexdigest()[:2], 16)
            v.append(255 - byte if 15 * r <= j < 15 * r + 4 else byte)
        mean = sum(v) / 64.0
        expected = sum(1 << j for j in range(60) if v[j] >= mean)
        assert mm.ppm_ahash(mm.phash_test_image(doc_id)) == expected


def test_phash_near_dups_finds_recompressed_copy(spark):
    """Behavioral recall check: a lightly-edited copy (one inverted
    cell) lands within a few Hamming bits of its original and is
    paired; an unrelated image is not."""
    import hashlib

    import numpy as np

    def img(seed, flip=None):
        cells = np.array(
            [
                int(hashlib.md5(f"{seed}:{j}".encode()).hexdigest()[:2], 16)
                for j in range(64)
            ],
            dtype=np.int64,
        )
        if flip is not None:
            cells[flip] = 255 - cells[flip]
        c8 = cells.reshape(8, 8).astype(np.uint8)
        px = np.repeat(np.repeat(c8, 2, axis=0), 2, axis=1)
        return mm.ppm_encode(np.stack([px] * 3, axis=2))

    blobs = spark.createDataFrame(
        [(1, img("x")), (2, img("x", flip=7)), (3, img("unrelated"))],
        "doc_id long, content binary",
    )
    pairs = {
        (r.doc_a, r.doc_b)
        for r in mm.phash_near_dups(blobs, max_hamming=10, materialize=False).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
