#!/usr/bin/env python
"""sim_ann_rp_rerank production-knob probe: does recall@10 hold at a
CONSTANT candidate-pool FRACTION as the corpus grows?  (VERDICT r11
item 5 — turning the "production raises RP_CAND with the corpus"
assertion into a measured row, the semdedup-width-probe precedent.)

Method: exact numpy recompute of the graded two-stage query — the
SAME md5-derived Rademacher sign matrix (mirrors
similarity._rp_sign_table bit-for-bit), the same 6-dp-rounded
16-dim sketch, sketch-COSINE stage-1 top-RP_CAND, exact-cosine
re-rank; recall@10 = |true exact top-10 ∩ candidate pool| / 10,
averaged over N_QUERIES held-out queries.

Corpora: the real sf0.1 embedding table (2000 vectors) is uniform on
the unit 64-sphere (measured: norms exactly 1.0, per-dim mean 0,
per-dim std 1/8 = 1/sqrt(64)); the scale-probe replicas DUPLICATE
vectors (recall against byte-copies is degenerate), so the 8x/32x/128x
corpora here are fresh draws from the SAME distribution (iid gaussian,
normalized) seeded deterministically — distribution-faithful where the
replicas cannot be.  The 1x row uses the real table, so the synthetic
rows are anchored against a real measurement.

Usage: python tools/rp_recall_probe.py            # fractions ∝ shipped 256/2000
"""

from __future__ import annotations

import hashlib
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

DIM = 64
RP_DIM = 16
SHIPPED_FRACTION = 256 / 2000  # the sf0.1 config sim_ann_rp_rerank ships
N_QUERIES = 50


def sign_matrix() -> np.ndarray:
    """Mirror similarity._rp_sign_table: s(i,j) = 1 - 2*(ascii(first
    hex char of md5('i:j')) % 2)."""
    s = np.empty((DIM, RP_DIM), dtype=np.float64)
    for i in range(DIM):
        for j in range(RP_DIM):
            h = hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0]
            s[i, j] = 1 - 2 * (ord(h) % 2)
    return s


def sketch(v: np.ndarray, s: np.ndarray) -> np.ndarray:
    # engine: ROUND(SUM(x*s) * 0.25, 6) + 0
    return np.round((v @ s) * 0.25, 6) + 0.0


def recall_at_fraction(vecs: np.ndarray, frac: float, rng: np.random.Generator) -> tuple[float, int]:
    n = len(vecs)
    cand_k = max(10, int(round(frac * n)))
    s = sign_matrix()
    sk = sketch(vecs, s)
    skn = sk / np.maximum(np.linalg.norm(sk, axis=1, keepdims=True), 1e-30)
    vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
    qids = rng.choice(n, size=min(N_QUERIES, n), replace=False)
    hits = 0
    for q in qids:
        exact = vn @ vn[q]
        exact[q] = -2.0
        true10 = set(np.argpartition(-exact, 10)[:10].tolist())
        skc = skn @ skn[q]
        skc[q] = -2.0
        pool = set(np.argpartition(-skc, cand_k)[:cand_k].tolist())
        hits += len(true10 & pool)
    return hits / (10 * len(qids)), cand_k


def main() -> None:
    import duckdb

    v = duckdb.sql(
        "SELECT embedding FROM "
        "read_parquet('/root/testdata/sf0.1/embeddings.parquet')"
    ).fetchnumpy()
    real = np.stack([np.asarray(x, dtype=np.float64) for x in v["embedding"]])
    rng = np.random.default_rng(42)
    rows = []
    for label, vecs in [
        ("1x-real (2000)", real),
        ("8x (16000)", None),
        ("32x (64000)", None),
        ("128x (256000)", None),
    ]:
        if vecs is None:
            n = int(label.split("(")[1].rstrip(")"))
            g = rng.standard_normal((n, DIM))
            vecs = g / np.linalg.norm(g, axis=1, keepdims=True)
        r, ck = recall_at_fraction(vecs, SHIPPED_FRACTION, rng)
        rows.append((label, ck, r))
        print(f"{label}: RP_CAND={ck} (fraction {SHIPPED_FRACTION:.3f}) "
              f"recall@10={r:.2f}")
    # fixed-RP_CAND contrast at the largest corpus (the honest r11
    # degradation, re-shown at scale)
    n = 256000
    g = rng.standard_normal((n, DIM))
    vecs = g / np.linalg.norm(g, axis=1, keepdims=True)
    r_fixed, _ = recall_at_fraction(vecs, 256 / n, rng)
    print(f"128x with FIXED RP_CAND=256 (fraction {256 / n:.4f}): "
          f"recall@10={r_fixed:.2f}")


if __name__ == "__main__":
    main()
