"""Fingerprinting + sketch operators: winnowing, CDC chunking, HLL.

Each operator is checked against an independent plain-Python reference
on randomized inputs, plus its published structural guarantee
(winnowing: shared substrings of length >= w+k-1 share a fingerprint;
CDC: boundaries are edit-local; HLL: registers merge by max).
"""

import hashlib
import math

import numpy as np
import pytest

from pyspark.sql import functions as F


# --- plain-Python references -------------------------------------------------

_B, _P = 1000003, 2147483647


def _py_gram_hash(g: str) -> int:
    h = 0
    for c in g:
        h = (h * _B + ord(c)) % _P
    return h


def _py_winnow(text: str, k: int = 5, w: int = 4):
    ng = len(text) - k + 1
    if ng <= 0:
        return set()
    hs = [_py_gram_hash(text[i : i + k]) for i in range(ng)]
    nw = max(1, ng - w + 1)
    sel = set()
    for j in range(nw):
        win = hs[j : min(j + w, ng)]
        mh = min(win)
        # rightmost occurrence of the min in this window
        pos = max(i for i, h in enumerate(win, start=j) if h == mh)
        sel.add((pos + 1, mh))  # 1-based to match the SQL/Spark side
    return sel


def _py_cdc(text: str, k: int = 4, mod: int = 64):
    ng = len(text) - k + 1
    nb = sum(
        1 for i in range(max(0, ng)) if _py_gram_hash(text[i : i + k]) % mod == 0
    )
    return nb, nb + 1


def _py_hll_regs(tokens, p: int = 10):
    wbits = 60 - p
    regs = {}
    for t in tokens:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        b, w = h >> wbits, h & ((1 << wbits) - 1)
        rho = wbits + 1 if w == 0 else wbits + 1 - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def _py_hll_est(regs, p: int = 10):
    m = 1 << p
    wbits = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    denom_part = sum(1 << (wbits + 1 - mj) for mj in regs.values())
    denom = denom_part + (m - len(regs)) * (1 << (wbits + 1))
    raw = alpha * m * m * float(1 << (wbits + 1)) / float(denom)
    zeros = m - len(regs)
    if raw <= 2.5 * m and zeros > 0:
        return round(m * math.log(m / float(zeros)), 9)
    return round(raw, 9)


def _rand_texts(rng, n, alphabet="abcd ", lo=0, hi=60):
    return [
        "".join(rng.choice(list(alphabet), size=rng.integers(lo, hi)))
        for _ in range(n)
    ]


# --- winnowing ---------------------------------------------------------------


def test_winnow_matches_python_reference(spark):
    from spatialdata_spark.pipeline.fingerprints import winnow_fingerprints

    rng = np.random.default_rng(11)
    texts = _rand_texts(rng, 40)  # small alphabet -> plenty of hash ties
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.pos, r.fp)
        for r in winnow_fingerprints(df, k=5, w=4).collect()
    }
    want = {
        (i, pos, fp) for i, t in enumerate(texts) for pos, fp in _py_winnow(t)
    }
    assert got == want


def test_winnow_shared_substring_guarantee(spark):
    # any shared substring of length >= w + k - 1 = 8 must contribute
    # at least one fingerprint hash common to both documents
    from spatialdata_spark.pipeline.fingerprints import winnow_fingerprints

    rng = np.random.default_rng(13)
    shared = "".join(rng.choice(list("xyz "), size=20))
    a = "".join(rng.choice(list("abcd "), size=30)) + shared
    b = shared + "".join(rng.choice(list("efgh "), size=30))
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    rows = winnow_fingerprints(df, k=5, w=4).collect()
    fps0 = {r.fp for r in rows if r.doc_id == 0}
    fps1 = {r.fp for r in rows if r.doc_id == 1}
    assert fps0 & fps1


def test_winnow_short_documents_single_window(spark):
    # fewer than w grams -> exactly one window -> exactly one fingerprint
    from spatialdata_spark.pipeline.fingerprints import winnow_fingerprints

    df = spark.createDataFrame(
        [(0, "abcdef"), (1, "abcd"), (2, "ab")], "doc_id long, text string"
    )
    rows = winnow_fingerprints(df, k=5, w=4).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append((r.pos, r.fp))
    assert len(per_doc.get(0, [])) == 1  # 2 grams < w
    assert len(per_doc.get(1, [])) == 0  # shorter than k: no grams
    assert 2 not in per_doc


# --- CDC chunking ------------------------------------------------------------


def test_cdc_matches_python_reference(spark):
    from spatialdata_spark.pipeline.fingerprints import cdc_chunk_stats

    rng = np.random.default_rng(17)
    texts = _rand_texts(rng, 40, alphabet="abcdefgh ", lo=0, hi=200)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_boundaries, r.n_chunks) for r in cdc_chunk_stats(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _py_cdc(t), (i, t)


def test_cdc_boundaries_are_edit_local(spark):
    # substituting one char can only affect boundaries whose k-gram
    # overlaps it: every boundary >= k positions away survives
    from spatialdata_spark.pipeline.fingerprints import cdc_chunk_stats

    rng = np.random.default_rng(19)
    t = "".join(rng.choice(list("abcdefgh "), size=400))
    edit_pos = 200
    t2 = t[:edit_pos] + ("z" if t[edit_pos] != "z" else "q") + t[edit_pos + 1 :]

    def boundaries(s, k=4, mod=64):
        return {
            i
            for i in range(len(s) - k + 1)
            if _py_gram_hash(s[i : i + k]) % mod == 0
        }

    b1, b2 = boundaries(t), boundaries(t2)
    far1 = {i for i in b1 if abs(i - edit_pos) >= 4}
    far2 = {i for i in b2 if abs(i - edit_pos) >= 4}
    assert far1 == far2  # the CDC property the operator exists for

    df = spark.createDataFrame([(0, t), (1, t2)], "doc_id long, text string")
    got = {r.doc_id: r.n_boundaries for r in cdc_chunk_stats(df).collect()}
    assert got[0] == len(b1) and got[1] == len(b2)


# --- HLL ---------------------------------------------------------------------


def test_hll_matches_python_reference(spark):
    from spatialdata_spark.pipeline.textstats import hll_distinct

    rng = np.random.default_rng(23)
    rows = []
    for g in ["g1", "g2"]:
        for _ in range(rng.integers(50, 120)):
            toks = " ".join(
                f"w{rng.integers(0, 300)}" for _ in range(rng.integers(1, 12))
            )
            rows.append((g, toks))
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r.source: (r.n_filled, r.est_hll) for r in hll_distinct(df).collect()}
    for g in ["g1", "g2"]:
        toks = [t for src, txt in rows if src == g for t in txt.split()]
        regs = _py_hll_regs(toks)
        assert got[g] == (len(regs), _py_hll_est(regs))


def test_hll_merge_by_register_max(spark):
    # sketch(A ∪ B) == merge(sketch(A), sketch(B)) by register max —
    # the property that makes HLL the distributed COUNT(DISTINCT)
    rng = np.random.default_rng(29)
    a = [f"t{rng.integers(0, 500)}" for _ in range(400)]
    b = [f"t{rng.integers(300, 900)}" for _ in range(400)]
    ra, rb, run = _py_hll_regs(a), _py_hll_regs(b), _py_hll_regs(a + b)
    merged = dict(ra)
    for k, v in rb.items():
        merged[k] = max(merged.get(k, 0), v)
    assert merged == run
    assert _py_hll_est(merged) == _py_hll_est(run)


def test_hll_estimate_accuracy_band(spark):
    # p=10 -> relative error ~1.04/sqrt(1024) ≈ 3.3%; assert within 5σ
    from spatialdata_spark.pipeline.textstats import hll_distinct

    rng = np.random.default_rng(31)
    n = 5000
    toks = rng.permutation([f"tok{i}" for i in range(n)])
    rows = [("g", " ".join(toks[i : i + 10])) for i in range(0, n, 10)]
    df = spark.createDataFrame(rows, "source string, text string")
    [r] = hll_distinct(df).collect()
    assert abs(r.est_hll - n) / n < 5 * 1.04 / math.sqrt(1024)


# --- DSIR --------------------------------------------------------------------


def test_dsir_weights_python_reference(spark):
    from spatialdata_spark.pipeline.filters import dsir_weights

    rng = np.random.default_rng(37)
    rows = []
    for i in range(60):
        lang = "en" if i % 3 else "de"
        n = rng.integers(2, 15)
        text = " ".join(f"w{rng.integers(0, 40)}" for _ in range(n))
        rows.append((i, lang, text))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.dsir_logweight)
        for r in dsir_weights(df, target_lang="en").collect()
    }

    m = 1024

    def bucket(bg):
        return int(hashlib.md5(bg.encode()).hexdigest()[:15], 16) % m

    ct, cr = {}, {}
    for _, lang, text in rows:
        ws = text.split()
        for x, y in zip(ws, ws[1:]):
            b = bucket(f"{x} {y}")
            cr[b] = cr.get(b, 0) + 1
            if lang == "en":
                ct[b] = ct.get(b, 0) + 1
    nr, nt = sum(cr.values()), sum(ct.values())
    for i, lang, text in rows:
        ws = text.split()
        if len(ws) < 2:
            assert i not in got
            continue
        w = sum(
            math.log(ct.get(bucket(f"{x} {y}"), 0) + 1)
            - math.log(nt + m)
            - math.log(cr.get(bucket(f"{x} {y}"), 0) + 1)
            + math.log(nr + m)
            for x, y in zip(ws, ws[1:])
        )
        assert got[i][0] == len(ws) - 1
        assert got[i][1] == pytest.approx(round(w, 6), abs=2e-6)


def test_dsir_target_docs_score_higher(spark):
    # documents drawn from the target vocabulary must out-score
    # documents drawn from a disjoint vocabulary
    from spatialdata_spark.pipeline.filters import dsir_weights

    rng = np.random.default_rng(41)
    rows = []
    for i in range(40):
        text = " ".join(f"en{rng.integers(0, 20)}" for _ in range(10))
        rows.append((i, "en", text))
    for i in range(40, 80):
        text = " ".join(f"de{rng.integers(0, 20)}" for _ in range(10))
        rows.append((i, "de", text))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: r.dsir_logweight for r in dsir_weights(df, "en").collect()}
    en_min = min(v for k, v in got.items() if k < 40)
    de_max = max(v for k, v in got.items() if k >= 40)
    assert en_min > de_max


# --- embedding pooling -------------------------------------------------------


def test_pool_embeddings_fixed_point_exact(spark):
    from spatialdata_spark.pipeline.clustering import pool_embeddings

    rng = np.random.default_rng(43)
    rows = []
    for i in range(60):
        rows.append((i, int(i % 3), [float(x) for x in rng.normal(size=8)]))
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    got = {
        (r.label, r.pos): (r.n_vecs, r.mean_val)
        for r in pool_embeddings(df, q=100).collect()
    }
    by_label = {}
    for _, lab, v in rows:
        by_label.setdefault(lab, []).append(np.array(v, dtype=np.float32))
    for lab, vs in by_label.items():
        qsum = np.floor(np.stack(vs).astype(np.float64) * 100 + 0.5).astype(np.int64)
        s = qsum.sum(axis=0)
        for d in range(8):
            n, m = got[(lab, d)]
            assert n == len(vs)
            assert m == round(s[d] / (len(vs) * 100.0), 9)
