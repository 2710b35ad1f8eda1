"""Adversarial second oracles (VERDICT r4 #10).

The driver's correctness gate compares each Spark query against a
builder-authored DuckDB SQL oracle — a green row proves Spark-vs-DuckDB
agreement on the builder's own semantics. These tests de-risk that
caveat for five of the subtlest ops by recomputing the expected output
a THIRD way: an independently-derived pure-Python reference model that
shares no code with either the Spark op or the SQL oracle (only the
published formulas: md5-prefix hashing, MinHash/LSH banding, the
add-lambda bigram LM, Lee et al. span merging, BM25 + the utils.py
link-score rubric).

Covered:
  - incremental_dedup (ops/dedup.py)  — exact/near/kept classification
    of a delta vs a persisted minhash index, within-batch first-wins
  - lm_perplexity_filter (ops/lm.py)  — scaled-integer bigram NLL,
    backoff rungs, per-language ntile(3) terciles
  - duplicate_token_spans (ops/dedup.py) — corpus 8-gram frequency,
    gaps-and-islands span merge
  - crawl_contextual (engine loop)    — BFS + per-round BM25 head
    scoring folded into frontier priority (0.7/0.3 combine, clamps)
  - dedup_semantic (ops/similarity.py) — hash-derived IVF centroids,
    argmin cell assignment, same-cell lower-id max-cosine keeper

Each model consumes the same raw parquet inputs the registered query
consumes and must match the Spark result row-for-row.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# -- shared pure-Python primitives (derived from the published specs,
#    not from the library code) ---------------------------------------------

def h64(s: str, seed=None) -> int:
    """60-bit cross-engine hash: int of the first 15 hex chars of md5."""
    if seed is not None:
        s = f"{seed}:{s}"
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def ngrams(text: str, n: int) -> list[str]:
    """Word n-grams on single-space tokens; a doc shorter than n yields
    one (short) shingle."""
    toks = text.split(" ")
    return [" ".join(toks[i:i + n]) for i in range(max(1, len(toks) - n + 1))]


def minhash_sig(text: str, num_hashes: int, shingle_n: int) -> tuple[int, ...]:
    sh = set(ngrams(text, shingle_n))
    return tuple(min(h64(s, seed=i) for s in sh) for i in range(num_hashes))


def band_key(sig: tuple[int, ...], band: int, rows: int) -> str:
    piece = ",".join(str(x) for x in sig[band * rows:(band + 1) * rows])
    return hashlib.md5(piece.encode()).hexdigest()


def iround(x: float) -> int:
    """round-half-away-from-zero on the exact binary double, matching
    Spark/DuckDB ROUND on DOUBLE (BigDecimal HALF_UP)."""
    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.col("doc_id").cast("long").alias("doc_id"),
                "text", "lang", "source")
        .collect()
    )


# -- 1. incremental_dedup -----------------------------------------------------

def test_incremental_dedup_python_model(spark):
    H, BANDS, SHINGLE_N, T = 8, 4, 2, 0.5
    rows = H // BANDS
    docs = _docs(spark)

    # the registered query's planted delta, re-derived independently
    delta: list[tuple[int, str]] = []
    for r in docs:
        i, t = r.doc_id, r.text
        if i % 5 == 0:
            delta.append((i + 1000000, t))
        if i % 7 == 2:
            delta.append((i + 2000000, t + " tail tok"))
        if i % 11 == 3:
            delta.append((i + 3000000, f"fresh doc {i} alpha beta gamma"))
        if i % 13 == 1:
            delta.append((i + 4000000, f"batch only pair {i}"))
            delta.append((i + 4100000, f"batch only pair {i}"))

    hist_hashes = {h64(r.text) for r in docs}
    hist_bands: dict[tuple[int, str], list[tuple[int, ...]]] = {}
    for r in docs:
        sig = minhash_sig(r.text, H, SHINGLE_N)
        for b in range(BANDS):
            hist_bands.setdefault((b, band_key(sig, b, rows)), []).append(sig)

    # exact stage: history membership OR a lower-id batch doc with the
    # same content hash (within-batch first-wins)
    sigs = {i: minhash_sig(t, H, SHINGLE_N) for i, t in delta}
    seen_batch: dict[int, int] = {}
    exact: dict[int, bool] = {}
    for i, t in sorted(delta):
        ch = h64(t)
        exact[i] = ch in hist_hashes or ch in seen_batch
        seen_batch.setdefault(ch, i)

    survivors = sorted(i for i, _ in delta if not exact[i])
    surv_bands: dict[tuple[int, str], list[int]] = {}
    for i in survivors:
        for b in range(BANDS):
            surv_bands.setdefault(
                (b, band_key(sigs[i], b, rows)), []).append(i)

    def est(a, b):
        return sum(x == y for x, y in zip(a, b)) / float(H)

    expected: dict[int, tuple[str, float | None]] = {}
    for i, _ in delta:
        if exact[i]:
            expected[i] = ("exact_dup", None)
            continue
        cands: list[float] = []
        for b in range(BANDS):
            k = (b, band_key(sigs[i], b, rows))
            cands += [est(sigs[i], hs) for hs in hist_bands.get(k, [])]
            cands += [est(sigs[i], sigs[j])
                      for j in surv_bands.get(k, []) if j < i]
        ms = max(cands) if cands else None
        status = "near_dup" if ms is not None and ms >= T else "kept"
        expected[i] = (status, ms)

    from crawl4ai_spark.queries import queries
    got = {r.doc_id: (r.status, r.max_sim)
           for r in queries()["dedup_incremental"](spark, SF).collect()}

    assert set(got) == set(expected)
    for i, (status, ms) in expected.items():
        assert got[i][0] == status, (i, got[i], (status, ms))
        if ms is None:
            assert got[i][1] is None, (i, got[i])
        else:
            assert got[i][1] == pytest.approx(ms, abs=1e-9), (i, got[i], ms)


# -- 2. lm_perplexity ---------------------------------------------------------

def test_lm_perplexity_python_model(spark):
    LAM, SCALE = 0.5, 1_000_000
    docs = _docs(spark)
    clean = [r for r in docs if r.source == "src0"]

    c1: Counter = Counter()
    c2: Counter = Counter()
    for r in clean:
        c1.update(r.text.split(" "))
        c2.update(ngrams(r.text, 2))
    v = float(len(c1) + 1)
    lp_unk = iround(math.log(LAM / (LAM * v)) * SCALE)

    def lp(g: str) -> int:
        if g in c2:
            prev = g.split(" ")[0]
            return iround(
                math.log((c2[g] + LAM) / (c1[prev] + LAM * v)) * SCALE)
        prev = g.split(" ")[0]
        if prev in c1:
            return iround(math.log(LAM / (c1[prev] + LAM * v)) * SCALE)
        return lp_unk

    per_doc = {}
    for r in docs:
        grams = ngrams(r.text, 2)
        nll = -sum(lp(g) for g in grams)
        n = len(grams)
        per_doc[r.doc_id] = (r.lang, n, nll, iround(nll / max(n, 1)))

    # per-language ntile(3) over (avg_nll, doc_id): the first n%3
    # buckets take ceil(n/3) rows
    expected_bucket = {}
    by_lang: dict[str, list[int]] = {}
    for i, (lang, *_rest) in per_doc.items():
        by_lang.setdefault(lang, []).append(i)
    for lang, ids in by_lang.items():
        ids.sort(key=lambda i: (per_doc[i][3], i))
        n = len(ids)
        base, rem = divmod(n, 3)
        sizes = [base + (1 if k < rem else 0) for k in range(3)]
        pos = 0
        for bucket, sz in zip(("head", "middle", "tail"), sizes):
            for i in ids[pos:pos + sz]:
                expected_bucket[i] = bucket
            pos += sz

    from crawl4ai_spark.queries import queries
    got = {r.doc_id: r
           for r in queries()["lm_perplexity"](spark, SF).collect()}

    assert set(got) == set(per_doc)
    for i, (lang, n, nll, avg) in per_doc.items():
        g = got[i]
        assert (g.lang, g.n_grams, g.nll_scaled, g.avg_nll_scaled) == \
            (lang, n, nll, avg), (i, g)
        assert g.ppl_bucket == expected_bucket[i], (i, g)


# -- 3. duplicate_token_spans -------------------------------------------------

def test_dedup_spans_python_model(spark):
    N = 8
    tail = " subscribe to our newsletter for the latest updates from source "
    docs = _docs(spark)
    corpus = {r.doc_id: r.text + tail + r.source for r in docs}
    for r in docs:
        if r.doc_id % 5 == 0:
            corpus[r.doc_id + 10000000] = r.text + tail + r.source

    occurrences: list[tuple[int, int, int, str]] = []  # (doc, pos, end, gram)
    freq: Counter = Counter()
    totals = {}
    for i, t in corpus.items():
        toks = t.split(" ")
        total = len(toks)
        totals[i] = total
        for p in range(max(1, total - N + 1)):
            g = " ".join(toks[p:p + N])
            occurrences.append((i, p, min(p + N - 1, total - 1), g))
            freq[g] += 1

    spans: dict[int, list[tuple[int, int]]] = {}
    cur_doc, prev_end = None, None
    for i, p, e, g in sorted(occurrences):
        if freq[g] <= 1:
            continue
        if i != cur_doc or p > prev_end + 1:
            spans.setdefault(i, []).append((p, e))
            cur_doc, prev_end = i, e
        else:
            s0, e0 = spans[i][-1]
            spans[i][-1] = (s0, max(e0, e))
            prev_end = max(prev_end, e)

    from crawl4ai_spark.queries import queries
    got = {r.doc_id: r for r in queries()["dedup_spans"](spark, SF).collect()}

    assert set(got) == set(corpus)
    for i in corpus:
        ss = spans.get(i, [])
        dup = sum(e - s + 1 for s, e in ss)
        g = got[i]
        assert (g.total_tokens, g.dup_tokens, g.n_spans) == \
            (totals[i], dup, len(ss)), (i, g, ss)
        assert g.dup_frac == pytest.approx(
            round(dup / max(totals[i], 1), 6), abs=1e-9)


# -- 4. crawl_contextual ------------------------------------------------------

CHILD_FACTORS = ((3, 1), (3, 2), (3, 3), (7, 11))
N_HOSTS = 7
CTX_DEPTH = 3
CTX_TERMS = ("Doc", "src1", "src5")


def _url(i: int) -> str:
    return f"https://site{i % N_HOSTS}.example.com/page/{i}"


def _intrinsic(lt: str, url: str) -> float:
    """utils.py:3143-3255 rubric for a bare <a> (no title/class/rel),
    re-derived from the published scoring table."""
    ul = url.lower()
    score = 0.0
    good = ("/docs/", "/api/", "/guide/", "/tutorial/", "/reference/",
            "/manual/")
    med = ("/blog/", "/article/", "/post/", "/news/")
    bad = ("/admin/", "/login/", "/cart/", "/checkout/", "/track/", "/click/")
    if any(p in ul for p in good):
        score += 2.0
    elif any(p in ul for p in med):
        score += 1.0
    if any(p in ul for p in bad):
        score -= 1.5
    depth = url.count("/") - 2
    if depth <= 2:
        score += 1.0
    elif depth > 5:
        score -= 0.5
    if url.startswith("https://"):
        score += 0.5
    t = lt.strip()
    words = [w for w in t.split(" ") if w]
    if len(t) > 3:
        score += 1.0
    if len(words) >= 2:
        score += 0.5
    if len(words) >= 4:
        score += 0.5
    if t.lower() in ("click here", "read more", "more info", "link", "here"):
        score -= 1.0
    return max(0.0, min(score, 10.0))


def test_crawl_contextual_python_model(spark):
    n = spark.read.parquet(f"{SF}/documents.parquet").count()

    def kids(i: int) -> list[int]:
        return sorted({a * i + b for a, b in CHILD_FACTORS if a * i + b < n})

    # BFS: min depth per reachable id
    best = {0: 0}
    frontier = [0]
    for d in range(CTX_DEPTH):
        nxt = []
        for src in frontier:
            for c in kids(src):
                if c not in best:
                    best[c] = d + 1
                    nxt.append(c)
        frontier = nxt

    # per-round candidate sets (pre seen-anti-join, post in-round dedup)
    cand: dict[int, set[int]] = {}
    for i, d in best.items():
        if d < CTX_DEPTH:
            cand.setdefault(d, set()).update(kids(i))

    def toks(i: int) -> list[str]:
        return ["Doc", str(i), f"src{i % 20}"]

    rel: dict[tuple[int, int], float] = {}
    for rnd, ids in cand.items():
        nn = float(len(ids))
        df = {t: sum(1 for i in ids if t in toks(i)) for t in CTX_TERMS}
        for i in ids:
            s = 0.0
            for t in CTX_TERMS:
                tf = float(toks(i).count(t))
                idf = math.log((nn - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                # k1=1.2, b=0.75, dl == avgdl == 3
                s += idf * tf * 2.2 / (tf + 1.2)
            # the engine records relevance rounded to 6 decimals before
            # the 0.7/0.3 combine (frontier stores it as a column)
            rel[(rnd, i)] = float(Decimal(s).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP))

    expected = {}
    for i, d in best.items():
        if d == 0:
            expected[_url(i)] = (0, 0.0)
            continue
        iscore = _intrinsic(f"go {i}", _url(i))
        ctx = min(rel[(d - 1, i)] * 10.0, 10.0)
        total = max(0.0, min(iscore * 0.7 + ctx * 0.3, 10.0))
        expected[_url(i)] = (d, float(Decimal(total).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP)))

    from crawl4ai_spark.queries import queries
    got = {r.url_norm: (r.depth, r.score)
           for r in queries()["crawl_contextual"](spark, SF).collect()}

    assert set(got) == set(expected)
    for u, (d, s) in expected.items():
        assert got[u][0] == d, (u, got[u], (d, s))
        assert got[u][1] == pytest.approx(s, abs=1e-9), (u, got[u], s)


# -- 5) dedup_semantic: IVF-cell SemDeDup (ops/similarity.py:320) ------------
#
# Model re-derives from the published pieces only: hash-derived
# centroid components ((md5-prefix-hash % 2001 - 1000)/1000), argmin
# cell with first-occurrence tie-break, same-cell lower-id max cosine
# (rounded half-up to 6 dp per pair), keep = nn_cos < threshold.
# Float folds follow the same left-to-right component order Spark's
# aggregate/zip_with uses, so doubles match bit-for-bit.

def test_dedup_semantic_python_model(spark):
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    base = [(int(i), [float(x) for x in v])
            for i, v in zip(tbl.column("vec_id").to_pylist(),
                            tbl.column("embedding").to_pylist())]
    vecs = dict(base)
    for i, v in base:                      # the query's planted twins
        if i % 50 == 0:
            vecs[i + 10000000] = v

    dim, n_cells, threshold = 64, 8, 0.9
    cents = [[((h64(str(d), seed=f"ivf{c}") % 2001) - 1000) / 1000.0
              for d in range(dim)] for c in range(n_cells)]

    def cell_of(v):
        best_c, best_d = 0, None
        for c in range(n_cells):
            acc = 0.0
            for x, w in zip(v, cents[c]):
                acc = acc + (x - w) * (x - w)
            if best_d is None or acc < best_d:     # strict: first wins ties
                best_c, best_d = c, acc
        return best_c

    def norm(v):
        acc = 0.0
        for x in v:
            acc = acc + x * x
        return math.sqrt(acc)

    def r6(x: float) -> float:
        return float(Decimal(x).quantize(Decimal("0.000001"),
                                         rounding=ROUND_HALF_UP))

    cells: dict[int, list[int]] = {}
    norms = {}
    for i, v in vecs.items():
        cells.setdefault(cell_of(v), []).append(i)
        norms[i] = norm(v)

    expected = {}
    for c, members in cells.items():
        members.sort()
        for pos, i in enumerate(members):
            nn = -1.0
            for j in members[:pos]:
                acc = 0.0
                for x, y in zip(vecs[i], vecs[j]):
                    acc = acc + x * y
                nn = max(nn, r6(acc / (norms[i] * norms[j])))
            expected[i] = (c, nn, nn < threshold)

    from crawl4ai_spark.queries import queries
    got = {r.vec_id: (r.cell, r.nn_cos, r.keep)
           for r in queries()["dedup_semantic"](spark, SF).collect()}

    assert set(got) == set(expected)
    planted = [i for i in expected if i >= 10000000]
    assert planted and all(expected[i][1] == 1.0 and not expected[i][2]
                           for i in planted)
    for i, (c, nn, keep) in expected.items():
        assert got[i][0] == c, (i, got[i], (c, nn, keep))
        assert got[i][2] == keep, (i, got[i], (c, nn, keep))
        assert got[i][1] == pytest.approx(nn, abs=1e-9), (i, got[i], nn)
