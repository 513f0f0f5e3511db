"""Brute-force Python oracles for the webtext operators whose pair-generation
shapes have no DuckDB twin (MinHash LSH, SimHash, hyperplane ANN) plus unit
checks for the shared tokenizer building blocks. Runs at sf0.001 (500 docs)."""

import hashlib
import math
import re

import pytest

from pyspark.sql import functions as F

from suckit_spark.operators import webtext

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def py_tokens(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def py_shingles(tokens, n=3):
    if len(tokens) < n:
        return []
    return [" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)]


def md5_bucket(s, prefix, hexlen=8):
    return int(hashlib.md5((prefix + s).encode()).hexdigest()[:hexlen], 16)


def test_tokens_and_shingles_match(spark, docs):
    rows = docs.select("doc_id", "text",
                       webtext.tokens_col().alias("toks")).collect()
    for r in rows[:50]:
        assert list(r.toks) == py_tokens(r.text)
    sh = docs.select(
        "doc_id", "text",
        webtext.shingles_col(webtext.tokens_col(), 3).alias("sh")).collect()
    for r in sh[:50]:
        assert list(r.sh) == py_shingles(py_tokens(r.text), 3)


def test_minhash_signatures_match_python(spark, docs):
    got = {r.doc_id: [r[f"h{i}"] for i in range(8)]
           for r in webtext.minhash_signatures(docs, num_hashes=8).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id in list(got)[:40]:
        shingles = set(py_shingles(py_tokens(texts[doc_id]), 3))
        expect = [min(md5_bucket(s, f"{i}:") for s in shingles)
                  for i in range(8)]
        assert got[doc_id] == expect, f"doc {doc_id}"


def test_minhash_lsh_pairs_match_python(spark, docs):
    got = {(r.doc_a, r.doc_b)
           for r in webtext.minhash_lsh_pairs(docs, 16, 4).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    sigs = {}
    for doc_id, text in texts.items():
        shingles = set(py_shingles(py_tokens(text), 3))
        if not shingles:
            continue
        sigs[doc_id] = [min(md5_bucket(s, f"{i}:") for s in shingles)
                        for i in range(16)]
    buckets = {}
    for doc_id, sig in sigs.items():
        for b in range(4):
            band = ",".join(str(v) for v in sig[b * 4:(b + 1) * 4])
            key = (b, hashlib.md5(band.encode()).hexdigest())
            buckets.setdefault(key, []).append(doc_id)
    expect = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                expect.add((ms[i], ms[j]))
    assert got == expect


def py_simhash(text, use_bits=60):
    votes = [0] * use_bits
    for t in py_tokens(text):
        th = md5_bucket(t, "sim:", 15)
        for b in range(use_bits):
            votes[b] += 1 if (th >> b) & 1 else -1
    return sum((1 << b) for b in range(use_bits) if votes[b] > 0)


def test_simhash_matches_python(spark, docs):
    got = {r.doc_id: r.simhash for r in webtext.simhash(docs).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id in list(got)[:40]:
        assert got[doc_id] == py_simhash(texts[doc_id]), f"doc {doc_id}"


def test_simhash_near_pairs_sound(spark, docs):
    """Every reported pair has hamming <= t; every bucketable pair with
    hamming <= t is reported (chunk-join completeness within its recall
    guarantee: distance < chunks ⇒ some chunk agrees)."""
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in webtext.simhash_near_pairs(docs, max_hamming=20).collect()}
    fps = {r.doc_id: r.simhash for r in webtext.simhash(docs).collect()}
    for (a, b), h in pairs.items():
        assert bin(fps[a] ^ fps[b]).count("1") == h
        assert h <= 20
    # completeness for pairs agreeing on at least one 15-bit chunk
    ids = sorted(fps)
    for i in range(0, len(ids), 7):        # sample to keep runtime sane
        for j in range(i + 1, len(ids), 13):
            a, b = ids[i], ids[j]
            x = fps[a] ^ fps[b]
            ham = bin(x).count("1")
            chunk_agree = any(((fps[a] >> (c * 15)) & 0x7FFF) ==
                              ((fps[b] >> (c * 15)) & 0x7FFF) for c in range(4))
            if ham <= 20 and chunk_agree:
                assert (a, b) in pairs, (a, b, ham)


def py_cosine(a, b):
    dot = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    na = math.sqrt(sum(float(x) * float(x) for x in a))
    nb = math.sqrt(sum(float(y) * float(y) for y in b))
    return dot / (na * nb)


def test_cosine_topk_matches_python(spark, emb):
    got = [(r.vec_id, r.cosine) for r in
           webtext.cosine_topk(emb, query_vec_id=0, k=10).collect()]
    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
    q = vecs[0]
    scored = sorted(
        ((vid, round(py_cosine(v, q), 6)) for vid, v in vecs.items()
         if vid != 0),
        key=lambda t: (-t[1], t[0]))[:10]
    assert got == scored


def test_ann_buckets_match_python(spark, emb):
    import numpy as np
    got = {r.vec_id: r.bucket
           for r in webtext.ann_lsh_buckets(emb, num_planes=12).collect()}
    planes = webtext.lsh_hyperplanes(64, 12)
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    for vid, v in list(vecs.items())[:60]:
        sig = 0
        for p, plane in enumerate(planes):
            dot = 0.0
            for x, y in zip(v, plane):
                dot += float(x) * float(y)
            if dot > 0:
                sig |= 1 << p
        assert got[vid] == sig, vid


def test_ann_bucketed_topk_is_bucket_restricted(spark, emb):
    buckets = {r.vec_id: r.bucket
               for r in webtext.ann_lsh_buckets(emb, num_planes=8).collect()}
    qb = buckets[0]
    got = webtext.ann_bucketed_topk(emb, 0, k=10, num_planes=8).collect()
    assert len(got) >= 1
    for r in got:
        assert buckets[r.vec_id] == qb
    cosines = [r.cosine for r in got]
    assert cosines == sorted(cosines, reverse=True)


def test_embedding_near_dup_matches_python(spark, emb):
    thr = 0.4
    got = {(r.vec_a, r.vec_b): r.cosine
           for r in webtext.embedding_near_dup(emb, threshold=thr).collect()}
    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
    ids = sorted(vecs)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            c = round(py_cosine(vecs[a], vecs[b]), 6)
            if c >= thr:
                expect[(a, b)] = c
    assert got == expect


def test_embedding_near_dup_lsh_subset_with_recall(spark, emb):
    thr = 0.4
    exact = {(r.vec_a, r.vec_b): r.cosine
             for r in webtext.embedding_near_dup(emb, threshold=thr).collect()}
    lsh = {(r.vec_a, r.vec_b): r.cosine
           for r in webtext.embedding_near_dup_lsh(
               emb, threshold=thr, num_planes=4, num_tables=12).collect()}
    # precision 1.0: every LSH pair is a true pair with the exact cosine
    for pair, c in lsh.items():
        assert exact[pair] == c
    # recall: a cosine-0.4 pair collides in >=1 of 12 four-plane tables with
    # prob ~0.87; assert a loose floor well below the expectation
    assert exact, "test needs at least one true pair at this threshold"
    assert len(lsh) / len(exact) >= 0.5


def test_ivf_topk_true_cosines_and_recall(spark, emb):
    got = webtext.ivf_topk(emb, query_vec_id=0, k=10,
                           n_centroids=8, n_probe=3).collect()
    assert len(got) == 10
    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
    q = vecs[0]
    # reported cosines are the true cosines (IVF approximates the candidate
    # set, never the metric)
    for r in got:
        assert r.cosine == round(py_cosine(vecs[r.vec_id], q), 6)
    # recall vs exact top-10
    exact = sorted(((vid, round(py_cosine(v, q), 6))
                    for vid, v in vecs.items() if vid != 0),
                   key=lambda t: (-t[1], t[0]))[:10]
    hits = {r.vec_id for r in got} & {vid for vid, _ in exact}
    assert len(hits) >= 5


def test_ivf_probe_all_cells_equals_exact(spark, emb):
    # with n_probe == n_centroids IVF degenerates to exact brute force
    got = [(r.vec_id, r.cosine) for r in webtext.ivf_topk(
        emb, query_vec_id=0, k=10, n_centroids=4, n_probe=4).collect()]
    exact = [(r.vec_id, r.cosine) for r in
             webtext.cosine_topk(emb, query_vec_id=0, k=10).collect()]
    assert got == exact


def test_exact_dedup_finds_real_dups(spark):
    rows = [(i, "same text here") for i in range(5)] + [(9, "unique")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.content_hash: (r.rep_doc_id, r.dup_count)
           for r in webtext.exact_dedup(df).collect()}
    assert sorted(v for v in got.values()) == [(0, 5), (9, 1)]
