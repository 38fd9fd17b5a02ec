"""Dedup operator semantics beyond the oracle gate: LSH recall vs the
exact Jaccard join, SimHash Hamming locality, survivor determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webarchive_indexing_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    simhash16,
)
from webarchive_indexing_spark.queries.llm import base_corpus
from webarchive_indexing_spark.registry import REGISTRY


@pytest.fixture(scope="module")
def base(spark, sf_dir):
    return base_corpus(spark, sf_dir).cache()


def test_exact_dedup_groups_injected(base):
    groups = exact_dedup(base).filter(F.col("n_copies") > 1)
    rows = groups.collect()
    # 40 injected exact copies → 40 groups of exactly 2, original wins
    assert len(rows) == 40
    assert all(r.n_copies == 2 for r in rows)
    assert all(r.keep_id < 40 for r in rows)


def test_lsh_finds_injected_near_dups(base):
    pairs = minhash_lsh_pairs(base, jaccard_threshold=0.7)
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    # every injected pair must be recalled: exact copy (j=1.0) and
    # near-dup (two extra tokens, j≈0.95)
    for d in range(40):
        assert (d, d + 10000) in got, f"exact copy pair {d} missed"
    for d in range(40, 80):
        assert (d, d + 20000) in got, f"near-dup pair {d} missed"
    # precision: every emitted pair clears the exact-Jaccard bar when
    # recomputed independently in Python (organic soup pairs may
    # legitimately exceed 0.7 — they must, to be emitted)
    texts = {r.doc_id: r.text for r in base.collect()}

    def jac(x, y):
        tx, ty = texts[x].split(), texts[y].split()
        sx = {tuple(tx[i : i + 3]) for i in range(len(tx) - 2)}
        sy = {tuple(ty[i : i + 3]) for i in range(len(ty) - 2)}
        return len(sx & sy) / len(sx | sy)

    for a, b in got:
        assert jac(a, b) >= 0.7, f"pair ({a},{b}) below threshold"


def test_simhash_locality(base):
    sh = {r.doc_id: r.simhash for r in simhash16(base).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    # exact copies: identical fingerprints
    for d in range(0, 40):
        assert sh[d] == sh[d + 10000]
    # near-dups: within 6/16 bits
    near = [ham(sh[d], sh[d + 20000]) for d in range(40, 80)]
    assert max(near) <= 6
    # unrelated docs: typically farther than near-dups on average
    import statistics

    far = [ham(sh[100 + i], sh[200 + i]) for i in range(40)]
    assert statistics.mean(far) > statistics.mean(near)


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    """The property that makes a Bloom prefilter sound: every actual
    duplicate is flagged maybe_dup (false positives allowed, false
    negatives never)."""
    rows = REGISTRY["dedup_bloom_prefilter"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r.maybe_dup for r in rows if r.actual_dup)
    # and the sketch is doing SOME filtering: not everything is maybe
    assert any(not r.maybe_dup for r in rows)


def test_bpe_merges_match_reference_implementation(spark):
    """The distributed learner must reproduce textbook BPE (greedy
    leftmost merging, argmax pair by count then lexicographic) on a
    handcrafted corpus."""
    from collections import Counter

    from webarchive_indexing_spark.operators.bpe import bpe_learn_merges

    texts = ["low low low lower lowest", "new newer newest low", "wide wider"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])

    # reference implementation
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            words[w] += 1
    segs = {w: list(w) for w in words}
    expect = []
    for rank in range(1, 4):
        pc = Counter()
        for w, c in words.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rank, a, b, cnt))
        for w in words:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out

    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_learn_merges(df, n_merges=3).orderBy("merge_rank").collect()
    ]
    assert got == expect, (got, expect)


def test_prefix_filter_jaccard_no_false_negatives(spark, sf_dir):
    """PPJoin prefix filtering is LOSSLESS: the prefix-candidate join
    must recover exactly the brute-force all-pairs Jaccard >= 0.7 set
    (and its candidate volume must actually prune vs all-pairs)."""
    from pyspark.sql import functions as F

    from webarchive_indexing_spark.registry import REGISTRY, _ensure_loaded
    from webarchive_indexing_spark.functions.text import tokens
    from webarchive_indexing_spark.tables import load_table

    _ensure_loaded()
    got = {
        (r.a_id, r.b_id)
        for r in REGISTRY["dedup_jaccard_prefix_filter"].fn(spark, sf_dir).collect()
    }

    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select(
            "doc_id", F.array_distinct(tokens(F.col("text"))).alias("arr")
        )
        .withColumn("n", F.size("arr"))
    )
    a = d.select(
        F.col("doc_id").alias("a_id"), F.col("arr").alias("aa"), F.col("n").alias("na")
    )
    b = d.select(
        F.col("doc_id").alias("b_id"), F.col("arr").alias("ab"), F.col("n").alias("nb")
    )
    inter = F.size(F.array_intersect(F.col("aa"), F.col("ab")))
    uni = F.col("na") + F.col("nb") - inter
    brute = {
        (r.a_id, r.b_id)
        for r in a.join(b, F.col("a_id") < F.col("b_id"))
        .filter(inter * 10 >= 7 * uni)
        .select("a_id", "b_id")
        .collect()
    }
    assert got == brute
    assert brute, "threshold too strict for the fixture"
