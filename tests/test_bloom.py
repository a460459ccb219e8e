"""Differential tests for operators/bloom.py: the Bloom-pruned
incremental exact dedup must be bit-identical to the plain fingerprint
anti-join (false positives verified away, false negatives impossible),
and the filter relation must behave as a set-membership bitset."""

import random

import pytest
from pyspark.sql import functions as F

from readability_php_spark.operators.bloom import (
    bloom_build,
    bloom_incremental_exact_dedup,
    bloom_merge,
    bloom_probe,
    optimal_params,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def _ref_dups(new_rows, corpus_rows):
    """Ground truth: md5-fingerprint membership (None text never dups)."""
    import hashlib

    def fp(t):
        if t is None:
            return None
        return hashlib.md5(t.encode()).hexdigest()

    corpus = {fp(t) for _, t in corpus_rows if t is not None}
    return {
        i: (fp(t) in corpus if t is not None else False)
        for i, t in new_rows
    }


@pytest.mark.parametrize("m_bits,k", [(1 << 16, 5), (256, 2)])
def test_bloom_dedup_matches_exact_antijoin(spark, m_bits, k):
    # m=256 bits over ~60 corpus keys forces real false positives —
    # the exact-verify stage must erase them from is_dup
    rng = random.Random(7)
    corpus_rows = [(i, f"corpus doc {rng.randint(0, 40)}") for i in range(60)]
    new_rows = (
        [(100 + i, f"corpus doc {rng.randint(0, 40)}") for i in range(20)]
        + [(200 + i, f"fresh doc {i}") for i in range(20)]
        + [(300, None)]
    )
    out = {
        r.doc_id: (r.bloom_candidate, r.is_dup)
        for r in bloom_incremental_exact_dedup(
            _docs(spark, new_rows),
            _docs(spark, corpus_rows),
            m_bits=m_bits,
            k=k,
        ).collect()
    }
    exp = _ref_dups(new_rows, corpus_rows)
    assert set(out) == set(exp)
    for i, (cand, dup) in out.items():
        assert dup == exp[i], f"doc {i}"
        # no false negatives: every true dup is a bloom candidate
        if exp[i]:
            assert cand, f"doc {i} dup but not bloom-positive"


def test_bloom_small_filter_has_fp_but_exact_result(spark):
    # 64-bit filter with k=4: nearly every probe is a false positive;
    # is_dup must still be exactly right
    corpus_rows = [(i, f"c{i}") for i in range(30)]
    new_rows = [(100 + i, f"n{i}") for i in range(30)]
    res = bloom_incremental_exact_dedup(
        _docs(spark, new_rows), _docs(spark, corpus_rows), m_bits=64, k=4
    )
    rows = res.collect()
    assert all(not r.is_dup for r in rows)
    assert any(r.bloom_candidate for r in rows)  # FPs exist at this m


def test_bloom_dedup_duplicate_wave_ids(spark):
    # same id carried with two different texts (crash-retry ingestion):
    # the k-bit AND must be keyed per (id, key) — ANDing across the two
    # fingerprints would manufacture a false negative for the dup text
    corpus_rows = [(i, f"seen {i}") for i in range(40)]
    new_rows = [(7, "seen 3"), (7, "never seen before"), (8, "seen 5")]
    out = [
        (r.doc_id, r.is_dup)
        for r in bloom_incremental_exact_dedup(
            _docs(spark, new_rows),
            _docs(spark, corpus_rows),
            m_bits=1 << 14,
            k=4,
        ).orderBy("doc_id", "is_dup").collect()
    ]
    assert out == [(7, False), (7, True), (8, True)]


def test_bloom_dedup_verbatim_duplicate_rows_no_fanout(spark):
    # a wave row duplicated verbatim must not multiply through the
    # verdict join: 2 rows in, 2 rows out, both marked dup
    corpus_rows = [(1, "shared text")]
    new_rows = [(9, "shared text"), (9, "shared text")]
    rows = bloom_incremental_exact_dedup(
        _docs(spark, new_rows), _docs(spark, corpus_rows),
        m_bits=1 << 12, k=3,
    ).collect()
    assert len(rows) == 2
    assert all(r.is_dup and r.bloom_candidate for r in rows)


def test_bloom_merge_equals_union_build(spark):
    a = spark.createDataFrame([(f"k{i}",) for i in range(50)], "fp string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(25, 80)], "fp string")
    both = a.unionByName(b)
    m, k = 1 << 12, 3
    merged = {
        r.widx: r.bits
        for r in bloom_merge(
            bloom_build(a, "fp", m, k), bloom_build(b, "fp", m, k)
        ).collect()
    }
    direct = {
        r.widx: r.bits for r in bloom_build(both, "fp", m, k).collect()
    }
    assert merged == direct


def test_bloom_probe_membership_no_false_negatives(spark):
    keys = spark.createDataFrame(
        [(i, f"key-{i}") for i in range(200)], "doc_id int, fp string"
    )
    m, k = optimal_params(200, 0.01)
    flt = bloom_build(keys, "fp", m, k)
    # every inserted key must probe positive
    probed = bloom_probe(keys, flt, "fp", m, k)
    assert probed.filter(~F.col("maybe_seen")).count() == 0
    # fresh keys: FP rate should be near the design point (allow 5x)
    fresh = spark.createDataFrame(
        [(i, f"other-{i}") for i in range(400)], "doc_id int, fp string"
    )
    fp_hits = bloom_probe(fresh, flt, "fp", m, k).filter(
        F.col("maybe_seen")
    ).count()
    assert fp_hits <= 400 * 0.05


def test_bloom_null_keys_never_seen(spark):
    keys = spark.createDataFrame(
        [(1, "x"), (2, None)], "doc_id int, fp string"
    )
    flt = bloom_build(keys, "fp", 1 << 10, 3)
    probed = {
        r.doc_id: r.maybe_seen
        for r in bloom_probe(keys, flt, "fp", 1 << 10, 3).collect()
    }
    assert probed[1] is True
    assert probed[2] is False  # null key: uncomparable, never inserted


def test_optimal_params_sane():
    m, k = optimal_params(1_000_000, 0.01)
    assert m % 64 == 0
    assert 9_000_000 < m < 10_500_000  # ~9.59 bits/key at 1%
    assert k == 7
    with pytest.raises(ValueError):
        optimal_params(0, 0.01)
    with pytest.raises(ValueError):
        optimal_params(10, 1.5)
