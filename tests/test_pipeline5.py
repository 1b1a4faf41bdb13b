"""Invariant checks for the round-5 part-2 operators (pipeline5_q).

The DuckDB oracle (tools/check_correctness.py) pins exact values;
these tests pin the semantic invariants that hold at ANY scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from change_data_capture_poc_spark.registry import all_queries


def test_perplexity_prune_terciles_partition_each_lang(spark, sf_dir):
    """Buckets partition each language's docs; the head prefix is the
    smallest band prefix reaching >= 1/3 of docs (so head*3 >= n) and
    kept = head+middle covers >= 2/3; kept flags tail only as False."""
    out = all_queries()["corpus_perplexity_prune"].fn(spark, sf_dir)
    rows = out.collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lang_counts = {
        r.lang: r.n for r in docs.groupBy("lang")
        .agg(F.count("*").alias("n")).collect()
    }
    by_lang: dict[str, dict[str, int]] = {}
    for r in rows:
        assert r.kept == (r.bucket != "tail")
        by_lang.setdefault(r.lang, {})[r.bucket] = r.n_docs
    assert set(by_lang) == set(lang_counts)
    for lang, buckets in by_lang.items():
        n = lang_counts[lang]
        assert sum(buckets.values()) == n
        head = buckets.get("head", 0)
        middle = buckets.get("middle", 0)
        # cut1 is the FIRST band whose cumulative count reaches n/3;
        # cut2 likewise for 2n/3 — exact integer arithmetic.
        assert head * 3 >= n
        assert (head + middle) * 3 >= 2 * n


def test_hard_negatives_are_other_label_below_ceiling(spark, sf_dir):
    """Every mined negative has a different label than its query, sits
    at or below the near-dup cosine ceiling, and ranks are contiguous
    1..k with non-increasing cosine."""
    from change_data_capture_poc_spark.queries.pipeline5_q import (
        _HN_CEIL,
        _HN_K,
        _HN_NQ,
    )

    out = all_queries()["ann_hard_negative_mining"].fn(spark, sf_dir)
    rows = out.collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q_labels = {
        r.vec_id: r.label
        for r in emb.where(F.col("vec_id") < _HN_NQ)
        .select("vec_id", "label")
        .collect()
    }
    assert {r.q_id for r in rows} == set(q_labels)
    per_q: dict[int, list] = {}
    for r in rows:
        assert r.neighbor_label != q_labels[r.q_id]
        assert r.cos <= _HN_CEIL
        per_q.setdefault(r.q_id, []).append(r)
    for q_id, rs in per_q.items():
        rs.sort(key=lambda r: r.hn_rank)
        assert [r.hn_rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _HN_K
        cosines = [r.cos for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_fertility_bounds_and_coverage(spark, sf_dir):
    """Fertility >= 1 (every word costs at least one token), OOV words
    never exceed total words, and doc counts cover the corpus."""
    out = all_queries()["tokenizer_fertility_by_lang"].fn(spark, sf_dir)
    rows = out.collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lang_counts = {
        r.lang: r.n for r in docs.groupBy("lang")
        .agg(F.count("*").alias("n")).collect()
    }
    assert {r.lang for r in rows} == set(lang_counts)
    for r in rows:
        assert r.n_docs == lang_counts[r.lang]
        assert r.subword_tokens >= r.words
        assert 0 <= r.oov_words <= r.words
        assert r.fertility >= 1.0
        assert r.bytes_per_token > 0
