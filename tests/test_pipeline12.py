"""URL-canonicalization dedup (pipeline12_q) pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from change_data_capture_poc_spark.queries.pipeline12_q import (
    _canonical_url_col,
    _raw_url_col,
)
from change_data_capture_poc_spark.registry import all_queries


def _canon_for(spark, doc_ids):
    df = spark.createDataFrame(
        [(int(i),) for i in doc_ids], "doc_id bigint"
    )
    raw = _raw_url_col()
    return {
        r.doc_id: (r.raw, r.canon)
        for r in df.select(
            "doc_id",
            raw.alias("raw"),
            _canonical_url_col(raw).alias("canon"),
        ).collect()
    }


def test_canonicalization_rules_pinned(spark):
    """Each mess dimension normalizes exactly as documented."""
    got = _canon_for(spark, range(0, 73))

    # doc_id=0: HTTPS scheme, WWW., upper host, :443, trailing /,
    # utm_source & utm_campaign, ref after id, #sec0 — everything at
    # once; all of it must strip down to host/path?sorted-params.
    raw0, canon0 = got[0]
    assert raw0 == (
        "HTTPS://WWW.SITE0.EXAMPLE:443/page0/"
        "?utm_source=feed0&id=0&ref=r0&utm_campaign=c0#sec0"
    )
    assert canon0 == "site0.example/page0?id=0&ref=r0"

    # doc_id=47: http, no www, no port, no trailing slash, bare id.
    raw47, canon47 = got[47]
    assert raw47 == "http://site7.example/page2?id=1"
    assert canon47 == "site7.example/page2?id=1"

    # Param-order insensitivity: %9==1 puts ref BEFORE id, %9==0
    # after; same residues otherwise → same canonical key.
    # 28 % 9 == 1 (ref first), 36 % 9 == 0 (ref after): different
    # raws, and each canonical has sorted params.
    for i in (28, 36):
        assert got[i][1].endswith("?id=" + str(i % 2) + "&ref=r" + str(i % 2))

    # Scheme/case/port/utm/fragment variants of the same logical page
    # must collapse: find at least one canonical key with >= 2
    # distinct raws among 73 consecutive ids.
    by_canon: dict[str, set] = {}
    for raw, canon in got.values():
        by_canon.setdefault(canon, set()).add(raw)
    assert any(len(raws) >= 2 for raws in by_canon.values())


def test_dedup_url_canonical_census_shape(spark, sf_dir):
    q = all_queries()["dedup_url_canonical"]
    rows = q.fn(spark, sf_dir).collect()
    assert len(rows) > 0
    n_docs_total = sum(r.n_docs for r in rows)
    n_input = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert n_docs_total == n_input  # census covers every doc exactly once
    assert all(r.n_raw_variants <= r.n_docs for r in rows)
    assert any(r.n_raw_variants > 1 for r in rows)  # mess does collapse
    # keeper is the minimum doc in its group: monotone check vs a
    # recomputed min through the raw pairs
    df = q.fn(spark, sf_dir)
    recomputed = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .withColumn("canonical_url", _canonical_url_col(_raw_url_col()))
        .groupBy("canonical_url")
        .agg(F.min("doc_id").alias("k2"))
    )
    j = df.join(recomputed, "canonical_url")
    assert j.where(F.col("keeper_doc_id") != F.col("k2")).count() == 0
