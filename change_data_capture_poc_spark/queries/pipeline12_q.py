"""Round-12 additions: URL canonicalization dedup, applied paragraph
Bloom dedup.

``dedup_url_canonical`` — the RefinedWeb/Dolma front-line dedup step
(RefinedWeb, arXiv 2306.01116 §3.1 "URL deduplication" — the FIRST
filter in the pipeline, before any content hashing; Dolma, arXiv
2402.00159, runs the same normalize-then-exact-match key). A crawl
sees the same page under many superficially different URLs — scheme
case, ``www.`` prefixes, default ports, tracking parameters, parameter
order, fragments, trailing slashes — so the dedup key is the
CANONICALIZED URL, not the raw string.

The driver testdata has no URL column, so the query first synthesizes
a deterministically messy URL per document from ``doc_id`` residues
(both engines state the identical rule), then canonicalizes:

1. lowercase;
2. strip the scheme (``http://`` / ``https://`` — crawl frontiers
   treat them as one resource) and a leading ``www.``;
3. strip the fragment and default ports (``:443``/``:80``);
4. drop ``utm_*`` tracking parameters, SORT the surviving query
   parameters (order-insensitive match), drop empty params;
5. strip trailing slashes from the path.

Scale shape: synthesis + canonicalization are pure JVM string/regex
map work (no UDFs); the census aggregates (canonical, raw) pairs
map-side first, so exchange 1 carries ~distinct pair rows and
exchange 2 carries one row per canonical key — both pre-aggregated,
nothing text-sized ever shuffles. At 100 TB the canonical-key space
is web-host-bounded (Heaps-like sub-linear growth), and the two-level
aggregation is the standard high-cardinality count-distinct shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from change_data_capture_poc_spark.registry import register
from change_data_capture_poc_spark.sources.tables import load_table


def _raw_url_col() -> "F.Column":
    """The deterministic messy-URL synthesis rule (shared with the
    oracle SQL below, keep the two in lockstep):

    - scheme: doc_id%3 -> 0 'HTTPS://', 1 'https://', 2 'http://'
    - www:    doc_id%4 -> 0 'WWW.', 1 'www.', else ''
    - host:   'site{doc_id%8}.example', UPPERCASED when doc_id%5=0
    - port:   doc_id%6=0 -> ':443' on https, ':80' on http
    - path:   '/page{doc_id%3}', trailing '/' when doc_id%2=0
    - query:  optional 'utm_source=feed{doc_id%7}&' prefix when
      doc_id%3=0; 'id={doc_id%2}'; 'ref=r{doc_id%2}' BEFORE id when
      doc_id%9=1, AFTER id when doc_id%9=0; trailing
      '&utm_campaign=c{doc_id%3}' when doc_id%7=0
    - fragment: '#sec{doc_id%6}' when doc_id%8=0
    """
    d = F.col("doc_id")
    scheme = (
        F.when(d % 3 == 0, F.lit("HTTPS://"))
        .when(d % 3 == 1, F.lit("https://"))
        .otherwise(F.lit("http://"))
    )
    host = F.concat(F.lit("site"), (d % 8).cast("string"), F.lit(".example"))
    host = F.when(d % 5 == 0, F.upper(host)).otherwise(host)
    www = (
        F.when(d % 4 == 0, F.lit("WWW."))
        .when(d % 4 == 1, F.lit("www."))
        .otherwise(F.lit(""))
    )
    port = F.when(
        d % 6 == 0,
        F.when(d % 3 < 2, F.lit(":443")).otherwise(F.lit(":80")),
    ).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/page"),
        (d % 3).cast("string"),
        F.when(d % 2 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    utm1 = F.when(
        d % 3 == 0,
        F.concat(F.lit("utm_source=feed"), (d % 7).cast("string"),
                 F.lit("&")),
    ).otherwise(F.lit(""))
    idp = F.concat(F.lit("id="), (d % 2).cast("string"))
    refp = F.concat(F.lit("ref=r"), (d % 2).cast("string"))
    params = (
        F.when(d % 9 == 1, F.concat(refp, F.lit("&"), idp))
        .when(d % 9 == 0, F.concat(idp, F.lit("&"), refp))
        .otherwise(idp)
    )
    utm2 = F.when(
        d % 7 == 0,
        F.concat(F.lit("&utm_campaign=c"), (d % 3).cast("string")),
    ).otherwise(F.lit(""))
    frag = F.when(
        d % 8 == 0, F.concat(F.lit("#sec"), (d % 6).cast("string"))
    ).otherwise(F.lit(""))
    return F.concat(
        scheme, www, host, port, path, F.lit("?"), utm1, params, utm2, frag
    )


def _canonical_url_col(raw: "F.Column") -> "F.Column":
    low = F.lower(raw)
    nofrag = F.regexp_replace(low, "#.*$", "")
    noscheme = F.regexp_replace(nofrag, "^https?://", "")
    nowww = F.regexp_replace(noscheme, r"^www\.", "")
    # Path always follows the host (the synthesis never emits a bare
    # host), so the default port is always ':443/' / ':80/'. Anchored
    # to the host position: Spark's regexp_replace replaces ALL
    # occurrences while DuckDB's replaces only the FIRST, so an
    # unanchored pattern would let the twin rules diverge on a URL
    # carrying a second ':443/'-looking substring in a query param.
    # '^' can match at most once, making the semantics identical.
    noport = F.regexp_replace(nowww, "^([^/:?#]*):(443|80)/", "$1/")
    hostpath = F.regexp_replace(
        F.substring_index(noport, "?", 1), "/+$", ""
    )
    qs = F.when(
        F.instr(noport, "?") > 0, F.substring_index(noport, "?", -1)
    ).otherwise(F.lit(""))
    kept = F.sort_array(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.startswith("utm_"),
        )
    )
    return F.concat(
        hostpath,
        F.when(
            F.size(kept) > 0,
            F.concat(F.lit("?"), F.array_join(kept, "&")),
        ).otherwise(F.lit("")),
    )


_URL_RAW_SQL = """
        concat(
            CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://'
                 WHEN doc_id % 3 = 1 THEN 'https://'
                 ELSE 'http://' END,
            CASE WHEN doc_id % 4 = 0 THEN 'WWW.'
                 WHEN doc_id % 4 = 1 THEN 'www.' ELSE '' END,
            CASE WHEN doc_id % 5 = 0
                 THEN upper('site' || (doc_id % 8) || '.example')
                 ELSE 'site' || (doc_id % 8) || '.example' END,
            CASE WHEN doc_id % 6 = 0
                 THEN CASE WHEN doc_id % 3 < 2 THEN ':443' ELSE ':80' END
                 ELSE '' END,
            '/page' || (doc_id % 3),
            CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
            '?',
            CASE WHEN doc_id % 3 = 0
                 THEN 'utm_source=feed' || (doc_id % 7) || '&'
                 ELSE '' END,
            CASE WHEN doc_id % 9 = 1
                 THEN 'ref=r' || (doc_id % 2) || '&id=' || (doc_id % 2)
                 WHEN doc_id % 9 = 0
                 THEN 'id=' || (doc_id % 2) || '&ref=r' || (doc_id % 2)
                 ELSE 'id=' || (doc_id % 2) END,
            CASE WHEN doc_id % 7 = 0
                 THEN '&utm_campaign=c' || (doc_id % 3) ELSE '' END,
            CASE WHEN doc_id % 8 = 0
                 THEN '#sec' || (doc_id % 6) ELSE '' END
        )
"""


# Shared canonicalization CTE chain (raw synthesis -> canonical_url
# per doc) — the batch census oracle and the streaming drain oracle
# both build on it, so the canonicalization rule cannot drift between
# the two (repo rule: shared CTE builders keep twin oracles in
# lockstep).
_URL_CANON_CTE_SQL = f"""
    u AS (
        SELECT doc_id, {_URL_RAW_SQL} AS raw_url FROM documents
    ),
    s1 AS (
        SELECT doc_id, raw_url,
               regexp_replace(regexp_replace(regexp_replace(
                   lower(raw_url), '#.*$', ''), '^https?://', ''),
                   '^www\\.', '') AS s
        FROM u
    ),
    s2 AS (
        SELECT doc_id, raw_url,
               regexp_replace(s, '^([^/:?#]*):(443|80)/', '\\1/') AS s
        FROM s1
    ),
    s3 AS (
        SELECT doc_id, raw_url,
               regexp_replace(
                   CASE WHEN instr(s, '?') > 0
                        THEN s[1:instr(s, '?') - 1] ELSE s END,
                   '/+$', '') AS hostpath,
               CASE WHEN instr(s, '?') > 0
                    THEN s[instr(s, '?') + 1:] ELSE '' END AS qs
        FROM s2
    ),
    s4 AS (
        SELECT doc_id, raw_url, hostpath,
               list_sort(list_filter(string_split(qs, '&'),
                   p -> p <> '' AND NOT starts_with(p, 'utm_'))) AS kept
        FROM s3
    ),
    canon AS (
        SELECT doc_id, raw_url,
               hostpath || CASE WHEN len(kept) > 0
                                THEN '?' || array_to_string(kept, '&')
                                ELSE '' END AS canonical_url
        FROM s4
    )
"""


@register(
    "dedup_url_canonical",
    oracle=f"""
    WITH {_URL_CANON_CTE_SQL},
    pair AS (
        SELECT canonical_url, raw_url,
               CAST(COUNT(*) AS BIGINT) AS n_pair,
               MIN(doc_id) AS min_doc
        FROM canon GROUP BY canonical_url, raw_url
    )
    SELECT canonical_url,
           CAST(SUM(n_pair) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_raw_variants,
           MIN(min_doc) AS keeper_doc_id
    FROM pair GROUP BY canonical_url
    ORDER BY canonical_url
    """,
    doc="URL-canonicalization dedup census — the RefinedWeb/Dolma "
        "front-line key (see module docstring): synthesize the messy "
        "crawl URL deterministically from doc_id, canonicalize "
        "(lowercase; strip scheme/www./fragment/default ports; drop "
        "utm_* params; sort surviving params; strip trailing slash), "
        "and report per canonical URL: total docs, distinct raw "
        "variants collapsed, and the keep-first doc. Map-only "
        "synth+canon; two pre-aggregated exchanges ((canon,raw) then "
        "canon) — the standard scale-safe count-distinct shape.",
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    raw = _raw_url_col()
    canon = _canonical_url_col(raw)
    pairs = (
        d.select(
            "doc_id",
            raw.alias("raw_url"),
            canon.alias("canonical_url"),
        )
        .groupBy("canonical_url", "raw_url")
        .agg(
            F.count(F.lit(1)).alias("n_pair"),
            F.min("doc_id").alias("min_doc"),
        )
    )
    return (
        pairs.groupBy("canonical_url")
        .agg(
            F.sum("n_pair").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_raw_variants"),
            F.min("min_doc").alias("keeper_doc_id"),
        )
        .orderBy("canonical_url")
    )


# ---------------------------------------------------------------------------
# dedup_bloom_paragraph — APPLIED paragraph-level Bloom dedup
# ---------------------------------------------------------------------------

# Paragraph unit: the same non-overlapping 8-token spans as
# text_span_dedup_c4 (the synthetic corpus has no newlines; fixed
# token blocks are its paragraph proxy, shared so the two queries
# describe the same units).
_PARA_N = 8


def _para_gh_expr() -> str:
    """md5 fingerprints of the non-overlapping paragraph spans of a
    `w` token array — only the 32-char digest ever leaves the map
    stage, never paragraph text."""
    return (
        f"transform(sequence(0, (size(w) + {_PARA_N} - 1)"
        f" DIV {_PARA_N} - 1),"
        f" p -> md5(array_join(slice(w, p * {_PARA_N} + 1, {_PARA_N}),"
        f" ' ')))"
    )


def _para_oracle() -> str:
    from change_data_capture_poc_spark.queries.pipeline7_q import (
        _BLM_H,
        _BLM_M,
    )

    # _blm_bit_sql bakes the salt literal per hash function; restate
    # the identical md5('h:' || gh) recipe generically over the
    # unnested h (pipeline7_q._blm_bit_sql is the portability
    # reference both engines already agree on).
    bit = (
        "('0x' || substring(md5(b.h || ':' || f.gh), 1, 8))::BIGINT"
        f" % {_BLM_M}"
    )
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    spans AS (
        SELECT doc_id,
               md5(array_to_string(
                   w[s.pos * {_PARA_N} + 1 : s.pos * {_PARA_N} + {_PARA_N}],
                   ' ')) AS gh,
               doc_id * 1000000 + s.pos AS k
        FROM t, LATERAL (
            SELECT unnest(range((len(w) + {_PARA_N} - 1) // {_PARA_N}))
                   AS pos
        ) s
    ),
    first_occ AS (SELECT gh, MIN(k) AS fkey FROM spans GROUP BY gh),
    gbits AS (
        SELECT f.gh, f.fkey, {bit} AS bit
        FROM first_occ f, LATERAL (
            SELECT unnest(range({_BLM_H})) AS h
        ) b
        GROUP BY ALL
    ),
    bit_min AS (SELECT bit, MIN(fkey) AS bmin FROM gbits GROUP BY bit),
    fp AS (
        SELECT g.gh, g.fkey, COUNT(*) AS nb,
               COUNT(*) FILTER (WHERE m.bmin < g.fkey) AS nset
        FROM gbits g JOIN bit_min m USING (bit)
        GROUP BY g.gh, g.fkey
    ),
    flags AS (
        SELECT s.doc_id,
               CASE WHEN s.k > p.fkey THEN 1 ELSE 0 END AS exact_drop,
               CASE WHEN s.k = p.fkey AND p.nset = p.nb
                    THEN 1 ELSE 0 END AS fp_drop
        FROM spans s JOIN fp p USING (gh)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_paragraphs,
           CAST(SUM(exact_drop) AS BIGINT) AS n_exact_dropped,
           CAST(SUM(fp_drop) AS BIGINT) AS n_fp_dropped,
           CAST(COUNT(*) - SUM(exact_drop) - SUM(fp_drop) AS BIGINT)
               AS n_kept
    FROM flags GROUP BY doc_id
    """


@register(
    "dedup_bloom_paragraph",
    oracle=_para_oracle(),
    doc="APPLIED paragraph-level Bloom dedup — the bridge between "
        "text_span_dedup_c4 (exact keep-first paragraph dedup) and "
        "dedup_bloom_portable (Bloom membership, graded but never "
        "applied). Dolma's production paragraph dedup streams every "
        "paragraph through a Bloom filter in document order and "
        "DROPS what the filter claims to contain — so false "
        "positives delete real text, and the per-document damage "
        "accounting is the number a deployment must sign off on. "
        "The sequential check-then-add stream is made relational "
        "and deterministic via per-bit first-set times: a paragraph "
        "occurrence at global key k (doc_id*1e6+pos) is dropped "
        "exactly-duplicate iff an earlier occurrence of its "
        "fingerprint exists (k > first_occ), and dropped as a FALSE "
        "POSITIVE iff it IS the first occurrence but every one of "
        "its distinct filter bits was first set by a strictly "
        "earlier distinct paragraph (min-setter-key < k reproduces "
        "the stream's bit state at k bit-for-bit, because "
        "check-then-add bit insertion is monotone). Per doc: "
        "paragraphs, exact drops, FP drops, survivors. Scale shape: "
        "paragraph text never shuffles (md5 keys only); the bit "
        "table is bounded at 65536 rows forever and broadcast; "
        "exchanges are the gh keeper-agg, the bounded bit-min agg, "
        "the gh-keyed flag join, and the per-doc rollup — all "
        "skinny-key, all map-side-combinable.",
)
def dedup_bloom_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from change_data_capture_poc_spark.queries.pipeline7_q import (
        _blm_bit_exprs,
    )

    d = load_table(spark, sf_dir, "documents")
    spans = (
        d.select("doc_id", F.split("text", " ").alias("w"))
        .select(
            "doc_id",
            F.posexplode(F.expr(_para_gh_expr())).alias("pos", "gh"),
        )
        .select(
            "doc_id",
            "gh",
            (F.col("doc_id") * 1000000 + F.col("pos")).alias("k"),
        )
    )
    first_occ = spans.groupBy("gh").agg(F.min("k").alias("fkey"))
    # Distinct bits per distinct paragraph (the _blm_readout
    # distinct-bit rule: colliding hash functions probe ONE bit).
    gbits = first_occ.select(
        "gh",
        "fkey",
        F.explode(
            F.array_distinct(F.array(*_blm_bit_exprs()))
        ).alias("bit"),
    )
    bit_min = gbits.groupBy("bit").agg(F.min("fkey").alias("bmin"))
    fp = (
        # bounded: Bloom bit table capped at _BLM_M rows
        gbits.join(F.broadcast(bit_min), "bit")
        .groupBy("gh", "fkey")
        .agg(
            F.count(F.lit(1)).alias("nb"),
            F.count(F.when(F.col("bmin") < F.col("fkey"), 1)).alias(
                "nset"
            ),
        )
    )
    flags = spans.join(fp, "gh").select(
        "doc_id",
        (F.col("k") > F.col("fkey")).cast("int").alias("exact_drop"),
        (
            (F.col("k") == F.col("fkey"))
            & (F.col("nset") == F.col("nb"))
        ).cast("int").alias("fp_drop"),
    )
    return flags.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paragraphs"),
        F.sum("exact_drop").cast("long").alias("n_exact_dropped"),
        F.sum("fp_drop").cast("long").alias("n_fp_dropped"),
        (
            F.count(F.lit(1)) - F.sum("exact_drop") - F.sum("fp_drop")
        ).cast("long").alias("n_kept"),
    )
