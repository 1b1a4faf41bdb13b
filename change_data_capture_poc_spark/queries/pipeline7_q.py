"""Round-7 pipeline operators.

Extends the sketch / ANN / hygiene / statistics families with the
remaining published shapes a 100 TB curation loop runs:

- ``agg_cms_portable`` — Count-Min sketch (Cormode & Muthukrishnan
  2005) built from md5 hashes BOTH engines compute identically, so
  the per-item estimates themselves are oracle-exact (the companion
  to ``agg_hll_portable``'s distinct counting: CMS answers point
  frequency queries). Registers merge associatively (SUM) — the
  distributed-sketch property; the overestimate invariant
  (estimate >= exact, always) is pytest-pinned.
- ``ann_pq_adc_recall`` — Product Quantization with asymmetric
  distance computation (Jegou et al. 2011, the FAISS IVF-PQ scale
  path): vectors collapse to M small codes, queries score candidates
  via a tiny lookup table, recall@k is measured against exact truth.
- ``decontaminate_semantic_embedding`` — semantic (embedding-cosine)
  benchmark decontamination, the near-dup-robust complement to
  ``decontaminate_ngram_overlap``'s surface-form check.
- ``bitext_margin_mining`` — margin-based parallel-text mining
  (Artetxe & Schwenk 2019, the LASER/CCMatrix miner): candidate score
  = cosine normalized by the mean of both directions' top-k
  neighborhoods, which kills hub vectors that plain cosine ranks
  first.
- ``corpus_doremi_domain_weights`` — DoReMi (Xie et al. 2023) domain
  reweighting: one exponentiated-gradient step on per-domain excess
  loss (generic vs in-domain unigram LM), integer-millinat exact.
- ``bpe_train_iterative_merges`` — the real iterative BPE trainer
  (Sennrich et al. 2016): 3 merge rounds where round r's counts
  depend on round r-1's applied merges; greedy application is
  relational (gaps-and-islands run parity), not a sequential fold.
- ``events_anomaly_mad_robust`` — median/MAD modified z-score outlier
  screen (Iglewicz & Hoaglin), the heavy-tail-safe zscore twin.
- ``graph_triangle_count_dupgraph`` — id-oriented triangle counting
  over the MinHash-LSH candidate graph (template-farm vs chain
  topology readout).
- ``corpus_weighted_priority_sample`` — Efraimidis-Spirakis A-Res
  weighted sampling without replacement (deterministic md5 uniforms),
  the weighted companion to bottom-k consistent sampling.
- ``dedup_bloom_portable`` — Bloom-filter span membership with
  MEASURED false-positive rate vs exact truth (the Dolma-style dedup
  front line; third portable sketch after HLL and CMS).
- ``ann_ivf_pq_recall`` — the composed FAISS-style IVF-PQ index:
  coarse-partition probing + PQ asymmetric-distance scoring, graded
  against exact truth with candidate counts.

- ``corpus_weighted_build_e2e`` — the composed flagship: admission
  gate -> exact dedup -> DoReMi weights on the survivors ->
  largest-remainder budget allocation -> per-source A-Res weighted
  sample (shared builders keep it in lockstep with the standalone
  queries).

- ``cdc_schema_evolution_union`` — upstream-ALTER-TABLE tolerance:
  two writer generations parsed by ONE evolved union schema (missing
  fields -> NULL), the Debezium/mergeSchema reader contract.
- ``events_changepoint_cusum`` — Page's CUSUM changepoint estimator
  per user (drift says THAT a metric moved; CUSUM says WHEN).
- ``events_holt_linear_smoothing`` — Holt double exponential
  smoothing (level + trend fold, the trend-aware events_ema sibling).
- ``dedup_cluster_best_representative`` — quality-keeper cluster
  collapse: each near-dup component keeps its longest member.
- ``dedup_threshold_sensitivity`` — retention / drop-count curve over
  Jaccard thresholds, measured in ONE candidate-verification pass
  (integer cross-multiplied comparisons, no float boundaries).

Stream twins in ``streaming_q``: ``streaming_cms_register_drain``,
``streaming_bloom_bitset_drain``, ``streaming_weighted_reservoir_
drain`` (A-Res reservoir via ``applyInPandasWithState``, state = the
k-row reservoir itself).

Same determinism rules as the rest of the surface: no rand(); every
cross-engine float is rounded at 1e-6 with +1e-9 pre-round; corpus
text/vectors never shuffle — only hashes, codes, and count tables do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from change_data_capture_poc_spark.registry import register
from change_data_capture_poc_spark.sources.tables import load_table
from change_data_capture_poc_spark.functions.caching import persist_once

# ---------------------------------------------------------------------------
# agg_cms_portable — cross-engine-exact Count-Min sketch
# ---------------------------------------------------------------------------

_CMS_D = 4   # hash rows (independent via row-salted md5)
_CMS_W = 32  # buckets per row (small on purpose: the synthetic
             # ~40-word vocabulary needs real collisions for the
             # estimate-vs-exact readout to be informative)


def _cms_bucket_sql(row: int, word_expr: str, engine: str) -> str:
    """Bucket index for one hash row, as an engine-specific SQL string.

    Same md5-prefix integer both engines compute: row salt || ':' ||
    token, first 8 hex chars as a BIGINT, mod width.
    """
    if engine == "spark":
        return (
            f"CAST(conv(substring(md5(CAST(concat('{row}:', {word_expr}) "
            f"AS BINARY)), 1, 8), 16, 10) AS BIGINT) % {_CMS_W}"
        )
    return (
        f"('0x' || substring(md5('{row}:' || {word_expr}), 1, 8))"
        f"::BIGINT % {_CMS_W}"
    )


@register(
    "agg_cms_portable",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    t AS (SELECT word FROM tok WHERE word != ''),
    reg AS (
        SELECT r.j, {_cms_bucket_sql(0, 'word', 'duck')
                     .replace("'0:'", "CAST(r.j AS VARCHAR) || ':'")} AS b,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM t, (SELECT unnest(range({_CMS_D})) AS j) r
        GROUP BY r.j, b
    ),
    ex AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS exact_count
           FROM t GROUP BY word),
    wb AS (
        SELECT ex.word, ex.exact_count, r.j,
               {_cms_bucket_sql(0, 'ex.word', 'duck')
                .replace("'0:'", "CAST(r.j AS VARCHAR) || ':'")} AS b
        FROM ex, (SELECT unnest(range({_CMS_D})) AS j) r
    )
    SELECT wb.word, wb.exact_count,
           CAST(MIN(reg.cnt) AS BIGINT) AS cms_estimate,
           CAST(MIN(reg.cnt) - wb.exact_count AS BIGINT) AS overcount
    FROM wb JOIN reg ON wb.j = reg.j AND wb.b = reg.b
    GROUP BY wb.word, wb.exact_count
    """,
    doc=f"PORTABLE Count-Min sketch ({_CMS_D} rows x {_CMS_W} buckets, "
        f"Cormode & Muthukrishnan 2005) over the document token "
        f"stream: each token increments one bucket per hash row "
        f"(row-salted md5-prefix integers both engines compute "
        f"identically), and a word's frequency estimate is the MIN of "
        f"its {_CMS_D} bucket counts — so, like agg_hll_portable, the "
        f"ESTIMATE itself is oracle-exact, not just the input rows. "
        f"Emits estimate vs exact count and the overcount per word "
        f"(never negative — the CMS one-sided-error guarantee, pinned "
        f"by pytest along with register-merge associativity: SUM "
        f"commutes with sharding, the distributed-sketch property). "
        f"Scale shape: the sketch is ONE shuffle over "
        f"{_CMS_D}x{_CMS_W} = {_CMS_D * _CMS_W} bounded keys with "
        f"map-side combine — at 100 TB the registers stay "
        f"{_CMS_D * _CMS_W} rows while exact per-word counting grows "
        f"with the vocabulary; the estimate join broadcasts the "
        f"{_CMS_D * _CMS_W}-row register table onto the vocab frame.",
)
def agg_cms_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
    )
    # Registers: one (row, bucket) count per token per hash row.
    jb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    F.expr(_cms_bucket_sql(j, "word", "spark")).alias("b"),
                )
                for j in range(_CMS_D)
            ]
        )
    )
    reg = (
        t.select(jb.alias("jb"))
        .select("jb.j", "jb.b")
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    ex = t.groupBy("word").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    wb = ex.select(
        "word",
        "exact_count",
        jb.alias("jb"),
    ).select("word", "exact_count", "jb.j", "jb.b")
    est = (
        # bounded: CMS register grid, _CMS_D x _CMS_W rows
        wb.join(F.broadcast(reg), ["j", "b"])
        .groupBy("word", "exact_count")
        .agg(F.min("cnt").cast("long").alias("cms_estimate"))
    )
    return est.select(
        "word",
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count"))
        .cast("long")
        .alias("overcount"),
    )


# ---------------------------------------------------------------------------
# decontaminate_semantic_embedding
# ---------------------------------------------------------------------------

_DSE_NB = 16      # benchmark (eval-set) vectors: vec_id < 16
_DSE_THRESH = 0.35  # contamination cosine ceiling (this corpus's true
                    # neighbors sit near cos 0.39-0.49; see SCALING.md)


def _collect_bench_vectors(e) -> list[tuple[int, list[float], float]]:
    """Collect the benchmark vectors (bounded at _DSE_NB rows) with
    their L2 norms folded left-to-right — the same IEEE sequence both
    engines' folds execute, so the literal norm is bit-identical to
    an in-engine sqrt(list_dot_product(b, b))."""
    import math

    rows = sorted(
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in e.where(F.col("vec_id") < _DSE_NB).collect()
    )
    out = []
    for vid, vec in rows:
        acc = 0.0
        for x in vec:
            acc = acc + x * x
        n = math.sqrt(acc)
        out.append((vid, vec, n if n != 0.0 else 1.0))
    return out


@register(
    "decontaminate_semantic_embedding",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    b AS (SELECT vec_id, v FROM e WHERE vec_id < {_DSE_NB}),
    c AS (SELECT * FROM e WHERE vec_id >= {_DSE_NB}),
    sc AS (
        SELECT c.vec_id, c.label,
               MAX(ROUND(list_dot_product(c.v, b.v) /
                   ((CASE WHEN sqrt(list_dot_product(c.v, c.v)) = 0
                          THEN 1 ELSE sqrt(list_dot_product(c.v, c.v))
                     END) *
                    (CASE WHEN sqrt(list_dot_product(b.v, b.v)) = 0
                          THEN 1 ELSE sqrt(list_dot_product(b.v, b.v))
                     END)) + 1e-9, 6)) AS mx
        FROM c, b GROUP BY c.vec_id, c.label
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COUNT(*) FILTER (WHERE mx >= {_DSE_THRESH}) AS BIGINT)
               AS n_contaminated,
           ROUND(AVG(mx) + 1e-9, 6) AS avg_max_cos,
           MAX(mx) AS top_max_cos
    FROM sc GROUP BY label
    """,
    doc=f"SEMANTIC benchmark decontamination: flag corpus vectors "
        f"whose max cosine to any of the {_DSE_NB} benchmark (eval-"
        f"set) embeddings reaches {_DSE_THRESH} — the paraphrase-"
        f"robust complement to decontaminate_ngram_overlap (surface "
        f"n-grams miss reworded eval leakage; embedding cosine "
        f"catches it — the check run before trusting benchmark "
        f"deltas). Per-label readout: corpus size, contaminated "
        f"count, mean/max of the max-cosine. Scale shape: the "
        f"benchmark set is collected ({_DSE_NB} rows, the blessed "
        f"bounded-collect) and folded into the MAP STAGE as a "
        f"greatest() over literal-vector cosines — the corpus is "
        f"never shuffled, never joined, and the only exchange is the "
        f"|labels|-row dashboard rollup. Benchmark norms are folded "
        f"driver-side with the same left-to-right IEEE sequence the "
        f"engines' folds execute (zero-norm -> 1 guard on both "
        f"sides, matching functions/vectors.safe_l2_norm).",
)
def decontaminate_semantic_embedding(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    bench = _collect_bench_vectors(e)
    cos_terms = ", ".join(
        "round(aggregate(zip_with(v, array("
        + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in vec)
        + "), (x, y) -> x * y), 0D, (a, b) -> a + b)"
        + " / (nv * CAST('" + repr(n) + "' AS DOUBLE)) + 1e-9, 6)"
        for _vid, vec, n in bench
    )
    from change_data_capture_poc_spark.functions.vectors import safe_l2_norm

    c = e.where(F.col("vec_id") >= _DSE_NB).withColumn(
        "nv", safe_l2_norm(F.col("v"))
    )
    sc = c.select(
        "label", F.expr(f"greatest({cos_terms})").alias("mx")
    )
    return sc.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum(F.when(F.col("mx") >= _DSE_THRESH, 1).otherwise(0))
        .cast("long")
        .alias("n_contaminated"),
        F.round(F.avg("mx") + F.lit(1e-9), 6).alias("avg_max_cos"),
        F.max("mx").alias("top_max_cos"),
    )


# ---------------------------------------------------------------------------
# ann_pq_adc_recall — product quantization + asymmetric distance
# ---------------------------------------------------------------------------

_PQ_M = 4     # subspaces
_PQ_SUB = 16  # dims per subspace (4 x 16 = the 64-dim embeddings)
_PQ_C = 8     # codewords per subspace (= slices of vectors id < 8)
_PQ_NQ = 8    # queries: vec_id in [8, 16)
_PQ_K = 5     # recall@k


def _pq_l2_duck(a: str, b: str) -> str:
    return (
        f"ROUND(list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> (p[1] - p[2]) * (p[1] - p[2])), (x, y) -> x + y) "
        f"+ 1e-9, 6)"
    )


def _pq_oracle() -> str:
    m_tbl = f"(SELECT unnest(range({_PQ_M})) AS m) mm"
    sub = f"e.v[mm.m * {_PQ_SUB} + 1 : mm.m * {_PQ_SUB} + {_PQ_SUB}]"
    return f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    sub AS (SELECT e.vec_id, mm.m, {sub} AS s FROM e, {m_tbl}),
    cb AS (SELECT vec_id AS cid, m, s AS cs FROM sub
           WHERE vec_id < {_PQ_C}),
    enc AS (
        SELECT vec_id, m, cid AS code FROM (
            SELECT s.vec_id, s.m, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY {_pq_l2_duck('s.s', 'c.cs')}, c.cid
                   ) AS rn
            FROM sub s JOIN cb c USING (m)
        ) WHERE rn = 1
    ),
    lut AS (
        SELECT s.vec_id AS q_id, s.m, c.cid,
               {_pq_l2_duck('s.s', 'c.cs')} AS pdist
        FROM sub s JOIN cb c USING (m)
        WHERE s.vec_id >= {_PQ_C} AND s.vec_id < {_PQ_C + _PQ_NQ}
    ),
    adc AS (
        SELECT l.q_id, en.vec_id AS neighbor_id,
               ROUND(SUM(l.pdist) + 1e-9, 6) AS adc_dist
        FROM enc en JOIN lut l ON en.m = l.m AND en.code = l.cid
        WHERE en.vec_id != l.q_id
        GROUP BY l.q_id, en.vec_id
    ),
    pred AS (
        SELECT q_id, neighbor_id FROM adc
        QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY adc_dist, neighbor_id)
                <= {_PQ_K}
    ),
    truth AS (
        SELECT q_id, neighbor_id FROM (
            SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_pq_l2_duck('e.v', 'q.v')}, e.vec_id
                   ) AS rn
            FROM e, e q
            WHERE q.vec_id >= {_PQ_C} AND q.vec_id < {_PQ_C + _PQ_NQ}
              AND e.vec_id != q.vec_id
        ) WHERE rn <= {_PQ_K}
    ),
    hits AS (
        SELECT t.q_id,
               CAST(COUNT(p.neighbor_id) AS BIGINT) AS n_hits
        FROM truth t LEFT JOIN pred p
            ON t.q_id = p.q_id AND t.neighbor_id = p.neighbor_id
        GROUP BY t.q_id
    )
    SELECT q_id, n_hits,
           ROUND(n_hits / {_PQ_K}.0 + 1e-9, 6) AS recall
    FROM hits
    """


def _pq_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )


def _pq_codebook(e: DataFrame) -> list[tuple[int, list[float]]]:
    """The _PQ_C codeword source vectors — bounded collect.

    cids must be EXACTLY 0.._PQ_C-1: the oracle ties break on the raw
    cid and _pq_adc_parts indexes its flat literal LUT by
    ``(q_idx*M + m)*C + code``, which is only a position when the ids
    are contiguous from 0. A dataset missing any of the first _PQ_C
    vec_ids would otherwise surface as an opaque KeyError at
    plan-build — fail with the actual gap instead."""
    cb = sorted(
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in e.where(F.col("vec_id") < _PQ_C).collect()
    )
    got = [cid for cid, _ in cb]
    if got != list(range(_PQ_C)):
        raise ValueError(
            f"PQ codebook needs contiguous vec_ids 0..{_PQ_C - 1} "
            f"(they are both the codeword ids and the LUT positions); "
            f"embeddings table has {got}"
        )
    return cb


def _pq_sub_lits(vec: list[float], m: int) -> str:
    return ", ".join(
        f"CAST('{x!r}' AS DOUBLE)"
        for x in vec[m * _PQ_SUB : (m + 1) * _PQ_SUB]
    )


def _pq_code_cols(cb: list[tuple[int, list[float]]]) -> list[F.Column]:
    """Map-side PQ encoding: per-subspace argmin over literal
    codewords (zero shuffles), 1e-6-rounded dist + lowest-cid tie."""

    def code_expr(m: int) -> F.Column:
        cands = ", ".join(
            f"struct(round(aggregate(zip_with("
            f"slice(v, {m * _PQ_SUB + 1}, {_PQ_SUB}), "
            f"array({_pq_sub_lits(vec, m)}), "
            f"(x, y) -> (x - y) * (x - y)), 0D, (a, b) -> a + b) "
            f"+ 1e-9, 6) AS dist, {cid} AS cid)"
            for cid, vec in cb
        )
        return F.expr(f"least({cands}).cid")

    return [code_expr(m).alias(f"code_{m}") for m in range(_PQ_M)]


def _pq_queries(e: DataFrame) -> DataFrame:
    return e.where(
        (F.col("vec_id") >= _PQ_C) & (F.col("vec_id") < _PQ_C + _PQ_NQ)
    )


def _pq_adc_parts(
    qe: DataFrame, cb: list[tuple[int, list[float]]]
) -> tuple[DataFrame, F.Column]:
    """(q_meta frame, ADC distance column) for scoring coded vectors.

    The LUT is computed IN-ENGINE (query-subvector x codeword
    distances, same rounded arithmetic as encoding), then collected —
    bounded at NQ*M*C rows by construction — and folded back in as a
    literal array indexed by (q_idx, m, code)."""
    lut_parts = []
    for m in range(_PQ_M):
        for cid, vec in cb:
            lut_parts.append(
                F.struct(
                    F.lit(m).alias("m"),
                    F.lit(cid).alias("cid"),
                    F.expr(
                        f"round(aggregate(zip_with("
                        f"slice(v, {m * _PQ_SUB + 1}, {_PQ_SUB}), "
                        f"array({_pq_sub_lits(vec, m)}), "
                        f"(x, y) -> (x - y) * (x - y)), "
                        f"0D, (a, b) -> a + b) + 1e-9, 6)"
                    ).alias("pdist"),
                )
            )
    lut_rows = (
        qe.select("vec_id", F.explode(F.array(*lut_parts)).alias("p"))
        .select("vec_id", "p.m", "p.cid", "p.pdist")
        .collect()
    )
    lut = {(int(r["vec_id"]), int(r["m"]), int(r["cid"])): float(r["pdist"])
           for r in lut_rows}
    q_ids = sorted({k[0] for k in lut})
    flat = [
        lut[(q, m, c)]
        for q in q_ids
        for m in range(_PQ_M)
        for c in range(_PQ_C)
    ]
    lut_sql = "array(" + ", ".join(
        f"CAST('{x!r}' AS DOUBLE)" for x in flat
    ) + ")"
    q_meta = qe.sparkSession.createDataFrame(
        [(q, i) for i, q in enumerate(q_ids)], "q_id bigint, q_idx int"
    )
    adc = F.expr(
        "round("
        + " + ".join(
            f"element_at({lut_sql}, (q_idx * {_PQ_M} + {m}) * {_PQ_C} "
            f"+ code_{m} + 1)"
            for m in range(_PQ_M)
        )
        + " + 1e-9, 6)"
    )
    return q_meta, adc


@register(
    "ann_pq_adc_recall",
    oracle=_pq_oracle(),
    doc=f"Product Quantization with asymmetric distance (Jegou et al. "
        f"2011 — the FAISS IVF-PQ scale path): each vector is encoded "
        f"as {_PQ_M} small codes (argmin over {_PQ_C} codewords per "
        f"{_PQ_SUB}-dim subspace, codewords = slices of the first "
        f"{_PQ_C} vectors), a query scores ANY candidate via a "
        f"{_PQ_M}x{_PQ_C} lookup table of precomputed subspace "
        f"distances, and recall@{_PQ_K} is measured against exact "
        f"full-dim L2 truth — the compression-vs-recall readout run "
        f"before shipping a PQ index. Scale shape: encoding is "
        f"MAP-SIDE argmin over literal codewords (zero shuffles — the "
        f"corpus crosses the network as {_PQ_M} bytes of codes, the "
        f"whole point of PQ: 64 doubles -> {_PQ_M} codes is a 128x "
        f"store shrink); the ADC scan looks partial distances up in a "
        f"{_PQ_NQ * _PQ_M * _PQ_C}-entry literal LUT (collected from "
        f"an in-engine computed {_PQ_NQ * _PQ_M * _PQ_C}-row frame, "
        f"the blessed bounded collect) and cuts via grouped_topk; "
        f"the exact side is the deliberate eval-gate brute force. "
        f"All partial distances are 1e-6-rounded before the "
        f"{_PQ_M}-term ADC sum so no cross-engine float order "
        f"survives.",
)
def ann_pq_adc_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from change_data_capture_poc_spark.operators.topk import (
        variant_topk_hits,
    )

    e = _pq_embeddings(spark, sf_dir)
    cb = _pq_codebook(e)
    qe = _pq_queries(e)
    q_meta, adc = _pq_adc_parts(qe, cb)
    # Fused dual ranking (r14): ADC prediction and exact truth rank the
    # SAME candidate pairs under different distances — one corpus scan
    # computes the PQ codes map-side AND carries the raw vector, joins
    # the combined (q_id, q_idx, qv) broadcast once, and emits both
    # variant rows per pair, where the old shape scanned the corpus
    # twice (once coded, once raw) with a top-k pass each (guide
    # §1.2/§4).
    qv = qe.select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    # bounded: per-query PQ metadata (query-set-capped)
    qside = q_meta.join(qv, "q_id")
    exact_dist = F.round(
        F.aggregate(
            F.zip_with(
                F.col("v"), F.col("qv"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )
        + F.lit(1e-9),
        6,
    )
    scored = (
        e.select("vec_id", "v", *_pq_code_cols(cb))
        # bounded: per-query PQ metadata + query vector (query-set-capped)
        .crossJoin(F.broadcast(qside))
        .where(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit(0).alias("variant"),
                        exact_dist.alias("dist"),
                    ),
                    F.struct(
                        F.lit(1).alias("variant"), adc.alias("dist")
                    ),
                )
            ).alias("vc"),
        )
        .select(
            "q_id",
            "neighbor_id",
            F.col("vc.dist").alias("dist"),
            F.col("vc.variant").alias("variant"),
        )
    )
    res = variant_topk_hits(
        scored, _PQ_K, [("dist", True), ("neighbor_id", True)]
    )
    return res.select(
        "q_id",
        F.col("hits").alias("n_hits"),
        F.round(F.col("hits") / float(_PQ_K) + F.lit(1e-9), 6).alias(
            "recall"
        ),
    )


# ---------------------------------------------------------------------------
# bitext_margin_mining — margin-normalized nearest-neighbor matching
# ---------------------------------------------------------------------------

_BMM_NQ = 8  # "source side" sentences: vec_id < 8 (the bounded set)
_BMM_K = 4   # neighborhood size for the margin normalizer


def _bmm_oracle() -> str:
    cos = (
        "ROUND(list_dot_product(t.v, s.v) /"
        " ((CASE WHEN sqrt(list_dot_product(t.v, t.v)) = 0 THEN 1"
        "        ELSE sqrt(list_dot_product(t.v, t.v)) END) *"
        "  (CASE WHEN sqrt(list_dot_product(s.v, s.v)) = 0 THEN 1"
        "        ELSE sqrt(list_dot_product(s.v, s.v)) END)) + 1e-9, 6)"
    )
    return f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    s AS (SELECT * FROM e WHERE vec_id < {_BMM_NQ}),
    t AS (SELECT * FROM e WHERE vec_id >= {_BMM_NQ}),
    sc AS (
        SELECT s.vec_id AS q_id, t.vec_id AS neighbor_id,
               {cos} AS cosine
        FROM t, s
    ),
    fwd AS (
        SELECT q_id, ROUND(AVG(cosine) + 1e-9, 6) AS fwd_mean FROM (
            SELECT q_id, cosine FROM sc
            QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
                ORDER BY cosine DESC, neighbor_id) <= {_BMM_K}
        ) GROUP BY q_id
    ),
    bwd AS (
        SELECT neighbor_id, ROUND(AVG(cosine) + 1e-9, 6) AS bwd_mean
        FROM (
            SELECT neighbor_id, cosine FROM sc
            QUALIFY ROW_NUMBER() OVER (PARTITION BY neighbor_id
                ORDER BY cosine DESC, q_id) <= {_BMM_K}
        ) GROUP BY neighbor_id
    ),
    m AS (
        SELECT sc.q_id, sc.neighbor_id, sc.cosine,
               ROUND(sc.cosine /
                     (CASE WHEN (f.fwd_mean + b.bwd_mean) / 2 = 0 THEN 1
                           ELSE (f.fwd_mean + b.bwd_mean) / 2 END)
                     + 1e-9, 6) AS margin
        FROM sc JOIN fwd f USING (q_id) JOIN bwd b USING (neighbor_id)
    )
    SELECT q_id, neighbor_id AS match_id, cosine, margin FROM m
    QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY margin DESC, neighbor_id) <= 1
    """


@register(
    "bitext_margin_mining",
    oracle=_bmm_oracle(),
    doc=f"Margin-based bitext mining (Artetxe & Schwenk 2019 — the "
        f"LASER/CCMatrix parallel-corpus miner): a candidate pair's "
        f"score is its cosine RATIO-NORMALIZED by the mean cosine of "
        f"both sides' top-{_BMM_K} neighborhoods — margin = cos(x,y) "
        f"/ ((fwd_k(x) + bwd_k(y)) / 2) — which demotes hub vectors "
        f"that plain cosine ranks first (the known failure of raw-"
        f"cosine mining). Emits the top match per source sentence "
        f"with cosine and margin. Scale shape: the {_BMM_NQ} source "
        f"vectors are collected and folded into the MAP STAGE as a "
        f"literal cosine array, so the backward (candidate-side) "
        f"neighborhood mean is computed per row with ZERO shuffles "
        f"(sort of an {_BMM_NQ}-element array); the forward "
        f"neighborhood and the final match both cut through "
        f"grouped_topk (k-bounded exchange); the corpus is scanned "
        f"twice and never shuffled.",
)
def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from change_data_capture_poc_spark.operators.topk import grouped_topk

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bench = _collect_bench_vectors(e.where(F.col("vec_id") < _BMM_NQ))
    src_ids = [vid for vid, _v, _n in bench]
    from change_data_capture_poc_spark.functions.vectors import safe_l2_norm

    cos_terms = ", ".join(
        "round(aggregate(zip_with(v, array("
        + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in vec)
        + "), (x, y) -> x * y), 0D, (a, b) -> a + b)"
        + " / (nv * CAST('" + repr(n) + "' AS DOUBLE)) + 1e-9, 6)"
        for _vid, vec, n in bench
    )
    ids_sql = ", ".join(f"CAST({i} AS BIGINT)" for i in src_ids)
    t = (
        e.where(F.col("vec_id") >= _BMM_NQ)
        .withColumn("nv", safe_l2_norm(F.col("v")))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.expr(f"array({cos_terms})").alias("carr"),
        )
    )
    # Backward neighborhood mean: per candidate row, mean of its
    # top-k cosines over the source set — an array sort, map-side.
    bwd = F.expr(
        f"round(aggregate(slice(array_sort(carr), "
        f"{_BMM_NQ - _BMM_K + 1}, {_BMM_K}), 0D, (a, b) -> a + b) "
        f"/ {_BMM_K}.0 + 1e-9, 6)"
    )
    scored = (
        t.withColumn("bwd_mean", bwd)
        .select(
            "neighbor_id",
            "bwd_mean",
            F.posexplode("carr").alias("qi", "cosine"),
        )
        .withColumn(
            "q_id", F.expr(f"element_at(array({ids_sql}), qi + 1)")
        )
        .drop("qi")
    )
    fwd = (
        grouped_topk(
            scored.select("q_id", "neighbor_id", "cosine"),
            ["q_id"],
            [("cosine", False), ("neighbor_id", True)],
            _BMM_K,
        )
        .groupBy("q_id")
        .agg(F.round(F.avg("cosine") + F.lit(1e-9), 6).alias("fwd_mean"))
    )
    # Same zero-substitution guard as safe_l2_norm: a zero neighborhood
    # denominator must divide identically on both engines (Spark yields
    # NULL / throws under ANSI where DuckDB follows IEEE).
    denom = (F.col("fwd_mean") + F.col("bwd_mean")) / 2
    # bounded: per-query means (query-set-capped)
    m = scored.join(F.broadcast(fwd), "q_id").withColumn(
        "margin",
        F.round(
            F.col("cosine")
            / F.when(denom == 0, F.lit(1.0)).otherwise(denom)
            + F.lit(1e-9),
            6,
        ),
    )
    return grouped_topk(
        m.select("q_id", "neighbor_id", "cosine", "margin"),
        ["q_id"],
        [("margin", False), ("neighbor_id", True)],
        1,
    ).select(
        "q_id", F.col("neighbor_id").alias("match_id"), "cosine", "margin"
    )


# ---------------------------------------------------------------------------
# corpus_doremi_domain_weights
# ---------------------------------------------------------------------------

_DRM_ETA = 1.0     # exponentiated-gradient step size
_DRM_SMOOTH = 0.01  # uniform smoothing mass


def _doremi_sql(docs_cte: str) -> str:
    """DuckDB CTE chain computing smoothed DoReMi weights from a
    relation ``docs_cte(source, text)`` — ends in ``drm(source,
    n_tokens, excess_nats, doremi_weight)``. Shared by the standalone
    query and the composed weighted-build pipeline so the two oracles
    cannot drift."""
    return f"""
    drm_tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM {docs_cte}
    ),
    drm_stc AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c_st
            FROM drm_tok WHERE tok != '' GROUP BY source, tok),
    drm_td AS (SELECT source, SUM(c_st) AS t_dom FROM drm_stc
               GROUP BY source),
    drm_cg AS (SELECT tok, SUM(c_st) AS c_g FROM drm_stc GROUP BY tok),
    drm_tg AS (SELECT SUM(c_st) AS t_all FROM drm_stc),
    drm_scored AS (
        SELECT s.source, s.c_st,
               CAST(ROUND(-ln(s.c_st * 1.0 / td.t_dom) * 1000 + 1e-9, 0)
                    AS BIGINT) AS mnat_dom,
               CAST(ROUND(-ln(cg.c_g * 1.0 / tg.t_all) * 1000 + 1e-9, 0)
                    AS BIGINT) AS mnat_glob
        FROM drm_stc s JOIN drm_td td USING (source)
        JOIN drm_cg cg USING (tok), drm_tg tg
    ),
    drm_dom AS (
        SELECT source,
               CAST(SUM(c_st) AS BIGINT) AS n_tokens,
               SUM(c_st * mnat_glob) AS mn_glob,
               SUM(c_st * mnat_dom) AS mn_dom
        FROM drm_scored GROUP BY source
    ),
    drm_raw AS (
        SELECT source, n_tokens,
               ROUND((mn_glob - mn_dom) * 1.0 / n_tokens / 1000
                     + 1e-9, 6) AS excess_nats,
               ROUND((n_tokens * 1.0
                      / (SELECT SUM(n_tokens) FROM drm_dom))
                     * exp({_DRM_ETA} * (mn_glob - mn_dom) * 1.0
                           / n_tokens / 1000) + 1e-9, 6) AS w_raw
        FROM drm_dom
    ),
    drm_k AS (SELECT COUNT(*) AS k, SUM(w_raw) AS z FROM drm_raw),
    drm AS (
        SELECT source, n_tokens, excess_nats,
               ROUND((1 - {_DRM_SMOOTH}) * w_raw / k.z
                     + {_DRM_SMOOTH} / k.k + 1e-9, 6) AS doremi_weight
        FROM drm_raw, drm_k k
    )"""


def _doremi_weights(docs: DataFrame) -> DataFrame:
    """Spark twin of ``_doremi_sql``: smoothed DoReMi weights
    (source, n_tokens, excess_nats, doremi_weight) from a
    (source, text) frame. One (source, token) count shuffle; the
    global-model join is AQE-decided; everything downstream runs on
    |sources|-row frames."""
    stc = (
        docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c_st"))
        .transform(persist_once)  # count-table-sized; four downstream branches
        # (domain totals, global counts, grand total, scoring) would
        # otherwise each replay the corpus token shuffle
    )
    from change_data_capture_poc_spark.functions.windows import (
        global_agg_window,
    )

    gw = global_agg_window()
    # Grand total folded onto the |sources|-row domain-totals frame by a
    # bounded single-partition window (integer sum — order-free), so the
    # broadcast build ships BOTH scalars in one branch instead of the
    # old crossJoin(broadcast(stc.agg(...))) replaying the corpus token
    # aggregation as a separate subtree (r13: plan 149 nodes -> ~60,
    # cached-scan copies 16 -> 3).
    td = (
        stc.groupBy("source")
        .agg(F.sum("c_st").alias("t_dom"))
        .withColumn("t_all", F.sum("t_dom").over(gw))
    )
    cg = stc.groupBy("tok").agg(F.sum("c_st").alias("c_g"))
    scored = (
        # bounded: |sources| domain totals
        stc.join(F.broadcast(td), "source")
        .join(cg, "tok")  # count-table join: AQE decides the strategy
        .select(
            "source",
            "c_st",
            F.round(
                -F.log(F.col("c_st") * 1.0 / F.col("t_dom")) * 1000
                + F.lit(1e-9),
                0,
            )
            .cast("long")
            .alias("mnat_dom"),
            F.round(
                -F.log(F.col("c_g") * 1.0 / F.col("t_all")) * 1000
                + F.lit(1e-9),
                0,
            )
            .cast("long")
            .alias("mnat_glob"),
        )
    )
    dom = scored.groupBy("source").agg(
        F.sum("c_st").cast("long").alias("n_tokens"),
        F.sum(F.col("c_st") * F.col("mnat_glob")).alias("mn_glob"),
        F.sum(F.col("c_st") * F.col("mnat_dom")).alias("mn_dom"),
    )
    excess = (
        (F.col("mn_glob") - F.col("mn_dom")) * 1.0 / F.col("n_tokens") / 1000
    )
    # all_tokens / k / z are globals over the |sources|-row frame:
    # attach them with the same bounded single-partition window instead
    # of one broadcast-build branch per scalar (the old tot/k subtrees
    # re-ran the scoring join twice more; values are identical — the
    # integer sums are order-free and z feeds a 6-decimal round with
    # the +1e-9 nudge, same discipline as the agg form).
    raw = dom.withColumn("all_tokens", F.sum("n_tokens").over(gw)).select(
        "source",
        "n_tokens",
        F.round(excess + F.lit(1e-9), 6).alias("excess_nats"),
        F.round(
            (F.col("n_tokens") * 1.0 / F.col("all_tokens"))
            * F.exp(F.lit(_DRM_ETA) * excess)
            + F.lit(1e-9),
            6,
        ).alias("w_raw"),
    )
    return raw.select(
        "source",
        "n_tokens",
        "excess_nats",
        F.round(
            F.lit(1 - _DRM_SMOOTH)
            * F.col("w_raw")
            / F.sum("w_raw").over(gw)
            + F.lit(_DRM_SMOOTH) / F.count(F.lit(1)).over(gw)
            + F.lit(1e-9),
            6,
        ).alias("doremi_weight"),
    )


@register(
    "corpus_doremi_domain_weights",
    oracle=f"""
    WITH d AS (SELECT source, text FROM documents),
    {_doremi_sql('d')}
    SELECT source, n_tokens, excess_nats, doremi_weight FROM drm
    """,
    doc=f"DoReMi-style domain reweighting (Xie et al. 2023, one "
        f"exponentiated-gradient step): each source's EXCESS LOSS is "
        f"how much worse the domain-agnostic unigram LM scores its "
        f"tokens than its own in-domain unigram LM (the proxy/"
        f"reference pair, re-expressed with the same count-table LMs "
        f"the CCNet/backoff queries use); weights update as "
        f"size_share * exp(eta * excess), normalized, then mixed "
        f"with {_DRM_SMOOTH} uniform smoothing — exactly the "
        f"published update rule, so hard-for-generic-models domains "
        f"gain sampling mass. Cross-engine float discipline: "
        f"per-token negative log-probs land on an integer MILLINAT "
        f"grid (one ROUND per distinct (source, token) pair), so the "
        f"corpus-sized sums are exact integer arithmetic — no "
        f"summation-order risk survives into the exp. Scale shape: "
        f"ONE (source, token) count shuffle; the global-model join "
        f"is count-table-sized (AQE decides); everything after is "
        f"|sources|-row arithmetic with 1-row totals broadcast.",
)
def corpus_doremi_domain_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return _doremi_weights(d.select("source", "text"))


# ---------------------------------------------------------------------------
# bpe_train_iterative_merges — 3 rounds of greedy BPE merge training
# ---------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_rounds_cte() -> str:
    """Shared CTE prefix: word counts, char-split v0, and the unrolled
    training rounds pc{r}/b{r}/…/v{r}. Reused by the trainer oracle
    (final select = the merge table) and the round-9 corpus-encode
    oracle (final select = the tokenized corpus stream off v{R})."""
    rounds = []
    for r in range(1, _BPE_ROUNDS + 1):
        p = r - 1
        rounds.append(f"""
    pc{r} AS (
        SELECT v.toks[s.i + 1] AS l, v.toks[s.i + 2] AS r2,
               SUM(v.n) AS cnt
        FROM v{p} v, LATERAL (
            SELECT unnest(range(len(v.toks) - 1)) AS i
        ) s
        WHERE len(v.toks) >= 2
        GROUP BY 1, 2
    ),
    b{r} AS (SELECT l, r2, CAST(cnt AS BIGINT) AS cnt FROM pc{r}
             ORDER BY cnt DESC, l, r2 LIMIT 1),
    mpos{r} AS (
        SELECT v.word, s.i AS pos
        FROM v{p} v, LATERAL (
            SELECT unnest(range(len(v.toks) - 1)) AS i
        ) s, b{r} b
        WHERE len(v.toks) >= 2
          AND v.toks[s.i + 1] = b.l AND v.toks[s.i + 2] = b.r2
    ),
    isl{r} AS (
        SELECT word, pos,
               pos - ROW_NUMBER() OVER (
                   PARTITION BY word ORDER BY pos) AS grp
        FROM mpos{r}
    ),
    sel{r} AS (
        SELECT word, pos,
               (pos - MIN(pos) OVER (PARTITION BY word, grp)) % 2 = 0
                   AS keep
        FROM isl{r}
    ),
    pos{r} AS (
        SELECT v.word, v.n, s.i AS pos, v.toks[s.i + 1] AS sym
        FROM v{p} v, LATERAL (
            SELECT unnest(range(len(v.toks))) AS i
        ) s
    ),
    v{r} AS (
        SELECT word, ANY_VALUE(n) AS n,
               list(CASE WHEN m.keep THEN p.sym || (SELECT r2 FROM b{r})
                         ELSE p.sym END ORDER BY p.pos) AS toks
        FROM pos{r} p
        LEFT JOIN (SELECT word, pos, keep FROM sel{r} WHERE keep) m
            USING (word, pos)
        LEFT JOIN (SELECT word, pos + 1 AS pos, keep
                   FROM sel{r} WHERE keep) cons USING (word, pos)
        WHERE cons.keep IS NULL
        GROUP BY word
    )""")
    return f"""
    WITH wc AS (
        SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        ) WHERE tok != '' GROUP BY tok
    ),
    v0 AS (
        SELECT word, n,
               string_split(rtrim(regexp_replace(word, '(.)', '\\1 ',
                                                 'g')), ' ') AS toks
        FROM wc
    ),
    {",".join(rounds)}
    """


def _bpe_oracle() -> str:
    """Unrolled 3-round BPE trainer in DuckDB SQL.

    Greedy left-to-right merge application is expressed relationally
    (no sequential fold): match positions that overlap can only be
    runs of a self-pair (l = r), and greedy selects every other
    position within each maximal run — a gaps-and-islands parity
    test, identical on both engines.
    """
    finals = " UNION ALL ".join(
        f"SELECT {r} AS merge_round, l AS left_sym, r2 AS right_sym, "
        f"l || r2 AS merged_sym, cnt AS pair_count FROM b{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    return _bpe_rounds_cte() + finals


@register(
    "bpe_train_iterative_merges",
    oracle=_bpe_oracle(),
    doc=f"BPE tokenizer TRAINING to {_BPE_ROUNDS} merge rounds "
        f"(Sennrich et al. 2016): per round, count adjacent symbol "
        f"pairs over the frequency-weighted vocabulary, pick the most "
        f"frequent pair (count-desc, pair-asc tiebreak), and apply "
        f"the merge greedily left-to-right — extends bpe_pair_merges "
        f"(single-round candidate counts) to the real iterative "
        f"trainer whose round-r counts depend on round-(r-1) merges. "
        f"Greedy application is RELATIONAL, not a sequential fold: "
        f"overlapping matches only arise as runs of a self-pair "
        f"(l = r), and greedy keeps every other position in each run "
        f"— a gaps-and-islands parity test (the same machinery as "
        f"dedup_substring_suffix_runs), bit-identical across engines. "
        f"Scale shape: all rounds run on the WORD-FREQUENCY table "
        f"(vocab-bounded, ~O(corpus^0.5) by Heaps' law) — the corpus "
        f"itself is tokenized once into counts and never re-read; "
        f"per round there is one pair-count shuffle over the vocab "
        f"frame plus word-keyed windows, and the chosen pair is a "
        f"bounded 1-row collect (the kmeans_multi_iter pattern).",
)
def bpe_train_iterative_merges(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    merges, _v = _bpe_train_state(spark, sf_dir)
    if not merges:
        return spark.createDataFrame(
            [],
            "merge_round int, left_sym string, right_sym string, "
            "merged_sym string, pair_count bigint",
        )
    return spark.createDataFrame(
        merges,
        "merge_round int, left_sym string, right_sym string, "
        "merged_sym string, pair_count long",
    )


def _bpe_train_state(
    spark: SparkSession, sf_dir: str
) -> tuple[list[tuple], DataFrame]:
    """Run the _BPE_ROUNDS training rounds on the frequency-weighted
    word table; return ``(merges, v)`` — the chosen merge rows
    (possibly fewer if the vocabulary fuses early) and the FINAL
    word -> token-array vocabulary frame (word, n, toks). The round-9
    corpus encoder reuses ``v`` directly: BPE-encoding the training
    corpus with the trained merges is exactly the trainer's final
    state, so the corpus never re-runs the merge application."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    v = wc.select(
        "word",
        "n",
        F.split(
            F.rtrim(F.regexp_replace("word", "(.)", "$1 ")), " "
        ).alias("toks"),
    )
    merges: list[tuple] = []
    for _r in range(1, _BPE_ROUNDS + 1):
        pairs = (
            v.where(F.size("toks") >= 2)
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(toks) - 2), i -> "
                        "struct(element_at(toks, i + 1) AS l, "
                        "element_at(toks, i + 2) AS r2))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r2")
            .agg(F.sum("n").cast("long").alias("cnt"))
        )
        best_df = pairs.orderBy(F.col("cnt").desc(), "l", "r2").limit(1)
        best_rows = best_df.collect()  # bounded 1-row collect per round
        if not best_rows:
            # Vocabulary fully fused into single symbols — no pairs
            # left. Emit fewer merge rows, matching the oracle's
            # empty LIMIT 1 CTEs for the remaining rounds.
            break
        best = best_rows[0]
        l_lit, r_lit = best["l"], best["r2"]
        # The round's output row comes from the ALREADY-collected
        # literals — deriving it from the lazy best_df would re-run
        # the round's pair-count aggregation and orderBy/limit a
        # second time when the final result materializes.
        merges.append((_r, l_lit, r_lit, l_lit + r_lit, int(best["cnt"])))

        # Apply the merge: match positions, greedy run-parity select,
        # rebuild token arrays in position order (word-keyed windows
        # over the vocab frame only).
        pos = v.select(
            "word", "n", F.posexplode("toks").alias("pos", "sym")
        )
        mpos = (
            v.where(F.size("toks") >= 2)
            .select(
                "word",
                F.explode(
                    F.expr("sequence(0, size(toks) - 2)")
                ).alias("pos"),
                "toks",
            )
            .where(
                (F.expr("element_at(toks, pos + 1)") == F.lit(l_lit))
                & (F.expr("element_at(toks, pos + 2)") == F.lit(r_lit))
            )
            .select("word", "pos")
        )
        wrn = Window.partitionBy("word").orderBy("pos")
        grp = F.col("pos") - F.row_number().over(wrn)
        wgrp = Window.partitionBy("word", "grp")
        sel = (
            mpos.withColumn("grp", grp)
            .withColumn(
                "keep",
                ((F.col("pos") - F.min("pos").over(wgrp)) % 2) == 0,
            )
            .where("keep")
            .select("word", "pos", "keep")
        )
        cons = sel.select(
            "word", (F.col("pos") + 1).alias("pos"), F.col("keep").alias("c")
        )
        merged = (
            pos.join(sel, ["word", "pos"], "left")
            .join(cons, ["word", "pos"], "left")
            .where(F.col("c").isNull())
            .withColumn(
                "sym2",
                F.when(
                    F.col("keep"), F.concat(F.col("sym"), F.lit(r_lit))
                ).otherwise(F.col("sym")),
            )
        )
        v = merged.groupBy("word").agg(
            F.first("n").alias("n"),
            F.expr(
                "transform(array_sort(collect_list(struct(pos, sym2))), "
                "x -> x.sym2)"
            ).alias("toks"),
        ).transform(persist_once)  # vocab-sized; cuts round r's actions from
        # replaying rounds 1..r-1's whole merge lineage. NOT unpersisted
        # here: repeated calls build identical logical plans, so the
        # CacheManager dedups them (total live caches are bounded at
        # _BPE_ROUNDS per session, not per call) and warm re-runs skip
        # rounds 1..r-1's recompute entirely; the harnesses' between-
        # query clearCache releases them (registry.py cache contract).
        # An in-query unpersist measured 1.9x slower under the bench's
        # documented warm-cache protocol for zero bounded-memory gain.
    return merges, v


# ---------------------------------------------------------------------------
# events_anomaly_mad_robust
# ---------------------------------------------------------------------------

_MAD_SCALE = 0.6745  # Iglewicz & Hoaglin modified z-score constant
_MAD_CUT = 3.5       # their recommended outlier cut


@register(
    "events_anomaly_mad_robust",
    oracle=f"""
    WITH med AS (
        SELECT event_type,
               quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    mad AS (
        SELECT e.event_type, ANY_VALUE(m.med) AS med,
               quantile_cont(ABS(e.value - m.med), 0.5) AS mad
        FROM events e JOIN med m USING (event_type)
        GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND({_MAD_SCALE} * (e.value - m.med) / m.mad + 1e-9, 6)
               AS modified_z
    FROM events e JOIN mad m USING (event_type)
    WHERE m.mad > 0
      AND ABS(ROUND({_MAD_SCALE} * (e.value - m.med) / m.mad
              + 1e-9, 6)) > {_MAD_CUT}
    """,
    doc=f"MAD-robust outlier screen (Iglewicz & Hoaglin 1993 modified "
        f"z-score: {_MAD_SCALE}*(x - median)/MAD, cut at "
        f"{_MAD_CUT}) — the heavy-tail-safe twin of "
        f"events_anomaly_zscore: mean/stddev are themselves dragged "
        f"by the outliers they are supposed to flag (masking), while "
        f"median/MAD have a 50% breakdown point — the screen to trust "
        f"on power-law metric columns. Scale shape: two exact grouped "
        f"percentile passes (the agg_exact_median truth path — at "
        f"100 TB swap in the t-digest sketch for the same plan "
        f"shape), then the |event_types|-row moments broadcast back "
        f"onto a single corpus scan; zero corpus shuffles beyond the "
        f"grouped percentiles.",
)
def events_anomaly_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        # bounded: |event_type| medians (small enumerated domain)
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.expr("percentile(abs(value - med), 0.5)").alias("mad"),
        )
    )
    mz = F.round(
        F.lit(_MAD_SCALE)
        * (F.col("value") - F.col("med"))
        / F.col("mad")
        + F.lit(1e-9),
        6,
    )
    return (
        # bounded: |event_type| MAD rows (small enumerated domain)
        ev.join(F.broadcast(mad), "event_type")
        .where(F.col("mad") > 0)
        .withColumn("modified_z", mz)
        .where(F.abs(F.col("modified_z")) > _MAD_CUT)
        .select("event_id", "event_type", "value", "modified_z")
    )


# ---------------------------------------------------------------------------
# graph_triangle_count_dupgraph
# ---------------------------------------------------------------------------


def _triangle_oracle() -> str:
    from change_data_capture_poc_spark.queries.datapipe import (
        _MINHASH_PAIRS_SQL,
    )

    return f"""
    WITH {_MINHASH_PAIRS_SQL},
    e AS (SELECT pa AS a, pb AS b FROM pairs),
    w AS (SELECT e1.a, e1.b, e2.b AS c
          FROM e e1 JOIN e e2 ON e1.b = e2.a),
    t AS (SELECT w.a, w.b, w.c
          FROM w JOIN e e3 ON w.a = e3.a AND w.c = e3.b)
    SELECT CAST((SELECT COUNT(DISTINCT v) FROM (
               SELECT a AS v FROM e UNION ALL SELECT b FROM e
           )) AS BIGINT) AS n_vertices,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM w) AS BIGINT) AS n_wedges,
           CAST((SELECT COUNT(*) FROM t) AS BIGINT) AS n_triangles
    """


@register(
    "graph_triangle_count_dupgraph",
    oracle=_triangle_oracle(),
    doc="Triangle count over the MinHash-LSH candidate-pair graph "
        "(vertices = documents, edges = band-bucket collisions, the "
        "same edge set dedup_cluster_label_propagation consumes): "
        "id-oriented wedge enumeration — every edge points low->high, "
        "a wedge is two edges sharing their middle vertex, and a "
        "wedge closes iff its (low, high) endpoints are an edge "
        "(Cohen 2009's MapReduce formulation; the production "
        "refinement orders by DEGREE instead of id, bounding wedges "
        "at O(E^1.5) even on skewed graphs — noted, not needed at "
        "this edge count). Triangle density distinguishes template "
        "FARMS (near-cliques of mutual near-dups) from chain-shaped "
        "false-positive collisions, the readout that decides whether "
        "cluster-collapse dedup (keep one per component) is safe. "
        "Scale shape: edges come from the banded candidate join "
        "(never all-pairs); the wedge join and the closing check are "
        "two hash equi-joins on vertex keys; output is one row.",
)
def graph_triangle_count_dupgraph(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from change_data_capture_poc_spark.queries.datapipe import (
        dedup_minhash_lsh,
    )

    # The edge set IS the registered candidate-pair query — reusing it
    # (the dedup_cluster_best_representative pattern) means a banding
    # change can never make the census measure a different graph than
    # the dedup path it audits.
    e = (
        dedup_minhash_lsh(spark, sf_dir)
        .select(
            F.col("doc_id_a").alias("a"), F.col("doc_id_b").alias("b")
        )
        .transform(persist_once)
    )
    w = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.b") == F.col("e2.a"))
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )
    t = w.alias("w").join(
        e.alias("e3"),
        (F.col("w.a") == F.col("e3.a")) & (F.col("w.c") == F.col("e3.b")),
    )
    # Vertex, edge AND wedge counts from ONE degree aggregation over
    # the pinned edge set: n_vertices = |deg rows|, n_edges =
    # sum(indeg), n_wedges = sum(indeg * outdeg) — identical to the
    # old counts because the e1.b == e2.a join produces exactly
    # indeg(v) * outdeg(v) rows per vertex. The old plan ran the
    # pair-by-pair wedge join TWICE (count branch + close branch) and
    # a separate distinct-vertex branch; at scale those were the two
    # most expensive subtrees, and locally three branches collapse
    # into one (r13).
    deg = (
        e.select(
            F.col("b").alias("v"),
            F.lit(1).alias("ind"),
            F.lit(0).alias("outd"),
        )
        .unionAll(
            e.select(
                F.col("a").alias("v"),
                F.lit(0).alias("ind"),
                F.lit(1).alias("outd"),
            )
        )
        .groupBy("v")
        .agg(F.sum("ind").alias("i"), F.sum("outd").alias("o"))
    )
    g = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices"),
        F.coalesce(F.sum("i"), F.lit(0)).cast("long").alias("n_edges"),
        F.coalesce(F.sum(F.col("i") * F.col("o")), F.lit(0))
        .cast("long")
        .alias("n_wedges"),
    )
    return g.crossJoin(
        t.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    ).select("n_vertices", "n_edges", "n_wedges", "n_triangles")


# ---------------------------------------------------------------------------
# corpus_weighted_priority_sample — Efraimidis-Spirakis A-Res sampling
# ---------------------------------------------------------------------------

_WPS_K = 20          # sample size per source stratum
_WPS_U_DEN = 4294967297.0  # 2^32 + 1: md5-prefix -> u in (0, 1)


def _wps_pri_sql(docs_cte: str) -> str:
    """DuckDB CTE chain computing A-Res priorities from a relation
    ``docs_cte(source, doc_id, n_chars)`` — ends in ``wps_p(source,
    doc_id, n_chars, priority)``. Shared by the standalone sampler,
    the composed weighted build, and the streaming reservoir so the
    three oracles cannot drift."""
    return f"""
    wps_h AS (
        SELECT source, doc_id, n_chars,
               (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   ::BIGINT + 1) / {_WPS_U_DEN} AS u
        FROM {docs_cte} WHERE n_chars > 0
    ),
    wps_p AS (
        SELECT source, doc_id, n_chars,
               ROUND(ln(u) / n_chars + 1e-9, 6) AS priority
        FROM wps_h
    )"""


def _wps_priority():
    """Spark twin of ``_wps_pri_sql``'s priority column: u^(1/w) as
    ln(u)/n_chars from the deterministic md5-prefix uniform. Callers
    filter n_chars > 0 first (mirroring the SQL fragment)."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(_WPS_U_DEN)
    return F.round(F.log(u) / F.col("n_chars") + F.lit(1e-9), 6)


@register(
    "corpus_weighted_priority_sample",
    oracle=f"""
    WITH d AS (SELECT source, doc_id, n_chars FROM documents),
    {_wps_pri_sql('d')}
    SELECT source, doc_id, n_chars, priority
    FROM wps_p
    QUALIFY ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY priority DESC, doc_id)
            <= {_WPS_K}
    """,
    doc=f"WEIGHTED sampling without replacement (Efraimidis & "
        f"Spirakis 2006 A-Res): each doc draws priority u^(1/w) — "
        f"computed as ln(u)/w for numeric stability — with u a "
        f"deterministic md5-prefix uniform and w = n_chars (the "
        f"quality/size weight), and the top-{_WPS_K} priorities per "
        f"source ARE a weight-proportional sample. The weighted "
        f"companion to corpus_bottomk_consistent_sample (uniform "
        f"bottom-k): same determinism (no rand(), reproducible across "
        f"runs AND engines), same growth-consistency (a doc's "
        f"priority never changes as the corpus grows, so samples "
        f"evolve by displacement only — the streaming-friendly "
        f"property the published reservoir algorithm is built on). "
        f"Scale shape: priorities are MAP-SIDE; the only exchange is "
        f"grouped_topk's k-bounded merge per source — never a corpus "
        f"sort.",
)
def corpus_weighted_priority_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from change_data_capture_poc_spark.operators.topk import grouped_topk

    d = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    p = d.select(
        "source", "doc_id", "n_chars", _wps_priority().alias("priority")
    )
    return grouped_topk(
        p, ["source"], [("priority", False), ("doc_id", True)], _WPS_K
    )


# ---------------------------------------------------------------------------
# dedup_bloom_portable — Bloom-filter span dedup with measured FPR
# ---------------------------------------------------------------------------

_BLM_K = 8        # span length in tokens (the ExactSubstr window)
_BLM_M = 65536    # filter bits (the join_bloom_prefiltered magnitude)
_BLM_H = 3        # hash functions (row-salted md5, CMS-style)


def _blm_bit_sql(h: int, gh_expr: str, engine: str) -> str:
    if engine == "spark":
        return (
            f"CAST(conv(substring(md5(CAST(concat('{h}:', {gh_expr}) "
            f"AS BINARY)), 1, 8), 16, 10) AS BIGINT) % {_BLM_M}"
        )
    return (
        f"('0x' || substring(md5('{h}:' || {gh_expr}), 1, 8))"
        f"::BIGINT % {_BLM_M}"
    )


def _blm_split_hash():
    """doc_id -> 0..99 split hash (the text_stupid_backoff split)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 100
    )


def _blm_gram_explode():
    """Overlapping span fingerprints (md5) from a `w` token array."""
    return F.explode(
        F.expr(
            f"transform(sequence(0, size(w) - {_BLM_K}),"
            f"  p -> md5(array_join(slice(w, p + 1, {_BLM_K}), ' ')))"
        )
    )


def _blm_bit_exprs():
    return [F.expr(_blm_bit_sql(h, "gh", "spark")) for h in range(_BLM_H)]


def _blm_split_grams(d: DataFrame) -> DataFrame:
    """Distinct (is_train, gh) span fingerprints from a documents
    frame, persisted — the bit-build, probe, and exact-truth branches
    all consume it (MEMORY_AND_DISK: spills, never OOMs)."""
    s = d.select(
        "doc_id", F.split("text", " ").alias("w"),
        _blm_split_hash().alias("h"),
    ).where(F.size("w") >= _BLM_K)
    return (
        s.select(
            (F.col("h") < 80).alias("is_train"),
            _blm_gram_explode().alias("gh"),
        )
        .distinct()
        .transform(persist_once)
    )


def _blm_readout(te: DataFrame, tr: DataFrame, bits: DataFrame) -> DataFrame:
    """Probe the test-split span set against a Bloom bit set and grade
    the flags against exact membership — SHARED by the batch query and
    the streaming drain so the flag semantics cannot drift (the
    distinct-bit fix had to land in two copies once; never again).

    Distinct-bit semantics: when two hash functions collide onto one
    bit, the gram probes fewer than _BLM_H DISTINCT bits and is
    flagged iff every one of THOSE is set (counting matched probe rows
    instead would diverge from the set-membership oracle).
    """
    te_b = te.select(
        "gh", F.array_distinct(F.array(*_blm_bit_exprs())).alias("gbits")
    ).withColumn("n_bits", F.size("gbits"))
    probe_bits = te_b.select("gh", "n_bits", F.explode("gbits").alias("bit"))
    hits = (
        # bounded: Bloom bitset capped at _BLM_M rows
        probe_bits.join(F.broadcast(bits), "bit")
        .groupBy("gh", "n_bits")
        .agg(F.count(F.lit(1)).alias("n_set"))
    )
    flagged = te_b.join(hits.select("gh", "n_set"), "gh", "left").select(
        "gh",
        (F.coalesce(F.col("n_set"), F.lit(0)) == F.col("n_bits")).alias(
            "flagged"
        ),
    )
    truth = flagged.join(
        tr.select(F.col("gh"), F.lit(True).alias("is_dup")), "gh", "left"
    ).select(
        "gh",
        "flagged",
        F.coalesce(F.col("is_dup"), F.lit(False)).alias("is_dup"),
    )
    bcount = bits.agg(
        F.count(F.lit(1)).cast("long").alias("bits_set")
    ).select(
        "bits_set",
        F.round(
            F.col("bits_set") * 1.0 / _BLM_M + F.lit(1e-9), 6
        ).alias("fill_ratio"),
    )
    stats = truth.agg(
        F.count(F.lit(1)).cast("long").alias("n_test_spans"),
        F.sum(F.when(F.col("flagged"), 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
        .cast("long")
        .alias("n_true_dup"),
        F.sum(F.when(F.col("flagged") & ~F.col("is_dup"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
    ).withColumn(
        "fp_rate",
        F.round(
            F.col("n_false_pos")
            * 1.0
            / F.greatest(
                F.col("n_test_spans") - F.col("n_true_dup"), F.lit(1)
            )
            + F.lit(1e-9),
            6,
        ),
    )
    # bounded: 1-row bit count x 1-row stats
    return F.broadcast(bcount).crossJoin(stats).select(
        "bits_set",
        "fill_ratio",
        "n_test_spans",
        "n_flagged",
        "n_true_dup",
        "n_false_pos",
        "fp_rate",
    )


def _blm_oracle() -> str:
    tr_bits = ", ".join(
        _blm_bit_sql(h, "gh", "duck") for h in range(_BLM_H)
    )
    return f"""
    WITH s AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   ::BIGINT % 100 AS h
        FROM documents
    ),
    g AS (
        SELECT DISTINCT s.h < 80 AS is_train,
               md5(array_to_string(w[u.i + 1 : u.i + {_BLM_K}], ' '))
                   AS gh
        FROM s, LATERAL (
            SELECT unnest(range(len(w) - {_BLM_K} + 1)) AS i
        ) u
        WHERE len(w) >= {_BLM_K}
    ),
    tr AS (SELECT DISTINCT gh FROM g WHERE is_train),
    te AS (SELECT DISTINCT gh FROM g WHERE NOT is_train),
    bits AS (
        SELECT DISTINCT unnest([{tr_bits}]) AS bit FROM tr
    ),
    probe AS (
        -- distinct-bit semantics: a gram whose hash functions collide
        -- onto the same bit probes fewer than {_BLM_H} DISTINCT bits,
        -- and is flagged iff every one of those is set
        SELECT te.gh,
               (SELECT COUNT(*) FROM bits
                WHERE bit IN ({tr_bits}))
                   = len(list_distinct([{tr_bits}])) AS flagged,
               te.gh IN (SELECT gh FROM tr) AS is_dup
        FROM te
    )
    SELECT CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS bits_set,
           ROUND((SELECT COUNT(*) FROM bits) * 1.0 / {_BLM_M}
                 + 1e-9, 6) AS fill_ratio,
           CAST(COUNT(*) AS BIGINT) AS n_test_spans,
           CAST(COUNT(*) FILTER (WHERE flagged) AS BIGINT) AS n_flagged,
           CAST(COUNT(*) FILTER (WHERE is_dup) AS BIGINT) AS n_true_dup,
           CAST(COUNT(*) FILTER (WHERE flagged AND NOT is_dup) AS BIGINT)
               AS n_false_pos,
           ROUND(COUNT(*) FILTER (WHERE flagged AND NOT is_dup) * 1.0
                 / GREATEST(COUNT(*) FILTER (WHERE NOT is_dup), 1)
                 + 1e-9, 6) AS fp_rate
    FROM probe
    """


@register(
    "dedup_bloom_portable",
    oracle=_blm_oracle(),
    doc=f"PORTABLE Bloom-filter span dedup with MEASURED false-"
        f"positive rate (the Dolma-style dedup front line): the "
        f"train-split's distinct {_BLM_K}-token span fingerprints set "
        f"{_BLM_H} row-salted md5 bits each in a {_BLM_M}-bit filter; "
        f"test-split spans are flagged iff all {_BLM_H} bits are set, "
        f"and the flags are compared against EXACT membership (the "
        f"semi-join truth) to report the realized FPR next to the "
        f"fill ratio — the calibration that decides whether a Bloom "
        f"pre-filter can replace the exact dedup shuffle at 100 TB. "
        f"Third portable sketch alongside agg_hll_portable (distinct "
        f"count) and agg_cms_portable (frequency): membership. Scale "
        f"shape: the bit set is bounded at {_BLM_M} rows FOREVER "
        f"(bits merge by OR/distinct — the same associativity as the "
        f"other sketches, pinned by the stream twin); probing "
        f"broadcasts the bit table; only the exact-truth check "
        f"shuffles span keys, and it exists precisely to grade the "
        f"sketch that would replace it.",
)
def dedup_bloom_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _blm_split_grams(load_table(spark, sf_dir, "documents"))
    tr = g.where("is_train").select("gh").distinct()
    te = g.where(~F.col("is_train")).select("gh").distinct()
    # persist_once (r14): the bit set is consumed twice (broadcast
    # probe side + the bits_set count) and each build re-runs the
    # train split's _BLM_H-md5 bit explode over the whole gram table;
    # the pinned frame is bounded at _BLM_M rows forever (guide §5).
    bits = (
        tr.select(F.explode(F.array(*_blm_bit_exprs())).alias("bit"))
        .distinct()
        .transform(persist_once)
    )
    return _blm_readout(te, tr, bits)


# ---------------------------------------------------------------------------
# ann_ivf_pq_recall — the composed FAISS-style IVF-PQ index
# ---------------------------------------------------------------------------

_IVFPQ_PROBES = 2  # coarse partitions probed per query


def _ivfpq_qprobe(qe: DataFrame, cents) -> DataFrame:
    """Probe set: top-_IVFPQ_PROBES nearest coarse centroids per query
    — ranked over an NQ x C frame (bounded by construction). Shared by
    the composed recall query and the round-9 serve-from-index path
    (where ``qe`` comes from the persisted request batch)."""
    from pyspark.sql import Window

    cand_structs = ", ".join(
        f"struct(round(aggregate(zip_with(v, array("
        + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in cv)
        + "), (x, y) -> (x - y) * (x - y)), 0D, (a, b) -> a + b)"
        + f" + 1e-9, 6) AS dist, CAST({ccid} AS BIGINT) AS ccid)"
        for ccid, cv in cents
    )
    wq = Window.partitionBy("q_id").orderBy("dist", "ccid")
    return (
        qe.select(
            F.col("vec_id").alias("q_id"),
            F.explode(F.expr(f"array({cand_structs})")).alias("dc"),
        )
        .select("q_id", F.col("dc.dist").alias("dist"),
                F.col("dc.ccid").alias("ccid"))
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= _IVFPQ_PROBES)
        .select("q_id", "ccid")
    )


def _ivfpq_cte() -> str:
    """Shared WITH-prefix through the ADC scores — reused by the
    composed recall oracle (tail: pred/truth/hits) and the round-9
    index build/serve oracles (tails: the persisted code table / the
    ranked serving answer)."""
    m_tbl = f"(SELECT unnest(range({_PQ_M})) AS m) mm"
    sub = f"e.v[mm.m * {_PQ_SUB} + 1 : mm.m * {_PQ_SUB} + {_PQ_SUB}]"
    cl2 = _pq_l2_duck("x.v", "c.cv")
    return f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    sub AS (SELECT e.vec_id, mm.m, {sub} AS s FROM e, {m_tbl}),
    cb AS (SELECT vec_id AS cid, m, s AS cs FROM sub
           WHERE vec_id < {_PQ_C}),
    enc AS (
        SELECT vec_id, m, cid AS code FROM (
            SELECT s.vec_id, s.m, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY s.vec_id, s.m
                       ORDER BY {_pq_l2_duck('s.s', 'c.cs')}, c.cid
                   ) AS rn
            FROM sub s JOIN cb c USING (m)
        ) WHERE rn = 1
    ),
    lut AS (
        SELECT s.vec_id AS q_id, s.m, c.cid,
               {_pq_l2_duck('s.s', 'c.cs')} AS pdist
        FROM sub s JOIN cb c USING (m)
        WHERE s.vec_id >= {_PQ_C} AND s.vec_id < {_PQ_C + _PQ_NQ}
    ),
    cent AS (SELECT vec_id AS ccid, v AS cv FROM e
             WHERE vec_id < {_PQ_C}),
    asgn AS (
        SELECT vec_id, ccid FROM (
            SELECT x.vec_id, c.ccid,
                   ROW_NUMBER() OVER (PARTITION BY x.vec_id
                                      ORDER BY {cl2}, c.ccid) AS rn
            FROM e x, cent c
        ) WHERE rn = 1
    ),
    qprobe AS (
        SELECT q_id, ccid FROM (
            SELECT x.vec_id AS q_id, c.ccid,
                   ROW_NUMBER() OVER (PARTITION BY x.vec_id
                                      ORDER BY {cl2}, c.ccid) AS rn
            FROM e x, cent c
            WHERE x.vec_id >= {_PQ_C} AND x.vec_id < {_PQ_C + _PQ_NQ}
        ) WHERE rn <= {_IVFPQ_PROBES}
    ),
    cand AS (
        SELECT p.q_id, a.vec_id AS neighbor_id
        FROM qprobe p JOIN asgn a ON a.ccid = p.ccid
        WHERE a.vec_id != p.q_id
    ),
    adc AS (
        SELECT c.q_id, c.neighbor_id,
               ROUND(SUM(l.pdist) + 1e-9, 6) AS adc_dist
        FROM cand c
        JOIN enc en ON en.vec_id = c.neighbor_id
        JOIN lut l ON l.q_id = c.q_id AND en.m = l.m AND en.code = l.cid
        GROUP BY c.q_id, c.neighbor_id
    )"""


def _ivfpq_oracle() -> str:
    return _ivfpq_cte() + f""",
    nc AS (SELECT q_id, CAST(COUNT(*) AS BIGINT) AS n_candidates
           FROM cand GROUP BY q_id),
    pred AS (
        SELECT q_id, neighbor_id FROM adc
        QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id
                                   ORDER BY adc_dist, neighbor_id)
                <= {_PQ_K}
    ),
    truth AS (
        SELECT q_id, neighbor_id FROM (
            SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_pq_l2_duck('e.v', 'q.v')}, e.vec_id
                   ) AS rn
            FROM e, e q
            WHERE q.vec_id >= {_PQ_C} AND q.vec_id < {_PQ_C + _PQ_NQ}
              AND e.vec_id != q.vec_id
        ) WHERE rn <= {_PQ_K}
    ),
    hits AS (
        SELECT t.q_id, CAST(COUNT(p.neighbor_id) AS BIGINT) AS n_hits
        FROM truth t LEFT JOIN pred p
            ON t.q_id = p.q_id AND t.neighbor_id = p.neighbor_id
        GROUP BY t.q_id
    )
    SELECT h.q_id, nc.n_candidates, h.n_hits,
           ROUND(h.n_hits / {_PQ_K}.0 + 1e-9, 6) AS recall
    FROM hits h JOIN nc USING (q_id)
    """


@register(
    "ann_ivf_pq_recall",
    oracle=_ivfpq_oracle(),
    doc=f"The COMPOSED FAISS-style IVF-PQ index (Jegou et al. 2011): "
        f"a coarse quantizer ({_PQ_C} centroids, map-side argmin — "
        f"the kmeans_multi_iter machinery) partitions the corpus; a "
        f"query probes its {_IVFPQ_PROBES} nearest partitions "
        f"(recall/latency knob, same as ann_ivf_multiprobe_recall) "
        f"and scores ONLY those candidates by PQ asymmetric distance "
        f"(the ann_pq_adc_recall machinery, non-residual codebooks "
        f"noted — FAISS's default encodes residuals for extra "
        f"precision); recall@{_PQ_K} and candidate counts vs exact "
        f"truth quantify the full compounding: IVF cuts candidates "
        f"~{_PQ_C}/{_IVFPQ_PROBES}x, PQ cuts bytes-per-candidate "
        f"128x, so the serving scan touches ~1/{_PQ_C * 64}th the "
        f"data of brute force. Scale shape: assignment and encoding "
        f"are both map-side literal argmins (zero shuffles); the "
        f"probe join broadcasts {_PQ_NQ * _IVFPQ_PROBES} (q_id, "
        f"partition) rows; ADC reads the literal LUT; all cuts via "
        f"grouped_topk.",
)
def ann_ivf_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from change_data_capture_poc_spark.functions.vectors import (
        centroid_argmin_expr,
    )
    from change_data_capture_poc_spark.operators.topk import (
        variant_topk_hits,
    )

    e = _pq_embeddings(spark, sf_dir)
    cb = _pq_codebook(e)
    # The coarse centroids ARE the codeword source vectors (vec_id <
    # _PQ_C) — reuse the collected codebook instead of a second
    # driver collect job over the same rows.
    cents = cb

    qe = _pq_queries(e)
    qprobe = _ivfpq_qprobe(qe, cents)
    q_meta, adc = _pq_adc_parts(qe, cb)
    # Fused dual ranking (r14): the ADC prediction candidates (coarse
    # partition in the query's probe list) are a subset of the exact
    # truth's all-pairs candidates — one corpus scan computes the
    # coarse assignment + PQ codes map-side AND carries the raw vector,
    # joins the combined (q_id, q_idx, qv) broadcast once, flags probe
    # membership off the broadcast probe list, and emits one variant
    # row for truth (always) plus one for the prediction (when probed).
    # The old shape ran three corpus passes: raw-vector truth scan,
    # coded prediction scan, and a candidate-count scan (guide
    # §1.2/§4).
    qv = qe.select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    # bounded: per-query PQ metadata + query vector (query-set-capped)
    qside = q_meta.join(qv, "q_id")
    exact_dist = F.round(
        F.aggregate(
            F.zip_with(
                F.col("v"), F.col("qv"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )
        + F.lit(1e-9),
        6,
    )
    coded = e.select(
        "vec_id",
        "v",
        centroid_argmin_expr(cents, "v").getField("cid").alias("ccid"),
        *_pq_code_cols(cb),
    )
    scored = (
        # bounded: per-query PQ metadata + query vector (query-set-capped)
        coded.crossJoin(F.broadcast(qside))
        .where(F.col("vec_id") != F.col("q_id"))
        .join(
            # bounded: query x probe-list rows (query-set-capped)
            F.broadcast(qprobe.withColumn("in_pred", F.lit(1))),
            ["q_id", "ccid"],
            "left",
        )
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            F.explode(
                F.when(
                    F.col("in_pred") == 1,
                    F.array(
                        F.struct(
                            F.lit(0).alias("variant"),
                            exact_dist.alias("dist"),
                        ),
                        F.struct(
                            F.lit(1).alias("variant"), adc.alias("dist")
                        ),
                    ),
                ).otherwise(
                    F.array(
                        F.struct(
                            F.lit(0).alias("variant"),
                            exact_dist.alias("dist"),
                        )
                    )
                )
            ).alias("vc"),
        )
        .select(
            "q_id",
            "neighbor_id",
            F.col("vc.dist").alias("dist"),
            F.col("vc.variant").alias("variant"),
        )
    )
    res = variant_topk_hits(
        scored, _PQ_K, [("dist", True), ("neighbor_id", True)]
    )

    # Candidate counts without replaying the candidate join: the count
    # is a sum of probed-partition sizes minus the query's own row when
    # its own partition is probed — one cheap assignment-only pass
    # (groupBy ccid, C rows out) replaces the old third corpus pass
    # through the crossJoin (guide §1.2).
    sizes = (
        e.select(
            centroid_argmin_expr(cents, "v").getField("cid").alias("ccid")
        )
        .groupBy("ccid")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    own = qe.select(
        F.col("vec_id").alias("q_id"),
        centroid_argmin_expr(cents, "v").getField("cid").alias("ccid"),
        F.lit(1).alias("self_in"),
    )
    nc = (
        # bounded: query x probe-list rows joined to C partition sizes
        qprobe.join(sizes, "ccid")
        .join(own, ["q_id", "ccid"], "left")
        .groupBy("q_id")
        .agg(
            (F.sum("sz") - F.max(F.coalesce("self_in", F.lit(0))))
            .cast("long")
            .alias("n_candidates")
        )
    )
    # bounded: per-query candidate counts (query-set-capped)
    return res.join(F.broadcast(nc), "q_id").select(
        "q_id",
        "n_candidates",
        F.col("hits").alias("n_hits"),
        F.round(F.col("hits") / float(_PQ_K) + F.lit(1e-9), 6).alias(
            "recall"
        ),
    )


# ---------------------------------------------------------------------------
# corpus_weighted_build_e2e — gate -> dedup -> DoReMi -> allocate -> sample
# ---------------------------------------------------------------------------

_WB_MIN_CHARS = 50   # admission gate (documented simple bound; the
                     # full Gopher rule set is the registered
                     # text_quality_filter / filter-funnel surface)
_WB_BUDGET = 200     # total docs to sample across all sources


def _wb_oracle() -> str:
    return f"""
    WITH gated AS (
        SELECT source, doc_id, text, n_chars FROM documents
        WHERE n_chars >= {_WB_MIN_CHARS}
    ),
    surv AS (
        SELECT source, doc_id, text, n_chars FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
                                         ORDER BY doc_id) AS rn
            FROM gated
        ) WHERE rn = 1
    ),
    d AS (SELECT source, text FROM surv),
    {_doremi_sql('d')},
    alloc AS (
        SELECT source,
               fl + CASE WHEN rk <= {_WB_BUDGET} - SUM(fl) OVER ()
                    THEN 1 ELSE 0 END AS k_s
        FROM (
            SELECT source,
                   CAST(FLOOR({_WB_BUDGET} * doremi_weight + 1e-9)
                        AS BIGINT) AS fl,
                   ROW_NUMBER() OVER (ORDER BY
                       ROUND({_WB_BUDGET} * doremi_weight + 1e-9
                             - FLOOR({_WB_BUDGET} * doremi_weight
                                     + 1e-9), 6) DESC, source) AS rk
            FROM drm
        )
    ),
    {_wps_pri_sql('surv')},
    ranked AS (
        SELECT source, doc_id, n_chars, priority,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY priority DESC, doc_id)
                   AS sample_rank
        FROM wps_p
    )
    SELECT r.source, r.doc_id, r.n_chars, r.priority,
           CAST(r.sample_rank AS BIGINT) AS sample_rank
    FROM ranked r JOIN alloc a USING (source)
    WHERE r.sample_rank <= a.k_s
    """


@register(
    "corpus_weighted_build_e2e",
    oracle=_wb_oracle(),
    doc=f"COMPOSED weighted corpus-build pipeline — the round-7 "
        f"flagship, chaining this round's pieces end to end the way "
        f"a real curation run does: admission gate (n_chars >= "
        f"{_WB_MIN_CHARS}) -> exact dedup (keep-lowest doc_id per "
        f"md5 fingerprint) -> DoReMi one-EG-step domain weights "
        f"COMPUTED ON THE SURVIVORS (shared _doremi_sql/"
        f"_doremi_weights builders, so this and the standalone query "
        f"cannot drift) -> integer largest-remainder allocation of a "
        f"{_WB_BUDGET}-doc budget across sources -> per-source A-Res "
        f"weighted sample of exactly that allocation. The principled "
        f"alternative to corpus_build_e2e's unweighted pipeline: "
        f"sampling mass follows measured domain difficulty, not raw "
        f"size. Scale shape: one fingerprint shuffle (dedup), one "
        f"(source, token) count shuffle (DoReMi), allocation on the "
        f"|sources|-row weight table, priorities map-side with the "
        f"final cut via grouped_topk at the budget bound then a "
        f"window over the <= {_WB_BUDGET}-per-source survivor frame "
        f"(bounded by construction).",
)
def corpus_weighted_build_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from change_data_capture_poc_spark.operators.topk import grouped_topk

    d = load_table(spark, sf_dir, "documents")
    gated = d.where(F.col("n_chars") >= _WB_MIN_CHARS).select(
        "source", "doc_id", "text", "n_chars"
    )
    wdup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    surv = (
        gated.withColumn("rn", F.row_number().over(wdup))
        .where(F.col("rn") == 1)
        .drop("rn")
        .transform(persist_once)  # survivors feed both the DoReMi pass and the
        # sampling pass; without the cache each replays gate+dedup
    )
    drm = _doremi_weights(surv.select("source", "text"))

    # Integer largest-remainder allocation of the budget.
    quota = F.lit(_WB_BUDGET) * F.col("doremi_weight") + F.lit(1e-9)
    from change_data_capture_poc_spark.functions.windows import (
        global_window,
    )

    fl = drm.select(
        "source",
        F.floor(quota).cast("long").alias("fl"),
        F.round(quota - F.floor(quota), 6).alias("rem"),
    )
    alloc = (
        fl.withColumn(
            "rk",
            F.row_number().over(
                global_window(F.col("rem").desc(), "source")
            ),
        )
        .withColumn(
            "short",
            F.lit(_WB_BUDGET)
            - F.sum("fl").over(
                Window.partitionBy(F.lit(0)).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .select(
            "source",
            (
                F.col("fl")
                + F.when(F.col("rk") <= F.col("short"), 1).otherwise(0)
            ).alias("k_s"),
        )
    )

    pri = surv.where(F.col("n_chars") > 0).select(
        "source", "doc_id", "n_chars", _wps_priority().alias("priority")
    )
    # Budget-bounded cut first (map-side partial top-k), then rank the
    # <= BUDGET-per-source survivor frame — a window over a bounded
    # frame, never the corpus.
    pool = grouped_topk(
        pri, ["source"], [("priority", False), ("doc_id", True)], _WB_BUDGET
    )
    wr = Window.partitionBy("source").orderBy(
        F.col("priority").desc(), "doc_id"
    )
    ranked = pool.withColumn(
        "sample_rank", F.row_number().over(wr).cast("long")
    )
    # bounded: |sources| allocation rows
    return ranked.join(F.broadcast(alloc), "source").where(
        F.col("sample_rank") <= F.col("k_s")
    ).select("source", "doc_id", "n_chars", "priority", "sample_rank")


# ---------------------------------------------------------------------------
# cdc_schema_evolution_union — upstream ALTER TABLE tolerance
# ---------------------------------------------------------------------------

_EVO_SCHEMA = (
    "struct<op string, lsn bigint, "
    "after struct<id bigint, v bigint, tier string>>"
)


@register(
    "cdc_schema_evolution_union",
    oracle="""
    WITH env AS (
        SELECT user_id,
               CAST(json_object(
                   'op', 'u', 'lsn', event_id,
                   'after', CASE WHEN event_id % 2 = 1
                       THEN json_object('id', user_id,
                                        'v', event_id % 1000,
                                        'tier', event_type)
                       ELSE json_object('id', user_id,
                                        'v', event_id % 1000) END
               ) AS VARCHAR) AS raw
        FROM events WHERE user_id IS NOT NULL
    ),
    p AS (
        SELECT CAST(json_extract(raw, '$.lsn') AS BIGINT) AS lsn,
               CAST(json_extract(raw, '$.after.id') AS BIGINT) AS id,
               CAST(json_extract(raw, '$.after.v') AS BIGINT) AS v,
               json_extract_string(raw, '$.after.tier') AS tier
        FROM env
    )
    SELECT id AS user_id,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           CAST(COUNT(*) FILTER (WHERE tier IS NULL) AS BIGINT)
               AS n_pre_evolution,
           CAST(COUNT(*) FILTER (WHERE tier IS NOT NULL) AS BIGINT)
               AS n_post_evolution,
           MIN(CASE WHEN tier IS NOT NULL THEN lsn END)
               AS first_post_lsn,
           MAX_BY(tier, CASE WHEN tier IS NOT NULL THEN lsn END)
               AS latest_tier,
           MAX_BY(v, lsn) AS last_v
    FROM p GROUP BY id
    """,
    doc="CDC SCHEMA EVOLUTION tolerance — the upstream-ALTER-TABLE "
        "case every long-lived CDC pipeline hits (Debezium emits the "
        "new column as soon as the source adds it; historical events "
        "lack the key): envelopes are synthesized from two writer "
        "generations (even LSNs = pre-migration, no `tier` key; odd "
        "= post-migration), and ONE evolved union schema parses both "
        "— `from_json` yields NULL for the missing field instead of "
        "failing, exactly Spark's mergeSchema contract for parquet "
        "logs. The per-key readout (pre/post version counts, first "
        "post-migration LSN, latest tier, last value) is what a "
        "backfill decision reads. Scale shape: parse is map-side; "
        "one keyed agg shuffle with max_by (no window).",
)
def cdc_schema_evolution_union(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("user_id").isNotNull()
    )
    # to_json, not string concat: the serializer escapes quotes /
    # backslashes in event_type, so a metacharacter-bearing value
    # round-trips identically on both engines instead of silently
    # nulling under from_json. ignoreNullFields (Spark's default)
    # drops the null `tier`, producing the pre-migration generation's
    # key-absent envelope.
    raw = ev.select(
        F.to_json(
            F.struct(
                F.lit("u").alias("op"),
                F.col("event_id").alias("lsn"),
                F.struct(
                    F.col("user_id").alias("id"),
                    (F.col("event_id") % 1000).alias("v"),
                    F.when(
                        F.col("event_id") % 2 == 1, F.col("event_type")
                    ).alias("tier"),
                ).alias("after"),
            )
        ).alias("raw")
    )
    p = raw.select(F.from_json("raw", _EVO_SCHEMA).alias("e")).select(
        F.col("e.lsn").alias("lsn"),
        F.col("e.after.id").alias("user_id"),
        F.col("e.after.v").alias("v"),
        F.col("e.after.tier").alias("tier"),
    )
    return p.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_versions"),
        F.sum(F.when(F.col("tier").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_pre_evolution"),
        F.sum(F.when(F.col("tier").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_post_evolution"),
        F.min(F.when(F.col("tier").isNotNull(), F.col("lsn"))).alias(
            "first_post_lsn"
        ),
        F.expr(
            "max_by(tier, CASE WHEN tier IS NOT NULL THEN lsn END)"
        ).alias("latest_tier"),
        F.expr("max_by(v, lsn)").alias("last_v"),
    )


# ---------------------------------------------------------------------------
# events_changepoint_cusum — CUSUM changepoint estimation per user
# ---------------------------------------------------------------------------

_CUSUM_MIN_N = 8  # users with fewer observations carry no signal


@register(
    "events_changepoint_cusum",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, ts, value FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL
    ),
    m AS (SELECT user_id, AVG(value) AS mu,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM e GROUP BY user_id HAVING COUNT(*) >= {_CUSUM_MIN_N}),
    c AS (
        SELECT e.user_id, e.event_id, e.ts, m.n,
               ROUND(SUM(e.value - m.mu) OVER (
                   PARTITION BY e.user_id ORDER BY e.ts, e.event_id
                   ROWS UNBOUNDED PRECEDING) + 1e-9, 6) AS cusum
        FROM e JOIN m USING (user_id)
    ),
    cp AS (
        SELECT user_id, n,
               MAX(ABS(cusum)) OVER (PARTITION BY user_id)
                   AS cusum_max_abs,
               event_id AS cp_event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ABS(cusum) DESC, event_id)
                   AS rn
        FROM c
    )
    SELECT user_id, n, ROUND(cusum_max_abs + 1e-9, 6) AS cusum_max_abs,
           cp_event_id
    FROM cp WHERE rn = 1
    """,
    doc=f"CUSUM changepoint estimation (Page 1954 / the classic "
        f"cumulative-sum chart): per user, the running sum of "
        f"deviations from that user's mean peaks — in absolute value "
        f"— at the most likely mean-shift point; emits the peak "
        f"magnitude and its event id for every user with >= "
        f"{_CUSUM_MIN_N} observations. The sequential-analytics "
        f"family member next to events_ema (smoothing), events_ks_"
        f"drift_halves (distribution drift) and the CEP pattern "
        f"matcher: drift says THAT a metric moved, CUSUM says WHEN. "
        f"Scale shape: one keyed agg for the means (broadcast back), "
        f"one user-keyed running-sum window (high-cardinality "
        f"partitions — the parallelism), one keyed argmax agg; "
        f"nothing global. Cusum values are 1e-6-rounded before the "
        f"argmax so the peak pick is cross-engine stable; ties break "
        f"to the earliest event id.",
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .select("user_id", "event_id", "ts", "value")
    )
    m = (
        ev.groupBy("user_id")
        .agg(
            F.avg("value").alias("mu"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .where(F.col("n") >= _CUSUM_MIN_N)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = ev.join(m, "user_id").select(
        "user_id",
        "event_id",
        "n",
        F.round(
            F.sum(F.col("value") - F.col("mu")).over(w) + F.lit(1e-9), 6
        ).alias("cusum"),
    )
    cp = c.groupBy("user_id").agg(
        F.first("n").alias("n"),
        F.max(F.abs("cusum")).alias("raw_max"),
        # Raw BIGINT tie-break (a DOUBLE cast collapses ids above
        # 2^53 and could diverge from the oracle's exact ordering).
        F.expr(
            "min_by(event_id, struct(-abs(cusum) AS a, event_id AS b))"
        ).alias("cp_event_id"),
    )
    return cp.select(
        "user_id",
        "n",
        F.round(F.col("raw_max") + F.lit(1e-9), 6).alias("cusum_max_abs"),
        "cp_event_id",
    )


# ---------------------------------------------------------------------------
# events_holt_linear_smoothing — double exponential smoothing per user
# ---------------------------------------------------------------------------

_HOLT_A = 0.5   # level smoothing (alpha)
_HOLT_B = 0.25  # trend smoothing (beta)
_HOLT_MIN_N = 3  # need >= 3 points: 2 seed the state, 1+ folds


@register(
    "events_holt_linear_smoothing",
    oracle=f"""
    WITH RECURSIVE l AS (
        SELECT user_id, list(value ORDER BY event_id) AS vals
        FROM events
        WHERE user_id IS NOT NULL AND value IS NOT NULL
        GROUP BY user_id HAVING COUNT(*) >= {_HOLT_MIN_N}
    ),
    r(user_id, i, level, trend) AS (
        SELECT user_id, 2,
               CAST(vals[2] AS DOUBLE),
               CAST(vals[2] AS DOUBLE) - CAST(vals[1] AS DOUBLE)
        FROM l
        UNION ALL
        SELECT r.user_id, r.i + 1,
               {_HOLT_A} * CAST(l.vals[r.i + 1] AS DOUBLE)
                   + (1 - {_HOLT_A}) * (r.level + r.trend),
               {_HOLT_B} * (({_HOLT_A} * CAST(l.vals[r.i + 1] AS DOUBLE)
                             + (1 - {_HOLT_A}) * (r.level + r.trend))
                            - r.level)
                   + (1 - {_HOLT_B}) * r.trend
        FROM r JOIN l USING (user_id)
        WHERE r.i < len(l.vals)
    )
    SELECT r.user_id,
           CAST(len(l.vals) AS BIGINT) AS n_points,
           ROUND(r.level + 1e-9, 6) AS level,
           ROUND(r.trend + 1e-9, 6) AS trend,
           ROUND(r.level + r.trend + 1e-9, 6) AS forecast_next
    FROM r JOIN l USING (user_id)
    WHERE r.i = len(l.vals)
    """,
    doc=f"Holt double exponential smoothing (level + trend, alpha="
        f"{_HOLT_A}, beta={_HOLT_B}) per user — the trend-aware "
        f"sibling of events_ema (single smoothing has no slope, so "
        f"its one-step forecast always lags a drifting metric; Holt's "
        f"second recurrence tracks the slope). State seeds from the "
        f"first two observations, folds over the rest in event "
        f"order, and emits the final level/trend plus the one-step "
        f"forecast. The fold is order-sensitive — SQL windows cannot "
        f"express it — so the Spark side folds a struct(level, "
        f"trend) accumulator over the sorted value array in ONE "
        f"aggregate() pass (same shape as events_ema), and the "
        f"oracle replays the identical recurrence as a recursive "
        f"CTE: both engines execute the same arithmetic in the same "
        f"order, so the doubles match bit-for-bit before rounding. "
        f"Scale shape: one keyed shuffle (sorted collect_list per "
        f"user); the fold is JVM map-side.",
)
def events_holt_linear_smoothing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    lst = (
        events.where(
            F.col("user_id").isNotNull() & F.col("value").isNotNull()
        )
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("event_id", "value"))
            ).alias("xs")
        )
        .where(F.size("xs") >= _HOLT_MIN_N)
        .select(
            "user_id",
            F.expr("transform(xs, s -> s.value)").alias("vals"),
        )
    )
    a, b = _HOLT_A, _HOLT_B
    # Seed exactly as the oracle: level = v2, trend = v2 - v1, fold
    # from the 3rd element.
    seed_fold = F.expr(
        f"aggregate(slice(vals, 3, size(vals) - 2), "
        f"named_struct('level', CAST(element_at(vals, 2) AS DOUBLE), "
        f"'trend', CAST(element_at(vals, 2) AS DOUBLE) "
        f"- CAST(element_at(vals, 1) AS DOUBLE)), "
        f"(acc, x) -> named_struct("
        f"'level', {a}D * x + {1 - a}D * (acc.level + acc.trend), "
        f"'trend', {b}D * (({a}D * x + {1 - a}D * (acc.level + acc.trend))"
        f" - acc.level) + {1 - b}D * acc.trend))"
    )
    return lst.select(
        "user_id",
        F.size("vals").cast("long").alias("n_points"),
        seed_fold.alias("st"),
    ).select(
        "user_id",
        "n_points",
        F.round(F.col("st.level") + F.lit(1e-9), 6).alias("level"),
        F.round(F.col("st.trend") + F.lit(1e-9), 6).alias("trend"),
        F.round(
            F.col("st.level") + F.col("st.trend") + F.lit(1e-9), 6
        ).alias("forecast_next"),
    )


# ---------------------------------------------------------------------------
# dedup_cluster_best_representative — quality-keeper cluster collapse
# ---------------------------------------------------------------------------


def _rep_oracle() -> str:
    from change_data_capture_poc_spark.queries.datapipe import (
        _MINHASH_PAIRS_SQL,
    )

    return f"""
    WITH RECURSIVE
    {_MINHASH_PAIRS_SQL},
    edges AS (SELECT pa AS a, pb AS b FROM pairs
              UNION SELECT pb, pa FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
        SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
        FROM reach GROUP BY a
    ),
    scored AS (
        SELECT c.cluster_id, c.doc_id, d.n_chars
        FROM comp c JOIN documents d USING (doc_id)
    )
    SELECT cluster_id,
           CAST(n_members AS BIGINT) AS n_members,
           doc_id AS rep_doc_id,
           rep_n_chars,
           CAST(n_members - 1 AS BIGINT) AS n_dropped
    FROM (
        SELECT cluster_id, doc_id,
               COUNT(*) OVER (PARTITION BY cluster_id) AS n_members,
               MAX(n_chars) OVER (PARTITION BY cluster_id)
                   AS rep_n_chars,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM scored
    ) WHERE rn = 1
    """


@register(
    "dedup_cluster_best_representative",
    oracle=_rep_oracle(),
    doc="QUALITY-KEEPER cluster collapse: the near-dup clusters from "
        "min-label propagation (dedup_cluster_label_propagation's "
        "components over the MinHash-LSH candidate graph) each keep "
        "their LONGEST member (n_chars as the quality proxy; lowest "
        "doc_id tiebreak) instead of the lowest-id one — the "
        "curation-relevant collapse rule (keep-lowest-id discards "
        "the best copy whenever a longer, cleaner duplicate has a "
        "higher id; published pipelines keep by quality score). "
        "Emits per cluster: size, representative, its length, and "
        "the drop count — with graph_triangle_count_dupgraph's "
        "topology census, the before/after of the collapse "
        "decision. Scale shape: label propagation is 1 shuffle per "
        "round over the candidate edges; the keeper pick is one "
        "keyed argmax agg (map-side combinable), never a window.",
)
def dedup_cluster_best_representative(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from change_data_capture_poc_spark.operators.components import (
        connected_components,
    )
    from change_data_capture_poc_spark.queries.datapipe import (
        dedup_minhash_lsh,
    )

    pairs = dedup_minhash_lsh(spark, sf_dir)
    comp = connected_components(
        pairs, src="doc_id_a", dst="doc_id_b"
    ).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    scored = comp.join(d, "doc_id")
    return scored.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        # Raw BIGINT keys: integer negation is exact, and a DOUBLE
        # cast would collapse ids above 2^53.
        F.expr(
            "min_by(doc_id, struct(-n_chars AS a, doc_id AS b))"
        ).alias("rep_doc_id"),
        F.max("n_chars").alias("rep_n_chars"),
        (F.count(F.lit(1)) - 1).cast("long").alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# dedup_threshold_sensitivity — retention vs Jaccard threshold curve
# ---------------------------------------------------------------------------

_DTS_THRESHOLDS = (400, 500, 600, 700, 800, 900)  # permille


def _dts_oracle() -> str:
    from change_data_capture_poc_spark.queries.datapipe import (
        _MINHASH_PAIRS_SQL,
    )

    th = ", ".join(str(t) for t in _DTS_THRESHOLDS)
    return f"""
    WITH {_MINHASH_PAIRS_SQL},
    cand AS (SELECT pa AS a, pb AS b FROM pairs),
    tk AS (SELECT doc_id, unnest(grams) AS gram FROM g),
    sizes AS (SELECT doc_id, len(grams) AS n FROM g),
    inter AS (
        SELECT c.a, c.b, COUNT(*) AS c
        FROM cand c
        JOIN tk ta ON ta.doc_id = c.a
        JOIN tk tb ON tb.doc_id = c.b AND tb.gram = ta.gram
        GROUP BY c.a, c.b
    ),
    jac AS (
        SELECT i.a, i.b, i.c, sa.n AS na, sb.n AS nb
        FROM inter i
        JOIN sizes sa ON i.a = sa.doc_id
        JOIN sizes sb ON i.b = sb.doc_id
    ),
    total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM g),
    curve AS (
        SELECT t.t AS threshold_permille,
               CAST(COUNT(*) FILTER (
                   WHERE c * 1000 >= t.t * (na + nb - c)) AS BIGINT)
                   AS n_dup_pairs,
               CAST(COUNT(DISTINCT CASE
                   WHEN c * 1000 >= t.t * (na + nb - c) THEN b END)
                   AS BIGINT) AS n_docs_dropped
        FROM jac, (SELECT unnest([{th}]) AS t) t
        GROUP BY t.t
    )
    SELECT threshold_permille, n_dup_pairs, n_docs_dropped,
           ROUND(1.0 - n_docs_dropped * 1.0 / total.n_docs + 1e-9, 6)
               AS retention_rate
    FROM curve, total
    """


@register(
    "dedup_threshold_sensitivity",
    oracle=_dts_oracle(),
    doc="Dedup THRESHOLD SENSITIVITY curve: exact Jaccard is verified "
        "once per LSH candidate pair, then every threshold in "
        f"{list(_DTS_THRESHOLDS)} permille reads off its duplicate-"
        "pair count, docs dropped (keep-lowest rule: the higher-id "
        "side of each above-threshold pair), and corpus retention — "
        "the knob-tuning table behind every near-dup deployment "
        "(published pipelines disagree between 0.7 and 0.9; this "
        "measures what each costs on YOUR corpus in ONE pass instead "
        "of re-running dedup per candidate threshold). All threshold "
        "comparisons are cross-multiplied integers (c*1000 >= "
        "t*(union)) — no float boundary can flip a count. Scale "
        "shape: exact verification touches CANDIDATE pairs only "
        "(never all-pairs); the curve is a 6-row rollup; one gram "
        "shuffle + the banded candidate join, both inherited from "
        "the production dedup path.",
)
def dedup_threshold_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from change_data_capture_poc_spark.queries.datapipe import (
        _spark_grams,
        dedup_minhash_lsh,
    )

    d = load_table(spark, sf_dir, "documents")
    g = _spark_grams(d).transform(persist_once)  # grams feed the token join + sizes
    # Candidates come from the REGISTERED pair query (same reuse rule
    # as the triangle census): the curve grades exactly the pairs the
    # production dedup path would verify.
    cand = dedup_minhash_lsh(spark, sf_dir).select(
        F.col("doc_id_a").alias("a"), F.col("doc_id_b").alias("b")
    )
    tk = g.select("doc_id", F.explode("grams").alias("gram"))
    inter = (
        cand.join(
            tk.select(F.col("doc_id").alias("a"), "gram"), "a"
        )
        .join(
            tk.select(F.col("doc_id").alias("b"), "gram"),
            ["b", "gram"],
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    sizes = g.select("doc_id", F.size("grams").alias("n"))
    jac = inter.join(
        sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")),
        "a",
    ).join(
        sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")),
        "b",
    )
    total = g.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    th = F.explode(
        F.array(*[F.lit(t) for t in _DTS_THRESHOLDS])
    ).alias("threshold_permille")
    above = (
        F.col("c") * 1000
        >= F.col("threshold_permille")
        * (F.col("na") + F.col("nb") - F.col("c"))
    )
    curve = (
        jac.select("a", "b", "c", "na", "nb", th)
        .groupBy("threshold_permille")
        .agg(
            F.sum(F.when(above, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_pairs"),
            F.countDistinct(F.when(above, F.col("b")))
            .cast("long")
            .alias("n_docs_dropped"),
        )
    )
    # bounded: 1-row total scalar
    return curve.crossJoin(F.broadcast(total)).select(
        "threshold_permille",
        "n_dup_pairs",
        "n_docs_dropped",
        F.round(
            1.0 - F.col("n_docs_dropped") * 1.0 / F.col("n_docs")
            + F.lit(1e-9),
            6,
        ).alias("retention_rate"),
    )
