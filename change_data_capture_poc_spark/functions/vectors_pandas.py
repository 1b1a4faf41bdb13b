"""Arrow-vectorized vector math — the Pandas-UDF scale path for
similarity search.

The built-in ``F.aggregate`` cosine (functions/vectors.py) is exact and
codegen'd, but folds element-by-element per row. For high-dimensional
embeddings the winning formulation is a numpy matmul per Arrow batch
against a broadcast query matrix: one BLAS call scores a whole batch
(rows x dims) x (dims x queries).

Shape: ``mapInPandas`` with bounded batches
(``spark.sql.execution.arrow.maxRecordsPerBatch``) — executor memory
stays flat; the query matrix is a closure broadcast (small by
construction: ANN query sets are tiny relative to the corpus).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def cosine_topk_pandas(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Top-k cosine neighbors per query id, scored batch-at-a-time.

    ``queries``: [(q_id, vector), ...] — small, collected driver-side
    (the corpus never leaves the executors). Returns
    (q_id, neighbor_id, cosine) — per-partition top-k via numpy
    argpartition, exact global top-k after the final per-q_id window
    (the caller applies it; partial top-k keeps the shuffle tiny).
    """
    q_ids = np.array([q[0] for q in queries], dtype=np.int64)
    q_mat = np.array([q[1] for q in queries], dtype=np.float64)
    # Zero-norm guard (here and in the batch loop): dividing by a zero
    # norm yields NaN similarities, which silently empty the result
    # (NaN kth -> all-False keep) instead of failing or scoring. A zero
    # vector has cosine 0 to everything by convention — substitute
    # norm 1 so its dot products (all 0) pass through well-defined.
    q_norm = q_mat / np.where(
        (qn := np.linalg.norm(q_mat, axis=1, keepdims=True)) == 0, 1.0, qn
    )

    out_schema = T.StructType(
        [
            T.StructField("q_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.stack(pdf[vec_col].to_numpy())  # rows x dims
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms = np.where(norms == 0, 1.0, norms)  # zero-norm guard
            sims = (mat / norms) @ q_norm.T  # rows x queries
            for qi in range(len(q_ids)):
                mask = ids != q_ids[qi]
                cids = ids[mask]
                # Round BEFORE the cut and keep ties with the kth value:
                # the caller's final ranking is on the rounded score, so
                # the partial top-k must never drop a rounded-tied
                # candidate (determinism across engines). +1e-9 pre-round
                # epsilon = the repo ANN-rank convention (a cosine within
                # an ulp of a 0.5e-6 boundary must round identically on
                # both engines' float paths).
                r = np.round(sims[:, qi][mask] + 1e-9, 6)
                if len(cids) > k:
                    kth = -np.partition(-r, k - 1)[k - 1]
                    keep = r >= kth
                    cids, r = cids[keep], r[keep]
                yield pd.DataFrame(
                    {
                        "q_id": np.full(len(cids), q_ids[qi]),
                        "neighbor_id": cids,
                        "cosine": r,
                    }
                )

    return corpus.select(id_col, vec_col).mapInPandas(score, out_schema)


def _block_pair_kernel(
    pdf: pd.DataFrame, threshold: float, id_col: str, vec_col: str
):
    """Shared per-block pair computation: ids sorted ascending, rows
    unit-normalized (zero-norm guard), one G @ G.T matmul, cosines
    rounded at 1e-6, upper-triangle pairs (i < j so vec_a < vec_b),
    kept iff rounded cosine >= threshold.

    Both ``label_blocked_cosine_pairs`` and
    ``label_blocked_semdedup_stats`` close over THIS function so their
    pair semantics stay provably identical — any change to the sort,
    the normalization guard, or the rounding epsilon applies to both
    (r13 ADVICE: the duplicated kernels could silently diverge).

    Returns (ids, sims, iu, ju, keep).
    """
    order = np.argsort(pdf[id_col].to_numpy())
    ids = pdf[id_col].to_numpy()[order]
    mat = np.stack(pdf[vec_col].to_numpy())[order]
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.where(n == 0, 1.0, n)  # zero-norm guard (see above)
    sims = np.round(mat @ mat.T, 6)
    iu, ju = np.triu_indices(len(ids), k=1)
    keep = sims[iu, ju] >= threshold
    return ids, sims, iu, ju, keep


def label_blocked_cosine_pairs(
    df: DataFrame,
    threshold: float,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """All within-label pairs with cosine >= threshold, one BLAS matmul
    per label block (``applyInPandas``).

    The built-in fold formulation evaluates 3 interpreted 64-element
    aggregates per pair (higher-order functions don't enter codegen);
    for |block| x |block| pairs a normalized G @ G.T is orders of
    magnitude faster and shuffles exactly once (on the label), which is
    also the 100 TB shape — blocks stream through executors, pairs
    never leave their block.
    """
    out_schema = T.StructType(
        [
            T.StructField("vec_a", T.LongType()),
            T.StructField("vec_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids, sims, iu, ju, keep = _block_pair_kernel(
            pdf, threshold, id_col, vec_col
        )
        return pd.DataFrame(
            {
                "vec_a": ids[iu[keep]],
                "vec_b": ids[ju[keep]],
                "cosine": sims[iu, ju][keep],
            }
        )

    return df.groupBy(label_col).applyInPandas(pairs, out_schema)


def label_blocked_semdedup_stats(
    df: DataFrame,
    threshold: float,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Per-label SemDeDup readout (members, duplicate pairs, dropped
    members) in the SAME one-matmul-per-block pass that
    ``label_blocked_cosine_pairs`` runs — for consumers that only need
    the per-cluster aggregates, emitting them from the block avoids
    materializing the pair list, re-attaching the label by joining the
    assignment frame back, and re-running the block matmul once per
    aggregate (r13). Pair semantics are identical: ids sorted
    ascending, vec_a < vec_b, cosine rounded at 1e-6 before the
    threshold compare; a member is "dropped" when it is the HIGHER id
    of >= 1 kept pair."""
    out_schema = T.StructType(
        [
            T.StructField(label_col, T.LongType()),
            T.StructField("n_members", T.LongType()),
            T.StructField("n_dup_pairs", T.LongType()),
            T.StructField("n_dropped", T.LongType()),
        ]
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        ids, _sims, _iu, ju, keep = _block_pair_kernel(
            pdf, threshold, id_col, vec_col
        )
        return pd.DataFrame(
            {
                label_col: [int(pdf[label_col].iloc[0])],
                "n_members": [len(ids)],
                "n_dup_pairs": [int(keep.sum())],
                "n_dropped": [int(np.unique(ju[keep]).size)],
            }
        )

    return df.groupBy(label_col).applyInPandas(stats, out_schema)
