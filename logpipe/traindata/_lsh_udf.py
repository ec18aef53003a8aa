"""Arrow-vectorized LSH kernels (numpy matrix math over Arrow batches).

Lives in a module WITHOUT `from __future__ import annotations` so
pyspark can resolve the pandas_udf type hints (same constraint as
operators/_grok_udf.py).

Why a pandas UDF here: the bucket signature needs n_tables*n_planes
64-wide dot products per row. The expression form
(aggregate(zip_with(...)) per plane) is an interpreted higher-order
function in Spark — measured ~3.6s for 72k dots at sf0.1; the numpy
matrix multiply does the same work in one BLAS call per Arrow batch.

Float caveat (documented, bounded): matrix-multiply kernels here sum in
SIMD/pairwise order; the JVM/DuckDB expression forms sum sequentially
left-to-right. A sign bit (bucket membership) can differ only when
|projection| < ~1e-13 — vanishingly unlikely for real-valued data, and
bucket/cell assignment only shapes CANDIDATE sets. Cosines that reach
query OUTPUT use seq_cosine_udf, which accumulates dim-by-dim across
the batch — the exact left-to-right order — so emitted values are
bit-identical to the expression form and the DuckDB oracles while the
bulk math stays vectorized.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


def bucket_udf(planes_by_table):
    """pandas UDF: embedding -> array of per-table bucket ids.

    Bucket semantics match the expression/SQL form exactly (modulo the
    float caveat above): bit i of table t's bucket = sign of the
    projection onto plane (t, i), packed as sum(2^i * [proj > 0]).
    """
    P = np.array(
        [p for planes in planes_by_table for p in planes], dtype=np.float64
    )  # (n_tables*n_planes, dim)
    n_tables = len(planes_by_table)
    n_planes = len(planes_by_table[0])
    w = (2 ** np.arange(n_planes)).astype(np.int64)

    @pandas_udf("array<long>")
    def _buckets(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        X = np.vstack(emb.to_numpy()).astype(np.float64)
        signs = (X @ P.T) > 0  # (batch, n_tables*n_planes)
        buckets = signs.reshape(len(X), n_tables, n_planes).astype(np.int64) @ w
        return pd.Series(list(buckets))

    return _buckets


def nearest_cell_udf(centroids):
    """pandas UDF: embedding -> IVF cell id (argmax cosine over the
    driver-collected centroid list; FIRST max wins = lowest cell id on
    exact ties, matching the expression/SQL tie rule). Assignment only
    shapes candidate sets — emitted cosines are computed exactly."""
    C = np.array([c_emb for _, c_emb, _ in centroids], dtype=np.float64)
    cn = np.array([c_norm for _, _, c_norm in centroids], dtype=np.float64)
    cells = np.array([cell for cell, _, _ in centroids], dtype=np.int32)

    @pandas_udf("int")
    def _cell(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int32")
        X = np.vstack(emb.to_numpy()).astype(np.float64)
        # row-common ||x|| cancels in argmax; only the per-cell norm matters
        cos = (X @ C.T) / cn
        return pd.Series(cells[np.argmax(cos, axis=1)])

    return _cell


@pandas_udf("double")
def seq_cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """EXACT cosine, bit-identical to the JVM expression form
    (aggregate(zip_with(...))) and DuckDB's list_dot_product — safe for
    values that reach query OUTPUT, unlike SIMD/pairwise numpy sums.

    IEEE-754 binary64 ops are deterministic given operand ORDER; the
    only freedom is summation order. This kernel accumulates dim-by-dim
    across the batch (acc = (acc + a_j*b_j), j ascending, acc0 = 0.0) —
    exactly the left-to-right sequence the JVM aggregate and DuckDB use
    per row — then n / (sqrt(na) * sqrt(nb)) in the same grouping as
    the expression form. ~64 vectorized adds per batch instead of an
    interpreted per-element lambda (the expression form measured ~1s
    for 16k 64-wide cosines at sf0.1; this runs the same math in BLAS-
    adjacent time with zero value drift).

    Null embeddings on either side — and zero-norm embeddings, whose
    cosine is undefined — yield NULL (the `try_divide` semantics: a
    bare Divide would throw under ANSI mode and NULL under non-ANSI;
    the kernel never emits NaN/inf). Non-null rows must share one
    fixed dimension — ragged dims are a schema violation upstream, not
    a case this kernel papers over."""
    out = np.full(len(a), None, dtype=object)
    valid = (a.notna() & b.notna()).to_numpy()
    if valid.any():
        A = np.vstack(a.to_numpy()[valid]).astype(np.float64)
        B = np.vstack(b.to_numpy()[valid]).astype(np.float64)
        n = len(A)
        num = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        for j in range(A.shape[1]):
            num += A[:, j] * B[:, j]
            na += A[:, j] * A[:, j]
            nb += B[:, j] * B[:, j]
        denom = np.sqrt(na) * np.sqrt(nb)
        vals = np.full(n, None, dtype=object)
        nz = denom != 0.0
        vals[nz] = num[nz] / denom[nz]
        out[valid] = vals
    return pd.Series(out, index=a.index)
