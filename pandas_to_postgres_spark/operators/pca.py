"""Distributed PCA / whitening over an ``array<float>`` embedding column.

The 100 TB shape (classic two-phase tree aggregation):

1. **Fit** — ONE ``mapInPandas`` pass emits per-Arrow-batch sufficient
   statistics ``(n, sum_x, sum_xxT)`` as numpy float64 (dense linear
   algebra belongs in numpy, not interpreted HOF expressions — measured
   on the k-means pair stage, ~16x). Each partial is one row of
   ``d + d*d + 1`` doubles, so the driver collects ``partitions x
   (d^2+d+1)`` values — for d=64 that is ~4 KB per partition regardless
   of corpus size. The covariance eigendecomposition then runs on the
   driver over a d x d matrix (microseconds); no iterative distributed
   solver is needed while d stays in the thousands.
2. **Project** — the (k x d) component matrix is a closure constant of a
   second map-only ``mapInPandas``; the corpus is never shuffled, so
   projection runs at scan speed and composes with any downstream
   operator (ANN, k-means, dedup) on the reduced vectors.

Determinism: partials are combined in partition order and the combined
moments are rounded to 1e-9 before the eigensolve, so the fitted basis
does not wobble with partition count; eigenvector SIGN is normalized
(largest-|coordinate| entry positive) because eigh's sign is arbitrary.

Use: dimensionality reduction before SemDeDup k-means / ANN (distance
computations drop from d to k multiplies), and whitening to decorrelate
embedding dimensions so cosine/L2 thresholds behave isotropically
(SemDeDup, Abbas et al. 2023; whitening per Bell & Sejnowski 1997).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (k, d) rows = principal axes
    explained_var: np.ndarray  # (k,) eigenvalues, descending
    whiten: bool

    @property
    def k(self) -> int:
        return self.components.shape[0]


def _moment_schema(d: int) -> T.StructType:
    return T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("sx", T.ArrayType(T.DoubleType())),
            T.StructField("sxx", T.ArrayType(T.DoubleType())),
        ]
    )


def fit_pca(df: DataFrame, vec_col: str, k: int, whiten: bool = False) -> PCAModel:
    """Fit PCA on ``df[vec_col]`` (array<float|double>, fixed length d).

    One distributed pass (sufficient statistics) + a driver-side d x d
    eigensolve. ``k`` is clamped to d.
    """
    d = len(
        df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()[0]
    )

    def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [vecs.shape[0]],
                    "sx": [vecs.sum(axis=0)],
                    "sxx": [(vecs.T @ vecs).ravel()],
                }
            )

    parts = (
        df.select(vec_col)
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(_partials, schema=_moment_schema(d))
        .collect()
    )
    n = sum(r["n"] for r in parts)
    if n < 2:
        raise ValueError("need at least 2 vectors to fit PCA")
    sx = np.zeros(d)
    sxx = np.zeros((d, d))
    for r in parts:  # combined in collect (partition) order
        sx += np.asarray(r["sx"])
        sxx += np.asarray(r["sxx"]).reshape(d, d)
    # round the moments so the fitted basis is independent of partition
    # count (float addition order) — 1e-9 is far below embedding noise
    sx = np.round(sx, 9)
    sxx = np.round(sxx, 9)
    mean = sx / n
    cov = (sxx - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][: min(k, d)]
    comps = evecs[:, order].T  # (k, d)
    # sign convention: the largest-|coordinate| entry of each axis is >= 0
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PCAModel(
        mean=mean,
        components=comps,
        explained_var=np.maximum(evals[order], 0.0),
        whiten=whiten,
    )


def transform_pca(
    df: DataFrame, vec_col: str, model: PCAModel, out_col: str = "pc"
) -> DataFrame:
    """Project ``vec_col`` onto the fitted basis as ``out_col``
    (array<double>, length k); whitening divides each component by
    sqrt(eigenvalue) so the output covariance is ~identity.

    Map-only: the (k x d) matrix is a closure constant, rows never leave
    their partition, and all other columns pass through untouched.
    """
    mean = model.mean
    # scale the projection matrix once on the driver; guards a zero
    # eigenvalue (constant dimension) from dividing by zero
    proj = model.components
    if model.whiten:
        scale = np.sqrt(np.maximum(model.explained_var, 1e-12))
        proj = proj / scale[:, None]
    out_fields = [f for f in df.schema.fields if f.name != out_col]
    schema = T.StructType(
        out_fields + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )
    cols = [f.name for f in out_fields]

    def _project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            pcs = (vecs - mean) @ proj.T  # (rows, k)
            out = pdf[cols].copy()
            out[out_col] = list(pcs)
            yield out

    return df.mapInPandas(_project, schema=schema)


def pca_fit_transform(
    df: DataFrame, vec_col: str, k: int, whiten: bool = False, out_col: str = "pc"
) -> DataFrame:
    model = fit_pca(df, vec_col, k, whiten=whiten)
    return transform_pca(df, vec_col, model, out_col=out_col)
