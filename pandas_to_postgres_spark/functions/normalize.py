"""Target-schema normalization and the formatter hook chain.

This is the Spark-native re-expression of the reference's two central
transforms:

1. ``cast_pandas`` (`/root/reference/pandas_to_postgres/utilities.py:119-167`):
   coerce a source frame toward an external target schema — INTEGER/BIGINT
   columns to nullable ints (`:151-152`), BOOLEAN to None/bool (`:156-159`),
   warn-and-skip columns the source lacks (`:160-165`). In Spark the
   float-NaN workaround disappears (int/bool columns are natively nullable);
   the surviving semantic obligation is "nulls pass through int/bool columns
   end-to-end and the target schema is authoritative".

2. the formatter hook chain (`/root/reference/pandas_to_postgres/_base_copy.py:146-167`):
   an ordered list of ``f(df, **kwargs) -> df`` applied to every chunk before
   the sink. ``DataFrame.transform`` chains df→df functions declaratively so
   Catalyst still sees one plan; for hooks that genuinely need pandas, wrap
   them with ``mapInPandas`` via :func:`pandas_formatter`.
"""

from __future__ import annotations

import logging
from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

logger = logging.getLogger("pandas_to_postgres_spark")

Formatter = Callable[[DataFrame], DataFrame]


def cast_to_target_schema(
    df: DataFrame,
    target: T.StructType,
    strict: bool = False,
) -> DataFrame:
    """Project+cast ``df`` onto ``target``, the external schema authority.

    Mirrors ``cast_pandas``: for each target column present in the source,
    cast to the target type (nulls preserved — Spark primitives are nullable);
    columns missing from the source are skipped with a warning (or raise when
    ``strict``), matching `utilities.py:160-165`. Extra source columns are
    dropped, matching the COPY column-list projection
    (`/root/reference/pandas_to_postgres/_base_copy.py:140-143`).
    """
    available = {f.name.lower(): f.name for f in df.schema.fields}
    cols = []
    for field in target.fields:
        src = available.get(field.name.lower())
        if src is None:
            if strict:
                raise ValueError(f"source is missing target column {field.name!r}")
            logger.warning("Column %r not in source frame — skipped", field.name)
            continue
        cols.append(F.col(src).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def apply_formatters(
    df: DataFrame, formatters: Iterable[Formatter], **kwargs
) -> DataFrame:
    """Apply the ordered formatter chain (`_base_copy.py:146-167`).

    Each formatter is df→df; chaining keeps the whole pipeline one Catalyst
    plan (filters still push down through it). ``kwargs`` mirror the
    reference's shared-kwargs hook protocol (`_base_copy.py:152-156`:
    ``f(df, copy_obj=self, **kwargs)``) — the HDF path passes ``hdf_table``
    plus per-table `hdf_metadata` constants (`copy_hdf.py:44-46,105`).
    A formatter that only takes ``df`` (the common Spark-native case) is
    called without them; one whose signature accepts extra named or
    ``**kwargs`` parameters receives the full set.
    """
    import inspect

    for fn in formatters:
        if not kwargs:
            df = fn(df)
            continue
        try:
            sig = inspect.signature(fn)
        except (TypeError, ValueError):
            df = fn(df)
            continue
        params = list(sig.parameters.values())
        has_var_kw = any(p.kind is inspect.Parameter.VAR_KEYWORD for p in params)
        if has_var_kw:
            df = fn(df, **kwargs)
        else:
            named = {p.name for p in params[1:]}
            accepted = {k: v for k, v in kwargs.items() if k in named}
            df = fn(df, **accepted) if accepted else fn(df)
    return df


def pandas_formatter(
    fn: Callable[..., "object"],
    schema: T.StructType,
    **kwargs,
) -> Formatter:
    """Wrap a pandas df→df hook as a Spark formatter via ``mapInPandas``.

    Exact semantic match for the reference's hook contract
    (`_base_copy.py:152-156`: pandas in, pandas out, per-chunk): Spark calls
    ``fn`` once per Arrow batch per partition — the batch is the chunk.
    ``kwargs`` are closed over, mirroring the shared-kwargs hook protocol.
    """

    def _mapper(batches: Iterator["object"]) -> Iterator["object"]:
        for pdf in batches:
            yield fn(pdf, **kwargs)

    def _formatter(df: DataFrame) -> DataFrame:
        return df.mapInPandas(_mapper, schema=schema)

    return _formatter
