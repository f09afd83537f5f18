"""UDF extension registry (SURVEY 2.9).

The reference's extension surface is subclass hooks on the Tiler classes
(each *Tiler overrides parse/transform steps). The engine's equivalent is a
small named registry of VECTORIZED functions: register once, then use from
the DataFrame API or SQL. Registration enforces the engine's no-per-row rule
— entries are Arrow-batched pandas UDFs (or builtin Column expressions), so
user extensions can't silently drop the hot path to row-at-a-time Python.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@dataclass
class _Entry:
    name: str
    fn: Callable         # raw vectorized callable (pandas Series in/out)
    return_type: str
    doc: str
    wrapped: object = None  # lazily-built pandas UDF (needs a live session)


_REGISTRY: dict[str, _Entry] = {}


def register_udf(name: str, fn: Callable, return_type: str, doc: str = "") -> None:
    """Register a vectorized (pandas Series in/out) function under `name`.

    fn: callable taking pandas Series args and returning a pandas Series of
    `return_type`. Wrapped as an Arrow-batched pandas UDF on first use
    (pandas_udf construction needs an active SparkSession).
    """
    if name in _REGISTRY:
        raise ValueError(f"udf {name!r} already registered")
    _REGISTRY[name] = _Entry(name, fn, return_type, doc)


def udf(name: str):
    """Column factory for a registered UDF: `udf('toupper')(F.col('x'))`."""
    entry = _REGISTRY[name]
    if entry.wrapped is None:
        # explicit SCALAR eval type: callers' type hints may be stringified
        # (PEP 563) and unresolvable by pyspark's hint inference
        from pyspark.sql.functions import PandasUDFType

        entry.wrapped = F.pandas_udf(entry.fn, entry.return_type, PandasUDFType.SCALAR)
    return entry.wrapped


def names() -> list[str]:
    return sorted(_REGISTRY)


def bind_sql(spark: SparkSession, name: str | None = None) -> None:
    """Expose registered UDFs to Spark SQL (spark.sql('... name(col) ...'))."""
    for entry in _REGISTRY.values() if name is None else [_REGISTRY[name]]:
        spark.udf.register(entry.name, udf(entry.name))


def _register_builtins() -> None:
    import numpy as np
    import pandas as pd

    def _height_band(z: pd.Series) -> pd.Series:
        # the reference's roof-height classing, as a sample extension
        zz = z.to_numpy()
        return pd.Series(np.where(zz < 200.0, "low", np.where(zz < 250.0, "mid", "high")))

    register_udf(
        "height_band", _height_band, "string",
        doc="building height class from centroid z",
    )


_register_builtins()
