"""Attach deterministic binary image payloads to the features table.

Arrow-batched via mapInPandas: each batch synthesizes pixels from phash and
encodes with the engine codec. This is the only place payload bytes are
created; oracle-checked queries never touch the bytes column.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.imaging import synth_encode_batch


def attach_bytes(df: DataFrame) -> DataFrame:
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", bytes binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["bytes"] = synth_encode_batch(
                pdf["phash"].to_numpy(),
                pdf["w"].to_numpy(),
                pdf["h"].to_numpy(),
                pdf["fmt"].to_numpy(),
            )
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)
