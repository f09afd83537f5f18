"""Attach deterministic binary image payloads to the features table.

Arrow-batched via mapInPandas: each batch synthesizes pixels from phash and
encodes with the engine codec. This is the only place payload bytes are
created; oracle-checked queries never touch the bytes column.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.imaging import encode, synth_pixels


def attach_bytes(df: DataFrame) -> DataFrame:
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", bytes binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [
                encode(synth_pixels(int(p), int(w), int(h)), f)
                for p, w, h, f in zip(pdf["phash"], pdf["w"], pdf["h"], pdf["fmt"])
            ]
            pdf = pdf.copy()
            pdf["bytes"] = blobs
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)
