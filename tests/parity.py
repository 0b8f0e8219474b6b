"""Self-hosted replica of the driver's oracle-differential check.

Runs a registered query's Spark callable and its DuckDB oracle on the
same fixture dir, normalizes both frames (column-name sort, row sort,
float canonicalization), and asserts exact equality — stricter than the
driver's order-insensitive value hash, so passing here implies passing
there.
"""

from __future__ import annotations

import math

import pandas as pd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            # canonicalize -0.0 and NaN; values are pre-rounded by the
            # queries themselves so repr is stable
            df[c] = s.map(
                lambda v: "nan"
                if v is None or (isinstance(v, float) and math.isnan(v))
                else repr(v + 0.0)
            )
        elif pd.api.types.is_object_dtype(s):
            df[c] = s.map(lambda v: "<null>" if v is None else str(v))
        else:
            df[c] = s.astype("object").map(lambda v: "<null>" if v is None else str(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, duck_rel) -> None:
    got = _canon(spark_df.toPandas())
    want = _canon(duck_rel.df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} duck={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} duck={len(want)}"
    if not got.equals(want):
        diff_mask = (got != want).any(axis=1)
        sample = pd.concat(
            [got[diff_mask].head(5).add_prefix("spark_"),
             want[diff_mask].head(5).add_prefix("duck_")],
            axis=1,
        )
        raise AssertionError(f"value mismatch ({int(diff_mask.sum())} rows):\n{sample}")
