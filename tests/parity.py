"""Self-hosted replica of the driver's oracle-differential check.

Runs a registered query's Spark callable and its DuckDB oracle on the
same fixture dir, normalizes both frames (column-name sort, row sort,
cell canonicalization), and asserts exact equality — stricter than the
driver's order-insensitive value hash, so passing here implies passing
there.

Both sides transfer through ARROW, not pandas: a numpy-backed pandas
float column represents missing as NaN, so a toPandas()-based compare
is structurally blind to NULL-vs-NaN divergence — exactly the class
the ±Inf/NaN adversarial fixtures exist to catch. Arrow keeps the two
distinct (``to_pylist`` yields ``None`` vs ``float('nan')``), and the
canonicalizer maps them to different tokens.
"""

from __future__ import annotations

import datetime as _dt
import math

import pandas as pd


def _cell(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        # distinct from <null>; -0.0 folded into 0.0
        return "nan" if math.isnan(v) else repr(v + 0.0)
    if isinstance(v, _dt.datetime):
        # Spark's Arrow schema carries tz=UTC where duck is naive-UTC;
        # same instant → same naive string
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        # spark binary → bytearray, duck BLOB → bytes; hex both
        return bytes(v).hex()
    return str(v)


def _canon(tbl) -> pd.DataFrame:
    names = sorted(tbl.schema.names)
    # duplicate column names would silently compare one column's data
    # twice through the by-name dict and drop the other — and the
    # column-list equality assert in compare() can't see it (both
    # sides would list the same names). Refuse up front.
    assert len(set(names)) == len(names), f"duplicate column names: {names}"
    by_name = {name: [_cell(v) for v in tbl.column(i).to_pylist()]
               for i, name in enumerate(tbl.schema.names)}
    # row sort at the PYTHON level, not pandas sort_values: pandas'
    # multi-key object sort goes through factorize, which is not a
    # total order on strings containing NUL bytes — two frames holding
    # the IDENTICAL multiset sorted into different orders (found by
    # fuzz seed 60007, a '\x00' event_type vs ''). Tuple sort over
    # canonical cell strings is total and deterministic.
    rows = sorted(zip(*[by_name[n] for n in names])) if names else []
    return pd.DataFrame(rows, columns=names, dtype=object)


def compare(spark_df, duck_rel) -> None:
    got = _canon(spark_df.toArrow())
    want = _canon(duck_rel.arrow())
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
