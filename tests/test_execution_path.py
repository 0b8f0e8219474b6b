"""Execution-path invariance: codegen vs interpreted, vectorized vs
row-based parquet decode.

Spark silently falls back to the interpreted expression evaluator
(method-size/field-count codegen limits, codegen bugs) and to the
row-based parquet reader (complex types, schema-evolution corners) —
at scale, exactly the big plans hit the fallbacks. Results must not
depend on which path ran. scripts/invariance_sweep.py proves all 84
queries on this axis per round; this resident test pins the queries
whose semantics lean hardest on path-sensitive machinery so a
regression is a red test, not a once-a-round script finding:

- rate_charge — decimal/long rounding arithmetic (exact `div` means)
- parse_json — regex anchors + JSON path extraction over strings
- window_tumbling — timestamp bucket division (negative-epoch edges)
- agg_approx_distinct — HLL sketch merge (register-wise max)
- agg_stats — floating aggregates (stddev/percentile numerics)
- mm_decode — Arrow mapInPandas batch boundary (reader-batch shape)
"""

from __future__ import annotations

import pytest

PINNED = ["rate_charge", "parse_json", "window_tumbling",
          "agg_approx_distinct", "agg_stats", "mm_decode"]

INTERPRETED = {
    "spark.sql.codegen.wholeStage": "false",
    "spark.sql.codegen.factoryMode": "NO_CODEGEN",
    "spark.sql.parquet.enableVectorizedReader": "false",
}


@pytest.mark.parametrize("name", PINNED)
def test_interpreted_path_matches_codegen(name, spark, sf_dir):
    from etl_work_flow_for_big_data_spark.queries import load_all
    from tests.parity import _canon

    fn = load_all()[name].fn
    saved = {k: spark.conf.get(k) for k in INTERPRETED}
    codegen = _canon(fn(spark, sf_dir).toArrow())
    try:
        for k, v in INTERPRETED.items():
            spark.conf.set(k, v)
        interpreted = _canon(fn(spark, sf_dir).toArrow())
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert codegen.equals(interpreted), (
        f"{name}: interpreted/row-reader execution diverged from "
        "codegen/vectorized — result depends on the physical path")
