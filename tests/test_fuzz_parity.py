"""One deterministic trial of the seeded fuzz sweep as a regression net.

scripts/fuzz_parity.py samples random fixture shapes (the driver
regenerates every fixture between rounds, so this is the
round-boundary threat model). Seed 60001 is pinned here because it
exposed two real gate risks at round-6 close: a zero-norm vector
landing in an LSH bucket ANSI-crashed the pure-Catalyst cosine
(vectors.py now try_divides, mirroring duck's natively-NULL double
division), and multibyte names diverged byte-based duck levenshtein
from codepoint-based Spark (text_editdist now pins the byte level).
The NULLS FIRST pin on window_analytic's nullable date key came from
the same sweep. Re-running the seed keeps all three fixed classes
fixed; deeper exploration stays in the script (more trials, any seed).
"""

from __future__ import annotations

import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from fuzz_parity import gen_tables  # noqa: E402

SEED = 60001


@pytest.fixture(scope="module")
def fuzz_dir(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp(f"fuzz_{SEED}"))
    for name, (rows, schema) in gen_tables(random.Random(SEED)).items():
        (
            spark.createDataFrame(rows, schema)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, f"{name}.parquet"))
        )
    return tmp


@pytest.fixture(scope="module")
def fuzz_duck(fuzz_dir):
    con = duckdb.connect()
    for name in gen_tables(random.Random(SEED)):
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{fuzz_dir}/{name}.parquet/*.parquet')"
        )
    yield con
    con.close()


def _names():
    from etl_work_flow_for_big_data_spark.queries import load_all

    return sorted(load_all())


@pytest.mark.parametrize("name", _names())
def test_fuzz_trial_parity(name, spark, fuzz_dir, fuzz_duck):
    from etl_work_flow_for_big_data_spark.queries import load_all
    from tests.parity import compare

    spec = load_all()[name]
    compare(spec.fn(spark, fuzz_dir), fuzz_duck.sql(spec.oracle))
