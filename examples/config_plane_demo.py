"""End-to-end demo: the reference's relational config plane.

The reference boots by reading its session topology from Oracle
(M_SESSION / M_LINKED_SESSIONS, ``MFramework.cpp:929-1022``) and wires
queue readers/writers around it. Here the same deployment shape runs
on Spark: the pipeline topology lives in an embedded Derby database
(the jars ship with Spark), is read through the registry's ``jdbc``
source, compiles to one Catalyst plan, and executes over kv-wire
landing files into a routed parquet layout — every piece resolved by
name from a registry.

Run: ``python examples/config_plane_demo.py`` (local[*], ~30 s).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import etl_work_flow_for_big_data_spark.operators.transforms  # noqa: F401
from etl_work_flow_for_big_data_spark.plans.runner import (
    IOBinding,
    run_batch_pipeline,
)
from etl_work_flow_for_big_data_spark.plans.spec import PipelineSpec
from etl_work_flow_for_big_data_spark.session import get_spark
from etl_work_flow_for_big_data_spark.sources.registry import DEFAULT as SOURCES


def main() -> None:
    spark = get_spark("config-plane-demo")
    work = tempfile.mkdtemp(prefix="config_plane_")

    # 1. the config plane: topology rows in a relational database
    url = f"jdbc:derby:{work}/configdb"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    st = conn.createStatement()
    st.executeUpdate(
        'CREATE TABLE "pipeline_spec" ('
        '"session_id" INT, "operator_name" VARCHAR(40), '
        '"session_name" VARCHAR(40), "params" VARCHAR(200), '
        '"next_session_id" INT, "next_component_type" VARCHAR(20))'
    )
    st.executeUpdate(
        'INSERT INTO "pipeline_spec" VALUES '
        "(1, 'parse_packets', 'collector', NULL, 2, NULL), "
        "(2, 'filter_valid', 'validator', '{\"required\": \"s\"}', 3, NULL), "
        "(3, 'route_by', 'router', NULL, NULL, 'rating')"
    )
    conn.close()
    print(f"config plane ready at {url}")

    # 2. landing zone: wire-packet files (what the protocol fetchers
    #    deliver)
    landing = os.path.join(work, "landing")
    os.makedirs(landing)
    with open(os.path.join(landing, "in.cdr"), "w") as f:
        f.write("s=1|t=rating|v=100\ns=2|t=billing|v=50\nt=orphan\n")

    # 3. topology -> spec -> one-call component run
    topo = SOURCES.read(spark, "jdbc", url, dbtable='"pipeline_spec"')
    spec = PipelineSpec.from_dataframe("mediation", topo)
    print("stages:", [s.operator for s in spec.ordered()], "route:", spec.route)

    out_dir = os.path.join(work, "out")
    out = run_batch_pipeline(
        spark,
        spec,
        IOBinding("kv_text", landing),
        IOBinding("parquet", out_dir),
    )
    out.select("s", "t", "route").show()
    print("routed partitions:", sorted(os.listdir(out_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
