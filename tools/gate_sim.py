"""Exact driver-gate simulation as one command.

The driver runs the contract on a VANILLA SparkSession (default confs
— not ``session.get_session``) and samples the first ~50
``queries()`` entries.  This script reproduces that environment so
tuned-session-conf dependence is caught before the driver does:

    python tools/gate_sim.py                # first 50, sf0.01
    python tools/gate_sim.py 80             # first 80
    python tools/gate_sim.py 50 /root/testdata/sf0.001

Also smoke-runs ``entry()`` twice (prepare() idempotence).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import tools.oracle_check as oc

    oc.get_session = lambda name=None: spark

    import __spark_entry__ as m

    rows = m.entry(spark).count()
    assert rows > 0, "entry() must produce rows"
    assert m.entry(spark).count() == rows, "entry() must be re-runnable"
    print(f"entry rows: {rows} (re-run identical)")
    return oc.run_one(sf, list(m.queries())[:n])


if __name__ == "__main__":
    raise SystemExit(main())
