"""Dump .explain("formatted") for named queries to files.

Usage: python tools/dump_plans.py --dir plans/r12 --suffix _after q1 q2 ...
Writes <dir>/<query><suffix>.txt for each query.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from etl_based_real_time_air_quality_monitoring_system_spark.session import get_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--dir", required=True)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(args.dir, exist_ok=True)
    spark = get_session("dump-plans")
    qs = entrymod.queries()
    for name in args.names:
        df = qs[name](spark, sf_dir)
        # public API capture (r12 advisor): df.explain prints to stdout;
        # the private _jdf/_jvm seam breaks across versions and under
        # Spark Connect
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        out = os.path.join(args.dir, f"{name}{args.suffix}.txt")
        with open(out, "w") as fh:
            fh.write(plan)
        print("wrote", out, f"({len(plan)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
