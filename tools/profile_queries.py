"""Per-query optimization profiler (r12).

For each named query, measures in ONE session:

- build_s: queries()[name](spark, sf_dir) wall time (plan construction,
  plus any documented build-time work: BPE learn collects, GEMM corpus
  collect, streaming gate execution)
- cold_s:  first noop-write action (codegen + execution)
- warm_s:  min of N further noop-write actions on the SAME DataFrame
  (codegen cached -> approximates pure execution)

cold_s - warm_s is the per-query planning/codegen overhead; warm_s is
the distributed work.  The bench's in-suite numbers are cold, so both
components count against the driver metric; the split tells you which
lever (plan complexity vs execution shape) matters for each query.

Usage: python tools/profile_queries.py [--warm N] [--out FILE] q1 q2 ...
       (no names -> the full HEADLINE list from bench.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
import bench
from etl_based_real_time_air_quality_monitoring_system_spark.session import get_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--warm", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("profile")
    qs = entrymod.queries()
    names = args.names or [n for n in bench.HEADLINE if n in qs]
    if not names:
        sys.exit("profile_queries: no queries to profile")

    # prime file listing + JVM the same way bench.py does
    qs[names[0]](spark, sf_dir).write.format("noop").mode("overwrite").save()

    rows = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        warms = []
        for _ in range(args.warm):
            w0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            warms.append(time.perf_counter() - w0)
        rows[name] = {
            "build_s": round(t1 - t0, 3),
            "cold_s": round(t2 - t1, 3),
            "warm_s": round(min(warms), 3) if warms else None,
        }
        r = rows[name]
        print(
            f"{name:32s} build {r['build_s']:7.3f}  cold {r['cold_s']:7.3f}"
            f"  warm {r['warm_s']:7.3f}",
            file=sys.stderr,
        )
    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "queries": rows}, fh, indent=1)
    print(json.dumps({n: rows[n] for n in names}))
    spark.stop()


if __name__ == "__main__":
    main()
