"""Quick min-of-N timer for named registry queries at a given sf dir,
using the bench's methodology (same session config, count() action).

Usage: python tools/time_queries.py [-n passes] <query ...>
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    import __spark_entry__ as ent
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.session import get_spark

    args = sys.argv[1:]
    n_passes = 5
    if args and args[0] == "-n":
        n_passes = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time_queries")
    qs = ent.queries()
    # warm-up like bench
    qs["a3_orders_by_status"](spark, sf_dir).collect()
    for name in args:
        times = []
        for p in range(n_passes):
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            times.append(round(time.time() - t0, 3))
        print(f"{name}: min={min(times)} all={times} rows={n}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
