"""Time CowTable commit stats-harvest: driver loop vs executor job.

VERDICT r10 #1: _write_data_files read every new file's parquet footer
on the driver, so commit cost scaled with driver round-trips --
fine at 8 files, hostile at the 1e5-file commits a bulk load or full
compaction produces.  The harvest now runs as ONE executor-side Spark
job above _DRIVER_STATS_MAX files (sources/cow_table.py:
_harvest_file_stats); equality with the driver loop is pinned by
pytest (test_stats_harvest_executor_side_matches_driver).  This tool
records the WALL evidence on a many-file table at several file
counts, same files for both paths.

Usage: python tools/ab_stats_harvest.py [n_files ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    counts = [int(a) for a in sys.argv[1:]] or [64, 256, 1024]

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.session import get_spark
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (
        CowTable,
        _file_footer_stats,
    )

    spark = get_spark(app_name="ab_stats_harvest")
    out = {}
    for n in counts:
        work = tempfile.mkdtemp(prefix="ab_harvest_")
        try:
            df = (
                spark.range(n * 100)
                .selectExpr("id AS k", "id * 2 AS v")
                .repartitionByRange(n, "k")
            )
            t = CowTable.create(spark, f"{work}/t", df)
            files = t.files()
            res = {"files": len(files)}
            # warm the page cache so both paths read warm footers
            for f in files:
                _file_footer_stats(f)
            for label, fn in [
                (
                    "driver_s",
                    lambda: {
                        os.path.basename(f): _file_footer_stats(f)
                        for f in files
                    },
                ),
                ("executor_s", lambda: t._harvest_file_stats(files)),
            ]:
                best = 1e9
                for _ in range(3):
                    t0 = time.time()
                    got = fn()
                    best = min(best, time.time() - t0)
                res[label] = round(best, 2)
            assert got == {
                os.path.basename(f): _file_footer_stats(f) for f in files
            }
            out[str(n)] = res
            print(f"# {res}", file=sys.stderr)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
