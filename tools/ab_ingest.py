"""A/B/C the XML ingest parsers in ONE session on the same shards.

VERDICT r5 flagged a recorded ingest drop (99.6 -> 40.4 MB/s) that
coincided with making the split reader materialize_raw's default.  The
sandbox also swings 2x between rounds, so only an in-session A/B on
identical input can attribute the delta.  This times
``materialize_raw`` (parse + bucketed bronze write) under each parser,
interleaved round-robin so a mid-run environment shift hits all three
equally, and prints min/spread per parser.

Usage: python tools/ab_ingest.py [target_mb] [n_shards] [n_passes]
"""

from __future__ import annotations

import contextlib
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
    target_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 77.0
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_passes = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from tools.gen_osm_xml import write_xml_sharded
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.session import get_spark
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.osm_xml import materialize_raw

    spark = get_spark(app_name="ab_ingest")
    workdir = tempfile.mkdtemp(prefix="ab_ingest_")
    parsers = ["split", "iterparse", "xml"]
    try:
        xml_path = f"{workdir}/shards"
        n_bytes = write_xml_sharded(xml_path, int(target_mb * 1024 * 1024), n_shards)
        mb = n_bytes / 1024 / 1024
        print(f"# input: {mb:.1f} MB in {n_shards} shards", file=sys.stderr)

        times: dict[str, list[float]] = {p: [] for p in parsers}
        rows: dict[str, int] = {}
        for pass_i in range(n_passes):
            for p in parsers:  # scenario A: 32 shards
                t0 = time.time()
                bronze = materialize_raw(
                    spark,
                    xml_path,
                    f"{workdir}/bronze_{p}",
                    table=f"ab_bronze_{p}",
                    parser=p,
                )
                n = bronze.count()
                dt = time.time() - t0
                times[p].append(dt)
                rows[p] = n
                print(f"# pass{pass_i} {p}: {dt:.2f}s ({n} rows)", file=sys.stderr)

        assert len(set(rows.values())) == 1, f"row counts differ: {rows}"
        out = {
            p: {
                "min_s": round(min(ts), 2),
                "spread_s": round(max(ts) - min(ts), 2),
                "mb_per_s_at_min": round(mb / min(ts), 2),
            }
            for p, ts in times.items()
        }

        # Scenario B: ONE huge file -- the layout the split reader
        # exists for.  File-granular parse serializes on a single task;
        # the range path fans it out across the cluster.  4 MB splits
        # stand in for 128 MB ones at bench scale.
        one_file = f"{workdir}/one_file"
        write_xml_sharded(one_file, int(target_mb * 1024 * 1024), 1)
        times_b: dict[str, list[float]] = {"split4mb": [], "iterparse": []}
        for pass_i in range(n_passes):
            for p, kw in (
                ("split4mb", {"parser": "split", "split_bytes": 4 << 20}),
                ("iterparse", {"parser": "iterparse"}),
            ):
                t0 = time.time()
                bronze = materialize_raw(
                    spark, one_file, f"{workdir}/bronze1_{p}", table=f"ab1_{p}", **kw
                )
                n = bronze.count()
                dt = time.time() - t0
                times_b[p].append(dt)
                print(f"# one-file pass{pass_i} {p}: {dt:.2f}s ({n} rows)", file=sys.stderr)
        out["one_file"] = {
            p: {"min_s": round(min(ts), 2), "mb_per_s_at_min": round(mb / min(ts), 2)}
            for p, ts in times_b.items()
        }
        print(json.dumps(out, indent=2))
    finally:
        with contextlib.suppress(Exception):
            for p in parsers:  # scenario A: 32 shards
                spark.sql(f"DROP TABLE IF EXISTS ab_bronze_{p}")
                spark.sql(f"DROP TABLE IF EXISTS ab1_split4mb")
                spark.sql(f"DROP TABLE IF EXISTS ab1_iterparse")
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
