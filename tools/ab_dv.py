"""A/B: scattered-key DELETE through deletion vectors vs copy-on-write.

The m21 claim quantified: on a hash-keyed table every file contains a
few of any scattered delete batch's keys, so CoW rewrites ~every file
to remove a fraction of a percent of rows, while the DV path writes
only sidecar metadata.  Grid over delete-batch size K:

* wall seconds per path,
* files rewritten / data bytes written per path,
* post-delete full-read wall (the DV read-side anti-join cost),
* read wall after compact() materializes (the recovery knob).

Deterministic staging (md5 keys, every-Nth delete sets, no RNG).
Usage: python tools/ab_dv.py [rows] [files]   (defaults 200000, 24)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for n in files:
            if n.endswith(".parquet"):
                try:
                    total += os.path.getsize(os.path.join(root, n))
                except FileNotFoundError:
                    pass
    return total


def main() -> int:
    from pyspark.sql import functions as F

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.session import get_spark
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import CowTable

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    nfiles = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = get_spark(app_name="ab_dv", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(rows).select(
        F.md5(F.col("id").cast("string")).alias("k"),
        F.col("id").alias("n"),
        F.md5((F.col("id") * 7).cast("string")).alias("payload"),
    )
    out = []
    for kdel in (100, 1_000, 10_000):
        step = rows // kdel
        res = {"k_deleted": kdel, "rows": rows, "files": nfiles}
        for mode in ("dv", "cow"):
            work = tempfile.mkdtemp(prefix=f"abdv_{mode}_{kdel}_")
            t = CowTable.create(
                spark, f"{work}/t", base.repartition(nfiles)
            )
            keys = [
                r["k"]
                for r in base.filter(F.col("n") % step == 0).select("k").collect()
            ]
            bytes_before = _dir_bytes(os.path.join(t.path, "data"))
            t0 = time.time()
            doc = t.delete("k", values=keys, mode=mode)
            wall = time.time() - t0
            bytes_written = _dir_bytes(os.path.join(t.path, "data")) - bytes_before
            t0 = time.time()
            live = t.read().count()
            read_wall = time.time() - t0
            res[mode] = {
                "wall_s": round(wall, 3),
                "files_rewritten": doc.get("files_rewritten", 0),
                "files_written": doc.get("files_written", 0),
                "data_bytes_written": bytes_written,
                "post_read_wall_s": round(read_wall, 3),
                "rows_after": live,
            }
            if mode == "dv":
                t0 = time.time()
                cd = t.compact(target_rows=rows)  # materialize only
                res[mode]["compact_wall_s"] = round(time.time() - t0, 3)
                res[mode]["dv_materialized"] = cd.get("dv_materialized", 0)
                t0 = time.time()
                t.read().count()
                res[mode]["post_compact_read_wall_s"] = round(
                    time.time() - t0, 3
                )
            import shutil

            shutil.rmtree(work, ignore_errors=True)
        assert res["dv"]["rows_after"] == res["cow"]["rows_after"]
        out.append(res)
        print(json.dumps(res))
    print(json.dumps({"grid": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
