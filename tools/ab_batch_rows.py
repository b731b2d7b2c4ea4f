"""A/B the ingest's Arrow batch size against the CPU instrument.

VERDICT r10 #4: ~10 CPU-s/pass of Python sits in pyspark worker serde
around the parse.  Hypothesis: larger Arrow batches out of
_vector_batches/_expat_batches (fewer IPC roundtrips through the
worker socket) cut that slice.  This interleaves ingest passes at
several ``batch_rows`` values round-robin in one session on identical
shards (the ab_ingest.py protocol: a mid-run environment shift hits
every variant equally) and reports min wall + min java+python CPU per
variant.  ``spark.sql.execution.arrow.maxRecordsPerBatch`` is NOT
varied: it only shapes JVM->Python input conversion, and the parse's
input is the tiny split-plan frame (rows = number of byte ranges).

Usage: python tools/ab_batch_rows.py [target_mb] [n_shards] [n_passes]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _jvm_py_cpu() -> float:
    hz = os.sysconf("SC_CLK_TCK")
    total = 0.0
    for st in glob.glob("/proc/[0-9]*/stat"):
        try:
            raw = open(st).read()
            comm = raw.split("(", 1)[1].rsplit(")", 1)[0]
            if comm == "java" or comm.startswith("python"):
                parts = raw.rsplit(") ", 1)[1].split()
                total += (int(parts[11]) + int(parts[12])) / hz
        except OSError:
            continue
    return total


def main() -> int:
    target_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 77.0
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_passes = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    variants = [5_000, 50_000, 500_000]

    from tools.gen_osm_xml import write_xml_sharded
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.session import get_spark
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.osm_xml import (
        materialize_raw,
    )

    spark = get_spark(app_name="ab_batch_rows")
    workdir = tempfile.mkdtemp(prefix="ab_batch_rows_")
    try:
        xml_path = f"{workdir}/shards"
        n_bytes = write_xml_sharded(
            xml_path, int(target_mb * 1024 * 1024), n_shards
        )
        mb = n_bytes / 1024 / 1024
        print(f"# input: {mb:.1f} MB in {n_shards} shards", file=sys.stderr)

        walls: dict[int, list[float]] = {v: [] for v in variants}
        cpus: dict[int, list[float]] = {v: [] for v in variants}
        rows: dict[int, int] = {}
        for pass_i in range(n_passes):
            for v in variants:
                c0 = _jvm_py_cpu()
                t0 = time.time()
                bronze = materialize_raw(
                    spark,
                    xml_path,
                    f"{workdir}/bronze_{v}",
                    table=f"ab_bronze_{v}",
                    batch_rows=v,
                )
                n = bronze.count()
                dt = time.time() - t0
                dc = _jvm_py_cpu() - c0
                walls[v].append(dt)
                cpus[v].append(dc)
                rows[v] = n
                print(
                    f"# pass{pass_i} batch_rows={v}: {dt:.2f}s wall, "
                    f"{dc:.1f}s cpu ({n} rows)",
                    file=sys.stderr,
                )
        assert len(set(rows.values())) == 1, rows  # same parse either way
        out = {
            str(v): {
                "wall_min_s": round(min(walls[v]), 2),
                "wall_all": [round(x, 2) for x in walls[v]],
                "cpu_min_s": round(min(cpus[v]), 1),
                "cpu_all": [round(x, 1) for x in cpus[v]],
                "mb_per_s": round(mb / min(walls[v]), 1),
            }
            for v in variants
        }
        print(json.dumps(out))
        return 0
    finally:
        for v in variants:
            try:
                spark.sql(f"DROP TABLE IF EXISTS ab_bronze_{v}")
            except Exception:
                pass
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
