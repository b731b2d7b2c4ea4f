"""Profile the dd17-shaped LSH-store ingest lifecycle (r19, VERDICT
r18 next #4): per-step wall / Spark job count / job call sites /
process CPU, to find the next fixed per-commit job in the append path.

Usage:  python tools/prof_ingest_r19.py [n_reps]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_wrangling_osm_xml_with_python_into_mongodb_spark.operators.lsh_store import (  # noqa: E402
    LshBucketStore,
)
from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans.queries_dedup import (  # noqa: E402
    PAIR_DF_CAP,
    _bands_of,
    _dd15_batches,
)
from data_wrangling_osm_xml_with_python_into_mongodb_spark.session import (  # noqa: E402
    get_spark,
)


def _cpu() -> float:
    hz = os.sysconf("SC_CLK_TCK")
    a = resource.getrusage(resource.RUSAGE_SELF)
    b = resource.getrusage(resource.RUSAGE_CHILDREN)
    total = a.ru_utime + a.ru_stime + b.ru_utime + b.ru_stime
    for n in os.listdir("/proc"):
        if not n.isdigit():
            continue
        try:
            with open(f"/proc/{n}/stat") as f:
                parts = f.read().rsplit(")", 1)
            if "java" not in parts[0]:
                continue
            fields = parts[1].split()
            total += (int(fields[11]) + int(fields[12])) / hz
        except (OSError, IndexError):
            continue
    return total


def main() -> int:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="prof_ingest_r19")
    sc = spark.sparkContext
    st = sc.statusTracker()

    def jobs():
        return set(st.getJobIdsForGroup(None))

    def names(new):
        out = []
        for jid in sorted(new):
            ji = st.getJobInfo(jid)
            ns = []
            if ji is not None:
                for sid in ji.stageIds:
                    si = st.getStageInfo(sid)
                    if si is not None:
                        ns.append(si.name.split("\n")[0][-46:])
            out.append(f"j{jid}: " + " | ".join(ns))
        return out

    reps = []
    for rep in range(n_reps):
        work = tempfile.mkdtemp(prefix=f"prof_ing_{rep}_")
        store = LshBucketStore(spark, f"{work}/lsh_idx")
        out: dict = {}
        for t, batch in enumerate(_dd15_batches(spark, sf_dir, 7)):
            if t == 2:
                j0, c0, t0 = jobs(), _cpu(), time.time()
                store.fold()
                new = jobs() - j0
                out["fold"] = {
                    "wall": round(time.time() - t0, 3),
                    "jobs": len(new),
                    "cpu": round(_cpu() - c0, 2),
                    "names": names(new) if rep == 0 else None,
                }
            j0, c0, t0 = jobs(), _cpu(), time.time()
            status_df, ev = store.ingest(_bands_of(batch), t, PAIR_DF_CAP)
            n_rows = status_df.count()
            new = jobs() - j0
            out[f"ingest{t}"] = {
                "wall": round(time.time() - t0, 3),
                "jobs": len(new),
                "cpu": round(_cpu() - c0, 2),
                "rows": n_rows,
                "names": names(new) if rep == 0 else None,
            }
        reps.append(out)
        import shutil

        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
