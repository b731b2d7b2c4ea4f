"""dd2 drift attribution (VERDICT r11 #7): is the round-over-round
dd2_ngram_jaccard_pairs delta (cohort 1.78 -> 2.10 s at sf0.1) code or
environment?

The code half is settled by construction: ``git diff d234319..HEAD``
over queries_dedup.py, functions/, operators/skew.py and session.py is
EMPTY -- no commit between the r10 and r11 bench cohorts touched any
line dd2 executes, so the binary being timed is identical.  What
remains is quantifying the environment: this tool runs dd2 and a
sentinel query (tpch_q1, also untouched) round-robin in ONE session,
so both see the same minutes of the same sandbox.  If the sandbox is
slow, BOTH move together (the dd2/sentinel ratio holds); a genuine
dd2-specific regression would move the ratio.  Process-CPU per pass
rides along (the round-9 noise adjudicator: wall swings 2-10x on this
sandbox, CPU holds to ~8%).

Usage: python tools/ab_dd2.py [rounds=8]
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _cpu() -> float:
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
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as ent
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.session import get_spark

    spark = get_spark(app_name="ab_dd2")
    qs = ent.queries()
    pair = [("dd2", "dd2_ngram_jaccard_pairs"), ("q1", "tpch_q1_pricing_summary")]
    # warm both (worker pool + Arrow init + codegen)
    for _, name in pair:
        qs[name](spark, sf_dir).count()

    walls: dict[str, list[float]] = {"dd2": [], "q1": []}
    cpus: dict[str, list[float]] = {"dd2": [], "q1": []}
    for r in range(rounds):
        for tag, name in pair:
            c0 = _cpu()
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            walls[tag].append(round(time.time() - t0, 3))
            cpus[tag].append(round(_cpu() - c0, 1))
        print(
            f"# round {r}: dd2 {walls['dd2'][-1]}s/{cpus['dd2'][-1]}cpu  "
            f"q1 {walls['q1'][-1]}s/{cpus['q1'][-1]}cpu",
            file=sys.stderr,
        )
    spark.stop()

    out = {
        "rounds": rounds,
        "sf_dir": sf_dir,
        "dd2_walls": walls["dd2"],
        "q1_walls": walls["q1"],
        "dd2_cpus": cpus["dd2"],
        "q1_cpus": cpus["q1"],
        "dd2_median": statistics.median(walls["dd2"]),
        "q1_median": statistics.median(walls["q1"]),
        "ratio_median": round(
            statistics.median(
                [d / q for d, q in zip(walls["dd2"], walls["q1"])]
            ),
            2,
        ),
        "dd2_cpu_median": statistics.median(cpus["dd2"]),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
