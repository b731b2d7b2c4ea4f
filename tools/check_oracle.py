"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, column
names/order-insensitive schema, and an order-insensitive value hash.

Usage:  python tools/check_oracle.py [--since REF] [sf_dir] [query ...]

``--since REF`` (e.g. ``--since HEAD``, ``--since origin/main``) runs
only the queries whose defining module -- or a package module that
module imports by name -- changed vs REF (committed diff + working
tree).  Iteration mode for a 90+-query registry; the full-registry
transcripts (CHECK_FULL_r{N}.txt) are still cut with no flag at round
end.  The import scan is one level deep by module-name mention, so a
deep transitive change (operator -> helper -> query) can be missed:
when touching shared low-level helpers, run the full gate.
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

REPO = "/root/repo"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    import datetime

    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and ulp noise beyond round(…, 2..6) applied in queries
        return repr(round(v, 9) + 0.0)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def _changed_files(ref: str) -> set[str]:
    """Repo-relative paths changed vs ``ref``: committed diff plus the
    working tree (staged, unstaged, untracked)."""
    import subprocess

    out = subprocess.run(
        ["git", "-C", REPO, "diff", "--name-only", ref],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.splitlines()
    status = subprocess.run(
        ["git", "-C", REPO, "status", "--porcelain"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout.splitlines()
    return {p.strip() for p in out if p.strip()} | {
        ln[3:].strip() for ln in status if ln.strip()
    }


def _changed_queries(qs: dict, ref: str) -> set[str]:
    """Queries whose defining module changed, or whose defining module
    mentions a changed package module by name (one-level import
    heuristic -- see the module docstring caveat)."""
    import os

    changed = _changed_files(ref)
    changed_py = {p for p in changed if p.endswith(".py")}
    # module-name stems of changed package files: "queries_ops", "asof"...
    changed_stems = {
        os.path.splitext(os.path.basename(p))[0]
        for p in changed_py
        if p.startswith("data_wrangling_osm_xml_with_python_into_mongodb_spark/")
    }
    src_cache: dict[str, str] = {}
    selected = set()
    for name, fn in qs.items():
        f = getattr(fn, "__wrapped__", fn).__code__.co_filename
        rel = os.path.relpath(f, REPO)
        if rel in changed_py:
            selected.add(name)
            continue
        if f not in src_cache:
            try:
                with open(f) as fh:
                    src_cache[f] = fh.read()
            except OSError:
                src_cache[f] = ""
        if any(stem in src_cache[f] for stem in changed_stems):
            selected.add(name)
    return selected


def main() -> int:
    import duckdb

    import __spark_entry__ as ent
    from pyspark.sql import SparkSession

    args = sys.argv[1:]
    since = None
    if "--since" in args:
        i = args.index("--since")
        since = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    # Deliberately a VANILLA session (not session.py's tuned builder):
    # the correctness driver constructs its own plain SparkSession, so
    # every queries() callable must be self-sufficient under one.
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "6g")
        # JVM flag only (no SQL conf -- the session stays vanilla):
        # this sandbox SIGSEGVs in HotSpot's AVX-512 arraycopy stubs
        # under load; see session.py for the hs_err details.
        .config("spark.driver.extraJavaOptions", "-XX:UseAVX=2")
        .appName("check_oracle")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = ent.queries(), ent.oracle_sql()
    if since is not None:
        picked = _changed_queries(qs, since)
        only = (only & picked) if only else picked
        print(f"# --since {since}: {len(picked)}/{len(qs)} queries selected")
        if not only:
            print("# nothing changed; full transcripts still need a no-flag run")
            return 0
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            # Emulate the driver's pandas canonicalizer: it sort_values()
            # over every column, which raises on unhashable cells (lists/
            # dicts).  Catch that here so it fails locally, not per-round.
            import pandas as pd

            pd.DataFrame(srows, columns=scols).sort_values(by=list(scols))
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if not problems:
            sh, dh = value_hash(scols, srows), value_hash(dcols, drows)
            if sh != dh:
                problems.append(f"hash spark={sh} duck={dh}")
                pairs = list(zip(sorted(map(str, srows)), sorted(map(str, drows))))
                for a, b in pairs[:40]:
                    if a != b:
                        problems.append(f"  first diff:\n  S={a}\n  D={b}")
                        break
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"PASS {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
