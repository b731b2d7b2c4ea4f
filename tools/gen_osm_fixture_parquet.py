"""One-off: parquet-ize the deterministic OSM XML fixture for the
oracle-gated ETL audit query (plans/queries_etl.py).

Generates ~1 MB of gen_osm_xml.py output, reads it through the XML
source, and writes a single sorted parquet file committed to the repo
(tests/fixtures/osm_raw.parquet).  Both the Spark query and the DuckDB
oracle read THIS file, so the ETL semantics (shape_documents cleaning)
are re-derived independently on each side.

Usage: python tools/gen_osm_fixture_parquet.py
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "tests", "fixtures", "osm_raw.parquet")
TARGET_BYTES = 1_000_000


def main() -> None:
    from tools.gen_osm_xml import write_xml

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.session import get_spark
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.osm_xml import (
        read_osm_elements,
    )

    tmp = tempfile.mkdtemp(prefix="osm_fixture_")
    xml_path = os.path.join(tmp, "fixture.osm")
    n = write_xml(xml_path, TARGET_BYTES)
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    raw = read_osm_elements(spark, xml_path)
    out_dir = os.path.join(tmp, "parquet")
    (
        raw.coalesce(1)
        .sortWithinPartitions("doc_type", "_id")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    part = glob.glob(os.path.join(out_dir, "part-*.parquet"))[0]
    shutil.copy(part, OUT)
    print(f"{xml_path}: {n} XML bytes -> {OUT}: {os.path.getsize(OUT)} bytes")
    print(f"rows: {raw.count()}")
    spark.stop()
    shutil.rmtree(tmp)


if __name__ == "__main__":
    main()
