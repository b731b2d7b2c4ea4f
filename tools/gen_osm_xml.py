"""Deterministic OSM XML generator for ETL throughput benchmarking.

Emits an OSM-shaped XML file of approximately the requested size by
cycling through node/way/relation templates with varied ids, tags, and
cleaning triggers (phones, street abbreviations, semicolon lists,
subdivided keys) so the ETL pipeline exercises its full expression
tree, not a trivial passthrough.

Usage: python tools/gen_osm_xml.py <out_path> <target_mb>
"""

from __future__ import annotations

import sys

STREETS = ["Ellis St.", "Guide Meridian", "Cornwall Ave", "Holly St", "Meadowbrook Count"]
AMENITIES = ["cafe", "restaurant", "fuel", "library", "school;college"]
PHONES = ["(360) 555-%04d ext. 12", "306-398-%04d", "+1-360-555-%04d"]


def write_xml_sharded(
    dir_path: str, target_bytes: int, n_shards: int = 8
) -> int:
    """Write ``n_shards`` files (disjoint id ranges) totalling
    ~target_bytes -- the multi-file layout a real large extract ships
    in, which also gives the (per-file) XML scan its parallelism."""
    import os

    os.makedirs(dir_path, exist_ok=True)
    per = target_bytes // n_shards
    total = 0
    for s in range(n_shards):
        total += write_xml(
            os.path.join(dir_path, f"part-{s:04d}.osm"),
            per,
            id_offset=s * 50_000_000,
        )
    return total


def write_xml(path: str, target_bytes: int, id_offset: int = 0) -> int:
    i = id_offset
    with open(path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n<osm version="0.6">\n')
        written = f.tell()
        while written < target_bytes:
            i += 1
            lat, lon = 48.6 + (i % 1000) / 5000.0, -122.6 + (i % 977) / 5000.0
            f.write(
                f'  <node id="{i}" lat="{lat:.6f}" lon="{lon:.6f}" version="1" '
                f'changeset="{i % 997}" timestamp="2020-01-01T00:00:00Z" '
                f'user="u{i % 311}" uid="{i % 311}">\n'
                f'    <tag k="name" v="Place {i}"/>\n'
                f'    <tag k="amenity" v="{AMENITIES[i % len(AMENITIES)]}"/>\n'
                f'    <tag k="phone" v="{PHONES[i % len(PHONES)] % (i % 10000)}"/>\n'
                f'    <tag k="addr:street" v="{STREETS[i % len(STREETS)]}"/>\n'
                f'    <tag k="addr:postcode" v="9{8 + i % 2}2{i % 10}8"/>\n'
                f'    <tag k="payment:visa" v="{"yes" if i % 2 else "no"}"/>\n'
                f'    <tag k="lanes" v="{i % 6 + 1}"/>\n'
                # Every 17th node repeats the lanes key with a SMALLER
                # value: duplicate tag keys resolve keep-LAST (the
                # reference's dict update), and last < max here, so any
                # max-over-values shortcut breaks the ETL oracle's
                # sum_lanes.
                + (f'    <tag k="lanes" v="1"/>\n' if i % 17 == 0 else "")
                + "  </node>\n"
            )
            if i % 10 == 0:
                nds = "".join(
                    f'    <nd ref="{i - d}"/>\n' for d in range(1, 9)
                )
                f.write(
                    f'  <way id="{10_000_000 + i}" version="1" changeset="1" '
                    f'timestamp="2020-02-01T00:00:00Z" user="w" uid="1">\n'
                    f"{nds}"
                    f'    <tag k="highway" v="residential"/>\n'
                    "  </way>\n"
                )
            if i % 100 == 0:
                f.write(
                    f'  <relation id="20000000{i}" version="1" changeset="1" '
                    f'timestamp="2020-03-01T00:00:00Z" user="r" uid="2">\n'
                    f'    <member type="way" ref="{10_000_000 + i}" role="outer"/>\n'
                    f'    <member type="node" ref="{i}" role=""/>\n'
                    f'    <tag k="type" v="multipolygon"/>\n'
                    "  </relation>\n"
                )
            if i % 1000 == 0:
                written = f.tell()
        f.write("</osm>\n")
        return f.tell()


if __name__ == "__main__":
    out = sys.argv[1]
    mb = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0
    n = write_xml(out, int(mb * 1024 * 1024))
    print(f"{out}: {n} bytes")
