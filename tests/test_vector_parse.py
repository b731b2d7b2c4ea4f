"""The vectorized XML fast path (_vector_batches) vs the expat parser.

Contract: where the fast path ENGAGES its rows are exactly expat's;
where the input is outside its proven grammar it returns None and the
caller falls back -- so every bail-out case here asserts `None`, never
a wrong answer.  (The Spark-level split/iterparse differential tests
in test_osm_pipeline.py exercise the same path through mapInArrow.)
"""

from __future__ import annotations

import glob
import os

import pytest

from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.osm_xml import (
    _expat_batches,
    _vector_batches,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "sample.osm")


def _expat_rows(data: bytes, wrap: bool):
    def feed():
        if wrap:
            yield b"<osm>"
        yield data
        if wrap:
            yield b"</osm>"

    out = []
    for rb in _expat_batches(feed(), 100_000):
        out.extend(rb.to_pylist())
    return out


def _vec_rows(data: bytes):
    bs = _vector_batches(data, 100_000)
    if bs is None:
        return None
    out = []
    for rb in bs:
        out.extend(rb.to_pylist())
    return out


def test_fixture_engages_and_matches():
    data = open(FIXTURE, "rb").read()
    v = _vec_rows(data)
    assert v is not None, "fast path must engage on the canonical fixture"
    assert v == _expat_rows(data, wrap=False)


@pytest.mark.parametrize(
    "name,data",
    [
        (
            "entities",
            b'<osm>\n<node id="1" lat="1.0" lon="2.0" user="a&amp;b &lt;x&gt;">\n'
            b'<tag k="name" v="A &amp; B &quot;q&quot; &apos;s&apos;"/>\n</node>\n'
            b'<node id="2" lat="3" lon="4" user="&amp;amp;lt;"/>\n</osm>',
        ),
        (
            "missing attrs + way",
            b'<osm>\n<node id="5"/>\n<way id="6">\n<nd ref="5"/>\n</way>\n</osm>',
        ),
        (
            "tab normalized to space in value",
            b'<osm>\n<node id="1" lat="1" lon="2" user="a\tb"/>\n</osm>',
        ),
        (
            "relation with empty role",
            b'<osm>\n<relation id="9" version="2">\n'
            b'<member type="node" ref="5" role="r"/>\n'
            b'<member type="way" ref="6" role=""/>\n'
            b'<tag k="type" v="route"/>\n</relation>\n</osm>',
        ),
        (
            "raw slice, no root, no trailing newline",
            b'<node id="1" lat="3.5" lon="-2.25" user="u"/>\n'
            b'<node id="2" lat="4" lon="5"/>',
        ),
        (
            "value containing raw > and attr-order shuffle",
            b'<osm>\n<node lat="1" id="1" lon="2">\n'
            b'<tag k="note" v="a > b"/>\n</node>\n</osm>',
        ),
    ],
)
def test_engaged_cases_match_expat(name, data):
    v = _vec_rows(data)
    assert v is not None, name
    wrap = not data.lstrip().startswith(b"<osm")
    assert v == _expat_rows(data, wrap=wrap), name


@pytest.mark.parametrize(
    "name,data",
    [
        ("numeric entity", b'<osm>\n<node id="1" lat="1" lon="2" user="&#65;"/>\n</osm>'),
        (
            "two tags one line",
            b'<osm>\n<node id="1" lat="1" lon="2"><tag k="a" v="b"/></node>\n</osm>',
        ),
        ("single-quoted attrs", b"<osm>\n<node id='1' lat='1' lon='2'/>\n</osm>"),
        ("comment", b'<osm>\n<!-- hi -->\n<node id="1" lat="1" lon="2"/>\n</osm>'),
        ("cdata", b'<osm>\n<![CDATA[x]]>\n<node id="1" lat="1" lon="2"/>\n</osm>'),
        (
            "multi-line tag",
            b'<osm>\n<node id="1"\n lat="1" lon="2"/>\n</osm>',
        ),
        ("garbage lat", b'<osm>\n<node id="1" lat="abc" lon="2"/>\n</osm>'),
        ("unknown element", b'<osm>\n<weird a="1"/>\n</osm>'),
        (
            # The round-9 ADVICE repro: an earlier value ending in
            # ' id=' made independent first-match extraction return
            # _id=' id=' instead of '2'.  '=' inside a value now fails
            # _FASTPATH_TAG_RE -> expat owns the slice.
            "equals inside a value",
            b'<osm>\n<node user="x id=" id="2" lat="1" lon="2"/>\n</osm>',
        ),
        (
            "undefined entity",
            b'<osm>\n<node id="1" lat="1" lon="2" user="&foo;"/>\n</osm>',
        ),
        ("raw ampersand", b'<osm>\n<node id="1" lat="1" lon="2" user="a&b"/>\n</osm>'),
        (
            "duplicate attribute",
            b'<osm>\n<node id="1" id="2" lat="1" lon="2"/>\n</osm>',
        ),
        (
            # '<osmium' must not ride the '<osm' skip prefix.
            "osm-prefixed element name",
            b'<osm>\n<osmium a="1"/>\n<node id="1" lat="1" lon="2"/>\n</osm>',
        ),
        (
            # Round-10 ADVICE: '?' may only close a '<?...' declaration.
            # A grammar with independent '[/?]?' at both ends accepted
            # this malformed line that expat rejects loudly.
            "element closed with '?>'",
            b'<osm>\n<node id="1" lat="1" lon="2"?>\n</osm>',
        ),
        (
            # Round-10 ADVICE: close tags carry no attributes; the old
            # grammar matched this and silently SKIPPED it ('/node' is
            # a skip name) where expat raises.
            "close tag with attributes",
            b'<osm>\n<node id="1" lat="1" lon="2"/>\n</node id="1">\n</osm>',
        ),
        (
            "declaration closed without '?'",
            b'<?xml version="1.0">\n<osm>\n<node id="1" lat="1" lon="2"/>\n</osm>',
        ),
    ],
)
def test_unprovable_cases_fall_back(name, data):
    assert _vector_batches(data, 100_000) is None, name


def test_equals_in_value_matches_expat_via_fallback():
    """End-to-end through _parse_slice: the corrupting input must now
    produce expat's exact answer (id='2'), not ' id='."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.osm_xml import (
        _parse_slice,
    )

    data = b'<node user="x id=" id="2" lat="1" lon="2"/>'
    rows = []
    for rb in _parse_slice(data, 100_000, 1 << 20, wrap=True):
        rows.extend(rb.to_pylist())
    assert [r["_id"] for r in rows] == ["2"]
    assert rows[0]["created"]["user"] == "x id="


def test_property_fastpath_matches_or_bails():
    """Hypothesis differential: for ARBITRARY generated OSM-ish XML --
    including '=' inside values (the round-9 silent-corruption input),
    entities, tabs, unknown attrs, duplicate attrs, odd spacing, and
    multi-line layouts -- the fast path either bails (None) or
    produces exactly expat's rows.  Inputs that make expat itself
    raise (e.g. duplicate attributes) additionally require the fast
    path NOT to silently succeed."""
    import xml.parsers.expat

    from hypothesis import given, settings
    from hypothesis import strategies as st

    name_st = st.sampled_from(["name", "amenity", "note", "x-odd", "id"])
    # Values probe every extraction hazard: '=' tails, attr-lookalike
    # tails, entities, tabs, '>'/quotes-adjacent text.
    value_st = st.sampled_from(
        ["v", "", "a b", "x id=", " id=", 'q id="9', "a&amp;b", "&lt;x&gt;",
         "a\tb", "a > b", "it&apos;s", "5", "ref=", "lat="]
    )
    attr_st = st.tuples(name_st, value_st)

    @st.composite
    def element_st(draw):
        kind = draw(st.sampled_from(["node", "way", "relation"]))
        i = draw(st.integers(0, 99))
        attrs = [("id", str(i))]
        if kind == "node":
            attrs += [("lat", "1.5"), ("lon", "-2.25")]
        if draw(st.booleans()):
            attrs.append(("user", draw(value_st)))
        if draw(st.booleans()):  # duplicate attribute (invalid XML)
            attrs.append(("id", str(i + 1)))
        sep = draw(st.sampled_from([" ", "  ", "\t"]))
        hdr = f"<{kind}" + "".join(f'{sep}{k}="{v}"' for k, v in attrs)
        children = []
        for _ in range(draw(st.integers(0, 2))):
            tk, tv = draw(attr_st), draw(value_st)
            children.append(f'<tag k="{tk[0]}" v="{tv}"/>')
        if kind == "way":
            children.append(f'<nd ref="{i}"/>')
        if children:
            body = draw(st.sampled_from(["\n", "\n  "])).join(children)
            return f"{hdr}>\n{body}\n</{kind}>"
        return hdr + "/>"

    @given(st.lists(element_st(), min_size=1, max_size=4))
    @settings(max_examples=120, deadline=None)
    def check(elems):
        data = ("<osm>\n" + "\n".join(elems) + "\n</osm>").encode()
        try:
            expat_rows = _expat_rows(data, wrap=False)
            expat_err = None
        except xml.parsers.expat.ExpatError as e:
            expat_rows, expat_err = None, e
        v = _vec_rows(data)
        if expat_err is not None:
            # expat fails the job loudly; the fast path must not
            # silently produce rows for the same bytes.
            assert v is None
        elif v is not None:
            assert v == expat_rows

    check()


def test_bench_shards_engage_and_match_when_present():
    """When the ETL bench shards exist locally, the fast path must both
    engage and agree with expat at real-data scale."""
    shards = sorted(glob.glob("/tmp/prof_xml_shards/*"))
    if not shards:
        pytest.skip("bench shards not generated in this environment")
    data = open(shards[0], "rb").read()
    v = _vec_rows(data)
    assert v is not None
    assert v == _expat_rows(data, wrap=False)
