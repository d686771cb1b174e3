"""Golden-fixture ingest tests (SURVEY.md §5.2): the XML source must produce
exactly the rows the reference's parser would have inserted
(ref changesetmd.py:78-125), covering tags present/absent, multi-comment
discussion, anonymous user, open changeset, out-of-range latitudes and
bbox-less changesets."""

from __future__ import annotations

import datetime
import os
from decimal import Decimal

from changesetmd_spark.sources import (
    CHANGESET_SCHEMA,
    comments_table,
    normalize_changesets,
    parse_changeset_xml_strings,
    read_changeset_xml,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "changesets_golden.xml")


def _golden(spark):
    return normalize_changesets(read_changeset_xml(spark, FIXTURE))


def test_schema_matches_declaration(spark):
    df = _golden(spark)
    assert [f.name for f in df.schema.fields] == [f.name for f in CHANGESET_SCHEMA.fields]
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in CHANGESET_SCHEMA.fields}
    assert got == want


def test_full_changeset_row(spark):
    row = _golden(spark).filter("id = 1001").collect()[0]
    assert row.user_id == 11
    assert row.user_name == "alice"
    assert row.created_at == datetime.datetime(2014, 3, 1, 10, 0, 0)
    assert row.closed_at == datetime.datetime(2014, 3, 1, 10, 5, 0)
    assert row.open is False
    assert row.num_changes == 42
    assert row.min_lat == Decimal("47.1000000")
    assert row.max_lon == Decimal("8.6000000")
    assert row.tags == {"comment": "fixed a building", "created_by": "JOSM/1.5 (7182 en)"}
    assert len(row.comments) == 2
    c2 = row.comments[1]
    assert c2.comment_user_id == 22
    assert c2.comment_user_name == "carol"
    assert c2.comment_date == datetime.datetime(2014, 3, 3, 9, 30, 0)
    assert c2.comment_text.strip() == "second comment, with & escaped entity"


def test_open_changeset_has_null_closed_at(spark):
    row = _golden(spark).filter("id = 1002").collect()[0]
    assert row.open is True
    assert row.closed_at is None
    assert row.comments == []  # no <discussion> → empty list (ref :94)


def test_anonymous_and_bboxless(spark):
    row = _golden(spark).filter("id = 1003").collect()[0]
    # .get(..., None) semantics of ref changesetmd.py:108-113
    assert row.user_id is None and row.user_name is None
    assert row.min_lat is None and row.max_lon is None
    assert row.tags == {}  # no <tag> children → empty map (ref :90)


def test_out_of_range_latitude_preserved_raw(spark):
    # the reference stores raw values and clamps only at query time
    # (ref README.md:78); ingest must not silently alter data
    row = _golden(spark).filter("id = 1004").collect()[0]
    assert row.min_lat == Decimal("-95.5000000")
    assert row.max_lat == Decimal("95.5000000")


def test_comments_child_table(spark):
    ct = comments_table(_golden(spark))
    assert [f.name for f in ct.schema.fields] == [
        "comment_changeset_id",
        "comment_user_id",
        "comment_user_name",
        "comment_date",
        "comment_text",
    ]
    rows = ct.collect()
    assert len(rows) == 2  # only 1001 has a discussion; inner explode
    assert {r.comment_changeset_id for r in rows} == {1001}


def test_from_xml_string_path_matches_file_path(spark):
    xml = (
        '<changeset id="1001" created_at="2014-03-01T10:00:00Z" '
        'closed_at="2014-03-01T10:05:00Z" open="false" user="alice" uid="11" '
        'min_lat="47.1000000" max_lat="47.2000000" min_lon="8.5000000" '
        'max_lon="8.6000000" num_changes="42">'
        '<tag k="comment" v="fixed a building"/>'
        '<tag k="created_by" v="JOSM/1.5 (7182 en)"/>'
        "<discussion>"
        '<comment uid="21" user="bob" date="2014-03-02T09:00:00Z">'
        "<text>looks good</text></comment>"
        '<comment uid="22" user="carol" date="2014-03-03T09:30:00Z">'
        "<text>second comment, with &amp; escaped entity</text></comment>"
        "</discussion></changeset>"
    )
    df = spark.createDataFrame([(xml,)], "xml string")
    got = normalize_changesets(parse_changeset_xml_strings(df, "xml")).collect()[0]
    want = _golden(spark).filter("id = 1001").collect()[0]
    assert got.id == want.id and got.tags == want.tags
    assert [c.comment_user_id for c in got.comments] == [
        c.comment_user_id for c in want.comments
    ]


def test_gz_input_reads_identically(spark, tmp_path):
    import gzip
    import shutil

    gz = tmp_path / "dump.osm.gz"
    with open(FIXTURE, "rb") as src, gzip.open(gz, "wb") as dst:
        shutil.copyfileobj(src, dst)
    df = normalize_changesets(read_changeset_xml(spark, str(gz)))
    assert sorted(r.id for r in df.select("id").collect()) == [1001, 1002, 1003, 1004]


def test_malformed_changeset_does_not_poison_batch(spark, tmp_path):
    """Robustness at scale: a 40 GB dump WILL contain glitches.  PERMISSIVE
    parsing must surface the bad element as a null-id row (filterable /
    quarantinable) while every well-formed sibling ingests normally —
    a single bad record must never fail the distributed job."""
    bad = tmp_path / "mixed.xml"
    bad.write_text(
        "<osm>\n"
        '<changeset id="1" created_at="2024-05-01T00:00:00Z" open="false" num_changes="1"/>\n'
        '<changeset id="not-a-number" created_at="also-not-a-date" open="maybe" num_changes="x"/>\n'
        '<changeset id="3" created_at="2024-05-01T02:00:00Z" open="true" num_changes="3"/>\n'
        "</osm>\n"
    )
    df = normalize_changesets(read_changeset_xml(spark, str(bad)))
    rows = {r.id: r for r in df.collect()}
    assert 1 in rows and 3 in rows  # good siblings unharmed
    assert rows[3].open is True
    bad_rows = [r for r in rows.values() if r.id is None]
    assert len(bad_rows) == 1  # malformed element became a quarantinable row
    assert bad_rows[0].created_at is None and bad_rows[0].open is None


def test_bz2_input_reads_identically(spark, tmp_path):
    # S2: the reference needs the bz2file module for multi-stream dumps
    # (ref changesetmd.py:23-27, 241-246); Hadoop's Bzip2Codec reads them
    # natively AND splittably
    import bz2

    bz = tmp_path / "dump.osm.bz2"
    with open(FIXTURE, "rb") as src:
        bz.write_bytes(bz2.compress(src.read()))
    df = normalize_changesets(read_changeset_xml(spark, str(bz)))
    assert sorted(r.id for r in df.select("id").collect()) == [1001, 1002, 1003, 1004]


def test_multistream_bz2_through_cli_bulk_load(spark, tmp_path, capsys):
    """S2 splittability on a REAL multi-stream file (VERDICT r6 stretch):
    pbzip2/lbzip2 dumps are concatenations of independent bz2 streams —
    the exact layout Hadoop's Bzip2Codec splits on stream boundaries, and
    the case the reference needs the ``bz2file`` module for (ref
    changesetmd.py:23-27).  A golden 2-stream fixture (split mid-document
    at an element boundary, each half its own stream) must bulk-load
    through the CLI end-to-end identically to the plain XML."""
    import bz2

    from changesetmd_spark.cli import main

    text = open(FIXTURE, "rb").read()
    cut = text.index(b"<changeset", text.index(b"<changeset") + 1)
    assert 0 < cut < len(text)  # split inside the document, between elements
    bz = tmp_path / "multistream.osm.bz2"
    bz.write_bytes(bz2.compress(text[:cut]) + bz2.compress(text[cut:]))
    # sanity: the file really is two concatenated streams
    assert bz.read_bytes().count(b"BZh9\x31\x41\x59\x26\x53\x59") == 2

    plain_store = str(tmp_path / "store_plain")
    multi_store = str(tmp_path / "store_multi")
    assert main(["-s", plain_store, "-c", "-f", FIXTURE]) == 0
    assert main(["-s", multi_store, "-c", "-f", str(bz)]) == 0
    out = capsys.readouterr().out
    assert out.count("loaded 4") == 2

    plain = spark.read.parquet(os.path.join(plain_store, "changesets"))
    multi = spark.read.parquet(os.path.join(multi_store, "changesets"))
    key = lambda r: r["id"]  # noqa: E731
    assert sorted(plain.collect(), key=key) == sorted(
        multi.collect(), key=key
    )
