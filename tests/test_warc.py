"""WARC source: record walking, gzip members, HTTP payload split,
end-to-end read into the pages schema + extraction."""

import datetime as dt

import pytest

from vlm_ocr_pipeline_spark.sources import warc


TS = dt.datetime(2026, 1, 16, 12, 0, 0)


def _records():
    return [
        {
            "url": "https://a.example.org/1",
            "warc_ts": TS,
            "payload": b"<html><body><main><article><h1>One</h1>"
            b"<p>First page body text for the warc test.</p>"
            b"</article></main></body></html>",
        },
        # a request record the reader must skip
        {
            "url": "https://a.example.org/1",
            "warc_ts": TS,
            "warc_type": "request",
            "payload": b"GET /1 HTTP/1.1\r\nHost: a.example.org",
        },
        {
            "url": "https://a.example.org/2",
            "warc_ts": TS + dt.timedelta(seconds=5),
            # binary payload CONTAINING the record magic — by-length
            # walking must not desynchronize
            "payload": b"\x00\x01WARC/1.0\r\nnot a real header\xff" * 3,
        },
    ]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip_bytes(gz):
    data = warc.build_warc(_records(), gzip_members=gz)
    rows = warc.pages_from_warc_bytes(data)
    assert [r["url"] for r in rows] == [
        "https://a.example.org/1", "https://a.example.org/2",
    ]
    assert rows[0]["warc_ts"] == TS
    assert rows[0]["html"].startswith(b"<html>")
    assert rows[1]["html"] == _records()[2]["payload"]


def test_warc_truncated_archive_yields_prefix():
    data = warc.build_warc(_records())
    rows = warc.pages_from_warc_bytes(data[: len(data) - 40])
    assert [r["url"] for r in rows] == ["https://a.example.org/1"]


def test_read_warc_to_extraction(spark, tmp_path):
    for i, gz in enumerate([False, True]):
        p = tmp_path / f"f{i}.warc" / ""
        (tmp_path / f"f{i}{'.warc.gz' if gz else '.warc'}").write_bytes(
            warc.build_warc(_records(), gzip_members=gz)
        )
    pages = warc.read_warc(spark, str(tmp_path))
    pdf = pages.toPandas()
    assert len(pdf) == 4  # 2 response records x 2 files
    assert set(pdf["url"]) == {
        "https://a.example.org/1", "https://a.example.org/2",
    }
    # the pages flow straight into the extraction pipeline
    from vlm_ocr_pipeline_spark.plans.pipeline import extract

    out = extract(pages).toPandas().set_index("url")
    one = out.loc["https://a.example.org/1"]
    assert (one["rendered_plaintext"] ==
            "[TITLE] One\n\nFirst page body text for the warc test.").all()


def test_warc_gzip_corrupt_member_yields_prefix():
    """A corrupt gzip member mid-archive ends decompression at the
    intact prefix instead of raising (one bad record must not kill an
    ingestion task)."""
    recs = _records()
    data = warc.build_warc(recs[:1], gzip_members=True)
    good2 = warc.build_warc(recs[2:], gzip_members=True)
    corrupted = bytearray(good2)
    corrupted[12] ^= 0xFF  # flip a byte inside the deflate stream
    rows = warc.pages_from_warc_bytes(bytes(data) + bytes(corrupted))
    assert [r["url"] for r in rows] == ["https://a.example.org/1"]


def test_warc_gzip_many_members_linear():
    """300 gzip members decompress member-by-member (the chunked path,
    not a whole-tail slice per member) and all parse."""
    import datetime as dt

    recs = [
        {"url": f"https://a.example.org/{i}", "warc_ts": TS + dt.timedelta(seconds=i),
         "payload": b"<html><body><main><article><p>"
         + (f"page {i} body text".encode() * 3)
         + b"</p></article></main></body></html>"}
        for i in range(300)
    ]
    rows = warc.pages_from_warc_bytes(warc.build_warc(recs, gzip_members=True))
    assert len(rows) == 300
    assert rows[299]["url"] == "https://a.example.org/299"


def test_stream_warc_extract_incremental(spark, tmp_path):
    """Archives landing in a directory are extracted exactly once per
    file across restarts (streaming twin of the WARC batch path)."""
    from vlm_ocr_pipeline_spark.streaming.ingest import stream_warc_extract

    inp, outp, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    import os

    os.makedirs(inp)
    (tmp_path / "in" / "a.warc").write_bytes(warc.build_warc(_records()[:1]))
    stream_warc_extract(spark, inp, outp, ckpt)
    first = spark.read.parquet(outp)
    assert first.count() == 1
    # second archive lands; only IT is processed on the next drain
    (tmp_path / "in" / "b.warc.gz").write_bytes(
        warc.build_warc(_records()[2:], gzip_members=True)
    )
    stream_warc_extract(spark, inp, outp, ckpt)
    out = spark.read.parquet(outp).toPandas()
    assert len(out) == 2
    assert set(out["url"]) == {
        "https://a.example.org/1", "https://a.example.org/2",
    }


@pytest.mark.parametrize("gz", [False, True])
def test_fetch_warc_records_by_index(spark, tmp_path, gz):
    """CDXJ-style (filename, offset, length) picks read ONLY the
    indexed records and agree byte-for-byte with the full scan."""
    import os

    recs = []
    for i in range(6):
        recs.append(
            {
                "url": f"https://idx.example.org/{i}",
                "warc_ts": TS + dt.timedelta(seconds=i),
                "payload": f"<html><body><p>record {i}</p></body></html>"
                .encode(),
            }
        )
    # per-record members so offsets are the cumulative member sizes
    members = [warc.build_warc([r], gzip_members=gz) for r in recs]
    blob = b"".join(members)
    name = "picks.warc.gz" if gz else "picks.warc"
    (tmp_path / name).write_bytes(blob)
    offsets, pos = [], 0
    for m in members:
        offsets.append((pos, len(m)))
        pos += len(m)
    picks = [1, 4, 5]
    index = spark.createDataFrame(
        [(name, offsets[i][0], offsets[i][1]) for i in picks],
        "filename string, offset long, length long",
    )
    got = (
        warc.fetch_warc_records(index, str(tmp_path))
        .orderBy("url")
        .toPandas()
    )
    assert list(got["url"]) == [f"https://idx.example.org/{i}" for i in picks]
    full = warc.read_warc(spark, str(tmp_path / name)).orderBy("url").toPandas()
    wanted = full[full["url"].isin(set(got["url"]))].reset_index(drop=True)
    assert [bytes(x) for x in got["html"]] == [bytes(x) for x in wanted["html"]]

    # stale entries (missing file, out-of-range offset) are skipped
    stale = spark.createDataFrame(
        [("gone.warc.gz", 0, 100), (name, 10**9, 50)],
        "filename string, offset long, length long",
    )
    assert warc.fetch_warc_records(stale, str(tmp_path)).count() == 0
