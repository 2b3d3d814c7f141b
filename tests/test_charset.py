"""Charset sniff/decode ladder + mojibake repair (functions/charset.py).

Pure-Python kernels (no JVM needed) plus one Spark parity test for the
JVM-side mojibake column.  Fixtures are synthesized in-test: encode a
known string with a real stdlib codec and check the ladder gets it
back byte-exactly — the property a replace-decode can never have.
"""

from __future__ import annotations

import codecs

import pytest

from vlm_ocr_pipeline_spark.functions import charset


# ------------------------------------------------------------- labels
@pytest.mark.parametrize(
    "label,codec",
    [
        ("UTF-8", "utf-8"),
        ("latin1", "cp1252"),
        ("ISO-8859-1", "cp1252"),
        ("us-ascii", "cp1252"),
        ("gb2312", "gbk"),
        ("Shift_JIS", "shift_jis"),
        ("EUC-KR", "euc_kr"),
        ("'utf-8'", "utf-8"),  # quoted label as found in sloppy meta tags
        ("bogus-charset", None),
        ("", None),
        (None, None),
    ],
)
def test_whatwg_label_resolution(label, codec):
    assert charset.resolve_label(label) == codec


# ---------------------------------------------------------------- BOMs
@pytest.mark.parametrize(
    "codec",
    ["utf-8-sig", "utf-16-le", "utf-16-be", "utf-32-le", "utf-32-be"],
)
def test_bom_roundtrip(codec):
    s = "BOM page — café 中文"
    payload = codecs.lookup(codec).encode(s)[0]
    if not codec.startswith("utf-8"):
        bom = {
            "utf-16-le": codecs.BOM_UTF16_LE,
            "utf-16-be": codecs.BOM_UTF16_BE,
            "utf-32-le": codecs.BOM_UTF32_LE,
            "utf-32-be": codecs.BOM_UTF32_BE,
        }[codec]
        payload = bom + payload
    text, got_codec, evidence = charset.decode_payload(payload)
    assert evidence == "bom"
    assert text.lstrip("﻿") == s


def test_utf16_without_bom_nul_pattern():
    s = "<html><body>Plain ASCII page, UTF-16, no BOM</body></html>"
    for codec, order in (("utf-16-le", "le"), ("utf-16-be", "be")):
        text, got, evidence = charset.decode_payload(s.encode(codec))
        assert evidence == "nul-pattern" and got == f"utf-16-{order}"
        assert text == s


# ------------------------------------------------------------- prescan
def test_meta_charset_prescan_decodes_legacy_page():
    body = "<html><head><meta charset=windows-1251></head>" \
           "<body>Привет мир</body></html>"
    payload = body.encode("cp1251")
    text, codec, evidence = charset.decode_payload(payload)
    assert (codec, evidence) == ("cp1251", "meta")
    assert "Привет" in text


def test_http_equiv_content_type_prescan():
    body = ('<html><head><meta http-equiv="Content-Type" '
            'content="text/html; charset=Shift_JIS"></head>'
            "<body>日本語のページ</body></html>")
    payload = body.encode("shift_jis")
    text, codec, evidence = charset.decode_payload(payload)
    assert (codec, evidence) == ("shift_jis", "meta")
    assert "日本語" in text


def test_xml_declaration_prescan():
    body = ("<?xml version='1.0' encoding='ISO-8859-2'?>"
            "<doc>Główna treść</doc>")
    payload = body.encode("iso8859-2")
    text, codec, evidence = charset.decode_payload(payload)
    assert (codec, evidence) == ("iso8859-2", "meta")
    assert "Główna" in text


def test_mislabeled_utf8_wins_over_meta():
    # the common lie: page says windows-1252, bytes are valid UTF-8
    # with multibyte content — valid UTF-8 is essentially never 1252
    body = ('<meta charset="windows-1252"><p>naïve — café '
            "中文</p>")
    text, codec, evidence = charset.decode_payload(body.encode("utf-8"))
    assert (codec, evidence) == ("utf-8", "utf-8")
    assert "中文" in text


def test_declared_transport_hint_beats_meta_absence():
    s = "你好世界 the page"
    payload = s.encode("gbk")
    text, codec, evidence = charset.decode_payload(payload, declared="gb2312")
    assert (codec, evidence) == ("gbk", "declared")
    assert text == s


def test_prescan_only_reads_first_kilobyte():
    # a charset declared beyond 1024 bytes is invisible (WHATWG limit)
    filler = "<!-- " + "x" * 1100 + " -->"
    body = filler + '<meta charset="windows-1251">мир'
    payload = body.encode("cp1251")
    _, codec, evidence = charset.decode_payload(payload)
    assert evidence == "fallback" and codec == "cp1252"


# -------------------------------------------------------- decode ladder
def test_plain_ascii_is_utf8():
    text, codec, evidence = charset.decode_payload(b"hello world")
    assert (text, codec, evidence) == ("hello world", "utf-8", "utf-8")


def test_undeclared_cp1252_falls_back_correctly():
    s = "smart “quotes” and — dashes, café"
    text, codec, evidence = charset.decode_payload(s.encode("cp1252"))
    assert (codec, evidence) == ("cp1252", "fallback")
    assert text == s


def test_replace_decode_would_have_destroyed_it():
    s = "résumé – naïve"
    mangled = s.encode("cp1252").decode("utf-8", "replace")
    assert "�" in mangled  # the old behavior: data loss
    text, _, _ = charset.decode_payload(s.encode("cp1252"))
    assert text == s  # the ladder: byte-exact recovery


def test_truncated_multibyte_tail_never_raises():
    payload = "ok 中文".encode("utf-8")[:-1]  # cut mid-char
    text, codec, _ = charset.decode_payload(payload)
    assert text.startswith("ok ")


def test_iso2022jp_detected_despite_being_valid_ascii():
    # 7-bit encoding: utf-8-validity alone would keep the escape runs
    s = "件名 meeting tomorrow 予定"
    payload = s.encode("iso2022_jp")
    assert payload.decode("utf-8", "strict")  # the trap: it IS valid
    text, codec, evidence = charset.decode_payload(payload)
    assert (codec, evidence) == ("iso2022_jp", "escape-shift")
    assert text == s


def test_mostly_utf8_with_stray_bytes_stays_utf8():
    # a long UTF-8 page with one corrupt byte must NOT fall to 1252
    # (that would mojibake every multibyte char on the page)
    body = ("naïve café — 中文 содержание " * 20).encode("utf-8")
    payload = body[:100] + b"\xfe" + body[100:]
    text, codec, evidence = charset.decode_payload(payload)
    assert (codec, evidence) == ("utf-8", "utf-8-lossy")
    assert "中文" in text and text.count("�") <= 2


def test_binary_junk_never_raises():
    payload = bytes(range(256)) * 4
    text, codec, evidence = charset.decode_payload(payload)
    assert isinstance(text, str) and codec == "cp1252"


# ------------------------------------------------------------ mojibake
def _mangle(s: str, times: int = 1) -> str:
    # what a sloppy-1252 reader shows for the string's UTF-8 bytes
    # (strict cp1252 would crash on the 5 hole bytes; real-world
    # manglers — and ftfy's model of them — map holes like latin-1)
    for _ in range(times):
        s = "".join(
            chr(charset._SLOPPY_DECODE[b]) for b in s.encode("utf-8")
        )
    return s


def test_mojibake_count_positive_on_mangled_negative_on_clean():
    clean = "don’t — naïve café 中文"
    assert charset.py_mojibake_count(clean) == 0
    assert charset.py_mojibake_count(_mangle(clean)) >= 4


def test_fix_mojibake_roundtrip_single_and_double():
    clean = "don’t stop — élève 日本語"
    assert charset.fix_mojibake(_mangle(clean)) == clean
    assert charset.fix_mojibake(_mangle(clean, 2)) == clean


def test_fix_mojibake_idempotent_and_safe_on_clean_text():
    for s in ["plain ascii", "café — déjà vu",
              "中文文档", "Привет",
              ""]:
        assert charset.fix_mojibake(s) == s


def test_fix_mojibake_through_unmapped_cp1252_bytes():
    # U+201A 'single low quote' image chain hits cp1252 hole bytes via
    # curly-quote content; sloppy-1252 must round-trip them
    clean = "‘quoted’ … œuvre"
    assert charset.fix_mojibake(_mangle(clean)) == clean


def test_spark_mojibake_column_matches_python(spark):
    from pyspark.sql import functions as F

    rows = [
        ("a", "don’t — clean"),
        ("b", _mangle("don’t — smart “quotes”")),
        ("c", _mangle("café 中文", 2)),
        ("d", ""),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    got = {
        r["id"]: r["n"]
        for r in df.select(
            "id", charset.mojibake_count_col(F.col("text")).alias("n")
        ).collect()
    }
    want = {i: charset.py_mojibake_count(t) for i, t in rows}
    assert got == want
    assert want["b"] > 0 and want["c"] > 0 and want["a"] == 0


def test_extract_recovers_legacy_charset_pages(spark):
    """E2E: legacy-encoded pages through the fused extraction pipeline
    come out byte-exact — the property utf-8/replace could never have."""
    from vlm_ocr_pipeline_spark import schema
    from vlm_ocr_pipeline_spark.plans.pipeline import extract
    from vlm_ocr_pipeline_spark.sources.datagen import BASE_TS, wrap_html

    cases = [
        ("cp1251", "windows-1251", "Привет мир из кодировки"),
        ("shift_jis", "Shift_JIS", "日本語のページです"),
        ("cp1252", None, "smart “quotes” — café déjà vu"),  # undeclared
        ("utf-8", "utf-8", "plain utf-8 中文 page"),
    ]
    rows = []
    for i, (codec, label, text) in enumerate(cases):
        title = f"Page {i}"
        meta = f'<meta charset="{label}">' if label else ""
        html = wrap_html(title, [text]).replace("<head>", f"<head>{meta}")
        if codec == "shift_jis":  # template em dash has no sjis mapping
            html = html.replace("—", "-")
        rows.append(
            {
                "url": f"https://charset.example.org/{i}",
                "warc_ts": BASE_TS,
                "html": html.encode(codec),
                "text": None,
                "lang": None,
            }
        )
    pages = spark.createDataFrame(rows, schema=schema.PAGES_SCHEMA)
    out = {
        r["url"]: r["rendered_plaintext"]
        for r in extract(pages).collect()
    }
    for i, (_, _, text) in enumerate(cases):
        assert text in out[f"https://charset.example.org/{i}"], (i, out)


def test_repair_mojibake_operator(spark):
    from vlm_ocr_pipeline_spark.operators.textstats import (
        quality_lang,
        repair_mojibake,
    )

    clean = "don’t — élève 日本語"
    rows = [(1, clean), (2, _mangle(clean)), (3, "plain ascii"), (4, None)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fixed = {r["doc_id"]: r["text"] for r in repair_mojibake(docs).collect()}
    assert fixed[1] == clean and fixed[2] == clean
    assert fixed[3] == "plain ascii" and fixed[4] is None
    # and the quality surface counts fingerprints before repair
    mb = {
        r["doc_id"]: r["mojibake_count"]
        for r in quality_lang(
            docs.filter(docs.doc_id < 4)
        ).select("doc_id", "mojibake_count").collect()
    }
    assert mb[2] > 0 and mb[1] == 0 and mb[3] == 0


def test_duckdb_mojibake_oracle_matches_python():
    import duckdb

    rows = [
        "clean — café",
        _mangle("smart “quotes” — café"),
        _mangle("中文", 2),
    ]
    con = duckdb.connect()
    for t in rows:
        (n,) = con.execute(
            f"select {charset.sql_mojibake_count('?::VARCHAR')}", [t]
        ).fetchone()
        assert n == charset.py_mojibake_count(t), t
