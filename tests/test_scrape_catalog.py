"""Catalog scraper tests (reference parity: src/scrape-lumbras.ts).

Pure-Python, no Spark session and no network — the page is an HTML fixture
and redirect resolution is injected.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from scrape_catalog import (  # noqa: E402
    derive_key,
    existing_source_keys,
    extract_datasets,
    main,
    normalize_title,
    parse_mega_key,
)

FIXTURE = """
<html><body>
<div class="card">
  <strong>OTB 1995&#8211;2009</strong>
  <p>blah</p>
  <a class="wpdm-download-link btn" data-downloadurl="/download/?wpdmdl=101">Download</a>
</div>
<div class="card">
  <strong><a href="#">Online 2025</a></strong>
  <a class="wpdm-download-link" data-downloadurl="https://cdn.example.com/download/?wpdmdl=102&amp;x=1">Download</a>
</div>
<div class="card">
  <strong>OTB NoDate</strong>
  <a class="wpdm-download-link" data-downloadurl="/download/?wpdmdl=103">Download</a>
</div>
<div class="card">
  <strong>Online 2024 &#8211; Partial Release</strong>
  <a class="wpdm-download-link" data-downloadurl="/download/?wpdmdl=104">Download</a>
</div>
<div class="card">
  <strong>Online 2026-02</strong>
  <a class="wpdm-download-link" data-downloadurl="/download/?wpdmdl=105">Download</a>
</div>
<div class="card">
  <strong>Commercial Mega Pack</strong>
  <a class="wpdm-download-link" data-downloadurl="/download/?wpdmdl=106">Download</a>
</div>
<div class="card">
  <strong>OTB 1995&#8211;2009</strong>
  <a class="wpdm-download-link" data-downloadurl="/download/?wpdmdl=107">Duplicate key dropped</a>
</div>
<a class="ordinary-link" href="/nothing">not a download anchor</a>
</body></html>
"""

BASE = "https://catalog.example.com/en/downloads/"


def test_normalize_title_entities_and_dashes():
    assert normalize_title("OTB  1995&#8211;2009") == "OTB 1995-2009"
    assert normalize_title("A &amp; B &#039;x&#039;") == "A & B 'x'"


def test_derive_key_shapes():
    assert derive_key("OTB 1995-2009") == ("lumbras_otb_1995_2009", "OTB")
    assert derive_key("Online 2025") == ("lumbras_online_2025", "Online")
    assert derive_key("OTB NoDate") == ("lumbras_otb_nodate", "OTB")
    assert derive_key("Online 2024 - Partial Release") == (
        "lumbras_online_2024_partial",
        "Online",
    )
    assert derive_key("Online 2026-02") == ("lumbras_online_2026_02", "Online")
    assert derive_key("Commercial Mega Pack") is None
    assert derive_key("Online maybe someday") is None


def test_extract_datasets_pairs_titles_and_dedupes():
    ds = extract_datasets(FIXTURE, BASE)
    by_key = {d.key: d for d in ds}
    assert set(by_key) == {
        "lumbras_otb_1995_2009",
        "lumbras_online_2025",
        "lumbras_otb_nodate",
        "lumbras_online_2024_partial",
        "lumbras_online_2026_02",
    }
    # relative URL resolved against the page; absolute kept; entity decoded
    assert (
        by_key["lumbras_otb_1995_2009"].download_url
        == "https://catalog.example.com/download/?wpdmdl=101"
    )
    assert (
        by_key["lumbras_online_2025"].download_url
        == "https://cdn.example.com/download/?wpdmdl=102&x=1"
    )
    # duplicate key keeps the FIRST occurrence (wpdmdl=101, not 107)
    assert "wpdmdl=101" in by_key["lumbras_otb_1995_2009"].download_url


def test_parse_mega_key():
    assert (
        parse_mega_key("https://mega.nz/file/aBc123#keyKEYkey")
        == "aBc123#keyKEYkey"
    )
    assert parse_mega_key("https://example.com/file/x#y") is None


def test_existing_source_keys(tmp_path):
    p = tmp_path / "params.yaml"
    p.write_text(
        "sources:\n"
        "  lumbras_otb_nodate:\n"
        "    mega: \"x#y\"\n"
        "  lumbras_online_2025:\n"
        "    mega: \"a#b\"\n"
        "other:\n"
        "  not_a_source: 1\n"
    )
    assert existing_source_keys(str(p)) == {"lumbras_otb_nodate", "lumbras_online_2025"}
    assert existing_source_keys(str(tmp_path / "missing.yaml")) == set()


def test_main_emits_yaml_grouped_and_skips_existing(tmp_path, capsys):
    params = tmp_path / "params.yaml"
    params.write_text("sources:\n  lumbras_online_2025:\n    mega: \"a#b\"\n")

    def fake_fetch(url, timeout_s):
        return FIXTURE

    def fake_resolve(url, timeout_s):
        n = url.split("wpdmdl=")[1][:3]
        if n == "104":
            return "https://example.com/not-mega"  # WARNING path
        return f"https://mega.nz/file/id{n}#key{n}"

    rc = main(
        ["--params", str(params), "--url", BASE],
        fetch=fake_fetch,
        resolve=fake_resolve,
    )
    out = capsys.readouterr().out
    assert rc == 0
    # existing key skipped
    assert "lumbras_online_2025:" not in out
    # resolved entries rendered under their category headers
    assert "# Online datasets" in out and "# OTB datasets" in out
    assert out.index("# Online datasets") < out.index("# OTB datasets")
    assert '  lumbras_otb_nodate:\n    mega: "id103#key103"\n    category: "OTB"' in out
    assert '  lumbras_online_2026_02:\n    mega: "id105#key105"' in out
    # unresolvable entry degrades to a comment with a warning
    assert "WARNING: could not resolve mega key" in out


def test_main_no_resolve_prints_comments_only(tmp_path, capsys):
    rc = main(
        ["--params", str(tmp_path / "none.yaml"), "--url", BASE, "--no-resolve"],
        fetch=lambda url, t: FIXTURE,
        resolve=lambda url, t: (_ for _ in ()).throw(AssertionError("must not resolve")),
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "# OTB NoDate" in out and "mega:" not in out
