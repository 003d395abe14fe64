"""Catalog scraper: HTML download page → ``params.yaml`` source entries.

Out-of-engine tooling parity with the reference's scraper
(/root/reference/src/scrape-lumbras.ts:1-276): scan a downloads page for
download-manager anchors, recover each dataset's title from the nearest
preceding ``<strong>``, derive a stable source key from the title
(category prefix + year/range/nodate/partial suffix), de-dupe, skip keys
already present in params.yaml, optionally resolve each download URL's
redirect to a MEGA file key via a HEAD request, and print ready-to-paste
YAML blocks grouped by category.

Stdlib-only. Network access is isolated behind ``fetch_text`` /
``resolve_redirect`` parameters so the parsing/derivation core is testable
(and tested) offline on HTML fixtures.
"""

from __future__ import annotations

import argparse
import re
import sys
import urllib.parse
import urllib.request
from dataclasses import dataclass

_ENTITIES = {
    "&amp;": "&",
    "&quot;": '"',
    "&#039;": "'",
    "&lt;": "<",
    "&gt;": ">",
}

_USER_AGENT = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120 Safari/537.36"
)

#: How far back (bytes of HTML) to look for the card's <strong> title.
_TITLE_LOOKBACK = 20_000


@dataclass
class Dataset:
    title: str
    category: str  # "Online" | "OTB"
    download_url: str
    key: str


def decode_html_entities(text: str) -> str:
    """Minimal entity decoding for the strings seen on the catalog page
    (scrape-lumbras.ts:11-20): named entities + numeric charrefs.

    Intentional divergence from the reference: ``chr()`` decodes the full
    Unicode code point, while the reference's ``String.fromCharCode``
    truncates astral-plane charrefs (> 0xFFFF) to a lone UTF-16 code unit.
    ``chr`` is the correct behavior; current catalog content contains no
    astral charrefs, so outputs agree in practice."""
    for ent, ch in _ENTITIES.items():
        text = text.replace(ent, ch)
    return re.sub(r"&#(\d+);", lambda m: chr(int(m.group(1))), text)


def normalize_title(text: str) -> str:
    """Entity-decode, fold en/em dashes to '-', collapse whitespace
    (scrape-lumbras.ts:22-27)."""
    text = decode_html_entities(text)
    text = re.sub(r"[–—]", "-", text)
    return re.sub(r"\s+", " ", text).strip()


def derive_key(title: str) -> tuple[str, str] | None:
    """Title → (source_key, category), or None for non-dataset titles
    (scrape-lumbras.ts:29-66).

    Recognized shapes after the OTB/Online prefix:
      ``NoDate`` → nodate | ``... Partial Release <year>`` → <year>_partial
      | ``YYYY-YYYY`` → YYYY_YYYY | ``YYYY`` → YYYY | ``YYYY-MM`` → YYYY_MM
    """
    t = normalize_title(title)
    if re.match(r"^otb\b", t, re.IGNORECASE):
        category = "OTB"
    elif re.match(r"^online\b", t, re.IGNORECASE):
        category = "Online"
    else:
        return None
    remainder = re.sub(r"^(otb|online)\b", "", t, flags=re.IGNORECASE).strip()

    suffix: str | None = None
    if re.match(r"^nodate$", remainder, re.IGNORECASE):
        suffix = "nodate"
    elif re.search(r"partial release", remainder, re.IGNORECASE):
        y = re.search(r"\b(\d{4})\b", remainder)
        suffix = f"{y.group(1)}_partial" if y else "partial"
    else:
        yr = re.match(r"^(\d{4})\s*-\s*(\d{4})$", remainder)
        if yr:
            suffix = f"{yr.group(1)}_{yr.group(2)}"
        if suffix is None:
            y = re.match(r"^(\d{4})$", remainder)
            if y:
                suffix = y.group(1)
        if suffix is None:
            ym = re.match(r"^(\d{4})\s*-\s*(\d{2})$", remainder)
            if ym:
                suffix = f"{ym.group(1)}_{ym.group(2)}"

    if suffix is None:
        return None
    return f"lumbras_{category.lower()}_{suffix}", category


def extract_datasets(html: str, base_url: str) -> list[Dataset]:
    """Find download-manager anchors, pair each with the nearest preceding
    ``<strong>`` title, derive keys, de-dupe keeping the first occurrence
    (scrape-lumbras.ts:68-123)."""
    out: list[Dataset] = []
    for anchor in re.finditer(r"<a\b[^>]*>", html, re.IGNORECASE):
        tag = anchor.group(0)
        if not re.search(r"\bwpdm-download-link\b", tag, re.IGNORECASE):
            continue
        m = re.search(r"""\bdata-downloadurl\s*=\s*(["'])(.*?)\1""", tag, re.IGNORECASE)
        if not m:
            continue
        download_url = urllib.parse.urljoin(base_url, decode_html_entities(m.group(2)))

        back = html[max(0, anchor.start() - _TITLE_LOOKBACK) : anchor.start()]
        titles = re.findall(
            r"<strong\b[^>]*>\s*(?:<a\b[^>]*>\s*)?([^<]+?)\s*(?:</a>\s*)?</strong>",
            back,
            re.IGNORECASE,
        )
        if not titles:
            continue
        title = normalize_title(titles[-1])
        derived = derive_key(title)
        if derived is None:
            continue
        key, category = derived
        out.append(Dataset(title=title, category=category, download_url=download_url, key=key))

    seen: set[str] = set()
    deduped = []
    for d in out:
        if d.key in seen:
            continue
        seen.add(d.key)
        deduped.append(d)
    return deduped


def existing_source_keys(params_yaml_path: str) -> set[str]:
    """Keys already present under ``sources:`` in params.yaml — recognized
    as 2-space-indented ``key:`` lines (scrape-lumbras.ts:156-168)."""
    try:
        with open(params_yaml_path, encoding="utf-8") as f:
            text = f.read()
    except OSError:
        return set()
    keys = set()
    for line in text.splitlines():
        m = re.match(r"^\s{2}([A-Za-z0-9_]+):\s*$", line)
        if m:
            keys.add(m.group(1))
    return keys


def parse_mega_key(resolved_url: str) -> str | None:
    """MEGA file URL → ``<id>#<key>`` credential string
    (scrape-lumbras.ts:146-150)."""
    m = re.match(r"https?://mega\.nz/file/([^#?/]+)#([^?\s]+)", resolved_url, re.IGNORECASE)
    if not m:
        return None
    return f"{m.group(1)}#{m.group(2)}"


def resolve_redirect(download_url: str, timeout_s: float = 30.0) -> str | None:
    """HEAD the download URL without following redirects; return the
    absolute Location target (scrape-lumbras.ts:125-154). Network-touching —
    injectable in main() so tests never hit it."""

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, req, fp, code, msg, headers, newurl):  # noqa: D102
            return None

    opener = urllib.request.build_opener(_NoRedirect)
    req = urllib.request.Request(
        download_url, method="HEAD", headers={"User-Agent": _USER_AGENT}
    )
    try:
        resp = opener.open(req, timeout=timeout_s)
        loc = resp.headers.get("Location")
    except urllib.error.HTTPError as e:
        loc = e.headers.get("Location") if e.code in (301, 302, 303, 307, 308) else None
    except OSError:
        return None
    if not loc:
        return None
    return urllib.parse.urljoin(download_url, loc)


def render_yaml_entries(entries: list[dict], out=None) -> None:
    """Ready-to-paste params.yaml blocks (scrape-lumbras.ts:170-179)."""
    out = out if out is not None else sys.stdout
    for e in entries:
        print(f"  {e['key']}:", file=out)
        print(f"    mega: \"{e['mega']}\"", file=out)
        print(f"    category: \"{e['category']}\"", file=out)
        print("", file=out)


def fetch_text(url: str, timeout_s: float = 30.0) -> str:
    req = urllib.request.Request(url, headers={"User-Agent": _USER_AGENT})
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        return resp.read().decode("utf-8", errors="replace")


def main(argv: list[str] | None = None, fetch=fetch_text, resolve=resolve_redirect) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--url", default="https://lumbrasgigabase.com/en/download-in-pgn-format-en/")
    p.add_argument("--params", default="params.yaml")
    p.add_argument("--all", action="store_true", help="include keys already in params.yaml")
    p.add_argument("--no-resolve", action="store_true", help="skip redirect resolution (offline)")
    p.add_argument("--timeout-s", type=float, default=30.0)
    args = p.parse_args(argv)
    if args.timeout_s <= 0:
        p.error("--timeout-s must be positive")

    print(f"# Source: {args.url}")
    print("# Paste under `sources:` in params.yaml")
    print("")

    html = fetch(args.url, args.timeout_s)
    datasets = sorted(extract_datasets(html, args.url), key=lambda d: d.key)
    existing = existing_source_keys(args.params)

    to_print: list[dict] = []
    for d in datasets:
        if not args.all and d.key in existing:
            continue
        if args.no_resolve:
            print(f"# {d.title}")
            print(f"# download: {d.download_url}")
            print("")
            continue
        resolved = resolve(d.download_url, args.timeout_s)
        mega = parse_mega_key(resolved) if resolved else None
        if mega is None:
            print(f"# {d.title}")
            print(f"# download: {d.download_url}")
            print("# WARNING: could not resolve mega key (no redirect or non-MEGA target)")
            print("")
            continue
        to_print.append({"key": d.key, "category": d.category, "mega": mega})

    online = [e for e in to_print if e["category"] == "Online"]
    otb = [e for e in to_print if e["category"] == "OTB"]
    if online:
        print("  # Online datasets")
        render_yaml_entries(online)
    if otb:
        print("  # OTB datasets")
        render_yaml_entries(otb)
    if not to_print and not args.all:
        print(f"# No new datasets found relative to {args.params}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
