"""Charset sniffing for raw crawl bytes.

Common-Crawl WARC payloads arrive as bytes with no reliable encoding: the
HTTP header charset is frequently absent or wrong, and a hard-coded utf-8
decode garbles every legacy-encoded page (windows-1252 and friends are
still a double-digit share of the long-tail web).  ``sniff_decode``
resolves the encoding with the practical precedence real pipelines use:

1. **BOM** — utf-8-sig / utf-16 LE / utf-16 BE are authoritative.
2. **Strict utf-8 trial** — valid utf-8 is a near-perfect signal (random
   legacy bytes are vanishingly unlikely to form valid multi-byte
   sequences), and it deliberately outranks the in-document declaration:
   re-encoded corpora routinely carry stale ``<meta charset>`` claims.
3. **Declared charset** — the HTML5 prescan: ``<meta charset=...>`` or
   ``<meta http-equiv="Content-Type" content="...charset=...">`` within
   the first 2048 bytes, validated against the codec registry.
4. **latin-1 fallback** — total (never raises), byte-preserving.

Pure per-row byte logic — runs inside the Arrow-batched extract operator,
no extra pass over the data.
"""

from __future__ import annotations

import codecs
import re

#: HTML5 prescan window (spec says 1024; use 2048 for sloppy templates)
_PRESCAN = 2048

_META_CHARSET = re.compile(
    rb"""<meta[^>]{0,512}?charset\s*=\s*["']?\s*([a-zA-Z0-9_\-:.]+)""",
    re.IGNORECASE,
)

#: common alias fixups the codec registry doesn't resolve on its own
_ALIASES = {
    "iso-8859-1": "windows-1252",  # the HTML5-mandated superset remap
    "latin-1": "windows-1252",
    "us-ascii": "windows-1252",
    "gb2312": "gb18030",           # superset; avoids decode errors on GBK
}


def sniff_encoding(raw: bytes) -> str:
    """Resolved codec name for ``raw`` (see module docstring for the
    precedence).  Always returns a decodable codec."""
    if raw.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if raw.startswith(b"\xff\xfe") or raw.startswith(b"\xfe\xff"):
        return "utf-16"  # stdlib consumes the BOM and picks the endianness
    try:
        raw.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    m = _META_CHARSET.search(raw[:_PRESCAN])
    if m:
        declared = m.group(1).decode("ascii", "replace").strip().lower()
        declared = _ALIASES.get(declared, declared)
        try:
            codecs.lookup(declared)
            # utf-16 without a BOM can't be right for bytes that reached
            # the meta prescan as ascii-compatible; don't honor it
            if not declared.startswith("utf-16"):
                return declared
        except LookupError:
            pass
    return "latin-1"


def sniff_decode(raw: bytes) -> tuple[str, str]:
    """(text, encoding) — total function, never raises: the resolved
    codec decodes with errors='replace' and latin-1 is a byte-total
    fallback."""
    enc = sniff_encoding(raw)
    return raw.decode(enc, errors="replace"), enc
