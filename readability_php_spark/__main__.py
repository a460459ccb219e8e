"""Single-document CLI — the drop-in analogue of the reference's
one-page-at-a-time API (``new Readability($cfg); $r->parse($html)``):

    python -m readability_php_spark page.html [--url URL] [--json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

from .config import Configuration
from .kernel import extract


def main() -> int:
    ap = argparse.ArgumentParser(prog="readability_php_spark")
    ap.add_argument("file", help="HTML file ('-' for stdin)")
    ap.add_argument("--url", default="http://fakehost/test/test.html")
    ap.add_argument("--json", action="store_true", help="full JSON result")
    ap.add_argument("--text", action="store_true", help="extracted text only")
    ap.add_argument("--no-byline", action="store_true")
    ap.add_argument("--char-threshold", type=int, default=500)
    args = ap.parse_args()

    if args.file == "-":
        html = sys.stdin.read()
    else:
        with open(args.file, encoding="utf-8", errors="replace") as f:
            html = f.read()

    cfg = Configuration(
        original_url=args.url,
        fix_relative_urls=True,
        substitute_entities=True,
        article_byline=not args.no_byline,
        char_threshold=args.char_threshold,
    )
    r = extract(html, cfg, url=args.url)
    if r.error:
        print(f"error: {r.error}", file=sys.stderr)
        return 1
    if args.json:
        print(json.dumps(dataclasses.asdict(r), ensure_ascii=False, indent=2))
    elif args.text:
        print(r.extracted_text or "")
    else:
        print(r.content_html or "")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
