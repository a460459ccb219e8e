"""Metadata extraction operators M1-M8 (SURVEY.md §2.2).

Faithful re-expression of ``src/Readability.php:291-630``: meta-tag scan +
priority coalesce (M1/M2), title refinement (M3), main-image fallback (M5),
all-images collection (M6), hand-rolled URL absolutization honoring ``<base>``
(M7), excerpt fallback (M8).  All pure functions over (Document, Configuration)
→ plain Python values, so they unit-test without Spark and run unchanged
inside the Arrow-batch UDF.
"""

from __future__ import annotations

import re
from typing import Optional

from ..dom.node import Document, Element
from .nodeutil import php_trim
from .regexes import META_NAME, META_PROPERTY

_WS = re.compile(r"\s")
_ABS_URI = re.compile(r"^[a-zA-Z][a-zA-Z0-9\+\-\.]*:")
_SEP_SEARCH = re.compile(r" [\|\-\\\/>»] ", re.IGNORECASE)
_SEP_HIER = re.compile(r" [\\\/>»] ")
_SEP_CUT_END = re.compile(r"(.*)[\|\-\\\/>»] .*", re.IGNORECASE)
_SEP_CUT_FRONT = re.compile(r"[^\|\-\\\/>»]*[\|\-\\\/>»](.*)", re.IGNORECASE)
_SEP_STRIP = re.compile(r"[\|\-\\\/>»]+")
_SPLIT_WS = re.compile(r"\s+")


def scan_meta_values(doc: Document) -> dict[str, str]:
    """M1 — src/Readability.php:291-332.  Returns the ``values`` map keyed by
    normalized meta name (lowercase, whitespace stripped, dots→colons)."""
    values: dict[str, str] = {}
    for meta in doc.iter_desc("meta"):
        element_name = meta.get_attribute("name")
        element_property = meta.get_attribute("property")
        content = meta.get_attribute("content")
        matched = False
        if element_property:
            m = META_PROPERTY.search(element_property)
            if m:
                matched = True
                # reverse group order: [full, g1, g2] walked from the end —
                # sets values for the bare key ('title'), the prefix ('og'),
                # and the full 'og:title' (src/Readability.php:312-319)
                groups = [m.group(0)] + list(m.groups())
                for g in reversed(groups):
                    if g is None:
                        continue
                    name = _WS.sub("", g.lower())
                    values[name] = php_trim(content)
        if not matched and element_name and META_NAME.search(element_name):
            if content:
                name = _WS.sub("", element_name.lower()).replace(".", ":")
                values[name] = php_trim(content)
    return values


def _first_key(values: dict[str, str], keys: list[str]) -> Optional[str]:
    for k in keys:
        if k in values:
            return values[k]
    return None


def coalesce_metadata(values: dict[str, str]) -> dict[str, Optional[str]]:
    """M2 — priority coalesce, src/Readability.php:335-393."""
    title = _first_key(values, [
        "dc:title", "dcterm:title", "og:title", "weibo:article:title",
        "weibo:webpage:title", "title", "twitter:title",
    ])
    return {
        "title": php_trim(title) if title is not None else None,
        "author": _first_key(values, ["dc:creator", "dcterm:creator", "author"]),
        "excerpt": _first_key(values, [
            "dc:description", "dcterm:description", "og:description",
            "weibo:article:description", "weibo:webpage:description",
            "description", "twitter:description",
        ]),
        "image": _first_key(values, ["image", "og:image", "twitter:image"]),
        "site_name": _first_key(values, ["og:site_name"]),
    }


def _word_count(s: str) -> int:
    return len(_SPLIT_WS.split(s))


def get_article_title(doc: Document, meta_title: Optional[str]) -> Optional[str]:
    """M3 — title refinement, src/Readability.php:465-562."""
    original_title = None
    if meta_title:
        original_title = meta_title
    else:
        for t in doc.iter_desc("title"):
            original_title = t.text_content
            break
    if original_title is None:
        return None

    original_title = php_trim(original_title)
    cur_title = original_title
    title_had_hierarchical_separators = False

    if _SEP_SEARCH.search(cur_title):
        title_had_hierarchical_separators = bool(_SEP_HIER.search(cur_title))
        cur_title = _SEP_CUT_END.sub(r"\1", original_title)
        if _word_count(cur_title) < 3:
            cur_title = _SEP_CUT_FRONT.sub(r"\1", original_title)
    elif ": " in cur_title:
        # heading containing this exact string → assume full title
        match = False
        for i in (1, 2):
            for h in doc.iter_desc(f"h{i}"):
                if php_trim(h.text_content) == php_trim(cur_title):
                    match = True
        if not match:
            idx = original_title.rfind(":")
            cur_title = original_title[idx + 1:]
            if _word_count(cur_title) < 3:
                idx = original_title.find(":")
                cur_title = original_title[idx + 1:]
            else:
                colon = cur_title.find(":")
                before = cur_title[:colon] if colon >= 0 else ""
                if _word_count(before) > 5:
                    cur_title = original_title
    elif len(cur_title) > 150 or len(cur_title) < 15:
        h_ones = doc.get_elements_by_tag_name("h1")
        if len(h_ones) == 1:
            cur_title = h_ones[0].text_content

    cur_title = php_trim(cur_title)

    cur_count = _word_count(cur_title)
    orig_count = _word_count(_SEP_STRIP.sub("", original_title)) - 1
    if cur_count <= 4 and (
        not title_had_hierarchical_separators or cur_count != orig_count
    ):
        cur_title = original_title
    return cur_title


# --- URL absolutization (M7, src/Readability.php:571-630) -------------------

def _parse_url(url: str) -> dict[str, Optional[str]]:
    """Minimal parse_url: scheme, host, path (PHP parse_url subset)."""
    m = re.match(r"^(?:([a-zA-Z][a-zA-Z0-9+.\-]*):)?(?://([^/?#]*))?([^?#]*)", url)
    scheme, host, path = (m.group(1), m.group(2), m.group(3)) if m else (None, None, None)
    return {"scheme": scheme, "host": host, "path": path}


def _dirname(path: Optional[str]) -> str:
    """PHP dirname() over a URL path: strip the final component; '' and '/'
    edge cases match PHP ('' → '.', '/x' → '/', 'x' → '.')."""
    if not path:
        return "."
    stripped = path.rstrip("/")
    if stripped == "":
        return "/"  # PHP dirname('/') == '/'
    idx = stripped.rfind("/")
    if idx < 0:
        return "."
    if idx == 0:
        return "/"
    return stripped[:idx]


def get_base_uri(doc: Document) -> Optional[str]:
    """The <base href> of the document, if any (what PHP's
    ``DOMDocument::$baseURI`` reflects for string-loaded HTML)."""
    for base in doc.iter_desc("base"):
        href = base.get_attribute("href")
        if href:
            return href
    return None


#: get_path_info is called once per URI during post-processing (links,
#: images) but its value only depends on (doc's <base>, url) — cache it
#: per (doc, mutation epoch, url) so a document's N urls cost one <base>
#: walk + two _parse_url, not N.  Any DOM mutation bumps the global epoch
#: and invalidates, so the per-call semantics of the reference
#: (src/Readability.php:611-630 recomputes every call) are preserved.
_path_info_cache: dict = {}


def get_path_info(doc: Document, url: str) -> tuple[str, str, str]:
    """src/Readability.php:611-630 → (pathBase, scheme, prePath)."""
    from ..dom.node import mutation_epoch

    key = (id(doc), mutation_epoch(), url)
    hit = _path_info_cache.get(key)
    if hit is not None:
        return hit
    result = _get_path_info_uncached(doc, url)
    if len(_path_info_cache) > 16:
        _path_info_cache.clear()
    _path_info_cache[key] = result
    return result


def _get_path_info_uncached(doc: Document, url: str) -> tuple[str, str, str]:
    parts = _parse_url(url)
    scheme_s = parts["scheme"] or ""
    host_s = parts["host"] or ""
    base_uri = get_base_uri(doc)
    if base_uri is not None:
        if base_uri.startswith("/"):
            # base starting with '/' overrides the URL's path completely
            path_base = f"{scheme_s}://{host_s}{base_uri}"
        else:
            path_base = (
                f"{scheme_s}://{host_s}{_dirname(parts['path'])}/"
                f"{base_uri.rstrip('/')}/"
            )
    else:
        path_base = f"{scheme_s}://{host_s}{_dirname(parts['path'])}/"
    pb = _parse_url(path_base)
    scheme = pb["scheme"] or ""
    pre_path = f"{scheme}://{pb['host'] or ''}"
    return path_base, scheme, pre_path


def to_absolute_uri(doc: Document, original_url: str, uri: str) -> str:
    """src/Readability.php:571-605 — branch-for-branch."""
    path_base, scheme, pre_path = get_path_info(doc, original_url)
    if _ABS_URI.match(uri):
        return uri
    if uri.startswith("//"):
        return f"{scheme}://{uri[2:]}"
    if uri.startswith("/"):
        return pre_path + uri
    if uri.startswith("./"):
        return path_base + uri[2:]
    if uri.startswith("#"):
        return uri
    return path_base + uri


# --- images (M5/M6) ---------------------------------------------------------

def find_main_image_fallback(doc: Document) -> Optional[str]:
    """M5 — first <link rel=img_src|image_src href> (src/Readability.php:433-458)."""
    for link in doc.iter_desc("link"):
        rel = link.get_attribute("rel")
        if link.has_attribute("rel") and rel in ("img_src", "image_src") and link.has_attribute("href"):
            return link.get_attribute("href")
    return None


def collect_images(
    content_root: Optional[Element],
    meta_image: Optional[str],
    doc: Document,
    original_url: str,
    fix_relative_urls: bool,
) -> list[str]:
    """M6 — src/Readability.php:401-427: meta image + every <img src> in the
    final content, absolutized, empty-filtered, order-preserving dedup."""
    result: list[str] = []
    if meta_image:
        result.append(meta_image)
    if content_root is not None:
        for img in content_root.iter_desc("img"):
            src = img.get_attribute("src")
            if src:
                result.append(src)
    if fix_relative_urls:
        result = [to_absolute_uri(doc, original_url, u) for u in result]
    return list(dict.fromkeys(u for u in result if u))
