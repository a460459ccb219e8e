"""The per-document extraction kernel — the analogue of ``src/Readability.php``.

``Readability.parse(html)`` runs the full lifecycle (SURVEY.md §3.1):
load/prep → guard → metadata → main image → [getNodes → rateNodes → length
check → flag-relaxation retry (R1)] → post-process → excerpt fallback.

Errors never raise out of ``extract()``: a 10^12-row Spark job must map bad
rows to an ``error`` column, not die (the reference throws ParseException —
``src/Readability.php:149,205`` — we carry the same two messages as codes
``invalid_html`` / ``unparseable``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from ..dom.node import Document, deep_clone
from ..dom.parser import parse_html
from ..dom.serializer import serialize
from ..config import Configuration
from .cleanup import post_process_content
from .metadata import (
    coalesce_metadata,
    collect_images,
    find_main_image_fallback,
    get_article_title,
    scan_meta_values,
    to_absolute_uri,
)
from .prep import prep_document, remove_scripts
from .regexes import CTHULHU, REGEXPS
from .scan import get_nodes
from .scoring import rate_nodes

ERROR_INVALID_HTML = "invalid_html"      # "Invalid or incomplete HTML."
ERROR_UNPARSEABLE = "unparseable"        # "Could not parse text."


@dataclass
class ParseResult:
    url: Optional[str] = None
    title: Optional[str] = None
    byline: Optional[str] = None
    content_html: Optional[str] = None
    extracted_text: Optional[str] = None
    excerpt: Optional[str] = None
    image: Optional[str] = None
    images: list[str] = field(default_factory=list)
    site_name: Optional[str] = None
    direction: Optional[str] = None
    error: Optional[str] = None
    attempts: int = 0

    def __str__(self) -> str:
        """S6 composite render — ``__toString()`` at
        src/Readability.php:1680-1683: ``<h1>{title}</h1>{content}``.
        PHP's sprintf renders null as the empty string; mirror that."""
        return f"<h1>{self.title or ''}</h1>{self.content_html or ''}"


def _text_metric_length(text: str) -> int:
    """R2 — codepoints excluding all whitespace + nbsp (src/Readability.php:172)."""
    return len(REGEXPS["onlyWhitespace"].sub("", text))


class Readability:
    """One instance per document (cheap: holds only scalars + the DOM ref)."""

    def __init__(self, config: Optional[Configuration] = None) -> None:
        self.config = config or Configuration()
        self.dom: Optional[Document] = None
        # retry-relaxable flags (loop-local, never mutate self.config)
        self.flags = {
            "strip_unlikely": self.config.strip_unlikely_candidates,
            "weight_classes": self.config.weight_classes,
            "clean_conditionally": self.config.clean_conditionally,
        }
        # metadata state (the reference's setters/getters)
        self.title: Optional[str] = None
        self.author: Optional[str] = None
        self.excerpt: Optional[str] = None
        self.image: Optional[str] = None
        self.site_name: Optional[str] = None
        self.direction: Optional[str] = None
        self.content: Optional[Document] = None
        self.attempts: list[tuple[object, int]] = []
        self._pristine: Optional[Document] = None  # prepped tree for retries

    # --- S1-S3: load --------------------------------------------------------
    def load_html(self, html: str) -> Document:
        log = self.config.get_logger()
        log.debug("[Loading] Loading HTML...")  # src/Readability.php:252
        if self.config.normalize_entities:
            # S2 — src/Readability.php:263-268: replace non-ASCII characters
            # with entity equivalents (mb_convert_encoding 'HTML-ENTITIES');
            # numeric charrefs decode identically on parse
            html = html.encode("ascii", "xmlcharrefreplace").decode("ascii")
            log.debug("[Loading] Normalized entities.")  # :265
        if self.config.summon_cthulhu:
            html = CTHULHU.sub("", html)
            log.debug("[Loading] Removed script tags via regex.")  # :271
        dom = parse_html(html)
        remove_scripts(dom)
        prep_document(dom)
        log.debug("[Loading] Loaded HTML successfully.")  # :283
        return dom

    def to_absolute_uri(self, uri: str) -> str:
        assert self.dom is not None
        return to_absolute_uri(self.dom, self.config.original_url, uri)

    # --- main entry -----------------------------------------------------------
    def parse(self, html: str) -> ParseResult:
        log = self.config.get_logger()
        log.info("*** Starting parse process...")  # src/Readability.php:141
        result = ParseResult()
        self.dom = self.load_html(html)

        # S4: guard (src/Readability.php:146-150)
        root = self.dom.body
        if root is None or root.first_child is None:
            log.critical("No body tag present or body tag empty")  # :147
            result.error = ERROR_INVALID_HTML
            return result

        # M1/M2 metadata + M3 title
        values = scan_meta_values(self.dom)
        meta = coalesce_metadata(values)
        self.title = meta["title"]
        if not self.title:
            self.title = get_article_title(self.dom, None)
        self.author = meta["author"]
        self.excerpt = meta["excerpt"]
        self.image = meta["image"]
        self.site_name = meta["site_name"]

        # M5: main image fallback (+absolutize, src/Readability.php:433-458)
        img_url = self.image if self.image is not None else None
        if not img_url:
            img_url = find_main_image_fallback(self.dom)
        # NB: the fallback is only persisted when FixRelativeURLs is on —
        # quirk of src/Readability.php:454-457 (setImage lives inside the
        # `!empty($imgUrl) && getFixRelativeURLs()` branch)
        if img_url and self.config.fix_relative_urls:
            self.image = self.to_absolute_uri(img_url)

        # R1: retry loop with flag relaxation (src/Readability.php:156-216)
        attempts_used = 0
        article = None
        while True:
            attempts_used += 1
            node = root.first_child
            elements_to_score = get_nodes(self, node)
            article = rate_nodes(self, elements_to_score)

            length = 0
            if article:
                length = _text_metric_length(article.text_content)

            log.info(
                "[Parsing] Article parsed. Amount of words: %s. "
                "Current threshold is: %s", length, self.config.char_threshold,
            )  # src/Readability.php:174
            if length < self.config.char_threshold:
                self.attempts.append((article, length))
                if self.flags["strip_unlikely"]:
                    self.flags["strip_unlikely"] = False
                    log.debug("[Parsing] Threshold not met, trying again setting StripUnlikelyCandidates as false")  # :181
                elif self.flags["weight_classes"]:
                    self.flags["weight_classes"] = False
                    log.debug("[Parsing] Threshold not met, trying again setting WeightClasses as false")  # :185
                elif self.flags["clean_conditionally"]:
                    self.flags["clean_conditionally"] = False
                    log.debug("[Parsing] Threshold not met, trying again setting CleanConditionally as false")  # :189
                else:
                    log.debug("[Parsing] Threshold not met, searching across attempts for some content.")  # :193
                    # take the longest attempt (PHP boolean-usort ≈ max-first)
                    best = max(self.attempts, key=lambda a: a[1])
                    if not best[1]:
                        log.critical("[Parsing] Could not parse text, giving up :(")  # :203
                        result.error = ERROR_UNPARSEABLE
                        result.title = self.title
                        result.byline = self.author
                        result.excerpt = self.excerpt
                        result.image = self.image
                        result.site_name = self.site_name
                        result.attempts = attempts_used
                        return result
                    article = best[0]
                    break
                # reload DOM for the next attempt: tokenize once, clone after
                # (semantically identical to the reference's re-parse; our
                # DOM clones don't share state)
                if self._pristine is None:
                    self._pristine = self.load_html(html)
                self.dom = deep_clone(self._pristine)
                body = self.dom.body
                if body is None:
                    result.error = ERROR_INVALID_HTML
                    result.attempts = attempts_used
                    return result
                root = body
            else:
                break

        article = post_process_content(self, article)

        # M8: excerpt fallback from first <p>
        if not self.excerpt:
            paragraphs = article.get_elements_by_tag_name("p")
            if paragraphs:
                from .nodeutil import php_trim

                self.excerpt = php_trim(paragraphs[0].text_content)

        self.content = article

        result.title = self.title
        result.byline = self.author
        result.content_html = serialize(article, include_self=False)
        result.extracted_text = article.text_content
        result.excerpt = self.excerpt
        result.image = self.image
        result.images = collect_images(
            article,
            self.image,
            self.dom,
            self.config.original_url,
            self.config.fix_relative_urls,
        )
        result.site_name = self.site_name
        result.direction = self.direction
        result.attempts = attempts_used
        log.info("*** Parse successful :)")  # src/Readability.php:233
        return result


def extract(
    html: str,
    config: Optional[Configuration] = None,
    url: Optional[str] = None,
) -> ParseResult:
    """Safe single-document entry point used by the Spark operator: never
    raises; failures land in ``result.error``."""
    try:
        r = Readability(config).parse(html)
    except RecursionError:
        r = ParseResult(error="recursion_limit")
    except MemoryError:
        raise  # let the executor handle OOM — don't mask it
    except Exception as exc:  # pragma: no cover - defensive
        r = ParseResult(error=f"kernel_error:{type(exc).__name__}")
    r.url = url
    return r
