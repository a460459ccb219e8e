"""Article cleanup — C1-C12 (SURVEY.md §2.6) + post-processing.

``prep_article`` mirrors ``src/Readability.php:1200-1297`` including call
order (forms/fieldsets first, tables/uls/divs last), data-table protection,
and the reverse-iteration removal discipline.  Parity quirks kept:

- ``li - 100`` literal in the conditional clean (:1495);
- row/col counting ignores rowspan/colspan (via nodeutil X6);
- share-widget clean walks from each top-level child with a subtree end
  marker (:1392-1412).
"""

from __future__ import annotations

import math
import re
from typing import Optional

from ..dom.node import ELEMENT_NODE, TEXT_NODE, Document, Element, Node, Text
from ..dom.serializer import serialize
from .nodeutil import (
    count_desc,
    get_class_weight,
    get_first_element_child,
    get_link_density,
    get_next_node,
    get_row_and_column_count,
    get_text_content,
    has_ancestor_tag,
    has_single_tag_inside_element,
    is_phrasing_content,
    is_readability_data_table,
    remove_and_get_next,
    remove_node,
    set_node_tag,
    set_readability_data_table,
    shifting_aware_iter,
)
from .regexes import REGEXPS

_SHARE = re.compile(r"share", re.IGNORECASE)

PRESENTATIONAL_ATTRIBUTES = [
    "align", "background", "bgcolor", "border", "cellpadding", "cellspacing",
    "frame", "hspace", "rules", "style", "valign", "vspace",
]
DEPRECATED_SIZE_ATTRIBUTE_ELEMS = frozenset(["table", "th", "td", "hr", "pre"])


def prep_article(ctx, article: Document) -> Document:
    # C1 + unconditional style clean
    _clean_styles(article)
    _clean(ctx, article, "style")

    # C3: mark data tables before any conditional removal
    _mark_data_tables(article)

    # C4 (first wave) + C2
    _clean_conditionally(ctx, article, "form")
    _clean_conditionally(ctx, article, "fieldset")
    _clean_many(ctx, article, ("object", "embed", "h1", "footer", "link", "aside"))

    # C5: share widgets, per top-level child
    for child in article.child_nodes:
        _clean_matched_nodes(child, _SHARE)

    # C6: duplicate-title h2
    h2s = article.get_elements_by_tag_name("h2")
    if len(h2s) == 1:
        title = ctx.title or ""
        h2_text = h2s[0].text_content
        length_similar_rate = (len(h2_text) - len(title)) / max(len(title), 1)
        if abs(length_similar_rate) < 0.5:
            if length_similar_rate > 0:
                titles_match = title in h2_text if title else False
            else:
                titles_match = h2_text in title
            if titles_match:
                _clean(ctx, article, "h2")

    _clean_many(ctx, article, ("iframe", "input", "textarea", "select", "button"))
    _clean_headers(ctx, article)

    # C4 (second wave): tables/lists/divs last
    _clean_conditionally(ctx, article, "table")
    _clean_conditionally(ctx, article, "ul")
    _clean_conditionally(ctx, article, "div")

    # C8: empty paragraphs
    _clean_extra_paragraphs(article)

    # C9: <br> before <p>
    for br in article.get_elements_by_tag_name("br"):
        nxt = br.next
        if nxt is not None and nxt.node_type == ELEMENT_NODE and nxt.tag == "p":
            remove_node(br)

    # C10: single-cell table unwrap
    for table in shifting_aware_iter(article, "table"):
        if table is None or table.parent is None:
            continue
        tbody = (
            get_first_element_child(table)
            if has_single_tag_inside_element(table, "tbody")
            else table
        )
        if tbody is not None and has_single_tag_inside_element(tbody, "tr"):
            row = get_first_element_child(tbody)
            if row is not None and has_single_tag_inside_element(row, "td"):
                cell = get_first_element_child(row)
                if cell is not None:
                    all_phrasing = all(
                        is_phrasing_content(c) for c in cell.child_nodes
                    )
                    cell = set_node_tag(cell, "p" if all_phrasing else "div")
                    parent = table.parent
                    parent.insert_before(cell, table)
                    table.detach()

    return article


def _mark_data_tables(article: Document) -> None:
    # src/Readability.php:1299-1357
    for table in article.get_elements_by_tag_name("table"):
        if table.get_attribute("role") == "presentation":
            set_readability_data_table(table, False)
            continue
        if table.get_attribute("datatable") == "0":
            set_readability_data_table(table, False)
            continue
        if table.get_attribute("summary"):
            set_readability_data_table(table, True)
            continue
        caption = next(table.iter_desc("caption"), None)
        if caption is not None and caption.first_child is not None:
            set_readability_data_table(table, True)
            continue
        found = False
        for desc_tag in ("col", "colgroup", "tfoot", "thead", "th"):
            if next(table.iter_desc(desc_tag), None) is not None:
                set_readability_data_table(table, True)
                found = True
                break
        if found:
            continue
        if next(table.iter_desc("table"), None) is not None:
            set_readability_data_table(table, False)
            continue
        rows, columns = get_row_and_column_count(table)
        if rows >= 10 or columns > 4:
            set_readability_data_table(table, True)
            continue
        set_readability_data_table(table, rows * columns > 10)


def _clean_styles(node: Node) -> None:
    # C1 — src/Readability.php:1359-1390; skips <svg> subtrees
    if node.node_type == ELEMENT_NODE and node.tag == "svg":
        return
    if node.node_type in (ELEMENT_NODE, 9):
        if node.node_type == ELEMENT_NODE:
            for attr in PRESENTATIONAL_ATTRIBUTES:
                node.remove_attribute(attr)
            if node.tag in DEPRECATED_SIZE_ATTRIBUTE_ELEMS:
                node.remove_attribute("width")
                node.remove_attribute("height")
        cur = node.first_child
        while cur is not None:
            _clean_styles(cur)
            cur = cur.next


def _clean_matched_nodes(node: Node, regex) -> None:
    # C5 — src/Readability.php:1392-1412
    end_of_search = get_next_node(node, True)
    nxt = get_next_node(node)
    while nxt is not None and nxt is not end_of_search:
        if nxt.node_type == ELEMENT_NODE and regex.search(
            f"{nxt.get_attribute('class')} {nxt.get_attribute('id')}"
        ):
            nxt = remove_and_get_next(nxt)
        else:
            nxt = get_next_node(nxt)


def _clean_extra_paragraphs(article: Document) -> None:
    # C8 — src/Readability.php:1414-1439, reverse iteration
    paragraphs = article.get_elements_by_tag_name("p")
    for paragraph in reversed(paragraphs):
        c = count_desc(paragraph, ("img", "embed", "object", "iframe"))
        if (
            c["img"] + c["embed"] + c["object"] + c["iframe"] == 0
            and REGEXPS["nonWhitespace"].search(paragraph.text_content) is None
        ):
            remove_node(paragraph)


def _clean_conditionally(ctx, article: Document, tag: str) -> None:
    # C4 — src/Readability.php:1441-1526
    if not ctx.flags["clean_conditionally"]:
        return
    is_list = tag in ("ul", "ol")
    nodes = article.get_elements_by_tag_name(tag)
    for node in reversed(nodes):
        if node.parent is None:
            continue  # already removed inside a removed subtree
        if has_ancestor_tag(node, "table", -1, is_readability_data_table):
            continue
        weight = 0
        if ctx.flags["weight_classes"]:
            weight = get_class_weight(node)
        if weight < 0:
            remove_node(node)
            continue
        if get_text_content(node).count(",") < 10:
            c = count_desc(node, ("p", "img", "li", "input", "embed"))
            p = c["p"]
            img = c["img"]
            li = c["li"] - 100  # literal (:1495)
            inputs = c["input"]

            embed_count = 0
            if c["embed"]:
                for embed_node in node.get_elements_by_tag_name("embed"):
                    if REGEXPS["videos"].search(serialize(embed_node)):
                        embed_count += 1

            link_density = get_link_density(node)
            content_length = len(get_text_content(node, True))

            have_to_remove = (
                (img > 1 and p / img < 0.5 and not has_ancestor_tag(node, "figure"))
                or (not is_list and li > p)
                or (inputs > math.floor(p / 3))
                or (
                    not is_list
                    and content_length < 25
                    and (img == 0 or img > 2)
                    and not has_ancestor_tag(node, "figure")
                )
                or (not is_list and weight < 25 and link_density > 0.2)
                or (weight >= 25 and link_density > 0.5)
                or ((embed_count == 1 and content_length < 75) or embed_count > 1)
            )
            if have_to_remove:
                remove_node(node)


def _clean(ctx, article: Document, tag: str) -> None:
    _clean_many(ctx, article, (tag,))


def _attached(node: Node, root: Document) -> bool:
    p = node.parent
    while p is not None:
        if p is root:
            return True
        p = p.parent
    return False


def _clean_many(ctx, article: Document, tags: tuple) -> None:
    # C2 — src/Readability.php:1537-1568; embeds survive if the videos regex
    # matches any attribute value or the serialized body.  One article walk
    # collects candidates for ALL tags (the reference walks once per tag);
    # removal then proceeds per tag in call order, reverse document order,
    # skipping nodes whose subtree was already detached — semantics
    # identical to re-querying between tags.
    by_tag: dict = {t: [] for t in tags}
    for el in article.iter_desc():
        if el.tag in by_tag:
            by_tag[el.tag].append(el)
    for tag in tags:
        is_embed = tag in ("object", "embed", "iframe")
        for item in reversed(by_tag[tag]):
            if item.parent is None or (len(tags) > 1 and not _attached(item, article)):
                continue
            if is_embed:
                attribute_values = "|".join(item.attrs.values())
                if REGEXPS["videos"].search(attribute_values):
                    continue
                if REGEXPS["videos"].search(serialize(item)):
                    continue
            remove_node(item)


def _clean_headers(ctx, article: Document) -> None:
    # C7 — src/Readability.php:1570-1595 (h1, h2 with negative class weight)
    for header_index in (1, 2):
        for header in article.get_elements_by_tag_name(f"h{header_index}"):
            weight = 0
            if ctx.flags["weight_classes"]:
                weight = get_class_weight(header)
            if weight < 0:
                remove_node(header)


def _clean_classes(node: Node) -> None:
    # C11 — src/Readability.php:1597-1617
    if node.node_type == ELEMENT_NODE and node.get_attribute("class") != "":
        node.remove_attribute("class")
    child = get_first_element_child(node) if node.node_type in (ELEMENT_NODE, 9) else None
    while child is not None:
        _clean_classes(child)
        nxt = child.next
        # reference iterates nextSibling over all node kinds; only elements
        # carry classes, so walk elements
        while nxt is not None and nxt.node_type != ELEMENT_NODE:
            nxt = nxt.next
        child = nxt


def post_process_content(ctx, article: Document) -> Document:
    # C12 — src/Readability.php:1619-1670
    if ctx.config.fix_relative_urls:
        for link in article.get_elements_by_tag_name("a"):
            href = link.get_attribute("href")
            if href:
                if href.startswith("javascript:"):
                    if link.parent is not None:
                        text = Text(link.text_content)
                        link.parent.insert_before(text, link)
                        link.detach()
                else:
                    link.set_attribute("href", ctx.to_absolute_uri(href))
        for img in article.get_elements_by_tag_name("img"):
            src = next(
                (
                    v
                    for v in (
                        img.get_attribute("src"),
                        img.get_attribute("data-src"),
                        img.get_attribute("data-original"),
                        img.get_attribute("data-orig"),
                        img.get_attribute("data-url"),
                    )
                    if v
                ),
                None,
            )
            if src:
                img.set_attribute("src", ctx.to_absolute_uri(src))

    _clean_classes(article)
    return article
