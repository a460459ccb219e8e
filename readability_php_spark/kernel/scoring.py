"""Scoring & candidate selection — A1-A11 (SURVEY.md §2.5).

``rate_nodes`` is the kernel's "group-by + top-k + join": paragraph scoring,
ancestor score propagation, link-density scaling, bounded top-k, consensus
ancestor lift, parent lookahead, only-child climb, and sibling merge into a
fresh output document (``src/Readability.php:906-1198``).

The relational analogues (grouped SUM keyed by ancestor; Window top-k) stay
in-kernel on purpose: the tree is per-row state inside one Arrow batch —
exploding 10^12 docs × 10^3 nodes into a Spark nodes-DataFrame would be a
catastrophic shuffle (see SURVEY.md §1.2).
"""

from __future__ import annotations

import re
from typing import Optional

from ..dom.node import Document, Element, Node
from .cleanup import prep_article
from .nodeutil import (
    filter_text_nodes,
    get_link_density,
    get_node_ancestors,
    get_text_content,
    initialize_node,
    set_node_tag,
)

# src/Readability.php:112-117
ALTER_TO_DIV_EXCEPTIONS = frozenset(["div", "article", "section", "p"])

_SENTENCE_END = re.compile(r"\.( |$)")


def rate_nodes(ctx, nodes: list[Element]):
    """Returns the article content Document, or False-y when no content."""
    weight_classes = ctx.flags["weight_classes"]
    candidates: list[Element] = []

    # --- A1-A4: paragraph scoring + ancestor propagation -------------------
    for node in nodes:
        if node.parent is None:
            continue
        text = get_text_content(node, True)
        if len(text) < 25:
            continue
        ancestors = get_node_ancestors(node)  # default depth 3
        if len(ancestors) == 0:
            continue

        content_score = 1.0
        # PHP explode(',') counts segments = commas + 1 (:940)
        content_score += text.count(",") + 1
        content_score += min(len(text) // 100, 3)

        for level, ancestor in enumerate(ancestors):
            if not ancestor.initialized:
                initialize_node(ancestor, weight_classes)
                candidates.append(ancestor)
            if level == 0:
                divider = 1
            elif level == 1:
                divider = 2
            else:
                divider = level * 3
            ancestor.content_score = ancestor.content_score + content_score / divider

    # --- A5 + A6: link-density scaling and bounded top-k -------------------
    top_candidates: list[Element] = []
    max_top = ctx.config.max_top_candidates
    for candidate in candidates:
        candidate.content_score = candidate.content_score * (
            1 - get_link_density(candidate)
        )
        for i in range(max_top):
            a_top = top_candidates[i] if i < len(top_candidates) else None
            if a_top is None or candidate.content_score > a_top.content_score:
                top_candidates.insert(i, candidate)
                if len(top_candidates) > max_top:
                    top_candidates.pop()
                break

    top_candidate: Optional[Element] = top_candidates[0] if top_candidates else None
    parent_of_top: Optional[Element] = None

    # --- A7: body fallback --------------------------------------------------
    if top_candidate is None or top_candidate.tag == "body":
        new_doc = Document()
        div = Element("div")
        new_doc.append_child(div)
        body = ctx.dom.body
        if body is not None:
            # move all body children into the fresh div (the reference deep-
            # imports copies — we may move, the source DOM is re-parsed on
            # retry and discarded otherwise)
            for kid in body.child_nodes:
                div.append_child(kid)
        top_candidate = div
    else:
        # --- A8: consensus ancestor lift -----------------------------------
        alternative_ancestor_lists = []
        for i in range(1, len(top_candidates)):
            if top_candidates[i].content_score / max(top_candidate.content_score, 0.1) >= 0.75:
                alternative_ancestor_lists.append(
                    get_node_ancestors(top_candidates[i], False)
                )
        MINIMUM_TOPCANDIDATES = 3
        if len(alternative_ancestor_lists) >= MINIMUM_TOPCANDIDATES:
            parent_of_top = top_candidate.parent
            while (
                parent_of_top is not None
                and parent_of_top.tag != "body"
                and parent_of_top.node_type == 1
            ):
                lists_containing = 0
                for anc_list in alternative_ancestor_lists:
                    if parent_of_top in anc_list:
                        lists_containing += 1
                        if lists_containing >= MINIMUM_TOPCANDIDATES:
                            break
                if lists_containing >= MINIMUM_TOPCANDIDATES:
                    top_candidate = parent_of_top
                    break
                parent_of_top = parent_of_top.parent

        # --- A9: parent score lookahead ------------------------------------
        parent_of_top = top_candidate.parent
        last_score = top_candidate.content_score
        score_threshold = last_score / 3
        while parent_of_top is not None and parent_of_top.tag != "body":
            parent_score = parent_of_top.content_score
            if parent_score < score_threshold:
                break
            if parent_score > last_score:
                top_candidate = parent_of_top
                break
            last_score = parent_of_top.content_score
            parent_of_top = parent_of_top.parent

        # --- A10: only-child climb ------------------------------------------
        # The climb never crosses the Document: libxml documents always hold
        # >=2 children (synthesized DTD + html, plus any PI/comments), so the
        # reference's count(filterTextNodes(childNodes))===1 is false there
        # (src/Readability.php:1095-1099).
        parent_of_top = top_candidate.parent
        while (
            parent_of_top is not None
            and parent_of_top.node_type == 1
            and parent_of_top.tag != "body"
            and len(filter_text_nodes(parent_of_top.child_nodes)) == 1
        ):
            top_candidate = parent_of_top
            parent_of_top = top_candidate.parent

    # --- A11: sibling merge -------------------------------------------------
    article_content = Document()
    # (the reference creates-but-never-appends a div here, :1114 — appendees
    # land directly on the document)
    sibling_score_threshold = max(10.0, top_candidate.content_score * 0.2)
    parent_of_top = top_candidate.parent
    siblings = parent_of_top.child_nodes if parent_of_top is not None else [top_candidate]

    has_content = False
    top_class = top_candidate.get_attribute("class")

    for sibling in siblings:
        append = False
        if sibling is top_candidate:
            append = True
        else:
            content_bonus = 0.0
            sib_is_elem = sibling.node_type == 1
            if (
                sib_is_elem
                and sibling.get_attribute("class") == top_class
                and top_class != ""
            ):
                content_bonus += top_candidate.content_score * 0.2
            sib_score = sibling.content_score if sib_is_elem else 0.0
            if sib_score + content_bonus >= sibling_score_threshold:
                append = True
            elif sib_is_elem and sibling.tag == "p":
                link_density = get_link_density(sibling)
                node_content = get_text_content(sibling, True)
                if len(node_content) > 80 and link_density < 0.25:
                    append = True
                elif (
                    node_content
                    and len(node_content) < 80
                    and link_density == 0
                    and _SENTENCE_END.search(node_content)
                ):
                    append = True

        if append:
            has_content = True
            if sibling.node_type == 1 and sibling.tag.lower() not in ALTER_TO_DIV_EXCEPTIONS:
                sibling = set_node_tag(sibling, "div")
            article_content.append_child(sibling)

    article_content = prep_article(ctx, article_content)

    if has_content:
        # M9: text direction from [parent, topCandidate] + parent's ancestors
        anc_chain: list[Node] = [x for x in (parent_of_top, top_candidate) if x is not None]
        if parent_of_top is not None:
            anc_chain.extend(get_node_ancestors(parent_of_top))
        for ancestor in anc_chain:
            if ancestor.node_type != 1:
                continue
            article_dir = ancestor.get_attribute("dir")
            if article_dir:
                ctx.direction = article_dir
                break
        return article_content
    return False
