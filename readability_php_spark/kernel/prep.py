"""Document preparation operators P1-P3 (SURVEY.md §2.3).

- ``remove_scripts`` — P1, src/Readability.php:811-819
- ``prep_document`` — P2 (``<br><br>`` → ``<p>`` rebuild, :826-893) and
  P3 (``<font>`` → ``<span>``, :895-902)
"""

from __future__ import annotations

from ..dom.node import Document, Element
from .nodeutil import (
    is_phrasing_content,
    is_whitespace,
    next_element,
    remove_node,
    set_node_tag,
    shifting_aware_iter,
)


def remove_scripts(doc: Document) -> None:
    for tag in ("script", "noscript"):
        for node in doc.get_elements_by_tag_name(tag):
            remove_node(node)


def prep_document(doc: Document) -> None:
    # P2: collapse <br> chains into <p> blocks (src/Readability.php:826-893)
    for br in shifting_aware_iter(doc, "br"):
        if br is None or br.parent is None:
            continue
        nxt = br.next
        replaced = False
        # consume the whitespace-separated chain of <br>s after this one
        while True:
            nxt = next_element(nxt)
            if nxt is None or not (nxt.node_type == 1 and nxt.tag == "br"):
                break
            replaced = True
            sibling = nxt.next
            remove_node(nxt)
            nxt = sibling
        if replaced:
            p = Element("p")
            parent = br.parent
            parent.insert_before(p, br)
            br.detach()
            # re-parent following phrasing siblings into the new <p> until the
            # next double-<br> or non-phrasing node
            nxt = p.next
            while nxt is not None:
                if nxt.node_type == 1 and nxt.tag == "br":
                    next_elem = next_element(nxt.next)
                    if next_elem is not None and next_elem.node_type == 1 and next_elem.tag == "br":
                        break
                if not is_phrasing_content(nxt):
                    break
                sibling = nxt.next
                p.append_child(nxt)
                nxt = sibling
            while p.last_child is not None and is_whitespace(p.last_child):
                p.remove_child(p.last_child)
            if p.parent is not None and p.parent.node_type == 1 and p.parent.tag == "p":
                set_node_tag(p.parent, "div")

    # P3: font → span, reverse iteration over snapshot (:895-902)
    fonts = doc.get_elements_by_tag_name("font")
    for font in reversed(fonts):
        set_node_tag(font, "span")
