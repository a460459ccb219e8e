"""Mutable DOM tree for the extraction kernel.

This environment has no lxml, so the kernel runs on this hand-rolled DOM: a
doubly-linked mutable tree designed for the reference's access pattern
(depth-first walks with in-place deletion/retagging — ``src/Nodes/
NodeUtility.php:100-160``).  Linked siblings make ``remove_and_get_next`` and
``get_next_node`` O(1), which matters because the kernel runs once per row
inside an Arrow batch on a Spark Python worker.

Node taxonomy mirrors the pieces of PHP's DOM the reference touches:
Element / Text / Comment / Document (``src/Nodes/DOM/*.php``).  The mutable
``content_score`` / ``initialized`` per-node state of the reference's
``NodeTrait`` (``src/Nodes/NodeTrait.php:21-28``) lives directly on Element —
per-document trees are private to one UDF invocation, so plain attributes are
safe and fast.
"""

from __future__ import annotations

from typing import Iterator, Optional

ELEMENT_NODE = 1
TEXT_NODE = 3
COMMENT_NODE = 8
DOCUMENT_NODE = 9

# Global structural-mutation counter (per-process; trees are private to one
# kernel invocation).  Lets snapshot-based iterators (X4) skip re-querying
# when nothing changed — turns the reference's O(n·rescan) pattern into
# O(n) on the common no-mutation path with identical visit semantics.
_mutation_epoch = 0


def mutation_epoch() -> int:
    return _mutation_epoch


def _bump_epoch() -> None:
    """For in-place Text.data mutation (parser text merging)."""
    global _mutation_epoch
    _mutation_epoch += 1


class Node:
    __slots__ = ("parent", "prev", "next")

    node_type: int = 0

    def __init__(self) -> None:
        self.parent: Optional[Element] = None
        self.prev: Optional[Node] = None
        self.next: Optional[Node] = None

    # --- tree surgery -----------------------------------------------------
    def detach(self) -> "Node":
        """Unlink from parent; returns self."""
        p = self.parent
        if p is None:
            return self
        global _mutation_epoch
        _mutation_epoch += 1
        if self.prev is not None:
            self.prev.next = self.next
        else:
            p.first_child = self.next
        if self.next is not None:
            self.next.prev = self.prev
        else:
            p.last_child = self.prev
        self.parent = None
        self.prev = None
        self.next = None
        return self

    # --- text -------------------------------------------------------------
    @property
    def text_content(self) -> str:
        return ""

    # PHP DOM nodeValue ~ textContent for the node kinds the kernel reads.
    @property
    def node_value(self) -> str:
        return self.text_content

    def has_ancestor(self, node: "Element") -> bool:
        p = self.parent
        while p is not None:
            if p is node:
                return True
            p = p.parent
        return False


class Text(Node):
    __slots__ = ("data",)
    node_type = TEXT_NODE

    def __init__(self, data: str = "") -> None:
        # Node.__init__ inlined: one Python frame per Text node, and the
        # tokenizer builds tens of thousands of them per large page
        self.parent = None
        self.prev = None
        self.next = None
        self.data = data

    @property
    def text_content(self) -> str:
        return self.data

    def __repr__(self) -> str:  # pragma: no cover
        return f"Text({self.data[:30]!r})"


class Comment(Node):
    __slots__ = ("data",)
    node_type = COMMENT_NODE

    def __init__(self, data: str = "") -> None:
        super().__init__()
        self.data = data

    @property
    def text_content(self) -> str:
        # PHP DOMComment::$textContent is the comment data, but the kernel
        # never aggregates comments into element text (libxml doesn't either).
        return ""

    def __repr__(self) -> str:  # pragma: no cover
        return f"Comment({self.data[:30]!r})"


class Element(Node):
    __slots__ = ("tag", "attrs", "first_child", "last_child",
                 "content_score", "initialized", "_tc_epoch", "_tc_val",
                 "_nt_epoch", "_nt_val", "_ll_epoch", "_ll_val")
    node_type = ELEMENT_NODE

    def __init__(self, tag: str, attrs: Optional[dict] = None) -> None:
        # Node.__init__ inlined (see Text.__init__)
        self.parent = None
        self.prev = None
        self.next = None
        self.tag = tag
        self.attrs: dict = attrs if attrs is not None else {}
        self.first_child: Optional[Node] = None
        self.last_child: Optional[Node] = None
        # NodeTrait state (src/Nodes/NodeTrait.php:21-28)
        self.content_score: float = 0.0
        self.initialized: bool = False
        self._tc_epoch: int = -1
        self._tc_val: str = ""
        # normalized-text cache (filled by kernel.nodeutil.get_text_content)
        self._nt_epoch: int = -1
        self._nt_val: str = ""
        # subtree link-text-length cache (kernel.nodeutil.subtree_link_len)
        self._ll_epoch: int = -1
        self._ll_val: int = 0

    # --- children ---------------------------------------------------------
    def append_child(self, node: Node) -> Node:
        global _mutation_epoch
        _mutation_epoch += 1
        if node.parent is not None:
            node.detach()
        node.parent = self
        node.prev = self.last_child
        node.next = None
        if self.last_child is not None:
            self.last_child.next = node
        else:
            self.first_child = node
        self.last_child = node
        return node

    def insert_before(self, node: Node, ref: Optional[Node]) -> Node:
        if ref is None:
            return self.append_child(node)
        assert ref.parent is self
        global _mutation_epoch
        _mutation_epoch += 1
        if node.parent is not None:
            node.detach()
        node.parent = self
        node.next = ref
        node.prev = ref.prev
        if ref.prev is not None:
            ref.prev.next = node
        else:
            self.first_child = node
        ref.prev = node
        return node

    def replace_child(self, new: Node, old: Node) -> Node:
        """Insert ``new`` where ``old`` is; detach ``old``."""
        assert old.parent is self
        self.insert_before(new, old)
        old.detach()
        return old

    def remove_child(self, node: Node) -> Node:
        assert node.parent is self
        return node.detach()

    @property
    def child_nodes(self) -> list[Node]:
        """Snapshot list of children (PHP's live NodeList semantics are
        replicated where needed by re-snapshotting — see X4)."""
        out = []
        n = self.first_child
        while n is not None:
            out.append(n)
            n = n.next
        return out

    def iter_children(self) -> Iterator[Node]:
        n = self.first_child
        while n is not None:
            nxt = n.next  # survive removal of n during iteration
            yield n
            n = nxt

    @property
    def has_children(self) -> bool:
        return self.first_child is not None

    # --- descendants ------------------------------------------------------
    def iter_desc(self, tag: Optional[str] = None) -> Iterator["Element"]:
        """Document-order descendant elements (excluding self); snapshot-free
        generator — callers that mutate must materialize with list().
        Iterative (single generator frame): profiling showed the recursive
        delegation version dominating kernel time at 2.6M frames/89 docs."""
        n = self.first_child
        if n is None:
            return
        # type(n) is Element: instance-exact check beats the node_type
        # class-attribute lookup; Document (the only Element subclass) is
        # the tree root and can never appear as a descendant
        stack: list = []
        while True:
            if type(n) is Element:
                if tag is None or n.tag == tag:
                    yield n  # type: ignore[misc]
                if n.first_child is not None:
                    if n.next is not None:
                        stack.append(n.next)
                    n = n.first_child
                    continue
            if n.next is not None:
                n = n.next
            elif stack:
                n = stack.pop()
            else:
                return

    def get_elements_by_tag_name(self, tag: str) -> list["Element"]:
        """Materialized descendant list; '*' matches all elements
        (PHP DOMDocument::getElementsByTagName semantics).  Direct list
        builder — the generator version spent ~1s/89 docs on frame
        resumption alone in the kernel's hot scans."""
        out: list[Element] = []
        n = self.first_child
        if n is None:
            return out
        match_all = tag == "*"
        stack: list = []
        append = out.append
        while True:  # type-exact check: see iter_desc
            if type(n) is Element:
                if match_all or n.tag == tag:
                    append(n)  # type: ignore[arg-type]
                if n.first_child is not None:
                    if n.next is not None:
                        stack.append(n.next)
                    n = n.first_child
                    continue
            if n.next is not None:
                n = n.next
            elif stack:
                n = stack.pop()
            else:
                return out

    # --- attributes (PHP getAttribute returns '' when missing) ------------
    def get_attribute(self, name: str) -> str:
        return self.attrs.get(name, "")

    def set_attribute(self, name: str, value: str) -> None:
        self.attrs[name] = value

    def has_attribute(self, name: str) -> bool:
        return name in self.attrs

    def remove_attribute(self, name: str) -> None:
        self.attrs.pop(name, None)

    # --- text -------------------------------------------------------------
    @property
    def text_content(self) -> str:
        # Iterative stack walk: recursion-free (pathological HTML nests
        # deep).  Cached per mutation epoch, and the walk both REUSES
        # descendant caches that are current (skipping their subtrees) and
        # POPULATES the cache of every element it completes — so within one
        # epoch the scoring pass's many overlapping queries (each <p>, then
        # its ancestors, then link densities) share all subtree work.
        # Pure memoization: traversal order and concatenation are identical
        # to the uncached walk, so output bytes are unchanged.
        if self._tc_epoch == _mutation_epoch:
            return self._tc_val
        parts: list[str] = []
        # open elements whose subtree is being accumulated: (elem, start)
        fin: list[tuple[Element, int]] = []
        n = self.first_child
        while True:
            while n is not None:
                t = type(n)  # type-exact checks: see iter_desc
                if t is Text:
                    parts.append(n.data)  # type: ignore[union-attr]
                    n = n.next
                elif t is Element:
                    if n._tc_epoch == _mutation_epoch:  # type: ignore[union-attr]
                        parts.append(n._tc_val)  # type: ignore[union-attr]
                        n = n.next
                    elif n.first_child is not None:
                        fin.append((n, len(parts)))  # type: ignore[arg-type]
                        n = n.first_child
                    else:
                        n._tc_epoch = _mutation_epoch  # type: ignore[union-attr]
                        n._tc_val = ""  # type: ignore[union-attr]
                        n = n.next
                else:
                    n = n.next
            if not fin:
                break
            e, start = fin.pop()
            k = len(parts) - start
            if k == 0:
                val = ""
            elif k == 1:
                val = parts[start]
            else:
                val = "".join(parts[start:])
                del parts[start:]
                parts.append(val)
            e._tc_epoch = _mutation_epoch
            e._tc_val = val
            n = e.next
        val = "".join(parts)
        self._tc_epoch = _mutation_epoch
        self._tc_val = val
        return val

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{self.tag} {self.attrs!r}>"


def deep_clone(node: "Node") -> "Node":
    """Structural deep copy (fresh score/init state, like a re-parse).
    Iterative; used by the retry loop to avoid re-tokenizing the raw HTML
    on attempts 3+ (the PHP reference re-parses because PHP DOM cloning
    shares state — src/Readability.php:242-244; ours doesn't)."""
    def shallow(n: "Node") -> "Node":
        t = n.node_type
        if t == ELEMENT_NODE:
            return Element(n.tag, dict(n.attrs))  # type: ignore[union-attr]
        if t == TEXT_NODE:
            return Text(n.data)  # type: ignore[union-attr]
        if t == COMMENT_NODE:
            return Comment(n.data)  # type: ignore[union-attr]
        return Document()

    root_copy = shallow(node)
    stack: list = [(node, root_copy)]
    while stack:
        src, dst = stack.pop()
        child = getattr(src, "first_child", None)
        while child is not None:
            c = shallow(child)
            dst.append_child(c)
            if child.node_type in (ELEMENT_NODE, DOCUMENT_NODE) and child.first_child is not None:
                stack.append((child, c))
            child = child.next
    return root_copy


class Document(Element):
    """Root container. ``tag`` is the pseudo-tag '#document' so generic
    element code can treat it uniformly (the reference's rateNodes builds a
    fresh DOMDocument and appendChild()s article content into it —
    src/Readability.php:1109-1118)."""
    __slots__ = ()
    node_type = DOCUMENT_NODE

    def __init__(self) -> None:
        super().__init__("#document")

    def create_element(self, tag: str) -> Element:
        return Element(tag)

    def create_text_node(self, data: str) -> Text:
        return Text(data)

    @property
    def body(self) -> Optional[Element]:
        for el in self.iter_desc("body"):
            return el
        return None
