"""DOM parser + serializer unit tests (SURVEY.md §2.1 S1/S5)."""

from readability_php_spark.dom import (
    Document,
    Element,
    Text,
    parse_html,
    serialize,
)


def body(html):
    doc = parse_html(html)
    b = doc.body
    assert b is not None, f"no body for {html!r}"
    return b


class TestParserStructure:
    def test_simple(self):
        b = body("<html><body><p>hello</p></body></html>")
        kids = [n for n in b.child_nodes]
        assert len(kids) == 1
        assert kids[0].tag == "p"
        assert kids[0].text_content == "hello"

    def test_implicit_structure(self):
        b = body("<p>hello</p>")
        assert b.child_nodes[0].tag == "p"

    def test_no_body_for_bare_html(self):
        doc = parse_html("<html>")
        assert doc.body is None

    def test_empty_p_body(self):
        b = body("<html><body><p></p></body></html>")
        assert b.first_child is not None
        assert b.first_child.tag == "p"

    def test_void_elements(self):
        b = body("<p>a<br>b<img src='x.png'>c</p>")
        p = b.first_child
        tags = [getattr(n, "tag", "#text") for n in p.child_nodes]
        assert tags == ["#text", "br", "#text", "img", "#text"]
        assert p.text_content == "abc"

    def test_p_implied_close_by_div(self):
        b = body("<p>one<div>two</div>")
        tags = [n.tag for n in b.child_nodes if n.node_type == 1]
        assert tags == ["p", "div"]
        assert b.child_nodes[0].text_content == "one"

    def test_p_implied_close_by_p(self):
        b = body("<p>one<p>two")
        ps = b.get_elements_by_tag_name("p")
        assert [p.text_content for p in ps] == ["one", "two"]
        assert all(p.parent is b for p in ps)

    def test_li_implied_close(self):
        b = body("<ul><li>a<li>b<li>c</ul>")
        ul = b.first_child
        lis = ul.get_elements_by_tag_name("li")
        assert [li.text_content for li in lis] == ["a", "b", "c"]
        assert all(li.parent is ul for li in lis)

    def test_nested_list_not_broken(self):
        b = body("<ul><li>a<ul><li>a1</li></ul></li><li>b</li></ul>")
        outer = b.first_child
        outer_lis = [n for n in outer.child_nodes if getattr(n, "tag", None) == "li"]
        assert len(outer_lis) == 2
        inner = outer_lis[0].get_elements_by_tag_name("li")
        assert [li.text_content for li in inner] == ["a1"]

    def test_table_cells(self):
        b = body("<table><tr><td>1<td>2<tr><td>3</table>")
        table = b.first_child
        trs = table.get_elements_by_tag_name("tr")
        assert len(trs) == 2
        assert len(trs[0].get_elements_by_tag_name("td")) == 2

    def test_stray_end_tag_ignored(self):
        b = body("<div>a</span></div>")
        assert b.first_child.tag == "div"
        assert b.first_child.text_content == "a"

    def test_head_content(self):
        doc = parse_html(
            "<html><head><title>T</title><meta name='author' content='A'>"
            "</head><body><p>x</p></body></html>"
        )
        titles = doc.get_elements_by_tag_name("title")
        assert len(titles) == 1 and titles[0].text_content == "T"
        metas = doc.get_elements_by_tag_name("meta")
        assert metas[0].get_attribute("name") == "author"

    def test_meta_without_explicit_head(self):
        doc = parse_html("<meta charset='utf-8'><title>T</title><p>x</p>")
        assert len(doc.get_elements_by_tag_name("meta")) == 1
        assert doc.body is not None
        assert doc.body.first_child.tag == "p"

    def test_entities_decoded(self):
        b = body("<p>a &amp; b &lt;c&gt; &nbsp;</p>")
        assert b.first_child.text_content == "a & b <c> \xa0"

    def test_script_raw_content(self):
        b = body("<div><script>if (a < b) { x(); }</script>t</div>")
        sc = b.get_elements_by_tag_name("script")
        assert len(sc) == 1
        assert "a < b" in sc[0].text_content or "a " in sc[0].text_content

    def test_comment_node(self):
        b = body("<div><!-- hi --><p>x</p></div>")
        kids = b.first_child.child_nodes
        assert kids[0].node_type == 8
        assert b.first_child.text_content == "x"

    def test_attrs_lowercased_first_wins(self):
        b = body('<div CLASS="a" class="b">x</div>')
        assert b.first_child.get_attribute("class") == "a"

    def test_deep_nesting_no_recursion_error(self):
        html = "<div>" * 3000 + "deep" + "</div>" * 3000
        b = body(html)
        assert "deep" in b.text_content


class TestTreeSurgery:
    def test_detach_relinks(self):
        b = body("<div><p>1</p><p>2</p><p>3</p></div>")
        div = b.first_child
        p2 = div.child_nodes[1]
        p2.detach()
        kids = div.child_nodes
        assert [k.text_content for k in kids] == ["1", "3"]
        assert kids[0].next is kids[1]
        assert kids[1].prev is kids[0]

    def test_replace_child(self):
        b = body("<div><p>1</p></div>")
        div = b.first_child
        span = Element("span")
        span.append_child(Text("s"))
        div.replace_child(span, div.first_child)
        assert div.first_child.tag == "span"
        assert div.first_child.next is None

    def test_append_moves(self):
        b = body("<div id='a'><p>1</p></div><div id='b'></div>")
        a, bdiv = b.child_nodes[0], b.child_nodes[1]
        p = a.first_child
        bdiv.append_child(p)
        assert a.first_child is None
        assert bdiv.first_child is p
        assert p.parent is bdiv


class TestSerializer:
    def test_roundtrip_basic(self):
        b = body("<p>hello</p>")
        assert serialize(b.first_child) == "<p>hello</p>"

    def test_attr_sorted_and_escaped(self):
        b = body('<a href="x?a=1&amp;b=2" class="k">t</a>')
        assert (
            serialize(b.first_child)
            == '<a class="k" href="x?a=1&amp;b=2">t</a>'
        )

    def test_void_explicit_close(self):
        b = body("<p>a<br>b</p>")
        assert serialize(b.first_child) == "<p>a<br></br>b</p>"

    def test_text_escaping(self):
        d = Document()
        p = Element("p")
        p.append_child(Text("a < b & c > d"))
        d.append_child(p)
        assert serialize(p) == "<p>a &lt; b &amp; c &gt; d</p>"

    def test_comments_omitted(self):
        b = body("<div>a<!--x-->b</div>")
        assert serialize(b.first_child) == "<div>ab</div>"
