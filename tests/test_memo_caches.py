"""Memo caches must be bounded in BYTES, not just entries: keys run up to
4 KB, so an entry cap alone lets an adversarial corpus of distinct large
keys pin hundreds of MB per long-lived Python worker (round-4 advice)."""

from readability_php_spark.dom import parser as parser_mod
from readability_php_spark.kernel import nodeutil, scan


def _reset_tag_cache():
    parser_mod._TAG_CACHE.clear()
    parser_mod._TAG_CACHE_BYTES = 0


def test_tag_cache_byte_budget(monkeypatch):
    _reset_tag_cache()
    monkeypatch.setattr(parser_mod, "_TAG_CACHE_BYTE_CAP", 1000)
    for i in range(50):
        key = f"div class=\"{'x' * 90}{i:04d}\""
        parser_mod._tag_cache_put(key, ("div", (), False, {}))
        assert parser_mod._TAG_CACHE_BYTES <= 1000 + len(key)
    # the cache cleared at least once and never held > cap+one-key bytes
    assert sum(len(k) for k in parser_mod._TAG_CACHE) <= 1000 + 110
    _reset_tag_cache()


def test_tag_cache_still_correct_across_clear(monkeypatch):
    # parse the same doc with a tiny budget (constant clearing) and the
    # default one: identical trees
    html = (
        "<html><body>"
        + "".join(
            f'<p class="c{i} longclassname-{i}">t{i}</p>' for i in range(40)
        )
        + "</body></html>"
    )

    def render(doc):
        from readability_php_spark.dom.serializer import serialize

        return serialize(doc)

    _reset_tag_cache()
    d1 = parser_mod.parse_html(html)
    _reset_tag_cache()
    monkeypatch.setattr(parser_mod, "_TAG_CACHE_BYTE_CAP", 64)
    d2 = parser_mod.parse_html(html)
    assert render(d1) == render(d2)
    _reset_tag_cache()


def test_tag_cache_counts_utf8_bytes(monkeypatch):
    # non-ASCII keys are charged their UTF-8 size, not their code-point
    # count — a 4-bytes-per-char key corpus must hit the cap 4x sooner
    _reset_tag_cache()
    monkeypatch.setattr(parser_mod, "_TAG_CACHE_BYTE_CAP", 10_000)
    key = "div data-x=\"" + "\U0001F600" * 100 + "\""  # ~413 UTF-8 bytes
    parser_mod._tag_cache_put(key, ("div", (), False, {}))
    assert parser_mod._TAG_CACHE_BYTES >= 4 * 100
    _reset_tag_cache()


def test_weight_cache_byte_budget(monkeypatch):
    nodeutil._WEIGHT_CACHE.clear()
    nodeutil._WEIGHT_BYTES = 0
    monkeypatch.setattr(nodeutil, "_WEIGHT_BYTE_CAP", 500)
    for i in range(30):
        nodeutil._string_weight(f"{'y' * 60}{i:03d}")
    assert sum(len(k) for k in nodeutil._WEIGHT_CACHE) <= 500 + 63
    # classification stays correct regardless of clears
    assert nodeutil._string_weight("article-body") == 25
    assert nodeutil._string_weight("comment footer") == -25
    nodeutil._WEIGHT_CACHE.clear()
    nodeutil._WEIGHT_BYTES = 0


def test_scan_cache_byte_budgets(monkeypatch):
    scan._F4_CACHE.clear()
    scan._F4_BYTES = 0
    scan._BYLINE_CACHE.clear()
    scan._BYLINE_BYTES = 0
    monkeypatch.setattr(scan, "_MEMO_BYTE_CAP", 400)
    for i in range(30):
        s = f"{'z' * 50}{i:03d}"
        scan._f4_unlikely(s)
        scan._byline_hit(s)
    assert sum(len(k) for k in scan._F4_CACHE) <= 400 + 53
    assert sum(len(k) for k in scan._BYLINE_CACHE) <= 400 + 53
    # classifications stay correct
    assert scan._f4_unlikely("sidebar comment") is True
    assert scan._f4_unlikely("main article") is False
    assert scan._byline_hit("byline") is True
    scan._F4_CACHE.clear()
    scan._F4_BYTES = 0
    scan._BYLINE_CACHE.clear()
    scan._BYLINE_BYTES = 0
