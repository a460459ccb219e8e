"""Compiled regex table (operator X1 in SURVEY.md §2.8).

Semantics-equivalent translation of the pattern table at
``src/Nodes/NodeUtility.php:20-36`` in the reference.  Patterns are compiled
once at module import — at Spark scale each Python worker pays this exactly
once per process, then every Arrow batch reuses the compiled objects.
"""

from __future__ import annotations

import re

REGEXPS = {
    "unlikelyCandidates": re.compile(
        r"-ad-|banner|breadcrumbs|combx|comment|community|cover-wrap|disqus|"
        r"extra|foot|header|legends|menu|related|remark|replies|rss|shoutbox|"
        r"sidebar|skyscraper|social|sponsor|supplemental|ad-break|agegate|"
        r"pagination|pager|popup|yom-remote",
        re.IGNORECASE,
    ),
    "okMaybeItsACandidate": re.compile(
        r"and|article|body|column|main|shadow", re.IGNORECASE
    ),
    "extraneous": re.compile(
        r"print|archive|comment|discuss|e[\-]?mail|share|reply|all|login|"
        r"sign|single|utility",
        re.IGNORECASE,
    ),
    "byline": re.compile(r"byline|author|dateline|writtenby|p-author", re.IGNORECASE),
    "replaceFonts": re.compile(r"<(\/?)font[^>]*>", re.IGNORECASE),
    # PHP PCRE \s without /u is ASCII-only — Python's str \s is Unicode-
    # aware, so spell the class out for parity on exotic whitespace
    "normalize": re.compile(r"[ \t\n\r\f\v]{2,}"),
    "videos": re.compile(
        r"\/\/(www\.)?((dailymotion|youtube|youtube-nocookie|player\.vimeo|"
        r"v\.qq)\.com|(archive|upload\.wikimedia)\.org|player\.twitch\.tv)",
        re.IGNORECASE,
    ),
    "nextLink": re.compile(r"(next|weiter|continue|>([^\|]|$)|»([^\|]|$))", re.IGNORECASE),
    "prevLink": re.compile(r"(prev|earl|old|new|<|«)", re.IGNORECASE),
    "whitespace": re.compile(r"^[ \t\n\r\f\v]*$"),
    "hasContent": re.compile(r"\S$"),
    "positive": re.compile(
        r"article|body|content|entry|hentry|h-entry|main|page|pagination|"
        r"post|text|blog|story",
        re.IGNORECASE,
    ),
    "negative": re.compile(
        r"hidden|^hid$| hid$| hid |^hid |banner|combx|comment|com-|contact|"
        r"foot|footer|footnote|masthead|media|meta|outbrain|promo|related|"
        r"scroll|share|shoutbox|sidebar|skyscraper|sponsor|shopping|tags|"
        r"tool|widget",
        re.IGNORECASE,
    ),
    # \xa0 is the unicode version of &nbsp; (reference comment, NodeUtility.php:34)
    "onlyWhitespace": re.compile(r"\xa0|\s+"),
    # complement of onlyWhitespace (\S already excludes \xa0): presence
    # check without materializing a stripped string
    "nonWhitespace": re.compile(r"\S"),
}

# Pre-parse <script> stripper ("summonCthulhu", src/Readability.php:274-277).
# NB: case-sensitive in the reference (no /i flag).
CTHULHU = re.compile(r"<script\b[^>]*>([\s\S]*?)<\/script>")

# Meta-tag property/name matchers (src/Readability.php:297-300).
META_PROPERTY = re.compile(
    r"\s*(dc|dcterm|og|twitter)\s*:\s*"
    r"(author|creator|description|title|image|site_name)(?!:)\s*",
    re.IGNORECASE,
)
META_NAME = re.compile(
    r"^\s*(?:(dc|dcterm|og|twitter|weibo:(article|webpage))\s*[\.:]\s*)?"
    r"(author|creator|description|title|image|site_name)(?!:)\s*$",
    re.IGNORECASE,
)

