from .readability import (  # noqa: F401
    ERROR_INVALID_HTML,
    ERROR_UNPARSEABLE,
    ParseResult,
    Readability,
    extract,
)
