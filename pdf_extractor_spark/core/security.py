"""XSS / injection screening.

Pattern set and rejection semantics follow the reference
(/root/reference/api.py:384-472): a single match anywhere in a document's
text rejects the *entire* document.  In this engine a "document" is a
conversation, so one flagged turn rejects every chunk of its conversation
(enforced by an anti-join in the pipeline, see plans/pipeline.py).

Patterns are compiled once at import with IGNORECASE|DOTALL, matching the
reference's ``re.search(pattern, text, re.IGNORECASE | re.DOTALL)`` call
(api.py:391-397).
"""

from __future__ import annotations

import re

# (pattern, reason) pairs — ordered most-specific-first like api.py:407-453.
_RAW_PATTERNS: list[tuple[str, str]] = [
    (r"<\s*script[\s\S]*?>", "HTML <script> tag"),
    (r"</\s*script\s*>", "HTML </script> tag"),
    (r'<[^>]+\s+on\w+\s*=\s*["\']?[^"\'>\s]', "HTML event handler (onXxx=)"),
    (r"(?:javascript|vbscript|livescript|mocha)\s*:", "javascript:/vbscript: URI scheme"),
    (
        r"data\s*:\s*(?:text/html|application/javascript|text/javascript)",
        "data: URI with executable MIME type",
    ),
    (r"<\s*(?:iframe|object|embed|applet)[\s>]", "Embedded frame/object/applet tag"),
    (r"<\s*svg[\s\S]*?(?:onload|onerror|onclick)\s*=", "SVG with event handler"),
    (r"document\s*\.\s*(?:cookie|write|writeln|location|domain)", "DOM manipulation (document.x)"),
    (r"(?:\.innerHTML|\.outerHTML|\.insertAdjacentHTML)\s*=", "innerHTML/outerHTML assignment"),
    (r"\beval\s*\(", "eval() call"),
    (r'\bsetTimeout\s*\(\s*["\']', "setTimeout with string argument"),
    (r'\bsetInterval\s*\(\s*["\']', "setInterval with string argument"),
    (r"\bFunction\s*\(", "Function() constructor"),
    (r"window\s*\.\s*location\s*(?:=|\.href\s*=|\.replace\s*\()", "window.location redirect"),
    (r"(?:&#x?0*(?:3[Cc]|60)\s*;?\s*){1,}s\s*c\s*r\s*i\s*p\s*t", "HTML-entity-encoded <script"),
    (r"(?:amF2YXNjcmlwdA|amF2YXNjcmlwdDo)", "Base64-encoded javascript:"),
    (r"/(?:JavaScript|JS)\s*[(<\[]", "PDF /JavaScript action"),
    (r"/(?:OpenAction|AA)\s*[(<\[]", "PDF /OpenAction or /AA trigger"),
    (r"/URI\s*\([^)]*javascript:", "PDF /URI with javascript: scheme"),
    (r"/Launch\s*[(<\[]", "PDF /Launch action (arbitrary command execution)"),
    (r"/SubmitForm\s*[(<\[]", "PDF /SubmitForm action"),
    (r"/ImportData\s*[(<\[]", "PDF /ImportData action"),
    (r"/RichMedia\s*[(<\[]", "PDF /RichMedia (Flash) action"),
]

XSS_PATTERNS: list[tuple[re.Pattern, str]] = [
    (re.compile(pat, re.IGNORECASE | re.DOTALL), why) for pat, why in _RAW_PATTERNS
]

# Single alternation for the boolean fast path: one scan instead of 23.
# Boolean-equivalent to trying each pattern in turn (match positions may
# differ but "matches anywhere" cannot).
_COMBINED = re.compile(
    "|".join(f"(?:{pat})" for pat, _ in _RAW_PATTERNS), re.IGNORECASE | re.DOTALL
)

# Literal trigger substrings (lowercased) — every pattern above requires at
# least one of these to appear, so text containing none of them can never
# match.  ``in`` checks run at memchr speed, making the clean-text hot path
# ~20× cheaper than the 23-way regex alternation.
_TRIGGERS = (
    "<", "script", "mocha", "data", "eval", "settimeout", "setinterval",
    "function", "document", "window", "html", "&#", "amf2", "/js",
    "/javascript", "/openaction", "/aa", "/uri", "/launch", "/submitform",
    "/importdata", "/richmedia",
)


def _maybe_dangerous(text: str) -> bool:
    low = text.lower()
    return any(t in low for t in _TRIGGERS)


def scan_dangerous(text: str) -> tuple[bool, str | None]:
    """Return ``(flagged, reason)`` for the first matching injection pattern.

    Parity: api.py:384-399 (``detect_dangerous_content``) — same first-match
    reason ordering; the trigger/combined pre-scans only short-circuit text
    that cannot match any pattern.
    """
    if not text or not _maybe_dangerous(text) or not _COMBINED.search(text):
        return False, None
    for pattern, why in XSS_PATTERNS:
        if pattern.search(text):
            return True, why
    return False, None


def is_dangerous(text: str) -> bool:
    return (
        bool(text)
        and _maybe_dangerous(text)
        and _COMBINED.search(text) is not None
    )


# F3 warn-level structure validation (api.py:299-350): the reference LOGS
# the presence of the /JavaScript and /EmbeddedFiles names without
# rejecting (rejection needs the action-invocation form, e.g.
# "/JavaScript (" — covered by the patterns above).  Warn hits surface as
# a counter in the lineage roll-up, mirroring the reference's warning log.
STRUCT_WARN_PATTERNS: list[tuple[re.Pattern, str]] = [
    (re.compile(r"/JavaScript\b", re.IGNORECASE), "PDF /JavaScript name present"),
    (re.compile(r"/EmbeddedFiles\b", re.IGNORECASE), "PDF /EmbeddedFiles name present"),
]


def count_structure_warnings(text: str) -> int:
    """Number of distinct warn-level structure flags present (0-2)."""
    if not text or "/" not in text:
        return 0
    return sum(1 for pat, _why in STRUCT_WARN_PATTERNS if pat.search(text))
