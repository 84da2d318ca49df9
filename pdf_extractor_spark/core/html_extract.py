"""HTML main-content extraction via DOM-heuristic block scoring.

The north rule requires "HTML boilerplate strip … DOM heuristics (text
density, link density, tag depth)" alongside the reference's PDF layout
parse.  The reference itself has no HTML path (its input is PDF), so this
module defines the engine's deterministic HTML analog, modeled on the
published boilerplate-removal heuristics (Kohlschütter et al., "Boilerplate
Detection Using Shallow Text Features", WSDM 2010):

* block segmentation at block-level elements, tag depth recorded per block;
* subtree pruning of structural boilerplate containers
  (nav/header/footer/aside/form/script/style/...);
* per-block link density = chars inside <a> / total chars;
* keep rule: a block survives when its text is long enough for its link
  density tier (dense text wins, link farms lose), headings always survive.

Pure stdlib (html.parser) + ``re`` — runs identically in the oracle and in
Arrow-batched pandas UDFs.  Never raises on malformed markup.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# Elements that open a new text block.
_BLOCK_TAGS = frozenset(
    "p div section article main li dt dd h1 h2 h3 h4 h5 h6 td th blockquote "
    "pre figcaption summary caption tr ul ol table body".split()
)
# Subtrees that are dropped wholesale (structural boilerplate).
_PRUNE_TAGS = frozenset(
    "script style noscript template nav header footer aside form button "
    "select option iframe svg canvas".split()
)
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
_VOID_TAGS = frozenset("br hr img input meta link area base col embed source track wbr".split())

# Keep thresholds: (max_link_density, min_chars) tiers — a block with link
# density ≤ d survives if it has at least the paired char count.  Blocks
# denser than the last tier are boilerplate regardless of length.
_KEEP_TIERS: tuple[tuple[float, int], ...] = ((0.2, 25), (0.5, 80))
_MIN_HEADING_CHARS = 3

_WS = re.compile(r"\s+")
_TAGLIKE = re.compile(
    r"<\s*/?\s*(?:html|head|body|div|p|a|span|ul|ol|li|h[1-6]|table|tr|td|th|"
    r"br|hr|article|section|nav|header|footer|img|strong|em|b|i|title|meta)\b",
    re.IGNORECASE,
)


def looks_like_html(text: str) -> bool:
    """Cheap deterministic dispatch: ≥ 2 recognisable tags → HTML path."""
    if "<" not in text:
        return False
    hits = _TAGLIKE.findall(text[:20_000])
    return len(hits) >= 2


class _BlockHarvester(HTMLParser):
    """Stream HTML into (text, depth, link_chars, is_heading) blocks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int, bool]] = []
        self._depth = 0
        self._prune = 0
        self._anchor = 0
        self._buf: list[str] = []
        self._buf_link_chars = 0
        self._block_depth = 0
        self._block_heading = False

    def _flush(self) -> None:
        text = _WS.sub(" ", "".join(self._buf)).strip()
        if text:
            self.blocks.append((text, self._block_depth, self._buf_link_chars, self._block_heading))
        self._buf = []
        self._buf_link_chars = 0
        self._block_heading = False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _PRUNE_TAGS:
            self._prune += 1
        if tag not in _VOID_TAGS:
            self._depth += 1
        if tag == "a":
            self._anchor += 1
        if tag in _BLOCK_TAGS and not self._prune:
            self._flush()
            self._block_depth = self._depth
            self._block_heading = tag in _HEADING_TAGS
        if tag == "br" and not self._prune:
            self._buf.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in _BLOCK_TAGS and not self._prune:
            self._flush()
        if tag == "a" and self._anchor:
            self._anchor -= 1
        if tag not in _VOID_TAGS and self._depth:
            self._depth -= 1
        if tag in _PRUNE_TAGS and self._prune:
            self._prune -= 1

    def handle_data(self, data: str) -> None:
        if self._prune or not data:
            return
        self._buf.append(data)
        if self._anchor:
            self._buf_link_chars += len(data.strip())

    def close(self) -> None:  # flush trailing text outside any block tag
        super().close()
        self._flush()


def score_block(text: str, link_chars: int, is_heading: bool) -> bool:
    """Keep/drop verdict for one block (the DOM-heuristic score)."""
    n = len(text)
    if is_heading:
        return n >= _MIN_HEADING_CHARS
    density = link_chars / n if n else 1.0
    for max_density, min_chars in _KEEP_TIERS:
        if density <= max_density:
            return n >= min_chars
    return False


def extract_html_main_content(markup: str) -> str:
    """Boilerplate-stripped main content, blocks joined with blank lines."""
    parser = _BlockHarvester()
    try:
        parser.feed(markup)
        parser.close()
    except Exception:
        # Malformed markup must never kill a 10^12-turn job; salvage what
        # was harvested before the failure.
        parser._flush()
    kept = [text for text, _depth, link_chars, heading in parser.blocks
            if score_block(text, link_chars, heading)]
    return "\n\n".join(kept)
