"""HTML main-content extraction: text-density / link-density block
classifier (the Boilerpipe/Readability-style DOM boilerplate stripper).

The reference repo is PDF-only; the HTML branch extends its extract stage
to Common-Crawl-style pages per the target input. The block classifier is
the published Boilerpipe ``NumWordsRulesClassifier`` decision rule
(Kohlschütter, Fankhauser, Nejdl: "Boilerplate Detection using Shallow
Text Features", WSDM 2010) over shallow features per block:

- blocks are delimited by block-level tags; ``<script>/<style>/<head>``
  subtrees are dropped outright
- features: ``num_words``, ``link_density`` (fraction of words inside
  ``<a>``), plus a tag prior: blocks inside ``nav/header/footer/aside/
  form`` are forced boilerplate (they still participate as prev/next
  context)
- classification of block *i* uses (prev, curr, next) word counts and
  link densities per the NumWordsRules tree

Extracted text = content-block texts joined with ``"\n"`` — the same
line-per-block shape the PDF branch produces, so the downstream transcript
segmenter treats both uniformly.
"""

from html.parser import HTMLParser

_BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li td th pre blockquote article section
    header footer nav aside main figure figcaption table tr ul ol dl dt dd
    br hr form fieldset address""".split()
)
_SKIP_TAGS = frozenset(["script", "style", "noscript", "head", "svg", "template"])
_BOILER_ANCESTORS = frozenset(["nav", "header", "footer", "aside", "form"])
_VOID_TAGS = frozenset(["br", "hr", "img", "meta", "link", "input"])


class _Block:
    __slots__ = ("words", "linked_words", "forced_boiler")

    def __init__(self, words, linked_words, forced_boiler):
        self.words = words
        self.linked_words = linked_words
        self.forced_boiler = forced_boiler

    @property
    def num_words(self):
        return len(self.words)

    @property
    def link_density(self):
        return (self.linked_words / self.num_words) if self.num_words else 0.0

    @property
    def text(self):
        return " ".join(self.words)


class _BlockParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks = []
        self._words = []
        self._linked = 0
        self._skip_depth = 0
        self._anchor_depth = 0
        self._boiler_depth = 0

    def _flush(self):
        if self._words:
            self.blocks.append(
                _Block(self._words, self._linked, self._boiler_depth > 0)
            )
        self._words = []
        self._linked = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "a":
            self._anchor_depth += 1
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _BOILER_ANCESTORS:
                self._boiler_depth += 1
            if tag in _VOID_TAGS:  # <br>, <hr> self-close
                if tag in _BOILER_ANCESTORS:
                    self._boiler_depth -= 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag in _BLOCK_TAGS:
            self._flush()
            if tag in _BOILER_ANCESTORS:
                self._boiler_depth = max(0, self._boiler_depth - 1)

    def handle_data(self, data):
        if self._skip_depth:
            return
        words = data.split()
        if self._anchor_depth:
            self._linked += len(words)
        self._words.extend(words)

    def close(self):
        super().close()
        self._flush()


_EMPTY = _Block([], 0, False)


def _is_content(prev: _Block, curr: _Block, nxt: _Block) -> bool:
    """Boilerpipe NumWordsRulesClassifier decision tree (public, WSDM'10)."""
    if curr.link_density > 0.333333:
        return False
    if prev.link_density <= 0.555556:
        if curr.num_words <= 16:
            if nxt.num_words <= 15:
                return prev.num_words > 4
            return True
        return True
    if curr.num_words <= 40:
        return nxt.num_words > 17
    return True


def extract_blocks(html: str):
    """Parse HTML → list of (text, num_words, link_density, is_content)."""
    parser = _BlockParser()
    parser.feed(html)
    parser.close()
    blocks = parser.blocks
    out = []
    for i, curr in enumerate(blocks):
        prev = blocks[i - 1] if i > 0 else _EMPTY
        nxt = blocks[i + 1] if i + 1 < len(blocks) else _EMPTY
        keep = (not curr.forced_boiler) and _is_content(prev, curr, nxt)
        out.append((curr.text, curr.num_words, curr.link_density, keep))
    return out


def extract_main_content(html: str) -> str:
    """Main content of an HTML page: classified content blocks joined
    with newlines."""
    return "\n".join(text for text, _, _, keep in extract_blocks(html) if keep)
