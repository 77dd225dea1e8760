"""HTML cleaning — the pa2 extraction semantics (M11 + D6) on stdlib only.

Re-creates the behavior of the reference's
``pa2/implementation-extraction/html_cleaner.py:9-93`` without BeautifulSoup
(not available in this environment): a minimal DOM built with
``html.parser.HTMLParser``, then the same cleaning pipeline —

* extract + remove the first ``.breadcrumbs`` element (ref :51-55),
* prefer the first ``.block.block-system`` container, else the whole
  document, tracking ``used_block`` (ref :57-59),
* strip ``script/style/header/footer/nav`` subtrees (ref :61-62),
* walk block elements ``p div section article li h1-h4`` in document order
  (ref :64-66); each non-empty block becomes one paragraph, where larger
  blocks are split into sub-units on direct children
  ``p span br li h1-h4`` joined by ``SUB_PARAGRAPH_BREAK`` (ref :9-34),
* order-preserving paragraph dedup — D6 (ref :75),
* prepend breadcrumbs, join with ``PARAGRAPH_BREAK`` (ref :77-80),
* drop error pages whose text contains a blacklist phrase (ref :84-91).

Text extraction matches ``get_text(separator=" ", strip=True)``: every text
node is stripped, empties dropped, remainder joined with a single space.
"""

from __future__ import annotations

from html.parser import HTMLParser

PARAGRAPH_BREAK = "\n<<<PARAGRAPH>>>\n"
SUB_PARAGRAPH_BREAK = "\n<<<SUB>>>\n"
ERROR_PHRASES = (
    "page does not exist",
    "zavrnjen dostop",
    "page does not exsist!",
    "pdf",
)

_BLOCK_TAGS = frozenset(["p", "div", "section", "article", "li", "h1", "h2", "h3", "h4"])
_SUB_TAGS = frozenset(["p", "span", "br", "li", "h1", "h2", "h3", "h4"])
_STRIP_TAGS = frozenset(["script", "style", "header", "footer", "nav"])
_VOID_TAGS = frozenset(
    ["area", "base", "br", "col", "embed", "hr", "img", "input",
     "link", "meta", "param", "source", "track", "wbr"]
)


class Node:
    """One element; ``children`` holds child ``Node``s and raw text strings."""

    __slots__ = ("tag", "classes", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs=None, parent: "Node | None" = None):
        self.tag = tag
        self.attrs: dict = attrs or {}
        cls = self.attrs.get("class")
        self.classes = frozenset(cls.split()) if cls else frozenset()
        self.children: list = []
        self.parent = parent


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: v for k, v in attrs if v is not None}, self._stack[-1])
        self._stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        # self-closing: append without pushing, whatever the tag
        self._stack[-1].children.append(
            Node(tag, {k: v for k, v in attrs if v is not None}, self._stack[-1])
        )

    def handle_endtag(self, tag):
        # lenient close: pop back to the nearest matching open tag, like
        # html.parser-backed BeautifulSoup does for mismatched markup
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def parse_html(html: str) -> Node:
    tb = _TreeBuilder()
    tb.feed(html)
    tb.close()
    return tb.root


def iter_nodes(node: Node):
    """Pre-order document-order traversal of element descendants."""
    for c in node.children:
        if isinstance(c, Node):
            yield c
            yield from iter_nodes(c)


def select_by_classes(root: Node, classes) -> Node | None:
    """First element (document order) carrying ALL given classes — the
    behavior of CSS ``.a.b`` via ``select_one``."""
    need = frozenset(classes)
    for n in iter_nodes(root):
        if need <= n.classes:
            return n
    return None


def decompose(node: Node) -> None:
    if node.parent is not None:
        node.parent.children = [
            c for c in node.parent.children if c is not node
        ]
        node.parent = None


def strip_tags(node: Node, names: frozenset) -> None:
    node.children = [
        c for c in node.children if not (isinstance(c, Node) and c.tag in names)
    ]
    for c in node.children:
        if isinstance(c, Node):
            strip_tags(c, names)


def find_all(node: Node, names: frozenset, recursive: bool = True) -> list:
    if recursive:
        return [n for n in iter_nodes(node) if n.tag in names]
    return [c for c in node.children if isinstance(c, Node) and c.tag in names]


def get_text(node: Node, separator: str = " ") -> str:
    """``get_text(separator=" ", strip=True)``: strip each text node, drop
    empties, join with the separator."""
    parts: list[str] = []

    def walk(n: Node) -> None:
        for c in n.children:
            if isinstance(c, Node):
                walk(c)
            else:
                s = c.strip()
                if s:
                    parts.append(s)

    walk(node)
    return separator.join(parts)


def split_subparagraphs(block: Node) -> list[str]:
    """Split larger blocks into sub-units on direct children
    ``p span br li h1-h4``; fall back to the block's whole text
    (ref html_cleaner.py:9-34)."""
    subunits = []
    for child in find_all(block, _SUB_TAGS, recursive=False):
        text = get_text(child)
        if text:
            subunits.append(text)
    if not subunits:
        whole = get_text(block)
        if whole:
            subunits.append(whole)
    return subunits


_CSS_URL_RE = None


def extract_image_urls(html: str) -> list[str]:
    """M3: image-URL extraction in document order — <img src> tags plus CSS
    ``url(...)`` references in style attributes and <style> blocks
    (oldstufffrompa1/crawler.py:447-538), order-preserving-deduped per page
    (the reference skips filenames it already stored for the page)."""
    global _CSS_URL_RE
    if _CSS_URL_RE is None:
        import re

        _CSS_URL_RE = re.compile(r"""url\(\s*['"]?([^'")\s]+)['"]?\s*\)""")
    if not html:
        return []
    out: list[str] = []

    def walk(n: Node) -> None:
        for c in n.children:
            if not isinstance(c, Node):
                continue
            if c.tag == "img":
                src = c.attrs.get("src")
                if src:
                    out.append(src)
            style = c.attrs.get("style")
            if style:
                out.extend(_CSS_URL_RE.findall(style))
            if c.tag == "style":
                out.extend(
                    _CSS_URL_RE.findall("".join(x for x in c.children if isinstance(x, str)))
                )
            walk(c)

    walk(parse_html(html))
    return list(dict.fromkeys(out))


def clean_html(html: str) -> tuple[str | None, bool]:
    """Clean raw HTML to extracted text; returns ``(text | None, used_block)``
    (ref html_cleaner.py:36-93)."""
    if not html:
        return None, False

    root = parse_html(html)

    breadcrumbs_text = None
    bc = select_by_classes(root, ("breadcrumbs",))
    if bc is not None:
        breadcrumbs_text = get_text(bc)
        decompose(bc)

    content = select_by_classes(root, ("block", "block-system"))
    used_block = content is not None
    if content is None:
        content = root

    strip_tags(content, _STRIP_TAGS)

    paragraphs = []
    for block in find_all(content, _BLOCK_TAGS):
        if get_text(block):
            paragraphs.append(SUB_PARAGRAPH_BREAK.join(split_subparagraphs(block)))

    # D6: order-preserving paragraph dedup (ref html_cleaner.py:75)
    paragraphs = list(dict.fromkeys(paragraphs))

    if breadcrumbs_text:
        paragraphs.insert(0, breadcrumbs_text)

    plain_text = PARAGRAPH_BREAK.join(paragraphs).strip()
    if not plain_text:
        return None, used_block
    text_lower = plain_text.lower()
    if any(p in text_lower for p in ERROR_PHRASES):
        return None, used_block
    return plain_text, used_block
