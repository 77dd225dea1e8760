"""HTML cleaner (M11) + paragraph dedup (D6) unit tests.

The first test is the reference's own inline fixture
(pa2/implementation-extraction/html_cleaner.py:96-113); the rest pin each
cleaning rule individually.
"""

from __future__ import annotations

from ieps_crawler_ray.functions.html_clean import (
    PARAGRAPH_BREAK,
    SUB_PARAGRAPH_BREAK,
    clean_html,
)


def test_reference_inline_fixture():
    html = """
    <html>
      <head><title>Sample Page</title></head>
      <body>
        <div class='header'>Welcome to the site!</div>
        <div class='block block-system'>
          <h1>Important Content</h1>
          <p>This is the main section that should be cleaned and extracted.</p>
        </div>
        <div class='footer'>Contact us at support@example.com</div>
      </body>
    </html>
    """
    text, used_block = clean_html(html)
    assert used_block is True
    assert text == (
        "Important Content"
        + PARAGRAPH_BREAK
        + "This is the main section that should be cleaned and extracted."
    )


def test_empty_input():
    assert clean_html("") == (None, False)
    assert clean_html(None) == (None, False)


def test_fallback_without_block_system_strips_chrome():
    html = (
        "<html><head><script>var x=1;</script><style>.a{}</style></head>"
        "<body><header>chrome</header><nav>menu</nav>"
        "<p>Real content here</p>"
        "<footer>foot</footer></body></html>"
    )
    text, used_block = clean_html(html)
    assert used_block is False
    assert text == "Real content here"


def test_breadcrumbs_extracted_and_prepended():
    html = (
        '<body><div class="breadcrumbs">Home &gt; Docs</div>'
        '<div class="block block-system"><p>Body text</p></div></body>'
    )
    text, used_block = clean_html(html)
    assert used_block is True
    assert text == "Home > Docs" + PARAGRAPH_BREAK + "Body text"


def test_breadcrumbs_inside_content_removed_before_walk():
    html = (
        '<div class="block block-system">'
        '<div class="breadcrumbs">A &gt; B</div><p>Hello</p></div>'
    )
    text, _ = clean_html(html)
    assert text == "A > B" + PARAGRAPH_BREAK + "Hello"


def test_subparagraph_split_on_direct_children():
    html = (
        '<div class="block block-system">'
        "<div><p>first part</p><span>second part</span></div></div>"
    )
    text, _ = clean_html(html)
    # the outer div yields the SUB-joined combination; its p child is also a
    # block in its own right (reference walks ALL nested blocks)
    parts = text.split(PARAGRAPH_BREAK)
    assert parts[0] == "first part" + SUB_PARAGRAPH_BREAK + "second part"
    assert "first part" in parts


def test_paragraph_dedup_is_order_preserving():
    html = (
        '<div class="block block-system">'
        "<p>alpha</p><p>beta</p><p>alpha</p><p>gamma</p></div>"
    )
    text, _ = clean_html(html)
    assert text.split(PARAGRAPH_BREAK) == ["alpha", "beta", "gamma"]


def test_error_page_blacklist_case_insensitive():
    for phrase in ["Page Does Not Exist", "ZAVRNJEN dostop", "download the PDF now"]:
        html = f'<div class="block block-system"><p>{phrase}</p></div>'
        assert clean_html(html) == (None, True)


def test_script_style_removed_inside_content():
    html = (
        '<div class="block block-system">'
        "<p>keep<script>drop()</script></p><style>p{}</style></div>"
    )
    text, _ = clean_html(html)
    assert text == "keep"


def test_whole_block_text_when_no_sub_children():
    html = '<div class="block block-system"><div>plain <b>rich</b> text</div></div>'
    text, _ = clean_html(html)
    assert text == "plain rich text"
