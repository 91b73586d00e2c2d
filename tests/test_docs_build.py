"""The HTML documentation builder (scripts/build_docs.py): every design doc
renders, nav cross-links resolve, and fenced code is highlighted."""

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

import build_docs  # noqa: E402


def test_site_builds_complete_and_linked(tmp_path):
    written = build_docs.build(tmp_path)
    names = {p.name for p in written}
    assert "index.html" in names  # README is the landing page
    # Every markdown design doc gets a page.
    for doc in (REPO / "docs").glob("*.md"):
        if doc.stem != "index":
            assert f"{doc.stem}.html" in names

    index = (tmp_path / "index.html").read_text()
    # Nav lists every page and highlights the current one.
    for name in names:
        assert f'href="{name}"' in index
    assert 'class="current"' in index

    serving = (tmp_path / "serving.html").read_text()
    assert "<table>" in serving  # the p50/p95 table rendered

    # References to site pages were rewritten to page links (markdown links
    # and prose mentions alike), and no nav/page href dangles.
    site_slugs = {name[: -len(".html")] for name in names} - {"index"}
    for page in written:
        html = page.read_text()
        for slug in site_slugs:
            assert f"{slug}.md" not in html, f"{page.name} still says {slug}.md"
        for target in re.findall(r'href="([\w-]+\.html)"', html):
            assert target in names, f"{page.name} links to missing {target}"

    # Fenced code blocks got pygments markup somewhere in the site.
    assert any('class="codehilite"' in p.read_text() for p in written)
