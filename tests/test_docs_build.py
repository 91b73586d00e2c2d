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
        if not page.name.startswith("api-"):
            # API pages carry literal docstrings, where docs/foo.md is a
            # legitimate repo-path mention; design docs must link instead.
            for slug in site_slugs:
                assert f"{slug}.md" not in html, f"{page.name} says {slug}.md"
        for target in re.findall(r'href="([\w-]+\.html)"', html):
            assert target in names, f"{page.name} links to missing {target}"

    # Fenced code blocks got pygments markup somewhere in the site.
    assert any('class="codehilite"' in p.read_text() for p in written)


def test_api_reference_pages(tmp_path):
    """Per-package API pages (inspect-extracted docstrings) exist, carry
    real symbols with their documentation, and sit in the nav."""
    written = build_docs.build(tmp_path)
    names = {p.name for p in written}
    for package in build_docs.API_PACKAGES:
        assert f"api-{package.replace('.', '-')}.html" in names

    ops = (tmp_path / "api-composer_tpu-ops.html").read_text()
    assert "megakernel_generate_batched" in ops
    assert "pack_weights" in ops
    assert "Parallel prefill" in ops  # docstring content, not just names

    root = (tmp_path / "api-composer_tpu.html").read_text()
    assert "class GenerationService" in root
    assert "GenerationService.submit" in root
    assert "deadline_ms" in root  # method docstrings survive

    midi = (tmp_path / "api-composer_tpu-midi.html").read_text()
    assert "NoteSequence" in midi and "to_event_sequence" in midi

    # Wired into every page's nav.
    index = (tmp_path / "index.html").read_text()
    assert 'href="api-composer_tpu-ops.html"' in index
