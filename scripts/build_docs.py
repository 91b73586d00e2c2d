#!/usr/bin/env python
"""Builds the HTML documentation site from the markdown design docs.

The reference shipped a Sphinx autodoc skeleton (reference docs/source);
sphinx is not installable in this environment, so the real design docs live
as markdown under docs/ and this builder renders them to a static HTML site
(docs/html) with the `markdown` + `pygments` packages that ARE available:
fenced code with syntax highlighting, tables, a navigation sidebar, and the
README as the landing page.

Usage: python scripts/build_docs.py [OUT_DIR]   (default: docs/html)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

import markdown
from pygments.formatters import HtmlFormatter

ROOT = Path(__file__).resolve().parent.parent

PAGE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — composer_tpu</title>
<style>
:root {{ color-scheme: light dark; }}
body {{ margin: 0; font: 16px/1.6 system-ui, sans-serif; display: flex; }}
nav {{ min-width: 220px; padding: 1.5rem 1rem; border-right: 1px solid #8884;
      position: sticky; top: 0; height: 100vh; overflow-y: auto; box-sizing: border-box; }}
nav a {{ display: block; padding: .15rem 0; text-decoration: none; color: inherit; }}
nav a.current {{ font-weight: 700; }}
main {{ padding: 1.5rem 2.5rem; max-width: 54rem; min-width: 0; }}
pre {{ padding: .8rem 1rem; overflow-x: auto; border-radius: 6px;
      background: #80808018; }}
code {{ font: 13px/1.5 ui-monospace, monospace; }}
table {{ border-collapse: collapse; }}
th, td {{ border: 1px solid #8886; padding: .3rem .6rem; text-align: left; }}
h1, h2, h3 {{ line-height: 1.25; }}
{pygments}
</style>
</head>
<body>
<nav>
<strong>composer_tpu</strong>
{nav}
</nav>
<main>
{body}
</main>
</body>
</html>
"""


def _title(md_text: str, fallback: str) -> str:
    match = re.search(r"^#\s+(.+)$", md_text, re.MULTILINE)
    return match.group(1).strip() if match else fallback


def build(out_dir: Path) -> list[Path]:
    sources = [(ROOT / "README.md", "index")]
    sources += sorted(
        (path, path.stem)
        for path in (ROOT / "docs").glob("*.md")
        if path.stem != "index"
    )

    md = markdown.Markdown(
        extensions=["fenced_code", "tables", "codehilite", "toc"],
        extension_configs={"codehilite": {"guess_lang": False}},
    )
    pygments_css = HtmlFormatter().get_style_defs(".codehilite")

    pages = []
    for path, slug in sources:
        text = path.read_text()
        pages.append((slug, _title(text, slug.replace("-", " ")), text))

    nav_entries = [(slug, title) for slug, title, _ in pages]
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    known = {slug for slug, _ in nav_entries}

    def relink(match):
        slug = match.group(1)
        return f"{slug}.html" if slug in known else match.group(0)

    for slug, title, text in pages:
        # Doc references — markdown links and prose path mentions alike —
        # become page links when the target is part of this site.
        text = re.sub(r"\b(?:docs/)?([\w-]+)\.md\b", relink, text)
        md.reset()
        body = md.convert(text)
        nav = "\n".join(
            f'<a href="{s}.html"{" class=\"current\"" if s == slug else ""}>'
            f"{t}</a>"
            for s, t in nav_entries
        )
        target = out_dir / f"{slug}.html"
        target.write_text(
            PAGE.format(title=title, nav=nav, body=body, pygments=pygments_css)
        )
        written.append(target)
    return written


if __name__ == "__main__":
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else ROOT / "docs" / "html"
    files = build(out)
    print(f"Wrote {len(files)} pages to {out}")
