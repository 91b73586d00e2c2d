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
pre.apidoc {{ white-space: pre-wrap; background: none; padding: 0 0 0 1rem;
      border-left: 3px solid #8884; border-radius: 0; font-size: 14px;
      font-family: inherit; }}
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


# ----------------------------------------------------------- API reference
API_PACKAGES = [
    "composer_tpu",
    "composer_tpu.midi",
    "composer_tpu.data",
    "composer_tpu.models",
    "composer_tpu.ops",
    "composer_tpu.train",
    "composer_tpu.parallel",
    "composer_tpu.native",
]


def _signature(obj) -> str:
    import inspect

    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc_html(obj) -> str:
    import html
    import inspect

    doc = inspect.getdoc(obj)
    if not doc:
        return ""
    return f'<pre class="apidoc">{html.escape(doc)}</pre>'


def _describe_module(module) -> str:
    """Docstring-driven reference for one module: public functions and
    classes (with their public methods) DEFINED in the module — re-exports
    are covered where they live. No sphinx: plain inspect + escaping."""
    import html
    import inspect

    parts = [f'<h2 id="{module.__name__}"><code>{module.__name__}</code></h2>']
    parts.append(_doc_html(module))
    for name in sorted(vars(module)):
        obj = vars(module)[name]
        if name.startswith("_"):
            continue
        if getattr(obj, "__module__", None) != module.__name__:
            continue
        if inspect.isclass(obj):
            parts.append(
                f'<h3 id="{module.__name__}.{name}"><code>class {name}'
                f"{html.escape(_signature(obj))}</code></h3>"
            )
            parts.append(_doc_html(obj))
            for method_name, method in sorted(vars(obj).items()):
                if method_name.startswith("_") or not callable(method):
                    continue
                parts.append(
                    f"<h4><code>{name}.{method_name}"
                    f"{html.escape(_signature(method))}</code></h4>"
                )
                parts.append(_doc_html(method))
        elif callable(obj):
            parts.append(
                f'<h3 id="{module.__name__}.{name}"><code>{name}'
                f"{html.escape(_signature(obj))}</code></h3>"
            )
            parts.append(_doc_html(obj))
    return "\n".join(part for part in parts if part)


def build_api_reference() -> list[tuple[str, str, str]]:
    """(slug, title, body_html) per package — every module's docstrings
    extracted with inspect (the reference shipped only an empty Sphinx
    autodoc skeleton, reference docs/source/index.rst)."""
    import importlib
    import pkgutil

    sys.path.insert(0, str(ROOT))
    pages = []
    for package_name in API_PACKAGES:
        package = importlib.import_module(package_name)
        modules = [package]
        if hasattr(package, "__path__"):
            for info in sorted(
                pkgutil.iter_modules(package.__path__), key=lambda i: i.name
            ):
                if info.ispkg or info.name.startswith("_"):
                    continue
                if not (Path(package.__path__[0]) / f"{info.name}.py").exists():
                    continue  # compiled artifacts (e.g. native/libfastcodec.so)
                full = f"{package_name}.{info.name}"
                if package_name == "composer_tpu" and any(
                    full == p or full.startswith(p + ".")
                    for p in API_PACKAGES[1:]
                ):
                    continue  # subpackages get their own page
                modules.append(importlib.import_module(full))
        body = "\n".join(_describe_module(m) for m in modules)
        slug = "api-" + package_name.replace(".", "-")
        pages.append((slug, f"API: {package_name}", body))
    return pages


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
        pages.append((slug, _title(text, slug.replace("-", " ")), text, False))
    # API reference (inspect-extracted docstrings), after the design docs.
    for slug, title, body in build_api_reference():
        pages.append((slug, title, body, True))

    nav_entries = [(slug, title) for slug, title, _, _ in pages]
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []
    known = {slug for slug, _ in nav_entries}

    def relink(match):
        slug = match.group(1)
        return f"{slug}.html" if slug in known else match.group(0)

    for slug, title, text, is_html in pages:
        if is_html:
            body = text
        else:
            # Doc references — markdown links and prose path mentions alike
            # — become page links when the target is part of this site.
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
