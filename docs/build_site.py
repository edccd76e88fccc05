"""Builds a browsable static HTML site from the docs/ markdown pages.

The framework's counterpart of the reference's hosted Sphinx site
(reference: docs/Makefile + sphinx conf; the rendered site at
mrphys.github.io/tensorflow-nufft). Self-contained: uses only the
stdlib-adjacent ``markdown`` package — no mkdocs/sphinx install.

Run via ``make docs`` (after gen_api.py) or directly:
``python docs/build_site.py``; output lands in docs/site/.
"""

import pathlib
import re

import markdown

DOCS = pathlib.Path(__file__).resolve().parent
OUT = DOCS / "site"

PAGES = [
    ("index.md", "Overview"),
    ("api.md", "API reference"),
    ("api_generated.md", "Generated API"),
    ("accuracy.md", "Accuracy model"),
    ("design.md", "Design notes"),
    ("parity.md", "Reference parity"),
    ("examples/mri_walkthrough.md", "MRI example"),
]

CSS = """
:root { --fg: #1a1a1a; --bg: #ffffff; --accent: #0b5fa5;
        --code-bg: #f5f5f4; --border: #e0e0e0; }
* { box-sizing: border-box; }
body { margin: 0; font: 16px/1.6 system-ui, sans-serif;
       color: var(--fg); background: var(--bg); }
nav { position: fixed; top: 0; left: 0; bottom: 0; width: 230px;
      overflow-y: auto; padding: 1.2rem 1rem;
      border-right: 1px solid var(--border); background: #fafaf9; }
nav h1 { font-size: 1rem; margin: 0 0 1rem; }
nav a { display: block; padding: 0.25rem 0.4rem; color: var(--fg);
        text-decoration: none; border-radius: 4px; }
nav a.active, nav a:hover { background: #eef4fa; color: var(--accent); }
main { margin-left: 230px; padding: 2rem 3rem; max-width: 60rem; }
main a { color: var(--accent); }
pre { background: var(--code-bg); padding: 0.8rem 1rem;
      overflow-x: auto; border-radius: 6px; font-size: 0.88em; }
code { background: var(--code-bg); padding: 0.1em 0.3em;
       border-radius: 3px; font-size: 0.92em; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; margin: 1rem 0; }
th, td { border: 1px solid var(--border); padding: 0.4rem 0.7rem;
         text-align: left; }
th { background: var(--code-bg); }
h1, h2, h3 { line-height: 1.25; }
h2 { border-bottom: 1px solid var(--border); padding-bottom: 0.3rem; }
@media (max-width: 800px) {
  nav { position: static; width: auto; border: 0; }
  main { margin: 0; padding: 1rem; }
}
"""

TEMPLATE = """<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — tensorflow-nufft-tpu</title>
<style>{css}</style></head><body>
<nav><h1>tensorflow-nufft-tpu</h1>{nav}</nav>
<main>{body}</main></body></html>
"""


def _out_name(src: str) -> str:
    return src.replace("/", "_").rsplit(".", 1)[0] + ".html"


def _rewrite_links(html: str) -> str:
    """Points intra-docs .md links at their rendered .html pages."""
    def sub(m):
        href = m.group(1)
        if href.startswith(("http:", "https:", "#", "mailto:")):
            return m.group(0)
        base, _, frag = href.partition("#")
        if base.endswith(".md"):
            base = base.lstrip("./")
            if base.startswith("../"):     # ../README.md etc.
                return f'href="{href}"'
            base = _out_name(base)
            return f'href="{base}{"#" + frag if frag else ""}"'
        return m.group(0)
    return re.sub(r'href="([^"]+)"', sub, html)


def build() -> None:
    OUT.mkdir(exist_ok=True)
    md = markdown.Markdown(
        extensions=["tables", "fenced_code", "toc"])
    nav_items = [(p, t, _out_name(p)) for p, t in PAGES
                 if (DOCS / p).exists()]
    for page, title, out_name in nav_items:
        text = (DOCS / page).read_text()
        md.reset()
        body = _rewrite_links(md.convert(text))
        nav = "".join(
            f'<a href="{o}"{" class=\"active\"" if o == out_name else ""}'
            f'>{t}</a>' for _, t, o in nav_items)
        (OUT / out_name).write_text(TEMPLATE.format(
            title=title, css=CSS, nav=nav, body=body))
    # Site entry point.
    (OUT / "index.html").write_text(
        (OUT / _out_name("index.md")).read_text())
    print(f"site: {len(nav_items)} pages -> {OUT}")


if __name__ == "__main__":
    build()
