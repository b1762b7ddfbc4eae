"""Self-contained documentation site builder.

The reference ships a Sphinx tree (``/root/reference/docs/source/conf.py``,
``docs/Makefile``, sphinx-apidoc + autodoc_mock_imports, myst_parser for
markdown) that builds an HTML site per release. Sphinx is not available in
this environment, so — in the same spirit as the repo's self-contained
hydra-lite and LAS codec — this module IS the docs toolchain: a
dependency-free markdown→HTML converter plus an apidoc generator that
walks ``myria3d_tpu`` and renders every module's docstrings/signatures.

Usage::

    python docs/build_docs.py [--out docs/_build/html]

or ``make -C docs html``. Output is a static site: ``index.html``, one
page per markdown doc (``docs/**/*.md`` + top-level ``README.md``), and
``api/<module>.html`` per package module.
"""

from __future__ import annotations

import argparse
import html
import importlib
import inspect
import os
import pkgutil
import re
from typing import List, Tuple

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in __import__("sys").path:
    __import__("sys").path.insert(0, REPO_ROOT)

# apidoc imports every module, and importing jax with an unreachable TPU
# backend hangs in the client's retry loop — docs never need a device.
# The env var alone is not enough once a sitecustomize has pinned a
# backend plugin, hence the explicit config.update (same as conftest).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover — docs build without jax installed
    pass

_PAGE = """<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<title>{title} — myria3d_tpu</title>
<style>
body {{ font-family: -apple-system, Segoe UI, sans-serif; margin: 0;
       display: flex; color: #1a1a1a; }}
nav {{ width: 17rem; min-height: 100vh; background: #f4f4f6; padding: 1rem;
      box-sizing: border-box; font-size: .9rem; overflow-y: auto; }}
nav a {{ display: block; color: #205080; text-decoration: none;
        padding: .12rem 0; }}
main {{ max-width: 52rem; padding: 1.5rem 2.5rem; }}
pre {{ background: #f6f8fa; padding: .7rem; overflow-x: auto;
      border-radius: 6px; font-size: .85rem; }}
code {{ background: #f0f0f2; padding: .05rem .25rem; border-radius: 3px;
       font-size: .9em; }}
pre code {{ background: none; padding: 0; }}
table {{ border-collapse: collapse; }}
td, th {{ border: 1px solid #ccc; padding: .3rem .6rem; }}
h1, h2 {{ border-bottom: 1px solid #e0e0e0; padding-bottom: .2rem; }}
.sig {{ background: #eef3f8; padding: .4rem .6rem; border-radius: 4px;
       font-family: monospace; white-space: pre-wrap; }}
.mod {{ color: #666; font-size: .85rem; }}
</style></head><body>
<nav><strong><a href="{root}index.html">myria3d_tpu docs</a></strong>
{nav}</nav>
<main>{body}</main></body></html>
"""


# ---------------------------------------------------------------------------
# Minimal markdown -> HTML (headers, fences, lists, tables, links, emphasis)
# ---------------------------------------------------------------------------

def _inline(text: str) -> str:
    text = html.escape(text, quote=False)
    text = re.sub(r"`([^`]+)`", r"<code>\1</code>", text)
    text = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", text)
    text = re.sub(r"(?<!\w)\*([^*]+)\*(?!\w)", r"<em>\1</em>", text)
    text = re.sub(
        r"\[([^\]]+)\]\(([^)]+)\)",
        lambda m: '<a href="%s">%s</a>'
        % (re.sub(r"\.md(#|$)", r".html\1", m.group(2)), m.group(1)),
        text,
    )
    return text


def markdown_to_html(md: str) -> str:
    out: List[str] = []
    lines = md.splitlines()
    i = 0
    in_list = False
    while i < len(lines):
        line = lines[i]
        if line.startswith("```"):
            if in_list:
                out.append("</ul>"); in_list = False
            block: List[str] = []
            i += 1
            while i < len(lines) and not lines[i].startswith("```"):
                block.append(lines[i]); i += 1
            out.append("<pre><code>%s</code></pre>"
                       % html.escape("\n".join(block)))
            i += 1
            continue
        if line.startswith("|") and i + 1 < len(lines) and \
                re.match(r"^\|[\s:|-]+\|?\s*$", lines[i + 1] or ""):
            if in_list:
                out.append("</ul>"); in_list = False
            hdr = [c.strip() for c in line.strip("|").split("|")]
            out.append("<table><tr>%s</tr>"
                       % "".join(f"<th>{_inline(c)}</th>" for c in hdr))
            i += 2
            while i < len(lines) and lines[i].startswith("|"):
                cells = [c.strip() for c in lines[i].strip("|").split("|")]
                out.append("<tr>%s</tr>"
                           % "".join(f"<td>{_inline(c)}</td>" for c in cells))
                i += 1
            out.append("</table>")
            continue
        m = re.match(r"^(#{1,6})\s+(.*)$", line)
        if m:
            if in_list:
                out.append("</ul>"); in_list = False
            lvl = len(m.group(1))
            txt = m.group(2)
            anchor = re.sub(r"[^a-z0-9]+", "-", txt.lower()).strip("-")
            out.append(f'<h{lvl} id="{anchor}">{_inline(txt)}</h{lvl}>')
        elif re.match(r"^\s*[-*]\s+", line):
            if not in_list:
                out.append("<ul>"); in_list = True
            out.append("<li>%s</li>" % _inline(re.sub(r"^\s*[-*]\s+", "", line)))
        elif line.strip() == "":
            if in_list:
                out.append("</ul>"); in_list = False
        else:
            if in_list:
                out.append("</ul>"); in_list = False
            out.append(f"<p>{_inline(line)}</p>")
        i += 1
    if in_list:
        out.append("</ul>")
    return "\n".join(out)


# ---------------------------------------------------------------------------
# apidoc: walk the package, render module/class/function docs
# ---------------------------------------------------------------------------

def iter_modules(package: str = "myria3d_tpu") -> List[str]:
    pkg = importlib.import_module(package)
    names = [package]
    for info in pkgutil.walk_packages(pkg.__path__, prefix=package + "."):
        if ".native" in info.name:
            continue  # ctypes loader triggers a g++ build on import
        names.append(info.name)
    return sorted(names)


def _doc_html(obj) -> str:
    doc = inspect.getdoc(obj) or ""
    return markdown_to_html(doc) if doc else ""


def _signature(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(…)"


def render_module(name: str) -> str:
    mod = importlib.import_module(name)
    parts = [f'<h1><code>{name}</code></h1>', _doc_html(mod)]
    def _origin(o):
        # see through jax.jit / functools wrappers to the defining module
        inner = inspect.unwrap(o) if callable(o) else o
        return getattr(inner, "__module__", None), inner

    members = []
    for n, o in vars(mod).items():
        if n.startswith("_"):
            continue
        origin, inner = _origin(o)
        if origin == name:
            members.append((n, inner))
    for n, obj in members:
        if inspect.isclass(obj):
            parts.append(f'<h2 id="{n}">class <code>{n}</code></h2>')
            parts.append(f'<div class="sig">{html.escape(n + _signature(obj))}</div>')
            parts.append(_doc_html(obj))
            for mn, mo in vars(obj).items():
                if mn.startswith("_") or not callable(mo):
                    continue
                doc = inspect.getdoc(mo)
                if not doc:
                    continue
                parts.append(f'<h3 id="{n}.{mn}"><code>{n}.{mn}</code></h3>')
                try:
                    parts.append(
                        f'<div class="sig">{html.escape(mn + _signature(mo))}</div>'
                    )
                except Exception:
                    pass
                parts.append(markdown_to_html(doc))
        elif inspect.isfunction(obj):
            parts.append(f'<h2 id="{n}"><code>{n}</code></h2>')
            parts.append(f'<div class="sig">{html.escape(n + _signature(obj))}</div>')
            parts.append(_doc_html(obj))
    return "\n".join(p for p in parts if p)


# ---------------------------------------------------------------------------
# Site assembly
# ---------------------------------------------------------------------------

def collect_md_pages() -> List[Tuple[str, str]]:
    """(relative html path, markdown source path) pairs."""
    pages = [("readme.html", os.path.join(REPO_ROOT, "README.md"))]
    docs_dir = os.path.join(REPO_ROOT, "docs")
    for root, _dirs, files in os.walk(docs_dir):
        if "_build" in root:
            continue
        for f in sorted(files):
            if f.endswith(".md"):
                src = os.path.join(root, f)
                rel = os.path.relpath(src, docs_dir)[:-3] + ".html"
                pages.append((rel.replace(os.sep, "/"), src))
    return pages


def build(out_dir: str) -> List[str]:
    os.makedirs(out_dir, exist_ok=True)
    md_pages = collect_md_pages()
    api_modules = iter_modules()

    nav_parts = ["<p>Guides</p>"]
    for rel, src in md_pages:
        title = os.path.splitext(os.path.basename(rel))[0].replace("_", " ")
        nav_parts.append(f'<a href="{{root}}{rel}">{title}</a>')
    nav_parts.append("<p>API reference</p>")
    for name in api_modules:
        nav_parts.append(
            f'<a href="{{root}}api/{name}.html">{name.removeprefix("myria3d_tpu").lstrip(".") or "myria3d_tpu"}</a>'
        )
    nav_tpl = "\n".join(nav_parts)

    written: List[str] = []

    def emit(rel: str, title: str, body: str) -> None:
        depth = rel.count("/")
        root = "../" * depth
        path = os.path.join(out_dir, rel)
        os.makedirs(os.path.dirname(path) or out_dir, exist_ok=True)
        with open(path, "w") as f:
            f.write(_PAGE.format(
                title=html.escape(title), body=body,
                nav=nav_tpl.replace("{root}", root), root=root,
            ))
        written.append(rel)

    for rel, src in md_pages:
        with open(src) as f:
            md = f.read()
        title = next(
            (ln.lstrip("# ").strip() for ln in md.splitlines()
             if ln.startswith("#")),
            os.path.basename(rel),
        )
        emit(rel, title, markdown_to_html(md))

    for name in api_modules:
        try:
            body = render_module(name)
        except Exception as e:  # keep the build going; surface the error
            body = f"<h1><code>{name}</code></h1><p>import failed: {html.escape(str(e))}</p>"
        emit(f"api/{name}.html", name, body)

    index_body = (
        "<h1>myria3d_tpu</h1>"
        "<p>TPU-native aerial-lidar semantic segmentation — "
        "feature-parity re-design of IGNF/myria3d for JAX/XLA/Pallas.</p>"
        "<ul>"
        + "".join(
            f'<li><a href="{rel}">{os.path.splitext(os.path.basename(rel))[0]}</a></li>'
            for rel, _ in md_pages
        )
        + f'<li><a href="api/myria3d_tpu.html">API reference '
          f"({len(api_modules)} modules)</a></li></ul>"
    )
    emit("index.html", "index", index_body)
    return written


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=os.path.join(REPO_ROOT, "docs", "_build", "html")
    )
    args = ap.parse_args()
    written = build(args.out)
    print(f"built {len(written)} pages -> {args.out}")


if __name__ == "__main__":
    main()
