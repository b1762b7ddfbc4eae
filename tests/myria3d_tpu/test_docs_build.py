"""Docs site builder round trip (reference: Sphinx docs build in CI,
``/root/reference/.github/workflows/cicd.yaml`` + ``docs/Makefile``)."""

import importlib.util
import os
import sys

REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _load_builder():
    spec = importlib.util.spec_from_file_location(
        "build_docs", os.path.join(REPO_ROOT, "docs", "build_docs.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["build_docs"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_markdown_converter():
    b = _load_builder()
    html = b.markdown_to_html(
        "# Title\n\nSome `code` and **bold**.\n\n- a\n- b\n\n"
        "```python\nx = 1\n```\n\n| h1 | h2 |\n|---|---|\n| a | b |\n"
    )
    assert '<h1 id="title">' in html
    assert "<code>code</code>" in html and "<strong>bold</strong>" in html
    assert html.count("<li>") == 2
    assert "<pre><code>x = 1</code></pre>" in html
    assert "<th>h1</th>" in html and "<td>b</td>" in html


def test_site_builds_with_api_reference(tmp_path):
    b = _load_builder()
    out = str(tmp_path / "html")
    written = b.build(out)
    assert "index.html" in written
    assert os.path.isfile(os.path.join(out, "api", "myria3d_tpu.ops.knn.html"))
    knn = open(os.path.join(out, "api", "myria3d_tpu.ops.knn.html")).read()
    assert 'id="knn"' in knn and "query_pos" in knn  # autodoc content
    # every markdown guide under docs/ made it in
    assert os.path.isfile(os.path.join(out, "perf_notes.html"))
    assert os.path.isfile(os.path.join(out, "readme.html"))
    assert len(written) > 40
