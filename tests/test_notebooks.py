"""Notebook templates sanity (reference notebook_templates/*.ipynb
parity): valid nbformat-4 JSON, and every code cell is syntactically
valid Python referencing the shipped API modules. The underlying
analyses (build_table / build_pvalues / attention_map) are executed
for real in tests/test_paper_tables.py and tests/test_play.py."""

import json
from pathlib import Path

import pytest

ROOT = Path(__file__).parent.parent
NOTEBOOKS = sorted((ROOT / "notebook_templates").glob("*.ipynb"))


def test_templates_exist():
    names = {p.name for p in NOTEBOOKS}
    assert {"Table 1 of NMI paper.ipynb", "Other tables.ipynb",
            "Table 4 Ablation.ipynb", "Table 4 p_values.ipynb"} <= names


@pytest.mark.parametrize("path", NOTEBOOKS, ids=lambda p: p.name)
def test_notebook_parses_and_code_compiles(path):
    nb = json.loads(path.read_text())
    assert nb["nbformat"] == 4
    assert nb["cells"], path.name
    code = [c for c in nb["cells"] if c["cell_type"] == "code"]
    assert code, path.name
    for i, cell in enumerate(code):
        src = "".join(cell["source"])
        compile(src, f"{path.name}[{i}]", "exec")


@pytest.mark.parametrize("path", NOTEBOOKS, ids=lambda p: p.name)
def test_notebook_symbols_exist(path):
    """Every `module.attr` the notebooks call on our package modules
    resolves — guards against API drift in the templates."""
    import re

    from brainmagick_tpu import play, viz
    import scripts.paper_tables as pt

    mods = {"play": play, "viz": viz}
    nb = json.loads(path.read_text())
    src = "".join("".join(c["source"]) for c in nb["cells"]
                  if c["cell_type"] == "code")
    for mod, attr in re.findall(r"\b(play|viz)\.(\w+)", src):
        assert hasattr(mods[mod], attr), f"{mod}.{attr}"
    for name in re.findall(
            r"from scripts\.paper_tables import ([\w, ]+)", src):
        for sym in name.split(","):
            assert hasattr(pt, sym.strip()), sym
