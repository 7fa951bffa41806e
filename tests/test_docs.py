# -*- coding: utf-8 -*-
"""Documentation build/drift gate (the reference ships a Sphinx tree;
this environment has no sphinx, so the gate parses every doc code block
and checks the APIs and CLI flags they reference against the package —
docs that drift from the code fail the suite)."""
import ast
import pathlib
import re

DOCS = pathlib.Path(__file__).resolve().parent.parent / "docs"
EXAMPLES = DOCS.parent / "examples"

_BLOCK = re.compile(r"```(python|bash)\n(.*?)```", re.S)


def _code_blocks(lang):
    out = []
    for md in sorted(DOCS.glob("*.md")):
        for m in _BLOCK.finditer(md.read_text(encoding="utf-8")):
            if m.group(1) == lang:
                out.append((md.name, m.group(2)))
    assert out, f"no {lang} code blocks found under docs/"
    return out


def test_docs_exist():
    for name in ("index.md", "quickstart.md", "DESIGN.md"):
        assert (DOCS / name).is_file(), f"docs/{name} missing"


def test_doc_python_blocks_parse():
    for src, code in _code_blocks("python"):
        ast.parse(code, filename=src)


def test_doc_python_blocks_reference_real_api():
    """Every attribute access on the package alias in a doc code block
    must resolve on the installed package (drift check)."""
    import mcsas_tpu as mt
    for src, code in _code_blocks("python"):
        tree = ast.parse(code)
        aliases = {"mt", "mcsas_tpu"}
        for node in ast.walk(tree):
            if (isinstance(node, ast.Attribute)
                    and isinstance(node.value, ast.Name)
                    and node.value.id in aliases):
                assert hasattr(mt, node.attr), (
                    f"{src}: mcsas_tpu.{node.attr} does not exist")
        # `from mcsas_tpu.sub import name` must resolve too
        for node in ast.walk(tree):
            if (isinstance(node, ast.ImportFrom) and node.module
                    and node.module.split(".")[0] == "mcsas_tpu"):
                import importlib
                mod = importlib.import_module(node.module)
                for a in node.names:
                    assert hasattr(mod, a.name), (
                        f"{src}: {node.module}.{a.name} does not exist")


def test_doc_cli_flags_exist():
    """Every long flag shown in a bash block must be a real CLI option."""
    from mcsas_tpu.cli import build_parser
    parser = build_parser()
    known = {s for a in parser._actions for s in a.option_strings}
    for src, code in _code_blocks("bash"):
        if "mcsas-tpu" not in code:
            continue
        for flag in re.findall(r"(?<![\w-])--[a-z][a-z-]+", code):
            assert flag in known, f"{src}: unknown CLI flag {flag}"


def test_examples_parse():
    files = sorted(EXAMPLES.glob("*.py"))
    assert files, "examples/ directory is empty"
    for f in files:
        ast.parse(f.read_text(encoding="utf-8"), filename=str(f))
