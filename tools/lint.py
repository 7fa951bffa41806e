#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Self-contained lint gate (the reference ships pre-commit.sh/.pylintrc;
this environment has no ruff/flake8/pylint, so the gate is an in-repo
AST + text checker enforced by tests/test_lint.py).

Checks:
  E501  line longer than 79 characters
  W291  trailing whitespace
  W191  tab in indentation
  F401  imported name never used in the module
  E722  bare ``except:``

``# noqa`` on a line suppresses its findings; ``# noqa: CODE`` suppresses
one code.  Usage: ``python tools/lint.py PATH [PATH ...]`` — prints one
finding per line, exits nonzero if any.
"""
from __future__ import annotations

import ast
import os
import sys

MAX_LEN = 79


def _noqa(line: str, code: str) -> bool:
    if "# noqa" not in line:
        return False
    tail = line.split("# noqa", 1)[1].strip()
    if not tail.startswith(":"):
        return True                       # blanket noqa
    return code in tail[1:].replace(",", " ").split()


def _iter_import_names(tree):
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = a.asname or a.name.split(".")[0]
                yield node.lineno, name
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                yield node.lineno, a.asname or a.name


def _used_names(tree, source: str):
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            pass                          # base captured via ast.Name
    # names re-exported through __all__ or referenced in docstrings-as-API
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and any(isinstance(t, ast.Name) and t.id == "__all__"
                        for t in node.targets)):
            for elt in ast.walk(node.value):
                if isinstance(elt, ast.Constant) and isinstance(
                        elt.value, str):
                    used.add(elt.value)
    return used


def lint_file(path: str):
    findings = []
    with open(path, "r", encoding="utf-8") as fd:
        source = fd.read()
    lines = source.splitlines()
    for i, line in enumerate(lines, 1):
        if len(line) > MAX_LEN and not _noqa(line, "E501"):
            findings.append((path, i, "E501",
                             f"line too long ({len(line)} > {MAX_LEN})"))
        if line != line.rstrip() and not _noqa(line, "W291"):
            findings.append((path, i, "W291", "trailing whitespace"))
        stripped = line.lstrip(" ")
        if stripped.startswith("\t") and not _noqa(line, "W191"):
            findings.append((path, i, "W191", "tab in indentation"))
    try:
        tree = ast.parse(source, filename=path)
    except SyntaxError as e:
        findings.append((path, e.lineno or 0, "E999",
                         f"syntax error: {e.msg}"))
        return findings
    used = _used_names(tree, source)
    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            line = lines[node.lineno - 1]
            if not _noqa(line, "E722"):
                findings.append((path, node.lineno, "E722",
                                 "bare 'except:'"))
    for lineno, name in _iter_import_names(tree):
        if name == "_" or name.startswith("__"):
            continue
        if name not in used and not _noqa(lines[lineno - 1], "F401"):
            findings.append((path, lineno, "F401",
                             f"{name!r} imported but unused"))
    return findings


def lint_paths(paths):
    findings = []
    for p in paths:
        if os.path.isdir(p):
            for root, dirs, files in os.walk(p):
                dirs[:] = [d for d in dirs
                           if not d.startswith((".", "__"))
                           and d not in ("build", "node_modules")]
                for fn in sorted(files):
                    if fn.endswith(".py"):
                        findings.extend(lint_file(os.path.join(root, fn)))
        elif p.endswith(".py"):
            findings.extend(lint_file(p))
    return findings


def main(argv=None) -> int:
    paths = (argv or sys.argv[1:]) or ["mcsas_tpu", "tests", "tools",
                                       "bench.py", "__graft_entry__.py"]
    findings = lint_paths(paths)
    for path, line, code, msg in findings:
        print(f"{path}:{line}: {code} {msg}")
    print(f"{len(findings)} finding(s)")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
