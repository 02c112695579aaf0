#!/usr/bin/env python
"""Minimal self-contained lint gate (no third-party linters in this image):
unused imports, tabs in indentation, trailing whitespace, accidental
`print(` in library code (stderr logging belongs to bench/tools), and
files missing a module docstring.  Mirrors the spirit of the reference's
CI lint job (/root/reference/.github/workflows/lint.yml:15-58: spellcheck +
fmt + clippy) at the fidelity this environment allows."""

from __future__ import annotations

import ast
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
TARGETS = ["halo_accumulation_tpu", "tests", "tools", "bench.py", "__graft_entry__.py"]
ALLOW_PRINT = {"tools", "bench.py", "__graft_entry__.py", "profiling.py", "runtime.py"}


def iter_files():
    for t in TARGETS:
        p = ROOT / t
        if p.is_file():
            yield p
        else:
            yield from sorted(p.rglob("*.py"))


class ImportUse(ast.NodeVisitor):
    def __init__(self):
        self.imported: dict[str, int] = {}
        self.used: set[str] = set()

    def visit_Import(self, node):
        for a in node.names:
            name = (a.asname or a.name).split(".")[0]
            self.imported[name] = node.lineno

    def visit_ImportFrom(self, node):
        if node.module == "__future__":
            return
        for a in node.names:
            if a.name == "*":
                continue
            self.imported[a.asname or a.name] = node.lineno

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def lint_file(path: pathlib.Path) -> list[str]:
    rel = path.relative_to(ROOT)
    src = path.read_text()
    problems = []
    for i, line in enumerate(src.splitlines(), 1):
        if line != line.rstrip():
            problems.append(f"{rel}:{i}: trailing whitespace")
        if line.startswith("\t"):
            problems.append(f"{rel}:{i}: tab indentation")
    try:
        tree = ast.parse(src)
    except SyntaxError as e:
        return [f"{rel}:{e.lineno}: syntax error: {e.msg}"]
    if not (tree.body and isinstance(tree.body[0], ast.Expr)
            and isinstance(tree.body[0].value, ast.Constant)
            and isinstance(tree.body[0].value.value, str)):
        if path.name not in ("__init__.py",):
            problems.append(f"{rel}:1: missing module docstring")
    v = ImportUse()
    v.visit(tree)
    for name, lineno in v.imported.items():
        if name.startswith("_"):
            continue
        if name not in v.used and name not in src.split("\n")[lineno - 1]:
            pass
        if name not in v.used:
            # __all__-style re-exports in __init__.py are legitimate
            if path.name == "__init__.py":
                continue
            problems.append(f"{rel}:{lineno}: unused import '{name}'")
    lib = str(rel).startswith("halo_accumulation_tpu")
    if lib and path.name not in ALLOW_PRINT:
        for node in ast.walk(tree):
            if (isinstance(node, ast.Call) and isinstance(node.func, ast.Name)
                    and node.func.id == "print"):
                problems.append(f"{rel}:{node.lineno}: print() in library code")
    return problems


def main() -> int:
    all_problems = []
    for f in iter_files():
        all_problems.extend(lint_file(f))
    for p in all_problems:
        print(p)
    print(f"lint: {len(all_problems)} problem(s)")
    return 1 if all_problems else 0


if __name__ == "__main__":
    sys.exit(main())
