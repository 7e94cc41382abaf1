"""Lint gate — parity with the reference's eslint layer (.eslintrc.json +
strict tsconfig).  The pinned CI image has no ruff/mypy, so this runs an
in-repo AST fallback over every package/test/bench source: syntax (compile)
plus F401-style unused-import detection.  The real tools are configured in
pyproject.toml ([tool.ruff] / [tool.mypy]) and run where available."""

from __future__ import annotations

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROOTS = ["webgpu_msm_twisted_edwards_tpu", "tests", "experiments",
         "bench.py", "__graft_entry__.py"]


def _sources():
    for root in ROOTS:
        path = os.path.join(REPO, root)
        if os.path.isfile(path):
            yield path
            continue
        for dirpath, _dirs, files in os.walk(path):
            for f in sorted(files):
                if f.endswith(".py"):
                    yield os.path.join(dirpath, f)


def _used_names(tree: ast.AST) -> set[str]:
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # Record the root name of dotted access (np.x -> np).
            cur = node
            while isinstance(cur, ast.Attribute):
                cur = cur.value
            if isinstance(cur, ast.Name):
                used.add(cur.id)
    # Names referenced inside __all__ strings or docstring doctests are rare
    # here; string-level fallback keeps false positives at zero.
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.update(node.value.replace(".", " ").split())
    return used


def _unused_imports(path: str) -> list[str]:
    src = open(path, encoding="utf-8").read()
    tree = ast.parse(src, filename=path)
    used = _used_names(tree)
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                if name not in used:
                    out.append(f"{path}:{node.lineno}: unused import {a.name}")
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                name = a.asname or a.name
                if name not in used:
                    out.append(
                        f"{path}:{node.lineno}: unused import {name}"
                        f" (from {node.module})")
    # Re-export modules (__init__.py) import names precisely to expose them.
    if os.path.basename(path) == "__init__.py":
        return []
    return out


def test_sources_parse():
    for path in _sources():
        ast.parse(open(path, encoding="utf-8").read(), filename=path)


def test_no_unused_imports():
    problems = []
    for path in _sources():
        problems.extend(_unused_imports(path))
    assert not problems, "\n".join(problems)


def test_ruff_if_available():
    """Run the real linter when the environment has it (config in
    pyproject.toml); skip silently otherwise."""
    import shutil
    import subprocess

    import pytest

    exe = shutil.which("ruff")
    if exe is None:
        pytest.skip("ruff not installed in this image")
    res = subprocess.run([exe, "check", REPO], capture_output=True, text=True)
    assert res.returncode == 0, res.stdout + res.stderr
