"""Repo test-suite hygiene checks.

The image has no ruff/flake8, so this is the F811 guard the round-3 verdict
asked for: a later ``def test_x`` silently shadowing an earlier one means the
first body is never collected (exactly what happened to
``test_load_mnist_idx_roundtrip`` in round 3).
"""

import ast
import collections
import pathlib


TESTS_DIR = pathlib.Path(__file__).parent


def test_no_shadowed_top_level_test_functions():
    offenders = {}
    for path in sorted(TESTS_DIR.glob("test_*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        counts = collections.Counter(
            node.name for node in tree.body
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)))
        dupes = [name for name, n in counts.items() if n > 1]
        if dupes:
            offenders[path.name] = dupes
    assert not offenders, (
        f"duplicate top-level function names shadow earlier tests: "
        f"{offenders}")


def test_no_shadowed_test_methods_in_classes():
    offenders = {}
    for path in sorted(TESTS_DIR.glob("test_*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        for node in tree.body:
            if not isinstance(node, ast.ClassDef):
                continue
            counts = collections.Counter(
                sub.name for sub in node.body
                if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef)))
            dupes = [name for name, n in counts.items() if n > 1]
            if dupes:
                offenders[f"{path.name}::{node.name}"] = dupes
    assert not offenders, (
        f"duplicate method names shadow earlier tests: {offenders}")
