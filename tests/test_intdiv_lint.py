"""Registry-wide integer-division lint (round-10 verdict item 3).

The advisory class flagged three rounds running: an integer-valued
expression computed via TRUE division — ``(a / b).cast("long")`` or
``F.floor(a / b)`` / ``F.ceil(a / b)`` — runs the division in DOUBLE,
which is exact only while operands stay below 2^53, a property a
100 TB rollup (row counts, epoch-micros, token totals) can silently
outgrow. Round 10 swept the engine onto ``functions/rounding.py::idiv``
/ ``ceil_div`` (SQL ``div``, exact by construction) and wrote the rule
into SCALE.md; round 11 converted the stragglers the verdict called out
(text_feature_hash's sign bit, the hq sub-bucket, the Pareto decile,
the drift week buckets, quality_curriculum's epochs, the z-order
bucket). This lint keeps the class retired the way the broadcast-hint
and HOF-lambda lints keep theirs:

Any ``.cast("<integer type>")`` directly over a division, or
``F.floor``/``F.ceil`` over a division, must carry a
``# float-by-design: <reason>`` tag — on the flagged expression's own
lines or the contiguous comment block immediately above it — naming why
double arithmetic is the DECLARED semantics there. Two legitimate
reasons exist today: the inputs are genuinely double (q76's float
metric, l_quantity), or the DuckDB oracle computes the identical double
expression, so parity — not exactness — is the contract (est_tokens'
``/ 4.0``, frame counts' ``/ 256.0``, quantile targets' ``/ 100.0``).
An untagged site fails with its file:line. ``functions/rounding.py``
is exempt: it is the module that owns the float/exact boundary
(``fround``'s quantization IS a float division).
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "spark_stream_kudu_spark"

GATE_MODULE = PKG / "functions" / "rounding.py"

TAG = "# float-by-design:"

_INT_TYPES = {"long", "int", "bigint", "integer", "short", "tinyint", "smallint"}


def _flagged_spans(tree: ast.AST) -> list[tuple[int, int, str]]:
    """(first_line, last_line, kind) for every division feeding an
    integer cast or a floor/ceil in ``tree``."""
    out = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        f = node.func
        # (<a / b>).cast("long" | "int" | ...)
        if (
            isinstance(f, ast.Attribute)
            and f.attr == "cast"
            and isinstance(f.value, ast.BinOp)
            and isinstance(f.value.op, ast.Div)
            and node.args
            and isinstance(node.args[0], ast.Constant)
            and str(node.args[0].value).lower() in _INT_TYPES
        ):
            out.append((node.lineno, node.end_lineno, "cast-over-div"))
        # F.floor(<a / b>) / F.ceil(<a / b>)
        if (
            isinstance(f, ast.Attribute)
            and f.attr in ("floor", "ceil")
            and isinstance(f.value, ast.Name)
            and f.value.id == "F"
            and node.args
            and isinstance(node.args[0], ast.BinOp)
            and isinstance(node.args[0].op, ast.Div)
        ):
            out.append((node.lineno, node.end_lineno, f"F.{f.attr}-over-div"))
    return out


def _has_tag(lines: list[str], first: int, last: int) -> bool:
    """TAG on the node's own lines, or in the contiguous comment block
    immediately above it."""
    for ln in range(first, last + 1):
        if TAG in lines[ln - 1]:
            return True
    ln = first - 1
    while ln >= 1 and lines[ln - 1].strip().startswith("#"):
        if TAG in lines[ln - 1]:
            return True
        ln -= 1
    return False


def _lint(path: Path) -> list[str]:
    text = path.read_text()
    lines = text.splitlines()
    failures = []
    rel = path.relative_to(PKG.parent) if path.is_relative_to(PKG.parent) else path
    for first, last, kind in _flagged_spans(ast.parse(text)):
        if not _has_tag(lines, first, last):
            failures.append(f"{rel}:{first} [{kind}]")
    return failures


def test_every_float_division_to_integer_is_tagged():
    failures = []
    n_files = 0
    for path in sorted(PKG.rglob("*.py")):
        if path == GATE_MODULE:
            continue
        n_files += 1
        failures.extend(_lint(path))
    assert not failures, (
        "integer-valued expressions computed via float division without a "
        "'# float-by-design: <reason>' tag — use "
        "functions/rounding.py::idiv/ceil_div (exact by construction), or "
        "tag why double is the declared semantics (double inputs, or the "
        "oracle computes the identical double expression):\n"
        + "\n".join(failures)
    )
    assert n_files > 30, f"lint scanned only {n_files} files — wrong root?"


def test_lint_positive_control(tmp_path):
    """The checker itself must flag both spellings and honor both tag
    placements — a silently dead lint is worse than none."""
    bad = tmp_path / "bad.py"
    bad.write_text(
        "from pyspark.sql import functions as F\n"
        'a = (F.col("x") / 3).cast("long")\n'
        'b = F.floor(F.col("x") / 7)\n'
        'c = F.ceil(F.col("x") / 2).cast("int")\n'
    )
    hits = _lint(bad)
    assert len(hits) == 3, hits
    good = tmp_path / "good.py"
    good.write_text(
        "from pyspark.sql import functions as F\n"
        'a = (F.col("x") / 3).cast("long")  # float-by-design: test\n'
        "# float-by-design: test (block form)\n"
        'b = F.floor(F.col("x") / 7)\n'
        'c = (F.col("x") / 2).cast("double")\n'  # not an integer cast
    )
    assert _lint(good) == []
