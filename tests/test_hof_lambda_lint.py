"""Higher-order-function lambda-closure lint (round-10 class).

The round-10 perf audit found the same trap twice: a Python lambda
passed to ``F.transform``/``F.zip_with``/... that closes over a
variable bound to a NON-ATTRIBUTE Catalyst expression (a ``F.split``,
``tokens(...)``, ``F.expr`` subtree). Lambda-bound subtrees defeat
Catalyst's subexpression elimination, so the closed-over expression
re-evaluates once PER ARRAY ELEMENT — O(n^2) per row on the split
family (measured ~4-6x on the BPE pair expansion and word_shingles at
sf0.1). The fix is always the same: pass the expression as a
higher-order-function ARGUMENT (slice/zip the array) or project it to
a real column first.

This lint keeps the class retired: for every lambda argument of a
pyspark HOF in the engine package, each free variable that resolves
(nearest prior assignment in the same source file) to one of the
known per-element-explosive constructors fails with its file:line.
Attributes (``F.col``), literals, lambda parameters, and scalar
Python values are fine — re-evaluating an attribute reference per
element is O(1).
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "spark_stream_kudu_spark"

# pyspark higher-order functions taking lambda arguments.
HOFS = {
    "transform",
    "zip_with",
    "filter",
    "exists",
    "forall",
    "aggregate",
    "reduce",
    "map_filter",
    "map_zip_with",
    "transform_keys",
    "transform_values",
}

# Constructors whose per-element re-evaluation is the O(n^2) trap:
# they re-run string parsing / array construction over the whole row
# value on every element visit.
EXPLOSIVE = {
    "split",
    "expr",
    "tokens",
    "word_shingles",
    "regexp_extract_all",
    "sql_tokens",
    "sequence",
    "transform",
    "zip_with",
    "array_sort",
    "array_distinct",
    "sort_array",
    "collect_list",
    "collect_set",
}


def _call_names(node: ast.expr) -> set[str]:
    """All bare/attr call names inside an expression subtree."""
    out: set[str] = set()
    for sub in ast.walk(node):
        if isinstance(sub, ast.Call):
            f = sub.func
            if isinstance(f, ast.Attribute):
                out.add(f.attr)
            elif isinstance(f, ast.Name):
                out.add(f.id)
    return out


def _lambda_params(lam: ast.Lambda) -> set[str]:
    a = lam.args
    return {x.arg for x in [*a.posonlyargs, *a.args, *a.kwonlyargs]}


def _free_names(lam: ast.Lambda) -> set[str]:
    params = _lambda_params(lam)
    return {
        n.id
        for n in ast.walk(lam.body)
        if isinstance(n, ast.Name) and n.id not in params
    }


def _violations(path: Path) -> list[str]:
    src = path.read_text()
    tree = ast.parse(src)
    lines = src.splitlines()
    # name -> list of (lineno, rhs) assignments anywhere in the file;
    # resolution picks the nearest assignment ABOVE the lambda.
    assigns: dict[str, list[tuple[int, ast.expr]]] = {}
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            t = node.targets[0]
            if isinstance(t, ast.Name):
                assigns.setdefault(t.id, []).append((node.lineno, node.value))
    out: list[str] = []
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute)):
            continue
        if node.func.attr not in HOFS:
            continue
        for arg in [*node.args, *[k.value for k in node.keywords]]:
            if not isinstance(arg, ast.Lambda):
                continue
            for name in sorted(_free_names(arg)):
                cands = [
                    (ln, rhs)
                    for ln, rhs in assigns.get(name, [])
                    if ln < arg.lineno
                ]
                if not cands:
                    continue
                _, rhs = max(cands)
                hits = _call_names(rhs) & EXPLOSIVE
                if not hits:
                    continue
                line = lines[arg.lineno - 1]
                if "# hof-bound-ok:" in line or (
                    arg.lineno >= 2 and "# hof-bound-ok:" in lines[arg.lineno - 2]
                ):
                    continue
                try:
                    rel = path.relative_to(PKG.parent)
                except ValueError:
                    rel = path
                out.append(
                    f"{rel}:{arg.lineno} lambda "
                    f"closes over {name!r} = {'/'.join(sorted(hits))} "
                    "expression — re-evaluated per element; pass it as an "
                    "HOF argument (slice/zip) or project it to a column, "
                    "or tag `# hof-bound-ok: <reason>` if the expression "
                    "is provably O(1) per evaluation"
                )
    return out


def test_no_explosive_expressions_bound_into_hof_lambdas():
    offenders: list[str] = []
    for path in sorted(PKG.rglob("*.py")):
        offenders += _violations(path)
    assert not offenders, "\n".join(offenders)


def test_lint_positive_control(tmp_path):
    """The pre-fix word_shingles shape must be flagged — a lint that
    can't catch the historical bug is decoration."""
    bad = tmp_path / "bad.py"
    bad.write_text(
        "from pyspark.sql import functions as F\n"
        "def shingles(c, n):\n"
        "    tok = F.split(c, ' ')\n"
        "    return F.transform(\n"
        "        F.sequence(F.lit(0), F.size(tok) - n),\n"
        "        lambda i: F.concat_ws(' ', F.slice(tok, i + 1, n)),\n"
        "    )\n"
    )
    assert _violations(bad), "lint failed to flag the historical trap"


def test_lint_allows_attribute_closures(tmp_path):
    """Closures over F.col attributes are O(1) per element — allowed."""
    ok = tmp_path / "ok.py"
    ok.write_text(
        "from pyspark.sql import functions as F\n"
        "def bigrams():\n"
        "    t = F.col('t')\n"
        "    return F.transform(\n"
        "        F.slice(t, 1, F.size(t) - 1),\n"
        "        lambda x, i: F.concat_ws(' ', x, F.element_at(t, i + 2)),\n"
        "    )\n"
    )
    assert not _violations(ok)
