"""Stateful-streaming state-bound lint (round-9 verdict item 5).

The ~10 ``applyInPandasWithState`` operators each claim O(1)-per-key
(or explicitly bounded) state in prose. This test makes the claim a
CONTRACT in the broadcast-tag-lint style: the per-operator state
schema documented in SCALE.md ("Stateful streaming state bounds"
table) is pinned here against the schema the CODE actually passes as
``stateStructType`` — extracted by AST from every call site, module-
level or function-local, so neither the docs nor the code can drift
silently. A new ``applyInPandasWithState`` site that is not declared
in the table fails the sweep with its file:line.
"""

from __future__ import annotations

import ast
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "spark_stream_kudu_spark"
SCALE = Path(__file__).resolve().parent.parent / "SCALE.md"

# file (relative to the streaming pkg) -> ordered state schemas, one
# per applyInPandasWithState call site in source order, rendered as
# "name:type[,name:type...]". THIS is the documented contract — the
# SCALE.md table renders the same strings (asserted below), alongside
# the per-key byte bound and the eviction rule the table documents.
EXPECTED_STATE = {
    "streaming/stateful.py": ["seen:boolean"],
    "streaming/transitions.py": ["last_type:string"],
    "streaming/sessions.py": [
        "session_idx:long,start_ms:long,last_ms:long,n_events:long"
    ],
    "streaming/scd2.py": ["cur_state:string,cur_from_ms:long"],
    "streaming/attribution.py": ["t_ms:long,event_id:long,touch:string"],
    "streaming/cep.py": [
        "last_view_ms:long,last_signup_ms:long",
        "hour_ms:long,admitted:long",
    ],
    "streaming/anomaly.py": [
        "window_vals:array<double>",
        "cum:long,min_cum:long",
    ],
    "streaming/drift.py": ["level:double,trend:double,n_obs:long"],
}

_TYPE_NAMES = {
    "BooleanType": "boolean",
    "LongType": "long",
    "IntegerType": "int",
    "DoubleType": "double",
    "FloatType": "float",
    "StringType": "string",
    "BinaryType": "binary",
    "TimestampType": "timestamp",
    "DateType": "date",
}


def _render_type(node: ast.expr) -> str:
    """Render a pyspark.sql.types constructor AST node as a compact
    type string (ArrayType(DoubleType()) -> array<double>)."""
    if isinstance(node, ast.Call):
        fn = node.func
        name = fn.attr if isinstance(fn, ast.Attribute) else fn.id
        if name == "ArrayType":
            return f"array<{_render_type(node.args[0])}>"
        if name in _TYPE_NAMES:
            return _TYPE_NAMES[name]
        raise AssertionError(f"unknown type constructor {name}")
    raise AssertionError(f"unexpected type node {ast.dump(node)[:80]}")


def _render_struct(node: ast.expr) -> str:
    """Render a StructType([...StructField...]) AST node."""
    fields = []
    for sub in ast.walk(node):
        if (
            isinstance(sub, ast.Call)
            and (
                (isinstance(sub.func, ast.Attribute) and sub.func.attr == "StructField")
                or (isinstance(sub.func, ast.Name) and sub.func.id == "StructField")
            )
        ):
            fname = sub.args[0]
            assert isinstance(fname, ast.Constant), ast.dump(fname)
            fields.append((sub.lineno, f"{fname.value}:{_render_type(sub.args[1])}"))
    assert fields, f"no StructField in {ast.dump(node)[:80]}"
    return ",".join(f for _, f in sorted(fields))


def _state_schemas(path: Path) -> list[tuple[int, str]]:
    """(lineno, rendered schema) per applyInPandasWithState call in
    ``path``, resolving the stateStructType argument through the
    nearest preceding assignment to the same name (module-level
    constant or function-local)."""
    tree = ast.parse(path.read_text())
    assigns: list[tuple[int, str, ast.expr]] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and len(node.targets) == 1:
            t = node.targets[0]
            if isinstance(t, ast.Name):
                assigns.append((node.lineno, t.id, node.value))
    out: list[tuple[int, str]] = []
    for node in ast.walk(tree):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "applyInPandasWithState"
        ):
            continue
        state_arg = None
        for kw in node.keywords:
            if kw.arg == "stateStructType":
                state_arg = kw.value
        assert state_arg is not None, f"{path}:{node.lineno} positional state arg"
        if isinstance(state_arg, ast.Name):
            cands = [
                (ln, v)
                for ln, name, v in assigns
                if name == state_arg.id and ln < node.lineno
            ]
            assert cands, f"{path}:{node.lineno} unresolved {state_arg.id}"
            state_arg = max(cands)[1]
        out.append((node.lineno, _render_struct(state_arg)))
    return sorted(out)


def test_state_schemas_match_documented_bounds():
    """Every applyInPandasWithState site's state schema equals the
    documented contract, file by file in source order — and no site
    exists outside the table."""
    actual: dict[str, list[str]] = {}
    for path in sorted(PKG.rglob("*.py")):
        if "applyInPandasWithState" not in path.read_text():
            continue
        schemas = _state_schemas(path)
        if schemas:
            actual[str(path.relative_to(PKG))] = [s for _, s in schemas]
    assert actual == EXPECTED_STATE, (
        "stateful operators' state schemas drifted from the documented "
        f"bounds table:\nactual   = {actual}\nexpected = {EXPECTED_STATE}\n"
        "update BOTH the SCALE.md 'Stateful streaming state bounds' "
        "table and EXPECTED_STATE here, with the byte bound and "
        "eviction rule for any new state field"
    )


def test_state_bounds_table_in_scale_md():
    """SCALE.md's state-bounds table carries every documented schema
    string verbatim — the human-readable table cannot silently diverge
    from the code-pinned contract above."""
    text = SCALE.read_text()
    assert "Stateful streaming state bounds" in text
    for file, schemas in EXPECTED_STATE.items():
        for schema in schemas:
            assert f"`{schema}`" in text, (
                f"SCALE.md state-bounds table is missing the schema "
                f"`{schema}` ({file})"
            )


def test_zscore_window_bound_is_enforced_in_code():
    """The one non-scalar state schema (zscore's window_vals array) is
    bounded by _Z_WINDOW in code — the trim that makes its documented
    O(window) byte bound true."""
    src = (PKG / "streaming" / "anomaly.py").read_text()
    assert "del buf[0 : len(buf) - _Z_WINDOW]" in src
