"""Source lint: ban plain (pos)explode over staged/computed array columns.

The trap (burned three times: span_pairs r3, winnowing r5, skipgram r6):
``InferFiltersFromGenerate`` infers ``size(c) > 0 AND isnotnull(c)``
below a non-outer Generate whose child is an ATTRIBUTE. When that
attribute is defined by a Project, projection collapse / filter
pushdown substitute the defining expression into the inferred filter,
re-evaluating the whole array pipeline (tokenize / shingle / window
transform) once more per input row — interpreted, below any upstream
gates it reorders past. Measured effects in this repo: winnowing
6.59 s -> 4.26 s after the fix (r5), minhash 1.60 s -> 6.75 s when a
computed-array gate slipped below its projection (r5).

Empirically verified rules (Spark 4.1, see SCALE.md):

- plain ``(pos)explode(<inline expression>)`` is SAFE — the rule only
  fires for attribute children, so `F.explode(tokens(...))` never
  clones;
- plain ``(pos)explode("staged_col")`` is the hazard — safe only when
  the attribute comes from an Aggregate / cache / raw scan, which a
  source lint cannot see;
- ``posexplode_outer`` + ``.where(pos.isNotNull())`` is exactly
  equivalent to plain explode (empty/null arrays drop, null ELEMENTS
  survive) and is never rewritten (the rule skips outer generates).

House rule enforced here: plain `F.explode` / `F.posexplode` may take
only an inline expression (a call other than `F.col`). Anything else —
string column name, `F.col(...)`, a bare variable — must either switch
to the `_outer` idiom or carry an `explode-ok: <reason>` comment on the
same or the preceding line (reserved for provably foldable/attribute
cases argued in place).
"""

from __future__ import annotations

import ast
from pathlib import Path

PACKAGE = Path(__file__).resolve().parent.parent / "concurrent_etl_spark"

_BANNED_FUNCS = {"explode", "posexplode"}


def _violations(source: str, filename: str = "<mem>") -> list[str]:
    """Return 'file:line: message' for every banned plain-explode form."""
    tree = ast.parse(source, filename=filename)
    lines = source.splitlines()
    out = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        func = node.func
        name = None
        if isinstance(func, ast.Attribute):
            name = func.attr
        elif isinstance(func, ast.Name):
            name = func.id
        if name not in _BANNED_FUNCS or not node.args:
            continue
        arg = node.args[0]
        # inline expression: any call EXCEPT F.col / col (which just
        # renames an attribute and keeps the hazard)
        if isinstance(arg, ast.Call):
            f = arg.func
            fname = f.attr if isinstance(f, ast.Attribute) else (
                f.id if isinstance(f, ast.Name) else None
            )
            if fname != "col":
                continue
        # allow with an explicit explode-ok comment (same line or the
        # two preceding lines — room for a wrapped comment)
        ln = node.lineno
        window = lines[max(0, ln - 3) : ln]
        if any("explode-ok" in l for l in window):
            continue
        out.append(
            f"{filename}:{ln}: plain {name}() over a staged/col-named "
            "array — use posexplode_outer + .where(pos.isNotNull()), "
            "or justify with an 'explode-ok:' comment"
        )
    return out


def test_lint_flags_staged_plain_explode():
    bad = (
        "df.select('doc_id', F.posexplode('tk').alias('p', 't'))\n"
        "df.select(F.explode(F.col('ws')).alias('w'))\n"
        "df.select(F.explode(rows).alias('i'))\n"
    )
    v = _violations(bad)
    assert len(v) == 3, v


def test_lint_accepts_safe_forms():
    good = (
        "df.select(F.explode(tokens(F.lower(F.col('text')))).alias('t'))\n"
        "df.select(F.posexplode_outer('tk').alias('p', 't'))\n"
        "# explode-ok: literal array\n"
        "df.select(F.explode(rows).alias('i'))\n"
    )
    assert _violations(good) == []


def test_package_has_no_staged_plain_explode():
    all_v = []
    for path in sorted(PACKAGE.rglob("*.py")):
        all_v.extend(_violations(path.read_text(), str(path)))
    assert all_v == [], "\n".join(all_v)
