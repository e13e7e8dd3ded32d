"""Triage every decimal->double conversion site, both engines — the r14
verdict's ask #1 ("the decimal→double conversion class is only HALF
closed", SCALING_r14.md residual note).

Background: once a decimal's UNSCALED value crosses 2^53, the engines'
NATIVE decimal->double casts are not both correctly rounded (DuckDB's
measured 1 ulp high at sf1 on pricing_summary; the r6 int128->double
truncation family). The r14 fix closed the sharp exposure (dsum/davg
raw-double OUTPUT columns take the string hop on both engines); this
tool enumerates the REMAINDER so each site can be converted to the
string-hop convention or allowlisted with a magnitude proof
(unscaled < 2^53 on both sides => both native paths are single-rounded
and exact-operand, hence correctly rounded and equal to the hop).

Spark side: AST walk over engine sources for `<expr>.cast("double")`
where <expr> contains a decimal cast — directly, or via a local name
bound to a decimal-cast expression in the same module (the same
name-tracking the accumulator lints use; fixtures carry no decimal
columns, so every decimal in the engine originates at an explicit
cast site — verified: pyarrow schemas of all 10 fixture tables).

Oracle side: balanced-paren extraction of every `CAST(<inner> AS
DOUBLE)` in registry.ORACLES; the inner is HOP-safe when it is itself
a `CAST(... AS VARCHAR)`, suspect when it mentions DECIMAL( / sum( /
HUGEINT (DuckDB's native DECIMAL->DOUBLE and HUGEINT->DOUBLE are the
measured-wrong paths).

Usage: python tools/triage_decimal_double.py [--json evidence/...]
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import data_engineering_spotify_etl_airflow_aws_spark as engine

_PKG = os.path.dirname(engine.__file__)
_SCAN_DIRS = ("operators", "streaming", "functions", "pipeline", "sources")


def _is_cast_to(node: ast.AST, typename: str) -> bool:
    return (
        isinstance(node, ast.Call)
        and isinstance(node.func, ast.Attribute)
        and node.func.attr == "cast"
        and len(node.args) == 1
        and isinstance(node.args[0], ast.Constant)
        and isinstance(node.args[0].value, str)
        and node.args[0].value.lower().startswith(typename)
    )


def _contains_decimal(
    node: ast.AST, dec_names: set[str], dec_aliases: set[str] = frozenset()
) -> bool:
    for n in ast.walk(node):
        if _is_cast_to(n, "decimal"):
            return True
        if isinstance(n, ast.Name) and n.id in dec_names:
            return True
        # a column REFERENCE to a decimal-typed alias created earlier in
        # the same function (F.col("s") / "s" after .alias("s") on a
        # decimal expression) — cross-select blindness, r15 find on
        # dow_seasonality_profile / cusum_changepoint_daily
        if (
            isinstance(n, ast.Constant)
            and isinstance(n.value, str)
            and n.value in dec_aliases
        ):
            return True
    return False


def _decimal_aliases(scope_nodes: list[ast.AST], dec_names: set[str]) -> set[str]:
    """Alias strings whose aliased expression is decimal-sourced:
    `<decimal expr>.alias("x")` anywhere in the given scopes."""
    out: set[str] = set()
    for s in scope_nodes:
        for n in ast.walk(s):
            if (
                isinstance(n, ast.Call)
                and isinstance(n.func, ast.Attribute)
                and n.func.attr == "alias"
                and n.args
                and isinstance(n.args[0], ast.Constant)
                and isinstance(n.args[0].value, str)
                and _contains_decimal(n.func.value, dec_names)
            ):
                out.add(n.args[0].value)
    return out


def _enclosing_function(tree: ast.Module, lineno: int) -> str:
    best = "<module>"
    for n in ast.walk(tree):
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)):
            end = getattr(n, "end_lineno", n.lineno)
            if n.lineno <= lineno <= end:
                best = n.name
    return best


def scan_spark_side() -> list[dict]:
    sites: list[dict] = []
    for d in _SCAN_DIRS:
        full = os.path.join(_PKG, d)
        if not os.path.isdir(full):
            continue
        for fn in sorted(os.listdir(full)):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(full, fn)
            src = open(path).read()
            tree = ast.parse(src)
            # scan each function with FUNCTION-scoped name tracking
            # (module-wide tracking poisons short reused names like `w`)
            scopes: list[ast.AST] = [
                n
                for n in ast.walk(tree)
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
            ]
            for scope in scopes:
                # skip nested defs: they are scanned as their own scope
                inner_defs = [
                    n
                    for n in ast.walk(scope)
                    if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
                    and n is not scope
                ]

                def in_inner(node: ast.AST) -> bool:
                    return any(
                        d.lineno <= node.lineno <= getattr(d, "end_lineno", d.lineno)
                        for d in inner_defs
                    )

                # visible names: this scope, every enclosing function
                # (closures), and module level — but never siblings
                def contains(outer: ast.AST, inner: ast.AST) -> bool:
                    return (
                        outer.lineno <= inner.lineno
                        and getattr(outer, "end_lineno", outer.lineno)
                        >= getattr(inner, "end_lineno", inner.lineno)
                    )

                visible = [scope] + [
                    s for s in scopes if s is not scope and contains(s, scope)
                ]
                module_assigns = [
                    n
                    for n in tree.body
                    if isinstance(n, ast.Assign)
                    and len(n.targets) == 1
                    and isinstance(n.targets[0], ast.Name)
                ]
                dec_names: set[str] = set()
                assigns = module_assigns + [
                    n
                    for s in visible
                    for n in ast.walk(s)
                    if isinstance(n, ast.Assign)
                    and len(n.targets) == 1
                    and isinstance(n.targets[0], ast.Name)
                ]
                changed = True
                while changed:
                    changed = False
                    for a in assigns:
                        t = a.targets[0].id
                        if t not in dec_names and _contains_decimal(
                            a.value, dec_names
                        ):
                            dec_names.add(t)
                            changed = True
                dec_aliases = _decimal_aliases(visible, dec_names)
                for node in ast.walk(scope):
                    if not _is_cast_to(node, "double") or in_inner(node):
                        continue
                    recv = node.func.value
                    if _is_cast_to(recv, "string"):
                        kind = "hop"  # the convention — safe by spec
                    elif _contains_decimal(recv, dec_names):
                        kind = "decimal_native"  # the class under triage
                    elif _contains_decimal(recv, dec_names, dec_aliases):
                        # reference to a decimal-typed column alias from
                        # an earlier select in the same function
                        kind = "decimal_native_via_alias"
                    else:
                        continue  # int/double-sourced: out of class
                    sites.append(
                        {
                            "side": "spark",
                            "file": f"{d}/{fn}",
                            "line": node.lineno,
                            "col": node.col_offset,
                            "func": scope.name,
                            "kind": kind,
                            "snippet": ast.get_source_segment(src, node)[:160],
                        }
                    )
    return sites


_AS_DOUBLE = re.compile(r"AS\s+DOUBLE\s*\)", re.I)


def _extract_cast_inner(sql: str, close_idx: int) -> str | None:
    """Given the index of the `)` that closes `CAST(... AS DOUBLE)`,
    walk back to the matching `CAST(` and return the inner expression."""
    depth = 0
    i = close_idx
    while i >= 0:
        c = sql[i]
        if c == ")":
            depth += 1
        elif c == "(":
            depth -= 1
            if depth == 0:
                start = sql[:i].upper().rstrip()
                if start.endswith("CAST"):
                    inner = sql[i + 1 : close_idx]
                    # strip the trailing "AS DOUBLE"
                    return re.sub(r"\s+AS\s+DOUBLE\s*$", "", inner, flags=re.I)
                return None
        i -= 1
    return None


_SQL_TYPE_WORDS = {
    "bigint", "integer", "int", "varchar", "double", "hugeint", "decimal",
    "date", "boolean", "smallint", "tinyint", "float", "real", "text",
}

def _match_paren(s: str, open_idx: int) -> int | None:
    """Index of the `)` matching the `(` at open_idx, or None."""
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    return None


def _wide_oracle_aliases(sql: str) -> set[str]:
    """Aliases typed HUGEINT/DECIMAL by DuckDB: un-narrowed sum(...) —
    plain, FILTERed, or windowed — and explicit DECIMAL casts. Balanced-
    paren parsing, not depth-limited regex: the r15 float32 false
    positive (embedding_dim_stats' `unnest(...) AS val` matched a lazy
    `sum(...[^;]*?) AS val` pattern) and the dow_seasonality false
    negative (sum nested three parens deep) were both regex-depth bugs."""
    wide: set[str] = set()
    narrowed: set[str] = set()
    for m in re.finditer(r"\bsum\s*\(", sql, re.I):
        close = _match_paren(sql, m.end() - 1)
        if close is None:
            continue
        j = close + 1
        # skip any FILTER (...) / OVER (...) clauses
        while True:
            mo = re.match(r"\s+(?:FILTER|OVER)\s*\(", sql[j:], re.I)
            if not mo:
                break
            oc = _match_paren(sql, j + mo.end() - 1)
            if oc is None:
                break
            j = oc + 1
        ma = re.match(r"\s+AS\s+(\w+)", sql[j:], re.I)
        if not ma:
            continue
        w = ma.group(1)
        if w.lower() not in _SQL_TYPE_WORDS:
            wide.add(w)
            continue
        # `sum(...) AS <type>) [AS alias]` — the sum sits inside a CAST;
        # an exact-int64/varchar narrowing makes the alias non-wide
        mn = re.match(
            r"\s+AS\s+(BIGINT|INTEGER|INT|VARCHAR)\s*\)\s*AS\s+(\w+)",
            sql[j:],
            re.I,
        )
        if mn and mn.group(2).lower() not in _SQL_TYPE_WORDS:
            narrowed.add(mn.group(2))
    for m in re.finditer(r"AS\s+DECIMAL\s*\([^)]*\)\s*\)\s+AS\s+(\w+)",
                         sql, re.I | re.S):
        if m.group(1).lower() not in _SQL_TYPE_WORDS:
            wide.add(m.group(1))
    return wide - narrowed


def scan_oracle_side() -> list[dict]:
    from data_engineering_spotify_etl_airflow_aws_spark import registry

    engine.load_all_operators()
    sites: list[dict] = []
    for name in sorted(registry.ORACLES):
        sql = registry.ORACLES[name]
        for m in _AS_DOUBLE.finditer(sql):
            # m spans ") AS DOUBLE )"; the close paren of the CAST is the last
            close = m.end() - 1
            inner = _extract_cast_inner(sql, close)
            if inner is None:
                continue
            inner_stripped = inner.strip()
            if re.match(r"CAST\s*\(.*AS\s+VARCHAR\s*\)\s*$",
                        inner_stripped, re.I | re.S):
                kind = "hop"
            elif re.match(r"CAST\s*\(.*AS\s+(BIGINT|INTEGER|INT)\s*\)\s*$",
                          inner_stripped, re.I | re.S):
                # explicit exact-int64 narrowing: int64->double is
                # correctly rounded by spec in both engines (JLS
                # long->double; hardware i64->f64) — out of class
                kind = "int_narrowed"
            elif re.search(r"DECIMAL\s*\(|HUGEINT|\bsum\s*\(",
                           inner_stripped, re.I):
                kind = "wide_native"  # DuckDB native wide->double: suspect
            elif re.fullmatch(r"[A-Za-z_][\w.]*", inner_stripped) and (
                inner_stripped.split(".")[-1] in _wide_oracle_aliases(sql)
            ):
                # CTE-alias blindness: the cast target is a bare
                # identifier whose definition elsewhere in the SQL is an
                # un-narrowed sum(...)/DECIMAL cast — HUGEINT/DECIMAL by
                # DuckDB typing rules (balanced-paren alias parser)
                kind = "wide_native_via_alias"
            else:
                kind = "other_native"  # int32/varchar/etc — out of class
                # ...unless the inner MENTIONS an alias defined as an
                # un-narrowed sum() anywhere in this SQL (HUGEINT/DECIMAL
                # by DuckDB typing): max(th.sx), arithmetic over summed
                # CTE columns, etc. Over-approximate; adjudicate by hand.
                wide_aliases = _wide_oracle_aliases(sql)
                mentioned = {
                    w.split(".")[-1]
                    for w in re.findall(r"[A-Za-z_][\w.]*", inner_stripped)
                }
                if mentioned & wide_aliases:
                    kind = "wide_native_via_alias"
            sites.append(
                {
                    "side": "oracle",
                    "query": name,
                    "kind": kind,
                    "inner": inner_stripped[:160],
                }
            )
    return sites


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    spark = scan_spark_side()
    oracle = scan_oracle_side()

    def count(rows, key):
        out: dict[str, int] = {}
        for r in rows:
            out[r[key]] = out.get(r[key], 0) + 1
        return out

    summary = {
        "spark_kinds": count(spark, "kind"),
        "oracle_kinds": count(oracle, "kind"),
    }
    print(json.dumps(summary, indent=1))
    for r in spark:
        if r["kind"] == "decimal_native":
            print(f"SPARK  {r['file']}:{r['line']} {r['func']}: {r['snippet']}")
    seen = set()
    for r in oracle:
        if r["kind"] == "wide_native":
            key = (r["query"], r["inner"])
            if key in seen:
                continue
            seen.add(key)
            print(f"ORACLE {r['query']}: CAST({r['inner']} AS DOUBLE)")
    if args.json:
        os.makedirs(os.path.dirname(args.json), exist_ok=True)
        with open(args.json, "w") as f:
            json.dump({"summary": summary, "spark": spark, "oracle": oracle},
                      f, indent=1)
            f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
