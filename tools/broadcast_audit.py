"""Static broadcast-boundedness audit (VERDICT r7 item 2).

A forced ``F.broadcast`` bypasses ``autoBroadcastJoinThreshold``; that is
correct only when the build side is BOUNDED — by construction (constant
grids, capped centroid sets, one-row aggregates) or by the TPC-H spec
(nation=25, region=5 rows). A hint on a RAW SCAN of a table that grows
with the corpus (customer/part/supplier/...) is the "first plan that
worked" failure mode: fine at every measured sf, OOM at the 100 TB North
Star. Those sites must use ``sources.catalog.scaled_broadcast`` (hints
only under an on-disk size cap; above it AQE decides).

This tool walks the package's AST and classifies every ``broadcast(x)``
call site by tracing ``x`` back through assignments and method chains
within the enclosing function:

  guarded          scaled_broadcast call sites (the fix)
  bounded-const    root is nation/region, a literal DataFrame, or no
                   scaling-table scan is reachable
  bounded-derived  the chain passes a cardinality-reducing op (limit,
                   agg, groupBy, join, sample, a pandas kernel, ...) —
                   the class the judge's per-site review found provably
                   bounded (capped centroids, grand aggregates, grids)
  UNGUARDED        a narrow chain (filter/select/withColumn/... only)
                   from a scaling table's scan — flagged, exit 1

A site that is genuinely bounded despite a narrow chain can carry a
``# bcast-bounded: <reason>`` comment on the call line (or the line
above); the tool records it as reviewed-bounded. The tracing is a
heuristic (single-name assignments, one function scope), deliberately
conservative toward NOT flagging what it cannot resolve — its job is to
keep the known-dangerous idiom (hint on a raw dim scan) at zero, which
``tools/plan_audit.py`` enforces as part of the round gate.

Usage: python tools/broadcast_audit.py [-v]   # -v lists every site
"""

from __future__ import annotations

import ast
import os
import sys

REPO_ROOT = os.environ.get(
    "MTMRL_REPO_ROOT", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
PKG_DIR = os.path.join(REPO_ROOT, "multithreaded_map_reduce_library_spark")

#: Tables whose row count scales linearly with sf (everything the driver
#: generates except the spec-constant nation/region).
SCALING_TABLES = frozenset(
    {"customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"}
)

#: DataFrame methods that change neither cardinality class nor source:
#: the chain below them still scales with the scan.
NARROW_METHODS = frozenset(
    {
        "filter",
        "where",
        "select",
        "selectExpr",
        "withColumn",
        "withColumns",
        "withColumnRenamed",
        "withColumnsRenamed",
        "drop",
        "dropna",
        "fillna",
        "na",
        "alias",
        "hint",
        "repartition",
        "repartitionByRange",
        "coalesce",
        "sort",
        "orderBy",
        "sortWithinPartitions",
        "cache",
        "persist",
        "localCheckpoint",
        "checkpoint",
        "toDF",
        "distinct",
        "dropDuplicates",
        "unionByName",
        "union",
    }
)

# trace() returns one of:
#   ("raw", table)   narrow chain from a scaling table's scan
#   ("derived", None) chain passed a cardinality-reducing op
#   ("other", None)  constant/unresolvable root


def _table_from_path_arg(call: ast.Call) -> str | None:
    """Extract '<table>' from a read path argument like
    f"{sf_dir}/part.parquet" or a plain string literal."""
    for a in call.args:
        parts: list[str] = []
        if isinstance(a, ast.JoinedStr):
            parts = [v.value for v in a.values if isinstance(v, ast.Constant) and isinstance(v.value, str)]
        elif isinstance(a, ast.Constant) and isinstance(a.value, str):
            parts = [a.value]
        for p in parts:
            for t in SCALING_TABLES:
                if f"{t}.parquet" in p:
                    return t
    return None


#: Aggregate functions whose presence in a bare .select(...) makes it a
#: one-row global aggregate.
_AGG_FNS = frozenset(
    {"count", "countDistinct", "count_distinct", "sum", "min", "max", "avg", "mean", "first", "last", "collect_list", "collect_set", "sum_distinct", "approx_count_distinct"}
)


def _has_agg_arg(call: ast.Call) -> bool:
    for a in call.args:
        for sub in ast.walk(a):
            if isinstance(sub, ast.Call):
                f = sub.func
                n = f.id if isinstance(f, ast.Name) else (f.attr if isinstance(f, ast.Attribute) else None)
                if n in _AGG_FNS:
                    return True
    return False


def trace(node: ast.AST, env: dict[str, tuple[str, str | None]]) -> tuple[str, str | None]:
    if isinstance(node, ast.Name):
        return env.get(node.id, ("other", None))
    if isinstance(node, ast.Call):
        f = node.func
        fname = f.id if isinstance(f, ast.Name) else (f.attr if isinstance(f, ast.Attribute) else None)
        if fname == "load_table":
            tbl = None
            if len(node.args) >= 3 and isinstance(node.args[2], ast.Constant):
                tbl = node.args[2].value
            return ("raw", tbl) if tbl in SCALING_TABLES else ("other", tbl)
        if fname == "parquet":
            tbl = _table_from_path_arg(node)
            return ("raw", tbl) if tbl else ("other", None)
        if fname in ("broadcast", "scaled_broadcast"):
            return trace(node.args[0], env) if node.args else ("other", None)
        if isinstance(f, ast.Attribute):
            if fname == "select" and _has_agg_arg(node):
                # df.select(F.count(...)) without groupBy = one-row grand
                # aggregate (Spark promotes it to a global Aggregate)
                return ("derived", None)
            if fname in NARROW_METHODS:
                return trace(f.value, env)
            return ("derived", None)
        return ("other", None)
    if isinstance(node, ast.Attribute):
        # e.g. `df.na` in a fill chain
        return trace(node.value, env)
    return ("other", None)


_STMT_LIST_FIELDS = ("body", "orelse", "finalbody", "handlers")


def _shallow_walk(node: ast.AST):
    """Walk an AST without descending into nested STATEMENT bodies
    (if/for/try/with/def bodies) — those are visited by visit_stmts
    itself, in order, under the env as of THAT point. Classifying a
    nested site here too would double-count it under a stale env
    (code-review r8: 21 duplicated sites, 8 with conflicting classes)."""
    yield node
    for field, value in ast.iter_fields(node):
        if field in _STMT_LIST_FIELDS:
            continue
        if isinstance(value, ast.AST):
            yield from _shallow_walk(value)
        elif isinstance(value, list):
            for v in value:
                if isinstance(v, ast.AST):
                    yield from _shallow_walk(v)


def _broadcast_calls(node: ast.AST):
    for sub in _shallow_walk(node):
        if isinstance(sub, ast.Call):
            f = sub.func
            name = f.id if isinstance(f, ast.Name) else (f.attr if isinstance(f, ast.Attribute) else None)
            if name in ("broadcast", "scaled_broadcast") and sub.args:
                yield name, sub


def audit_function(fn: ast.FunctionDef, src_lines: list[str], rel: str, sites: list[dict]) -> None:
    env: dict[str, tuple[str, str | None]] = {}

    def visit_stmts(stmts) -> None:
        for st in stmts:
            # nested defs/classes are separate scopes, visited by
            # collect_sites' own FunctionDef walk — skip them here
            if isinstance(st, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                continue
            # classify broadcast calls under the env as of this statement
            for kind_name, call in _broadcast_calls(st):
                if kind_name == "scaled_broadcast":
                    cls, tbl = "guarded", None
                else:
                    kind, tbl = trace(call.args[0], env)
                    line = src_lines[call.lineno - 1] if call.lineno - 1 < len(src_lines) else ""
                    # scan upward through the contiguous comment block above
                    # the call for the reviewed-bounded pragma
                    pragma = "# bcast-bounded:" in line
                    i = call.lineno - 2
                    while i >= 0 and src_lines[i].lstrip().startswith("#"):
                        if "# bcast-bounded:" in src_lines[i]:
                            pragma = True
                        i -= 1
                    if pragma:
                        cls = "reviewed-bounded"
                    elif kind == "raw":
                        cls = "UNGUARDED"
                    elif kind == "derived":
                        cls = "bounded-derived"
                    else:
                        cls = "bounded-const"
                sites.append(
                    {"file": rel, "line": call.lineno, "fn": fn.name, "class": cls, "table": tbl}
                )
            # then apply the statement's binding effect
            if isinstance(st, ast.Assign) and len(st.targets) == 1 and isinstance(st.targets[0], ast.Name):
                env[st.targets[0].id] = trace(st.value, env)
            elif isinstance(st, ast.Assign):
                # multi-target / tuple-unpacking assigns (ADVICE r8):
                # `a, b = scan1, scan2` traces element-wise; anything
                # less structured rebinds every Name target to ("other",
                # None) explicitly so a STALE earlier binding (raw or
                # const) can't silently mis-classify a later broadcast
                for tgt in st.targets:
                    if (
                        isinstance(tgt, (ast.Tuple, ast.List))
                        and isinstance(st.value, (ast.Tuple, ast.List))
                        and len(tgt.elts) == len(st.value.elts)
                        and all(isinstance(e, ast.Name) for e in tgt.elts)
                    ):
                        for e, v in zip(tgt.elts, st.value.elts):
                            env[e.id] = trace(v, env)
                        continue
                    elts = tgt.elts if isinstance(tgt, (ast.Tuple, ast.List)) else [tgt]
                    for e in elts:
                        inner_e = e.value if isinstance(e, ast.Starred) else e
                        if isinstance(inner_e, ast.Name):
                            env[inner_e.id] = trace(st.value, env) if len(elts) == 1 else ("other", None)
            elif isinstance(st, ast.AugAssign) and isinstance(st.target, ast.Name):
                env[st.target.id] = ("other", None)
            # recurse into nested bodies in source order
            for attr in ("body", "orelse", "finalbody"):
                inner = getattr(st, attr, None)
                if inner:
                    visit_stmts(inner)
            for h in getattr(st, "handlers", []) or []:
                visit_stmts(h.body)
            # match-statement case bodies (ADVICE r8): ast.Match keeps
            # its arms under `cases`, not any of the fields above —
            # without this, a broadcast site inside a match arm would
            # be silently unaudited
            for case in getattr(st, "cases", []) or []:
                visit_stmts(case.body)

    visit_stmts(fn.body)


def collect_sites() -> list[dict]:
    sites: list[dict] = []
    for root, _dirs, files in os.walk(PKG_DIR):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, REPO_ROOT)
            with open(path) as fh:
                src = fh.read()
            tree = ast.parse(src)
            src_lines = src.splitlines()
            for node in ast.walk(tree):
                if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    audit_function(node, src_lines, rel, sites)
    return sites


def main() -> int:
    sites = collect_sites()
    by_class: dict[str, int] = {}
    for s in sites:
        by_class[s["class"]] = by_class.get(s["class"], 0) + 1
    unguarded = [s for s in sites if s["class"] == "UNGUARDED"]
    if "-v" in sys.argv:
        for s in sorted(sites, key=lambda s: (s["file"], s["line"])):
            print(f"  {s['file']}:{s['line']} [{s['fn']}] {s['class']}" + (f" table={s['table']}" if s["table"] else ""))
    for s in unguarded:
        print(f"UNGUARDED {s['file']}:{s['line']} [{s['fn']}] raw scan of {s['table']}")
    print(
        f"BROADCAST AUDIT: {len(sites)} sites — "
        + ", ".join(f"{k}={v}" for k, v in sorted(by_class.items()))
    )
    return 1 if unguarded else 0


if __name__ == "__main__":
    raise SystemExit(main())
