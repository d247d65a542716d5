"""Persist-coverage regression guard for the ≥3-consumers rule (SURVEY
round-11 note #4, made a pinned test in round 12 per the r11 verdict):

    persist an unpersisted ``.distinct()`` when THREE or more downstream
    consumers read it, or when ANY separate action (``count``/``first``/
    ``collect``...) reads it alongside other consumers — each consumer
    otherwise recomputes the full upstream scan + distinct.  At exactly
    two in-job consumers it is a recompute-vs-cache-write wash and the
    bare form is deliberate (the _copurchase_edges / pl_wcc audit).

The check is static (AST): for every function in the registry module and
the library, find ``x = <chain ending in .distinct()>`` assignments whose
chain carries no ``persist``/``localCheckpoint``/``cache``, then count
the STATEMENTS that consume ``x``:

* granularity is the statement, not the name-load — ``a.join(b, a.c ==
  b.c)`` references ``b`` twice but evaluates it once;
* mutually exclusive ``if/elif/else`` branches contribute the MAX of
  their branch counts, not the sum — only one branch runs;
* an action anywhere down a chain ROOTED at the variable
  (``x.count()``, ``x.select(...).distinct().count()``) counts as the
  separate-action pattern when any other consumer exists (two jobs,
  each recomputing the distinct — the q_assoc_rules r11 finding);
* mutually exclusive try/except paths also take the max, finalbody
  always runs.

Current audited census: ZERO violations.  A new one fails loudly and
demands either a persist or a rationale + allowlist entry here.
"""

from __future__ import annotations

import ast
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ACTIONS = {"count", "collect", "first", "take", "head", "toPandas"}

# {(relpath, function, var): rationale} — deliberate bare distincts with
# an audited reason; keep this empty unless a wash/by-design case lands.
ALLOWED: dict[tuple[str, str, str], str] = {}


def _chain_methods(call: ast.AST) -> set[str]:
    seen: set[str] = set()
    n = call
    while isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute):
        seen.add(n.func.attr)
        n = n.func.value
    return seen


def _stmt_consumes(stmt: ast.stmt, var: str) -> bool:
    return any(
        isinstance(n, ast.Name) and n.id == var and isinstance(n.ctx, ast.Load)
        for n in ast.walk(stmt)
    )


def _chain_base(node: ast.AST) -> ast.AST:
    """Walk an attribute-call chain (``x.select(...).distinct().count()``)
    down to its base expression."""
    n = node
    while True:
        if isinstance(n, ast.Call):
            n = n.func
        elif isinstance(n, ast.Attribute):
            n = n.value
        else:
            return n


def _stmt_actions(stmt: ast.stmt, var: str) -> int:
    # an action anywhere down a chain rooted at the var counts: the
    # q_assoc_rules shape was `op.select('o').distinct().count()` —
    # requiring the call receiver to be the bare Name would miss it
    def _rooted_at_var(n: ast.Call) -> bool:
        base = _chain_base(n.func.value)
        return isinstance(base, ast.Name) and base.id == var

    return sum(
        1
        for n in ast.walk(stmt)
        if isinstance(n, ast.Call)
        and isinstance(n.func, ast.Attribute)
        and n.func.attr in ACTIONS
        and _rooted_at_var(n)
    )


def _terminal(stmts: list[ast.stmt]) -> bool:
    return bool(stmts) and isinstance(
        stmts[-1], (ast.Return, ast.Raise, ast.Continue, ast.Break)
    )


def _count_consumers(body: list[ast.stmt], var: str, skip: ast.stmt) -> tuple[int, int]:
    """(consuming statements, action statements) along the heaviest
    execution path through ``body`` — If branches take the max, and an
    early-return branch diverges from the remainder of the list (the
    join_element_table mode ladder is five exclusive paths, not five
    consumers)."""
    consumers = actions = 0
    for i, stmt in enumerate(body):
        if stmt is skip:
            continue
        if isinstance(stmt, ast.If):
            # the test expression itself, then the heavier branch
            test_hit = any(
                isinstance(n, ast.Name) and n.id == var and isinstance(n.ctx, ast.Load)
                for n in ast.walk(stmt.test)
            )
            c_then, a_then = _count_consumers(stmt.body, var, skip)
            if _terminal(stmt.body):
                # then-path ends here; else-path = orelse + remainder
                c_else, a_else = _count_consumers(
                    stmt.orelse + body[i + 1 :], var, skip
                )
                consumers += (1 if test_hit else 0) + max(c_then, c_else)
                actions += max(a_then, a_else)
                return consumers, actions
            c_else, a_else = _count_consumers(stmt.orelse, var, skip)
            consumers += (1 if test_hit else 0) + max(c_then, c_else)
            actions += max(a_then, a_else)
        elif isinstance(stmt, ast.Try):
            # body+orelse is the happy path; each handler is an
            # alternative — take the heaviest single path (summing
            # mutually exclusive paths would false-flag), finalbody
            # always runs
            c_happy, a_happy = _count_consumers(stmt.body + stmt.orelse, var, skip)
            c_h = a_h = 0
            for h in stmt.handlers:
                ch, ah = _count_consumers(h.body, var, skip)
                c_h, a_h = max(c_h, ch), max(a_h, ah)
            c_fin, a_fin = _count_consumers(stmt.finalbody, var, skip)
            consumers += max(c_happy, c_h) + c_fin
            actions += max(a_happy, a_h) + a_fin
        elif isinstance(stmt, (ast.For, ast.While, ast.With)):
            # loops/with re-run their body on one path: count inner
            # statements directly (a loop may well re-consume per
            # iteration, which only strengthens the finding)
            inner = getattr(stmt, "body", []) + getattr(stmt, "orelse", [])
            c, a = _count_consumers(inner, var, skip)
            test_hit = hasattr(stmt, "test") and any(
                isinstance(n, ast.Name) and n.id == var and isinstance(n.ctx, ast.Load)
                for n in ast.walk(stmt.test)
            )
            iter_hit = hasattr(stmt, "iter") and _stmt_consumes(stmt, var) and c == 0
            consumers += c + (1 if (test_hit or iter_hit) else 0)
            actions += a
        else:
            if _stmt_consumes(stmt, var):
                consumers += 1
            actions += 1 if _stmt_actions(stmt, var) else 0
    return consumers, actions


def _audit_file(path: str) -> list[tuple[str, str, str, int, int]]:
    rel = os.path.relpath(path, ROOT)
    tree = ast.parse(open(path).read())
    findings = []
    for fn in (n for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)):
        for stmt in ast.walk(fn):
            if not (
                isinstance(stmt, ast.Assign)
                and len(stmt.targets) == 1
                and isinstance(stmt.targets[0], ast.Name)
                and isinstance(stmt.value, ast.Call)
            ):
                continue
            methods = _chain_methods(stmt.value)
            if "distinct" not in methods:
                continue
            if methods & {"persist", "cache", "localCheckpoint"}:
                continue
            var = stmt.targets[0].id
            consumers, actions = _count_consumers(fn.body, var, stmt)
            violation = consumers >= 3 or (actions >= 1 and consumers >= 2)
            if violation and (rel, fn.name, var) not in ALLOWED:
                findings.append((rel, fn.name, var, consumers, actions))
    return findings


def test_unpersisted_distinct_consumer_rule():
    targets = [os.path.join(ROOT, "__spark_entry__.py")]
    for root, _, files in os.walk(os.path.join(ROOT, "spatialdata_spark")):
        targets += [os.path.join(root, f) for f in files if f.endswith(".py")]
    findings = []
    for t in sorted(targets):
        findings += _audit_file(t)
    assert not findings, (
        "unpersisted .distinct() with >=3 consumers or a separate action "
        f"(file, function, var, consumers, actions): {findings} — persist "
        "it (MEMORY_AND_DISK, the q_assoc_rules pattern) or add an audited "
        "ALLOWED entry with a rationale"
    )


def test_detector_catches_the_assoc_rules_pattern(tmp_path):
    """Non-vacuousness pin: the exact pre-r11 q_assoc_rules shape (an
    unpersisted distinct with a separate .count() action + self-join
    consumers) must be flagged, and the persisted form must not."""
    bad = tmp_path / "bad.py"
    bad.write_text(
        "def q(spark, sf):\n"
        "    op = li.select('o', 'p').distinct()\n"
        "    n = op.select('o').distinct().count()\n"
        "    item = op.groupBy('p').count()\n"
        "    pairs = op.join(op, 'o')\n"
        "    return pairs\n"
    )
    flagged = _audit_file(str(bad))
    assert any(v == "op" for (_, _, v, _, _) in flagged), flagged

    good = tmp_path / "good.py"
    good.write_text(
        "def q(spark, sf):\n"
        "    op = li.select('o', 'p').distinct().persist()\n"
        "    n = op.select('o').distinct().count()\n"
        "    item = op.groupBy('p').count()\n"
        "    pairs = op.join(op, 'o')\n"
        "    return pairs\n"
    )
    assert not _audit_file(str(good))


def test_detector_catches_chained_action_at_two_consumers(tmp_path):
    """The separate-action rule must see actions at the end of a chain
    ROOTED at the var (`op.select(...).distinct().count()`), and a
    2-consumer case WITH such an action is a violation while the same
    two consumers without one are the documented wash."""
    bad = tmp_path / "bad2.py"
    bad.write_text(
        "def q(spark, sf):\n"
        "    op = li.select('o', 'p').distinct()\n"
        "    n = op.select('o').distinct().count()\n"
        "    pairs = op.join(other, 'o')\n"
        "    return pairs\n"
    )
    flagged = _audit_file(str(bad))
    assert any(v == "op" for (_, _, v, _, _) in flagged), flagged

    wash = tmp_path / "wash.py"
    wash.write_text(
        "def q(spark, sf):\n"
        "    op = li.select('o', 'p').distinct()\n"
        "    item = op.groupBy('p').agg(x)\n"
        "    pairs = op.join(other, 'o')\n"
        "    return pairs\n"
    )
    assert not _audit_file(str(wash))


def test_detector_takes_max_over_try_paths(tmp_path):
    """Mutually exclusive try/except paths must not sum: two consumers
    split across body and handler plus one more is still the heaviest
    path of 2 — the documented wash, not a violation."""
    p = tmp_path / "trypaths.py"
    p.write_text(
        "def q(spark, sf):\n"
        "    x = li.select('a').distinct()\n"
        "    try:\n"
        "        a = x.join(y, 'a')\n"
        "    except Exception:\n"
        "        a = x.hint('shuffle').join(y, 'a')\n"
        "    b = x.join(z, 'a')\n"
        "    return a.union(b)\n"
    )
    assert not _audit_file(str(p))
