"""Registry hygiene: the driver iterates names in priority order and the
bench suite indexes by name — a typo in either list silently drops coverage,
so pin the invariants.

Also home of the TRANSITIVE STALENESS rule (r3 judge mandate #2): a
driver-green row certifies the code that was checked, not the current code,
so every query affected by this round's changes must sit inside the driver's
verification window. "Affected" is SYMBOL-granular and transitive: the
round's git diff is resolved to changed top-level symbols (functions,
classes, module constants — decorator/oracle text included), and a query is
stale when its own source reaches a changed symbol through the name-reference
closure over the package (so editing ``bucket_pair_expand`` or a seeding
helper stales every query that composes it — the r3 q57-via-q59 miss becomes
impossible). Symbols reachable from more queries than the window holds
(tables/session/common) are engine-wide: those are instead certified by a
committed full driver-sim artifact from this round.
"""

from __future__ import annotations

import ast
import json
import re
import subprocess
from pathlib import Path

import pytest

from stream_cdc_gps_spark import registry

REPO = Path(__file__).resolve().parent.parent
PKG = "stream_cdc_gps_spark"


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(REPO), *args], capture_output=True, text=True, check=True
    ).stdout


def _round_boundary() -> str | None:
    """Most recent round-marker commit ('round N: ...') — the point the
    driver last recorded verdict/correctness; this round's changes are
    everything after it (plus the working tree)."""
    for line in _git("log", "--format=%H::%s", "-n", "500").splitlines():
        sha, _, subject = line.partition("::")
        if subject.startswith("round "):
            return sha
    return None


def _changed_round_files(boundary: str) -> set[str]:
    return {
        f
        for f in _git("diff", "--name-only", boundary).splitlines()
        if f.startswith(f"{PKG}/") and f.endswith(".py")
    }


def _module_of(path: str) -> str:
    return path[: -len(".py")].replace("/", ".").removesuffix(".__init__")


def _symbols(src: str) -> dict[str, str]:
    """Top-level symbol name -> its full source text (decorators included,
    so a @query(oracle=...) SQL edit counts as changing the function)."""
    lines = src.splitlines(keepends=True)
    out: dict[str, str] = {}

    def seg(node: ast.stmt) -> str:
        start = node.lineno - 1
        deco = getattr(node, "decorator_list", [])
        if deco:
            start = min(d.lineno for d in deco) - 1
        return "".join(lines[start : node.end_lineno])

    for node in ast.parse(src).body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            out[node.name] = seg(node)
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                for n in ast.walk(tgt):
                    if isinstance(n, ast.Name):
                        out[n.id] = seg(node)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            out[node.target.id] = seg(node)
    return out


def _changed_symbols(boundary: str, files: set[str]) -> set[tuple[str, str]]:
    """(module, symbol) pairs whose top-level source text differs between the
    round boundary and the working tree. New files contribute all their
    symbols; deleted files none (nothing can reference them anymore)."""
    changed: set[tuple[str, str]] = set()
    for f in files:
        path = REPO / f
        if not path.exists():
            continue
        try:
            old = _symbols(_git("show", f"{boundary}:{f}"))
        except subprocess.CalledProcessError:
            old = {}  # file is new this round
        new = _symbols(path.read_text())
        mod = _module_of(f)
        for name in set(old) | set(new):
            if old.get(name) != new.get(name):
                changed.add((mod, name))
    return changed


def _reachable_symbols(start_src: str, table: dict[tuple[str, str], str]) -> set:
    """Name-reference closure: every (module, symbol) whose NAME appears in
    the source of anything already reached, starting from a query's own
    source. Over-approximates (a name match is not a call) — safe direction
    for a staleness check."""
    by_name: dict[str, list[tuple[str, str]]] = {}
    for key in table:
        by_name.setdefault(key[1], []).append(key)
    word = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")

    reached: set[tuple[str, str]] = set()
    frontier = [start_src]
    while frontier:
        src = frontier.pop()
        for name in set(word.findall(src)):
            for key in by_name.get(name, ()):
                if key not in reached:
                    reached.add(key)
                    frontier.append(table[key])
    return reached


def _symbol_table() -> dict[tuple[str, str], str]:
    table: dict[tuple[str, str], str] = {}
    for p in (REPO / PKG).rglob("*.py"):
        mod = _module_of(str(p.relative_to(REPO)))
        for name, src in _symbols(p.read_text()).items():
            table[(mod, name)] = src
    return table


def test_round_changed_queries_fit_driver_window():
    """THE transitive staleness gate. Every query whose reference closure
    touches a symbol changed this round must be inside the driver window;
    symbols reachable from more queries than the window holds are
    engine-wide and require a committed 0-fail full driver-sim artifact
    from this round instead. Would have failed on round 3's HEAD (q57's
    seeding changed inside q57_neardup_components; q57/q52 sat outside the
    window)."""
    boundary = _round_boundary()
    if boundary is None:
        pytest.skip("no round boundary commit")
    files = _changed_round_files(boundary)
    if not files:
        pytest.skip("no package changes this round yet")
    changed = _changed_symbols(boundary, files)
    # _PRIORITY is the window ORDERING itself — pure driver metadata that
    # cannot alter any query's results, but whose source text necessarily
    # names queries. Leaving it in creates a self-referential loop: every
    # rotation edit would stale whichever queries merely reach the word
    # "queries" through a docstring (r11: q190/q195/q205 via
    # registry.queries -> all_queries -> _PRIORITY), forcing fresh rows
    # out of the window to re-certify untouched code. Dropped from BOTH
    # the changed set and the closure table (its text names queries, so
    # traversing it would fabricate reach edges to every listed query).
    changed.discard((f"{PKG}.registry", "_PRIORITY"))
    # _PROMISED_NEXT is the displacement ledger — window metadata like
    # _PRIORITY (its text names queries, so traversing it would fabricate
    # reach edges), checked by its own cross-round test below.
    changed.discard((f"{PKG}.registry", "_PROMISED_NEXT"))
    if not changed:
        pytest.skip("package files changed but no top-level symbol differs")

    table = _symbol_table()
    table.pop((f"{PKG}.registry", "_PRIORITY"), None)
    table.pop((f"{PKG}.registry", "_PROMISED_NEXT"), None)
    specs = registry.all_queries()
    stale: dict[str, list[str]] = {}
    hit_count: dict[tuple[str, str], int] = {}
    for qname, spec in specs.items():
        own = table.get((spec.fn.__module__, spec.fn.__name__), "")
        hits = _reachable_symbols(own, table) & changed
        # a brand-new query's own symbol is itself a changed symbol
        if (spec.fn.__module__, spec.fn.__name__) in changed:
            hits.add((spec.fn.__module__, spec.fn.__name__))
        for h in hits:
            hit_count[h] = hit_count.get(h, 0) + 1
        if hits:
            stale[qname] = sorted(f"{m}.{s}" for m, s in hits)

    engine_wide = {h for h, n in hit_count.items() if n > registry.DRIVER_WINDOW}
    window = set(list(specs)[: registry.DRIVER_WINDOW])
    missing: dict[str, list[str]] = {}
    for q, syms in stale.items():
        if q in window:
            continue
        non_wide = [s for s in syms if tuple(s.rsplit(".", 1)) not in engine_wide]
        if non_wide:
            missing[q] = non_wide
    assert not missing, (
        f"queries stale from this round's symbol changes are OUTSIDE the "
        f"driver window (front-load them in registry._PRIORITY): {missing}"
    )

    if engine_wide:
        art = REPO / "artifacts" / "driver_sim_full.json"
        assert art.exists(), (
            f"engine-wide symbols changed ({sorted(engine_wide)}) — run "
            f"scripts/driver_sim.py over the FULL registry and commit "
            f"artifacts/driver_sim_full.json"
        )
        cert = json.loads(art.read_text())
        # A certificate recorded on a dirty tree certifies unreproducible
        # code: git_head alone cannot pin what the 0-fail run covered
        # (r4 ADVICE). Run the full sim from a clean, committed tree.
        assert not cert.get("dirty_tree"), (
            f"driver_sim_full.json was generated on a DIRTY tree at "
            f"{cert['git_head'][:12]} — the certified code state is not "
            f"reproducible; re-run scripts/driver_sim.py from a clean HEAD"
        )
        assert cert["n_fail"] == 0 and cert["n_checked"] == len(specs), (
            f"full driver-sim artifact records failures or a partial run: "
            f"{ {k: cert[k] for k in ('n_checked', 'n_fail')} } vs "
            f"{len(specs)} registered queries"
        )
        ok = subprocess.run(
            ["git", "-C", str(REPO), "merge-base", "--is-ancestor",
             boundary, cert["git_head"]],
            capture_output=True,
        ).returncode == 0
        assert ok, (
            "driver_sim_full.json certifies a PREVIOUS round "
            f"({cert['git_head'][:12]}); re-run the full driver sim"
        )


def test_priority_names_all_registered():
    qs = registry.all_queries()
    missing = [n for n in registry._PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY names not in registry: {missing}"


def test_priority_has_no_duplicates():
    assert len(registry._PRIORITY) == len(set(registry._PRIORITY))


def test_every_query_has_an_oracle():
    """Every registered query carries full DuckDB oracle SQL — rows-only
    checks are the documented exception and there are currently none."""
    qs = registry.all_queries()
    no_oracle = [n for n, spec in qs.items() if spec.oracle is None]
    assert not no_oracle, f"queries without oracle SQL: {no_oracle}"


def test_bench_headline_names_registered():
    import bench

    qs = registry.all_queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench HEADLINE names not in registry: {missing}"


def test_previous_round_promise_consumed():
    """THE displacement-ledger gate (r12 verdict task #5): rows a round's
    slack cap displaced were bridge-certified with a PROMISE that the
    next round's window consumes them first. The promise is data
    (registry._PROMISED_NEXT) read from the ROUND-BOUNDARY COMMIT — so a
    mid-round edit to the working tree cannot erase what was promised —
    and every promised name must sit in the current _PRIORITY."""
    boundary = _round_boundary()
    if boundary is None:
        pytest.skip("no round boundary commit")
    try:
        old_src = _git("show", f"{boundary}:{PKG}/registry.py")
    except subprocess.CalledProcessError:
        pytest.skip("registry.py absent at the round boundary")
    promised: list[str] | None = None
    for node in ast.parse(old_src).body:
        if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            if node.target.id == "_PROMISED_NEXT" and node.value is not None:
                promised = ast.literal_eval(node.value)
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name) and tgt.id == "_PROMISED_NEXT":
                    promised = ast.literal_eval(node.value)
    if promised is None:
        pytest.skip("boundary commit predates the _PROMISED_NEXT ledger")
    missing = [n for n in promised if n not in registry._PRIORITY]
    assert not missing, (
        f"last round promised these displaced rows the FIRST slots of this "
        f"round's window (registry._PROMISED_NEXT at {boundary[:12]}) but "
        f"_PRIORITY does not contain them: {missing}"
    )


def test_promised_next_names_registered():
    """The ledger must name real queries (a typo would silently void the
    promise), and never promise a row the current window already holds —
    promises are for DISPLACED rows only."""
    qs = registry.all_queries()
    missing = [n for n in registry._PROMISED_NEXT if n not in qs]
    assert not missing, f"_PROMISED_NEXT names not in registry: {missing}"
    overlap = [n for n in registry._PROMISED_NEXT if n in registry._PRIORITY]
    assert not overlap, (
        f"_PROMISED_NEXT rows already inside _PRIORITY (a promise records "
        f"a row the slack cap DISPLACED, not one being checked): {overlap}"
    )


def test_priority_leaves_window_slack():
    """The driver checks ~DRIVER_WINDOW queries per round; the explicit
    front-load must leave slack in case the real window is slightly smaller
    than assumed (r3 ADVICE)."""
    assert len(registry._PRIORITY) <= registry.DRIVER_WINDOW - 2


def test_symbol_diff_detects_function_and_oracle_changes():
    """Self-test of the staleness machinery on synthetic sources: body
    edits, decorator/oracle edits, new symbols, and constant edits must all
    surface as changed symbols; untouched symbols must not."""
    old = '''
X = 5
def helper(a):
    return a + X

@query("q1", oracle="SELECT 1")
def q1(spark, sf):
    return helper(1)

def untouched():
    return 0
'''
    new = '''
X = 6
def helper(a):
    return a + X + 1

@query("q1", oracle="SELECT 2")
def q1(spark, sf):
    return helper(1)

def untouched():
    return 0

def brand_new():
    return 1
'''
    o, n = _symbols(old), _symbols(new)
    changed = {name for name in set(o) | set(n) if o.get(name) != n.get(name)}
    assert changed == {"X", "helper", "q1", "brand_new"}  # oracle edit stales q1
    assert "untouched" not in changed


def test_reference_closure_reaches_transitive_helpers():
    """q59-composes-q57 shape: a query that calls a function that calls a
    changed helper must reach the helper through the name closure."""
    table = {
        ("m", "seed_labels"): "def seed_labels(e):\n    return e\n",
        ("m", "components"): "def components(s):\n    return seed_labels(s)\n",
        ("m", "keep_one"): "def keep_one(s):\n    return components(s)\n",
        ("m", "unrelated"): "def unrelated():\n    return 1\n",
    }
    reached = _reachable_symbols(table[("m", "keep_one")], table)
    assert ("m", "seed_labels") in reached
    assert ("m", "components") in reached
    assert ("m", "unrelated") not in reached
