"""Which queries would a symbol edit stale? (planning tool for the window)

Replicates the transitive-staleness closure from
tests/test_registry_invariants.py so an optimization's window cost is known
BEFORE the edit: ``python scripts/blast_radius.py module.symbol [...]``
prints every registered query whose name-reference closure reaches each
given (module-qualified) symbol, plus whether the symbol would classify as
engine-wide (> DRIVER_WINDOW reachers -> certified by the full driver-sim
artifact instead of window membership).

With ``--diff``, computes the symbols changed since the round boundary (same
logic as the test) and reports the stale set and its window fit.
"""

from __future__ import annotations

import ast
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = "stream_cdc_gps_spark"
sys.path.insert(0, str(REPO))

from stream_cdc_gps_spark import registry  # noqa: E402


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", str(REPO), *args], capture_output=True, text=True, check=True
    ).stdout


def _symbols(src: str) -> dict[str, str]:
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


def _module_of(path: str) -> str:
    return path[: -len(".py")].replace("/", ".").removesuffix(".__init__")


def _symbol_table() -> dict[tuple[str, str], str]:
    table: dict[tuple[str, str], str] = {}
    for p in (REPO / PKG).rglob("*.py"):
        mod = _module_of(str(p.relative_to(REPO)))
        for name, src in _symbols(p.read_text()).items():
            table[(mod, name)] = src
    table.pop((f"{PKG}.registry", "_PRIORITY"), None)
    table.pop((f"{PKG}.registry", "_PROMISED_NEXT"), None)
    return table


def _reachable(start_src: str, table: dict[tuple[str, str], str]) -> set:
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


def _round_boundary() -> str | None:
    for line in _git("log", "--format=%H::%s", "-n", "500").splitlines():
        sha, _, subject = line.partition("::")
        if subject.startswith("round "):
            return sha
    return None


def _changed_symbols(boundary: str) -> set[tuple[str, str]]:
    files = {
        f
        for f in _git("diff", "--name-only", boundary).splitlines()
        if f.startswith(f"{PKG}/") and f.endswith(".py")
    }
    changed: set[tuple[str, str]] = set()
    for f in files:
        path = REPO / f
        if not path.exists():
            continue
        try:
            old = _symbols(_git("show", f"{boundary}:{f}"))
        except subprocess.CalledProcessError:
            old = {}
        new = _symbols(path.read_text())
        mod = _module_of(f)
        for name in set(old) | set(new):
            if old.get(name) != new.get(name):
                changed.add((mod, name))
    changed.discard((f"{PKG}.registry", "_PRIORITY"))
    changed.discard((f"{PKG}.registry", "_PROMISED_NEXT"))
    return changed


def main() -> None:
    table = _symbol_table()
    specs = registry.all_queries()
    window = set(list(specs)[: registry.DRIVER_WINDOW])

    reach_cache: dict[str, set] = {}
    for qname, spec in specs.items():
        own = table.get((spec.fn.__module__, spec.fn.__name__), "")
        reach_cache[qname] = _reachable(own, table) | {
            (spec.fn.__module__, spec.fn.__name__)
        }

    if "--diff" in sys.argv:
        boundary = _round_boundary()
        assert boundary
        changed = _changed_symbols(boundary)
        print(f"changed symbols since {boundary[:12]}:")
        for m, s in sorted(changed):
            print(f"  {m}.{s}")
        hit_count: dict[tuple[str, str], int] = {}
        stale: dict[str, list] = {}
        for qname in specs:
            hits = reach_cache[qname] & changed
            for h in hits:
                hit_count[h] = hit_count.get(h, 0) + 1
            if hits:
                stale[qname] = sorted(hits)
        engine_wide = {h for h, n in hit_count.items() if n > registry.DRIVER_WINDOW}
        if engine_wide:
            print(f"ENGINE-WIDE (need full driver-sim artifact): {sorted(engine_wide)}")
        out_of_window = []
        for q, syms in stale.items():
            non_wide = [s for s in syms if s not in engine_wide]
            if non_wide and q not in window:
                out_of_window.append((q, non_wide))
        print(f"stale queries: {len(stale)}; outside window: {len(out_of_window)}")
        for q, syms in out_of_window:
            print(f"  OUT: {q} via {syms}")
        return

    for target in sys.argv[1:]:
        mod, _, sym = target.rpartition(".")
        key = (f"{PKG}.{mod}" if not mod.startswith(PKG) else mod, sym)
        if key not in table:
            print(f"{target}: NOT FOUND in symbol table")
            continue
        reachers = [q for q in specs if key in reach_cache[q]]
        wide = len(reachers) > registry.DRIVER_WINDOW
        out = [q for q in reachers if q not in window]
        print(
            f"{target}: {len(reachers)} reachers"
            + (" [ENGINE-WIDE -> full-sim artifact]" if wide else "")
            + (f"; {len(out)} outside current window" if not wide else "")
        )
        if not wide:
            for q in reachers:
                mark = "" if q in window else "  <-- OUTSIDE window"
                print(f"   {q}{mark}")


if __name__ == "__main__":
    main()
