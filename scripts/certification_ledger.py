"""Generate CERTIFICATION.md: per-query driver-certification ledger,
with the banked-row staleness contract ENFORCED (r3 verdict item 2).

The driver records correctness rows for only the FIRST 50 registered
queries per round, so certification accumulates across rounds via the
head-50 rotation (queries/__init__.py). A banked green row is only
valid while the code that produced it is unchanged — this script proves
that instead of asserting it:

1. For every query, the transitive set of package files it depends on
   is derived statically (AST import closure from the query's defining
   module; lazy in-function imports included).
2. Each round's correctness rows were produced against the parent of
   the commit that added CORRECTNESS_r{N}.json; the file set is hashed
   at that commit (git blob SHAs) and in the current working tree.
3. A green row whose round-time hash differs from the current hash is
   marked STALE in the ledger, and every query left without a currently
   -valid green row is written to queries/_promotions.py, which
   queries/__init__.py folds into head slots left after the deliberate
   _HEAD picks — so a drifted query is automatically re-certified next
   driver run (or queued for the round after, when stale > slots).

Run after changing registration order OR any package code:
    python scripts/certification_ledger.py
"""

from __future__ import annotations

import ast
import glob
import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "m5_competition_kaggle_spark"
sys.path.insert(0, REPO)

# Files whose content defines REGISTRATION/ROTATION, not query
# semantics: hashing them would flip every query stale on every
# rotation, defeating the ledger. The generated promotions file is
# likewise excluded (it is an OUTPUT of this script).
EXCLUDE = {
    f"{PKG}/queries/__init__.py",
    f"{PKG}/queries/_promotions.py",
}


def _module_files() -> dict[str, str]:
    """module name -> repo-relative path, for every package module."""
    out = {}
    for path in glob.glob(os.path.join(REPO, PKG, "**", "*.py"),
                          recursive=True):
        rel = os.path.relpath(path, REPO)
        mod = rel[:-3].replace(os.sep, ".")
        if mod.endswith(".__init__"):
            mod = mod[: -len(".__init__")]
        out[mod] = rel
    return out


def _imports(path: str, current_mod: str) -> set[str]:
    """Package-internal module names referenced by a file (absolute and
    relative imports, anywhere in the file including function bodies)."""
    tree = ast.parse(open(os.path.join(REPO, path)).read())
    found: set[str] = set()
    pkg_parts = current_mod.split(".")
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(PKG):
                    found.add(a.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level:  # relative: resolve against current module
                base = pkg_parts[: len(pkg_parts) - node.level]
                mod = ".".join(base + ([node.module] if node.module else []))
            else:
                mod = node.module or ""
            if not mod.startswith(PKG):
                continue
            found.add(mod)
            # `from pkg.sub import name` where name is itself a module
            for a in node.names:
                found.add(f"{mod}.{a.name}")
    return found


def dep_closure() -> dict[str, set[str]]:
    """module -> transitive set of repo-relative FILES it depends on."""
    files = _module_files()
    direct: dict[str, set[str]] = {}
    for mod, path in files.items():
        deps = {m for m in _imports(path, mod) if m in files}
        # importing pkg.a.b implies pkg.a's __init__ runs too
        for m in list(deps):
            parts = m.split(".")
            for i in range(1, len(parts)):
                parent = ".".join(parts[:i])
                if parent in files:
                    deps.add(parent)
        direct[mod] = deps
    closure: dict[str, set[str]] = {}

    def visit(mod: str, seen: set[str]) -> set[str]:
        if mod in closure:
            return closure[mod]
        if mod in seen:  # cycle guard; closure filled by the root call
            return direct.get(mod, set()) | {mod}
        seen = seen | {mod}
        acc = {mod}
        for d in direct.get(mod, ()):
            acc |= visit(d, seen)
        closure[mod] = acc
        return acc

    for mod in files:
        visit(mod, set())
    return {
        mod: {files[m] for m in mods if files[m] not in EXCLUDE}
        for mod, mods in closure.items()
    }


def _hash_fileset(paths: set[str], blob: dict[str, str]) -> str:
    """Stable hash of a file set given per-file content digests."""
    h = hashlib.sha256()
    for p in sorted(paths):
        h.update(f"{p}\0{blob.get(p, 'ABSENT')}\n".encode())
    return h.hexdigest()[:16]


def _worktree_blobs() -> dict[str, str]:
    out = {}
    for path in glob.glob(os.path.join(REPO, PKG, "**", "*.py"),
                          recursive=True):
        rel = os.path.relpath(path, REPO)
        out[rel] = hashlib.sha256(open(path, "rb").read()).hexdigest()
    return out


def _commit_blobs(commit: str) -> dict[str, str]:
    """repo-relative path -> content sha256 at `commit` (package only)."""
    ls = subprocess.run(
        ["git", "ls-tree", "-r", commit, "--", PKG],
        capture_output=True, text=True, cwd=REPO, check=True,
    ).stdout
    out = {}
    for line in ls.splitlines():
        meta, path = line.split("\t", 1)
        blob_sha = meta.split()[2]
        content = subprocess.run(
            ["git", "cat-file", "blob", blob_sha],
            capture_output=True, cwd=REPO, check=True,
        ).stdout
        out[path] = hashlib.sha256(content).hexdigest()
    return out


def _round_commit(corr_path: str) -> str | None:
    """Commit whose tree the round's driver run certified: the parent of
    the commit that added CORRECTNESS_r{N}.json (the driver runs the
    last committed code, then commits its result files on top)."""
    name = os.path.basename(corr_path)
    adds = subprocess.run(
        ["git", "log", "--diff-filter=A", "--format=%H", "--", name],
        capture_output=True, text=True, cwd=REPO,
    ).stdout.split()
    if not adds:
        return None
    first = adds[-1]
    parent = subprocess.run(
        ["git", "rev-parse", f"{first}^"],
        capture_output=True, text=True, cwd=REPO,
    )
    return parent.stdout.strip() if parent.returncode == 0 else None


def main() -> int:
    from m5_competition_kaggle_spark.queries import (
        _HEAD,
        _MODULES,
        HEAD_CAP,
        all_oracles,
        all_queries,
    )

    rounds: dict[str, dict] = {}
    round_blobs: dict[str, dict[str, str] | None] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = os.path.basename(path)[len("CORRECTNESS_"):-len(".json")]
        rounds[rnd] = json.load(open(path))
        commit = _round_commit(path)
        round_blobs[rnd] = _commit_blobs(commit) if commit else None

    queries = all_queries()
    oracles = all_oracles()
    # Base (module) registration order — independent of the promotions
    # file this script is about to rewrite, so the rendered order is the
    # order the driver will actually see after regeneration.
    base_order = [n for mod in _MODULES for n in mod.QUERIES]

    closure = dep_closure()
    now_blobs = _worktree_blobs()
    qmod = {name: fn.__module__ for name, fn in queries.items()}
    qfiles = {name: closure.get(qmod[name], set()) for name in base_order}
    now_hash = {
        name: _hash_fileset(qfiles[name], now_blobs) for name in base_order
    }
    round_hash: dict[str, dict[str, str]] = {}
    for rnd, blobs in round_blobs.items():
        if blobs is None:
            round_hash[rnd] = {}
            continue
        round_hash[rnd] = {
            name: _hash_fileset(qfiles[name], blobs) for name in base_order
        }

    # First pass: which queries hold a CURRENTLY-VALID green row?
    def row_valid(name: str) -> bool:
        for rnd, data in rounds.items():
            row = data.get(name)
            if row is None:
                continue
            rh = round_hash[rnd].get(name)
            if rh is None or rh != now_hash[name]:
                continue
            if row.get("hash_match"):
                return True
            if name not in oracles and (
                row.get("rows_match")
                or (row.get("err") == "no_oracle"
                    and row.get("spark_rows") is not None)
            ):
                return True
        return False

    valid = {name: row_valid(name) for name in base_order}
    promotions = [
        n for n in base_order if not valid[n] and n not in _HEAD
    ]
    effective_head = list(
        dict.fromkeys([*_HEAD, *promotions])
    )[:HEAD_CAP]
    head = set(effective_head)
    qs = effective_head + [n for n in base_order if n not in head]

    lines = [
        "# CERTIFICATION — driver-green ledger per query",
        "",
        "The driver checks the first 50 registered queries per round"
        " (rows + schema + value hash vs the DuckDB oracle; rows-only"
        " where no oracle exists). Certification accumulates across"
        " rounds via head-50 rotation. A banked green row counts ONLY"
        " while the query's transitive code hash (AST import closure"
        " over package files, hashed at the round's certified commit)"
        " still equals the current working tree — otherwise it shows as"
        " `green*stale` and the query is auto-promoted into remaining"
        " head slots via queries/_promotions.py. Generated by"
        " `scripts/certification_ledger.py` — regenerate after changing"
        " registration order or any package code.",
        "",
        "| # | Query | Oracle | " + " | ".join(rounds)
        + " | valid green | head |",
        "|---|---|---|" + "---|" * (len(rounds) + 2),
    ]
    n_valid = sum(valid.values())
    for i, name in enumerate(qs):
        marks = []
        for rnd, data in rounds.items():
            row = data.get(name)
            rh = round_hash[rnd].get(name)
            fresh = rh is not None and rh == now_hash[name]
            if row is None:
                marks.append("—")
            elif row.get("err") and name not in oracles and row.get(
                "spark_rows"
            ) is not None and row["err"] == "no_oracle":
                marks.append("rows" + ("" if fresh else "*stale"))
            elif row.get("err"):
                marks.append("ERR")
            elif row.get("hash_match"):
                marks.append("green" + ("" if fresh else "*stale"))
            elif row.get("rows_match") and name not in oracles:
                marks.append("rows" + ("" if fresh else "*stale"))
            else:
                marks.append("FAIL")
        lines.append(
            f"| {i + 1} | {name} | "
            + ("hash" if name in oracles else "rows-only")
            + " | " + " | ".join(marks)
            + " | " + ("yes" if valid[name] else "no")
            + " | " + ("yes" if name in head else "")
            + " |"
        )
    lines += [
        "",
        f"Registered: {len(qs)}; oracle-bearing: "
        f"{sum(1 for q in qs if q in oracles)}; rows-only: "
        f"{sum(1 for q in qs if q not in oracles)}; queries with a "
        f"currently-valid driver-green row: {n_valid}.",
    ]
    if promotions:
        in_now = [n for n in promotions if n in head]
        queued = [n for n in promotions if n not in head]
        lines += [
            "",
            "**Auto-promoted into this head-50 (stale or never "
            "certified, not in _HEAD):** "
            + (", ".join(in_now) if in_now else "none"),
        ]
        if queued:
            lines += [
                "",
                "**Promotion-queued for the next round (stale overflow "
                "beyond the 50 slots):** " + ", ".join(queued),
            ]
    else:
        lines += [
            "",
            "Every registered query either has a currently-valid banked "
            "driver-green row or holds a head-50 slot this round.",
        ]
    with open(os.path.join(REPO, "CERTIFICATION.md"), "w") as f:
        f.write("\n".join(lines) + "\n")

    # Machine-readable hash bank (current worktree) for auditability.
    bank = {
        name: {
            "module": qmod[name],
            "code_hash": now_hash[name],
            "n_files": len(qfiles[name]),
        }
        for name in qs
    }
    with open(os.path.join(REPO, "CERTIFICATION_hashes.json"), "w") as f:
        json.dump(bank, f, indent=1, sort_keys=True)

    # The enforcement hook: queries/__init__.py folds these into the
    # front of the head-50 so the next driver run re-certifies them.
    promo_path = os.path.join(REPO, PKG, "queries", "_promotions.py")
    with open(promo_path, "w") as f:
        f.write(
            '"""GENERATED by scripts/certification_ledger.py — do not '
            'edit.\n\nQueries whose banked driver-green rows are stale '
            '(transitive code hash\ndrifted since certification) or '
            "that were never certified, and that\naren't deliberate "
            '_HEAD picks: queries/__init__.py fills remaining\nhead '
            'slots with these so the next driver run re-certifies '
            'them."""\n\n'
            "STALE_PROMOTIONS = (\n"
            + "".join(f"    {n!r},\n" for n in promotions)
            + ")\n"
        )
    print(
        f"wrote CERTIFICATION.md ({len(qs)} queries, {len(rounds)} "
        f"rounds), CERTIFICATION_hashes.json, "
        f"{len(promotions)} promotion(s) "
        f"({sum(1 for n in promotions if n in head)} in head)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
