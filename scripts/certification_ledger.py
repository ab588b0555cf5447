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
   Hashing is SEMANTIC (r10): each source is AST-normalized first —
   docstrings blanked, comments/formatting dropped by unparse — so a
   wording-only edit (the events.py watermark erratum class) does not
   stale banked rows, while any change that can alter behavior still
   does. Both sides of every comparison (round commit and worktree)
   are normalized by the same function, recomputed on every run, so
   the contract needs no stored-hash migration.
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
    # A package __init__'s module name is the package itself (the
    # `.__init__` suffix is stripped), so a level-1 relative import
    # written inside it resolves against the package, not its parent:
    # `from . import core` in pkg/queries/__init__.py means pkg.queries
    # .core. Treat the name as one component longer for the arithmetic.
    is_pkg = os.path.basename(path) == "__init__.py"
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                if a.name.startswith(PKG):
                    found.add(a.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level:  # relative: resolve against current module
                keep = len(pkg_parts) - node.level + (1 if is_pkg else 0)
                base = pkg_parts[:keep]
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
        if path in EXCLUDE:
            # Registration/rotation metadata (queries/__init__.py): its
            # imports are the REGISTRY LIST, not semantic dependencies.
            # Traversing them would make every query module that imports
            # any sibling query module transitively depend on ALL
            # registered modules — so merely REGISTERING a new module
            # would stale unrelated banked rows (observed in r5: adding
            # extensions_r5 flipped all 19 llm_curation rows stale).
            # The file itself is already excluded from hash filesets;
            # prune its edges too.
            direct[mod] = set()
            continue
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


def _hash_fileset(
    paths: set[str],
    blob: dict[str, str],
    catalog: dict[str, str] | None = None,
    tables: set[str] | None = None,
    modsec: dict[str, dict[str, str]] | None = None,
    attrib: dict[str, set[str]] | None = None,
) -> str:
    """Stable hash of a file set given per-file content digests.

    ``catalog.py`` sits in EVERY query's closure, so hashing it whole
    means any edit stales all ~95 banked rows at once (the r4 incident).
    When ``catalog`` (per-section digests from :func:`_catalog_sections`)
    and ``tables`` (the query's table set from :func:`_closure_tables`)
    are provided, catalog.py contributes only its SHARED code sections
    plus the schema entries of the tables this query actually reads — a
    pure one-table schema edit then stales only that table's consumers,
    while any edit to load/normalize logic still stales everyone.
    ``tables=None`` means "could not be determined" and conservatively
    includes every table section.

    ``modsec`` generalizes the same mechanism to SECTIONED_MODULES
    (r7): ``{path: {section_name: digest}}`` per-function sections from
    :func:`_def_sections`, and ``attrib`` the per-query attributed
    section names from :func:`_sect_attrib`. A sectioned path
    contributes its SHARED section (imports/constants/module docstring)
    plus only the top-level defs the query's code transitively
    references by name — so an edit to a function a query never touches
    no longer stales its banked row. ``attrib=None`` or a missing path
    entry conservatively includes every section.
    """
    h = hashlib.sha256()
    for p in sorted(paths):
        if p == CATALOG_PATH and catalog is not None:
            names = sorted(
                t for t in catalog if t != SHARED_KEY
                and (tables is None or t in tables)
            )
            part = catalog[SHARED_KEY] + "".join(
                f"{t}={catalog[t]}" for t in names
            )
            # A referenced table with no section entry (renamed/dropped)
            # must still perturb the hash:
            if tables is not None:
                part += "".join(
                    f"{t}=ABSENT" for t in sorted(tables)
                    if t not in catalog
                )
            h.update(f"{p}\0{part}\n".encode())
        elif modsec is not None and p in modsec:
            secs = modsec[p]
            wanted = None if attrib is None else attrib.get(p)
            names = sorted(
                n for n in secs if n != SHARED_KEY
                and (wanted is None or n in wanted)
            )
            part = secs[SHARED_KEY] + "".join(
                f"{n}={secs[n]}" for n in names
            )
            # An attributed name with no section (renamed/deleted def)
            # must still perturb the hash:
            if wanted is not None:
                part += "".join(
                    f"{n}=ABSENT" for n in sorted(wanted)
                    if n not in secs
                )
            h.update(f"{p}\0{part}\n".encode())
        else:
            h.update(f"{p}\0{blob.get(p, 'ABSENT')}\n".encode())
    return h.hexdigest()[:16]


CATALOG_PATH = f"{PKG}/sources/catalog.py"
SHARED_KEY = ""  # section key for catalog code outside per-table schemas


def _normalize_py(content: bytes) -> bytes:
    """AST-normalize a source for semantic hashing.

    Blanks every docstring (module/class/function first-statement string
    constants) and re-emits via ``ast.unparse``, which also drops
    comments and formatting. The staleness contract exists to catch
    BEHAVIOR drift; hashing the normalized form makes wording-only
    edits free while any change reachable by the interpreter still
    perturbs the hash. Falls back to the raw bytes when the source
    doesn't parse (conservative: unparseable files hash verbatim).

    Exception (r10 ADVICE): a module that references ``__doc__``
    (pipeline.py feeds it to argparse, so its module docstring IS
    runtime-visible CLI output) keeps its docstrings in the hash —
    blanking would let a behavior-visible edit slip past the contract.
    Detected per-file, so the carve-out never widens beyond modules
    where docstrings genuinely reach the interpreter.
    """
    try:
        tree = ast.parse(content.decode())
    except (SyntaxError, UnicodeDecodeError, ValueError):
        return content
    doc_reachable = any(
        (isinstance(n, ast.Name) and n.id == "__doc__")
        or (isinstance(n, ast.Attribute) and n.attr == "__doc__")
        for n in ast.walk(tree)
    )
    for node in [] if doc_reachable else ast.walk(tree):
        if isinstance(node, (ast.Module, ast.FunctionDef,
                             ast.AsyncFunctionDef, ast.ClassDef)):
            body = node.body
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                body[0].value.value = ""
    try:
        return ast.unparse(tree).encode()
    except Exception:  # pragma: no cover — unparse failure is theoretical
        return content


def _catalog_sections(src: str) -> dict[str, str] | None:
    """Per-section content digests of a catalog.py source text.

    Splits the module into the per-table ``SCHEMAS`` dict entries (one
    section per table, keyed by table name) and everything else (the
    shared load/normalize/sniff logic, keyed by ``SHARED_KEY``). Returns
    None when the structure can't be recognized (syntax error, no
    literal SCHEMAS dict) — callers then fall back to whole-file
    hashing, which is strictly conservative.
    """
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    schema_dict = None
    for node in tree.body:
        if isinstance(node, ast.Assign):
            targets = node.targets
        elif isinstance(node, ast.AnnAssign):  # SCHEMAS: dict[...] = {...}
            targets = [node.target]
        else:
            continue
        if (
            any(
                isinstance(t, ast.Name) and t.id == "SCHEMAS"
                for t in targets
            )
            and isinstance(node.value, ast.Dict)
        ):
            schema_dict = node.value
            break
    if schema_dict is None:
        return None
    line_start = [0]
    for line in src.splitlines(keepends=True):
        line_start.append(line_start[-1] + len(line))

    def offset(lineno: int, col: int) -> int:
        return line_start[lineno - 1] + col

    sections: dict[str, str] = {}
    spans: list[tuple[int, int]] = []
    for k, v in zip(schema_dict.keys, schema_dict.values):
        if not (isinstance(k, ast.Constant) and isinstance(k.value, str)):
            return None  # computed key — can't attribute; fall back
        a = offset(k.lineno, k.col_offset)
        b = offset(v.end_lineno, v.end_col_offset)
        sections[k.value] = hashlib.sha256(src[a:b].encode()).hexdigest()
        spans.append((a, b))
    shared = []
    pos = 0
    for a, b in sorted(spans):
        shared.append(src[pos:a])
        pos = b
    shared.append(src[pos:])
    sections[SHARED_KEY] = hashlib.sha256(
        "".join(shared).encode()
    ).hexdigest()
    return sections


# --- r7: per-function module sectioning ------------------------------
#
# The catalog precedent (r5) generalized: these hot operator modules sit
# in 12–115 query closures each (module-level package imports drag them
# into everything), so a one-function edit — even a docstring scope fix
# the judge asked for — used to stale every banked row downstream
# (similarity.py: 115 of 164). Each module here is hashed as one SHARED
# section (module docstring, imports, constants — included for every
# consumer) plus one section per top-level def/class; a query's hash
# includes only the sections its code transitively references by name
# (see _sect_attrib). Fallback on ANY structural doubt is whole-file
# hashing, which is strictly conservative.
#
# Soundness argument for the attribution (under-staling would forge
# certification, so the contract is explicit): a section is included if
# its name appears as an identifier (Name/Attribute) or identifier-
# shaped string constant anywhere in the query's seed set — the query's
# own def, its defining module's executable top-level code, the FULL
# text of every other non-sectioned closure file, and the shared code of
# every sectioned closure file — expanded to a fixpoint through included
# sections' bodies. Any semantic change must alter some hashed unit a
# query depends on: either the edited section is referenced (attributed
# → hash moves) or the reference itself lives in attributed/whole-file
# code (that unit's hash moves). The one escape hatch — accessing a
# module member through a COMPUTED name — does not occur in this package
# (grep-verified: no getattr-on-module, no import *, no globals()), and
# string-literal getattr is caught by the string-constant rule.
SECTIONED_MODULES = frozenset(
    f"{PKG}/operators/{m}.py" for m in (
        "similarity", "dedup", "skew", "stats_exact", "scd",
        "asof_ext", "rolling_distinct", "curation", "graph",
        # r11: the prefix-scan family. operators/prefix.py sits in 123
        # registered closures (module-level imports in shuffle/
        # quantiles/quantile_norm/layout/gains/encode drag it into
        # nearly everything); sectioning it — plus every non-sectioned
        # module whose TEXT mentions its defs, which would otherwise
        # re-seed the attribution — confines a global_running_sum edit
        # to the queries that transitively CALL it.
        "prefix", "shuffle", "quantile_norm", "quantiles",
        "layout", "gains", "heaps",
        # r11: sectioned ahead of the r12 persist-leak fixes (their
        # leaking defs' consumers are the only rows that should stale)
        "semantic_dedup", "dedup_incremental",
    )
) | frozenset({
    f"{PKG}/functions/encode.py",
    # r11: sectioned ahead of the r12 persist-leak fix — llm_curation
    # sits in 70 closures (extensions_r6/r8b compose its oracles), so
    # editing x29_corpus_to_shards under whole-file hashing would
    # stale all 70; sectioned, it stales x29's actual consumers. Its
    # ORACLES literal references pkg helpers — admissible under the
    # _def_sections registry carve-out: names from NON-sectioned
    # modules (H64, _shingle_cte in extensions.py) are covered by
    # whole-file closure hashes, and names from sectioned modules
    # (curation.py's BLOOM_K/BLOOM_M) are admitted only when the
    # sectioned_defs pre-pass proves they are shared-section
    # CONSTANTS, which every consumer hashes unconditionally.
    f"{PKG}/queries/llm_curation.py",
})

_REGISTRY_NAMES = {"QUERIES", "ORACLES"}  # registration metadata dicts


def _top_def_names(src: str) -> set[str]:
    """Top-level def/class names of a source text ('' on parse failure
    — callers treat missing knowledge conservatively)."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return set()
    return {
        n.name for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef,
                          ast.ClassDef))
    }


def _def_sections(
    src: str,
    sectioned_defs: dict[str, set[str]] | None = None,
) -> dict[str, str] | None:
    """Per-top-level-def section digests of a module source text.

    One section per plain top-level FunctionDef/AsyncFunctionDef/
    ClassDef (decorators included in the span); everything else —
    module docstring, imports, constants, conditional defs inside
    try/if blocks — is the SHARED section every consumer hashes.
    Returns None (→ whole-file fallback) when: the source doesn't
    parse; two top-level defs share a name (conditional redefinition
    can't be attributed); or executable shared code references a name
    imported from inside the package (a module-level cross-module call
    could hide a dependency attribution can't see).

    r11 carve-out (enables sectioning QUERY modules, whose ORACLES
    dicts bake imported oracle-helper text into their values at
    import): a QUERIES/ORACLES literal assignment may reference pkg
    imports PROVIDED every such name resolves to a NON-sectioned,
    absolutely-imported module. Attribution deliberately skips
    registry values (seeding them would re-couple every sibling
    query), so the covering argument is the closure itself: the
    helper's defining file is transitively in every consumer's
    closure and hashed WHOLE-FILE there, so editing the helper still
    stales them. A name that might originate in a sectioned module
    (where only attributed sections are hashed) or behind a relative
    import (unresolvable here) forces the conservative fallback.
    """
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    def_nodes = [
        n for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef,
                          ast.ClassDef))
    ]
    names = [n.name for n in def_nodes]
    if len(names) != len(set(names)):
        return None
    # Guard: module-level executable statements must not reach package
    # imports (e.g. `CONST = other_module.helper()`), or an edit to that
    # helper would not stale consumers of CONST. Exception: registry
    # literals referencing only non-sectioned absolute imports (see
    # docstring carve-out).
    pkg_names: set[str] = set()
    # bound name -> (member-module path, submodule path, original name)
    pkg_src: dict[str, tuple[str, str, str] | None] = {}
    for n in tree.body:
        if isinstance(n, ast.ImportFrom) and (
            n.level or (n.module or "").startswith(PKG)
        ):
            for a in n.names:
                bound = a.asname or a.name
                pkg_names.add(bound)
                if n.level:
                    pkg_src[bound] = None  # relative: unresolvable here
                else:
                    base = (n.module or "").replace(".", "/")
                    # `from A.B import x`: x is a member of A/B.py OR
                    # the submodule A/B/x.py — an edit to either must
                    # be covered, so both candidates are checked
                    pkg_src[bound] = (
                        f"{base}.py", f"{base}/{a.name}.py", a.name
                    )
        elif isinstance(n, ast.Import):
            for a in n.names:
                if a.name.startswith(PKG):
                    bound = (a.asname or a.name).split(".")[0]
                    pkg_names.add(bound)
                    pkg_src[bound] = None  # module object: any member
    for n in tree.body:
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef,
                          ast.ClassDef, ast.Import, ast.ImportFrom)):
            continue
        refs = {
            x.id for x in ast.walk(n) if isinstance(x, ast.Name)
        }
        bad = refs & pkg_names
        if not bad:
            continue
        if isinstance(n, ast.Assign):
            targets = [
                t.id for t in n.targets if isinstance(t, ast.Name)
            ]
        elif isinstance(n, ast.AnnAssign) and isinstance(
            n.target, ast.Name
        ):
            targets = [n.target.id]
        else:
            targets = []
        if not (targets and set(targets) <= _REGISTRY_NAMES):
            return None
        for b in sorted(bad):
            entry = pkg_src.get(b)
            if entry is None:
                return None
            member_path, submod_path, orig = entry
            # a whole SUBMODULE from a sectioned path: any member
            # could be a def — fallback
            if submod_path in SECTIONED_MODULES:
                return None
            if member_path in SECTIONED_MODULES:
                # admissible only when provably a shared-section
                # member (constant), never a per-def section
                if sectioned_defs is None or orig in sectioned_defs.get(
                    member_path, {orig}
                ):
                    return None

    line_start = [0]
    for line in src.splitlines(keepends=True):
        line_start.append(line_start[-1] + len(line))

    def offset(lineno: int, col: int) -> int:
        return line_start[lineno - 1] + col

    sections: dict[str, str] = {}
    for n in def_nodes:
        first = min([n, *n.decorator_list], key=lambda x: x.lineno)
        a = offset(first.lineno, 0)
        b = offset(n.end_lineno, n.end_col_offset)
        sections[n.name] = hashlib.sha256(src[a:b].encode()).hexdigest()
    # The shared section hashes the UNPARSED top-level non-def
    # statements, not the raw text gaps between def spans: gap-based
    # hashing made the shared digest depend on the NUMBER of blank
    # lines between defs, so merely ADDING a def to a sectioned module
    # staled every consumer (observed r11: a prefix.py helper
    # extraction flipped 107 rows before this fix). Statement-level
    # unparse is whitespace-canonical and structure-aware — an
    # indentation change that moves a statement into/out of a block
    # changes the unparse text, so no under-staling escape.
    shared_stmts = [
        ast.unparse(n) for n in tree.body
        if not isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef,
                              ast.ClassDef))
    ]
    sections[SHARED_KEY] = hashlib.sha256(
        "\n".join(shared_stmts).encode()
    ).hexdigest()
    return sections


def _node_refs(node: ast.AST) -> set[str]:
    """Identifiers a subtree references: bare names, attribute names,
    and identifier-shaped string constants (the literal-getattr net)."""
    out: set[str] = set()
    for x in ast.walk(node):
        if isinstance(x, ast.Name):
            out.add(x.id)
        elif isinstance(x, ast.Attribute):
            out.add(x.attr)
        elif isinstance(x, ast.Constant) and isinstance(x.value, str):
            if x.value.isidentifier():
                out.add(x.value)
    return out


def _sect_attrib(
    fn_name: str,
    defining_path: str,
    files: set[str],
    read_file,
) -> dict[str, set[str]] | None:
    """Section names of each SECTIONED_MODULES file in ``files`` that
    query ``fn_name`` (a top-level def in ``defining_path``) transitively
    references — or None for the conservative all-sections fallback.

    Seeds: the query's own def subtree; every closure file's executable
    top-level statements (module-level code runs at import and can feed
    any query) MINUS imports and the QUERIES/ORACLES registration dicts
    (which reference every sibling query and would re-couple the whole
    module). Top-level DEF BODIES — in every closure file, sectioned or
    not — join only through the fixpoint: when a def's name is in the
    reference set, its body contributes its own references, matched by
    name across ALL closure files (cross-file name collisions
    over-include, never under-include). r11 refinement: before this,
    non-sectioned files seeded their COMPLETE text, so a query whose
    closure happened to contain a sibling query module calling
    pack_into_shards inherited that name and staled with prefix.py
    despite never reaching it; soundness is unchanged — a def body is
    reachable at runtime only via a name reference somewhere in the
    already-reachable set (computed-name access is grep-excluded for
    the package, see the module comment above), which is exactly the
    fixpoint edge.
    """
    trees: dict[str, ast.Module] = {}
    for p in sorted(files):
        if p == CATALOG_PATH:
            continue
        try:
            trees[p] = ast.parse(read_file(p))
        except (OSError, SyntaxError):
            return None
    if defining_path not in trees:
        return None
    topdefs: dict[str, dict[str, ast.AST]] = {}
    for p, tree in trees.items():
        for n in ast.walk(tree):
            if isinstance(n, ast.ImportFrom) and any(
                a.name == "*" for a in n.names
            ):
                return None  # star import defeats name attribution
        topdefs[p] = {
            n.name: n for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef,
                              ast.ClassDef))
        }
    if fn_name not in topdefs[defining_path]:
        return None

    # Package-import aliases anywhere in the closure: `from m import f
    # as g` binds g locally, so a reference to g must attribute section
    # f. Collected globally (per-file maps would be stricter; global
    # application only over-includes).
    alias: dict[str, set[str]] = {}
    for tree in trees.values():
        for n in ast.walk(tree):
            if isinstance(n, ast.ImportFrom) and (
                n.level or (n.module or "").startswith(PKG)
            ):
                for a in n.names:
                    if a.asname and a.asname != a.name:
                        alias.setdefault(a.asname, set()).add(a.name)

    def _stmt_refs(n: ast.stmt) -> set[str]:
        """Seed references of one top-level statement. Imports bind
        names without referencing function BODIES — call sites are
        seeded where they occur — so they are skipped (aliases handled
        above). Registration-dict writes (QUERIES/ORACLES, literal or
        subscripted) seed only their VALUE expression: the string KEYS
        are the sibling query names themselves and would re-couple the
        whole module, while a value referencing an oracle-builder def
        still attributes it."""
        if isinstance(n, (ast.Import, ast.ImportFrom)):
            return set()
        if isinstance(n, ast.Assign):
            names = {t.id for t in n.targets if isinstance(t, ast.Name)}
            subs = {
                t.value.id for t in n.targets
                if isinstance(t, ast.Subscript)
                and isinstance(t.value, ast.Name)
            }
            if names and names <= _REGISTRY_NAMES:
                return set()
            if subs and subs <= _REGISTRY_NAMES and not names:
                return _node_refs(n.value)
        elif isinstance(n, ast.AnnAssign) and isinstance(
            n.target, ast.Name
        ) and n.target.id in _REGISTRY_NAMES:
            return _node_refs(n.value) if n.value else set()
        return _node_refs(n)

    refs: set[str] = set()
    refs |= _node_refs(topdefs[defining_path][fn_name])
    for p, tree in trees.items():
        for n in tree.body:
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef,
                              ast.ClassDef)):
                continue  # def bodies join via the fixpoint, per file
            refs |= _stmt_refs(n)

    included: dict[str, set[str]] = {
        p: set() for p in trees if p in SECTIONED_MODULES
    }
    # A sectioned DEFINING module (r11: query modules like
    # llm_curation) always hashes the query's own def section.
    if defining_path in included:
        included[defining_path].add(fn_name)
    done: set[tuple[str, str]] = {(defining_path, fn_name)}
    changed = True
    while changed:
        changed = False
        for a, reals in alias.items():
            if a in refs and not reals <= refs:
                refs |= reals
                changed = True
        for p, defs in topdefs.items():
            for name, node in defs.items():
                if name in refs and (p, name) not in done:
                    done.add((p, name))
                    if p in included:
                        included[p].add(name)
                    refs |= _node_refs(node)
                    changed = True
    return included


def _closure_tables(
    files: set[str],
    table_names: tuple[str, ...],
    read_file,
) -> set[str] | None:
    """Catalog tables a query's closure references, or None for "all".

    Scans every closure file (except catalog.py itself) for string
    constants mentioning a table name — load_table("lineitem") and
    f-string path constants like "events.parquet" both match via the
    substring test, which over-includes but never under-includes for
    literal references. Two cases force the conservative ALL answer:
    the closure touches the full-catalog surface (TABLES / SCHEMAS /
    register_views), or no table literal is found at all (a dynamic
    name must be assumed to reach any table).
    """
    found: set[str] = set()
    dynamic = False
    for p in sorted(files):
        if p == CATALOG_PATH:
            continue
        try:
            tree = ast.parse(read_file(p))
        except (OSError, SyntaxError):
            return None
        for node in ast.walk(tree):
            if isinstance(node, ast.Constant) and isinstance(
                node.value, str
            ):
                for t in table_names:
                    if t in node.value:
                        found.add(t)
            elif isinstance(node, ast.Name) and node.id in (
                "TABLES", "SCHEMAS", "register_views"
            ):
                dynamic = True
            elif isinstance(node, ast.Attribute) and node.attr in (
                "TABLES", "SCHEMAS", "register_views"
            ):
                dynamic = True
            elif isinstance(node, ast.ImportFrom) and any(
                a.name in ("TABLES", "SCHEMAS", "register_views")
                for a in node.names
            ):
                dynamic = True
    if dynamic or not found:
        return None
    return found


def _worktree_blobs() -> tuple[
    dict[str, str], dict[str, str] | None, dict[str, dict[str, str]]
]:
    """(path -> content sha256, catalog section digests, per-function
    section digests for SECTIONED_MODULES that parse) for the tree."""
    contents: dict[str, bytes] = {}
    for path in glob.glob(os.path.join(REPO, PKG, "**", "*.py"),
                          recursive=True):
        rel = os.path.relpath(path, REPO)
        contents[rel] = _normalize_py(open(path, "rb").read())
    return _blobs_from_contents(contents)


def _blobs_from_contents(
    contents: dict[str, bytes],
) -> tuple[
    dict[str, str], dict[str, str] | None, dict[str, dict[str, str]]
]:
    """Shared digest/section pass over normalized contents. A pre-pass
    collects top-level def names of every sectioned module so the
    _def_sections registry carve-out can prove a cross-module constant
    reference safe (see its docstring)."""
    sectioned_defs = {
        rel: _top_def_names(c.decode())
        for rel, c in contents.items() if rel in SECTIONED_MODULES
    }
    out = {}
    catalog = None
    modsec: dict[str, dict[str, str]] = {}
    for rel, content in contents.items():
        out[rel] = hashlib.sha256(content).hexdigest()
        if rel == CATALOG_PATH:
            catalog = _catalog_sections(content.decode())
        elif rel in SECTIONED_MODULES:
            secs = _def_sections(content.decode(), sectioned_defs)
            if secs is not None:
                modsec[rel] = secs
    return out, catalog, modsec


def _commit_blobs(
    commit: str,
) -> tuple[
    dict[str, str], dict[str, str] | None, dict[str, dict[str, str]]
]:
    """Same triple as :func:`_worktree_blobs`, at ``commit``."""
    ls = subprocess.run(
        ["git", "ls-tree", "-r", commit, "--", PKG],
        capture_output=True, text=True, cwd=REPO, check=True,
    ).stdout
    contents: dict[str, bytes] = {}
    for line in ls.splitlines():
        meta, path = line.split("\t", 1)
        blob_sha = meta.split()[2]
        contents[path] = _normalize_py(subprocess.run(
            ["git", "cat-file", "blob", blob_sha],
            capture_output=True, cwd=REPO, check=True,
        ).stdout)
    # undecodable files must not abort the whole commit pass — drop
    # them from section analysis (digests still computed from bytes)
    safe = {}
    for path, c in contents.items():
        try:
            c.decode()
        except UnicodeDecodeError:
            safe[path] = None
        else:
            safe[path] = c
    out = {
        p: hashlib.sha256(c).hexdigest() for p, c in contents.items()
    }
    blobs, catalog, modsec = _blobs_from_contents(
        {p: c for p, c in safe.items() if c is not None}
    )
    return out, catalog, modsec


def _round_commit(corr_path: str) -> str | None:
    """Commit whose tree the round's driver run certified: the parent of
    the LAST commit touching CORRECTNESS_r{N}.json (the driver runs the
    last committed code, then commits its result files on top). Last, not
    first: if the driver re-runs within a round and amends the file, the
    current contents were produced against the amending commit's parent
    tree — validating amended rows against the original parent would
    hash-compare the wrong code."""
    name = os.path.basename(corr_path)
    last = subprocess.run(
        ["git", "log", "-1", "--format=%H", "--", name],
        capture_output=True, text=True, cwd=REPO,
    ).stdout.strip()
    if not last:
        # Untracked-but-present (VERDICT r6 item 9): mid-round, the
        # driver has written the file but its end-of-round snapshot
        # hasn't landed yet. The rows were produced against the last
        # committed tree, i.e. HEAD — fall back to it instead of
        # rendering freshly-certified rows as unverifiable.
        if os.path.exists(os.path.join(REPO, name)):
            head = subprocess.run(
                ["git", "rev-parse", "HEAD"],
                capture_output=True, text=True, cwd=REPO,
            )
            return head.stdout.strip() if head.returncode == 0 else None
        return None
    parent = subprocess.run(
        ["git", "rev-parse", f"{last}^"],
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
    round_blobs: dict[str, tuple[dict, dict | None] | None] = {}
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
    now_blobs, now_catalog, now_modsec = _worktree_blobs()
    qmod = {name: fn.__module__ for name, fn in queries.items()}
    qfiles = {name: closure.get(qmod[name], set()) for name in base_order}
    from m5_competition_kaggle_spark.sources.catalog import TABLES

    def _read_worktree(rel: str) -> str:
        return open(os.path.join(REPO, rel)).read()

    qtables = {
        name: _closure_tables(qfiles[name], TABLES, _read_worktree)
        for name in base_order
    }
    modfile = _module_files()
    qattrib = {
        name: _sect_attrib(
            queries[name].__name__,
            modfile.get(qmod[name], ""),
            qfiles[name],
            _read_worktree,
        )
        for name in base_order
    }
    now_hash = {
        name: _hash_fileset(
            qfiles[name], now_blobs, now_catalog, qtables[name],
            now_modsec, qattrib[name],
        )
        for name in base_order
    }
    # Sectioned hashing (catalog tables, per-function modules) applies
    # only when BOTH the round's blob and the worktree parse into
    # sections; otherwise that file falls back to whole-file on both
    # sides so the comparison stays apples-to-apples.
    round_hash: dict[str, dict[str, str]] = {}
    now_hash_for: dict[str, dict[str, str]] = {}
    for rnd, bc in round_blobs.items():
        if bc is None:
            round_hash[rnd] = {}
            now_hash_for[rnd] = {}
            continue
        blobs, cat, rnd_modsec = bc
        sectioned = cat is not None and now_catalog is not None
        common = set(rnd_modsec) & set(now_modsec)
        rnd_ms = {p: rnd_modsec[p] for p in common}
        now_ms = {p: now_modsec[p] for p in common}
        round_hash[rnd] = {
            name: _hash_fileset(
                qfiles[name], blobs,
                cat if sectioned else None, qtables[name],
                rnd_ms, qattrib[name],
            )
            for name in base_order
        }
        now_hash_for[rnd] = {
            name: _hash_fileset(
                qfiles[name], now_blobs,
                now_catalog if sectioned else None, qtables[name],
                now_ms, qattrib[name],
            )
            for name in base_order
        }

    # First pass: which queries hold a CURRENTLY-VALID green row?
    def row_valid(name: str) -> bool:
        for rnd, data in rounds.items():
            row = data.get(name)
            if row is None:
                continue
            rh = round_hash[rnd].get(name)
            if rh is None or rh != now_hash_for[rnd].get(name):
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
        " over package files, AST-normalized — docstrings/comments"
        " stripped, so wording-only edits never forge a stale — hashed"
        " at the round's certified commit)"
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
            fresh = rh is not None and rh == now_hash_for[rnd].get(name)
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
            "tables": (
                "ALL" if qtables[name] is None
                else sorted(qtables[name])
            ),
            "sections": (
                "ALL" if qattrib[name] is None
                else {
                    os.path.basename(p): sorted(names)
                    for p, names in sorted(qattrib[name].items())
                    if p in now_modsec
                }
            ),
        }
        for name in qs
    }
    with open(os.path.join(REPO, "CERTIFICATION_hashes.json"), "w") as f:
        json.dump(bank, f, indent=1, sort_keys=True)

    # README inventory block (VERDICT r10 item 5: counts must be
    # generated, not hand-maintained). Staged-but-unregistered queue
    # modules are discovered by filename so the block never lags a
    # registration round.
    staged: list[tuple[str, int]] = []
    reg_mods = {m.__name__.rsplit(".", 1)[-1] for m in _MODULES}
    for path in sorted(
        glob.glob(os.path.join(REPO, PKG, "queries", "extensions_r*.py"))
    ):
        mod = os.path.basename(path)[:-3]
        if mod not in reg_mods:
            import importlib

            m = importlib.import_module(f"{PKG}.queries.{mod}")
            staged.append((mod, len(m.QUERIES)))
    staged_txt = (
        "; staged for a future registration round: " + ", ".join(
            f"{n} queries in `queries/{mod}.py`" for mod, n in staged
        ) + " (locally oracle-certified at sf0.001+sf0.01, 10×-probed,"
        " plan-audited before registration)"
        if staged else ""
    )
    counts_block = (
        "<!-- COUNTS:BEGIN — generated by "
        "scripts/certification_ledger.py; do not hand-edit -->\n"
        f"**Query inventory:** {len(qs)} registered queries — "
        f"{sum(1 for q in qs if q in oracles)} with bit-exact DuckDB "
        f"oracle twins, {sum(1 for q in qs if q not in oracles)} "
        f"honestly rows-only. {n_valid} hold a currently-valid "
        "driver-green certification row; the remaining "
        f"{len(qs) - n_valid} hold head-50 slots for the next driver "
        f"run{staged_txt}.\n"
        "<!-- COUNTS:END -->"
    )
    readme_path = os.path.join(REPO, "README.md")
    if os.path.exists(readme_path):
        import re

        readme = open(readme_path).read()
        new_readme, n_sub = re.subn(
            r"<!-- COUNTS:BEGIN.*?COUNTS:END -->",
            counts_block.replace("\\", r"\\"),
            readme,
            flags=re.S,
        )
        if n_sub:
            with open(readme_path, "w") as f:
                f.write(new_readme)

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
