"""Staleness auditor: automate the judge's changed-code rule.

Every driver CORRECTNESS row was measured against the tree as of its
round's artifact-boundary commit (``round N: verdict/advice/...``). A
query whose IMPLEMENTATION changed after its latest driver row is
"stale against HEAD" — its evidence no longer covers the shipping code
(VERDICT r11 what's-wrong #1 was exactly this class, found by hand).
This tool finds the class mechanically and writes STALENESS.json:

- per query: defining file, function name, latest driver round, and
  whether the function's decorated source (which contains the inline
  oracle SQL) differs from its text at that round's boundary commit;
- summary: ``stale_against_head`` — the list the next window MUST
  lead with — plus ``unresolvable`` (functions the source-diff cannot
  anchor: wrappers, re-exports; check those by hand).

Granularity (r13, closure-aware): the fingerprint is the query's own
top-level ``def`` INCLUDING decorators (so oracle-SQL edits count)
PLUS the transitive closure of every top-level function, constant,
and class it references by name — same-file AND across in-repo
imports (module-level or function-local ``from ..x import y``, the
prefix kernels, ``session.load_table``, ``pin``) — so editing ANY
engine helper flags every registered consumer. The first same-file
closure run surfaced 19 queries whose helpers had changed since their
rows with no verdict ever flagging them (the r12 k-means partial-sort
fix alone had silently staled four); extending to cross-module
imports added 7 more (kernel and session-helper consumers). The old
side of each diff resolves imports against the BOUNDARY COMMIT's own
tree, so package moves don't corrupt it. Out-of-repo imports
(pyspark, stdlib) are never closed over. A query that did not exist
at its boundary commit (file or def absent) is reported stale only if
it has a driver row at all.

ROWS-ONLY law coverage (VERDICT r12 item 7): a rows-only query (no
oracle SQL — the driver checks rows>0 only) carries its semantic
contract in its pinned LAW tests, so a law edit is a code change the
decorated-def diff cannot see. For each rows-only query the tool
therefore also fingerprints every ``tests/`` top-level ``test_*``
function whose source mentions the query's registered name or its
implementing function's name, and a law-fingerprint diff against the
boundary commit marks the query stale exactly like a def diff (the
per-query entry records ``laws_changed`` and the matched
``law_tests``). Adding or removing a law test flags too — new law,
new evidence obligation.

Regenerate with ``python tools_staleness.py``.
"""
from __future__ import annotations

import ast
import glob
import inspect
import json
import os
import re
import subprocess


def _boundary_commits() -> dict[int, str]:
    out = subprocess.run(
        ["git", "log", "--format=%H %s"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    bounds: dict[int, str] = {}
    for line in out.splitlines():
        m = re.match(
            r"([0-9a-f]+) round (\d+): verdict/advice/correctness/bench",
            line,
        )
        if m and int(m.group(2)) not in bounds:
            bounds[int(m.group(2))] = m.group(1)
    return bounds


def _latest_rows() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        r = int(re.search(r"r(\d+)", f).group(1))
        for q in json.load(open(f)):
            latest[q] = max(latest.get(q, 0), r)
    return latest


_PKG = "console_etl_spark"


def _parse_top(text: str):
    """(top-level name -> node, imported name -> (level, module, orig))
    for one module's source, or (None, None) on a syntax error."""
    try:
        tree = ast.parse(text)
    except SyntaxError:
        return None, None
    top: dict[str, ast.AST] = {}
    imports: dict[str, tuple[int, str, str]] = {}
    for node in tree.body:
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            top[node.name] = node
        elif isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name):
                    top[t.id] = node
        elif isinstance(node, ast.AnnAssign) and isinstance(
            node.target, ast.Name
        ):
            top[node.target.id] = node
        elif isinstance(node, ast.ImportFrom) and node.module is not None:
            for al in node.names:
                imports[al.asname or al.name] = (
                    node.level,
                    node.module,
                    al.name,
                )
    return top, imports


def _resolve_module(loader, relpath: str, level: int, module: str):
    """Repo-relative path of an imported in-repo module, or None for
    anything outside the engine package (pyspark, stdlib, ...)."""
    if level == 0:
        if module != _PKG and not module.startswith(_PKG + "."):
            return None
        mparts = module.split(".")
    else:
        base = relpath.split("/")[:-1]
        if level > 1:
            base = base[: len(base) - (level - 1)]
        mparts = base + (module.split(".") if module else [])
    for cand in ("/".join(mparts) + ".py", "/".join(mparts) + "/__init__.py"):
        if loader(cand) is not None:
            return cand
    return None


def _closure_parts(loader, relpath: str, name: str, seen, parts, cache):
    """Accumulate (relpath, name, AST dump) for top-level ``name`` in
    ``relpath`` and everything it transitively references — same-file
    helpers/constants/classes by Name, AND in-repo cross-module imports
    (module-level or function-local ``from .x import y``). ``loader``
    maps repo-relative path -> source text (HEAD filesystem or a git
    commit), so both diff sides share this one engine."""
    key = (relpath, name)
    if key in seen:
        return
    seen.add(key)
    if relpath not in cache:
        text = loader(relpath)
        cache[relpath] = (None, None) if text is None else _parse_top(text)
    top, imports = cache[relpath]
    if top is None or name not in top:
        return
    node = top[name]
    dumped = node
    if isinstance(dumped, (ast.FunctionDef, ast.AsyncFunctionDef)):
        import copy

        dumped = _strip_docstring(copy.deepcopy(dumped))
    parts.append((relpath, name, ast.dump(dumped, include_attributes=False)))
    local_imports = dict(imports)
    for sub in ast.walk(node):
        if isinstance(sub, ast.ImportFrom) and sub.module is not None:
            for al in sub.names:
                local_imports[al.asname or al.name] = (
                    sub.level,
                    sub.module,
                    al.name,
                )
    for sub in ast.walk(node):
        if not isinstance(sub, ast.Name):
            continue
        nid = sub.id
        if nid in top:
            _closure_parts(loader, relpath, nid, seen, parts, cache)
        elif nid in local_imports:
            lvl, mod, orig = local_imports[nid]
            tgt = _resolve_module(loader, relpath, lvl, mod)
            if tgt is not None:
                _closure_parts(loader, tgt, orig, seen, parts, cache)


def _fingerprint(loader, relpath: str, name: str, cache) -> str | None:
    parts: list[tuple[str, str, str]] = []
    _closure_parts(loader, relpath, name, set(), parts, cache)
    if not parts:
        return None
    return repr(tuple(sorted(parts)))


def _def_source(py_text: str, name: str) -> str | None:
    """A SEMANTIC fingerprint of top-level ``def name`` AND its
    same-file closure over a single source text: the AST dumps
    (docstrings stripped, decorators included — the inline @_register
    oracle SQL lives there, so oracle edits count) of the def plus
    every top-level function, constant assignment, or class it
    transitively references by Name. Cross-module imports resolve to
    nothing under this single-text loader — the full engine
    (_fingerprint with a filesystem/commit loader, used by main())
    closes over in-repo imports too. AST comparison means
    comment/docstring churn never flags; code, constant, helper, or
    oracle changes do."""
    pseudo = "<text>.py"
    return _fingerprint(
        lambda p: py_text if p == pseudo else None, pseudo, name, {}
    )


def _strip_docstring(node: ast.AST) -> ast.AST:
    body = node.body
    if (
        body
        and isinstance(body[0], ast.Expr)
        and isinstance(body[0].value, ast.Constant)
        and isinstance(body[0].value.value, str)
    ):
        node.body = body[1:] or [ast.Pass()]
    return node


# A law test pins ONE query's semantics (two for explicit twins); a
# test mentioning this many registered query names is registry
# plumbing — the window-order pins, the collect allowlist, artifact
# sync — whose churn says nothing about any single query's contract.
LAW_NAME_FANOUT_CAP = 5

# Registry-plumbing tests matched by NAME: the window pins read
# _PRIORITY dynamically and spot-check only a few literal names, so
# the fanout cap alone cannot see that their churn is rotation churn,
# not a semantic change to the handful of queries they happen to
# name. Every test whose name matches is registry machinery by
# convention in this suite.
_REGISTRY_TEST_PAT = re.compile(
    r"window|registration_order|artifact|staleness|allowlist"
)


def law_fingerprint(
    test_texts: dict[str, str],
    names: tuple[str, ...],
    all_names: tuple[str, ...] = (),
) -> tuple[tuple[str, str, str], ...]:
    """Semantic fingerprint of every law test pinning a rows-only
    query: over ``{relpath: source}`` of test files, collect each
    top-level ``test_*`` function whose RAW source segment mentions any
    of ``names`` (the query's registered name / implementing function
    name, word-bounded), and return the sorted tuple of
    (relpath, test name, docstring-stripped AST dump). Pure over its
    inputs so the HEAD and boundary-commit sides — and the synthetic
    proof test — share one definition. AST dump means comment and
    formatting churn does not flag; assertion or setup changes do.
    ``all_names`` (every registered query name) filters out REGISTRY
    tests: a function matching >= LAW_NAME_FANOUT_CAP registered names
    (window pins, allowlists) is not a law for any one query — without
    this cap, every window rotation flagged whichever rows-only
    queries rotated out as 'law-stale'."""
    pats = [re.compile(rf"\b{re.escape(n)}\b") for n in names if n]
    all_pats = [re.compile(rf"\b{re.escape(n)}\b") for n in all_names]
    out: list[tuple[str, str, str]] = []
    for relpath in sorted(test_texts):
        text = test_texts[relpath]
        try:
            tree = ast.parse(text)
        except SyntaxError:
            continue
        lines = text.splitlines()
        # top-level test functions AND test methods inside Test*
        # classes — half this suite's law tests live in class bodies
        # (TestRound12Laws etc.); scanning only tree.body made every
        # class-scoped law invisible to the rule
        candidates: list[tuple[str, ast.AST]] = []
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                candidates.append((node.name, node))
            elif isinstance(node, ast.ClassDef):
                for sub in node.body:
                    if isinstance(
                        sub, (ast.FunctionDef, ast.AsyncFunctionDef)
                    ):
                        candidates.append((f"{node.name}::{sub.name}", sub))
        for label, node in candidates:
            if not node.name.startswith("test_"):
                continue
            if _REGISTRY_TEST_PAT.search(node.name):
                continue
            seg = "\n".join(lines[node.lineno - 1 : node.end_lineno])
            if not any(p.search(seg) for p in pats):
                continue
            fanout = sum(1 for p in all_pats if p.search(seg))
            if all_pats and fanout >= LAW_NAME_FANOUT_CAP:
                continue
            out.append(
                (
                    relpath,
                    label,
                    ast.dump(
                        _strip_docstring(node), include_attributes=False
                    ),
                )
            )
    return tuple(out)


def _test_texts_head(root: str) -> dict[str, str]:
    texts: dict[str, str] = {}
    for f in sorted(glob.glob(os.path.join(root, "tests", "*.py"))):
        texts[os.path.relpath(f, root)] = open(f).read()
    return texts


def _test_texts_at(commit: str) -> dict[str, str]:
    ls = subprocess.run(
        ["git", "ls-tree", "-r", "--name-only", commit, "tests/"],
        capture_output=True,
        text=True,
    ).stdout
    texts: dict[str, str] = {}
    for path in ls.splitlines():
        if not path.endswith(".py"):
            continue
        text = _file_at(commit, path)
        if text is not None:
            texts[path] = text
    return texts


def _file_at(commit: str, relpath: str) -> str | None:
    p = subprocess.run(
        ["git", "show", f"{commit}:{relpath}"],
        capture_output=True,
        text=True,
    )
    return p.stdout if p.returncode == 0 else None


def _commit_loader(commit: str, text_cache: dict):
    def load(relpath: str) -> str | None:
        k = (commit, relpath)
        if k not in text_cache:
            text_cache[k] = _file_at(commit, relpath)
        return text_cache[k]

    return load


def _def_source_at(
    commit: str,
    relpath: str,
    name: str,
    text_cache: dict,
    parse_cache: dict,
) -> str | None:
    """The def's closure fingerprint at ``commit`` — following moves:
    if ``relpath`` doesn't hold the def there (e.g. the r7
    relational.py package split moved every query), grep the commit's
    tree for the def and anchor on whichever file defines it. The
    cross-module closure resolves imports against the COMMIT's own
    layout (the loader serves that tree), so a later package move
    doesn't corrupt the old side of the diff."""
    loader = _commit_loader(commit, text_cache)
    src = _fingerprint(loader, relpath, name, parse_cache)
    if src is not None:
        return src
    hits = subprocess.run(
        ["git", "grep", "-l", f"def {name}(", commit, "--", "*.py"],
        capture_output=True,
        text=True,
    ).stdout
    for hit in hits.splitlines():
        # format: <commit>:<path>
        path = hit.split(":", 1)[1]
        src = _fingerprint(loader, path, name, parse_cache)
        if src is not None:
            return src
    return None


def main() -> None:
    import __spark_entry__ as entrymod

    root = os.path.dirname(os.path.abspath(__file__))
    bounds = _boundary_commits()
    latest = _latest_rows()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    head_tests = _test_texts_head(root)
    tests_at: dict[str, dict[str, str]] = {}  # per-boundary-commit cache

    def head_loader(relpath: str) -> str | None:
        f = os.path.join(root, relpath)
        return open(f).read() if os.path.isfile(f) else None

    head_parse: dict = {}
    commit_texts: dict = {}
    commit_parse: dict[str, dict] = {}  # per-commit parse caches

    out: dict[str, dict] = {}
    stale: list[str] = []
    unresolvable: list[str] = []
    for name, fn in qs.items():
        row = latest.get(name)
        entry: dict = {"latest_driver_round": row}
        target = inspect.unwrap(fn)
        try:
            relpath = os.path.relpath(inspect.getsourcefile(target), root)
        except TypeError:
            relpath = None
        entry["file"] = relpath
        entry["function"] = getattr(target, "__name__", None)
        if row is None:
            # never driver-checked: the window leads with these anyway
            entry["changed_since_row"] = None
            out[name] = entry
            continue
        if row not in bounds or relpath is None or entry["function"] in (
            None,
            "<lambda>",
        ):
            entry["changed_since_row"] = None
            unresolvable.append(name)
            out[name] = entry
            continue
        head_src = _fingerprint(
            head_loader, relpath, entry["function"], head_parse
        )
        commit = bounds[row]
        old_src = _def_source_at(
            commit,
            relpath,
            entry["function"],
            commit_texts,
            commit_parse.setdefault(commit, {}),
        )
        if head_src is None:
            entry["changed_since_row"] = None
            unresolvable.append(name)
            out[name] = entry
            continue
        changed = head_src != old_src
        if name not in oracles:
            # rows-only: the law tests carry the semantic contract the
            # missing oracle would — fingerprint them on both sides
            match_names = (name, entry["function"])
            all_names = tuple(qs)
            head_laws = law_fingerprint(head_tests, match_names, all_names)
            commit = bounds[row]
            if commit not in tests_at:
                tests_at[commit] = _test_texts_at(commit)
            old_laws = law_fingerprint(
                tests_at[commit], match_names, all_names
            )
            entry["law_tests"] = sorted(
                f"{p}::{t}" for p, t, _ in head_laws
            )
            entry["laws_changed"] = head_laws != old_laws
            changed = changed or entry["laws_changed"]
        entry["changed_since_row"] = changed
        if changed:
            stale.append(name)
        out[name] = entry

    doc = {
        "summary": {
            "n_queries": len(out),
            "stale_against_head": sorted(stale),
            "unresolvable": sorted(unresolvable),
            "never_driver_checked": sorted(
                k for k, v in out.items()
                if v["latest_driver_round"] is None
            ),
            "boundary_commits": {
                str(r): bounds[r] for r in sorted(bounds)
            },
        },
        "queries": out,
    }
    with open("STALENESS.json", "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(json.dumps(doc["summary"]["stale_against_head"]))
    print(
        f"# {len(stale)} stale-against-HEAD, "
        f"{len(unresolvable)} unresolvable, "
        f"{len(doc['summary']['never_driver_checked'])} never-checked"
    )


if __name__ == "__main__":
    main()
