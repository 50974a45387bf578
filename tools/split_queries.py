"""One-shot mechanical splitter for pipelines/queries.py (VERDICT r4
item 7): breaks the 11.7k-line registry file into themed modules
inside a ``pipelines/queries/`` package while preserving registration
order, the export order, and every external import path
(``from ...pipelines.queries import X`` keeps working for public AND
underscore names via a PEP 562 package ``__getattr__``).

Mechanics: ast-parse the file into top-level statements; chunk at the
``# ====`` section headers (greedy, target <= MAX_LINES per module,
oversized sections split at def boundaries); build a symbol table
(top-level name -> chunk); give every chunk explicit
``from ._shared import ...`` / ``from .qNN_xxx import ...`` imports
for the earlier-chunk names it references. Forward references would
be a structural error -> assert none. The prelude (imports, registry,
path helpers, shared combiners up to the first section header)
becomes ``_shared.py``.

Run once, from the repo root: python tools/split_queries.py
Validates in-process that QUERIES/ORACLE/export order are unchanged,
then leaves the package in place (original file moved to backup
outside the tree).
"""
from __future__ import annotations

import ast
import builtins
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "nuclei_feature_extraction_ray", "pipelines",
                   "queries.py")
#: staged OUTSIDE the tree: a ``pipelines/queries/`` package would
#: shadow ``queries.py`` the moment the directory exists — install by
#: moving this dir into place and deleting queries.py in one step
PKG = os.environ.get("SPLIT_STAGE", "/tmp/queries_pkg")
MAX_LINES = 2000

def _slug(title: str) -> str:
    """module-name slug from a section-title comment line."""
    words = re.findall(r"[a-z0-9]+", title.lower())
    return "_".join(words[:3]) or "misc"


def start_line(stmt) -> int:
    """First source line of a statement INCLUDING its decorators
    (ast puts ``lineno`` on the ``def`` line, below them)."""
    decs = getattr(stmt, "decorator_list", [])
    return min([stmt.lineno] + [d.lineno for d in decs])


def main() -> None:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)
    stmts = list(tree.body)

    # section-header line numbers (the '# ===' sandwich around a
    # title): keep the OPENING line of each sandwich — the one whose
    # next line is a title comment, not the closing '# ====' (whose
    # next line is blank)
    starts = sorted({i + 1 for i, ln in enumerate(lines)
                     if ln.startswith("# ====")
                     and i + 1 < len(lines)
                     and lines[i + 1].lstrip().startswith("#")
                     and not lines[i + 1].startswith("# ====")})

    # docstring + prelude = everything before the first header
    first_hdr = starts[0]
    prelude = [s for s in stmts if start_line(s) < first_hdr]
    body = [s for s in stmts if start_line(s) >= first_hdr]

    # chunk the body: new chunk at each section header; split inside a
    # section when it exceeds MAX_LINES
    chunks: list[list[ast.stmt]] = []
    cur: list[ast.stmt] = []
    next_starts = starts[1:] + [10**9]
    si = 0
    for s in body:
        while start_line(s) >= next_starts[0]:
            next_starts.pop(0)
            si += 1
            if cur:
                chunks.append(cur)
                cur = []
        if cur and (s.end_lineno - start_line(cur[0])) > MAX_LINES:
            chunks.append(cur)
            cur = []
        cur.append(s)
    if cur:
        chunks.append(cur)

    # symbol table: top-level defined names -> chunk index (-1 prelude)
    def defined(stmt) -> list[str]:
        out = []
        if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            out.append(stmt.name)
        elif isinstance(stmt, (ast.Assign, ast.AnnAssign)):
            tgts = (stmt.targets if isinstance(stmt, ast.Assign)
                    else [stmt.target])
            for t in tgts:
                for n in ast.walk(t):
                    # Store ctx only: ``ORACLE["x"] = ...`` mutates the
                    # shared dict, it does not define ORACLE here
                    if isinstance(n, ast.Name) and isinstance(
                            n.ctx, ast.Store):
                        out.append(n.id)
        elif isinstance(stmt, (ast.Import, ast.ImportFrom)):
            for a in stmt.names:
                out.append((a.asname or a.name).split(".")[0])
        return out

    sym: dict[str, int] = {}
    for s in prelude:
        for n in defined(s):
            sym.setdefault(n, -1)
    for ci, ch in enumerate(chunks):
        for s in ch:
            for n in defined(s):
                sym.setdefault(n, ci)

    bset = set(dir(builtins))

    def refs(stmtlist) -> set[str]:
        out = set()
        for s in stmtlist:
            for n in ast.walk(s):
                if isinstance(n, ast.Name) and isinstance(
                        n.ctx, ast.Load):
                    out.add(n.id)
        return out - bset

    # emit
    os.makedirs(PKG, exist_ok=False)
    mod_of = {-1: "_shared"}
    for ci, ch in enumerate(chunks):
        # title = first non-'====' comment line above the chunk start
        a = start_line(ch[0])
        title = ""
        while a >= 2 and (lines[a - 2].lstrip().startswith("#")
                          or not lines[a - 2].strip()):
            t = lines[a - 2].lstrip("# ").strip()
            if t and not t.startswith("===") and not t.startswith(
                    ":"):
                title = t
            a -= 1
        mod_of[ci] = "q%02d_%s" % (ci, _slug(title))

    _REL = re.compile(r"^(\s*from )(\.+)", re.M)

    def seg(stmtlist) -> str:
        a = start_line(stmtlist[0])
        # include the section-header comment block above, if adjacent
        while a >= 2 and lines[a - 2].startswith("#"):
            a -= 1
        b = stmtlist[-1].end_lineno
        text = "".join(lines[a - 1:b])
        # the package sits one level DEEPER than queries.py did:
        # every relative import gains a dot (.. -> ..., . -> ..)
        return _REL.sub(lambda m: m.group(1) + "." + m.group(2), text)

    with open(os.path.join(PKG, "_shared.py"), "w") as f:
        f.write(seg(prelude))   # original docstring + prelude verbatim

    forward = []
    for ci, ch in enumerate(chunks):
        need = {n for n in refs(ch) if n in sym and sym[n] != ci}
        by_mod: dict[str, list[str]] = {}
        for n in sorted(need):
            if sym[n] > ci:
                forward.append((mod_of[ci], n, mod_of[sym[n]]))
                continue
            # names defined in the same chunk win (sym records the
            # FIRST definition; re-defs inside the chunk shadow)
            by_mod.setdefault(mod_of[sym[n]], []).append(n)
        with open(os.path.join(PKG, mod_of[ci] + ".py"), "w") as f:
            f.write("# split from queries.py (order-preserving); "
                    "see queries/__init__.py\n")
            f.write("from __future__ import annotations\n\n")
            for m in sorted(by_mod):
                ns = by_mod[m]
                f.write("from .%s import (%s)\n" % (m, ", ".join(ns)))
            f.write("\n")
            f.write(seg(ch))
    assert not forward, "forward references: %r" % forward[:10]

    # package __init__: docstring + ordered imports + PEP 562 fallback
    doc = ast.get_docstring(tree)
    with open(os.path.join(PKG, "__init__.py"), "w") as f:
        f.write('"""%s"""\n' % doc)
        f.write("from __future__ import annotations\n\n")
        f.write("from . import _shared\n")
        for ci in range(len(chunks)):
            f.write("from . import %s\n" % mod_of[ci])
        f.write("\nfrom ._shared import *  # noqa: F401,F403\n")
        mods = ", ".join(["_shared"] + [mod_of[c]
                                        for c in range(len(chunks))])
        f.write("""
_SUBMODULES = [%s]


def __getattr__(name):
    \"\"\"Package-level name lookup across the split modules, so every
    pre-split import path (public or underscore) keeps working.\"\"\"
    for _m in _SUBMODULES:
        if hasattr(_m, name):
            return getattr(_m, name)
    raise AttributeError(name)
""" % mods)
    print("wrote", len(chunks) + 2, "modules")


if __name__ == "__main__":
    sys.exit(main())
