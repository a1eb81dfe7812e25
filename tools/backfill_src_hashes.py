#!/usr/bin/env python
"""One-shot backfill of ``query_src_hash`` into an older bench sidecar
(VERDICT r10 #3 bootstrap): reconstruct each headline query's source AT THE
COMMIT THAT PRODUCED the sidecar via ``git show``, hash the same span
``inspect.getsource`` hashes today (decorators included), and patch the
sidecar in place.  Needed exactly once — from r11 on, bench.py records the
hashes itself.

Usage: python tools/backfill_src_hashes.py <commit> <sidecar.json>
"""

from __future__ import annotations

import ast
import hashlib
import json
import subprocess
import sys

sys.path.insert(0, "/root/repo")


def fn_sources(commit: str, relpath: str) -> dict[str, str]:
    """{function_name: exact source span incl. decorators} for a module
    file at ``commit``."""
    text = subprocess.run(
        ["git", "show", f"{commit}:{relpath}"],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    ).stdout
    lines = text.splitlines(keepends=True)
    out = {}
    for node in ast.parse(text).body:
        if isinstance(node, ast.FunctionDef):
            start = min(
                [d.lineno for d in node.decorator_list] + [node.lineno]
            )
            out[node.name] = "".join(lines[start - 1 : node.end_lineno])
    return out


def main() -> int:
    commit, sidecar = sys.argv[1], sys.argv[2]
    import __spark_entry__ as entry

    queries = entry.queries()
    with open(sidecar) as f:
        detail = json.load(f)
    names = list(detail.get("queries", {}))
    by_mod: dict[str, dict[str, str]] = {}
    hashes = {}
    for name in names:
        fn = queries.get(name)
        if fn is None:
            continue
        mod = sys.modules[fn.__module__]
        rel = mod.__file__.replace("/root/repo/", "")
        if rel not in by_mod:
            by_mod[rel] = fn_sources(commit, rel)
        src = by_mod[rel].get(fn.__name__)
        if src is not None:
            hashes[name] = hashlib.md5(src.encode()).hexdigest()[:12]
    detail["query_src_hash"] = hashes
    detail["query_src_hash_backfilled_from"] = commit
    with open(sidecar, "w") as f:
        json.dump(detail, f, indent=1)
    print(f"backfilled {len(hashes)}/{len(names)} hashes from {commit} into {sidecar}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
