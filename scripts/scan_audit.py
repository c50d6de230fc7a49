"""Per-query source-scan audit: how many times does each catalog query's
physical plan scan each parquet relation?

A plan that scans the same source 3-4x with no ReusedExchange /
InMemoryTableScan re-runs the whole upstream subtree per branch — the
"recompute the corpus N times" scale bug (VERDICT r6). This script
counts `Scan parquet` nodes per relation root path in the FORMATTED
explain (persisted intermediates surface as InMemoryTableScan, which
executes its cached plan once regardless of how many branches read it).

Usage:
    python scripts/scan_audit.py [sf_dir] [query ...]   # default: all batch
Prints one line per query: max scans of any single relation + detail,
and a trailing summary of queries exceeding 2.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def scan_counts(df) -> dict[str, int]:
    """relation root path -> number of Scan parquet nodes in the
    formatted plan tree, EXCLUDING scans inside InMemoryRelation cached
    plans (a cached plan executes once at materialization no matter how
    many InMemoryTableScan branches read it) and ReusedExchange bodies
    (which the formatted tree doesn't expand)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()

    # id -> relation path, from the numbered detail blocks:
    #   (1) Scan parquet
    #   Location: InMemoryFileIndex [file:/root/testdata/.../events.parquet]
    id_path: dict[str, str] = {}
    for m in re.finditer(r"\n\((\d+)\) Scan parquet ?\n(.*?)(?=\n\(\d+\)|\Z)",
                         txt, re.S):
        loc = re.search(r"Location:[^\[]*\[([^\],]+)", m.group(2))
        id_path[m.group(1)] = loc.group(1) if loc else "<unknown>"

    counts: dict[str, int] = {}
    tree = txt.split("\n\n")[0]
    imr_depths: list[int] = []  # stack of InMemoryRelation node depths
    for line in tree.splitlines():
        node = re.search(r"(?:\+- |:- )?\*?\s?(\w[\w ]*?)\s*(?:\w+ )*\((\d+)\)\s*$",
                         line)
        if not node:
            continue
        pos = max(line.find("+- "), line.find(":- "))
        depth = pos if pos >= 0 else -1
        while imr_depths and depth <= imr_depths[-1]:
            imr_depths.pop()
        if "InMemoryRelation" in line:
            imr_depths.append(depth)
            continue
        if imr_depths:
            continue  # inside a cached plan: materializes once
        if "Scan parquet" in line:
            sid = node.group(2)
            path = id_path.get(sid, "<unknown>")
            counts[path] = counts.get(path, 0) + 1
    return counts


def main() -> int:
    from topnotch_spark import catalog
    from topnotch_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("scan-audit")
    names = [
        n for n in sorted(catalog.ALL)
        if not n.startswith("streaming_") and (not only or n in only)
    ]
    offenders = []
    for name in names:
        try:
            counts = scan_counts(catalog.ALL[name](spark, sf_dir))
        except Exception as e:  # surface, keep auditing
            print(f"ERR   {name}: {type(e).__name__}: {e}")
            offenders.append((name, -1))
            continue
        worst = max(counts.values(), default=0)
        detail = ", ".join(
            f"{p.rsplit('/', 1)[-1]}x{c}" for p, c in sorted(counts.items())
        )
        flag = "MULTI" if worst > 2 else "ok   "
        print(f"{flag} {name}: max={worst}  [{detail}]")
        if worst > 2:
            offenders.append((name, worst))
    print(f"\n{len(offenders)} queries scan a relation >2x: "
          f"{[n for n, _ in offenders]}")
    return 1 if offenders else 0


if __name__ == "__main__":
    sys.exit(main())
