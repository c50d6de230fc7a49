"""Per-query source-scan audit: how many times does each catalog query's
physical plan REALLY scan each parquet relation?

A plan that scans the same source 3-4x with no ReusedExchange /
InMemoryTableScan re-runs the whole upstream subtree per branch — the
"recompute the corpus N times" scale bug (VERDICT r6).  This module
counts *uncached* `Scan parquet` nodes per relation root path in the
FORMATTED explain.  Two display artifacts must NOT be counted:

  * InMemoryRelation blocks: the formatted tree re-prints the cached
    plan under EVERY InMemoryTableScan branch, and an AQE cached plan
    prints both "== Final Plan ==" and "== Initial Plan ==" sections —
    so one materialize-once scan can appear 8x in the text (the r7
    false positives on drift_weekly_psi / timeseries_resample).
  * Node-id repeats: the same physical node id shown twice is one node.

Rule: a scan is real iff its node id appears in the tree at least once
OUTSIDE any InMemoryRelation subtree; counts are per DISTINCT node id.
Subtree membership uses the column of the node text (Spark indents each
tree level by a fixed 3 columns, and nested-cached-plan lines such as
`ResultQueryStage (12)` that carry no `+- ` marker still sit strictly
deeper than their InMemoryRelation ancestor) — not the `+- ` marker
position, which those lines lack (the r7 parser bug).

Usage:
    python scripts/scan_audit.py [sf_dir] [query ...]   # default: all batch
Prints one line per query: max real scans of any single relation +
detail, and a trailing summary of queries exceeding the threshold.
`tests/test_plan_guard.py` imports `scan_counts` and asserts the same
bound over the whole batch catalog, so this can't silently regress.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# A tree line, after stripping the `[ :+-]` gutter, starts with an
# optional codegen `*`, then the node name, then the node id:
#   `* HashAggregate (10)`, `Scan parquet  (3)`,
#   `BroadcastHashJoin LeftOuter BuildRight (29)`,
#   `ShuffleQueryStage (9), Statistics(...)`.
# Section headers (`== Final Plan ==`) carry no id and are skipped.
_NODE = re.compile(r"^\*?\s*([A-Za-z][\w]*(?: [A-Za-z][\w]*)*)\s*\((\d+)\)")
_GUTTER = re.compile(r"^[\s:+-]*")


def scan_counts(df) -> dict[str, int]:
    """relation root path -> number of DISTINCT uncached `Scan parquet`
    node ids in the formatted plan tree.  Scans whose every appearance
    is inside an InMemoryRelation cached-plan display are excluded (the
    cached plan executes once at materialization no matter how many
    InMemoryTableScan branches re-print it)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()

    # id -> relation path, from the numbered detail blocks:
    #   (3) Scan parquet
    #   Location: InMemoryFileIndex [file:/root/testdata/.../events.parquet]
    id_path: dict[str, str] = {}
    for m in re.finditer(r"\n\((\d+)\) Scan parquet ?\n(.*?)(?=\n\(\d+\)|\Z)",
                         txt, re.S):
        loc = re.search(r"Location:[^\[]*\[([^\],]+)", m.group(2))
        id_path[m.group(1)] = loc.group(1) if loc else "<unknown>"

    tree = txt.split("\n\n")[0]
    imr_depths: list[int] = []      # columns of open InMemoryRelation nodes
    uncached_ids: set[str] = set()
    for line in tree.splitlines():
        gutter = _GUTTER.match(line).group(0)
        node = _NODE.match(line[len(gutter):])
        if not node:
            continue            # section header / detail text: no stack edit
        depth = len(gutter)     # column of the node text = tree depth
        name, nid = node.group(1), node.group(2)
        while imr_depths and depth <= imr_depths[-1]:
            imr_depths.pop()
        if name == "InMemoryRelation":
            imr_depths.append(depth)
        elif name == "Scan parquet" and not imr_depths:
            uncached_ids.add(nid)

    counts: dict[str, int] = {}
    for nid in uncached_ids:
        path = id_path.get(nid, "<unknown>")
        counts[path] = counts.get(path, 0) + 1
    return counts


# Queries allowed >MAX_SCANS real scans of one relation, with why.
ALLOWED_MULTI: dict[str, str] = {
    "view_big_qty_orders": (
        "user SQL (TPC-H Q18 shape): Catalyst duplicates the IN-subquery "
        "semi-filter onto BOTH join sides so lineitem is pruned before "
        "the big join — 3 lineitem scans (join side + 2 copies of the "
        "keys-only subquery aggregate) is the optimizer's deliberate "
        "prune-early trade, not an operator recompute bug"
    ),
    "text_bm25_topk": (
        "bm25's shared tf table is SIZE-GATED (dedup._persist_if_large, "
        "r9): below 64 MiB of input, re-tokenizing the small corpus per "
        "branch (4 scans) is measurably cheaper than materializing the "
        "tf table (sf0.1: 1.57s vs 2.90s). At/above the threshold — the "
        "100 TB case this guard protects — the persist kicks in and the "
        "relation is scanned once; test_round9.py covers both gate arms"
    ),
    "retrieval_rrf_fused": (
        "fuses a bm25 run (see text_bm25_topk: size-gated tf persist "
        "re-reads the small corpus per branch) with an embedding run; "
        "the large-input path persists and scans once"
    ),
}

MAX_SCANS = 2  # a self-join reads its source twice; 3+ means recompute


def audit(sf_dir: str, names=None, verbose: bool = True):
    """Run the audit; return [(query, max_scans)] offenders (ERRs as -1)."""
    from topnotch_spark import catalog
    from topnotch_spark.session import get_spark

    spark = get_spark("scan-audit")
    todo = [
        n for n in sorted(catalog.ALL)
        if not n.startswith("streaming_") and (not names or n in set(names))
    ]
    offenders = []
    for name in todo:
        try:
            counts = scan_counts(catalog.ALL[name](spark, sf_dir))
        except Exception as e:  # surface, keep auditing
            if verbose:
                print(f"ERR   {name}: {type(e).__name__}: {e}")
            offenders.append((name, -1))
            continue
        worst = max(counts.values(), default=0)
        bad = worst > MAX_SCANS and name not in ALLOWED_MULTI
        if verbose:
            detail = ", ".join(
                f"{p.rsplit('/', 1)[-1]}x{c}" for p, c in sorted(counts.items())
            )
            print(f"{'MULTI' if bad else 'ok   '} {name}: max={worst}  [{detail}]")
        if bad:
            offenders.append((name, worst))
    return offenders


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    offenders = audit(sf_dir, sys.argv[2:])
    print(f"\n{len(offenders)} queries scan a relation >{MAX_SCANS}x: "
          f"{[n for n, _ in offenders]}")
    return 1 if offenders else 0


if __name__ == "__main__":
    sys.exit(main())
