"""Plan-shape regression guard over the whole batch catalog.

A correctness gate can stay green while a plan silently degrades into a
shape that dies at 100 TB. This guard analyzes (never executes) every
batch catalog query's physical plan and bans the one shape that is
always fatal at scale: a non-broadcast ``CartesianProduct``. Broadcast
nested-loop joins against 1-row/k-row bounds frames are legitimate and
remain allowed — Spark only emits ``CartesianProduct`` when BOTH sides
are big (or broadcast was impossible), which is exactly the regression
this test exists to catch.

Streaming queries are skipped (starting a stream executes it; their
per-micro-batch plans are audited in SCALE.md §4 and their semantics by
test_streaming.py).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from topnotch_spark import catalog

SF = "/root/testdata/sf0.001"

BATCH_QUERIES = sorted(
    name for name in catalog.ALL if not name.startswith("streaming_")
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_no_cartesian_product(spark, name):
    plan = _plan(catalog.ALL[name](spark, SF))
    assert "CartesianProduct" not in plan, (
        f"{name}: plan degraded to a CartesianProduct — at 100 TB this is "
        f"|left| x |right| comparisons. Block the join (bucket/band/grid) "
        f"or broadcast the small side.\n{plan[:2000]}"
    )
