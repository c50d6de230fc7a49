from __future__ import annotations

import pytest

from topnotch_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "topnotch_spark-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()


def df_equals(df1, df2, ignore_order=True) -> bool:
    """Schema-as-set + rows-as-set comparison, ignoring nullability
    (reference test helper TnTestHelper.scala:51-56)."""
    s1 = {(f.name.lower(), f.dataType.simpleString()) for f in df1.schema.fields}
    s2 = {(f.name.lower(), f.dataType.simpleString()) for f in df2.schema.fields}
    if s1 != s2:
        return False
    cols = sorted(c.lower() for c in df1.columns)
    r1 = [tuple(r[c] for c in cols) for r in df1.toDF(*[c.lower() for c in df1.columns]).select(cols).collect()]
    r2 = [tuple(r[c] for c in cols) for r in df2.toDF(*[c.lower() for c in df2.columns]).select(cols).collect()]
    if ignore_order:
        key = lambda t: tuple(repr(x) for x in t)  # noqa: E731
        r1, r2 = sorted(r1, key=key), sorted(r2, key=key)
    return r1 == r2
