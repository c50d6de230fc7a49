"""Vector/embedding column builders (Spark side).

All pure `pyspark.sql.functions` higher-order-function compositions over
``array<float>`` columns — JVM-side, no Python. Dot products fold
left-to-right over the array, so results are bit-deterministic and
reproducible by any engine that sums in array order (the DuckDB oracles
unnest WITH ORDINALITY and fold in the same order).

Sign-random-projection (SRP) bucketing gives the LSH/ANN scale path: the
hyperplane "randomness" is derived from md5 of (plane, dim) so every
engine — and every executor — computes the same planes with no driver
state, broadcast, or RNG.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sql_ref(c: Column | str) -> str | None:
    """SQL fragment for a plain column NAME, else None. Only names are
    inlined — anything already a Column keeps the composed path."""
    return f"`{c}`" if isinstance(c, str) else None


def _dot_sql(a: str, b: str) -> str:
    # the exact SQL spelling of the composed fold below: zip_with
    # multiply in double, left-fold add from 0.0D — parses to the same
    # lambda expressions, so results are bit-identical
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        "CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
    )


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Sequential-fold dot product in double precision.

    ``dim`` is accepted for call-site uniformity with srp_bucket but
    deliberately unused: an unrolled element_at chain was measured in
    r8 (bit-identical left-associated order) and was NOT faster — at
    dim=64 the compact zip_with fold ties or wins, and unrolling
    planes × dim into projections actively regresses once Catalyst
    duplicates the tree (label_noise_knn 6.5 s → 44 s before the
    Generate barrier fix). The HOF tax is per-ELEMENT-call overhead;
    at 64 doubles per pair it is already amortized.

    Accepts column NAMES as well as Columns (r13): with names the whole
    fold is emitted as ONE parsed SQL expression — the composed form is
    ~30 py4j round trips of driver-side construction per call, which
    dominated the similarity family's wall time at bench scale."""
    del dim  # measured: unrolling is not a win — see docstring
    ra, rb = _sql_ref(a), _sql_ref(b)
    if ra is not None and rb is not None:
        return F.expr(_dot_sql(ra, rb))
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str, dim: int | None = None) -> Column:
    ra = _sql_ref(a)
    if ra is not None:
        return F.expr(f"sqrt({_dot_sql(ra, ra)})")
    return F.sqrt(dot(a, a, dim))


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    ra, rb = _sql_ref(a), _sql_ref(b)
    if ra is not None and rb is not None:
        return F.expr(
            f"{_dot_sql(ra, rb)} / (sqrt({_dot_sql(ra, ra)}) * "
            f"sqrt({_dot_sql(rb, rb)}))"
        )
    return dot(a, b, dim) / (norm(a, dim) * norm(b, dim))


def _plane_sign(plane: int, dim_idx: Column) -> Column:
    """Deterministic ±1 for (plane, dimension): +1 iff the first hex nibble
    of md5('p<plane>_d<dim>') is >= 8."""
    h = F.md5(F.concat(F.lit(f"p{plane}_d"), dim_idx.cast("string")))
    nib = F.instr(F.lit("0123456789abcdef"), F.substring(h, 1, 1)) - 1
    return F.when(nib >= 8, F.lit(1.0)).otherwise(F.lit(-1.0))


def plane_signs(plane: int, dim: int) -> list[float]:
    """The ``dim`` ±1 signs of one SRP hyperplane, computed driver-side.

    Exactly the values `_plane_sign` produces executor-side: +1 iff the
    first hex nibble of md5('p<plane>_d<dim>') >= 8. Python's md5 == any
    engine's md5, so precomputing here changes nothing semantically — it
    just removes dim × planes md5 evaluations *per row* from the plan.
    """
    return [
        1.0
        if int(hashlib.md5(f"p{plane}_d{i}".encode()).hexdigest()[0], 16) >= 8
        else -1.0
        for i in range(dim)
    ]


def lit_double_array(vals: list[float]) -> Column:
    """Literal ``array<double>`` built with ONE py4j call.

    ``F.array(*[F.lit(v) ...])`` creates one JVM round trip per element
    from the Python driver; at dim=64 × 8 planes that is ~500 round
    trips per srp_bucket call site, which was measured (r13) as seconds
    of pure DataFrame-CONSTRUCTION time per similarity query — the JVM
    sat idle waiting on py4j while Python assembled Columns. Python's
    ``repr`` of a double round-trips exactly through the SQL parser's
    double literal, so the parsed array is value-identical."""
    return F.expr(
        "array(" + ",".join(repr(float(v)) + "D" for v in vals) + ")"
    )


def srp_bucket(
    vec: Column | str, n_planes: int = 8, dim: int | None = None
) -> Column:
    """Sign-random-projection bucket id: ``n_planes``-char '0'/'1' string.

    At 100 TB scale this is the blocking key for near-dup joins: the
    all-pairs O(n²) comparison becomes a per-bucket join (expected bucket
    size n / 2^planes), a plain shuffle-on-key operation.

    Pass ``dim`` when the embedding width is known: the hyperplane signs
    are then embedded as literal arrays (computed once on the driver)
    instead of re-deriving md5('p<plane>_d<dim>') for every row × plane ×
    dimension — same bucket ids, ~10× cheaper projection.
    """
    if dim is not None:
        # deliberately the compact zip_with/aggregate fold, NOT an
        # unrolled element_at chain: unrolling planes × dim into one
        # ~512-term projection blew past the codegen sweet spot and ran
        # ~2× SLOWER end-to-end (measured r8 on label_noise_knn) — the
        # literal sign arrays are the win here, the fold is fine
        rv = _sql_ref(vec)
        if rv is not None:
            # whole bucket as ONE parsed expression (r13): the composed
            # form was ~40 py4j construction round trips per plane
            def bit_sql(p: int) -> str:
                arr = "array(" + ",".join(
                    repr(float(s)) + "D" for s in plane_signs(p, dim)
                ) + ")"
                return (
                    f"if(aggregate(zip_with({rv}, {arr}, (x, s) -> "
                    "CAST(x AS DOUBLE) * s), 0.0D, (acc, v) -> acc + v) "
                    ">= 0, '1', '0')"
                )

            return F.expr(
                "concat("
                + ", ".join(bit_sql(p) for p in range(n_planes))
                + ")"
            )

        def bit_fast(p: int) -> Column:
            signs = lit_double_array(plane_signs(p, dim))
            proj = F.aggregate(
                F.zip_with(vec, signs, lambda x, s: x.cast("double") * s),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            return F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0"))

        return F.concat(*[bit_fast(p) for p in range(n_planes)])

    if isinstance(vec, str):
        vec = F.col(vec)

    def bit(p: int) -> Column:
        proj = F.aggregate(
            F.transform(
                vec,
                lambda x, i: x.cast("double") * _plane_sign(p, i),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[bit(p) for p in range(n_planes)])
