"""Unrolled vector-fold SQL expressions (optimization round 15).

Every similarity / embedding kernel in this engine originally computed
dot products, squared distances and norms with Catalyst higher-order
functions::

    aggregate(zip_with(a, b, (x, y) -> x * y),
              cast(0.0 as double), (acc, x) -> acc + x)

Higher-order functions are evaluated INTERPRETED in Spark (each element
binds lambda variables and walks the expression tree — they are
excluded from whole-stage codegen), so a 64-dim dot product costs ~64
interpreted lambda invocations per PAIR.  For pair-scale kernels
(query-panel x corpus joins, LSH candidate scoring, Lloyd assignment
scans) that interpretation overhead dominated the bench: the exact
cosine baseline spent ~39 s at sf0.1 evaluating 4M pairs x 64 dims of
interpreted folds (guide §4.1: prefer built-in/codegen expressions).

The fix: the vector dimension is a Python-time constant at every call
site (DIM = 64, PQ sub-dims, matryoshka prefixes), so the fold can be
unrolled into a flat arithmetic expression that whole-stage codegen
compiles to straight-line Java::

    (cast(0.0 as double) + (a[0] * b[0]) + (a[1] * b[1]) + ...)

BIT-IDENTITY ARGUMENT (why every committed result hash still stands):
``aggregate``'s fold evaluates ``(((zero + t0) + t1) + ...)`` — exactly
the left-associated parse of the unrolled ``zero + t0 + t1 + ...``.
Every term ``ti`` is built from the SAME sub-expression the zip_with
lambda body used (``a[i] * b[i]``, ``(a[i]-b[i])*(a[i]-b[i])``, ...),
so the physical sequence of IEEE-754 operations (and, for the integer
folds, the sequence of 64-bit wrap-around adds) is identical op for op.
The leading ``zero +`` is kept deliberately: it reproduces the fold's
initial accumulator op (e.g. ``0.0 + (-0.0)`` normalizes to ``0.0``
exactly like the fold does), so the unroll is equivalent even at the
signed-zero edge.  No reassociation, no fused ops, no reordering —
only the evaluation STRATEGY changes (interpreted HOF -> codegen).

All helpers return SQL strings for ``F.expr``; ``a``/``b`` accept any
SQL expression that evaluates to an array (qualified columns like
``q.v`` included — terms parenthesize the operand before indexing).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

D_ZERO = "cast(0.0 as double)"
L_ZERO = "cast(0 as bigint)"


def fold_dot(a: str, b: str, zero: str = D_ZERO) -> str:
    """The ORIGINAL interpreted HOF dot fold. Kept as the deliberate
    choice for model-size / tiny-row sites: below ~10^5 evaluations the
    unroll's fixed costs (a 129-node analyzed tree per instance, Janino
    + C2 huge-method compilation) exceed what interpretation costs, and
    plans that instantiate the expression many times (the 12-plane LSH
    signatures, multi-point sweeps) pay that bloat per instance —
    measured regressions in OPTIMIZATION_r15.md. Pair-scale sites use
    ``dot``; row-scale sites use this."""
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
            f" {zero}, (acc, x) -> acc + x)")


def fold_sq_dist(a: str, b: str, zero: str = D_ZERO) -> str:
    """Interpreted HOF squared-distance fold (see fold_dot)."""
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
            f" {zero}, (acc, d) -> acc + d)")


def fold_self_dot(a: str, zero: str = D_ZERO) -> str:
    """Interpreted HOF self-dot fold (see fold_dot)."""
    return f"aggregate({a}, {zero}, (acc, x) -> acc + x * x)"


def fold_dot_const(a: str, consts: Sequence) -> str:
    """Interpreted HOF projection fold onto a literal plane (see
    fold_dot — signature computation is corpus-ROW-scale, and the LSH
    queries instantiate 12 of these per plan)."""
    arr = "array(" + ", ".join(f"cast({s} as double)" for s in consts) + ")"
    return (f"aggregate(zip_with({a}, {arr}, (x, s) -> x * s),"
            f" cast(0.0 as double), (acc, x) -> acc + x)")


def unrolled_fold(term: Callable[[int], str], dim: int,
                  zero: str = D_ZERO) -> str:
    """``(zero + (term(0)) + (term(1)) + ... + (term(dim-1)))`` — the
    left-associated unroll of ``aggregate(..., zero, (acc,x)->acc+x)``."""
    body = " + ".join(f"({term(i)})" for i in range(dim))
    return f"({zero} + {body})"


def dot(a: str, b: str, dim: int, zero: str = D_ZERO) -> str:
    """Unroll of ``aggregate(zip_with(a, b, (x,y) -> x*y), zero, +)``."""
    return unrolled_fold(lambda i: f"({a})[{i}] * ({b})[{i}]", dim, zero)


def self_dot(a: str, dim: int, zero: str = D_ZERO) -> str:
    """Unroll of ``aggregate(a, zero, (acc,x) -> acc + x*x)``."""
    return unrolled_fold(lambda i: f"({a})[{i}] * ({a})[{i}]", dim, zero)


def sq_dist(a: str, b: str, dim: int, zero: str = D_ZERO) -> str:
    """Unroll of ``aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), zero, +)``."""
    return unrolled_fold(
        lambda i: f"(({a})[{i}] - ({b})[{i}]) * (({a})[{i}] - ({b})[{i}])",
        dim, zero)


def dot_const(a: str, consts: Sequence, dim: int | None = None,
              zero: str = D_ZERO) -> str:
    """Unroll of ``aggregate(zip_with(a, array(<consts>), (x,s) -> x*s),
    zero, +)`` — the hyperplane-projection fold (consts are the plane's
    +/-1 components, spelled as double literals exactly like the array
    literal they replace)."""
    n = dim if dim is not None else len(consts)
    return unrolled_fold(
        lambda i: f"({a})[{i}] * cast({consts[i]} as double)", n, zero)


def sign_mismatch(a: str, b: str, dim: int, zero: str = "0") -> str:
    """Unroll of the Hamming fold ``aggregate(zip_with(a, b, (x,y) ->
    cast((x>0) != (y>0) as int)), 0, +)``."""
    return unrolled_fold(
        lambda i: f"cast((({a})[{i}] > 0) != (({b})[{i}] > 0) as int)",
        dim, zero)
