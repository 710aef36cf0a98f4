"""Expression-level helpers shared by the operators.

``eval_once``: a collapse barrier for expensive projected expressions
that many sibling expressions reference (round-11 optimization, guide
§1.2 "don't compute things twice" / §4.4's duplication hazard for
built-in expressions).

CollapseProject inlines a projected expression into every downstream
reference, and neither whole-stage codegen's subexpression elimination
nor the aggregate update path reliably de-duplicates the copies: the
60-bit SimHash vote aggregate re-evaluated its md5 token hash once PER
BIT (measured 6.9 s → 1.0 s at sf0.1 with the barrier, identical
output), and the MinHash Kirsch-Mitzenmacher combinations re-ran md5
once per (hash, half) — 24× per shingle (5.3 s → 0.8 s).

The barrier wraps the value in ``WHEN rand(seed) < 2 THEN col`` — the
condition is always true, so the VALUE is bit-identical for any input
type, but the expression is flagged non-deterministic, which
CollapseProject refuses to duplicate or reorder (the same mechanism
the guide's §4.4 ``asNondeterministic`` fix uses for Python UDFs).
Determinism of RESULTS is unaffected: the random draw never reaches
the value, so retries and speculative tasks reproduce identical rows.

Use it on the expensive expression at its DEFINITION site, never
blanket: a non-deterministic flag also blocks legitimate filter
pushdown past the projection (guide §4.4's trade-off).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def eval_once(col: Column, seed: int = 11) -> Column:
    """Value-identical wrapper that stops the optimizer from inlining
    (hence re-evaluating) the expression into each of many downstream
    references. See module docstring."""
    return F.when(F.rand(seed) < F.lit(2.0), col)
