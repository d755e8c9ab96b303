"""Shared numeric helpers.

``round6`` is THE rounding used by every pipeline that emits rounded
doubles: round-half-away-from-zero to 6 decimals, matching DuckDB's
``round(x, 6)`` (C ``std::round`` semantics). numpy's ``np.round`` /
pandas ``.round`` / Python ``round`` are all banker's
round-half-to-even, which differs on exact half-ulp values (e.g.
0.8203125 -> 0.820312 vs DuckDB's 0.820313) — the round-1 red
CORRECTNESS cell. Using one helper everywhere keeps engine and oracle
bit-identical on every representable half.
"""

from __future__ import annotations

import numpy as np

_SCALE = 1e6


def round6(x):
    """Round to 6 decimals, ties away from zero (DuckDB semantics).

    Accepts scalars or numpy arrays; returns float64 of the same shape.
    """
    arr = np.asarray(x, dtype=np.float64)
    mag = np.floor(np.abs(arr) * _SCALE + 0.5) / _SCALE
    out = np.where(arr < 0, -mag, mag) + 0.0  # +0.0 normalises -0.0
    if np.isscalar(x) or arr.ndim == 0:
        return float(out)
    return out


def fmt_doc(**kw):
    """Decorator: format {placeholders} in a REAL docstring with the
    module constants. ``\"\"\"...\"\"\".format(...)`` as a function's
    first statement is an expression, not a docstring — __doc__ ends
    up None and the operator contract text is lost to help() /
    introspection (round-3 ADVICE). With this decorator the literal
    stays a docstring and the constants still interpolate."""
    def deco(fn):
        if fn.__doc__:
            fn.__doc__ = fn.__doc__.format(**kw)
        return fn
    return deco
