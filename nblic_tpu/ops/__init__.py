"""Device compute ops: vectorized modeling, context bias, entropy coding."""

from . import context, histogram, neighbors, predict, rans  # noqa: F401
