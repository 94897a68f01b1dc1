"""Device-mesh sharding for multi-chip / multi-host encode."""

from . import mesh  # noqa: F401
