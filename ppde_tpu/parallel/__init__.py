"""Multi-chip scaling: mesh construction and sharding policies."""

from ppde_tpu.parallel import mesh, pipeline  # noqa: F401
