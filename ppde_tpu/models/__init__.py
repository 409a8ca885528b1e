"""Expert models as pure functions over parameter pytrees."""

from ppde_tpu.models import potts  # noqa: F401
