from ct_tpu.ops import boxes, priors  # noqa: F401
