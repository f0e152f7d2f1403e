from ct_tpu.data.targets import PaddedTargets, pad_targets  # noqa: F401
