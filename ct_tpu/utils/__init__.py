from ct_tpu.utils.logger import setup_logger  # noqa: F401
from ct_tpu.utils.timer import Timer  # noqa: F401
