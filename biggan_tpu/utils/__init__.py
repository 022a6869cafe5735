from biggan_tpu.utils.logging import MetricsLogger, show_all_variables  # noqa: F401
from biggan_tpu.utils.misc import check_folder, str2bool  # noqa: F401
