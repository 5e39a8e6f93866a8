from rechorus_tpu.utils.io import (
    format_metric,
    format_arg_str,
    check_dir,
    non_increasing,
    get_time,
    init_logging,
)
