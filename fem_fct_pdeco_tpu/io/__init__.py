from fem_fct_pdeco_tpu.io.csvio import (
    append_trajectory_csv,
    extract_frame,
    import_data_final,
    load_trajectory_csv,
    save_trajectory_csv,
)
from fem_fct_pdeco_tpu.io.registry import append_results_row

__all__ = [
    "append_trajectory_csv",
    "extract_frame",
    "import_data_final",
    "load_trajectory_csv",
    "save_trajectory_csv",
    "append_results_row",
]
