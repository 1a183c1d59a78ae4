from vaeunet_tpu.utils.tracking import Tracker
from vaeunet_tpu.utils.tensor_utils import (
    to_python_scalar,
    ensure_dict_python_scalars,
    fix_dataframe_tensors,
    ensure_numeric_dataframe,
)

__all__ = [
    "Tracker",
    "to_python_scalar",
    "ensure_dict_python_scalars",
    "fix_dataframe_tensors",
    "ensure_numeric_dataframe",
]
