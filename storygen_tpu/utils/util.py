"""Small utilities (utils/util.py parity: get_time_string at :9,
get_function_args at :13)."""
from __future__ import annotations

import inspect
from typing import Any, Dict

from storygen_tpu.utils.logging import get_time_string  # re-export

__all__ = ["get_time_string", "get_function_args"]


def get_function_args() -> Dict[str, Any]:
    """Capture the calling function's bound arguments as a dict (used to
    re-serialize train() kwargs into the run's config record)."""
    frame = inspect.currentframe().f_back
    args, varargs, keywords, values = inspect.getargvalues(frame)
    out = {name: values[name] for name in args}
    if keywords:
        out.update(values[keywords])
    return out
