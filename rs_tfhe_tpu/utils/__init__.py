"""Utilities: key serialization (checkpoint/resume) and profiling."""

from .profiling import Timer, force, gate_throughput, trace  # noqa: F401
from .serialization import (  # noqa: F401
    load_cloud_key,
    load_secret_key,
    save_cloud_key,
    save_secret_key,
)
