"""Back-compat shim: the profiler helpers are now a package subsystem.

    from mlagg_unet_tpu.utils.profiling import device_time_ms
"""
import sys

sys.path.insert(0, "/root/repo")

from mlagg_unet_tpu.utils.profiling import device_time_ms  # noqa: F401
