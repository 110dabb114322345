from fem_fct_pdeco_tpu.utils.profiling import Timer, device_memory_stats, host_memory_mb

__all__ = ["Timer", "device_memory_stats", "host_memory_mb"]
