from stereo_vo_tpu.utils.profiling import StageTimer, device_trace, summarize_trace

__all__ = ["StageTimer", "device_trace", "summarize_trace"]
