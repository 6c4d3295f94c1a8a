from stereo_vo_tpu.core.camera import CameraInfo
from stereo_vo_tpu.core.config import (
    BackendConfig,
    FrontendConfig,
    PipelineConfig,
    RuntimeConfig,
    load_config,
)

__all__ = [
    "CameraInfo",
    "BackendConfig",
    "FrontendConfig",
    "PipelineConfig",
    "RuntimeConfig",
    "load_config",
]
