from msau_tpu.models.msau import MSAUNet, MSAUWrapper, build_model
from msau_tpu.models import layers, attention

__all__ = ["MSAUNet", "MSAUWrapper", "build_model", "layers", "attention"]
