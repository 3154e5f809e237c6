from speedy_ml_tpu.core.constants import PhysicalConstants
from speedy_ml_tpu.core.geometry import Geometry
from speedy_ml_tpu.core.spectral import SpectralTransform

__all__ = ["PhysicalConstants", "Geometry", "SpectralTransform"]
