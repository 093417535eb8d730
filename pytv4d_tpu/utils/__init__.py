from . import images
from .images import as_volume, cameraman, has_real_cameraman, synthetic_phantom
