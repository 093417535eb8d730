from . import ct, denoise
from .ct import (
    FanBeamGeometry,
    cp_reconstruct,
    fbp,
    make_fan_projector,
    make_projector,
    radon,
    radon_fan,
    sart,
    sinogram_sharding,
)
from .denoise import TVDenoiser, add_noise, denoise_tv_chambolle
