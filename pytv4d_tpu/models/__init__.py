from . import ct, denoise
from .ct import cp_reconstruct, fbp, make_projector, radon
from .denoise import TVDenoiser, add_noise, denoise_tv_chambolle
