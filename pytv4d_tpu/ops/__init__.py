from . import api, operators, tv
from .operators import compute_L21_norm, D, D_T
from .tv import make_tv, tv_and_subgrad
