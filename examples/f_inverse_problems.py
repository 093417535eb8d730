"""Generic TV-regularized inverse problems: one solver, many operators.

``solvers.cp_inverse`` solves ``min_x 1/2||A x - b||^2 + reg TV(x)`` for ANY
jax-traceable linear ``A`` — the adjoint comes from ``jax.linear_transpose``
(exact by construction), and ``precond=True`` replaces the operator-norm
step rule with exact Pock-Chambolle diagonal preconditioning (several-fold
fewer iterations; no power method).

Three operators, same call:
1. Gaussian deblurring (``gaussian_blur_operator``);
2. inpainting (a masking operator — the hole is filled by TV);
3. CT with diagonal preconditioning (``models.ct.cp_reconstruct``).
"""

# Allow running from a repo checkout without installation.
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import numpy as np
import jax.numpy as jnp

from pytv4d_tpu.models.ct import cp_reconstruct, radon
from pytv4d_tpu.solvers import cp_inverse, gaussian_blur_operator
from pytv4d_tpu.utils import synthetic_phantom

# ---- 1. deblurring --------------------------------------------------------
truth = np.zeros((1, 1, 32, 32), np.float32)
truth[0, 0, 8:24, 10:26] = 1.0
A = gaussian_blur_operator(truth.shape, sigma_px=1.5, radius=4)
b = A(truth)
res = cp_inverse(A, b, truth.shape, n_iter=400, reg=2e-4, x_init=b)
err_blur = float(np.mean((np.asarray(b) - truth) ** 2))
err_rec = float(np.mean((np.asarray(res.x) - truth) ** 2))
print(f"deblurring MSE: blurred {err_blur:.4f} -> TV-recovered {err_rec:.4f}")
assert err_rec < 0.5 * err_blur

# ---- 2. inpainting --------------------------------------------------------
mask = np.ones_like(truth)
mask[0, 0, 12:20, 14:22] = 0.0           # the hole
mask_j = jnp.asarray(mask)
b = jnp.asarray(truth) * mask_j
res = cp_inverse(lambda x: x * mask_j, b, truth.shape, n_iter=600, reg=0.2,
                 x_init=b)
hole_err = float(np.max(np.abs(np.asarray(res.x) - truth)[mask == 0]))
print(f"inpainting: max error inside the hole {hole_err:.3f}")
assert hole_err < 0.2

# ---- 3. CT with diagonal preconditioning ----------------------------------
phantom = (synthetic_phantom(32).astype(np.float32) / 255.0)[None, None]
angles = jnp.linspace(0, np.pi, 24, endpoint=False)
rng = np.random.default_rng(0)
sino = np.array(radon(phantom, angles))
sino += 0.2 * rng.standard_normal(sino.shape).astype(np.float32)

plain = cp_reconstruct(sino, angles, phantom.shape, n_iter=600, reg=0.3,
                       op_norm=32.0)
fast = cp_reconstruct(sino, angles, phantom.shape, n_iter=100, reg=0.3,
                      precond=True)
print(f"TV-CT loss: 600 plain iterations {float(plain.loss[-1]):.2f}, "
      f"100 preconditioned {float(fast.loss[-1]):.2f}")
assert float(fast.loss[-1]) < float(plain.loss[-1])
print("inverse-problems example OK")
