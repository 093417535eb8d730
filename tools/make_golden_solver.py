"""Generate golden 4D solver trajectories by running the REFERENCE
implementation's recipes (README.md:107-158, with the keepdims fix the 4D
case requires — SURVEY.md 2.4.6) on a seeded 4D time-coupled problem.

Writes tests/golden/golden_solver4d.npz; run once during development.
"""

import os
import sys

import numpy as np

REF = os.environ.get("PYTV_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "golden_solver4d.npz")
sys.path.insert(0, REF)
import pytv  # noqa: E402

rng = np.random.default_rng(777)
noisy = rng.random((4, 3, 24, 24)) * 100.0
reg = 5.0
reg_time = 0.5
n_it = 150

# --- reference GD loop (README.md:118-123), CPU ops, 4D with time ---------
x = np.copy(noisy)
gd_losses = []
for _ in range(n_it):
    tv, G = pytv.tv_CPU.tv_hybrid(x, reg_time=reg_time)
    x += -5e-3 * ((x - noisy) + reg * G)
    gd_losses.append(0.5 * np.sum(np.square(x - noisy)) + reg * tv)

# --- reference CP loop (README.md:146-157) with keepdims for 4D -----------
sigma_D, sigma_A = 0.5, 1.0
# ||D||^2 bound for hybrid with z + time channels: (1/2)*4*(4 + 2*reg_time)... use
# the same rule our solver uses: norm^2 * sum 4 w^2 = 0.5*(4*4 + 4*2*reg_time)
L2 = 0.5 * (4 * 4.0 + 4 * 2.0 * reg_time)
tau = 1.0 / (L2 + sigma_A)
x = np.copy(noisy)
yA = np.zeros_like(x)
D0 = pytv.tv_operators_CPU.D_hybrid(x, reg_time=reg_time)
yD = np.zeros_like(D0)
cp_losses = []
for _ in range(n_it):
    yA = (yA + sigma_A * (x - noisy)) / (1.0 + sigma_A)
    D_x = pytv.tv_operators_CPU.D_hybrid(x, reg_time=reg_time)
    p = yD + sigma_D * D_x
    n = np.sqrt(np.sum(p ** 2, axis=1, keepdims=True))
    yD = p / np.maximum(1.0, n / reg)
    x = x - tau * yA - tau * pytv.tv_operators_CPU.D_T_hybrid(yD, reg_time=reg_time)
    cp_losses.append(0.5 * np.sum(np.square(x - noisy))
                     + reg * pytv.tv_operators_CPU.compute_L21_norm(D_x))

np.savez_compressed(OUT, noisy=noisy, reg=reg, reg_time=reg_time,
                    gd_losses=np.array(gd_losses),
                    cp_losses=np.array(cp_losses), tau=tau)
print("wrote", os.path.abspath(OUT), "gd final", gd_losses[-1],
      "cp final", cp_losses[-1])
