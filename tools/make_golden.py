"""Generate golden parity fixtures by executing the reference PyTV-4D
implementation (read-only checkout at /root/reference).

Run once during development; the resulting ``tests/golden/golden_small.npz``
is committed so the parity tests are self-contained.  Regenerate with:

    python tools/make_golden.py
"""

import os
import sys

import numpy as np

REF = os.environ.get("PYTV_REFERENCE", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "golden_small.npz")

sys.path.insert(0, REF)
import pytv  # noqa: E402

SCHEMES = ("upwind", "downwind", "central", "hybrid")


def main():
    rng = np.random.default_rng(123)
    img4d = rng.random((4, 3, 8, 8))
    img2d = rng.random((1, 1, 8, 8))
    mask = np.zeros((1, 1, 8, 8), dtype=bool)
    mask[0, 0, 2:6, 3:7] = True

    cases = {
        "base": dict(),
        "time": dict(reg_time=0.6, reg_z_over_reg=0.4),
        "mask": dict(reg_time=0.5, mask_static=mask, factor_reg_static=0.25),
        "noz": dict(reg_z_over_reg=0.0, reg_time=1.0),
    }

    out = {"img4d": img4d, "img2d": img2d, "mask": mask}
    for scheme in SCHEMES:
        for cname, kw in cases.items():
            D = getattr(pytv.tv_operators_CPU, f"D_{scheme}")(img4d, **kw)
            DT = getattr(pytv.tv_operators_CPU, f"D_T_{scheme}")(D, **kw)
            tv, G = getattr(pytv.tv_CPU, f"tv_{scheme}")(img4d, **kw)
            key = f"{scheme}_{cname}"
            out[f"{key}_D"] = D
            out[f"{key}_DT"] = DT
            out[f"{key}_tv"] = np.float64(tv)
            out[f"{key}_G"] = G
        # 2D case (Nz=1): z channels dropped
        D = getattr(pytv.tv_operators_CPU, f"D_{scheme}")(img2d)
        tv, G = getattr(pytv.tv_CPU, f"tv_{scheme}")(img2d)
        out[f"{scheme}_2d_D"] = D
        out[f"{scheme}_2d_tv"] = np.float64(tv)
        out[f"{scheme}_2d_G"] = G

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {os.path.abspath(OUT)} with {len(out)} arrays")


OUT_BOUNDARY = os.path.join(os.path.dirname(__file__), "..", "tests",
                            "golden", "golden_boundary.npz")


def main_boundary():
    """Boundary-heavy shapes where stencil rewrites silently diverge
    (SURVEY.md section 7 hard part 1): Nz==2 (every z difference touches a
    boundary), M==2 with time coupling (central's documented upwind
    fallback along t, tv_operators_CPU.py:347-348), and odd plane sizes.
    central x Nz==2 is NOT recordable: the reference CPU implementation
    crashes there (defect, SURVEY.md section 2.4.1)."""
    rng = np.random.default_rng(321)
    shapes = {
        "nz2": (rng.random((2, 3, 8, 8)), dict(reg_time=0.7)),
        "m2": (rng.random((4, 2, 8, 8)), dict(reg_time=0.7,
                                              reg_z_over_reg=0.6)),
        "odd": (rng.random((3, 2, 9, 9)), dict(reg_time=0.5)),
    }
    out = {f"img_{k}": v[0] for k, v in shapes.items()}
    for scheme in SCHEMES:
        for sname, (img, kw) in shapes.items():
            if scheme == "central" and sname == "nz2":
                continue  # reference defect: IndexError (do not replicate)
            D = getattr(pytv.tv_operators_CPU, f"D_{scheme}")(img, **kw)
            DT = getattr(pytv.tv_operators_CPU, f"D_T_{scheme}")(D, **kw)
            tv, G = getattr(pytv.tv_CPU, f"tv_{scheme}")(img, **kw)
            key = f"{scheme}_{sname}"
            out[f"{key}_D"] = D
            out[f"{key}_DT"] = DT
            out[f"{key}_tv"] = np.float64(tv)
            out[f"{key}_G"] = G
    np.savez_compressed(OUT_BOUNDARY, **out)
    print(f"wrote {os.path.abspath(OUT_BOUNDARY)} with {len(out)} arrays")


if __name__ == "__main__":
    main()
    main_boundary()
