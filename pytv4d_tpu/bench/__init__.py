from . import harness
from .harness import (
    bench_ct,
    bench_ct_cone,
    bench_ct_production,
    bench_solver,
    weak_scaling,
    weak_scaling_tgv,
)
