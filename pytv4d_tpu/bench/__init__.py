from . import harness
from .harness import bench_ct, bench_solver, weak_scaling, weak_scaling_tgv
