from . import harness
from .harness import bench_solver, weak_scaling
