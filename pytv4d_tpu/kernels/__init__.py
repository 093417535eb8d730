"""Fused Pallas TPU kernels (the performance layer; SURVEY.md section 7.3).

Imported lazily by the dispatch layer; importing this package does not
require TPU hardware (kernels also run under the Pallas interpreter on CPU
for testing).
"""
