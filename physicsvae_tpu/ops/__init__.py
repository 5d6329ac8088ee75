"""Pallas TPU kernels.

fk_kernel: batch-on-lanes forward kinematics (opt-in via
SimParams.use_pallas_fk; bit-exact vs the XLA path) — kept as the proven
layout pattern for the round-3 fused-substep kernel.

A fused-MLP kernel was A/B'd against XLA at PPO policy shapes
(B=2048, 1095->256->256->55) and LOST (32us vs 23us — XLA's native matmul
fusion already keeps these small weights resident), so it was removed
(docs/PERF_r2.md).
"""
