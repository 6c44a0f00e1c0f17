"""Pallas kernels for hot ops.

Currently intentionally empty: profiling on v5e (PERFNOTES.md) shows the
categorical posterior + sampling chain fuses into the UNet epilogue inside
the compiled sampler scan (zero marginal cost), and GroupNorm precision is
not bandwidth-limiting. The UNet convolutions dominate and are MXU
lane-limited by the architecture's 32-channel outer levels — the planned
kernel work (space-to-depth conv repacking) lands here.
"""
