"""fermi-tpu: TPU-native FMD-index genome assembly framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of lh3/fermi
(reference analysis in SURVEY.md). Compute runs as batched kernels over a
device-resident blocked-occ FM-index; on-disk artifacts (.fmd, ec.fq, MAG)
match the reference byte-for-byte.
"""

__version__ = "0.1.0"
