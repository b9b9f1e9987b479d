"""python_5gtoolbox_tpu — a TPU-native 5G NR physical-layer framework.

A from-scratch JAX/XLA/Pallas implementation of a 3GPP Release-15 5G NR
PHY toolbox with the capability envelope of the reference py5gphy package
(xu753x/python_5gtoolbox): DL/UL waveform generation (SSB, PDCCH, PDSCH,
CSI-RS, PUSCH, PUCCH 0-4, SRS, PRACH), LDPC/Polar/small-block channel
coding, OFDM low-PHY, channel models and a receiver stack.

Architecture (TPU-first, not a port):
  * Host-side "planners" trace every config-dependent quantity (sizes,
    index walks, interleavers, DMRS positions) into static NumPy tables.
  * Device-side data paths are pure jittable JAX functions with static
    shapes, batched over slots / code blocks / antennas, with Pallas
    kernels for the hot decoders and filters.
  * Multi-chip scaling via jax.sharding.Mesh + shard_map: codeword and
    slot batch axes shard as data parallel; the time-sample axis shards
    with overlap-save halo exchange for the channel filters.
"""

__version__ = "0.1.0"
