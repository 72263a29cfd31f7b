"""TPU-native Building-GAN framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of
PARKCHEOLHEE-lab/building-gan-graph-conditioned-architectural-volume-generation
for TPU hardware: static-shape packed graph batches, masked segment-op message
passing, fully jitted WGAN-GP adversarial training, data parallelism over a
device mesh.
"""

from .config import Configuration, NUM_CLASSES, COLORS, PROGRAM_NAMES

__version__ = "0.1.0"
