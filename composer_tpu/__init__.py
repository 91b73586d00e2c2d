"""Composer-TPU: a TPU-native (JAX / Flax / Pallas) symbolic-music generation framework.

Same capabilities, CLI surface, config schema, event-vocabulary ABI, and on-disk
file formats as the reference ``composer`` package (see /root/reference), but built
from scratch for TPU hardware: functional JAX core, one jitted train step, scan-based
KV-cached decoding, and mesh-sharded data parallelism.

Reference parity surface: composer/__init__.py:3-16 (ModelSaveFrequencyMode enum).
"""

from enum import Enum, unique

__version__ = "0.1.0"


@unique
class ModelSaveFrequencyMode(Enum):
    """Units of the model save frequency (reference: composer/__init__.py:3-16)."""

    EPOCH = "epoch"
    GLOBAL_STEP = "step"
