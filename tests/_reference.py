"""Import harness for the upstream reference package at /root/reference.

The reference (TF 2.x era, python 3.7) needs three environment shims to run
under this image's TF 2.21 / numpy 2.x / python 3.12 — none of which change
any numerics:

* ``TF_USE_LEGACY_KERAS=1`` so ``tf.keras`` resolves to the installed
  ``tf_keras`` (Keras 2) package: the reference uses Keras-2 calling
  conventions (positional-name ``add_weight``, list inputs) that Keras 3
  rejects.
* ``np.int``/``np.float``/``np.bool`` aliases (removed in numpy 1.24+) used
  in reference default arguments evaluated at class-definition time
  (reference sequence.py:1347).
* a ``pretty_midi`` stub module: the package imports it at module scope
  (reference sequence.py:18) but only MIDI I/O touches it, which the parity
  tests never call.

Additionally ``Attention.build`` is wrapped to unwrap the Keras-2
list-of-shapes it now receives for list inputs — the original indexes
``input_shape[0] * input_shape[1]`` expecting the shape of ``x`` alone
(reference transformer.py:285), which is what the wrapper passes through.

Import this module (not tensorflow directly) from any test that needs the
reference; everything is done once at first import.
"""

from __future__ import annotations

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"

# Must be set before tensorflow is first imported anywhere in the process;
# tests/conftest.py also sets it defensively.
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

import numpy as np

for _name, _val in [("int", int), ("float", float), ("bool", bool)]:
    if not hasattr(np, _name):
        setattr(np, _name, _val)

if "pretty_midi" not in sys.modules:
    # Prefer the REAL library when the environment has one (it makes the
    # reference's MIDI I/O live and auto-activates the cross-library tests
    # in tests/test_pretty_midi_compat.py); fall back to a stub so the
    # reference package still imports without it.
    try:  # pragma: no cover - environment-dependent
        import pretty_midi  # noqa: F401
    except ImportError:
        _pm = types.ModuleType("pretty_midi")

        class _Unavailable:  # pragma: no cover - only hit if MIDI I/O is called
            def __init__(self, *a, **k):
                raise RuntimeError("pretty_midi is stubbed out in this environment")

        _pm.PrettyMIDI = _Unavailable
        _pm.Instrument = _Unavailable
        _pm.Note = _Unavailable
        _pm.ControlChange = _Unavailable
        sys.modules["pretty_midi"] = _pm

if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

import tensorflow as tf  # noqa: E402

assert "tf_keras" in type(tf.keras.layers.Layer).__module__ or "tf_keras" in (
    tf.keras.__name__
), "legacy keras did not activate; reference models will not build"

from composer.dataset import sequence as ref_sequence  # noqa: E402
from composer.models import music_rnn as ref_music_rnn  # noqa: E402
from composer.models import transformer as ref_transformer  # noqa: E402

# Keras 2 passes a list of shapes (with None placeholders for the non-tensor
# inputs) to build(); the reference expects the shape of x alone. Additionally
# the reference's relative-attention build reads ``self.depth`` which is never
# assigned ANYWHERE in the upstream code (a latent upstream AttributeError:
# reference transformer.py:285 vs. split_heads at :392-394 which derives
# depth inline as features // head_count) — supply the only consistent value.
if not getattr(ref_transformer.Attention, "_shape_unwrap_patched", False):
    _orig_attention_build = ref_transformer.Attention.build

    def _patched_build(self, input_shape):
        if isinstance(input_shape, (list, tuple)) and len(input_shape) > 0:
            input_shape = input_shape[0]
        if not hasattr(self, "depth"):
            self.depth = self.hidden_size // self.attention_head_count
        return _orig_attention_build(self, input_shape)

    ref_transformer.Attention.build = _patched_build
    ref_transformer.Attention._shape_unwrap_patched = True
