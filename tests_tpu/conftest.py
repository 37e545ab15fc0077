"""TPU-only regression tests (run: ``python -m pytest tests_tpu/``).

Unlike tests/, this tree does NOT force the CPU backend: these tests train
real models and need the accelerator. They skip cleanly when no TPU is
attached.
"""

import os
import sys

import numpy as np
import pytest

# the repo root holds train_joint.py (build_synthetic) and the package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture
def rng():
    return np.random.RandomState(0)
