"""CSV IO helpers preserving the reference dataset contract
(``dataset/<problem>/<instance>/*.csv`` written with ``np.savetxt``;
``/root/reference/src/base/dataset_generator.py:39-50``)."""

from __future__ import annotations

import os

import numpy as np


def loadtxt(path):
    return np.loadtxt(path)

def savetxt(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savetxt(path, np.asarray(arr))
