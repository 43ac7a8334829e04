"""Device mesh construction.

The reference is strictly single-device (SURVEY §5: no distributed layer;
the only hint is a commented-out nn.DataParallel, train.py:100). The
TPU-native communication layer is jax.sharding over a Mesh with XLA GSPMD
inserting the collectives:

  * axis "data":    frames/batch — the primary axis (stylization frames are
                    embarrassingly parallel, SURVEY §3.2);
  * axis "spatial": image rows — for ultra-resolution single images, XLA
                    partitions the 3x3 convs with automatic halo exchange
                    over ICI, and the cWCT pixel-axis covariance reductions
                    become psums.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              spatial: int = 1) -> Mesh:
    """1D ("data") or 2D ("data", "spatial") mesh over the first n devices.

    spatial: size of the spatial axis (must divide n).
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if len(axes) == 1:
        import numpy as np

        return Mesh(np.asarray(devices), axes)
    assert n % spatial == 0, f"{n} devices not divisible by spatial={spatial}"
    import numpy as np

    grid = np.asarray(devices).reshape(n // spatial, spatial)
    return Mesh(grid, axes)
