"""Device-mesh construction for the framework's two parallel axes.

The reference's only scale-out primitive is the logical index segment merged
by a global top-K heap (SURVEY.md §5). We map that onto a 2-D
jax.sharding.Mesh:

  "dp"  — data parallel over the query batch (concurrent API requests)
  "seg" — index parallel over segment groups (posting arrays + doc slots)

Cross-shard score merge rides ICI via all_gather/psum inside shard_map
(parallel/sharded.py); multi-host DCN only enters when the mesh spans hosts.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def make_mesh(
    dp: Optional[int] = None,
    seg: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis_names=("dp", "seg"),
) -> Mesh:
    """Build a (dp, seg) mesh over the available devices.

    Defaults: all devices on the seg axis (index sharding scales capacity
    first), dp=1. Pass explicit dp/seg to change the split.
    """
    import numpy as np

    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if dp is None and seg is None:
        dp, seg = 1, n
    elif dp is None:
        dp = n // seg
    elif seg is None:
        seg = n // dp
    if dp * seg != n:
        raise ValueError(f"mesh {dp}x{seg} != {n} devices")
    arr = np.array(devs).reshape(dp, seg)
    return Mesh(arr, axis_names)
