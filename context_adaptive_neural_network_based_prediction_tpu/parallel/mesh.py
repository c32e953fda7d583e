"""Device-mesh construction and sharding helpers."""

from __future__ import annotations

import numpy as np


def make_mesh(axis_sizes: dict, devices=None):
    """Builds a jax.sharding.Mesh with named axes from available devices.

    `axis_sizes` maps axis name -> size; the product must divide the device
    count (extra devices are dropped).  Example: {"data": 4, "model": 2}.
    """
    import jax
    from jax.sharding import Mesh

    devices = devices if devices is not None else jax.devices()
    total = int(np.prod(list(axis_sizes.values())))
    if len(devices) < total:
        raise ValueError(f"need {total} devices, have {len(devices)}")
    dev_array = np.array(devices[:total]).reshape(tuple(axis_sizes.values()))
    return Mesh(dev_array, tuple(axis_sizes.keys()))


def named_sharding(mesh, *spec):
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec(*spec))
