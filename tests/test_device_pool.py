"""Least-load session placement (ni_rsrc_allocate_auto analog)."""

import jax
import pytest

from media_tpu.parallel.sharding import DevicePool


def test_least_load_placement():
    pool = DevicePool(devices=list(range(4)))  # abstract device handles
    s1, d1 = pool.allocate(1920, 1080, 30, n_devices=2)
    assert d1 == [0, 1]
    s2, d2 = pool.allocate(1280, 720, 30, n_devices=1)
    assert d2 == [2]  # least loaded
    s3, d3 = pool.allocate(640, 480, 30, n_devices=1)
    assert d3 == [3]
    # Devices 2/3 now lighter than 0/1 -> next 2-device session lands there.
    s4, d4 = pool.allocate(640, 480, 60, n_devices=2)
    assert d4 == [2, 3]
    pool.release(s1)
    s5, d5 = pool.allocate(320, 240, 30, n_devices=2)
    assert d5 == [0, 1]
    assert all(v >= 0 for v in pool.loads())


def test_pool_over_real_devices():
    pool = DevicePool()
    n = min(2, len(jax.devices()))
    sid, devs = pool.allocate(128, 128, 30, n_devices=n)
    assert len(devs) == n
    pool.release(sid)
    assert all(v == 0 for v in pool.loads())
