"""Native C++ Grumpkin kernels vs the pure-Python EC implementation."""

import random

import pytest

from acvm_tpu.blackbox.ec import grumpkin
from acvm_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

rng = random.Random(5)
N = grumpkin.params.n
G = grumpkin.generator()


def test_mul_matches_python():
    for _ in range(8):
        k = rng.randrange(N)
        assert native.grumpkin_mul(G, k) == grumpkin.mul(k, G)


def test_mul_golden_vectors():
    # scalar 1 -> generator (barretenberg scalar_mul.rs:76-84)
    assert native.grumpkin_mul(G, 1) == G
    p = native.grumpkin_mul(G, 1 + 2 * (1 << 128))
    assert (
        p[0]
        == 0x0702AB9C7038EEECC179B4F209991BCB68C7CB05BF4C532D804CCAC36199C9A9
    )
    assert (
        p[1]
        == 0x23F10E9E43A3AE8D75D24154E796AAE12AE7AF546716E8F81A2564F1B5814130
    )


def test_add_and_infinity():
    p = grumpkin.mul(12345, G)
    q = grumpkin.mul(67890, G)
    assert native.grumpkin_add(p, q) == grumpkin.add(p, q)
    # doubling path
    assert native.grumpkin_add(p, p) == grumpkin.add(p, p)
    # p + (-p) = infinity
    assert native.grumpkin_add(p, grumpkin.neg(p)) is None
    assert native.grumpkin_add(None, p) == p
    assert native.grumpkin_mul(G, 0) is None


def test_msm_matches_python():
    points = [grumpkin.mul(rng.randrange(N), G) for _ in range(5)]
    scalars = [rng.randrange(N) for _ in range(5)]
    expected = None
    for p, s in zip(points, scalars):
        expected = grumpkin.add(expected, grumpkin.mul(s, p))
    assert native.grumpkin_msm(points, scalars) == expected


def test_mul_batch():
    scalars = [rng.randrange(N) for _ in range(6)] + [0]
    got = native.grumpkin_mul_batch(G, scalars)
    for k, p in zip(scalars, got):
        assert p == grumpkin.mul(k, G)
